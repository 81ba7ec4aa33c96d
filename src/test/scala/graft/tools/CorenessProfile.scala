// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev profiler for the q198 coreness regression (round-10 verdict):
  * times the h-index loop VARIANTS on the real sf edges in one warm
  * JVM, isolating the three round-10 changes — (a) histogram-form
  * step vs the round-9 row_number step, (b) stride-2 fused iterations
  * vs single steps, (c) the transport-switch bookkeeping (extra
  * h.count action). Not part of the driver contract.
  *
  * Usage: runMain graft.tools.CorenessProfile <sfDir> [reps]
  */
object CorenessProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.locality.wait", "0s")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def edges(): DataFrame = {
      val li = graft.Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      li.as("a")
        .join(li.as("b"), col("a.ok") === col("b.ok") &&
          col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("u"), col("b.pk").as("v"))
        .distinct()
    }

    // r9-shape step: row_number over the full edge-sized frame
    def stepRowNumber(sym: DataFrame)(prev: DataFrame): DataFrame = {
      val nv = sym.join(
        broadcast(prev.select(col("node").as("nb"), col("h"))), "nb")
      val w = Window.partitionBy("node").orderBy(col("h").desc)
      nv.withColumn("rn", row_number().over(w))
        .groupBy("node")
        .agg(coalesce(max(when(col("h") >= col("rn"), col("rn"))), lit(0))
          .cast("long").as("h"))
    }

    // r10-shape step: histogram collapse before the window
    def stepHistogram(sym: DataFrame)(prev: DataFrame): DataFrame = {
      val nv = sym.join(
        broadcast(prev.select(col("node").as("nb"), col("h"))), "nb")
      val hist = nv.groupBy("node", "h").agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("node").orderBy(col("h").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hist.withColumn("cum", sum("c").over(w))
        .groupBy("node")
        .agg(coalesce(max(least(col("h"), col("cum"))), lit(0))
          .cast("long").as("h"))
    }

    def loop(label: String, stride: Int, extraCount: Boolean,
        step: DataFrame => (DataFrame => DataFrame),
        forceParts: Int = 0): Unit = {
      for (r <- 1 to reps) {
        val t0 = System.nanoTime()
        val e = edges()
        val parts = if (forceParts > 0) forceParts
          else math.max(8, e.rdd.getNumPartitions)
        val sym = e.select(col("u").as("node"), col("v").as("nb"))
          .union(e.select(col("v").as("node"), col("u").as("nb")))
          .repartition(parts, col("node"))
          .persist()
        var h = sym.groupBy("node").agg(count(lit(1)).as("h"))
          .localCheckpoint()
        if (extraCount) h.count()
        val st = step(sym)
        var prevSum = Long.MinValue
        var changed = true
        var rounds = 0
        while (changed && rounds < 1000) {
          h = Iterator.iterate(h)(st).drop(stride).next().localCheckpoint()
          val s2 = h.agg(coalesce(sum("h"), lit(0L))).head().getLong(0)
          changed = s2 != prevSum
          prevSum = s2
          rounds += stride
        }
        val hist = h.groupBy("h").count().count()
        sym.unpersist(false)
        println(f"[coreness] $label rep=$r parts=$parts rounds=$rounds " +
          f"sum=$prevSum buckets=$hist ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }

    // warm all codegen paths once, then measure in noise-separating
    // interleaved order
    loop("warm", 2, extraCount = true, stepHistogram _)
    loop("hist-stride4-p8", 4, extraCount = true, stepHistogram _, 8)
    loop("hist-stride2-p32", 2, extraCount = true, stepHistogram _, 32)
    loop("hist-stride2-p8", 2, extraCount = true, stepHistogram _, 8)
    loop("hist-stride4", 4, extraCount = true, stepHistogram _)
    loop("hist-stride3", 3, extraCount = true, stepHistogram _)
    loop("hist-stride2", 2, extraCount = true, stepHistogram _)
    spark.stop()
  }
}
