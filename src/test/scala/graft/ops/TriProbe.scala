// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler (test scope, in-package for access): phase-split of
  * the q154 in-task kernel — feed vs pair fold vs scaffold vs wedge
  * probes. Run: Test/runMain graft.ops.TriProbe [sfDir]
  */
object TriProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[tri] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val rows = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .as[(Long, Long)].collect()
    println(s"[tri] rows=${rows.length}")
    for (_ <- 1 to 3) {
      val f = time("foldPairs") {
        GraphLocal.testFoldPairs(rows.iterator, 1L, 4000000L)
      }
      println(s"[tri]   edges=${f._2.length}")
      val t = time("scaffold") {
        GraphLocal.testScaffold(f._1, 256000000L)
      }
      time("wedge probes") {
        var tri = 0L
        t.foreachClosedWedge((_, _, _) => tri += 1)
        println(s"[tri]   triangles=$tri")
      }
    }
    spark.stop()
  }
}
