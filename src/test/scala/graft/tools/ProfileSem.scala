// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.tools

import graft.{ops, SparkEntry}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: per-stage timing of q180 semdedup at a given SF dir.
  * Every pipeline constant and the pair-list plan come from
  * [[graft.ops.Dedup]] (SemDedupBits, semBlocks, semPairList) so a
  * retune of the production path can't leave this profiler measuring
  * a stale configuration.
  */
object ProfileSem {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val bits =
      if (args.length > 1) args(1).toInt else graft.ops.Dedup.SemDedupBits
    val cells = time("cells")(graft.ops.Dedup.semCells(spark, sfDir, bits))
    val n = time("count")(cells.count())
    println(s"PROF n=$n")
    val blocks = time("semBlocks")(graft.ops.Dedup.semBlocks(cells))
    println(s"PROF blocks=$blocks")
    val pairs = graft.ops.Dedup.semPairList(spark, cells, blocks)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val np = time("pairs materialize")(pairs.count())
    println(s"PROF pairs=$np")
    // replicate connectedComponentsLoop with per-round timing
    val nodes = cells.select(col("vec_id").as("doc_id"))
    println(s"PROF nodes partitions=${nodes.rdd.getNumPartitions} " +
      s"pairs partitions=${pairs.rdd.getNumPartitions}")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    val edges = pairs.select(col("id1").as("src"), col("id2").as("dst"))
      .unionByName(pairs.select(col("id2").as("src"), col("id1").as("dst")))
    // the PRODUCTION checkpoint-reset (one fused materialize+sum job,
    // fresh stats) — shared, not copied, so a change to the loop's
    // round mechanics can't leave this profiler measuring stale
    // behavior
    def ckptReset(df: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame =
      graft.ops.Dedup.checkpointReset(df)._1
    var labels = time("round0 init checkpoint")(ckptReset(
      nodes.select(col("doc_id"), col("doc_id").as("cluster_id"))))
    var prevSum = Long.MaxValue
    def labelSum(): Long = labels.agg(coalesce(
      org.apache.spark.sql.functions.sum("cluster_id"), lit(0L))).head().getLong(0)
    var curSum = time("round0 labelSum")(labelSum())
    var rounds = 0
    while (curSum < prevSum && rounds < 50) {
      val hops = edges
        .unionByName(labels.select(col("doc_id").as("src"),
          col("cluster_id").as("dst")))
        .unionByName(labels.select(col("cluster_id").as("src"),
          col("doc_id").as("dst")))
      val nbrMin = hops.join(labels, col("dst") === col("doc_id"))
        .groupBy(col("src")).agg(min("cluster_id").as("nbr_min"))
      if (rounds == 20) {
        val lst = new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
              : Unit = {
            val si = sc.stageInfo
            println(f"PROF STAGE ${si.stageId} '${si.name.take(60)}' " +
              f"tasks=${si.numTasks} " +
              f"runMs=${si.taskMetrics.executorRunTime} " +
              f"cpuMs=${si.taskMetrics.executorCpuTime / 1000000} " +
              f"rows=${si.taskMetrics.inputMetrics.recordsRead} " +
              f"shufR=${si.taskMetrics.shuffleReadMetrics.recordsRead} " +
              f"shufW=${si.taskMetrics.shuffleWriteMetrics.recordsWritten}")
          }
        }
        spark.sparkContext.addSparkListener(lst)
      }
      labels = time(s"round$rounds join+checkpoint")(ckptReset(
        labels.join(nbrMin, col("doc_id") === col("src"), "left")
          .select(col("doc_id"),
            least(col("cluster_id"),
              coalesce(col("nbr_min"), col("cluster_id")))
              .as("cluster_id"))))
      prevSum = curSum
      curSum = time(s"round$rounds labelSum")(labelSum())
      println(s"PROF round$rounds " +
        s"statBits=${labels.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength} " +
        s"distinctLabels=${labels.select("cluster_id").distinct().count()}")
      rounds += 1
    }
    println(s"PROF rounds=$rounds")
    spark.conf.set("spark.sql.shuffle.partitions", cpus)
    pairs.unpersist()
    spark.stop()
  }
}
