// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: run one named query from SparkEntry.queries, print
  * timing (cold + warm) and optionally the formatted physical plan.
  *
  * Usage: runMain graft.RunOne <queryName> [sfDir] [explain]
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val doExplain = args.contains("explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // no native-hadoop in this runtime: see Bench.scala
      .config("spark.sql.streaming.checkpointFileManagerClass",
        "org.apache.spark.sql.execution.streaming.checkpointing" +
          ".FileSystemBasedCheckpointFileManager")
    // ad-hoc conf experiments: SPARK_GRAFT_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.contains("jobs")) {
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          private val starts =
            new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
          override def onJobStart(
              e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            starts.put(e.jobId, (System.nanoTime(),
              e.stageInfos.map(_.name).distinct.mkString(" | ")))
          override def onJobEnd(
              e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
            // a job started before listener registration (or a dropped
            // start event) has no entry — remove() returns null then
            Option(starts.remove(e.jobId)).foreach { case (t0, desc) =>
              println(f"[job] ${e.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%6.2fs  $desc")
            }
        })
    }
    // shuffle/input economy per run — the "minimize shuffles" claim as
    // a measurement: bytes scanned vs bytes exchanged vs rows through
    // the widest stage (SCALE.md's shuffle-economy table comes from
    // this listener)
    val io = new java.util.concurrent.atomic.AtomicLongArray(4)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) {
            io.addAndGet(0, m.inputMetrics.bytesRead)
            io.addAndGet(1, m.shuffleReadMetrics.totalBytesRead)
            io.addAndGet(2, m.shuffleWriteMetrics.bytesWritten)
            io.addAndGet(3, m.shuffleReadMetrics.recordsRead)
          }
        }
      })
    def drainIo(): (Long, Long, Long, Long) = {
      val r = (io.get(0), io.get(1), io.get(2), io.get(3))
      (0 until 4).foreach(io.set(_, 0L))
      r
    }
    spark.range(1000000L).selectExpr("sum(id)").collect() // warm JVM
    val fn = SparkEntry.queries(name)
    if (doExplain) fn(spark, sfDir).explain("formatted")
    for (i <- 1 to 2) {
      drainIo()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously — settle before reading
      // (listenerBus.waitUntilEmpty is private[spark]; a dev harness
      // can afford the fixed settle)
      Thread.sleep(300)
      val (in, sr, sw, srRows) = drainIo()
      def mb(b: Long): String = f"${b / 1048576.0}%.1f"
      println(f"[runone] $name run$i: $dt%.2fs rows=$n " +
        s"input=${mb(in)}MB shufRead=${mb(sr)}MB " +
        s"shufWrite=${mb(sw)}MB shufRows=$srRows")
    }
    spark.stop()
  }
}
