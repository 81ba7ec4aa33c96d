// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.tools

import graft.SparkEntry

import org.apache.spark.sql.SparkSession

/** Dev-only experiment: time one query repeatedly with selected other
  * queries interleaved, to localize cross-query interference inside a
  * shared session (e.g. bench-order effects). Not part of the driver
  * contract.
  *
  * Usage: runMain graft.BenchProbe <sfDir> <q1,q2,...> (each run in
  * order, timed)
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    names.foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[probe] $name ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    spark.stop()
  }
}
