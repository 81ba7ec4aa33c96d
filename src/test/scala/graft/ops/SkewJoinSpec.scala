// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** q115's load-bearing property: the hot-key join stays eligible for
  * AQE's runtime skew mitigation — with realistic thresholds scaled
  * down to test size, the executed plan must actually split the
  * skewed partition.
  */
class SkewJoinSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  test("q115: AQE splits the hot partition (isSkewJoin) with scaled " +
      "thresholds, result unchanged") {
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "512b",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      // keep AQE from collapsing the tiny test shuffle into one
      // partition, which would hide the skew
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.keys.map(k =>
      k -> spark.conf.getOption(k)).toMap
    // AQE splits a skewed reduce partition into per-MAPPER chunks, so a
    // single-file (single-mapper) test input is unsplittable no matter
    // how skewed: re-lay the events table as 8 files first (at real
    // scale the fact side always has many input splits).
    import org.apache.spark.sql.functions.col
    val dir = graft.Scratch.dir("graft_skewjoin").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .repartition(8, col("event_id"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val baseline = Skew.q115SkewJoin(spark, dir).collect().toSeq
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val df = Skew.q115SkewJoin(spark, dir)
      val rows = df.collect().toSeq
      assert(rows === baseline)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("isSkewJoin=true") || plan.contains("skew=true"),
        s"expected AQE to mark the join skewed:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
