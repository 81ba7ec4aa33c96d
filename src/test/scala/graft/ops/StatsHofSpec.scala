// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** q106 (decimal-exact moment statistics) and q108 (higher-order-
  * function vector math): the load-bearing property is ORDER
  * INDEPENDENCE — the reported doubles must be bit-identical across
  * partitionings, which is what makes them hash-comparable to a
  * single-threaded oracle.
  */
class StatsHofSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q106: moments are bit-identical under any partitioning") {
    val base = Profiling.q106StatsProfile(spark, sf).collect().toSeq
    // recompute over a deliberately different physical layout
    val shuffled = {
      // raw read (ts stays a nanos long, the layout Tables.events
      // expects) — only the row-to-partition assignment changes
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val e = spark.read.parquet(s"$sf/events.parquet")
        .repartition(13, col("value"))
      val dir = graft.Scratch.dir("graft_q106").toString
      e.write.mode("overwrite").parquet(s"$dir/events.parquet")
      Profiling.q106StatsProfile(spark, dir).collect().toSeq
    }
    assert(base === shuffled)
  }

  test("q106: stddev matches Spark's stddev_samp within tolerance") {
    val got = Profiling.q106StatsProfile(spark, sf)
      .select("event_type", "stddev_v").as[(String, Double)].collect().toMap
    val ref = graft.Tables.events(spark, sf)
      .groupBy("event_type").agg(stddev_samp(col("value")).as("sd"))
      .as[(String, Double)].collect().toMap
    assert(got.keySet === ref.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - ref(k)) < 1e-3, s"$k: $v vs ${ref(k)}")
    }
  }

  test("q108: HOF kernels agree with direct double math within 1e-4") {
    val got = Vectors.q108HofVectorMath(spark, sf)
      .as[(Long, Long, Long, Double, Double)].collect()
    val raw = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(got.length === raw.size)
    got.foreach { case (id, dim, nPos, l1, revDot) =>
      val v = raw(id)
      assert(dim === v.length)
      assert(nPos === v.count(_ > 0))
      assert(math.abs(l1 - v.map(math.abs).sum) < 1e-4, s"vec $id l1")
      val rd = v.zip(v.reverse).map { case (a, b) => a * b }.sum
      assert(math.abs(revDot - rd) < 1e-4, s"vec $id rev_dot")
    }
  }

  test("q117: rolling WAU equals a direct trailing-range recount") {
    val got = EventsOps.q117RollingActive(spark, sf)
      .as[(String, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    // direct (quadratic) recount: users with any activity in the
    // trailing 7-day range ending at each day
    val ud = graft.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
      .as[(Long, java.sql.Date)].collect()
    val byDay = ud.groupBy(_._2).map { case (d, xs) =>
      d -> xs.map(_._1).toSet
    }
    got.foreach { case (dayStr, dau, wau, stick) =>
      val day = java.sql.Date.valueOf(dayStr)
      assert(dau === byDay(day).size.toLong, s"dau $dayStr")
      val trailing = byDay.collect {
        case (d, users)
            if !d.after(day) &&
              d.toLocalDate.plusDays(6).compareTo(day.toLocalDate) >= 0 =>
          users
      }.foldLeft(Set.empty[Long])(_ ++ _)
      assert(wau === trailing.size.toLong, s"wau $dayStr")
      assert(wau >= dau, s"wau >= dau must hold at $dayStr")
      assert(math.abs(stick - math.rint(dau.toDouble / wau * 1e4) / 1e4)
        < 1e-12, s"stickiness $dayStr")
    }
  }

  test("q108: bit-identical under repartitioning (decimal accumulation)") {
    val a = Vectors.q108HofVectorMath(spark, sf).collect().toSeq
    val dir = graft.Scratch.dir("graft_q108").toString
    graft.Tables.embeddings(spark, sf).repartition(7)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val b = Vectors.q108HofVectorMath(spark, dir).collect().toSeq
    assert(a === b)
  }
}
