// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class HeavyHittersSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("misraGries keeps every item with freq > n/(k+1) (superset guarantee)") {
    // adversarial stream: heavy items interleaved with a long tail
    val heavy = Seq.fill(400)("H1") ++ Seq.fill(300)("H2")
    val tail = (0 until 600).map(i => s"t$i")
    val stream = new scala.util.Random(42).shuffle(heavy ++ tail)
    val n = stream.size
    val k = 8
    val kept = HeavyHitters.misraGries(stream.iterator, k).toSet
    assert(kept.size <= k)
    val mustSurvive = stream.groupBy(identity)
      .collect { case (x, occ) if occ.size > n / (k + 1) => x }
    mustSurvive.foreach(x => assert(kept.contains(x), s"$x must survive"))
  }

  test("q112 is exact and partitioning-independent despite the sketch") {
    val sf = "/root/testdata/sf0.001"
    val got = HeavyHitters.q112HeavyHitters(spark, sf)
      .as[(String, Long)].collect().toMap
    // ground truth: plain exact count, no sketch
    val exact = graft.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 500)
      .as[(String, Long)].collect().toMap
    assert(got.nonEmpty, "gate must not be vacuous at sf0.001")
    assert(got === exact)
  }
}
