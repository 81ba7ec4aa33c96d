// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Closed-form endpoints for the anonymity metrics. */
class PrivacySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // Entropy l-diversity separates what distinct-l cannot: a uniform
  // 3-value class sits exactly AT ln 3 and passes; a single-value
  // class scores 0; a 90%-dominated class still has l_distinct = 3
  // yet FAILS the entropy bar — the dominance leak the metric exists
  // to catch.
  test("q266: uniform-3 passes at exactly ln 3, dominated-3 fails " +
      "despite l_distinct = 3") {
    val rows =
      (1 to 10).flatMap(_ => Seq((0, "uniform", 1), (0, "uniform", 2),
        (0, "uniform", 3))) ++
      (1 to 30).map(_ => (0, "single", 7)) ++
      ((1 to 28).map(_ => (0, "dominated", 1)) ++
        Seq((0, "dominated", 2), (0, "dominated", 3)))
    val df = rows.toDF("c_nationkey", "c_mktsegment", "sens")
    val got = Privacy.entropyLDiversityFrom(df).collect()
      .map(r => r.getAs[String]("c_mktsegment") ->
        ((r.getAs[Long]("l_distinct"), r.getAs[Double]("entropy"),
          r.getAs[Boolean]("meets_entropy_l3")))).toMap
    assert(got("uniform")._1 === 3L)
    assert(got("uniform")._2 === 1.098612) // 6-dp round of ln 3
    assert(got("uniform")._3, got.toString)
    assert(got("single") === ((1L, 0.0, false)))
    assert(got("dominated")._1 === 3L) // distinct-l is blind here
    assert(!got("dominated")._3, got.toString)
  }
}
