// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SamplingSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("hash split is total, disjoint, stable, and ~80/10/10") {
    val docs = graft.Tables.documents(spark, sf)
    val assigned = Sampling.assignSplits(docs)
      .select("doc_id", "split").as[(Long, String)].collect()
    // total + disjoint: every document appears exactly once
    assert(assigned.length === 500)
    assert(assigned.map(_._1).distinct.length === 500)
    assert(assigned.map(_._2).toSet.subsetOf(Set("train", "val", "test")))
    // stable: a second evaluation assigns identically (pure function of
    // doc_id — no RNG, no partition-order sensitivity)
    val again = Sampling.assignSplits(docs)
      .select("doc_id", "split").as[(Long, String)].collect()
    assert(assigned.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
    // ratios concentrate near 205/256, 25/256, 26/256 (binomial over
    // 500 draws — ±5σ bounds keep this deterministic-in-practice while
    // catching a broken threshold)
    val n = assigned.groupBy(_._2).view.mapValues(_.length).toMap
    assert(math.abs(n("train") - 500 * 205.0 / 256) < 45)
    assert(math.abs(n("val") - 500 * 25.0 / 256) < 35)
    assert(math.abs(n("test") - 500 * 26.0 / 256) < 35)
  }
}
