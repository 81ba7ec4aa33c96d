// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class CorpusHygieneSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q105: dup_frac bounded, consistent with counts, sharing is mutual") {
    val r = CorpusHygiene.q105DupPassages(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(r.nonEmpty)
    r.foreach { case (id, n, dup, frac) =>
      assert(dup >= 0 && dup <= n, s"doc $id: n_dup out of range")
      assert(math.abs(frac - math.rint(dup.toDouble / n * 1e4) / 1e4) < 1e-12,
        s"doc $id: dup_frac inconsistent with counts")
    }
    // a shingle shared "across documents" needs at least two docs —
    // a corpus where exactly one doc reports duplication is impossible
    val withDup = r.count(_._3 > 0)
    assert(withDup != 1, "exactly one doc with shared passages")
  }

  test("q105: every doc of the corpus is reported exactly once") {
    val n = graft.Tables.documents(spark, sf).count()
    val r = CorpusHygiene.q105DupPassages(spark, sf)
    assert(r.count() === n)
    assert(r.select("doc_id").distinct().count() === n)
  }

  test("q107: per-source tallies reconcile with a direct recount") {
    val r = CorpusHygiene.q107C4Filter(spark, sf)
      .as[(String, Long, Long, Double, Option[Double])].collect()
    val total = graft.Tables.documents(spark, sf).count()
    assert(r.map(_._2).sum === total, "n_docs must partition the corpus")
    r.foreach { case (src, nDocs, nKept, frac, meanTok) =>
      assert(nKept <= nDocs, src)
      assert(math.abs(frac - math.rint(nKept.toDouble / nDocs * 1e4) / 1e4)
        < 1e-12, src)
      assert(meanTok.isDefined == (nKept > 0),
        s"$src: kept_mean_tokens null iff nothing kept")
    }
    // thresholds must actually split this corpus, else the gate is vacuous
    val kept = r.map(_._3).sum
    assert(kept > 0 && kept < total, s"degenerate filter: $kept/$total")
  }
}
