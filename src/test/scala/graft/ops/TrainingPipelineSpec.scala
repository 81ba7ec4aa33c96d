package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Semantic contracts for the round-5 training-pipeline operators:
  * stride chunking, leakage-guarded splits, sketch witnesses, PQ
  * compression, transition counts, and vocabulary coverage.
  */
class TrainingPipelineSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q118: stride chunks tile every document with exact overlap") {
    val rows = Chunking.q118StrideChunks(spark, sf).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("chunk_idx"))
      // starts advance by the stride; first chunk starts at token 1
      assert(sorted.head.getAs[Long]("token_start") === 1L)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("token_start") -
            a.getAs[Long]("token_start") === Chunking.StrideTokens.toLong)
          // declared overlap == actual intersection of the two spans
          val overlap = math.max(0L, a.getAs[Long]("token_end") -
            b.getAs[Long]("token_start") + 1)
          assert(b.getAs[Long]("overlap_tokens") === overlap)
        case _ => ()
      }
      // the final chunk reaches the last token, and no further
      val n = sorted.map(_.getAs[Long]("token_end")).max
      assert(sorted.last.getAs[Long]("token_end") === n)
      assert(sorted.last.getAs[Long]("token_start") <= n)
    }
  }

  test("q119: the split partitions the corpus and quarantines shingle-sharers") {
    val rows = Dedup.q119LeakageSplit(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("split")))
    val total = graft.Tables.documents(spark, sf).count()
    assert(rows.length.toLong === total) // every doc labeled exactly once
    rows.foreach { case (id, split) =>
      if (id % 10 == 7) assert(split === "test", s"doc $id")
      else assert(split == "train" || split == "quarantine", s"doc $id")
    }
    // the testdata plants near-duplicate pairs, so some leakage exists
    assert(rows.count(_._2 == "quarantine") > 0)
  }

  test("q120/q121: sketch and quantizer witnesses hold") {
    val pct = EventsOps.q120ApproxPctWitness(spark, sf).collect()
    assert(pct.nonEmpty)
    pct.foreach(r => assert(r.getAs[Boolean]("approx_within_5pct")))
    val pq = Vectors.q121PqQuantize(spark, sf).collect()
    assert(pq.length === graft.Tables.embeddings(spark, sf).count().toInt)
    pq.foreach(r => assert(r.getAs[Boolean]("pq_beats_baseline")))
    // deterministic: the sample-fit codebooks depend only on the data
    val rerun = Vectors.q121PqQuantize(spark, sf).collect()
    assert(rerun.map(_.toSeq).toSeq === pq.map(_.toSeq).toSeq)
  }

  test("q122: each user contributes exactly (events - 1) transitions") {
    val n = EventsOps.q122MarkovTransitions(spark, sf).collect()
      .map(_.getAs[Long]("n")).sum
    val ev = graft.Tables.events(spark, sf)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(n === expected)
  }

  test("q124: OOV counts are consistent and bounded") {
    val rows = TextAnalysis.q124VocabCoverage(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nTok = r.getAs[Long]("n_tokens")
      val nOov = r.getAs[Long]("n_oov")
      assert(nOov >= 0L && nOov <= nTok)
      assert(math.abs(r.getAs[Double]("oov_pct") -
        nOov.toDouble / nTok) < 1e-3)
    }
    // a 10-word vocab over a ~31-word corpus must leave real OOV mass
    assert(rows.map(_.getAs[Long]("n_oov")).sum > 0L)
  }
}
