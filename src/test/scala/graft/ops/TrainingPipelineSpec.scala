// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

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

  test("q125: forget-user purges every target row and audits from the CDF") {
    val rows = Pipeline.q125ForgetUser(spark, sf).collect()
    val ev = graft.Tables.events(spark, sf)
    val expected = ev.filter("user_id % 29 = 3")
      .groupBy("user_id").count().collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("count")).toMap
    assert(rows.length === expected.size)
    rows.foreach { r =>
      assert(r.getAs[Long]("rows_purged") ===
        expected(r.getAs[Long]("user_id")))
      assert(r.getAs[Long]("remaining") === 0L)
    }
  }

  test("q126: SCD2 intervals are contiguous, alternating, half-open") {
    val rows = EventsOps.q126Scd2(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("user_id")).values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("valid_from_ms"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // each interval closes exactly where the next opens
          assert(a.getAs[Long]("valid_to_ms") ===
            b.getAs[Long]("valid_from_ms"))
          // a change point really changes the status
          assert(a.getAs[String]("status") !== b.getAs[String]("status"))
        case _ => ()
      }
      assert(sorted.last.getAs[Long]("valid_to_ms") === -1L) // open current
    }
  }

  test("q127: trade flows cover all nation pairs and conserve line items") {
    val rows = Relational.q127TradeFlows(spark, sf).collect()
    // ≤ 25×24 ordered cross-nation pairs; sparse at the spec's tiny SF
    assert(rows.nonEmpty && rows.length <= 25 * 24)
    assert(rows.forall(r =>
      r.getAs[String]("supp_nation") != r.getAs[String]("cust_nation")))
    val expected = graft.Tables.lineitem(spark, sf)
      .join(graft.Tables.orders(spark, sf), org.apache.spark.sql.functions
        .col("l_orderkey") === org.apache.spark.sql.functions.col("o_orderkey"))
      .join(graft.Tables.customer(spark, sf), org.apache.spark.sql.functions
        .col("o_custkey") === org.apache.spark.sql.functions.col("c_custkey"))
      .join(graft.Tables.supplier(spark, sf), org.apache.spark.sql.functions
        .col("l_suppkey") === org.apache.spark.sql.functions.col("s_suppkey"))
      .filter("s_nationkey <> c_nationkey").count()
    assert(rows.map(_.getAs[Long]("n_items")).sum === expected)
  }

  test("q129: histogram conserves the row count within bucket bounds") {
    val rows = Profiling.q129ValueHistogram(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n")).sum ===
      graft.Tables.events(spark, sf).count())
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 0L && b <= Profiling.HistTopBucket.toLong)
    }
  }

  test("q130: prefix filtering loses no pair vs the exhaustive join") {
    import org.apache.spark.sql.functions._
    val filtered = Dedup.q130SetSimJoin(spark, sf).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"))).toSet
    // exhaustive candidate generation: every co-occurring pair
    val sh = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), explode(graft.functions.ShingleExpressions
        .word_ngrams(col("text"), Dedup.SetSimN)).as("g")).distinct()
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("k"))
    val brute = sh.as("a").join(sh.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("i"))
      .join(sz.select(col("doc_id").as("id1"), col("k").as("k1")), "id1")
      .join(sz.select(col("doc_id").as("id2"), col("k").as("k2")), "id2")
      .filter(col("i") * lit(1.0) / (col("k1") + col("k2") - col("i"))
        >= Dedup.SetSimTau)
      .select("id1", "id2").collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"))).toSet
    assert(filtered === brute)
  }

  test("q131: streaming top-k agrees with the batch ranking") {
    import org.apache.spark.sql.functions._
    // hour cast to string on both sides: ntz vs ltz carriers differ
    // (LocalDateTime vs Timestamp) while the wall-clock text agrees
    def key(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("hour", col("hour").cast("string"))
      .collect().map(r => (r.getAs[String]("hour"),
        r.getAs[String]("event_type"), r.getAs[Long]("n"),
        r.getAs[Long]("rk"))).toSet
    val streamed = key(graft.streaming.EventsStream.topKStream(spark, sf))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("hour").orderBy(col("n").desc, col("event_type"))
    val batch = key(graft.Tables.events(spark, sf)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3))
    assert(streamed === batch)
  }

  test("q132/q133/q134/q135: report invariants hold") {
    val funnel = EventsOps.q132FunnelConversion(spark, sf).collect()
    assert(funnel.nonEmpty)
    funnel.foreach { r =>
      assert(r.getAs[Long]("n_converted") <= r.getAs[Long]("n_user_days"))
      val c = r.getAs[Double]("conversion")
      assert(c >= 0.0 && c <= 1.0)
    }
    val plan = Sampling.q133RebalancePlan(spark, sf).collect()
    val target = plan.map(_.getAs[Long]("n")).max
    plan.foreach { r =>
      assert(r.getAs[Long]("target") === target)
      assert(r.getAs[Double]("rep_factor") >= 1.0)
    }
    val drift = Vectors.q134DriftTvd(spark, sf).collect()
    assert(drift.length === Vectors.DriftDims)
    drift.foreach { r =>
      val t = r.getAs[Double]("tvd")
      assert(t >= 0.0 && t <= 1.0)
    }
    val pairs = TextAnalysis.q135FrequentPairs(spark, sf).collect()
    val nDocs = graft.Tables.documents(spark, sf).count()
    pairs.foreach { r =>
      assert(r.getAs[String]("t1") < r.getAs[String]("t2"))
      assert(r.getAs[Long]("support") <= nDocs)
      assert(r.getAs[Long]("support") >=
        math.ceil(nDocs * TextAnalysis.PairMinSupport).toLong)
    }
  }

  test("q136-q140: sketch witnesses, gaps, diff, imputation, anomalies") {
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, sf)

    val cms = Profiling.q136CmsWitness(spark, sf).collect()
    assert(cms.map(_.getAs[Long]("exact_n")).sum === ev.count())
    cms.foreach { r =>
      assert(r.getAs[Boolean]("never_undercounts"))
      assert(r.getAs[Boolean]("within_eps"))
    }

    val gaps = EventsOps.q137ArrivalGaps(spark, sf).collect()
    // every event except each user's first contributes exactly one gap
    assert(gaps.map(_.getAs[Long]("n_gaps")).sum ===
      ev.count() - ev.select("user_id").distinct().count())
    gaps.foreach(r => assert(r.getAs[Double]("p50_gap_ms") <=
      r.getAs[Double]("p90_gap_ms")))

    val diff = Pipeline.q138VersionDiff(spark, sf).collect()
      .map(r => r.getAs[String]("category") -> r.getAs[Long]("n")).toMap
    val keys = graft.Tables.orders(spark, sf).select("o_orderkey")
    def n(cond: String) = keys.filter(cond).count()
    assert(diff.getOrElse("added", 0L) === n("o_orderkey % 3 = 1"))
    assert(diff.getOrElse("removed", 0L) ===
      n("o_orderkey % 3 = 0 AND o_orderkey % 6 = 0"))
    assert(diff.getOrElse("changed", 0L) ===
      n("o_orderkey % 9 = 3 AND o_orderkey % 6 <> 0"))

    val imp = Profiling.q139MedianImpute(spark, sf).collect()
    assert(imp.map(_.getAs[Long]("n_imputed")).sum ===
      ev.filter("event_id % 13 = 0").count())

    val anom = Profiling.q140ZscoreAnomalies(spark, sf).collect()
    // the first 7 days lack a full trailing window — never flagged
    assert(anom.take(7).forall(!_.getAs[Boolean]("anomaly")))
    assert(anom.length === graft.Tables.orders(spark, sf)
      .select("o_orderdate").distinct().count().toInt)
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

  // Closed-form entropy points: a digit-only doc is ONE class →
  // exactly 0 bits; a doc with all five classes in equal measure is
  // log2(5) ≈ 2.321928 bits; empty text is excluded, not a crash.
  test("q261: char-class entropy hits its closed-form endpoints") {
    import spark.implicits._
    val balanced = "aB" + "12" + " \t" + ",." + "éü"
    val docs = Seq((1L, "1234567890"), (2L, balanced), (3L, ""))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.charClassEntropyFrom(docs).collect()
      .map(r => (r.getAs[Long]("half_bit_bin"), r.getAs[Long]("n_docs"),
        r.getAs[Double]("avg_entropy_bits")))
    // bin 0 holds the 0-bit digit doc; bin 4 ([2.0, 2.5)) the
    // balanced 5-class doc; the empty doc appears nowhere
    assert(rows.toSeq === Seq((0L, 1L, 0.0), (4L, 1L, 2.321928)))
  }

  // Segmentation edges: terminal runs ("!?") count once, a doc with
  // no terminal at all is ONE sentence, and pure-punctuation docs
  // (all segments whitespace-only) are excluded rather than divided
  // by zero. Char counts are post-trim.
  test("q265: sentence segmentation handles runs, missing terminals, " +
      "and punctuation-only docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "One. Two! Three?"),   // 3 sentences: 3+3+5 chars
      (2L, "no terminal here"),   // 1 sentence: 16 chars
      (3L, "Hey!? Really!?"),     // runs collapse: 2 sentences: 3+6
      (4L, "..!!"),               // excluded: no non-empty segment
      (5L, "Also three chars.")   // 1 sentence: 16 chars
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.sentenceStatsFrom(docs).collect()
      .map(r => (r.getAs[Int]("n_sentences"), r.getAs[Long]("n_docs"),
        r.getAs[Double]("avg_sentence_chars")))
    assert(rows.toSeq === Seq(
      (1, 2L, 16.0),          // docs 2 and 5: (16+16)/2
      (2, 1L, 4.5),           // doc 3: (3+6)/2
      (3, 1L, 3.6667)))       // doc 1: (3+3+5)/3, 4-dp rounded
  }
}
