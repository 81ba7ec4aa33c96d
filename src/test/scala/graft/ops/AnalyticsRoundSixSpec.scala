// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Semantic contracts for the round-6 operators: BM25 retrieval,
  * retention cohorts, last-touch attribution, lake schema evolution,
  * and fixed-point PageRank over the trade graph.
  */
class AnalyticsRoundSixSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q142: BM25 ranks by score, scores positive, k bounded") {
    val rows = TextAnalysis.q142Bm25TopK(spark, sf).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.forall(_ > 0))
    // rank order == descending score order (ties broken by doc_id asc)
    assert(scores.sameElements(scores.sorted(Ordering[Double].reverse)))
    val ranks = rows.map(_.getAs[Long]("rank"))
    assert(ranks.sameElements(1L to rows.length.toLong))
  }

  test("q143: cohort cells partition active (user, day) pairs") {
    import org.apache.spark.sql.functions._
    val cells = EventsOps.q143RetentionCohorts(spark, sf).collect()
    // offset 0 exists for every cohort (the cohort-defining day itself)
    val byCohort = cells.groupBy(_.getAs[String]("cohort_day"))
    byCohort.foreach { case (_, cs) =>
      assert(cs.exists(_.getAs[Long]("offset_days") == 0L))
      assert(cs.forall(_.getAs[Long]("offset_days") >= 0L))
    }
    // total cell mass == distinct (user, active-day) pairs
    val totalCellUsers = cells.map(_.getAs[Long]("n_users")).sum
    val pairs = graft.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct().count()
    assert(totalCellUsers === pairs)
  }

  test("q144: every purchase is attributed exactly once") {
    import org.apache.spark.sql.functions._
    val rows = EventsOps.q144LastTouch(spark, sf).collect()
    val attributed = rows.map(_.getAs[Long]("n_purchases")).sum
    val purchases = graft.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(attributed === purchases)
    // channels are source event types or the no-touch bucket — never
    // 'purchase' itself (a purchase cannot attribute to a purchase)
    val channels = rows.map(_.getAs[String]("channel")).toSet
    assert(!channels.contains("purchase"))
  }

  test("q145: pre-evolution rows read back null-filled, new rows typed") {
    val out = Pipeline.q145SchemaEvolution(spark, sf).collect()
    val legacy = out.map(_.getAs[Long]("n_legacy")).sum
    val total = out.map(_.getAs[Long]("n")).sum
    val docs = graft.Tables.documents(spark, sf).count()
    assert(total === docs)
    val below = graft.Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") < 250).count()
    assert(legacy === below)
  }

  test("q147: blocked pairs are ordered, verified, and block-consistent") {
    val rows = Dedup.q147ErBlocking(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[String]("name1") < r.getAs[String]("name2"))
      assert(r.getAs[Long]("dist") >= 1 && r.getAs[Long]("dist") <= 4)
      assert(r.getAs[Long]("parts1") >= 1 && r.getAs[Long]("parts2") >= 1)
    }
    // no duplicate pairs
    val keys = rows.map(r => (r.getAs[String]("name1"), r.getAs[String]("name2")))
    assert(keys.distinct.length === keys.length)
  }

  test("q148: the two-phase skyline equals brute-force dominance") {
    import org.apache.spark.sql.functions.col
    val got = Relational.q148Skyline(spark, sf).collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[Long]("size"),
        r.getAs[Double]("price"))).toSet
    val all = graft.Tables.part(spark, sf)
      .select(col("p_partkey").cast("long"), col("p_size").cast("long"),
        col("p_retailprice"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val brute = all.filter { case (_, sz, pr) =>
      !all.exists { case (_, sz2, pr2) =>
        sz2 <= sz && pr2 <= pr && (sz2 < sz || pr2 < pr)
      }
    }.toSet
    assert(got === brute)
  }

  test("q149: quantized exact correlation tracks Spark's float corr") {
    import org.apache.spark.sql.functions.{col, corr}
    val got = Profiling.q149CorrMatrix(spark, sf).collect()
      .map(r => (r.getAs[String]("col_x"), r.getAs[String]("col_y")) ->
        r.getAs[Double]("corr")).toMap
    val li = graft.Tables.lineitem(spark, sf)
    val ref = li.agg(
      corr(col("l_quantity"), col("l_extendedprice")).as("qp"),
      corr(col("l_discount"), col("l_tax")).as("dt")).collect()(0)
    assert(math.abs(got(("qty", "price")) - ref.getAs[Double]("qp")) < 1e-4)
    assert(math.abs(got(("disc", "tax")) - ref.getAs[Double]("dt")) < 1e-4)
    // correlations are well-formed
    got.values.foreach(v => assert(v >= -1.0 && v <= 1.0))
  }

  test("q146: fixed-point PageRank conserves bounded mass") {
    val rows = Relational.q146PagerankTrade(spark, sf).collect()
    assert(rows.length === 25)
    val prs = rows.map(_.getAs[Long]("pr_scaled"))
    val teleport = 1000000000000L * 15L / (100L * 25L)
    // every node keeps at least its teleport mass; floors and dangling
    // edges only ever REMOVE mass, so the total stays under 1.0
    assert(prs.forall(_ >= teleport))
    assert(prs.sum <= 1000000000000L)
    // descending output order with deterministic tiebreak
    assert(prs.sameElements(prs.sorted(Ordering[Long].reverse)))
  }
}
