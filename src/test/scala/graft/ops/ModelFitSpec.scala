// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Semantic contracts for the in-engine model-fitting operators: OLS
  * (q203), decision-stump split search (q204), and isotonic
  * calibration (q205). Each is checked against an independent
  * driver-side reference computation on sf0.001 — small enough to
  * recompute exactly, structured differently enough (sequential PAV,
  * brute-force split scan, direct normal equations) that a shared bug
  * can't hide.
  */
class ModelFitSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q203: OLS matches direct normal equations on collected rows") {
    import org.apache.spark.sql.functions._
    val rows = graft.Tables.orders(spark, sf)
      .join(graft.Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        round(col("c_acctbal") * 100).cast("long"),
        round(col("o_totalprice") * 100).cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val direct = rows.groupBy(_._1).map { case (seg, xs) =>
      val n = BigInt(xs.length)
      val sx = xs.map(t => BigInt(t._2)).sum
      val sy = xs.map(t => BigInt(t._3)).sum
      val sxy = xs.map(t => BigInt(t._2) * BigInt(t._3)).sum
      val sxx = xs.map(t => BigInt(t._2) * BigInt(t._2)).sum
      val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
      val icpt = (sy * sxx - sx * sxy).toDouble / (n * sxx - sx * sx).toDouble
      seg -> ((math.rint(slope * 1e6) / 1e6, math.rint(icpt * 1e6) / 1e6))
    }
    val got = Eval.q203OlsSegment(spark, sf).collect()
      .map(r => r.getAs[String]("segment") ->
        ((r.getAs[Double]("slope"), r.getAs[Double]("intercept")))).toMap
    assert(got.keySet === direct.keySet)
    for ((seg, (sl, ic)) <- direct) {
      assert(math.abs(got(seg)._1 - sl) < 2e-6, s"slope $seg")
      assert(math.abs(got(seg)._2 - ic) < 2e-6, s"intercept $seg")
    }
  }

  test("q204: exactly one best split, and it minimizes brute-force Gini") {
    import org.apache.spark.sql.functions._
    val cand = Eval.q204DecisionStump(spark, sf).collect()
    val best = cand.filter(_.getAs[Boolean]("is_best"))
    assert(best.length === 1)
    // brute force: for every candidate, recompute weighted Gini from
    // the labeled rows and confirm the flagged row attains the minimum
    val rows = graft.Tables.orders(spark, sf).select(
        month(col("o_orderdate")).cast("long"),
        floor(col("o_totalprice") / 10000).cast("long"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def gini(feat: String, thr: Long): Double = {
      val vs = rows.map(t => (if (feat == "month") t._1 else t._2, t._3))
      val (l, r) = vs.partition(_._1 <= thr)
      val (nl, pl) = (l.length.toDouble, l.map(_._2).sum.toDouble)
      val (nr, pr) = (r.length.toDouble, r.map(_._2).sum.toDouble)
      val n = nl + nr
      2.0 * pl * (nl - pl) / (n * nl) + 2.0 * pr * (nr - pr) / (n * nr)
    }
    val all = cand.map(c => gini(c.getAs[String]("feature"),
      c.getAs[Long]("threshold")))
    val b = best.head
    val bg = gini(b.getAs[String]("feature"), b.getAs[Long]("threshold"))
    assert(math.abs(bg - all.min) < 1e-12)
    assert(math.abs(b.getAs[Double]("gini") - math.rint(bg * 1e6) / 1e6)
      < 1e-9)
  }

  test("q205: minmax isotonic equals the sequential PAV sweep") {
    val out = Eval.q205IsotonicCalibration(spark, sf).collect()
      .sortBy(_.getAs[Long]("b"))
    val n = out.map(_.getAs[Long]("n").toDouble)
    val p = out.map(_.getAs[Long]("p").toDouble)
    // classic pool-adjacent-violators over the same histogram
    case class Block(var w: Double, var s: Double) { def m = s / w }
    val st = scala.collection.mutable.Stack[Block]()
    for (i <- n.indices) {
      st.push(Block(n(i), p(i)))
      while (st.size > 1 && {
        val top = st.pop(); val prev = st.top
        if (prev.m >= top.m) { prev.w += top.w; prev.s += top.s; true }
        else { st.push(top); false }
      }) {}
    }
    // blocks carry bucket MASS (event counts), so walk them against
    // the per-bucket weights to expand back to one value per bucket
    val blocks = st.toList.reverse
    val fit = Array.fill(n.length)(0.0)
    var bi = 0; var acc = 0.0
    for (i <- n.indices) {
      fit(i) = blocks(bi).m
      acc += n(i)
      if (acc >= blocks(bi).w - 1e-9) { acc = 0.0; bi += 1 }
    }
    val got = out.map(_.getAs[Double]("iso"))
    for (i <- n.indices)
      assert(math.abs(got(i) - math.rint(fit(i) * 1e6) / 1e6) < 2e-6,
        s"bucket $i: got ${got(i)} pav ${fit(i)}")
    // the fit is monotone and actually pooled somewhere
    assert(got.zip(got.tail).forall { case (a, b) => a <= b + 1e-12 })
    val rate = out.map(_.getAs[Double]("rate"))
    assert(got.zip(rate).exists { case (a, b) => math.abs(a - b) > 1e-9 })
  }
}
