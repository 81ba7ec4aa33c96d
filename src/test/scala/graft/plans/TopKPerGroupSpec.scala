// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The custom TopKPerGroup operator: agreement with the window-based
  * plan, the partial→exchange→final physical shape, and edge cases
  * (ties, groups smaller than k).
  */
class TopKPerGroupSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("operator result == window row_number result on real data") {
    val sf = "/root/testdata/sf0.001"
    val viaOperator = graft.ops.Relational
      .q86TopKOperator(spark, sf).collect().toSeq
    val viaWindow = graft.ops.Relational
      .q8TopOrdersPerSegment(spark, sf).collect().toSeq
    assert(viaOperator === viaWindow)
  }

  test("plans as partial → exchange → final (shuffle sees pruned rows only)") {
    val df = Seq((1, 10.0), (1, 20.0), (2, 5.0)).toDF("g", "v")
    val top = TopKPerGroup.topK(df, Seq("g"), Seq(("v", false)), 1)
    val plan = top.queryExecution.executedPlan.toString
    val hits = "TopKPerGroup \\[".r.findAllIn(plan).size
    assert(hits === 2, plan) // partial and final
    // the exchange must sit between the two operator instances
    val partialIdx = plan.lastIndexOf("TopKPerGroup [")
    val finalIdx = plan.indexOf("TopKPerGroup [")
    val exchangeIdx = plan.indexOf("Exchange")
    assert(finalIdx < exchangeIdx && exchangeIdx < partialIdx, plan)
    // and no full sort anywhere (the window plan would have one)
    assert(!plan.contains("Sort "), plan)
  }

  test("groups smaller than k emit all their rows; ties resolve by order cols") {
    val df = Seq(
      ("a", 3L, 30.0), ("a", 1L, 30.0), ("a", 2L, 10.0), ("a", 4L, 5.0),
      ("b", 9L, 1.0)).toDF("g", "id", "v")
    val top = TopKPerGroup.topK(df, Seq("g"),
      Seq(("v", false), ("id", true)), 3)
      .orderBy("g", "id")
      .as[(String, Long, Double)].collect().toSeq
    assert(top === Seq(
      ("a", 1L, 30.0), ("a", 2L, 10.0), ("a", 3L, 30.0),
      ("b", 9L, 1.0)))
  }

  test("property: operator == window row_number plan on random data") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val rowGen = for {
      g <- Gen.choose(0, 5)
      v <- Gen.choose(-50, 50)
      id <- Gen.choose(0L, 1000L)
    } yield (g, v.toDouble, id)
    (0 until 4).foreach { run =>
      val rows = Gen.listOfN(200, rowGen)
        .pureApply(Gen.Parameters.default, Seed(42L + run))
        // unique ids make the ordering total, so both plans must agree
        // exactly (same (g, id) never appears twice)
        .distinctBy(r => (r._1, r._3))
      val k = 1 + run
      val df = rows.toDF("g", "v", "id")
      val viaOperator = TopKPerGroup
        .topK(df, Seq("g"), Seq(("v", false), ("id", true)), k)
        .orderBy("g", "v", "id").collect().toSeq
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("g").orderBy(col("v").desc, col("id"))
      val viaWindow = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).drop("rn")
        .orderBy("g", "v", "id").collect().toSeq
      assert(viaOperator === viaWindow, s"diverged at run=$run k=$k")
    }
  }

  test("group-key filters push through the node; order-column filters don't") {
    val df = Seq((1, 10.0), (1, 20.0), (2, 5.0), (2, 7.0)).toDF("g", "v")
    val top = TopKPerGroup.topK(df, Seq("g"), Seq(("v", false)), 1)

    val onGroup = top.filter(col("g") === 1)
    val optimized = onGroup.queryExecution.optimizedPlan
    // after pushdown the TopK node sits ABOVE the filter (node is the
    // plan root, filter moved into its child)
    assert(optimized.isInstanceOf[TopKPerGroup.TopKPerGroupNode], optimized)
    assert(onGroup.as[(Int, Double)].collect().toSeq === Seq((1, 20.0)))

    // a filter on the ORDER column must NOT push (it would change
    // which rows win the heap)
    val onValue = top.filter(col("v") < 15.0)
    val optimized2 = onValue.queryExecution.optimizedPlan
    assert(!optimized2.isInstanceOf[TopKPerGroup.TopKPerGroupNode], optimized2)
    assert(onValue.as[(Int, Double)].collect().toSeq === Seq((2, 7.0)))
  }

  test("filters on a COMPUTED group key's inputs don't push") {
    // group by g % 2: a filter on `g` references only group-expr
    // inputs, but is NOT constant within a group — pushing it below
    // the heap would change which row wins (g=3 beats g=1 here).
    // The rule must require plain-Attribute group keys.
    import org.apache.spark.sql.catalyst.expressions.{Literal, Pmod, SortOrder}
    val df = Seq((1, 1.0), (3, 9.0), (2, 2.0)).toDF("g", "v")
    val out = df.queryExecution.analyzed.output
    val node = TopKPerGroup.TopKPerGroupNode(
      Seq(Pmod(out(0), Literal(2))),
      Seq(SortOrder(out(1),
        org.apache.spark.sql.catalyst.expressions.Descending)),
      1, df.queryExecution.analyzed)
    TopKPerGroup.install(spark)
    val top = org.apache.spark.sql.GraftSql.datasetOf(spark, node)
    val filtered = top.filter(col("g") =!= 3)
    val optimized = filtered.queryExecution.optimizedPlan
    // the filter must stay ABOVE the node (root is NOT the TopK node)
    assert(!optimized.isInstanceOf[TopKPerGroup.TopKPerGroupNode], optimized)
    // odd group's winner is g=3 (v=9); filtering it afterwards leaves
    // only the even group's row — pushing would have returned (1, 1.0)
    assert(filtered.as[(Int, Double)].collect().toSeq === Seq((2, 2.0)))
  }

  test("extensions-installed session plans the node without explicit install") {
    val base = SparkTestSession.spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s = org.apache.spark.sql.SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.GraftExtensions().apply(_))
        .getOrCreate()
      import s.implicits._
      val df = Seq((1, 1.0), (1, 2.0)).toDF("g", "v")
      val node = TopKPerGroup.TopKPerGroupNode(
        df.queryExecution.analyzed.output.take(1),
        Seq(org.apache.spark.sql.catalyst.expressions.SortOrder(
          df.queryExecution.analyzed.output(1),
          org.apache.spark.sql.catalyst.expressions.Descending)),
        1, df.queryExecution.analyzed)
      val out = org.apache.spark.sql.GraftSql.datasetOf(s, node)
      assert(out.queryExecution.executedPlan.toString
        .contains("TopKPerGroup ["))
      assert(out.as[(Int, Double)].collect().toSeq === Seq((1, 2.0)))
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
  }
}
