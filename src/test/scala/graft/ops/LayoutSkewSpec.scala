// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class LayoutSkewSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val orders = graft.Tables.orders(spark, "/root/testdata/sf0.001")
    val lineitem = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    // clean both the catalog entry and any orphaned location from a
    // previous JVM (the in-memory catalog forgets, the dir remains)
    Seq("orders_b", "lineitem_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      graft.lake.MiniLake.deleteRecursively(
        spark.conf.get("spark.sql.warehouse.dir")
          .stripPrefix("file:") + s"/$t")
    }
    Layout.writeBucketed(orders, "orders_b", Seq("o_orderkey"), 4)
    Layout.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_b", Seq("o_orderkey"), 4)
    val plain = lineitem.join(orders,
      lineitem("l_orderkey") === orders("o_orderkey"))
    val bucketed = spark.table("lineitem_b")
      .join(spark.table("orders_b"), "o_orderkey")
    assert(!Layout.hasShuffle(bucketed),
      "bucketed join must not shuffle:\n" +
        bucketed.queryExecution.executedPlan.toString)
    // and it is still correct
    assert(bucketed.count() === plain.count())
  }

  test("q110 gate: bucketed-join plan shuffles nothing below the join " +
      "and matches the plain-join aggregate") {
    Seq("graft_b_customer", "graft_b_orders").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      graft.lake.MiniLake.deleteRecursively(
        spark.conf.get("spark.sql.warehouse.dir")
          .stripPrefix("file:") + s"/$t")
    }
    val sf = "/root/testdata/sf0.001"
    val r = Layout.q110BucketedJoin(spark, sf)
    val got = r.collect().toSeq // materialize so AQE finalizes the plan
    // the join consumes the bucketed layout directly: no shuffle
    // exchange may appear BELOW the join (the aggregate above it may
    // legitimately exchange on the group key). collect() does not
    // descend into AdaptiveSparkPlanExec / query stages, so walk those
    // wrappers explicitly.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allNodes(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      p +: kids.flatMap(allNodes)
    }
    val plan = r.queryExecution.executedPlan
    val joins = allNodes(plan).collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(joins.nonEmpty, s"expected a sort-merge join:\n$plan")
    joins.foreach { j =>
      val shufflesBelow = allNodes(j).drop(1).collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }
      assert(shufflesBelow.isEmpty,
        s"bucketed join must not shuffle its inputs:\n$j")
    }
    // and the numbers equal the layout-free plan
    val c = graft.Tables.customer(spark, sf).select("c_custkey", "c_mktsegment")
    val o = graft.Tables.orders(spark, sf).select("o_custkey", "o_orderkey")
    val plain = c.join(o, c("c_custkey") === o("o_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("c_custkey")).as("n_customers"))
      .orderBy("c_mktsegment")
      .collect().toSeq
    assert(got === plain)
  }

  test("salted sum equals plain sum") {
    val df = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val plain = df.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("qty"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = Skew.saltedSum(df, Seq("l_returnflag"),
      Map("qty" -> "l_quantity"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted.keySet === plain.keySet)
    salted.foreach { case (k, v) =>
      assert(math.abs(v - plain(k)) < 1e-6, k)
    }
  }

  test("salted join equals plain join") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    val dim = graft.Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey").as("k"), col("o_orderpriority"))
    val plain = li.join(dim, "k").count()
    val salted = Skew.saltedJoin(li, dim, Seq("k")).count()
    assert(salted === plain)
  }

  test("native expressions are SQL-callable after registration") {
    org.apache.spark.sql.GraftSql.registerFunctions(spark)
    val r = spark.sql(
      """SELECT round(graft_cosine_similarity(array(1.0d, 0.0d), array(1.0d, 0.0d)), 6) c,
        |       graft_dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) d""".stripMargin)
      .head()
    assert(r.getDouble(0) === 1.0)
    assert(r.getDouble(1) === 11.0)
  }
}
