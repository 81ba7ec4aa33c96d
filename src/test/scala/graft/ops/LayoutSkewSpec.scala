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
