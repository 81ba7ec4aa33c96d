// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The `spark.sql.extensions=graft.GraftExtensions` installation path:
  * a session built from a conf naming the extensions class resolves
  * the engine's SQL functions with no programmatic registration.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions-installed session resolves graft SQL functions") {
    val base = SparkTestSession.spark // ensures the SparkContext exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // `spark.sql.extensions=graft.GraftExtensions` is read from the
      // SparkContext's static conf at context creation — unreachable
      // from a suite sharing one context — so install through the
      // equivalent Builder.withExtensions seam, which applies the same
      // class to the same SparkSessionExtensions hook.
      val s = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions().apply(_))
        .getOrCreate()
      assert(s ne base, "builder must mint a fresh session for the conf")
      val row = s
        .sql("""SELECT
               |  graft_cosine_similarity(array(1d, 0d), array(1d, 0d)) AS c,
               |  graft_dot_product(array(1d, 2d), array(3d, 4d)) AS d
               |""".stripMargin)
        .head()
      assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
      assert(math.abs(row.getDouble(1) - 11.0) < 1e-12)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("SQL function and DataFrame API produce the same expression") {
    val spark = SparkTestSession.spark
    org.apache.spark.sql.GraftSql.registerFunctions(spark)
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    df.createOrReplaceTempView("vecs_ext_spec")
    val viaSql = spark
      .sql("SELECT graft_cosine_similarity(a, b) AS c FROM vecs_ext_spec")
      .head().getDouble(0)
    val viaApi = df
      .select(functions.VectorExpressions.cosine_similarity($"a", $"b"))
      .head().getDouble(0)
    assert(viaSql == viaApi) // bit-identical: same codegen'd expression
  }
}
