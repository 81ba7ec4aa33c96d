// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.ShingleExpressions.word_ngrams

class ShingleExpressionsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def shingles(text: String, n: Int): Seq[String] =
    Seq(text).toDF("text")
      .select(word_ngrams(col("text"), n).as("sh"))
      .as[Seq[String]].head()

  test("golden semantics: positions, joins, short docs, empties") {
    assert(shingles("a b c d", 2) === Seq("a b", "b c", "c d"))
    assert(shingles("a b c d", 4) === Seq("a b c d"))
    // shorter than n → ONE whole-document shingle
    assert(shingles("a b", 5) === Seq("a b"))
    // empty tokens from repeated spaces are dropped before shingling
    assert(shingles("a  b   c", 2) === Seq("a b", "b c"))
    // degenerate inputs still produce exactly one row
    assert(shingles("", 3) === Seq(""))
    assert(shingles("   ", 3) === Seq(""))
    // null in → null out
    val r = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "text")
      .select(word_ngrams(col("text"), 2).as("sh")).head()
    assert(r.isNullAt(0))
  }

  test("matches the window-lead compose it replaced, on real data") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val n = 5
    val tok = docs
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .filter(length(col("w")) > 0)
    val old = (1 until n).foldLeft(tok) { (d, i) =>
        d.withColumn(s"w$i", lead("w", i).over(byDoc))
      }
      .filter(col(s"w${n - 1}").isNotNull)
      .select(col("doc_id"), concat_ws(" ",
        col("w") +: (1 until n).map(i => col(s"w$i")): _*).as("shingle"))
      .unionByName(docs
        .withColumn("ws", graft.functions.Text.tokens(col("text")))
        .filter(size(col("ws")) < n)
        .select(col("doc_id"), concat_ws(" ", col("ws")).as("shingle")))
    val neu = docs.select(col("doc_id"),
      explode(word_ngrams(col("text"), n)).as("shingle"))
    assert(neu.count() === old.count())
    assert(neu.exceptAll(old).isEmpty && old.exceptAll(neu).isEmpty)
  }

  test("shingling never shuffles (the point of the expression)") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = docs.select(col("doc_id"),
      explode(word_ngrams(col("text"), 5)).as("shingle"))
      .queryExecution.executedPlan
    val shuffles = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(shuffles.isEmpty, s"expected shuffle-free shingling:\n$plan")
  }

  test("SQL callers get the same expression") {
    org.apache.spark.sql.GraftSql.registerFunctions(spark)
    Seq(("x y z w v", 1L)).toDF("text", "id").createOrReplaceTempView("t_sh")
    val viaSql = spark.sql(
      "SELECT graft_word_ngrams(text, 3) AS sh FROM t_sh")
      .as[Seq[String]].head()
    assert(viaSql === Seq("x y z", "y z w", "z w v"))
  }
}
