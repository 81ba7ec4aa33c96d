// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Jaro–Winkler kernel contract: the textbook reference values, the
  * DuckDB conventions the gate oracle depends on (empty → 0, boost
  * threshold 0.7, prefix cap 4), null propagation, and
  * interpreted-vs-codegen agreement.
  */
class StringSimilaritySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    StringSimilarity.jaroWinkler(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))

  private def r4(x: Double): Double = math.rint(x * 10000) / 10000

  test("reference values match the published Jaro-Winkler examples " +
      "(pinned value-for-value against DuckDB's built-in)") {
    // the exact doubles DuckDB's jaro_winkler_similarity returns —
    // the gate compares 4-dp rounds, the spec pins the raw values
    assert(jw("MARTHA", "MARHTA") === 0.9611111111111111)
    assert(jw("DIXON", "DICKSONX") === 0.8133333333333332)
    assert(jw("DWAYNE", "DUANE") === 0.8400000000000001)
    assert(jw("abc", "abc") === 1.0)
    assert(jw("abc", "xyz") === 0.0)
  }

  test("DuckDB conventions: empty scores 0, boost only above jaro 0.7, " +
      "prefix bonus capped at 4") {
    assert(jw("", "") === 0.0)
    assert(jw("a", "") === 0.0)
    // jaro('abcdef','abwxyz') = 0.5556 <= 0.7: NO prefix boost even
    // though 2 chars of prefix agree (DuckDB returns the raw jaro)
    assert(r4(jw("abcdef", "abwxyz")) === 0.5556)
    // 9-char common prefix still only earns the 4-char bonus
    val a = "goldenrod lavender"
    val b = "goldenrod lace"
    assert(jw(a, b) === 0.9301587301587302)
  }

  test("expression: null-propagating, symmetric, codegen and " +
      "interpreted paths agree") {
    val df = Seq(
      (Option("MARTHA"), Option("MARHTA")),
      (Option("DWAYNE"), Option("DUANE")),
      (None: Option[String], Option("x")),
      (Option("x"), None: Option[String])).toDF("a", "b")
    val out = df.select(
      StringSimilarity.jaro_winkler(col("a"), col("b")).as("ab"),
      StringSimilarity.jaro_winkler(col("b"), col("a")).as("ba"))
      .collect()
    assert(out(0).getDouble(0) === 0.9611111111111111)
    assert(out(0).getDouble(0) === out(0).getDouble(1))
    assert(out(1).getDouble(0) === out(1).getDouble(1))
    assert(out(2).isNullAt(0) && out(2).isNullAt(1))
    assert(out(3).isNullAt(0) && out(3).isNullAt(1))
    // interpreted path (eval) must equal the codegen'd column result
    assert(jw("DWAYNE", "DUANE") === out(1).getDouble(0))
  }
}
