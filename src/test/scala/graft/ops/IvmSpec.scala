// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.lake.MiniLake

class IvmSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def view(t: MiniLake, lo: Long, hi: Long) = {
    val d = Ivm.deltas(t.readChanges(lo, hi), Seq("g"),
      Map("total" -> col("v")))
    val empty = Seq.empty[(String, Long, Long)].toDF("g", "n", "total")
    Ivm.applyDeltas(empty, d, Seq("g"), Seq("total"))
  }

  test("IVM tracks insert, delete, and update through the change feed") {
    val dir = Files.createTempDirectory("ivm").toString + "/t"
    val t = MiniLake(spark, dir)
    t.create(Seq(("a", 1L, 10L), ("a", 2L, 20L), ("b", 3L, 5L))
      .toDF("g", "k", "v"))                              // v0
    t.update(col("k") === 2L, Map("v" -> lit(25L)))      // v1: 20 → 25
    t.delete(col("g") === "b")                           // v2: b leaves
    // maintain incrementally: two steps over disjoint version ranges
    val step1 = {
      val d = Ivm.deltas(t.readChanges(0, 1), Seq("g"),
        Map("total" -> col("v")))
      val empty = Seq.empty[(String, Long, Long)].toDF("g", "n", "total")
      Ivm.applyDeltas(empty, d, Seq("g"), Seq("total"))
    }
    val step2 = Ivm.applyDeltas(step1,
      Ivm.deltas(t.readChanges(2, 2), Seq("g"), Map("total" -> col("v"))),
      Seq("g"), Seq("total"))
    val got = step2.as[(String, Long, Long)].collect().toSet
    // update folded in (25 not 20); group b gone because its n hit 0
    assert(got === Set(("a", 2L, 35L)))
    // and it equals the direct aggregate of the final snapshot
    val direct = t.snapshot().groupBy("g")
      .agg(count(lit(1)).as("n"), sum("v").as("total"))
      .as[(String, Long, Long)].collect().toSet
    assert(got === direct)
    MiniLake.deleteRecursively(dir)
  }

  test("re-applying the same version range double-counts (documenting " +
      "why watermarks gate the fold)") {
    val dir = Files.createTempDirectory("ivm2").toString + "/t"
    val t = MiniLake(spark, dir)
    t.create(Seq(("a", 1L, 10L)).toDF("g", "k", "v"))
    val once = view(t, 0, 0).as[(String, Long, Long)].collect().toSet
    val twice = Ivm.applyDeltas(view(t, 0, 0),
      Ivm.deltas(t.readChanges(0, 0), Seq("g"), Map("total" -> col("v"))),
      Seq("g"), Seq("total")).as[(String, Long, Long)].collect().toSet
    assert(once === Set(("a", 1L, 10L)))
    assert(twice === Set(("a", 2L, 20L)),
      "deltas are NOT idempotent — exactly-once version ranges required")
    MiniLake.deleteRecursively(dir)
  }

  test("q111 expectations: NULL predicate counts as violation") {
    val df = Seq[(java.lang.Long, String)]((1L, "x"), (null, "y"))
      .toDF("a", "b")
    val r = Profiling.expectations(df, Seq("a_pos" -> (col("a") > 0)))
      .as[(String, Long, Long, Double)].collect()
    assert(r.toSeq === Seq(("a_pos", 2L, 1L, 0.5)))
  }
}
