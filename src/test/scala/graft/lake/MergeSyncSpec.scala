// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Three-clause MERGE ([[MiniLake.mergeSync]], Delta 2.3's
  * `whenNotMatchedBySource` DELETE beside update-matched and
  * insert-absent): the dimension-mirror sync. Hand-graph contracts for
  * the clause split, the CDF composition, DV interaction, identity
  * retention, and the append-only refusal.
  */
class MergeSyncSpec extends AnyFunSuite with BeforeAndAfterEach {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private var dir: String = _
  override def beforeEach(): Unit =
    dir = Files.createTempDirectory("msynclake").toString + "/t"
  override def afterEach(): Unit =
    MiniLake.deleteRecursively(dir)

  private def kv(rows: (Long, String)*) = rows.toDF("key", "value")

  test("mergeSync: update matched, insert absent, delete by-source") {
    val t = MiniLake(spark, dir)
    t.create(kv(1L -> "a", 2L -> "b", 3L -> "c"))
    // source no longer carries keys 1 and 3; key 2 updates; key 4 inserts
    val (nUpd, nIns, nDel) =
      t.mergeSync(kv(2L -> "B", 4L -> "d"), Seq("key"))
    assert((nUpd, nIns, nDel) === (1L, 1L, 2L))
    assert(t.snapshot().orderBy("key").as[(Long, String)].collect().toSeq ===
      Seq(2L -> "B", 4L -> "d"))
  }

  test("mergeSync publishes pre/post + insert + delete changes") {
    val t = MiniLake(spark, dir)
    t.create(kv(1L -> "a", 2L -> "b"))
    t.mergeSync(kv(2L -> "B", 5L -> "e"), Seq("key"))
    val ch = t.readChanges(1, 1)
      .select("key", "value", "_change_type")
      .as[(Long, String, String)].collect().toSet
    assert(ch === Set((1L, "a", "delete"), (2L, "b", "update_preimage"),
      (2L, "B", "update_postimage"), (5L, "e", "insert")))
  }

  test("mergeSync reads through deletion vectors and retires them") {
    val t = MiniLake(spark, dir)
    t.create(kv(1L -> "a", 2L -> "b", 3L -> "c"))
    t.deleteVectored(col("key") === 2L)
    // DV'd key 2 is ABSENT: the sync re-inserts it; key 1 has no
    // source row and deletes; key 3 updates
    val (nUpd, nIns, nDel) =
      t.mergeSync(kv(2L -> "B2", 3L -> "C"), Seq("key"))
    assert((nUpd, nIns, nDel) === (1L, 1L, 1L))
    assert(t.snapshot().orderBy("key").as[(Long, String)].collect().toSeq ===
      Seq(2L -> "B2", 3L -> "C"))
    // the rewrite folded the DV in: a fresh reopen reads identically
    assert(MiniLake(spark, dir).snapshot().count() === 2L)
  }

  test("mergeSync: matched rows keep identity, inserts continue, " +
      "deletes never free ids") {
    val t = MiniLake.identity(spark, dir, "rid")
    t.create(kv(10L -> "a", 20L -> "b", 30L -> "c")) // rids 1, 2, 3
    val rid20 = t.snapshot().filter(col("key") === 20L)
      .select("rid").as[Long].head()
    t.mergeSync(kv(20L -> "B", 40L -> "d"), Seq("key"))
    val got = t.snapshot().select("key", "rid").as[(Long, Long)]
      .collect().toMap
    assert(got(20L) === rid20)          // matched keeps its id
    assert(got(40L) === 4L)             // insert continues past hw 3
    assert(got.keySet === Set(20L, 40L))
    // a later insert continues from 4 — deleted rows freed nothing
    t.append(kv(50L -> "e").withColumn("key", col("key")))
    assert(t.snapshot().filter(col("key") === 50L)
      .select("rid").as[Long].head() === 5L)
  }

  test("mergeSync refuses on append-only tables") {
    val t = MiniLake(spark, dir)
    t.create(kv(1L -> "a"))
    t.setTableProperty(MiniLake.AppendOnlyProp, "true")
    val e = intercept[IllegalArgumentException](
      t.mergeSync(kv(1L -> "A"), Seq("key")))
    assert(e.getMessage.contains("append-only"))
  }

  test("mergeSync to empty source deletes everything") {
    val t = MiniLake(spark, dir)
    t.create(kv(1L -> "a", 2L -> "b"))
    val (nUpd, nIns, nDel) =
      t.mergeSync(MiniLake.emptyDf(spark, t.schema), Seq("key"))
    assert((nUpd, nIns, nDel) === (0L, 0L, 2L))
    assert(t.snapshot().count() === 0L)
  }
}
