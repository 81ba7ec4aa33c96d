// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Row tracking (stable `_row_id` — Delta 3.x row lineage): the
  * (pk ↔ _row_id) pairing must survive EVERY rewrite path — bin-pack
  * compaction, Z-order, DV materialization, UPDATE, mergeUpdate — and
  * only genuine inserts may consume fresh ids. Stability is the
  * identity preservation contract (see MiniLake.rowTracked's design
  * note), so each test drives a rewrite and asserts the pairing
  * bit-for-bit.
  */
class RowTrackingSpec extends AnyFunSuite with BeforeAndAfterEach {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private var dir: String = _
  override def beforeEach(): Unit =
    dir = Files.createTempDirectory("rowtrack").toString + "/t"
  override def afterEach(): Unit =
    MiniLake.deleteRecursively(dir)

  private def kv(rows: (Long, Long)*) =
    rows.toDF("key", "cents")

  private def pairing(t: MiniLake): Map[Long, Long] =
    t.snapshot().select("key", MiniLake.RowIdCol).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("physical rewrites preserve the pairing: compact, Z-order, " +
      "materializeDeletes") {
    val t = MiniLake.rowTracked(spark, dir)
    t.create(kv((1L to 20L).map(k => k -> k * 10L): _*).orderBy("key"))
    t.append(kv((21L to 30L).map(k => k -> k * 10L): _*).orderBy("key"))
    val before = pairing(t)
    assert(before === (1L to 30L).map(k => k -> k).toMap) // rid = key here
    t.compactFiles()
    assert(pairing(t) === before)
    t.compactZorder(("key", "cents"), numFiles = 2)
    assert(pairing(t) === before)
    t.deleteVectored(col("key") % 5 === 0L) // sidecar only: no rewrite
    val afterDelete = before.filter { case (k, _) => k % 5 != 0 }
    assert(pairing(t) === afterDelete)
    t.materializeDeletes() // rewrite minus DV'd rows
    assert(pairing(t) === afterDelete)
    // ids of deleted rows are burned forever: a fresh insert continues
    t.append(kv(100L -> 0L).orderBy("key"))
    assert(pairing(t)(100L) === 31L)
  }

  test("logical rewrites preserve the pairing: UPDATE and mergeUpdate " +
      "keep ids, only inserts consume") {
    val t = MiniLake.rowTracked(spark, dir)
    t.create(kv(1L -> 10L, 2L -> 20L, 3L -> 30L).orderBy("key"))
    val before = pairing(t)
    t.update(col("key") === 2L, Map("cents" -> lit(99L)))
    assert(pairing(t) === before)
    // mergeUpdate: matched 1,3 keep ids; key 4 inserts with id 4
    t.mergeUpdate(kv(1L -> 0L, 3L -> 0L, 4L -> 40L).orderBy("key"),
      Seq("key"))
    assert(pairing(t) === before + (4L -> 4L))
    // UPDATE on the row-id column itself is refused
    val ex = intercept[IllegalArgumentException] {
      t.update(col("key") === 1L, Map(MiniLake.RowIdCol -> lit(7L)))
    }
    assert(ex.getMessage.contains("cannot be updated"))
  }

  test("the change feed carries row ids on every image, so downstream " +
      "consumers join on lineage, not PKs") {
    val t = MiniLake.rowTracked(spark, dir)
    t.create(kv(1L -> 10L, 2L -> 20L).orderBy("key"))          // v0
    t.update(col("key") === 2L, Map("cents" -> lit(99L)))      // v1
    val ch = t.readChanges(1, 1)
      .select(MiniLake.RowIdCol, "_change_type")
      .as[(Long, String)].collect().toSet
    assert(ch === Set((2L, "update_preimage"), (2L, "update_postimage")))
  }

  test("a shallow clone carries the pairing and continues the id " +
      "stream (lineage survives the dev-fork workflow)") {
    val t = MiniLake.rowTracked(spark, dir)
    t.create(kv(1L -> 10L, 2L -> 20L).orderBy("key"))
    val cdir = Files.createTempDirectory("rowtrackclone").toString + "/c"
    try {
      val c = MiniLake.shallowClone(spark, dir, cdir)
      assert(pairing(c) === pairing(t))
      c.append(kv(3L -> 30L).orderBy("key"))
      assert(pairing(c)(3L) === 3L)
    } finally MiniLake.deleteRecursively(cdir)
  }
}
