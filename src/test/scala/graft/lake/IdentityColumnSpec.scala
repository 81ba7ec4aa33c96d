// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** GENERATED ALWAYS AS IDENTITY: assignment order, the never-reuse
  * contract across DELETE, cold-reopen high-water recovery, the
  * ALWAYS refusal of caller-supplied values, the merge/concurrent
  * refusals, and clone metadata propagation.
  */
class IdentityColumnSpec extends AnyFunSuite with BeforeAndAfterEach {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private var dir: String = _
  override def beforeEach(): Unit =
    dir = Files.createTempDirectory("idlake").toString + "/t"
  override def afterEach(): Unit =
    MiniLake.deleteRecursively(dir)

  private def kv(rows: (Long, String)*) =
    rows.toDF("key", "value")

  private def ids(t: MiniLake): Map[Long, Long] =
    t.snapshot().select("key", "row_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("create assigns start, start+step, ... in batch sort order") {
    val t = MiniLake.identity(spark, dir, "row_id", start = 7L, step = 3L)
    t.create(kv(30L -> "c", 10L -> "a", 20L -> "b").orderBy("key"))
    assert(ids(t) === Map(10L -> 7L, 20L -> 10L, 30L -> 13L))
    // the identity column is part of the table schema
    assert(t.schema.fieldNames.contains("row_id"))
  }

  test("ids continue across appends and are never reused after DELETE") {
    val t = MiniLake.identity(spark, dir, "row_id")
    t.create(kv(1L -> "a", 2L -> "b").orderBy("key"))   // ids 1, 2
    t.append(kv(3L -> "c").orderBy("key"))              // id 3
    assert(t.delete(col("key") >= 2L) === 2L)           // burns 2, 3
    t.append(kv(4L -> "d").orderBy("key"))              // id 4, NOT 2
    assert(ids(t) === Map(1L -> 1L, 4L -> 4L))
  }

  test("a cold reopen recovers the high water from the log") {
    val t = MiniLake.identity(spark, dir, "row_id")
    t.create(kv(1L -> "a", 2L -> "b").orderBy("key"))
    t.delete(col("key") === 2L) // latest entry carries NO high water
    val fresh = MiniLake(spark, dir) // plain open: spec from the log
    fresh.append(kv(9L -> "z").orderBy("key"))
    assert(ids(fresh) === Map(1L -> 1L, 9L -> 3L))
  }

  test("overwrite keeps counting upward (replaced ids stay burned)") {
    val t = MiniLake.identity(spark, dir, "row_id")
    t.create(kv(1L -> "a", 2L -> "b").orderBy("key"))   // ids 1, 2
    t.overwrite(kv(5L -> "e").orderBy("key"))           // id 3
    assert(ids(t) === Map(5L -> 3L))
  }

  test("ALWAYS: caller-supplied identity values are rejected") {
    val t = MiniLake.identity(spark, dir, "row_id")
    val ex = intercept[IllegalArgumentException] {
      t.create(Seq((1L, "a", 99L)).toDF("key", "value", "row_id"))
    }
    assert(ex.getMessage.contains("cannot be user-supplied"))
  }

  test("remaining multi-writer verbs refuse identity tables " +
      "explicitly (no reservation discipline yet)") {
    val t = MiniLake.identity(spark, dir, "row_id")
    t.create(kv(1L -> "a").orderBy("key"))
    val exU = intercept[IllegalArgumentException] {
      t.mergeUpdate(kv(1L -> "A"), Seq("key"))
    }
    assert(exU.getMessage.contains("not supported"))
    val exA = intercept[IllegalArgumentException] {
      t.appendIfAbsent(kv(2L -> "b"), "app", 1L)
    }
    assert(exA.getMessage.contains("not supported"))
  }

  test("merge assigns ids only to rows that actually INSERT, " +
      "continuing from the high water; delete preimages keep ids") {
    val t = MiniLake.identity(spark, dir, "row_id")
    t.create(kv(1L -> "a", 2L -> "b", 3L -> "c").orderBy("key")) // 1..3
    // key 2 re-inserted (idempotent no-op: consumes NO id), key 4 new
    val (nIns, nDel) = t.merge(
      inserts = kv(2L -> "b2", 4L -> "d").orderBy("key"),
      deletes = kv(3L -> "c"), pks = Seq("key"))
    assert((nIns, nDel) === ((1L, 1L)))
    assert(ids(t) === Map(1L -> 1L, 2L -> 2L, 4L -> 4L))
    // the change feed carries assigned ids on inserts and the doomed
    // row's id on the delete preimage
    val ch = t.readChanges(1, 1).select("key", "row_id", "_change_type")
      .as[(Long, Long, String)].collect().toSet
    assert(ch === Set((4L, 4L, "insert"), (3L, 3L, "delete")))
    // merging ON the identity column is refused (inserts can't name it)
    val ex = intercept[IllegalArgumentException] {
      t.merge(kv(9L -> "z"), kv(), Seq("row_id", "key"))
    }
    assert(ex.getMessage.contains("can never supply it"))
  }

  test("appendConcurrent reserves id ranges: 4 racing writers, no " +
      "duplicate or reused id, contiguous coverage") {
    val t = MiniLake.identity(spark, dir, "row_id")
    t.create(kv(0L -> "seed").orderBy("key"))                  // id 1
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val writers = (1 to 4).map { w =>
      Future {
        val rows = (1 to 25).map(i => (w * 100L + i) -> s"w$w-$i")
        MiniLake(spark, dir).appendConcurrent(kv(rows: _*).orderBy("key"))
      }
    }
    Await.result(Future.sequence(writers), Duration.Inf)
    val assigned = t.snapshot().select("row_id").as[Long].collect()
    assert(assigned.length === 101)
    // every id exactly once, and — because each reservation claims a
    // contiguous block sized to its batch — coverage is exactly 1..101
    assert(assigned.distinct.length === 101)
    assert(assigned.sorted.toSeq === (1L to 101L))
    // the recovered high water continues past all reservations
    t.append(kv(999L -> "tail").orderBy("key"))
    assert(t.snapshot().filter(col("key") === 999L)
      .select("row_id").as[Long].head() === 102L)
  }

  test("shallow clone carries the identity spec AND high water") {
    val t = MiniLake.identity(spark, dir, "row_id")
    t.create(kv(1L -> "a", 2L -> "b").orderBy("key"))   // ids 1, 2
    val cloneDir = Files.createTempDirectory("idclone").toString + "/c"
    try {
      val c = MiniLake.shallowClone(spark, dir, cloneDir)
      c.append(kv(3L -> "c").orderBy("key"))            // id 3, not 1
      assert(ids(c) === Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
      // ALWAYS holds on the clone too
      intercept[IllegalArgumentException] {
        c.append(Seq((4L, "d", 99L)).toDF("key", "value", "row_id"))
      }
    } finally MiniLake.deleteRecursively(cloneDir)
  }
}
