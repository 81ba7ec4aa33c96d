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

  test("merge/concurrent verbs refuse identity tables explicitly") {
    val t = MiniLake.identity(spark, dir, "row_id")
    t.create(kv(1L -> "a").orderBy("key"))
    val exM = intercept[IllegalArgumentException] {
      t.merge(kv(2L -> "b"), kv(), Seq("key"))
    }
    assert(exM.getMessage.contains("not supported"))
    val exC = intercept[IllegalArgumentException] {
      t.appendConcurrent(kv(2L -> "b"))
    }
    assert(exC.getMessage.contains("not supported"))
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
