// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.lake

import java.nio.file.Files

import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Bucketed-layout contracts: identical observable semantics to the
  * plain lake, but merge rewrites touch only the affected buckets.
  */
class BucketedLakeSpec extends AnyFunSuite with BeforeAndAfterEach {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private var dir: String = _
  override def beforeEach(): Unit =
    dir = Files.createTempDirectory("bucketlake").toString + "/t"
  override def afterEach(): Unit =
    MiniLake.deleteRecursively(dir)

  private def kv(rows: (Long, String)*) = rows.toDF("key", "value")
  private def seed = kv((0L until 64L).map(k => k -> s"v$k"): _*)

  test("snapshot and changes match plain-lake semantics") {
    val t = MiniLake.bucketed(spark, dir, Seq("key"), 8)
    t.create(seed)
    t.merge(kv(100L -> "new"), kv(3L -> "", 17L -> ""), Seq("key"))
    val snap = t.snapshot().orderBy("key").as[(Long, String)].collect()
    assert(snap.length === 63) // 64 - 2 deleted + 1 inserted
    assert(!snap.map(_._1).contains(3L) && !snap.map(_._1).contains(17L))
    assert(snap.map(_._1).contains(100L))
    val ch = t.readChanges(1, 1).select("key", "_change_type")
      .as[(Long, String)].collect().toSet
    assert(ch === Set((3L, "delete"), (17L, "delete"), (100L, "insert")))
    // schema carries no bucket column
    assert(t.snapshot().columns.toSeq === Seq("key", "value"))
  }

  test("merge rewrites only the buckets its delete keys hash into") {
    val t = MiniLake.bucketed(spark, dir, Seq("key"), 8)
    t.create(seed)
    val before = t.snapshot(0).inputFiles.toSet
    t.merge(kv(), kv(5L -> ""), Seq("key"))
    val after = t.snapshot(1).inputFiles.toSet

    val untouched = before & after
    assert(untouched.nonEmpty, "most buckets' files must be carried over")
    // exactly the deleted key's bucket was rewritten
    val rewrittenOld = before -- after
    assert(rewrittenOld.nonEmpty)
    val buckets = rewrittenOld.map(f =>
      f.split("/_bucket=")(1).split("/")(0)).toSet
    assert(buckets.size === 1, s"only one bucket should be rewritten: $buckets")
    // and the surviving rows of that bucket were preserved
    assert(t.snapshot().count() === 63L)
  }

  test("reopening by plain path recovers the bucket layout") {
    MiniLake.bucketed(spark, dir, Seq("key"), 8).create(seed)
    val reopened = MiniLake(spark, dir) // no spec passed
    val before = reopened.snapshot(0).inputFiles.toSet
    reopened.merge(kv(), kv(9L -> ""), Seq("key"))
    val after = reopened.snapshot().inputFiles.toSet
    assert((before & after).nonEmpty, "reopened table must still bucket-scope merges")
    assert(reopened.snapshot().count() === 63L)
  }

  test("insert-only merge into a bucketed table appends without rewrites") {
    val t = MiniLake.bucketed(spark, dir, Seq("key"), 8)
    t.create(seed)
    val before = t.snapshot(0).inputFiles.toSet
    t.merge(kv(200L -> "x", 201L -> "y"), kv(), Seq("key"))
    val after = t.snapshot().inputFiles.toSet
    assert(before.subsetOf(after))
    assert(t.snapshot().count() === 66L)
    // idempotent replay still holds on the bucketed path
    t.merge(kv(200L -> "x"), kv(), Seq("key"))
    assert(t.snapshot().count() === 66L)
  }
}
