// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Value-partitioned lake layout (`_p_<col>=<value>` dirs) and
  * additive schema evolution (`append(df, mergeSchema = true)`) —
  * the two table features a 100 TB ingest pipeline leans on daily:
  * partition-pruned reads and zero-rewrite column adds.
  */
class PartitionedLakeSpec extends AnyFunSuite with BeforeAndAfterEach {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private var dir: String = _
  override def beforeEach(): Unit =
    dir = Files.createTempDirectory("partlake").toString + "/t"
  override def afterEach(): Unit =
    MiniLake.deleteRecursively(dir)

  private def days(rows: (String, Long, String)*) =
    rows.toDF("day", "id", "payload")

  test("snapshotWhere prunes partitions on the driver (fewer files scanned)") {
    val t = MiniLake.partitioned(spark, dir, Seq("day"))
    t.create(days(("2024-01-01", 1L, "a"), ("2024-01-02", 2L, "b"),
      ("2024-01-03", 3L, "c")))
    t.append(days(("2024-01-01", 4L, "d"), ("2024-01-04", 5L, "e")))

    val all = t.snapshot()
    assert(all.count() === 5)
    // leaf files are schema-complete: `day` is a real column, readable
    // without partition discovery
    assert(all.schema.fieldNames.toSeq === Seq("day", "id", "payload"))

    val pruned = t.snapshotWhere(p => p("day") <= "2024-01-01")
    assert(pruned.orderBy("id").as[(String, Long, String)].collect().toSeq ===
      Seq(("2024-01-01", 1L, "a"), ("2024-01-01", 4L, "d")))
    // the pruning is physical: only the matching partitions' files open
    assert(pruned.inputFiles.length < all.inputFiles.length)
    assert(pruned.inputFiles.forall(_.contains("_p_day=2024-01-01")))
  }

  test("partition layout is recovered on reopen via plain apply") {
    MiniLake.partitioned(spark, dir, Seq("day"))
      .create(days(("2024-01-01", 1L, "a")))
    val reopened = MiniLake(spark, dir)
    reopened.append(days(("2024-01-02", 2L, "b")))
    val pruned = reopened.snapshotWhere(p => p("day") == "2024-01-02")
    assert(pruned.select("id").as[Long].collect().toSeq === Seq(2L))
    assert(pruned.inputFiles.forall(_.contains("_p_day=2024-01-02")))
  }

  test("merge rewrite keeps the partitioned layout and CDF stays exact") {
    val t = MiniLake.partitioned(spark, dir, Seq("day"))
    t.create(days(("2024-01-01", 1L, "a"), ("2024-01-02", 2L, "b")))
    t.merge(
      inserts = days(("2024-01-02", 3L, "c")),
      deletes = days(("2024-01-01", 1L, "a")),
      pks = Seq("id"))
    val snap = t.snapshot().orderBy("id").as[(String, Long, String)].collect()
    assert(snap.toSeq === Seq(("2024-01-02", 2L, "b"), ("2024-01-02", 3L, "c")))
    assert(t.snapshot().inputFiles.forall(_.contains("_p_day=")))
    val ch = t.readChanges(1, 1).select("id", "_change_type")
      .as[(Long, String)].collect().toSet
    assert(ch === Set((1L, "delete"), (3L, "insert")))
  }

  test("mergeSchema append widens the schema; history null-fills") {
    val t = MiniLake(spark, dir)
    t.create(kvOld(1L -> "a"))
    t.append(Seq((2L, "b", "en")).toDF("key", "value", "lang"),
      mergeSchema = true)
    assert(t.schema.fieldNames.toSeq === Seq("key", "value", "lang"))
    val snap = t.snapshot().orderBy("key")
      .as[(Long, String, Option[String])].collect()
    assert(snap.toSeq === Seq((1L, "a", None), (2L, "b", Some("en"))))
    // appends matching the widened schema need no flag anymore
    t.append(Seq((3L, "c", "de")).toDF("key", "value", "lang"))
    assert(t.snapshot().count() === 3)
  }

  test("mergeSchema append null-fills columns missing from the batch") {
    val t = MiniLake(spark, dir)
    t.create(Seq((1L, "a", "en")).toDF("key", "value", "lang"))
    t.append(kvOld(2L -> "b"), mergeSchema = true)
    val snap = t.snapshot().orderBy("key")
      .as[(Long, String, Option[String])].collect()
    assert(snap.toSeq === Seq((1L, "a", Some("en")), (2L, "b", None)))
  }

  test("mergeSchema rejects a type change on a shared column") {
    val t = MiniLake(spark, dir)
    t.create(kvOld(1L -> "a"))
    val ex = intercept[IllegalArgumentException] {
      t.append(Seq((2L, 99)).toDF("key", "value"), mergeSchema = true)
    }
    assert(ex.getMessage.contains("mergeSchema cannot change value"))
  }

  test("CDF reads spanning a schema evolution conform to the current schema") {
    val t = MiniLake(spark, dir)
    t.create(kvOld(1L -> "a"))
    t.append(Seq((2L, "b", "en")).toDF("key", "value", "lang"),
      mergeSchema = true)
    val ch = t.readChanges(0, 1)
      .select("key", "lang", "_change_type", "_commit_version")
      .as[(Long, Option[String], String, Long)].collect().toSet
    assert(ch === Set(
      (1L, None, "insert", 0L),
      (2L, Some("en"), "insert", 1L)))
  }

  private def kvOld(rows: (Long, String)*) = rows.toDF("key", "value")

  test("compactPartitions rewrites only the selected partition's files") {
    val t = MiniLake.partitioned(spark, dir, Seq("day"))
    t.create(days(("2024-01-01", 1L, "a"), ("2024-01-02", 2L, "b")))
    t.append(days(("2024-01-01", 3L, "c")))
    t.append(days(("2024-01-01", 4L, "d")))
    def filesOf(day: String): Set[String] =
      t.snapshotWhere(p => p.get("day").contains(day)).inputFiles.toSet
    val day1Before = filesOf("2024-01-01")
    val day2Before = filesOf("2024-01-02")
    assert(day1Before.size === 3)

    t.compactPartitions(p => p.get("day").contains("2024-01-01"))

    assert(filesOf("2024-01-01").size === 1, "day 1 compacted to one file")
    assert(filesOf("2024-01-02") === day2Before, "day 2 files untouched")
    assert(t.snapshot().orderBy("id").as[(String, Long, String)]
      .collect().toSeq === Seq(("2024-01-01", 1L, "a"),
        ("2024-01-02", 2L, "b"), ("2024-01-01", 3L, "c"),
        ("2024-01-01", 4L, "d")).sortBy(_._2))
  }

  test("compactPartitions preserves DV-deleted row content") {
    val t = MiniLake.partitioned(spark, dir, Seq("day"))
    t.create(days(("2024-01-01", 1L, "a"), ("2024-01-01", 2L, "b"),
      ("2024-01-02", 3L, "c")))
    t.deleteVectored(col("id") === 2L)
    t.compactPartitions(p => p.get("day").contains("2024-01-01"))
    assert(t.snapshot().select("id").as[Long].collect().sorted.toSeq ===
      Seq(1L, 3L))
  }

  test("replacePartitions swaps one day atomically: other days' files " +
      "untouched, CDF exact, time travel intact, out-of-set refused") {
    val t = MiniLake.partitioned(spark, dir, Seq("day"))
    t.create(days(("2024-01-01", 1L, "a"), ("2024-01-01", 2L, "b"),
      ("2024-01-02", 3L, "c")))                                  // v0
    val untouchedBefore = t.snapshotWhere(p =>
      p("day") == "2024-01-02").inputFiles.toSet
    val (nIns, nDel) = t.replacePartitions(
      p => p("day") == "2024-01-01",
      days(("2024-01-01", 9L, "z")))                             // v1
    assert((nIns, nDel) === ((1L, 2L)))
    // replaced day carries only the new row; the other day's FILES
    // (not just rows) are byte-identical in place
    assert(t.snapshot().orderBy("id")
      .as[(String, Long, String)].collect().toSeq ===
      Seq(("2024-01-02", 3L, "c"), ("2024-01-01", 9L, "z")).sortBy(_._2))
    val untouchedAfter = t.snapshotWhere(p =>
      p("day") == "2024-01-02").inputFiles.toSet
    assert(untouchedAfter === untouchedBefore)
    // CDF: two deletes (the replaced rows) + one insert, at v1
    val chg = t.readChanges(1, 1)
      .select("_change_type", "id").as[(String, Long)].collect().sorted
    assert(chg.toSeq === Seq(("delete", 1L), ("delete", 2L),
      ("insert", 9L)))
    // time travel reads the pre-replace day
    assert(t.snapshot(asOf = 0).filter(col("day") === "2024-01-01")
      .select("id").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    // the Delta replaceWhere constraint: out-of-set rows refuse
    val ex = intercept[IllegalArgumentException] {
      t.replacePartitions(p => p("day") == "2024-01-01",
        days(("2024-01-02", 7L, "x")))
    }
    assert(ex.getMessage.contains("outside the replaced set"))
  }

  test("replacePartitions retires DV sidecars whose every target is " +
      "replaced, keeps sidecars with surviving targets") {
    val t = MiniLake.partitioned(spark, dir, Seq("day"))
    t.create(days(("2024-01-01", 1L, "a"), ("2024-01-01", 2L, "b"),
      ("2024-01-02", 3L, "c"), ("2024-01-02", 4L, "d")))        // v0
    // one DV commit per day → each sidecar targets only that day's file
    t.deleteVectored(col("id") === 2L)                          // v1
    t.deleteVectored(col("id") === 4L)                          // v2
    assert(t.state(t.latestVersion).liveDvFiles.size === 2)
    // replacing day 1 removes its data files → its DV sidecar is dead
    // state and must retire with the commit; day 2's stays live (its
    // target file survives and the vectored delete must keep applying)
    t.replacePartitions(p => p("day") == "2024-01-01",
      days(("2024-01-01", 9L, "z")))                            // v3
    assert(t.state(t.latestVersion).liveDvFiles.size === 1)
    assert(t.snapshot().select("id").as[Long].collect().sorted.toSeq ===
      Seq(3L, 9L))
    // replacing day 2 retires the last sidecar
    t.replacePartitions(p => p("day") == "2024-01-02",
      days(("2024-01-02", 8L, "y")))                            // v4
    assert(t.state(t.latestVersion).liveDvFiles.isEmpty)
    assert(t.snapshot().select("id").as[Long].collect().sorted.toSeq ===
      Seq(8L, 9L))
  }
}
