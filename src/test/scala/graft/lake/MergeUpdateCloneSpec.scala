// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** UPDATE-matched MERGE and shallow CLONE: the two Delta surfaces
  * added in round 6 — upserts that replace matched rows (vs the
  * reference's delete-matched merge) and metadata-only table copies.
  */
class MergeUpdateCloneSpec extends AnyFunSuite with BeforeAndAfterEach {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private var dir: String = _
  override def beforeEach(): Unit =
    dir = Files.createTempDirectory("muclake").toString + "/t"
  override def afterEach(): Unit =
    MiniLake.deleteRecursively(dir)

  private def kv(rows: (Long, String)*) = rows.toDF("key", "value")

  test("mergeUpdate replaces matched rows, inserts absent, keeps rest") {
    val t = MiniLake(spark, dir)
    t.create(kv(1L -> "a", 2L -> "b", 3L -> "c"))
    val (nUpd, nIns) = t.mergeUpdate(kv(2L -> "B", 4L -> "d"), Seq("key"))
    assert((nUpd, nIns) === (1L, 1L))
    assert(t.snapshot().orderBy("key").as[(Long, String)].collect().toSeq ===
      Seq(1L -> "a", 2L -> "B", 3L -> "c", 4L -> "d"))
  }

  test("mergeUpdate publishes pre/postimage + insert changes") {
    val t = MiniLake(spark, dir)
    t.create(kv(1L -> "a", 2L -> "b"))
    t.mergeUpdate(kv(2L -> "B", 5L -> "e"), Seq("key"))
    val ch = t.readChanges(1, 1)
      .select("key", "value", "_change_type")
      .as[(Long, String, String)].collect().toSet
    assert(ch === Set((2L, "b", "update_preimage"),
      (2L, "B", "update_postimage"), (5L, "e", "insert")))
  }

  test("mergeUpdate reads through deletion vectors") {
    val t = MiniLake(spark, dir)
    t.create(kv(1L -> "a", 2L -> "b", 3L -> "c"))
    t.deleteVectored(col("key") === 2L)
    // key 2 is deleted: the upsert sees it as ABSENT and re-inserts
    val (nUpd, nIns) = t.mergeUpdate(kv(2L -> "B2", 3L -> "C"), Seq("key"))
    assert((nUpd, nIns) === (1L, 1L))
    assert(t.snapshot().orderBy("key").as[(Long, String)].collect().toSeq ===
      Seq(1L -> "a", 2L -> "B2", 3L -> "C"))
  }

  test("shallow clone reads equal source; zero data files copied") {
    val t = MiniLake(spark, dir)
    t.create(kv((1L to 20L).map(k => k -> s"v$k"): _*))
    val cdir = dir + "_clone"
    val c = MiniLake.shallowClone(spark, dir, cdir)
    assert(c.snapshot().orderBy("key").collect().toSeq ===
      t.snapshot().orderBy("key").collect().toSeq)
    // metadata-only: the clone's directory holds no parquet at all
    val walk = Files.walk(java.nio.file.Paths.get(cdir))
    try assert(!walk.anyMatch(p => p.toString.endsWith(".parquet")))
    finally walk.close()
    MiniLake.deleteRecursively(cdir)
  }

  test("clone and source diverge independently after the clone") {
    val t = MiniLake(spark, dir)
    t.create(kv(1L -> "a", 2L -> "b"))
    val cdir = dir + "_clone2"
    val c = MiniLake.shallowClone(spark, dir, cdir)
    c.append(kv(3L -> "c"))
    t.update(col("key") === 1L, Map("value" -> lit("A")))
    assert(c.snapshot().orderBy("key").as[(Long, String)].collect().toSeq ===
      Seq(1L -> "a", 2L -> "b", 3L -> "c"))
    assert(t.snapshot().orderBy("key").as[(Long, String)].collect().toSeq ===
      Seq(1L -> "A", 2L -> "b"))
    // the clone's vacuum must never touch source files
    c.vacuum(retainMillis = 0)
    assert(t.snapshot().count() === 2)
    MiniLake.deleteRecursively(cdir)
  }

  test("clone carries deletion vectors and the skipping index") {
    val t = MiniLake(spark, dir)
    t.create(kv((1L to 10L).map(k => k -> s"v$k"): _*))
    t.deleteVectored(col("key") > 8L)
    val cdir = dir + "_clone3"
    val c = MiniLake.shallowClone(spark, dir, cdir)
    assert(c.snapshot().select("key").as[Long].collect().sorted.toSeq ===
      (1L to 8L))
    // stats carried: a range read on the clone still prunes via the
    // source-built index (no footer re-read happened to rebuild it)
    assert(c.snapshotForRange("key", 2L, 3L)
      .select("key").as[Long].collect().sorted.toSeq === Seq(2L, 3L))
    MiniLake.deleteRecursively(cdir)
  }

  test("clone preserves GENERATED ALWAYS AS rules") {
    val t = MiniLake.generated(spark, dir,
      generatedCols = Seq("value_len" -> "length(value)"))
    t.create(kv(1L -> "abc"))
    val cdir = dir + "_gclone"
    val c = MiniLake.shallowClone(spark, dir, cdir)
    // absent column computes on the clone's own appends
    c.append(kv(2L -> "wxyz"))
    assert(c.snapshot().filter(col("key") === 2L)
      .select("value_len").as[Int].head() === 4)
    // wrong caller-supplied value REJECTS — the source's invariant
    // survived the clone (the regression being pinned: the clone
    // entry used to drop the generation rules, letting this pass)
    val err = intercept[IllegalArgumentException] {
      c.append(Seq((3L, "pq", 99)).toDF("key", "value", "value_len"))
    }
    assert(err.getMessage.contains("generated col value_len"))
    // a COLD reopen of the clone still has the rules
    val fresh = MiniLake(spark, cdir)
    fresh.append(kv(4L -> "hello"))
    assert(fresh.snapshot().filter(col("key") === 4L)
      .select("value_len").as[Int].head() === 5)
    MiniLake.deleteRecursively(cdir)
  }

  test("clone of a value-partitioned table keeps the partition layout") {
    val t = MiniLake.partitioned(spark, dir, Seq("value"))
    t.create(kv(1L -> "a", 2L -> "b", 3L -> "a"))
    val cdir = dir + "_pclone"
    val c = MiniLake.shallowClone(spark, dir, cdir)
    // driver-side pruning works on the clone...
    assert(c.snapshotWhere(p => p("value") == "a")
      .select("key").as[Long].collect().sorted.toSeq === Seq(1L, 3L))
    // ...and the clone's OWN writes land partitioned (the layout is
    // recovered from the clone entry, not lost to an empty default)
    c.append(kv(4L -> "b"))
    assert(c.snapshotWhere(p => p("value") == "b")
      .select("key").as[Long].collect().sorted.toSeq === Seq(2L, 4L))
    MiniLake.deleteRecursively(cdir)
  }

  test("clone of a RENAMED source reads pre-rename bytes under the " +
      "new name across eras; source and clone then diverge") {
    val t = MiniLake(spark, dir)
    t.create(kv(1L -> "a", 2L -> "b"))                  // v0: era 'value'
    t.renameColumn("value", "payload")                  // v1
    t.append(Seq(3L -> "c").toDF("key", "payload"))     // v2: era 'payload'
    val cdir = dir + "_rnclone"
    val c = MiniLake.shallowClone(spark, dir, cdir)
    // clone history begins at the source's clone-point version
    assert(c.latestVersion === 2L)
    assert(c.snapshot().orderBy("key").as[(Long, String)]
      .collect().toSeq === Seq(1L -> "a", 2L -> "b", 3L -> "c"))
    assert(c.schema.fieldNames.toSeq === Seq("key", "payload"))
    // a COLD reopen resolves the carried chain from the log alone
    assert(MiniLake(spark, cdir).snapshot().orderBy("key")
      .as[(Long, String)].collect().toSeq ===
      Seq(1L -> "a", 2L -> "b", 3L -> "c"))
    // the clone renames again independently: both rename hops fold
    // forward for pre-rename eras; the source keeps its name
    c.renameColumn("payload", "body")
    c.append(Seq(4L -> "d").toDF("key", "body"))
    assert(c.snapshot().orderBy("key").select("body").as[String]
      .collect().toSeq === Seq("a", "b", "c", "d"))
    assert(t.schema.fieldNames.toSeq === Seq("key", "payload"))
    // time travel below the clone point is an explicit error
    val ex = intercept[IllegalArgumentException] { c.snapshot(asOf = 0) }
    assert(ex.getMessage.contains("clone-point"))
    MiniLake.deleteRecursively(cdir)
  }

  test("clone of a source with a REBORN column nulls the dropped " +
      "incarnation's bytes for pre-rebirth eras") {
    val t = MiniLake(spark, dir)
    t.create(Seq((1L, "a", "old1"), (2L, "b", "old2"))
      .toDF("key", "value", "tag"))                     // v0: tag v1 era
    t.dropColumn("tag")                                 // v1
    t.append(Seq((3L, "c", "new3")).toDF("key", "value", "tag"),
      mergeSchema = true)                               // v2: tag reborn
    val cdir = dir + "_rbclone"
    val c = MiniLake.shallowClone(spark, dir, cdir)
    val rows = c.snapshot().orderBy("key")
      .as[(Long, String, Option[String])].collect().toSeq
    // pre-rebirth files must NOT resurrect old1/old2
    assert(rows === Seq((1L, "a", None), (2L, "b", None),
      (3L, "c", Some("new3"))))
    // the tombstone carried: renaming INTO a name whose physical
    // bytes old cloned files still hold is refused on the clone too
    c.dropColumn("tag")
    val ex = intercept[IllegalArgumentException] {
      c.renameColumn("value", "tag")
    }
    assert(ex.getMessage.contains("previously dropped"))
    MiniLake.deleteRecursively(cdir)
  }

  test("clone carries the initial-default map: pre-add files read " +
      "the declared default, not NULL (cold reopen too)") {
    val t = MiniLake(spark, dir)
    t.create(kv(1L -> "a"))                             // v0: pre-add era
    t.addColumn("tier", "STRING", "'base'")             // v1
    t.append(Seq((2L, "b", "gold")).toDF("key", "value", "tier")) // v2
    val cdir = dir + "_defclone"
    val c = MiniLake.shallowClone(spark, dir, cdir)
    assert(c.snapshot().orderBy("key")
      .as[(Long, String, String)].collect().toSeq ===
      Seq((1L, "a", "base"), (2L, "b", "gold")))
    // default materializes on the clone's own omitting appends too
    val fresh = MiniLake(spark, cdir)
    fresh.append(kv(3L -> "c"))
    assert(fresh.snapshot().orderBy("key").select("tier").as[String]
      .collect().toSeq === Seq("base", "gold", "base"))
    MiniLake.deleteRecursively(cdir)
  }

  test("a chained clone of a column-mapped clone composes the era " +
      "state") {
    val t = MiniLake(spark, dir)
    t.create(kv(1L -> "a"))                             // v0
    t.renameColumn("value", "payload")                  // v1
    val c1dir = dir + "_c1"
    val c1 = MiniLake.shallowClone(spark, dir, c1dir)
    c1.append(Seq(2L -> "b").toDF("key", "payload"))    // clone era
    c1.renameColumn("payload", "body")
    val c2dir = dir + "_c2"
    val c2 = MiniLake.shallowClone(spark, c1dir, c2dir)
    assert(c2.snapshot().orderBy("key").select("body").as[String]
      .collect().toSeq === Seq("a", "b"))
    MiniLake.deleteRecursively(c1dir)
    MiniLake.deleteRecursively(c2dir)
  }

  test("overwrite and mergeUpdate compute absent generated columns") {
    val t = MiniLake.generated(spark, dir,
      generatedCols = Seq("value_len" -> "length(value)"))
    t.create(kv(1L -> "abc"))
    t.overwrite(kv(1L -> "wxyz", 2L -> "pq"))
    assert(t.snapshot().orderBy("key").select("value_len")
      .as[Int].collect().toSeq === Seq(4, 2))
    t.mergeUpdate(kv(2L -> "hello", 3L -> "x"), Seq("key"))
    assert(t.snapshot().orderBy("key").select("value_len")
      .as[Int].collect().toSeq === Seq(4, 5, 1))
  }
}
