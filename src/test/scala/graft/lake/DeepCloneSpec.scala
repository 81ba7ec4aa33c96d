// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** DEEP CLONE: a full independent copy whose files share nothing with
  * the source — survives source vacuum by construction (the shallow
  * clone's documented hazard), re-roots DV sidecar references, and
  * carries metadata (identity high water, properties, constraints)
  * like its shallow sibling.
  */
class DeepCloneSpec extends AnyFunSuite with BeforeAndAfterEach {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private var base: String = _
  override def beforeEach(): Unit =
    base = Files.createTempDirectory("deepclone").toString
  override def afterEach(): Unit =
    MiniLake.deleteRecursively(base)

  private def kv(rows: (Long, String)*) = rows.toDF("key", "value")

  test("deep clone equals the source snapshot and survives source " +
      "vacuum after divergence") {
    val t = MiniLake(spark, s"$base/src")
    t.create(kv(1L -> "a", 2L -> "b", 3L -> "c"))
    val c = MiniLake.deepClone(spark, s"$base/src", s"$base/dst")
    assert(c.snapshot().orderBy("key").as[(Long, String)].collect().toSeq ===
      Seq(1L -> "a", 2L -> "b", 3L -> "c"))
    // source rewrites, then vacuums its pre-rewrite files immediately:
    // a shallow clone would now read nothing; the deep clone is whole
    t.overwrite(kv(9L -> "z"))
    t.vacuum(retainMillis = 0L)
    assert(MiniLake(spark, s"$base/dst").snapshot().orderBy("key")
      .as[(Long, String)].collect().toSeq ===
      Seq(1L -> "a", 2L -> "b", 3L -> "c"))
    // and no clone file lives under the source root
    val srcRoot = java.nio.file.Paths.get(s"$base/src").toAbsolutePath
    MiniLake(spark, s"$base/dst").snapshot().inputFiles.foreach(f =>
      assert(!java.nio.file.Paths.get(new java.net.URI(f).getPath)
        .toAbsolutePath.startsWith(srcRoot), s"clone reads source file $f"))
  }

  test("divergence is two-way invisible") {
    val t = MiniLake(spark, s"$base/src")
    t.create(kv(1L -> "a"))
    val c = MiniLake.deepClone(spark, s"$base/src", s"$base/dst")
    c.append(kv(2L -> "b"))
    t.append(kv(3L -> "c"))
    assert(t.snapshot().select("key").as[Long].collect().toSet ===
      Set(1L, 3L))
    assert(c.snapshot().select("key").as[Long].collect().toSet ===
      Set(1L, 2L))
  }

  test("deep clone re-roots DV sidecars: vectors apply, and the clone " +
      "materializes independently") {
    val t = MiniLake(spark, s"$base/src")
    t.create(kv(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"))
    t.deleteVectored(col("key") % 2 === 0)
    val c = MiniLake.deepClone(spark, s"$base/src", s"$base/dst")
    assert(c.snapshot().select("key").as[Long].collect().toSet ===
      Set(1L, 3L))
    // the clone's vectors reference the CLONE's files: source vacuum
    // of everything cannot disturb the clone's DV-applied read
    t.overwrite(kv(9L -> "z"))
    t.vacuum(retainMillis = 0L)
    val c2 = MiniLake(spark, s"$base/dst")
    assert(c2.snapshot().select("key").as[Long].collect().toSet ===
      Set(1L, 3L))
    c2.materializeDeletes()
    assert(c2.snapshot().select("key").as[Long].collect().toSet ===
      Set(1L, 3L))
  }

  test("identity high water and append-only ride the deep clone") {
    val t = MiniLake.identity(spark, s"$base/src", "rid")
    t.create(kv(10L -> "a", 20L -> "b")) // rids 1, 2
    t.setTableProperty(MiniLake.AppendOnlyProp, "true")
    MiniLake.deepClone(spark, s"$base/src", s"$base/dst")
    val c = MiniLake(spark, s"$base/dst")
    intercept[IllegalArgumentException](c.update(col("key") === 10L,
      Map("value" -> lit("x"))))
    c.unsetTableProperty(MiniLake.AppendOnlyProp)
    c.append(kv(30L -> "c"))
    assert(c.snapshot().filter(col("key") === 30L)
      .select("rid").as[Long].head() === 3L) // continues past the source hw
  }
}
