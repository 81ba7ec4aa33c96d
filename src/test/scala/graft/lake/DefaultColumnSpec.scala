// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** ADD COLUMN with initial default: three-era reads, genuine-NULL
  * preservation, time travel, rename interplay, and the
  * dropped-name refusal.
  */
class DefaultColumnSpec extends AnyFunSuite with BeforeAndAfterEach {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private var dir: String = _
  override def beforeEach(): Unit =
    dir = Files.createTempDirectory("deflake").toString + "/t"
  override def afterEach(): Unit =
    MiniLake.deleteRecursively(dir)

  private def kv(rows: (Long, String)*) = rows.toDF("key", "value")

  test("pre-add rows read the default; explicit NULLs stay NULL; " +
      "omitted batches materialize the default; time travel pre-add " +
      "has no column") {
    val t = MiniLake(spark, dir)
    t.create(kv(1L -> "a"))                                   // v0
    t.addColumn("tier", "STRING", "'unrated'")                // v1
    t.append(Seq((2L, "b", "gold"), (3L, "c", null))
      .toDF("key", "value", "tier"))                          // v2
    t.append(kv(4L -> "d"))                                   // v3: omits
    val got = t.snapshot().select("key", "tier").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got === Map(1L -> Some("unrated"), 2L -> Some("gold"),
      3L -> None, 4L -> Some("unrated")))
    // time travel to v0: the column did not exist
    assert(!t.snapshot(asOf = 0).columns.contains("tier"))
    // ...and at v1 (post-add, no new data) the old row reads default
    assert(t.snapshot(asOf = 1).select("tier").collect()
      .map(_.getString(0)).toSeq === Seq("unrated"))
  }

  test("the default survives a cold reopen and a later rename of the " +
      "defaulted column") {
    val t = MiniLake(spark, dir)
    t.create(kv(1L -> "a"))
    t.addColumn("tier", "STRING", "'unrated'")
    t.renameColumn("tier", "grade")
    val fresh = MiniLake(spark, dir)
    fresh.append(kv(2L -> "b")) // omits → default under the NEW name
    val got = fresh.snapshot().select("key", "grade").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "unrated", 2L -> "unrated"))
  }

  test("CDF serves the as-written image: pre-add versions show NULL, " +
      "not the default") {
    val t = MiniLake(spark, dir)
    t.create(kv(1L -> "a"))                                   // v0
    t.addColumn("tier", "STRING", "'unrated'")                // v1
    val chg = t.readChanges(0, 0).select("key", "tier").collect()
    assert(chg.map(r => (r.getLong(0), r.isNullAt(1))).toSeq ===
      Seq((1L, true)))
  }

  test("appendConcurrent materializes write-defaults like append " +
      "(an omitting batch must not fail the schema match)") {
    val t = MiniLake(spark, dir)
    t.create(kv(1L -> "a"))
    t.addColumn("tier", "STRING", "'base'")
    t.appendConcurrent(kv(2L -> "b")) // omits tier
    assert(t.snapshot().orderBy("key").select("tier")
      .as[String].collect().toSeq === Seq("base", "base"))
  }

  test("adding a previously-dropped name is refused (tombstone)") {
    val t = MiniLake(spark, dir)
    t.create(Seq((1L, "a", "x")).toDF("key", "value", "old"))
    t.dropColumn("old")
    val ex = intercept[IllegalArgumentException] {
      t.addColumn("old", "STRING", "'d'")
    }
    assert(ex.getMessage.contains("previously dropped"))
  }
}
