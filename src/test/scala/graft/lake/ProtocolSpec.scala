// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Reader protocol versioning (Delta minReaderVersion): monotone
  * feature stamping, read AND write refusal for under-capable
  * readers, and clone protocol semantics.
  */
class ProtocolSpec extends AnyFunSuite with BeforeAndAfterEach {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private var dir: String = _
  override def beforeEach(): Unit =
    dir = Files.createTempDirectory("protolake").toString + "/t"
  override def afterEach(): Unit = {
    spark.conf.unset("graft.lake.maxSupportedReader")
    MiniLake.deleteRecursively(dir)
  }

  private def kv(rows: (Long, String)*) = rows.toDF("key", "value")

  test("protocol is the monotone max of features used, sticky across " +
      "later plain commits and cold reopens") {
    val t = MiniLake(spark, dir)
    t.create(kv(1L -> "a", 2L -> "b"))
    assert(t.protocolVersion === 1L)
    t.deleteVectored(col("key") === 2L)
    assert(t.protocolVersion === 2L)
    t.append(kv(3L -> "c")) // plain append must NOT downgrade
    assert(t.protocolVersion === 2L)
    t.renameColumn("value", "payload")
    assert(t.protocolVersion === 3L)
    t.append(Seq(4L -> "d").toDF("key", "payload"))
    assert(MiniLake(spark, dir).protocolVersion === 3L)
  }

  test("initial-default add-column stamps reader protocol 4: a " +
      "pre-defaults reader must refuse, not silently read NULL for " +
      "pre-add rows") {
    val t = MiniLake(spark, dir)
    t.create(kv(1L -> "a", 2L -> "b"))
    assert(t.protocolVersion === 1L)
    // defaults are reader-affecting: pre-add files are FILLED AT READ
    // time from addDefaults, so a build that predates the feature
    // would ignore the key and read NULL where 'x' belongs — the very
    // skew minReader exists to refuse
    t.addColumn("tag", "STRING", "'x'")
    assert(t.protocolVersion === 4L)
    spark.conf.set("graft.lake.maxSupportedReader", "3")
    val old = MiniLake(spark, dir)
    val ex = intercept[IllegalStateException] { old.snapshot().count() }
    assert(ex.getMessage.contains("requires reader protocol version 4"))
    spark.conf.unset("graft.lake.maxSupportedReader")
    assert(MiniLake(spark, dir).snapshot()
      .filter(col("tag") === "x").count() === 2L)
  }

  test("an under-capable reader refuses reads AND writes with the " +
      "upgrade error") {
    val t = MiniLake(spark, dir)
    t.create(kv(1L -> "a", 2L -> "b"))
    t.deleteVectored(col("key") === 2L) // protocol 2
    spark.conf.set("graft.lake.maxSupportedReader", "1")
    val old = MiniLake(spark, dir)
    val exR = intercept[IllegalStateException] { old.snapshot().count() }
    assert(exR.getMessage.contains("requires reader protocol version 2"))
    // a writer that cannot read the log cannot safely commit either
    intercept[IllegalStateException] { old.append(kv(9L -> "z")) }
    spark.conf.unset("graft.lake.maxSupportedReader")
    assert(MiniLake(spark, dir).snapshot().count() === 1L)
  }

  test("clone protocol reflects the CLONE's own log: DVs carry (2); " +
      "a column-mapped source clones at 3 and reads era-correct " +
      "values, never NULL") {
    val t = MiniLake(spark, dir)
    t.create(kv(1L -> "a", 2L -> "b"))
    t.deleteVectored(col("key") === 2L)      // source: protocol 2
    val cloneDir = Files.createTempDirectory("protoclone").toString + "/c"
    try {
      val c = MiniLake.shallowClone(spark, dir, cloneDir)
      // the clone REFERENCES the source's live DV sidecars → needs 2
      assert(c.protocolVersion === 2L)
      assert(c.snapshot().select("value").as[String].collect().toSeq ===
        Seq("a"))
    } finally MiniLake.deleteRecursively(cloneDir)
    // a renamed source's per-era physical names live only in ITS log:
    // the clone entry carries the rename chain + era schemas, stamps
    // protocol 3, and reads the pre-rename bytes under the new name
    t.renameColumn("value", "payload")       // source: protocol 3
    val cloneDir2 = Files.createTempDirectory("protoclone2").toString + "/c"
    try {
      val c2 = MiniLake.shallowClone(spark, dir, cloneDir2)
      assert(c2.protocolVersion === 3L)
      assert(c2.snapshot().select("payload").as[String].collect().toSeq
        === Seq("a"))
      // an under-capable reader refuses the clone like the source
      spark.conf.set("graft.lake.maxSupportedReader", "2")
      intercept[IllegalStateException] {
        MiniLake(spark, cloneDir2).snapshot().count()
      }
      spark.conf.unset("graft.lake.maxSupportedReader")
    } finally MiniLake.deleteRecursively(cloneDir2)
  }
}
