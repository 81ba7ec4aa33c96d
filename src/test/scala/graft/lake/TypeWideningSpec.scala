// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Type widening on mergeSchema append (Delta 4.x / Iceberg type
  * promotion): INT→BIGINT and FLOAT→DOUBLE land as a metadata commit —
  * zero data rewritten — and pre-widening files upcast at READ time.
  * The 100 TB claim under test: an ingest pipeline whose id column
  * outgrows INT must not rewrite history to keep reading it.
  */
class TypeWideningSpec extends AnyFunSuite with BeforeAndAfterEach {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private var dir: String = _
  override def beforeEach(): Unit =
    dir = Files.createTempDirectory("widelake").toString + "/t"
  override def afterEach(): Unit =
    MiniLake.deleteRecursively(dir)

  test("INT->BIGINT widens as metadata; pre-widening files read " +
      "widened with exact values, incl. after a cold reopen") {
    val t = MiniLake(spark, dir)
    t.create(Seq((1L, 10), (2L, 20)).toDF("key", "n"))        // v0: INT
    val filesBefore = t.snapshot().inputFiles.toSet
    t.append(Seq((3L, 3000000000L)).toDF("key", "n"),
      mergeSchema = true)                                     // v1: BIGINT
    assert(t.schema("n").dataType === LongType)
    // metadata-only for the old era: v0's files still live untouched
    assert(filesBefore.subsetOf(t.snapshot().inputFiles.toSet))
    assert(t.snapshot().orderBy("key").as[(Long, Long)].collect().toSeq
      === Seq((1L, 10L), (2L, 20L), (3L, 3000000000L)))
    // cold reopen recovers the widened schema and the upcast read
    val fresh = MiniLake(spark, dir)
    assert(fresh.snapshot().agg(sum("n")).as[Long].head() === 3000000030L)
  }

  test("FLOAT->DOUBLE widens; values are exactly the float values") {
    val t = MiniLake(spark, dir)
    t.create(Seq((1L, 1.5f), (2L, 2.25f)).toDF("key", "x"))
    t.append(Seq((3L, 3.125d)).toDF("key", "x"), mergeSchema = true)
    assert(t.schema("x").dataType === DoubleType)
    assert(t.snapshot().orderBy("key").as[(Long, Double)].collect().toSeq
      === Seq((1L, 1.5d), (2L, 2.25d), (3L, 3.125d)))
  }

  test("a NARROWER incoming batch upcasts at write; the table type " +
      "stays wide; without mergeSchema the mismatch still errors") {
    val t = MiniLake(spark, dir)
    t.create(Seq((1L, 10L)).toDF("key", "n"))                 // BIGINT
    t.append(Seq((2L, 20)).toDF("key", "n"), mergeSchema = true)
    assert(t.schema("n").dataType === LongType)
    assert(t.snapshot().orderBy("key").as[(Long, Long)].collect().toSeq
      === Seq((1L, 10L), (2L, 20L)))
    intercept[IllegalArgumentException] {
      t.append(Seq((3L, 30)).toDF("key", "n")) // no flag: strict match
    }
  }

  test("non-lattice changes refuse: STRING->INT, LONG->INT on a " +
      "narrowing table, DOUBLE->FLOAT") {
    val t = MiniLake(spark, dir)
    t.create(Seq((1L, "x", 1.5d)).toDF("key", "s", "d"))
    val ex = intercept[IllegalArgumentException] {
      t.append(Seq((2L, 7, 1.5d)).toDF("key", "s", "d"),
        mergeSchema = true)
    }
    assert(ex.getMessage.contains("mergeSchema cannot change s"))
    // DOUBLE stays DOUBLE when a FLOAT batch arrives (narrow incoming)
    t.append(Seq((2L, "y", 2.5f)).toDF("key", "s", "d"),
      mergeSchema = true)
    assert(t.schema("d").dataType === DoubleType)
  }

  test("bucket-key widening is refused: the hash layout would change " +
      "silently (int and long hash differently)") {
    val t = MiniLake.bucketed(spark, dir, Seq("k"), 4)
    t.create(Seq((10, "a")).toDF("k", "v"))
    val ex = intercept[IllegalArgumentException] {
      t.append(Seq((11L, "b")).toDF("k", "v"), mergeSchema = true)
    }
    assert(ex.getMessage.contains("refuse type evolution"))
  }

  test("generated-column widening is refused (type is derived)") {
    val t = MiniLake.generated(spark, dir,
      generatedCols = Seq("n2" -> "cast(n * 2 as int)"))
    t.create(Seq((1L, 5)).toDF("key", "n")
      .withColumn("n2", expr("cast(n * 2 as int)")))
    val ex = intercept[IllegalArgumentException] {
      t.append(Seq((2L, 6, 12L)).toDF("key", "n", "n2"),
        mergeSchema = true)
    }
    assert(ex.getMessage.contains("refuse type evolution"))
  }

  test("CDF across the widening boundary conforms old slices to the " +
      "wide schema; time travel pre-widen reads the narrow schema") {
    val t = MiniLake(spark, dir)
    t.create(Seq((1L, 10)).toDF("key", "n"))                  // v0 INT
    t.append(Seq((2L, 5000000000L)).toDF("key", "n"),
      mergeSchema = true)                                     // v1 BIGINT
    val ch = t.readChanges(0, 1)
      .select("key", "n", MiniLake.ChangeType, MiniLake.CommitVersion)
      .as[(Long, Long, String, Long)].collect().toSet
    assert(ch === Set((1L, 10L, "insert", 0L),
      (2L, 5000000000L, "insert", 1L)))
    assert(t.schemaAt(0)("n").dataType === IntegerType)
    assert(t.snapshot(asOf = 0).as[(Long, Int)].collect().toSeq ===
      Seq((1L, 10)))
  }

  test("widening composes with renames and deletion vectors across " +
      "three eras") {
    val t = MiniLake(spark, dir)
    t.create(Seq((1L, 10), (2L, 20)).toDF("key", "n"))        // era INT,n
    t.renameColumn("n", "amount")                             // v1
    t.append(Seq((3L, 30)).toDF("key", "amount"))             // era INT,amount
    t.append(Seq((4L, 9000000000L)).toDF("key", "amount"),
      mergeSchema = true)                                     // era BIGINT
    t.deleteVectored(col("key") === 2L)
    assert(t.schema("amount").dataType === LongType)
    assert(t.snapshot().orderBy("key").as[(Long, Long)].collect().toSeq
      === Seq((1L, 10L), (3L, 30L), (4L, 9000000000L)))
    // stats-range read on the widened column still prunes soundly
    assert(t.snapshotForRange("amount", 25L, 40L)
      .select("key").as[Long].collect().toSeq === Seq(3L))
  }

  test("a shallow clone of a widened source reads all eras widened") {
    val t = MiniLake(spark, dir)
    t.create(Seq((1L, 10)).toDF("key", "n"))
    t.append(Seq((2L, 7000000000L)).toDF("key", "n"), mergeSchema = true)
    val cdir = dir + "_wclone"
    val c = MiniLake.shallowClone(spark, dir, cdir)
    assert(c.schema("n").dataType === LongType)
    assert(c.snapshot().orderBy("key").as[(Long, Long)].collect().toSeq
      === Seq((1L, 10L), (2L, 7000000000L)))
    MiniLake.deleteRecursively(cdir)
  }
}
