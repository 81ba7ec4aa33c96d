// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Partition spec evolution (Iceberg semantics): the evolve commit is
  * metadata-only, old files keep their layout, new files land under
  * the new spec, pruning stays a conservative performance layer on
  * mixed-era tables, and compaction rewrites everything under the
  * current spec (re-enabling path-scoped verbs like
  * replacePartitions).
  */
class PartitionEvolutionSpec extends AnyFunSuite with BeforeAndAfterEach {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private var dir: String = _
  override def beforeEach(): Unit =
    dir = Files.createTempDirectory("partevo").toString + "/t"
  override def afterEach(): Unit =
    MiniLake.deleteRecursively(dir)

  private def rows(r: (Long, String, String)*) =
    r.toDF("k", "day", "kind")

  private def liveOf(t: MiniLake): Seq[String] =
    t.liveFiles(t.latestVersion)

  test("evolve is metadata-only; each era's files carry its own spec " +
      "and one snapshot reads both") {
    val t = MiniLake.partitioned(spark, dir, Seq("day"))
    t.create(rows((1L, "d1", "a"), (2L, "d2", "b")))
    val oldFiles = liveOf(t)
    t.evolvePartitioning(Seq("day", "kind"))
    // metadata-only: the live set is untouched by the evolve commit
    assert(liveOf(t) === oldFiles)
    t.append(rows((3L, "d1", "a"), (4L, "d3", "c")))
    val fresh = MiniLake(spark, dir) // cold reopen: spec from latest entry
    val newFiles = liveOf(fresh).filterNot(oldFiles.toSet)
    assert(oldFiles.forall(f => f.contains("/_p_day=") &&
      !f.contains("/_p_kind=")))
    assert(newFiles.nonEmpty && newFiles.forall(f =>
      f.contains("/_p_day=") && f.contains("/_p_kind=")))
    assert(fresh.snapshot().count() === 4)
    // pruning on the NEW key: old era conservatively kept (missing
    // key = keep), so the exact filter above stays correct
    val kindA = fresh.snapshotWhere(m => m.get("kind").forall(_ == "a"))
      .filter(col("kind") === "a")
    assert(kindA.select("k").as[Long].collect().sorted.toSeq === Seq(1L, 3L))
    // pruning on the SHARED key prunes in both eras
    assert(fresh.snapshotWhere(m => m.get("day").forall(_ == "d1"))
      .count() === 2)
  }

  test("replacePartitions refuses a mixed-era live set; compaction " +
      "rewrites under the current spec and re-enables it") {
    val t = MiniLake.partitioned(spark, dir, Seq("day"))
    t.create(rows((1L, "d1", "a"), (2L, "d2", "b")))
    t.evolvePartitioning(Seq("day", "kind"))
    t.append(rows((3L, "d1", "c")))
    val batch = rows((9L, "d1", "z"))
    val ex = intercept[IllegalArgumentException] {
      t.replacePartitions(m => m.get("day").contains("d1"), batch)
    }
    assert(ex.getMessage.contains("pre-evolution"))
    t.compactFiles() // everything rewritten under (day, kind)
    assert(liveOf(t).forall(f => f.contains("/_p_kind=")))
    val (nIns, nDel) =
      t.replacePartitions(m => m.get("day").contains("d1"), batch)
    assert((nIns, nDel) === ((1L, 2L)))
    assert(t.snapshot().select("k").as[Long].collect().sorted.toSeq ===
      Seq(2L, 9L))
  }

  test("time travel crosses the evolve commit; CDF is unaffected") {
    val t = MiniLake.partitioned(spark, dir, Seq("day"))
    t.create(rows((1L, "d1", "a")))                   // v0
    t.evolvePartitioning(Seq("day", "kind"))          // v1 (no changes)
    t.append(rows((2L, "d2", "b")))                   // v2
    assert(t.snapshot(0).count() === 1)
    assert(t.snapshot(1).count() === 1)
    assert(t.readChanges(0, 2).count() === 2) // evolve publishes no CDF
  }
}
