// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.lake

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Crash injection at each commit-protocol step. The log-is-the-table
  * invariant (MiniLake.scala layout note) claims a writer that dies
  * between its attempt-dir writes and the atomic log publish leaves
  * debris that blocks nothing and corrupts nothing — these tests
  * create exactly the on-disk state such a death leaves (the files a
  * crashed JVM would strand, with NO log entry) and prove reads,
  * subsequent commits, version numbering, and vacuum all behave as if
  * the crash never happened. The fuzz counterpart interleaves the same
  * injections with random op sequences (MiniLakeModelSpec).
  */
class MiniLakeCrashSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_crash").toString + "/t"

  import scala.jdk.CollectionConverters._

  private def parquetsUnder(d: String): Seq[String] =
    if (!Files.isDirectory(Paths.get(d))) Seq.empty
    else {
      val st = Files.walk(Paths.get(d))
      try st.iterator().asScala.filter(p =>
        p.toString.endsWith(".parquet") && Files.isRegularFile(p))
        .map(_.toString).toList
      finally st.close()
    }

  test("writer death after data+changes write, before log publish: " +
      "debris is invisible, the version number is reused, vacuum clears it") {
    val dir = freshDir()
    val t = MiniLake(spark, dir)
    t.create(Seq(1L -> "a", 2L -> "b").toDF("key", "value"))

    // the crashed attempt: data and change files for would-be v=1,
    // fully written, no _log/1.json
    val v = t.latestVersion + 1
    val dataDebris = s"$dir/data/v=$v/w-crash0"
    val chgDebris = s"$dir/changes/v=$v/w-crash0"
    Seq(666L -> "poison").toDF("key", "value")
      .coalesce(1).write.parquet(dataDebris)
    Seq(666L -> "poison").toDF("key", "value")
      .withColumn(MiniLake.ChangeType, lit("insert"))
      .coalesce(1).write.parquet(chgDebris)

    // reads see only committed state
    assert(t.snapshot().select("key", "value").as[(Long, String)]
      .collect().toMap === Map(1L -> "a", 2L -> "b"))
    assert(t.latestVersion === 0L)

    // the next real commit REUSES the crashed version number (the log
    // alone assigns versions) and lands in its own attempt dir
    t.append(Seq(3L -> "c").toDF("key", "value"))
    assert(t.latestVersion === v)
    assert(t.snapshot().select("key", "value").as[(Long, String)]
      .collect().toMap === Map(1L -> "a", 2L -> "b", 3L -> "c"))
    // both attempt dirs exist under v=1; only the published one is read
    val attempts = Files.list(Paths.get(s"$dir/data/v=$v")).iterator()
      .asScala.map(_.getFileName.toString).toList
    assert(attempts.contains("w-crash0") &&
      attempts.exists(a => a.startsWith("w-") && a != "w-crash0"), attempts)
    // the change feed never shows the poison row
    val feed = t.readChanges(0, t.latestVersion)
      .select("key").as[Long].collect().toSet
    assert(!feed.contains(666L), feed)

    // vacuum reclaims the unreferenced attempt, keeps everything live
    t.vacuum(retainMillis = 0L)
    assert(parquetsUnder(dataDebris).isEmpty, "data debris survived vacuum")
    assert(parquetsUnder(chgDebris).isEmpty, "change debris survived vacuum")
    assert(t.snapshot().count() === 3L)
    MiniLake.deleteRecursively(dir)
  }

  test("writer death between DV sidecar write and log entry: the " +
      "stranded sidecar references LIVE rows yet never hides them") {
    val dir = freshDir()
    val t = MiniLake(spark, dir)
    t.create((0L until 10L).map(k => k -> s"v$k").toDF("key", "value"))

    // the stranded sidecar points at real physical rows of a live file
    // — the exact bytes deleteVectored would have published had it
    // survived to the log write
    val live = t.liveFiles(t.latestVersion)
    assert(live.nonEmpty)
    val v = t.latestVersion + 1
    val dvDebris = s"$dir/dv/v=$v/w-crash0"
    Seq((live.head, 0L), (live.head, 1L))
      .toDF(MiniLake.DvFileCol, MiniLake.DvPosCol)
      .coalesce(1).write.parquet(dvDebris)

    // unreferenced DVs are not part of the table: all 10 rows visible
    assert(t.snapshot().count() === 10L)
    // a real DV delete afterwards works and applies ONLY its own vector
    val n = t.deleteVectored(col("key") === 7L)
    assert(n === 1L)
    assert(t.snapshot().select("key").as[Long].collect().sorted.toSeq ===
      (0L until 10L).filterNot(_ == 7L))
    t.vacuum(retainMillis = 0L)
    assert(parquetsUnder(dvDebris).isEmpty, "dv debris survived vacuum")
    assert(t.snapshot().count() === 9L)
    MiniLake.deleteRecursively(dir)
  }

  test("bloom rebuild crashes: pre-manifest shard overwrite and " +
      "post-manifest partial stale-GC both stay conservative; a rerun " +
      "restores exact pruning") {
    import org.apache.spark.util.sketch.BloomFilter
    val dir = freshDir()
    Files.createDirectories(Paths.get(dir))
    def bloomOf(vals: Seq[Long]): BloomFilter = {
      val b = BloomFilter.create(1000, 0.01)
      vals.foreach(b.putLong)
      b
    }
    // 8 files, one distinct key each; shard layout 2 files/shard → 4 shards
    val files = (0 until 8).map(i => s"$dir/data/f$i.parquet")
    val keyOf = files.zipWithIndex.map { case (f, i) => f -> (100L + i) }.toMap
    def allTruePositivesKept(): Unit = {
      val h = BloomIndex.open(dir, "key")
      keyOf.foreach { case (f, k) =>
        assert(h.mightContain(f, Seq(k)),
          s"file $f lost its own key $k — false exclusion")
      }
    }
    def exactPruning(h: BloomIndex.Handle): Int =
      files.count(f => h.mightContain(f, Seq(keyOf(files.head))))

    BloomIndex.writeLocal(dir, "key", files.map(f => f -> bloomOf(Seq(keyOf(f)))).toMap,
      filesPerShard = 2)
    assert(BloomIndex.open(dir, "key").numShards === 4)
    assert(exactPruning(BloomIndex.open(dir, "key")) <= 2) // ~1 + fp margin

    // CRASH A — a narrower rebuild (2 shards, files f0..f5 only: f6/f7
    // were compacted away) dies after overwriting shard files 0 and 1
    // but BEFORE the manifest write: readers hold manifest(numShards=4)
    // against mixed-layout shards. Overwrite shards 0/1 with the
    // 2-shard layout's content, leave shards 2/3 and the manifest.
    val survivors = files.take(6)
    val narrow = survivors.groupBy(f => BloomIndex.shardOf(f, 2))
    (0 to 1).foreach { k =>
      BloomIndex.writeLocalShard(dir, "key", k,
        narrow.getOrElse(k, Seq.empty).map(f => f -> bloomOf(Seq(keyOf(f)))).toMap)
    }
    // conservative under the torn state: no file may lose its own key
    allTruePositivesKept()

    // CRASH B — the rebuild is rerun, gets through shards AND manifest
    // (numShards=2), then dies mid-GC with stale shard 3 still on disk
    BloomIndex.writeLocal(dir, "key",
      survivors.map(f => f -> bloomOf(Seq(keyOf(f)))).toMap, filesPerShard = 3)
    assert(BloomIndex.open(dir, "key").numShards === 2)
    BloomIndex.writeLocalShard(dir, "key", 3, Map.empty) // the un-GC'd straggler
    // stale shards ≥ numShards are unreachable: lookups exact for the
    // six rebuilt files, conservative (kept) for the two removed ones
    allTruePositivesKept()
    val h = BloomIndex.open(dir, "key")
    assert(survivors.count(f =>
      h.mightContain(f, Seq(keyOf(survivors.head)))) <= 2)

    // recovery: a clean rebuild restores exact pruning for everything
    BloomIndex.writeLocal(dir, "key",
      files.map(f => f -> bloomOf(Seq(keyOf(f)))).toMap, filesPerShard = 2)
    allTruePositivesKept()
    assert(exactPruning(BloomIndex.open(dir, "key")) <= 2)
    MiniLake.deleteRecursively(dir)
  }
}
