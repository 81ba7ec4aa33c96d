// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** File-level Bloom skipping: a point lookup on a column the layout
  * does not cluster must open only the files whose Bloom might hold
  * the value — and must stay CORRECT when the index is stale or
  * missing (conservative keep, no false negatives).
  */
class BloomIndexSpec extends AnyFunSuite with BeforeAndAfterEach {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private var dir: String = _
  override def beforeEach(): Unit =
    dir = Files.createTempDirectory("bloomlake").toString + "/t"
  override def afterEach(): Unit =
    MiniLake.deleteRecursively(dir)

  /** Four appends split by key % 4: every file's [min, max] spans the
    * whole key domain, so min/max skipping keeps everything — the
    * exact shape where only a Bloom can prune.
    */
  private def build(): MiniLake = {
    val t = MiniLake(spark, dir)
    val rows = (0L until 400L).map(k => (k, s"v$k"))
    t.create(rows.filter(_._1 % 4 == 0).toDF("key", "value"))
    (1 to 3).foreach { m =>
      t.append(rows.filter(_._1 % 4 == m).toDF("key", "value"))
    }
    t
  }

  test("point lookup returns exactly the matching rows") {
    val t = build()
    t.buildBloomIndex("key")
    val got = t.snapshotForPoint("key", Seq(7L, 42L, 399L))
      .select("key").as[Long].collect().sorted.toSeq
    assert(got === Seq(7L, 42L, 399L))
  }

  test("the bloom prunes files min/max cannot") {
    val t = build()
    t.buildBloomIndex("key")
    val index = BloomIndex.open(dir, "key")
    assert(index.numShards > 0)
    val live = t.liveFiles(t.latestVersion)
    // key 42 lives in exactly one append's files (42 % 4 == 2); the
    // other appends' filters must rule their files out
    val kept = live.count(f => index.mightContain(f, Seq(42L)))
    assert(kept < live.size,
      s"bloom kept all $kept/${live.size} files — no pruning")
    // min/max stats CANNOT prune here: every append covers the domain
    val ranged = t.snapshotForRange("key", 42L, 42L)
    assert(ranged.filter(col("key") === 42L).count() === 1)
  }

  test("files appended after the build are conservatively kept") {
    val t = build()
    t.buildBloomIndex("key")
    t.append(Seq((1000L, "late")).toDF("key", "value"))
    val got = t.snapshotForPoint("key", Seq(1000L, 5L))
      .select("key").as[Long].collect().sorted.toSeq
    assert(got === Seq(5L, 1000L), "stale index must not hide new files")
  }

  test("missing index keeps every file (correct, just unpruned)") {
    val t = build()
    val got = t.snapshotForPoint("key", Seq(3L))
      .select("key").as[Long].collect().toSeq
    assert(got === Seq(3L))
  }

  test("10k-file sidecar: a point lookup loads exactly ONE shard") {
    // synthetic index — 10k per-file filters sharded at the default
    // granularity (→ 10 shards); building a real 10k-file lake would
    // dominate the suite without testing anything extra
    val nFiles = 10000
    val blooms = (0 until nFiles).map { i =>
      val b = org.apache.spark.util.sketch.BloomFilter.create(4, 0.01)
      b.putLong(i.toLong) // file i holds exactly key i
      s"$dir/part-$i.parquet" -> b
    }.toMap
    BloomIndex.writeLocal(dir, "key", blooms)
    val index = BloomIndex.open(dir, "key")
    assert(index.numShards ===
      math.ceil(nFiles.toDouble / BloomIndex.DefaultFilesPerShard).toInt)
    // one probed file → one shard deserialized, not the sidecar
    assert(index.mightContain(s"$dir/part-42.parquet", Seq(42L)))
    assert(index.shardsLoaded === 1)
    // a second probe hashing to the SAME shard reuses the cache
    val sameShard = (0 until nFiles)
      .map(i => s"$dir/part-$i.parquet")
      .find(f => f != s"$dir/part-42.parquet" &&
        BloomIndex.shardOf(f, index.numShards) ==
          BloomIndex.shardOf(s"$dir/part-42.parquet", index.numShards)).get
    index.mightContain(sameShard, Seq(1L))
    assert(index.shardsLoaded === 1)
    // an unknown file is conservatively kept (entry absent)
    assert(index.mightContain(s"$dir/part-new.parquet", Seq(9L)))
    // and pruning actually works across shards: file i rejects key j≠i
    assert(!index.mightContain(s"$dir/part-7.parquet", Seq(9999L)))
    assert(index.shardsLoaded <= 3)
  }

  test("a vanished shard file degrades to keep-everything, not wrong") {
    val blooms = (0 until 3000).map { i =>
      val b = org.apache.spark.util.sketch.BloomFilter.create(4, 0.01)
      b.putLong(i.toLong)
      s"$dir/part-$i.parquet" -> b
    }.toMap
    BloomIndex.writeLocal(dir, "key", blooms, filesPerShard = 1000)
    // simulate a racing rebuild that GC'd shard 2
    Files.delete(java.nio.file.Paths.get(dir, "_index", "bloom_key.shard2.json"))
    val index = BloomIndex.open(dir, "key")
    val inShard2 = (0 until 3000).map(i => s"$dir/part-$i.parquet")
      .filter(f => BloomIndex.shardOf(f, 3) == 2)
    assert(inShard2.nonEmpty)
    // every file whose shard is gone is kept for any probe value
    assert(inShard2.forall(f => index.mightContain(f, Seq(987654L))))
  }

  test("lookups read through deletion vectors") {
    val t = build()
    t.buildBloomIndex("key")
    t.deleteVectored(col("key") === 42L)
    assert(t.snapshotForPoint("key", Seq(42L, 43L))
      .select("key").as[Long].collect().toSeq === Seq(43L))
  }
}
