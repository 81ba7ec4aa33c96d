// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.lake

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** File-level Bloom index — point-lookup data skipping for columns the
  * layout does NOT cluster. Min/max stats (q91/q100/q101) prune range
  * queries on sorted layouts; they are useless for a point lookup on a
  * column whose values scatter across every file (each file's [min,
  * max] spans the whole domain). A per-file Bloom has no false
  * negatives, so a `col = v` lookup opens only files whose filter
  * might contain `v` — the Hudi bloom-index / Iceberg puffin design.
  *
  * The index is DERIVED metadata, not part of the commit protocol: one
  * distributed pass over the live files builds every file's filter in
  * a single aggregation keyed on `_metadata.file_path` (never a
  * per-file driver job), and the result lands in a SHARDED sidecar
  * under `<table>/_index/`: a tiny manifest (`bloom_<col>.json`,
  * `{column, numShards}`) plus `numShards` shard files, each holding
  * the filters of the files whose path-hash lands in that shard.
  * Files added after the build simply have no entry and are
  * conservatively kept by lookups, so a stale index is slower, never
  * wrong; rebuilding refreshes it.
  *
  * Scale posture (both directions bounded):
  *  - BUILD: each shard's JSON is serialized ON THE EXECUTORS
  *    (`mapGroups` keyed by shard) and streamed to the driver one
  *    shard at a time (`toLocalIterator`) — driver memory is one
  *    shard (~`filesPerShard` × ~80 KB ≈ 80 MB at the defaults),
  *    never the whole index, at ANY file count.
  *  - LOOKUP: [[Handle]] resolves a file to its shard by the same
  *    path hash and deserializes ONLY that shard, caching it for
  *    subsequent probes — a point lookup over a 10⁶-file table reads
  *    one ~80 MB shard, not a ~80 GB sidecar. A missing shard file
  *    (e.g. a racing rebuild shrank the shard count) degrades to
  *    "keep everything in it", never to a wrong answer, because file
  *    paths are immutable in the commit protocol and absent entries
  *    are kept.
  */
object BloomIndex {

  /** Default shard granularity: ~1k files/shard ≈ 80 MB of filters at
    * the default per-file sizing — one comfortable driver/executor
    * unit. 10⁶ files → ~1k shards.
    */
  val DefaultFilesPerShard = 1024

  /** Deterministic file→shard hash, identical on build (executors)
    * and lookup (driver).
    */
  def shardOf(file: String, numShards: Int): Int =
    Math.floorMod(scala.util.hashing.MurmurHash3.stringHash(file),
      numShards)

  /** One-pass per-file Bloom build: buffer = the sketch itself (no
    * false negatives under merge because `mergeInPlace` ORs bitsets
    * of identically-sized filters).
    */
  private final class BloomAgg(expectedItems: Long, fpp: Double)
      extends Aggregator[Long, BloomFilter, Array[Byte]] {
    override def zero: BloomFilter = BloomFilter.create(expectedItems, fpp)
    override def reduce(b: BloomFilter, v: Long): BloomFilter = {
      b.putLong(v); b
    }
    override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
      a.mergeInPlace(b); a
    }
    override def finish(b: BloomFilter): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      b.writeTo(out)
      out.toByteArray
    }
    override def bufferEncoder: Encoder[BloomFilter] =
      Encoders.javaSerialization[BloomFilter]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  private val mapper = new ObjectMapper()

  private def indexDir(tablePath: String): Path =
    Paths.get(tablePath, "_index")

  private def manifestPath(tablePath: String, colName: String): Path =
    indexDir(tablePath).resolve(s"bloom_$colName.json")

  private def shardPath(tablePath: String, colName: String, k: Int): Path =
    indexDir(tablePath).resolve(s"bloom_$colName.shard$k.json")

  private def atomicWrite(p: Path, bytes: Array[Byte]): Unit = {
    Files.createDirectories(p.getParent)
    val tmp = p.getParent.resolve(s".${p.getFileName}.tmp")
    Files.write(tmp, bytes)
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  private def shardJson(blooms: Map[String, String]): Array[Byte] =
    mapper.writeValueAsBytes(
      Map[String, Object]("files" -> blooms.asJava).asJava)

  /** Build (or rebuild) the Bloom index for a long-typed column over
    * `files`, one filter per file, in ONE aggregation job. Shard
    * serialization happens on the executors; the driver streams one
    * finished shard at a time to disk.
    */
  def build(spark: SparkSession, tablePath: String, colName: String,
      files: Seq[String], schema: org.apache.spark.sql.types.StructType,
      expectedItemsPerFile: Long = 1L << 16, fpp: Double = 0.01,
      filesPerShard: Int = DefaultFilesPerShard): Unit = {
    if (files.isEmpty) return
    val numShards =
      math.max(1, math.ceil(files.size.toDouble / filesPerShard).toInt)
    val agg = udaf(new BloomAgg(expectedItemsPerFile, fpp), Encoders.scalaLong)
    val perFile = spark.read.schema(schema).parquet(files: _*)
      .select(col("_metadata.file_path").as("f"),
        col(colName).cast("long").as("v"))
      .filter(col("v").isNotNull)
      .groupBy("f").agg(agg(col("v")).as("bloom"))
      .as(Encoders.tuple(Encoders.STRING, Encoders.BINARY))
    val shards = perFile
      // _metadata.file_path spells files as URIs; the commit log holds
      // plain paths — normalize so lookups match liveFiles entries
      .map { case (f, b) => (f.stripPrefix("file:"), b) }(
        Encoders.tuple(Encoders.STRING, Encoders.BINARY))
      .groupByKey { case (f, _) => shardOf(f, numShards) }(Encoders.scalaInt)
      .mapGroups { (k, it) =>
        val blooms = it.map { case (f, bytes) =>
          f -> java.util.Base64.getEncoder.encodeToString(bytes)
        }.toMap
        (k, shardJson(blooms))
      }(Encoders.tuple(Encoders.scalaInt, Encoders.BINARY))
    // one shard resident on the driver at a time, not the index
    shards.toLocalIterator().asScala.foreach { case (k, bytes) =>
      atomicWrite(shardPath(tablePath, colName, k), bytes)
    }
    // manifest LAST: a reader that sees it finds the shards in place
    atomicWrite(manifestPath(tablePath, colName),
      mapper.writeValueAsBytes(Map[String, Object](
        "column" -> colName,
        "numShards" -> Integer.valueOf(numShards)).asJava))
    // best-effort GC of shards a previous, wider build left behind; a
    // racing reader holding the old manifest just keeps those files
    val listing = Files.list(indexDir(tablePath))
    val stale =
      try listing.iterator().asScala.filter { p =>
        val n = p.getFileName.toString
        n.startsWith(s"bloom_$colName.shard") && n.endsWith(".json") &&
          n.stripPrefix(s"bloom_$colName.shard").stripSuffix(".json")
            .toIntOption.exists(_ >= numShards)
      }.toList
      finally listing.close()
    stale.foreach(p => Files.deleteIfExists(p))
  }

  /** Lazy, shard-granular view of one column's index. Thread-confined
    * (built per lookup); loaded shards are cached for multi-probe
    * lookups. `shardsLoaded` is observability for specs and ops: a
    * single-file probe must report 1.
    */
  final class Handle private[BloomIndex] (tablePath: String,
      colName: String, val numShards: Int) {
    private val cache = mutable.Map.empty[Int, Map[String, BloomFilter]]
    private var loaded = 0
    def shardsLoaded: Int = loaded

    private def shard(k: Int): Map[String, BloomFilter] =
      cache.getOrElseUpdate(k, {
        loaded += 1
        val p = shardPath(tablePath, colName, k)
        if (!Files.isRegularFile(p)) Map.empty
        else {
          val m = mapper.readValue(Files.readAllBytes(p),
            classOf[java.util.Map[String, Object]])
          m.get("files").asInstanceOf[java.util.Map[String, String]]
            .asScala.map { case (f, b64) =>
              f -> BloomFilter.readFrom(new java.io.ByteArrayInputStream(
                java.util.Base64.getDecoder.decode(b64)))
            }.toMap
        }
      })

    /** Keep `file` iff its shard cannot rule out every probe value —
      * files without an entry (post-build appends, missing index or
      * shard) are conservatively kept. No false negatives ⇒ never
      * drops a match.
      */
    def mightContain(file: String, values: Seq[Long]): Boolean =
      if (numShards <= 0) true
      else shard(shardOf(file, numShards)).get(file) match {
        case Some(bloom) => values.exists(bloom.mightContainLong)
        case None => true
      }
  }

  /** Open the index for lookups. A missing manifest yields a handle
    * that keeps every file (correct, just unpruned).
    */
  def open(tablePath: String, colName: String): Handle = {
    val p = manifestPath(tablePath, colName)
    val n =
      if (!Files.isRegularFile(p)) 0
      // a pre-shard sidecar stored the WHOLE files→filter map at this
      // path (~100 KB/file); parsing it just to find no numShards key
      // would be the exact driver-side load sharding removed. The real
      // manifest is <100 bytes — anything big is legacy: keep-all.
      else if (Files.size(p) > (1L << 16)) 0
      else {
        val m = mapper.readValue(Files.readAllBytes(p),
          classOf[java.util.Map[String, Object]])
        m.get("numShards") match {
          case i: Number => i.intValue()
          case _ => 0 // unrecognized/legacy manifest: keep everything
        }
      }
    new Handle(tablePath, colName, n)
  }

  /** Write ONE shard file without touching the manifest — the crash
    * spec's injection point for a rebuild that died mid-shard-writes
    * (torn shard content under the old manifest) or mid-stale-GC
    * (an orphan shard ≥ the new manifest's count).
    */
  private[lake] def writeLocalShard(tablePath: String, colName: String,
      k: Int, blooms: Map[String, BloomFilter]): Unit = {
    val enc = blooms.map { case (f, b) =>
      val out = new java.io.ByteArrayOutputStream()
      b.writeTo(out)
      f -> java.util.Base64.getEncoder.encodeToString(out.toByteArray)
    }
    atomicWrite(shardPath(tablePath, colName, k), shardJson(enc))
  }

  /** Driver-side index write for synthetic fixtures (spec-sized
    * tables where spinning a Spark job per case would dominate the
    * suite). Same shard layout and manifest as [[build]].
    */
  private[lake] def writeLocal(tablePath: String, colName: String,
      blooms: Map[String, BloomFilter],
      filesPerShard: Int = DefaultFilesPerShard): Unit = {
    val numShards =
      math.max(1, math.ceil(blooms.size.toDouble / filesPerShard).toInt)
    blooms.groupBy { case (f, _) => shardOf(f, numShards) }
      .foreach { case (k, entries) =>
        val enc = entries.map { case (f, b) =>
          val out = new java.io.ByteArrayOutputStream()
          b.writeTo(out)
          f -> java.util.Base64.getEncoder.encodeToString(out.toByteArray)
        }
        atomicWrite(shardPath(tablePath, colName, k), shardJson(enc))
      }
    atomicWrite(manifestPath(tablePath, colName),
      mapper.writeValueAsBytes(Map[String, Object](
        "column" -> colName,
        "numShards" -> Integer.valueOf(numShards)).asJava))
  }
}
