package graft.lake

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
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
  * per-file driver job), and the result lands in a sidecar JSON under
  * `<table>/_index/` published atomically. Files added after the build
  * simply have no entry and are conservatively kept by lookups, so a
  * stale index is slower, never wrong; rebuilding refreshes it.
  *
  * Sizing honesty: the sidecar holds ~`expectedItemsPerFile`-sized
  * filters (~80 KB at the default), and lookups load it driver-side —
  * fine to ~10k files (≈1 GB of metadata, the same order as a Delta
  * log checkpoint). Past that, shrink `expectedItemsPerFile` toward
  * the true per-file cardinality, or shard the sidecar and prune in a
  * metadata Spark job; correctness never depends on the choice
  * because absent entries are kept.
  */
object BloomIndex {

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

  private def indexPath(tablePath: String, colName: String) =
    Paths.get(tablePath, "_index", s"bloom_$colName.json")

  /** Build (or rebuild) the Bloom index for a long-typed column over
    * `files`, one filter per file, in ONE aggregation job.
    */
  def build(spark: SparkSession, tablePath: String, colName: String,
      files: Seq[String], schema: org.apache.spark.sql.types.StructType,
      expectedItemsPerFile: Long = 1L << 16, fpp: Double = 0.01): Unit = {
    if (files.isEmpty) return
    val agg = udaf(new BloomAgg(expectedItemsPerFile, fpp), Encoders.scalaLong)
    val perFile = spark.read.schema(schema).parquet(files: _*)
      .select(col("_metadata.file_path").as("f"),
        col(colName).cast("long").as("v"))
      .filter(col("v").isNotNull)
      .groupBy("f").agg(agg(col("v")).as("bloom"))
      .collect()
    val blooms = perFile.map { r =>
      // _metadata.file_path spells files as URIs; the commit log holds
      // plain paths — normalize so lookups match liveFiles entries
      val f = r.getString(0).stripPrefix("file:")
      f -> java.util.Base64.getEncoder.encodeToString(
        r.getAs[Array[Byte]](1))
    }.toMap
    val doc = Map[String, Object]("column" -> colName,
      "files" -> blooms.asJava)
    val p = indexPath(tablePath, colName)
    Files.createDirectories(p.getParent)
    val tmp = p.getParent.resolve(s".${p.getFileName}.tmp")
    Files.write(tmp, mapper.writeValueAsBytes(doc.asJava))
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Load the index: file path → deserialized filter. Empty when no
    * index was ever built (callers keep all files).
    */
  def load(tablePath: String, colName: String): Map[String, BloomFilter] = {
    val p = indexPath(tablePath, colName)
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
  }

  /** Keep `file` iff the index cannot rule out every probe value —
    * files without an entry (post-build appends, missing index) are
    * conservatively kept. No false negatives ⇒ never drops a match.
    */
  def mightContain(index: Map[String, BloomFilter], file: String,
      values: Seq[Long]): Boolean =
    index.get(file) match {
      case Some(bloom) => values.exists(bloom.mightContainLong)
      case None => true
    }
}
