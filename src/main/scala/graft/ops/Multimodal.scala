package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Multimodal-column plumbing ([EXT] surface): media payloads travel as
  * opaque `binary` columns alongside a typed metadata struct, and
  * feature extraction runs as batched per-partition decoding — the
  * Scala analogue of a Pandas-UDF/`mapInPandas` stage, expressed with a
  * typed `Dataset.mapPartitions` so each task amortizes decoder setup
  * across its partition.
  *
  * The container has no image/audio codecs, so [[StubDecoder.decode]]
  * is a clearly-marked deterministic fake; everything around it —
  * schema (binary + struct), partitioning, batch iteration, output
  * shape — is the real pipeline and is what the tests and the driver
  * oracle exercise. Payloads are derived from testdata (`documents.text`
  * UTF-8 bytes) so the oracle can recompute every derived feature.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte],
      mime: String, n_bytes: Long)
  final case class MediaFeatures(doc_id: Long, n_bytes: Long,
      header_hex: String, width: Long, height: Long, frames: Long)

  /** STUB: deterministic stand-in for a real codec (image decode /
    * audio resample / video frame-sample). A production deployment
    * swaps only this function; the Spark plumbing stays identical.
    */
  object StubDecoder {
    def decode(payload: Array[Byte]): (String, Long, Long, Long) = {
      val header = payload.take(4).map(b => f"${b & 0xff}%02x").mkString
      val n = payload.length.toLong
      (header, n % 640, (n * 31) % 480, 1 + n % 8)
    }
  }

  /** Build the media table: binary payload + metadata struct. */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    documents(s, dir)
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        lit("text/plain").as("mime"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))
      .as[MediaRow]
  }

  /** Batched per-partition feature extraction over the binary column. */
  def extractMediaFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder setup would happen here (one codec
      // instance per task, reused across the batch)
      rows.map { r =>
        val (header, w, h, frames) = StubDecoder.decode(r.payload)
        MediaFeatures(r.doc_id, r.n_bytes, header, w, h, frames)
      }
    }
  }

  def q47MediaFeatures(s: SparkSession, dir: String): DataFrame =
    extractMediaFeatures(mediaTable(s, dir)).toDF().orderBy("doc_id")

  val q47Oracle: String =
    """SELECT doc_id,
      | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      | lower(substr(hex(encode(text)), 1, 8)) AS header_hex,
      | CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
      | CAST((octet_length(encode(text)) * 31) % 480 AS BIGINT) AS height,
      | CAST(1 + octet_length(encode(text)) % 8 AS BIGINT) AS frames
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q47_media_features" -> (q47MediaFeatures _)
  )

  def oracles: Map[String, String] = Map(
    "q47_media_features" -> q47Oracle
  )
}
