package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Deterministic dataset splitting for training pipelines ([EXT]
  * surface). Membership is a pure function of the stable document id —
  * `md5(doc_id)` hex prefix compared against fixed thresholds — so the
  * split is reproducible across runs, engines, and data layouts, needs
  * no RNG state or shuffle, survives incremental ingest (a new document
  * lands in one split forever), and is embarrassingly parallel at any
  * scale. This is how production corpora pin eval sets; `randomSplit`
  * (used where the REFERENCE shards work, Extract.scala) is
  * partition-order-sensitive and unsuitable for persistent splits.
  *
  * Thresholds: first two hex digits of md5 ≈ uniform over 0..255;
  * `< "cd"` (205/256 ≈ 80.1%) → train, `< "e6"` (230/256 ≈ 89.8%) →
  * val, rest → test. Hex-string comparison keeps both engines
  * bit-identical with no hex→int conversion.
  */
object Sampling {

  private def splitCol = {
    val bucket = substring(
      md5(col("doc_id").cast("string").cast("binary")), 1, 2)
    when(bucket < "cd", "train")
      .when(bucket < "e6", "val")
      .otherwise("test")
  }

  /** Per-(lang, split) composition of the corpus — the stratification
    * report a training-mix pipeline monitors.
    */
  def q59HashSplit(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .withColumn("split", splitCol)
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n"), min("doc_id").as("first_doc"))
      .orderBy("lang", "split")

  val q59Oracle: String =
    """WITH d AS (
      |  SELECT doc_id, lang,
      |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
      |           THEN 'train'
      |         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
      |           THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM documents)
      |SELECT lang, split, count(*) AS n, min(doc_id) AS first_doc
      |FROM d
      |GROUP BY lang, split
      |ORDER BY lang, split""".stripMargin

  /** Per-document assignment (the thing a pipeline joins on). */
  def assignSplits(df: DataFrame): DataFrame =
    df.withColumn("split", splitCol)

  /** Per-group capped sampling — "at most K documents per language",
    * the domain-balancing step that stops one source from dominating
    * a training mix. Deterministic: rank within each group by
    * md5(doc_id) (a stable pseudo-random order — same order every
    * run, every engine, any partitioning) and keep rank ≤ K.
    *
    * One shuffle on the group key; rank is a window row_number, which
    * at 100 TB sorts only within each group's partitions. Skewed
    * groups (one lang = half the corpus) are the known hazard; the
    * remedy at scale is two-phase: pre-filter with a per-partition
    * cap (any partition contributes at most K) before the global
    * window — here groups are modest so the single window is the
    * honest plan.
    */
  def q78CappedSample(s: SparkSession, dir: String): DataFrame = {
    val k = 30
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang")
      .orderBy(md5(col("doc_id").cast("string").cast("binary")),
        col("doc_id"))
    documents(s, dir)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("lang"), col("rk"), col("doc_id"))
      .orderBy("lang", "rk")
  }

  val q78Oracle: String =
    """WITH ranked AS (
      |  SELECT lang, doc_id,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |  FROM documents)
      |SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id
      |FROM ranked WHERE rk <= 30
      |ORDER BY lang, rk""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q59_hash_split" -> (q59HashSplit _),
    "q78_capped_sample" -> (q78CappedSample _)
  )

  def oracles: Map[String, String] = Map(
    "q59_hash_split" -> q59Oracle,
    "q78_capped_sample" -> q78Oracle
  )
}
