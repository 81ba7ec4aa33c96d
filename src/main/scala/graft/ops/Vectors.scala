package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Vector-column aggregations over `embeddings` ([EXT] surface):
  * per-label centroids — the building block for IVF coarse-quantizer
  * seeding, embedding-drift monitoring, and class prototypes.
  *
  * Shape: posexplode to (label, dim, value) rows, then a plain
  * hash-aggregate keyed on (label, dim). Everything stays inside
  * whole-stage codegen (no interpreted higher-order functions, no UDF;
  * the round-1 bench measured HOF lambdas at ~20µs/element), the
  * shuffle carries (int, int, double) triples keyed on (label, dim) —
  * at 100 TB that is the canonical map-side-combinable layout: partial
  * avgs per partition, one exchange of numLabels × dim rows.
  */
object Vectors {

  /** Mean embedding per label, one row per (label, dim). DECIMAL cast
    * after rounding for cross-engine hash stability (sum order differs
    * between engines; see the q10 decimal note).
    */
  def q60LabelCentroids(s: SparkSession, dir: String): DataFrame =
    embeddings(s, dir)
      .select(col("label"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "x")))
      .groupBy(col("label"), (col("pos") + 1).as("dim"))
      .agg(round(avg("x"), 6).cast("decimal(18,6)").as("c"))
      .select(col("label").cast("int").as("label"),
        col("dim").cast("long").as("dim"), col("c"))
      .orderBy("label", "dim")

  val q60Oracle: String =
    """SELECT label, dim,
      | CAST(round(avg(x), 6) AS DECIMAL(18,6)) AS c
      |FROM (SELECT label,
      |        CAST(unnest(embedding) AS DOUBLE) AS x,
      |        generate_subscripts(embedding, 1) AS dim
      |      FROM embeddings)
      |GROUP BY label, dim
      |ORDER BY label, dim""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q60_label_centroids" -> (q60LabelCentroids _)
  )

  def oracles: Map[String, String] = Map(
    "q60_label_centroids" -> q60Oracle
  )
}
