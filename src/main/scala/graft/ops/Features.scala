package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Feature-engineering / reconciliation operators ([EXT], SURVEY.md
  * §2.10): equi-depth discretization, chi-square association, and an
  * order-independent table checksum — the pieces a training pipeline
  * uses to turn raw columns into model features and to prove two
  * copies of a 100 TB table are identical without moving either.
  */
object Features {

  /** Equi-depth (quantile) binning of `events.value` into 10 deciles —
    * the feature-discretization complement to q129's equi-WIDTH
    * histogram: bucket boundaries adapt to the distribution so each
    * bin holds ~10% of the mass, which is what tree/embedding feature
    * pipelines feed on skewed columns.
    *
    * Scale shape: the 9 decile edges are ONE 1-row aggregate, broadcast
    * back over the table (BroadcastNestedLoopJoin of a single row —
    * constant cost); bin assignment is a codegen'd array `filter` per
    * row (9 comparisons, no shuffle); the per-bin report is a
    * map-side-combinable 10-group aggregate. Two scans total, nothing
    * driver-side. At 100 TB the exact `percentile` edge pass swaps for
    * `approx_percentile` (q120 proves the GK error bound is stable);
    * the gate uses the exact form so the oracle can state the same
    * edges.
    *
    * Engine parity: values are 6-dp-decimal quantized before the
    * percentile so both engines interpolate over the identical
    * multiset; edges are rounded back to the 6-dp grid before the
    * strict `v > edge` comparisons, so bin membership is decided on
    * exact decimal values, never a sub-ulp race.
    */
  def q150EquidepthBins(s: SparkSession, dir: String): DataFrame = {
    val v = round(col("value"), 6).cast("decimal(18,6)").cast("double")
    val taps = (1 to 9).map(_ / 10.0)
    val ev = events(s, dir).select(v.as("v"))
    val edges = ev.agg(
      expr(s"percentile(v, array(${taps.mkString(",")}))").as("raw"))
      .select(transform(col("raw"),
        e => round(e, 6).cast("decimal(18,6)").cast("double")).as("edges"))
    ev.crossJoin(broadcast(edges))
      .select(col("v"),
        size(filter(col("edges"), e => col("v") > e)).as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        round(min("v"), 6).cast("decimal(18,6)").cast("double").as("lo"),
        round(max("v"), 6).cast("decimal(18,6)").cast("double").as("hi"))
      .orderBy("bin")
  }

  val q150Oracle: String =
    """WITH v AS (SELECT CAST(CAST(round(value, 6) AS DECIMAL(18,6))
      |    AS DOUBLE) AS v FROM events),
      |e AS (SELECT list_transform(
      |    quantile_cont(v, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
      |    e -> CAST(CAST(round(e, 6) AS DECIMAL(18,6)) AS DOUBLE))
      |  AS edges FROM v)
      |SELECT len(list_filter(e.edges, x -> v.v > x)) AS bin,
      |  count(*) AS n,
      |  CAST(CAST(round(min(v.v), 6) AS DECIMAL(18,6)) AS DOUBLE) AS lo,
      |  CAST(CAST(round(max(v.v), 6) AS DECIMAL(18,6)) AS DOUBLE) AS hi
      |FROM v, e
      |GROUP BY 1 ORDER BY bin""".stripMargin

  /** Chi-square association between two categorical columns
    * (o_orderpriority × o_orderstatus) — the feature-selection /
    * drift-detection statistic. Unlike mutual information it needs no
    * logarithm, so the whole computation is exact integer counts plus
    * one identical IEEE expression per cell — cross-engine stable (the
    * q134 TVD-over-PSI argument).
    *
    * Scale shape: the contingency table is ONE map-side-combinable
    * aggregate over the scan (cells = |priorities|×|statuses| = 15
    * rows at any table size); row totals, column totals, and N are
    * re-aggregated from the CELLS, not the table — three tiny
    * aggregates over ≤15 rows joined back broadcast. The table is
    * scanned exactly once.
    */
  def q151ChiSquare(s: SparkSession, dir: String): DataFrame = {
    val cells = orders(s, dir)
      .groupBy("o_orderpriority", "o_orderstatus")
      .agg(count(lit(1)).as("obs"))
    val rowTot = cells.groupBy("o_orderpriority")
      .agg(sum("obs").as("row_tot"))
    val colTot = cells.groupBy("o_orderstatus")
      .agg(sum("obs").as("col_tot"))
    val n = cells.agg(sum("obs").as("n_total"))
    cells
      .join(broadcast(rowTot), "o_orderpriority")
      .join(broadcast(colTot), "o_orderstatus")
      .crossJoin(broadcast(n))
      .select(col("o_orderpriority"), col("o_orderstatus"), col("obs"),
        (col("row_tot").cast("double") * col("col_tot") / col("n_total"))
          .as("exp"))
      .select(col("o_orderpriority"), col("o_orderstatus"), col("obs"),
        round(col("exp"), 4).cast("decimal(18,4)").cast("double")
          .as("expected"),
        round((col("obs") - col("exp")) * (col("obs") - col("exp"))
          / col("exp"), 6).cast("decimal(18,6)").cast("double")
          .as("chi2_contrib"))
      .orderBy("o_orderpriority", "o_orderstatus")
  }

  val q151Oracle: String =
    """WITH cells AS (SELECT o_orderpriority, o_orderstatus,
      |  count(*) AS obs FROM orders GROUP BY 1, 2),
      |rt AS (SELECT o_orderpriority, sum(obs) AS row_tot
      |  FROM cells GROUP BY 1),
      |ct AS (SELECT o_orderstatus, sum(obs) AS col_tot
      |  FROM cells GROUP BY 1),
      |n AS (SELECT sum(obs) AS n_total FROM cells),
      |j AS (SELECT cells.o_orderpriority, cells.o_orderstatus, obs,
      |  CAST(row_tot AS DOUBLE) * col_tot / n_total AS exp
      | FROM cells JOIN rt USING (o_orderpriority)
      |   JOIN ct USING (o_orderstatus) CROSS JOIN n)
      |SELECT o_orderpriority, o_orderstatus, obs,
      |  CAST(CAST(round(exp, 4) AS DECIMAL(18,4)) AS DOUBLE) AS expected,
      |  CAST(CAST(round((obs - exp) * (obs - exp) / exp, 6)
      |    AS DECIMAL(18,6)) AS DOUBLE) AS chi2_contrib
      |FROM j
      |ORDER BY o_orderpriority, o_orderstatus""".stripMargin

  /** Order-independent table checksum — the cross-cluster
    * reconciliation primitive: two sites each digest their copy with
    * one scan and compare two short strings instead of shipping 100 TB.
    * Each row folds to a 40-bit-scale integer fingerprint; the table
    * digest is the plain SUM — commutative and associative, so it is
    * invariant under partitioning, task order, and AQE re-planning,
    * and it map-side-combines to one long per task.
    *
    * The gated fingerprint is digits-of-md5 (both engines render md5
    * identically; hex→int conversion is not portable SQL). The
    * library-grade variant is [[checksum]] below — xxhash64 over all
    * columns, 8× cheaper — which the oracle cannot replicate;
    * FeatureSpec proves its partitioning invariance instead.
    */
  def q152TableChecksum(s: SparkSession, dir: String): DataFrame = {
    def digest(df: DataFrame, name: String, key: org.apache.spark.sql.Column)
        : DataFrame = {
      val fp = substring(rpad(regexp_replace(md5(key), "[a-f]", ""),
        12, "0"), 1, 12).cast("long")
      df.select(fp.as("fp"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("fp").cast("decimal(20,0)")).cast("string").as("checksum"))
        .select(lit(name).as("table_name"), col("n_rows"), col("checksum"))
    }
    digest(orders(s, dir), "orders",
        concat_ws("|", col("o_orderkey"), col("o_orderstatus")))
      .union(digest(customer(s, dir), "customer",
        concat_ws("|", col("c_custkey"), col("c_mktsegment"))))
      .union(digest(lineitem(s, dir), "lineitem",
        concat_ws("|", col("l_orderkey"), col("l_linenumber"))))
      .orderBy("table_name")
  }

  val q152Oracle: String = {
    def digest(name: String, table: String, key: String): String =
      s"""SELECT '$name' AS table_name, count(*) AS n_rows,
         | CAST(CAST(sum(CAST(substr(rpad(regexp_replace(
         |   md5($key), '[a-f]', '', 'g'), 12, '0'), 1, 12) AS BIGINT))
         |   AS DECIMAL(38,0)) AS VARCHAR) AS checksum
         |FROM $table""".stripMargin
    Seq(
      digest("orders", "orders", "o_orderkey || '|' || o_orderstatus"),
      digest("customer", "customer", "c_custkey || '|' || c_mktsegment"),
      digest("lineitem", "lineitem", "l_orderkey || '|' || l_linenumber"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY table_name")
  }

  /** Library-grade checksum: xxhash64 across ALL columns, summed in
    * decimal — one scan, map-side combined, partitioning-invariant
    * (FeatureSpec). Two clusters comparing a 100 TB table exchange
    * this one row.
    */
  def checksum(df: DataFrame): DataFrame =
    df.select(xxhash64(df.columns.map(col).toIndexedSeq: _*).as("fp"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("fp").cast("decimal(38,0)")).as("checksum"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q150_equidepth_bins" -> (q150EquidepthBins _),
    "q151_chi_square" -> (q151ChiSquare _),
    "q152_table_checksum" -> (q152TableChecksum _)
  )

  def oracles: Map[String, String] = Map(
    "q150_equidepth_bins" -> q150Oracle,
    "q151_chi_square" -> q151Oracle,
    "q152_table_checksum" -> q152Oracle
  )
}
