package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Data-profiling operator ([EXT]): per-column null counts, exact
  * distinct cardinality, and min/max — the ANALYZE/data-quality sweep
  * a pipeline runs before trusting a new 100 TB drop.
  *
  * Scale shape: ONE scan of the table computes every column's stats in
  * a single aggregation (Catalyst plans the multi-countDistinct via
  * Expand — the table is read once, not once per column), then the
  * wide single row unpivots driver-side into the (column, stats)
  * report. Profiling N columns never costs N scans.
  */
object Profiling {

  private val profiled = Seq("o_orderkey", "o_orderpriority", "o_orderstatus")

  def q83ColumnProfile(s: SparkSession, dir: String): DataFrame = {
    val aggs = profiled.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
        countDistinct(col(c)).as(s"${c}_distinct"),
        min(col(c)).cast("string").as(s"${c}_min"),
        max(col(c)).cast("string").as(s"${c}_max"))
    } :+ count(lit(1)).as("n_rows")
    val wide = orders(s, dir).agg(aggs.head, aggs.tail: _*)
    val stackExpr = profiled.map(c =>
      s"'$c', ${c}_nulls, ${c}_distinct, ${c}_min, ${c}_max")
      .mkString(s"stack(${profiled.size}, ", ", ", ")")
    wide.select(col("n_rows"),
        expr(s"$stackExpr as (col_name, n_nulls, n_distinct, min_v, max_v)"))
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_v"), col("max_v"))
      .orderBy("col_name")
  }

  val q83Oracle: String = profiled.map(c =>
    s"""SELECT '$c' AS col_name, count(*) AS n_rows,
       | count(*) - count($c) AS n_nulls,
       | count(DISTINCT $c) AS n_distinct,
       | CAST(min($c) AS VARCHAR) AS min_v,
       | CAST(max($c) AS VARCHAR) AS max_v
       |FROM orders""".stripMargin)
    .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")

  /** Moment statistics (count / mean / stddev / min / max) per
    * event_type — the numeric half of the profiling sweep (q83 covers
    * nulls/cardinality). The point is HOW the moments are computed:
    * `stddev_samp` is a sum of squares whose accumulation order
    * differs across engines and partitionings (the sub-ulp trap that
    * bit round 1), so the sums run in DECIMAL — values quantized to
    * 6 dp, Σv and Σv² as exact integer arithmetic — and only the final
    * mean/variance formula is IEEE double math on identical exact
    * inputs. Both engines (and any partition count) produce
    * bit-identical doubles.
    *
    * Scale: one scan, one map-side-combinable aggregate keyed on
    * event_type; decimal partials are (16-byte, 16-byte, long) per
    * group per task — the same wire cost as the naive double sums.
    */
  def q106StatsProfile(s: SparkSession, dir: String): DataFrame = {
    val v = round(col("value"), 6).cast("decimal(18,6)")
    events(s, dir)
      .select(col("event_type"), v.as("v"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(col("v")).cast("double").as("s"),
        sum(col("v") * col("v")).cast("double").as("sq"),
        min(col("v")).cast("double").as("min_v"),
        max(col("v")).cast("double").as("max_v"))
      .select(
        col("event_type"),
        col("n"),
        round(col("s") / col("n"), 4).as("mean_v"),
        round(sqrt((col("sq") - col("s") * col("s") / col("n"))
          / (col("n") - 1)), 4).as("stddev_v"),
        col("min_v"), col("max_v"))
      .orderBy("event_type")
  }

  val q106Oracle: String =
    """WITH v AS (SELECT event_type,
      |  CAST(round(value, 6) AS DECIMAL(18,6)) AS v FROM events),
      |agg AS (SELECT event_type, count(*) AS n,
      |  CAST(sum(v) AS DOUBLE) AS s,
      |  CAST(sum(v*v) AS DOUBLE) AS sq,
      |  CAST(min(v) AS DOUBLE) AS min_v,
      |  CAST(max(v) AS DOUBLE) AS max_v
      | FROM v GROUP BY event_type)
      |SELECT event_type, CAST(n AS BIGINT) AS n,
      | round(s / n, 4) AS mean_v,
      | round(sqrt((sq - s*s/n) / (n-1)), 4) AS stddev_v,
      | min_v, max_v
      |FROM agg ORDER BY event_type""".stripMargin

  /** Data-quality expectation checks (the Delta Live Tables
    * `EXPECT` / Great-Expectations shape): a rule registry evaluated
    * in ONE scan of the table, reported as (rule, rows, violations,
    * violation fraction). The pipeline-gate usage is "fail the run
    * when violation_frac exceeds budget"; the report keeps every rule
    * visible so budgets can be tuned without re-scanning.
    *
    * NULL predicate results count as violations (a rule that cannot
    * evaluate did not pass — Delta's constraint semantics).
    */
  def expectations(df: DataFrame, rules: Seq[(String, org.apache.spark.sql.Column)])
      : DataFrame = {
    val aggs = rules.map { case (name, cond) =>
      sum(when(coalesce(cond, lit(false)), 0L).otherwise(1L)).as(s"v_$name")
    } :+ count(lit(1)).as("n_rows")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = rules.map { case (name, _) => s"'$name', v_$name" }
      .mkString(s"stack(${rules.size}, ", ", ", ")")
    wide.select(col("n_rows"), expr(s"$stackExpr as (rule, n_violations)"))
      .select(col("rule"), col("n_rows"), col("n_violations"),
        round(col("n_violations").cast("double") / col("n_rows"), 4)
          .as("violation_frac"))
      .orderBy("rule")
  }

  /** The expectation sweep as a gate, over `orders`: two rules that
    * hold and two that are genuinely violated by this data (a price
    * cap and a date window), so both report paths are load-bearing.
    */
  def q111Expectations(s: SparkSession, dir: String): DataFrame =
    expectations(orders(s, dir), Seq(
      "date_in_window" ->
        (col("o_orderdate") >= to_timestamp(lit("1995-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("2000-01-01"))),
      "price_below_cap" -> (col("o_totalprice") <= 450000.0),
      "price_positive" -> (col("o_totalprice") > 0.0),
      "status_known" -> col("o_orderstatus").isin("O", "F", "P")))

  val q111Oracle: String = {
    val rules = Seq(
      "date_in_window" ->
        "(o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '2000-01-01')",
      "price_below_cap" -> "(o_totalprice <= 450000.0)",
      "price_positive" -> "(o_totalprice > 0.0)",
      "status_known" -> "(o_orderstatus IN ('O','F','P'))")
    rules.map { case (name, cond) =>
      s"""SELECT '$name' AS rule, count(*) AS n_rows,
         | CAST(sum(CASE WHEN coalesce($cond, false) THEN 0 ELSE 1 END)
         |   AS BIGINT) AS n_violations,
         | round(CAST(sum(CASE WHEN coalesce($cond, false) THEN 0 ELSE 1 END)
         |   AS DOUBLE) / count(*), 4) AS violation_frac
         |FROM orders""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY rule")
  }

  /** Fixed-width value histogram per event type — the distribution
    * report behind data-drift monitors and equi-width histogram
    * statistics. Bucket = min(⌊value/64⌋, 7), so the top bucket is
    * open-ended; counts plus a per-bucket mass column. One scan, one
    * map-side-combinable aggregate keyed on (type, bucket) — 40 groups
    * regardless of table size. The mass sums values quantized to
    * DECIMAL(18,2) (their storage precision) so the totals are
    * order-independent across engines and partitionings.
    */
  val HistBucketWidth = 64.0
  val HistTopBucket = 7

  def q129ValueHistogram(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("event_type"),
        least(floor(col("value") / HistBucketWidth), lit(HistTopBucket))
          .cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,2)")), 2)
          .cast("decimal(18,2)").cast("double").as("total"))
      .orderBy("event_type", "bucket")

  val q129Oracle: String =
    s"""SELECT event_type,
      | least(CAST(floor(value / $HistBucketWidth) AS BIGINT),
      |   $HistTopBucket) AS bucket,
      | count(*) AS n,
      | CAST(CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2)
      |   AS DECIMAL(18,2)) AS DOUBLE) AS total
      |FROM events GROUP BY event_type, bucket
      |ORDER BY event_type, bucket""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q83_column_profile" -> (q83ColumnProfile _),
    "q106_stats_profile" -> (q106StatsProfile _),
    "q111_expectations" -> (q111Expectations _),
    "q129_value_histogram" -> (q129ValueHistogram _)
  )

  def oracles: Map[String, String] = Map(
    "q83_column_profile" -> q83Oracle,
    "q106_stats_profile" -> q106Oracle,
    "q111_expectations" -> q111Oracle,
    "q129_value_histogram" -> q129Oracle
  )
}
