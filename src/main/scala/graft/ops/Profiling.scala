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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q83_column_profile" -> (q83ColumnProfile _)
  )

  def oracles: Map[String, String] = Map(
    "q83_column_profile" -> q83Oracle
  )
}
