package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Relational operator surface (SURVEY.md §2.2–2.6) expressed as
  * deterministic, oracle-checkable queries over the driver testdata.
  *
  * Design notes for scale (the queries run unchanged on a cluster):
  *   - every aggregate is a hash aggregate with map-side partial agg
  *     (Catalyst default for `groupBy.agg`);
  *   - dimension tables (region/nation/part/supplier/customer at TPC-H
  *     proportions) are explicitly `broadcast()` so fact-side scans never
  *     shuffle for the join;
  *   - all outputs are explicitly ordered and double aggregates rounded
  *     to 2 decimals so the DuckDB hash-compare is stable across engines.
  */
object Relational {

  /** Pricing summary (TPC-H Q1 shape): scan → filter → partial+final
    * hash agg → sort. Reference surface: A1 groupBy/agg, P4 filter, O1
    * orderBy (SURVEY.md §2.4, §2.2, §2.5).
    */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg("l_quantity"), 2).as("avg_qty"),
        round(avg("l_extendedprice"), 2).as("avg_price"),
        round(avg("l_discount"), 2).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      | round(sum(l_quantity),2) AS sum_qty,
      | round(sum(l_extendedprice),2) AS sum_base_price,
      | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
      | round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
      | round(avg(l_quantity),2) AS avg_qty,
      | round(avg(l_extendedprice),2) AS avg_price,
      | round(avg(l_discount),2) AS avg_disc,
      | count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (q1PricingSummary _)
  )

  def oracles: Map[String, String] = Map(
    "q1_pricing_summary" -> q1Oracle
  )
}
