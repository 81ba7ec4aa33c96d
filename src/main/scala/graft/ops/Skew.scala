package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Skew-mitigation utilities ([EXT]): salting for hot keys. AQE's
  * skew-join handling covers sort-merge joins at runtime; salting is
  * the explicit variant for aggregations and broadcast-averse shapes
  * where one key dominates (the classic null-key / power-law problem
  * at 100 TB).
  */
object Skew {

  /** Two-phase salted aggregation: groupBy(keys :+ salt) partial →
    * groupBy(keys) final. Correct for decomposable aggregates; `sums`
    * maps output column → input column to sum.
    *
    * At 100 TB the first shuffle spreads a hot key over `saltBuckets`
    * reducers; the second shuffle moves only `keys × saltBuckets`
    * pre-aggregated rows.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], sums: Map[String, String],
      saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)))
    val partialAggs = sums.map { case (out, in) =>
      sum(col(in)).as(s"_p_$out")
    }.toSeq
    val partial = salted.groupBy((keys :+ "_salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs = sums.keys.map(out =>
      sum(col(s"_p_$out")).as(out)).toSeq
    partial.groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted broadcast join against a hot-keyed big side: explode the
    * small side `saltBuckets`× with a salt column, salt the big side
    * randomly-but-deterministically, join on keys + salt. Keeps a
    * single hot key from pinning one task.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltBuckets: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets)))
    val saltedSmall = small
      .withColumn("_salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
      .withColumn("_salt", col("_salt").cast("long"))
    saltedBig.join(broadcast(saltedSmall), keys :+ "_salt").drop("_salt")
  }

  /** The salted two-phase aggregation as a gate query: sum lineitem
    * quantity/price by returnflag through `saltedSum` (16 salt
    * buckets), checked against the oracle's PLAIN group-by — salting
    * must be observably invisible in the result while spreading each
    * hot key over 16 reducers in phase one. (LayoutSkewSpec asserts
    * salted == plain inside Spark; this gate asserts it cross-engine.)
    *
    * l_quantity is integer-valued so its sum is exact under any
    * grouping order; the price sum takes the usual round + DECIMAL
    * discretization.
    */
  def q81SaltedAgg(s: SparkSession, dir: String): DataFrame =
    saltedSum(lineitem(s, dir), Seq("l_returnflag"),
      Map("sum_qty" -> "l_quantity", "sum_price" -> "l_extendedprice"),
      saltBuckets = 16)
      .select(col("l_returnflag"),
        round(col("sum_qty"), 2).cast("decimal(18,2)")
          .cast("double").as("sum_qty"),
        round(col("sum_price"), 2).cast("decimal(18,2)")
          .cast("double").as("sum_price"))
      .orderBy("l_returnflag")

  val q81Oracle: String =
    """SELECT l_returnflag,
      | CAST(CAST(round(sum(l_quantity), 2) AS DECIMAL(18,2)) AS DOUBLE)
      |   AS sum_qty,
      | CAST(CAST(round(sum(l_extendedprice), 2) AS DECIMAL(18,2)) AS DOUBLE)
      |   AS sum_price
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q81_salted_agg" -> (q81SaltedAgg _)
  )

  def oracles: Map[String, String] = Map(
    "q81_salted_agg" -> q81Oracle
  )
}
