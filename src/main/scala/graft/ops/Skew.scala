package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
