package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical-layout utilities for shuffle-free joins at scale ([EXT]):
  * bucketed tables co-locate join keys at write time so repeated
  * fact⋈fact joins and aggregations on the bucket key need no
  * exchange — the standard 100 TB technique for dimension-stable
  * pipelines (write once bucketed, join many times for free).
  *
  * Bucketing requires the session catalog (`saveAsTable`); callers
  * pick bucket counts so `rows/buckets` fits an executor's memory at
  * target scale.
  */
object Layout {

  /** Write `df` as a bucketed+sorted catalog table. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      numBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** True when the physical plan of `df` contains a shuffle exchange —
    * the assertion hook for bucketed-join tests.
    */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
}
