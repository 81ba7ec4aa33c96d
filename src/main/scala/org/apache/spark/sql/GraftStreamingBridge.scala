// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package org.apache.spark.sql

/** Bridge for V1 streaming `Source` implementations: `getBatch` must
  * return a DataFrame whose logical plan carries `isStreaming = true`
  * (MicroBatchExecution asserts it), but that flag is only settable
  * through the session's `private[sql]` `internalCreateDataFrame`.
  * Spark's own file source reaches the same flag via its internal
  * `LogicalRelation(..., isStreaming = true)`; external sources use
  * exactly this package-scoped bridge (the standard pattern across
  * open-source Spark connectors).
  *
  * The wrap is lazy: `queryExecution.toRdd` is a lazy val, so the
  * underlying batch plan — parquet scans with pushdown intact — plans
  * and executes only when the micro-batch runs.
  */
object GraftStreamingBridge {
  def asStreamingFrame(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
