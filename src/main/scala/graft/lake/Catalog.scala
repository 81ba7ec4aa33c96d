// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog registration (S12/S13, patient_notes/src/patient_notes/
  * datalake.py:102-120): after a gold write the reference registers the
  * table in Unity Catalog with `CREATE TABLE IF NOT EXISTS
  * cat.schema.t LOCATION 'path'` so analysts can `SELECT * FROM` it.
  *
  * Two registration paths here:
  *  - plain parquet directories use the identical external-table DDL
  *    against Spark's built-in catalog;
  *  - MiniLake tables register the current snapshot as a view (an
  *    external parquet table over the lake root would read every
  *    version's files — the snapshot view is the correct relation).
  */
object Catalog {

  /** Exact reference DDL shape for a plain parquet location
    * (datalake.py:102-120). `catalog` defaults to the session catalog;
    * the reference passes its Unity Catalog name — here any registered
    * catalog works, `spark_catalog` being the built-in one.
    */
  def registerParquetTable(spark: SparkSession, schema: String,
      table: String, path: String,
      catalog: String = "spark_catalog"): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $catalog.$schema")
    spark.sql(s"CREATE TABLE IF NOT EXISTS $catalog.$schema.$table " +
      s"USING PARQUET LOCATION '$path'")
  }

  /** Register a MiniLake table's live snapshot under a queryable name.
    * `qualifier` prefixes the reference's catalog.schema naming onto the
    * view name (views are session-scoped here, so the qualifier is part
    * of the name rather than a namespace).
    */
  def registerLakeTable(spark: SparkSession, name: String,
      lakePath: String, qualifier: Option[(String, String)] = None): Unit = {
    val viewName = qualifier match {
      case Some((cat, sch)) => s"${cat}_${sch}_$name"
      case None => name
    }
    MiniLake(spark, lakePath).snapshot().createOrReplaceTempView(viewName)
  }

  /** S13 — SQL entry over a registered name (Demo.ipynb cell 20). */
  def query(spark: SparkSession, sql: String): DataFrame = spark.sql(sql)
}
