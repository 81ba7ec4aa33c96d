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

  /** Exact reference DDL shape for a plain parquet location. */
  def registerParquetTable(spark: SparkSession, schema: String,
      table: String, path: String): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $schema")
    spark.sql(
      s"CREATE TABLE IF NOT EXISTS $schema.$table USING PARQUET LOCATION '$path'")
  }

  /** Register a MiniLake table's live snapshot under a queryable name. */
  def registerLakeTable(spark: SparkSession, name: String,
      lakePath: String): Unit =
    MiniLake(spark, lakePath).snapshot().createOrReplaceTempView(name)

  /** S13 — SQL entry over a registered name (Demo.ipynb cell 20). */
  def query(spark: SparkSession, sql: String): DataFrame = spark.sql(sql)
}
