package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver testdata (TESTDATA.md / FIXTURES.md §B).
  *
  * One parquet file per table under `<sfDir>/<name>.parquet`. Reading via
  * `spark.read.parquet` keeps the scan declarative so Catalyst pushes
  * filters/projections into the parquet reader (verified via
  * `.explain("formatted")` — see `PlanSpec`).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** `events.ts` is parquet INT64 TIMESTAMP(NANOS), which Spark 4 has no
    * native type for (PARQUET_TYPE_ILLEGAL by default). Read it as a
    * nanos long via the legacy conf, then floor-truncate to a
    * microsecond TimestampType — the same ns→µs truncation DuckDB
    * applies when casting TIMESTAMP_NS to TIMESTAMP, so oracle
    * comparisons stay exact.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // cast to NTZ (session tz is UTC, so wall-clock identical) to match
    // how Spark infers the other tables' parquet timestamps
    // (inferTimestampNTZ) — keeps result-parquet logical types uniform.
    table(s, d, "events").withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000L"))
        .cast("timestamp_ntz"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
