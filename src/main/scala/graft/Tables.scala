// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

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
  /** Memoized per (session, path): `spark.read.parquet` builds a fresh
    * file index (a driver-side directory listing) and re-reads the
    * footer schema on every call, a fixed ~10-50 ms tax per table
    * reference that the 100+-query gate pays hundreds of times.
    * The testdata directories are immutable by contract (TESTDATA.md),
    * so the first resolved relation per session is reusable — exactly
    * what a long-lived cluster gets from a catalog's relation cache.
    * DataFrames are immutable plan handles, so sharing one across
    * queries is safe; keying on the session keeps stopped sessions'
    * plans from leaking into their successors.
    */
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    memo.computeIfAbsent((spark, s"$sfDir/$name.parquet"),
      k => spark.read.parquet(k._2))

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** `events.ts` as physically stored varies by testdata vintage:
    * older drops wrote INT64 TIMESTAMP(NANOS) — a type Spark 4 can only
    * read as a nanos long via the legacy conf — while newer drops write
    * plain TIMESTAMP_MICROS. Read whatever is on disk; callers
    * normalize with [[normalizeEventTs]].
    */
  def eventsRaw(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
  }

  /** The as-stored events schema — file streams need it explicitly
    * (`readStream.schema(...)`), and declaring a schema that disagrees
    * with the footer makes the vectorized reader return raw physical
    * values (micros read as "long" → silently wrong timestamps).
    */
  def eventsRawSchema(s: SparkSession, d: String): org.apache.spark.sql.types.StructType =
    eventsRaw(s, d).schema

  /** Normalize `ts` to timestamp_ntz whichever way it was stored:
    * a nanos long is floor-truncated to µs (the same ns→µs truncation
    * DuckDB applies casting TIMESTAMP_NS to TIMESTAMP, so oracle
    * comparisons stay exact); a native timestamp is cast directly
    * (session tz is UTC, so LTZ→NTZ is wall-clock identical). NTZ to
    * match how Spark infers the other tables' parquet timestamps
    * (inferTimestampNTZ) — keeps result-parquet logical types uniform.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = normalizeTo(df, "timestamp_ntz")

  /** LTZ variant for streaming: `withWatermark` rejects TIMESTAMP_NTZ
    * event-time columns. Session tz is UTC, so the wall-clock values
    * are identical to the NTZ batch reads.
    */
  def normalizeEventTsLtz(df: DataFrame): DataFrame = normalizeTo(df, "timestamp")

  private def normalizeTo(df: DataFrame, target: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          timestamp_micros(expr("ts div 1000L")).cast(target))
      case _ =>
        df.withColumn("ts", col("ts").cast(target))
    }
  }

  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(eventsRaw(s, d))
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
