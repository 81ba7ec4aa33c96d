// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.lake

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Low-watermark bookkeeping for incremental CDC processing — one row
  * per (activity, table_name) holding the next unprocessed source
  * version. Faithful to the reference's algorithm
  * (patient_notes/src/patient_notes/watermark.py:21-130): default 0,
  * auto-create table and row, bump to high+1 only after a successful
  * downstream write.
  *
  * The table is metadata-sized (a handful of rows), so driver-side
  * `collect` here is deliberate and scale-safe — the reference makes the
  * same call (watermark.py:79-84).
  */
final class Watermark(spark: SparkSession, path: String) {
  import Watermark._

  private def lake = MiniLake.compact(spark, path)

  // Values this instance has read or written, stamped with the lake
  // version they were observed at. Validating against `latestVersion`
  // is a filesystem-only check, so a pass that reads, writes, and
  // re-reads its own watermark (the hot CDC loop) costs no Spark job
  // after the first read — while a bump from another instance advances
  // the version and forces a re-read, keeping multi-instance use
  // correct.
  private val known =
    scala.collection.mutable.Map.empty[(String, String), (Long, Long)]

  private def cached(activity: String, tableName: String): Option[Long] =
    known.get((activity, tableName)).collect {
      case (value, seenAt) if seenAt == lake.latestVersion => value
    }

  private def ensureTable(): Unit =
    if (!lake.exists) lake.create(MiniLake.emptyDf(spark, Schema))

  /** Current low watermark for (activity, table); creates the table and
    * a default-0 row on first sight (watermark.py:48-77).
    */
  def lowWatermark(activity: String, tableName: String): Long =
    cached(activity, tableName).getOrElse {
      ensureTable()
      val existing = lake.snapshot()
        .filter(col("activity") === activity && col("table_name") === tableName)
        .select("low_watermark")
        .collect()
      val value = existing.headOption match {
        case Some(r) => r.getLong(0)
        case None =>
          // the row is known absent (we just looked) — a plain append
          // commits it without merge's join machinery
          lake.append(spark.createDataFrame(
            java.util.List.of(Row(0L, activity, tableName)), Schema))
          0L
      }
      known((activity, tableName)) = (value, lake.latestVersion)
      value
    }

  /** High watermark = latest committed version of the source table
    * (watermark.py:87-103).
    */
  def highWatermark(sourcePath: String): Long =
    MiniLake(spark, sourcePath).latestVersion

  /** Advance to `high + 1` after a successful write (watermark.py:
    * 106-130). An in-place update recorded through the lake so the
    * bookkeeping itself is versioned. A bump for a row nobody has read
    * yet inserts the bumped row directly — one commit, not a default-0
    * insert followed by an update.
    */
  def bump(activity: String, tableName: String, high: Long): Unit = {
    val rowExists = cached(activity, tableName).isDefined || {
      ensureTable()
      lake.snapshot()
        .filter(col("activity") === activity && col("table_name") === tableName)
        .limit(1).collect().nonEmpty
    }
    if (rowExists) {
      // trackChanges=false: nothing consumes the watermark table's CDF,
      // so the bump writes one data file, not data+changes
      lake.update(
        col("activity") === activity && col("table_name") === tableName,
        Map("low_watermark" -> lit(high + 1)), trackChanges = false)
    } else {
      // row known absent — append the bumped row directly
      lake.append(spark.createDataFrame(
        java.util.List.of(Row(high + 1, activity, tableName)), Schema))
    }
    known((activity, tableName)) = (high + 1, lake.latestVersion)
  }
}

object Watermark {
  /** common_types.py:59-62 */
  val Schema: StructType = StructType(Seq(
    StructField("low_watermark", LongType, nullable = false),
    StructField("activity", StringType, nullable = false),
    StructField("table_name", StringType, nullable = false)))

  def apply(spark: SparkSession, path: String): Watermark =
    new Watermark(spark, path)
}
