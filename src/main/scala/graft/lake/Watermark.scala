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

  private def ensureTable(): Unit =
    if (!lake.exists) lake.create(MiniLake.emptyDf(spark, Schema))

  /** Current low watermark for (activity, table); creates the table and
    * a default-0 row on first sight (watermark.py:48-77).
    */
  def lowWatermark(activity: String, tableName: String): Long = {
    ensureTable()
    val existing = lake.snapshot()
      .filter(col("activity") === activity && col("table_name") === tableName)
      .select("low_watermark")
      .collect()
    existing.headOption match {
      case Some(r) => r.getLong(0)
      case None =>
        val row = spark.createDataFrame(
          java.util.List.of(Row(0L, activity, tableName)), Schema)
        lake.merge(row, MiniLake.emptyDf(spark, Schema),
          Seq("activity", "table_name"))
        0L
    }
  }

  /** High watermark = latest committed version of the source table
    * (watermark.py:87-103).
    */
  def highWatermark(sourcePath: String): Long =
    MiniLake(spark, sourcePath).latestVersion

  /** Advance to `high + 1` after a successful write (watermark.py:
    * 106-130). An in-place update recorded through the lake so the
    * bookkeeping itself is versioned.
    */
  def bump(activity: String, tableName: String, high: Long): Unit = {
    lowWatermark(activity, tableName) // ensure row exists
    lake.update(
      col("activity") === activity && col("table_name") === tableName,
      Map("low_watermark" -> lit(high + 1)))
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
