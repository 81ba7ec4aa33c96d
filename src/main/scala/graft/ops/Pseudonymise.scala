// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pseudonymisation stage: per-column-type privacy transforms, faithful
  * to the reference (patient_notes/src/patient_notes/stages/
  * pseudonymisation/transform.py:23-195):
  *
  *  - FREE_TEXT      → NER redaction UDF applied in place;
  *  - OTHER_IDENTIFIABLE → column dropped (STRICTLY — missing column is
  *    an error; Spark's `drop` is lenient so we pre-validate);
  *  - DATE_TIME      → `date_trunc("hour")`;
  *  - DATE           → `date_trunc("month")`;
  *  - HASHABLE_ID    → salted SHA-256: `sha2(concat(col, SALT) :: binary,
  *    256)` into `<name>_hashed`, original dropped (transform.py:139-147,
  *    bit-identical to the reference's golden test).
  *
  * All transforms are built-in Catalyst expressions except the NER UDF,
  * so they stay inside whole-stage codegen; the UDF is the only
  * black-box stage and is injected (mirrors the reference's
  * anonymise_udf parameter) so tests and alternative engines can swap
  * it.
  */
object Pseudonymise {

  /** common_types.py:20-28 */
  sealed trait ColumnType
  case object FreeText extends ColumnType
  case object OtherIdentifiable extends ColumnType
  case object DateTime extends ColumnType
  case object DateCol extends ColumnType
  case object HashableId extends ColumnType

  /** common_types.py:51-56 — ordered list keeps the reference's
    * insertion-ordered dict iteration semantics.
    */
  final case class TableConfig(
      columnTypes: Seq[(ColumnType, Seq[String])],
      analysedColumns: Seq[String] = Seq.empty,
      primaryKeys: Seq[String] = Seq.empty)

  /** config.py:24 — salt for ID hashing (public sample constant). */
  val HashSalt = "$2b$12$Lrw9ZQwsFNSu/6KGCCTWCu"
  /** config.py:22 */
  val HashSuffix = "_hashed"

  private def requireColumn(df: DataFrame, column: String, what: String,
      tableName: String): Unit =
    if (!df.columns.contains(column)) {
      throw new NoSuchElementException(
        s"Unable to $what column '$column' as it does not exist in the " +
          s"source DataFrame ($tableName).")
    }

  /** transform.py:23-54 */
  def processFreeTextColumns(df: DataFrame, columns: Seq[String],
      anonymise: Column => Column, tableName: String): DataFrame =
    columns.foldLeft(df) { (d, c) =>
      requireColumn(d, c, "pseudonymise", tableName)
      d.withColumn(c, anonymise(col(c)))
    }

  /** transform.py:57-80 — strict drop. */
  def removeColumns(df: DataFrame, columns: Seq[String],
      tableName: String): DataFrame =
    columns.foldLeft(df) { (d, c) =>
      requireColumn(d, c, "drop", tableName)
      d.drop(c)
    }

  /** transform.py:83-114 — `unit` is "hour" or "month"; invalid string
    * input yields NULL (cast semantics shared with the reference).
    */
  def roundDatetimeColumns(df: DataFrame, columns: Seq[String],
      unit: String, tableName: String): DataFrame =
    columns.foldLeft(df) { (d, c) =>
      requireColumn(d, c, "round datetime in", tableName)
      // The reference ran pre-ANSI Spark where a malformed string
      // silently cast to NULL (tested at test_pseudonymisation.py:
      // 191-204); Spark 4's ANSI mode would throw, so string inputs go
      // through try_to_timestamp to keep the null-on-invalid contract.
      val input = d.schema(c).dataType match {
        case org.apache.spark.sql.types.StringType => try_to_timestamp(col(c))
        case _ => col(c)
      }
      d.withColumn(c, date_trunc(unit, input))
    }

  /** transform.py:117-155 — salt, SHA-256, rename, drop original. */
  def hashHashableId(df: DataFrame, columns: Seq[String],
      tableName: String): DataFrame =
    columns.foldLeft(df) { (d, c) =>
      requireColumn(d, c, "hash", tableName)
      d.withColumn(c, concat(col(c), lit(HashSalt)))
        .withColumn(c + HashSuffix, sha2(col(c).cast("binary"), 256))
        .drop(c)
    }

  /** transform.py:158-195 — the per-table dispatcher. */
  def pseudoTransform(df: DataFrame, tableName: String, config: TableConfig,
      anonymise: Column => Column): DataFrame =
    config.columnTypes.foldLeft(df) { case (d, (ct, cols)) =>
      ct match {
        case FreeText => processFreeTextColumns(d, cols, anonymise, tableName)
        case OtherIdentifiable => removeColumns(d, cols, tableName)
        case DateTime => roundDatetimeColumns(d, cols, "hour", tableName)
        case DateCol => roundDatetimeColumns(d, cols, "month", tableName)
        case HashableId => hashHashableId(d, cols, tableName)
      }
    }
}
