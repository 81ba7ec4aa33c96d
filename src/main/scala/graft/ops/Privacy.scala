// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.Ner
import graft.ops.Pseudonymise._

/** Driver-gate queries for the pseudonymisation / feature-extraction
  * surface (SURVEY.md §2.6–2.7). Where the transform is deterministic
  * and expressible in ANSI SQL (salted hashing, date rounding) the
  * oracle recomputes it; for the NER/annotator UDFs the queries build
  * deterministic input from testdata columns so the redacted/extracted
  * output is a closed-form constant the oracle can state directly —
  * a driver-visible golden test of the UDF path.
  */
object Privacy {

  /** Salted SHA-256 ID hashing through the real pseudonymisation op
    * (bit-compatible with the reference's golden,
    * tests/stages/test_pseudonymisation.py:208-224).
    */
  def q20HashIds(s: SparkSession, dir: String): DataFrame =
    hashHashableId(documents(s, dir).select("doc_id", "lang"),
      Seq("doc_id"), "documents")
      .select(col("doc_id_hashed"), col("lang"))
      .orderBy("doc_id_hashed")

  val q20Oracle: String =
    s"""SELECT sha256(concat(CAST(doc_id AS VARCHAR), '$HashSalt'))
      |   AS doc_id_hashed, lang
      |FROM documents
      |ORDER BY doc_id_hashed""".stripMargin

  /** DATE_TIME columns truncate to the hour (transform.py:83-114). */
  def q21RoundHour(s: SparkSession, dir: String): DataFrame =
    roundDatetimeColumns(events(s, dir).select("event_id", "ts"),
      Seq("ts"), "hour", "events")
      .select(col("event_id"), col("ts").cast("timestamp_ntz").as("ts_hour"))
      .orderBy("event_id")

  val q21Oracle: String =
    """SELECT event_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ts_hour
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** DATE columns truncate to the month. */
  def q22RoundMonth(s: SparkSession, dir: String): DataFrame =
    roundDatetimeColumns(orders(s, dir).select("o_orderkey", "o_orderdate"),
      Seq("o_orderdate"), "month", "orders")
      .select(col("o_orderkey"),
        col("o_orderdate").cast("timestamp_ntz").as("order_month"))
      .orderBy("o_orderkey")

  val q22Oracle: String =
    """SELECT o_orderkey,
      | CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** NER redaction golden through the driver gate: deterministic PII
    * text is constructed per row, so the redaction result is exactly
    * known to the oracle. Exercises PERSON/LOCATION/DATE_TIME/
    * EMAIL_ADDRESS recognizers and the in-place FREE_TEXT rewrite.
    */
  def q23RedactText(s: SparkSession, dir: String): DataFrame = {
    val withPii = documents(s, dir)
      .select(col("doc_id"),
        concat(lit("John Smith is in London on 2024-01-15, mail: user"),
          col("doc_id"), lit("@example.com")).as("note"))
    processFreeTextColumns(withPii, Seq("note"), Ner.anonymiseUdf, "documents")
      .orderBy("doc_id")
  }

  val q23Oracle: String =
    """SELECT doc_id,
      | '<PERSON> is in <LOCATION> on <DATE_TIME>, mail: <EMAIL_ADDRESS>'
      |   AS note
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Feature extraction through the full orchestration (repartition →
    * seeded randomSplit over 3 keys → annotate → PK join-back → union,
    * feature_extraction.py:54-120) with nested-struct projection of the
    * result — deterministic input makes the flattened output a
    * closed-form constant.
    */
  def q24ExtractEntities(s: SparkSession, dir: String): DataFrame = {
    val clinical = documents(s, dir)
      .select(col("doc_id"),
        lit("severe headache since today, taking ibuprofen").as("note"))
    val config = TableConfig(
      columnTypes = Seq(FreeText -> Seq("note")),
      primaryKeys = Seq("doc_id"))
    Extract.extractFeatures(clinical, "documents", config, numKeys = 3)
      .select(col("doc_id"),
        concat_ws(",", col("note_extracted.document.entities.category"))
          .as("categories"),
        size(col("note_extracted.document.relations")).cast("long")
          .as("n_relations"))
      .orderBy("doc_id")
  }

  val q24Oracle: String =
    """SELECT doc_id,
      | 'ConditionQualifier,SymptomOrSign,Time,MedicationName' AS categories,
      | CAST(2 AS BIGINT) AS n_relations
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_hash_ids" -> (q20HashIds _),
    "q21_round_hour" -> (q21RoundHour _),
    "q22_round_month" -> (q22RoundMonth _),
    "q23_redact_text" -> (q23RedactText _),
    "q24_extract_entities" -> (q24ExtractEntities _)
  )

  def oracles: Map[String, String] = Map(
    "q20_hash_ids" -> q20Oracle,
    "q21_round_hour" -> q21Oracle,
    "q22_round_month" -> q22Oracle,
    "q23_redact_text" -> q23Oracle,
    "q24_extract_entities" -> q24Oracle
  )
}
