// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.ops

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.Ner
import graft.ops.Pseudonymise._

/** Port of the reference's pseudonymisation contracts
  * (patient_notes/tests/stages/test_pseudonymisation.py).
  */
class PseudonymiseSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("hash golden: salted sha256 of '1' matches the reference bit-exactly") {
    // test_pseudonymisation.py:208-224
    val df = Seq((1L, "t")).toDF("ID", "Text")
    val out = hashHashableId(df, Seq("ID"), "t1")
    assert(out.columns.toSeq === Seq("Text", "ID_hashed"))
    assert(out.select("ID_hashed").as[String].head() ===
      "e59cb3f3ffba6255f0f32b278a76f8a44780fde36bb7a1b3428a394ff4c39596")
  }

  test("NER golden: person and location are replaced with labels") {
    // test_pseudonymisation.py:73-98
    assert(Ner.anonymise("John Smith is in London") ===
      "<PERSON> is in <LOCATION>")
  }

  test("NER handles emails, urls, phones, dates; null/empty → null") {
    assert(Ner.anonymise("write to jane.doe@nhs.uk today") ===
      "write to <EMAIL_ADDRESS> <DATE_TIME>")
    assert(Ner.anonymise("see https://example.org/x for info")
      === "see <URL> for info")
    assert(Ner.anonymise("call 020 7946 0958 now") === "call <PHONE_NUMBER> now")
    assert(Ner.anonymise("admitted on 2023-08-16 10:30") ===
      "admitted on <DATE_TIME>")
    assert(Ner.anonymise(null) === null)
    assert(Ner.anonymise("") === null)
  }

  test("date rounding goldens: hour, month, invalid string → null") {
    // test_pseudonymisation.py:139-204
    val df = Seq(Tuple1(Timestamp.valueOf("2023-08-16 03:04:05")))
      .toDF("AppointmentDate")
    val hour = roundDatetimeColumns(df, Seq("AppointmentDate"), "hour", "t")
      .as[Timestamp].head()
    assert(hour === Timestamp.valueOf("2023-08-16 03:00:00"))
    val month = roundDatetimeColumns(df, Seq("AppointmentDate"), "month", "t")
      .as[Timestamp].head()
    assert(month === Timestamp.valueOf("2023-08-01 00:00:00"))

    val bad = Seq(Tuple1("not-a-date")).toDF("AppointmentDate")
    val rounded = roundDatetimeColumns(bad, Seq("AppointmentDate"), "hour", "t")
    assert(rounded.filter("AppointmentDate IS NULL").count() === 1L)
  }

  test("strict column contracts: missing column raises (KeyError parity)") {
    // test_pseudonymisation.py:27-48 — Spark drop is lenient, ours must not be
    val df = Seq((1L, "x")).toDF("ID", "Text")
    intercept[NoSuchElementException] { removeColumns(df, Seq("Nope"), "t") }
    intercept[NoSuchElementException] {
      roundDatetimeColumns(df, Seq("Nope"), "hour", "t")
    }
    intercept[NoSuchElementException] { hashHashableId(df, Seq("Nope"), "t") }
    intercept[NoSuchElementException] {
      processFreeTextColumns(df, Seq("Nope"), Ner.anonymiseUdf, "t")
    }
  }

  test("pseudo_transform applies the full Notes config") {
    // mirrors TABLE_CONFIG (config.py:44-56) on the A1 Notes shape
    val df = Seq(
      (1L, "John Smith is in London", 10L,
        Timestamp.valueOf("2023-08-16 03:04:05")))
      .toDF("NoteID", "NoteText", "UserID", "AppointmentDate")
    val cfg = TableConfig(
      columnTypes = Seq(
        FreeText -> Seq("NoteText"),
        OtherIdentifiable -> Seq("UserID"),
        DateTime -> Seq("AppointmentDate")),
      analysedColumns = Seq("NoteID"),
      primaryKeys = Seq("NoteID"))
    val out = pseudoTransform(df, "Notes", cfg, Ner.anonymiseUdf)
    assert(out.columns.toSeq === Seq("NoteID", "NoteText", "AppointmentDate"))
    val row = out.head()
    assert(row.getAs[String]("NoteText") === "<PERSON> is in <LOCATION>")
    assert(row.getAs[Timestamp]("AppointmentDate") ===
      Timestamp.valueOf("2023-08-16 03:00:00"))
  }
}
