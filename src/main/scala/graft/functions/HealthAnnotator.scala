// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.udf

/** Local clinical-entity annotator: the engine-native stand-in for the
  * reference's external `AnalyzeHealthText` transformer (SynapseML,
  * patient_notes/src/patient_notes/stages/feature_extraction.py:30-51).
  * The external HTTP service cannot exist in this engine, so the
  * annotator is a deterministic dictionary tagger producing the same
  * nested output shape the reference's tests project
  * (tests/stages/test_feature_extraction.py:181-228):
  *
  * {{{
  * <col>_extracted: struct<document: struct<
  *   entities:  array<struct<text, category, offset, length, confidenceScore>>,
  *   relations: array<struct<relationType,
  *                           entities: array<struct<text, category>>>>>>
  * }}}
  *
  * Like the reference's mockable `analyse` seam (test_feature_extraction
  * .py:48-56), callers inject an annotator function — this object is
  * just the default implementation.
  */
object HealthAnnotator extends Serializable {

  final case class RelationEntity(text: String, category: String)
  final case class Relation(relationType: String, entities: Seq[RelationEntity])
  final case class Entity(text: String, category: String, offset: Int,
      length: Int, confidenceScore: Double)
  final case class Document(entities: Seq[Entity], relations: Seq[Relation])
  final case class Extraction(document: Document)

  /** Public clinical vocabulary → TA4H category (category names follow
    * the Text Analytics for Health public taxonomy).
    */
  private val vocabulary: Seq[(String, String)] = Seq(
    // SymptomOrSign
    "delusional beliefs" -> "SymptomOrSign",
    "fluid intake" -> "SymptomOrSign",
    "distracted" -> "SymptomOrSign",
    "brittle" -> "SymptomOrSign",
    "headache" -> "SymptomOrSign",
    "nausea" -> "SymptomOrSign",
    "fatigue" -> "SymptomOrSign",
    "dizziness" -> "SymptomOrSign",
    "fever" -> "SymptomOrSign",
    "cough" -> "SymptomOrSign",
    "pain" -> "SymptomOrSign",
    "anxiety" -> "SymptomOrSign",
    "insomnia" -> "SymptomOrSign",
    "tremor" -> "SymptomOrSign",
    // MedicationName
    "paracetamol" -> "MedicationName",
    "ibuprofen" -> "MedicationName",
    "aspirin" -> "MedicationName",
    "metformin" -> "MedicationName",
    "sertraline" -> "MedicationName",
    "diazepam" -> "MedicationName",
    "insulin" -> "MedicationName",
    // Time
    "this afternoon" -> "Time",
    "this morning" -> "Time",
    "this evening" -> "Time",
    "last night" -> "Time",
    "yesterday" -> "Time",
    "today" -> "Time",
    // ConditionQualifier
    "slightly" -> "ConditionQualifier",
    "severe" -> "ConditionQualifier",
    "mild" -> "ConditionQualifier",
    "moderate" -> "ConditionQualifier",
    "chronic" -> "ConditionQualifier",
    "acute" -> "ConditionQualifier",
    // Diagnosis
    "diabetes" -> "Diagnosis",
    "hypertension" -> "Diagnosis",
    "asthma" -> "Diagnosis",
    "depression" -> "Diagnosis",
    "migraine" -> "Diagnosis")

  def annotate(text: String): Extraction = {
    if (text == null) return Extraction(Document(Seq.empty, Seq.empty))
    val lower = text.toLowerCase
    val entities = vocabulary.flatMap { case (term, category) =>
      var found = Seq.empty[Entity]
      var idx = lower.indexOf(term)
      while (idx >= 0) {
        found :+= Entity(text.substring(idx, idx + term.length), category,
          idx, term.length, 0.9)
        idx = lower.indexOf(term, idx + 1)
      }
      found
    }.sortBy(_.offset)

    // TA4H-style relations: qualifiers and times attach to the nearest
    // following symptom/diagnosis.
    val conditions = entities.filter(e =>
      e.category == "SymptomOrSign" || e.category == "Diagnosis")
    def relate(cat: String, relType: String): Seq[Relation] =
      entities.filter(_.category == cat).flatMap { q =>
        conditions.sortBy(c => math.abs(c.offset - q.offset)).headOption
          .map(c => Relation(relType, Seq(
            RelationEntity(q.text, q.category),
            RelationEntity(c.text, c.category))))
      }
    val relations =
      relate("ConditionQualifier", "QualifierOfCondition") ++
        relate("Time", "TimeOfCondition")
    Extraction(Document(entities, relations))
  }

  /** Default annotator as a Column transform. */
  val annotateUdf: Column => Column = {
    val u = udf((text: String) => annotate(text))
    (c: Column) => u(c)
  }
}
