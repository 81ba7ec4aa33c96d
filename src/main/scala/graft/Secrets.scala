// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft

import org.apache.spark.sql.SparkSession

/** The reference's configuration contract: secrets and deployment names
  * arrive through Spark conf under `spark.secret.*` (injected by the
  * platform's secret scope), and entrypoints fail fast with a clear
  * message when one is missing (patient_notes/src/patient_notes/
  * entrypoints/feature_extraction.py:36-50, example_transform/src/
  * example_transform/db.py:89-108).
  *
  * Kept driver-side and lazy: a secret is read at job-build time, never
  * shipped in a plan literal unless the caller puts it in one.
  */
object Secrets {

  /** Non-empty value of `spark.secret.<name>`, if set. */
  def secret(spark: SparkSession, name: String): Option[String] =
    spark.conf.getOption(s"spark.secret.$name").filter(_.nonEmpty)

  /** ValueError parity: missing/empty secrets abort the entrypoint. */
  def requiredSecret(spark: SparkSession, name: String): String =
    secret(spark, name).getOrElse(throw new IllegalArgumentException(
      s"Missing $name in Spark config"))

  /** feature_extraction.py:36-41,50 — semicolon-separated API keys; the
    * shard count of the extraction's randomSplit fan-out.
    */
  def cognitiveKeys(spark: SparkSession): Seq[String] =
    requiredSecret(spark, "cognitive-services-keys").split(";").toSeq

  /** feature_extraction.py:42-47 — (catalog, schema) the gold tables
    * register under.
    */
  def catalogNames(spark: SparkSession): (String, String) = {
    val cat = secret(spark, "unity-catalog-catalog-name")
    val sch = secret(spark, "unity-catalog-schema-name")
    if (cat.isEmpty || sch.isEmpty) throw new IllegalArgumentException(
      "Missing unity-catalog-catalog-name or unity-catalog-schema-name " +
        "in Spark config")
    (cat.get, sch.get)
  }
}
