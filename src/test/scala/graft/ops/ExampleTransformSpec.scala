// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.ops

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.ops.ExampleTransform._

/** Port of the example_transform contracts (example_transform/tests/
  * test_transform.py:21-29) plus a real JDBC round-trip against
  * embedded Derby standing in for the MS SQL feature store.
  */
class ExampleTransformSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("golden: [1,2,3,2,3] groupBy count") {
    val out = exampleTransform(Seq(1L, 2L, 3L, 2L, 3L).toDF("value"))
      .as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 1L), (2L, 2L), (3L, 2L)))
  }

  test("feature-store config resolves from spark.secret.* conf (S14)") {
    val keys = Seq("feature-store-fqdn", "feature-store-database",
      "feature-store-app-id", "feature-store-app-secret")
    // absent secrets fail fast with the reference's ValueError message
    keys.foreach(k => spark.conf.unset(s"spark.secret.$k"))
    val missing = intercept[IllegalArgumentException] {
      sqlServerConfigFromConf(spark)
    }
    assert(missing.getMessage.contains("Feature store"))
    try {
      spark.conf.set("spark.secret.feature-store-fqdn", "fs.example.net")
      spark.conf.set("spark.secret.feature-store-database", "features")
      spark.conf.set("spark.secret.feature-store-app-id", "app-id-1")
      spark.conf.set("spark.secret.feature-store-app-secret", "s3cret")
      val cfg = featureStoreConfig(spark, "counts")
      // db.py:74-86 — exact connection-string shape incl. AAD suffix
      assert(cfg.url ===
        "jdbc:sqlserver://fs.example.net:1433;database=features;" +
          "encrypt=true;trustServerCertificate=false;loginTimeout=30;" +
          "Authentication=ActiveDirectoryServicePrincipal")
      assert(cfg.user === "app-id-1")
      assert(cfg.password === "s3cret")
      assert(cfg.table === "counts")
    } finally keys.foreach(k => spark.conf.unset(s"spark.secret.$k"))
  }

  test("cognitive keys and catalog names resolve from conf, fail-fast when absent") {
    val all = Seq("cognitive-services-keys", "unity-catalog-catalog-name",
      "unity-catalog-schema-name")
    all.foreach(k => spark.conf.unset(s"spark.secret.$k"))
    assert(intercept[IllegalArgumentException] {
      graft.Secrets.cognitiveKeys(spark)
    }.getMessage.contains("cognitive-services-keys"))
    assert(intercept[IllegalArgumentException] {
      graft.Secrets.catalogNames(spark)
    }.getMessage.contains("unity-catalog"))
    try {
      // feature_extraction.py:50 — semicolon-split into the key list
      spark.conf.set("spark.secret.cognitive-services-keys", "k1;k2;k3")
      spark.conf.set("spark.secret.unity-catalog-catalog-name", "main")
      spark.conf.set("spark.secret.unity-catalog-schema-name", "gold")
      assert(graft.Secrets.cognitiveKeys(spark) === Seq("k1", "k2", "k3"))
      assert(graft.Secrets.catalogNames(spark) === ("main", "gold"))
    } finally all.foreach(k => spark.conf.unset(s"spark.secret.$k"))
  }

  test("feature-store JDBC sink appends and reads back") {
    val dbDir = Files.createTempDirectory("graft_derby").toString
    val url = s"jdbc:derby:$dbDir/fs;create=true"
    val cfg = FeatureStoreConfig(url, "counts")
    ExampleTransform.run(spark, cfg)
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "counts").load()
      .as[(Long, Long)].collect().toSet
    assert(back === Set((1L, 1L), (2L, 2L), (3L, 2L)))

    // append mode: a second run doubles the rows (the reference writer
    // is mode("append"), db.py:126-134)
    ExampleTransform.run(spark, cfg)
    assert(spark.read.format("jdbc").option("url", url)
      .option("dbtable", "counts").load().count() === 6L)
  }
}
