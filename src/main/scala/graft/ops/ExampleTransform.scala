// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.Metrics

/** Port of the reference's `example_transform` pipeline: an in-memory
  * source, the groupBy-count transform, and a JDBC "Feature Store" sink
  * (example_transform/src/example_transform/{entrypoint.py:22-33,
  * transform.py:20-30, db.py:59-136}).
  *
  * The sink keeps the reference's writer shape — `df.write.format(
  * "jdbc").mode("append")` with url/dbtable/user/password options — and
  * is exercised for real against embedded Derby (the MS SQL target is
  * unreachable offline; only the connection string differs).
  */
object ExampleTransform {

  /** db.py:89-108 — connection settings read from spark conf secrets in
    * the reference; carried as a plain config here. Use
    * [[featureStoreConfig]] to resolve one from `spark.secret.*` keys.
    */
  final case class FeatureStoreConfig(url: String, table: String,
      user: String = "", password: String = "")

  /** db.py:59-86 — MS SQL connection-string builder, byte-for-byte the
    * reference's shape. With `useAadServicePrincipal`, `user` carries
    * the app id and `password` the app secret. Pure string work — the
    * target is unreachable offline, but the builder is the contract.
    */
  final case class SqlServerConfig(host: String, port: Int,
      database: String, user: String, password: String,
      useAadServicePrincipal: Boolean = false) {
    def connectionString: String = {
      val base = s"jdbc:sqlserver://$host:$port;" +
        s"database=$database;" +
        "encrypt=true;" +
        "trustServerCertificate=false;" +
        "loginTimeout=30;"
      if (useAadServicePrincipal)
        base + "Authentication=ActiveDirectoryServicePrincipal"
      else base
    }
  }

  /** db.py:89-108 — resolve the feature-store connection from the four
    * `spark.secret.feature-store-*` conf keys (AAD service-principal
    * auth, port 1433), failing with the reference's ValueError message
    * when any is absent.
    */
  def sqlServerConfigFromConf(spark: SparkSession): SqlServerConfig = {
    val read = (n: String) => graft.Secrets.secret(spark, n)
    (read("feature-store-fqdn"), read("feature-store-database"),
      read("feature-store-app-id"), read("feature-store-app-secret")) match {
      case (Some(host), Some(db), Some(user), Some(pw)) =>
        SqlServerConfig(host, 1433, db, user, pw,
          useAadServicePrincipal = true)
      case _ => throw new IllegalArgumentException(
        "Secrets for Feature store configuration must be set")
    }
  }

  /** Conf-resolved [[FeatureStoreConfig]] for [[saveFeatureStoreTable]]. */
  def featureStoreConfig(spark: SparkSession,
      table: String): FeatureStoreConfig = {
    val c = sqlServerConfigFromConf(spark)
    FeatureStoreConfig(c.connectionString, table, c.user, c.password)
  }

  /** ET/transform.py:20-30 — the entire "query". */
  def exampleTransform(df: DataFrame): DataFrame =
    df.groupBy("value").count()

  /** db.py:111-136 — count for the metric, then JDBC append. */
  def saveFeatureStoreTable(df: DataFrame, config: FeatureStoreConfig): Unit = {
    Metrics.rowsUpdated(df.count(), config.table, "insert", "example_transform")
    var writer = df.write.format("jdbc")
      .option("url", config.url)
      .option("dbtable", config.table)
      .mode(SaveMode.Append)
    if (config.user.nonEmpty) writer = writer.option("user", config.user)
    if (config.password.nonEmpty) writer = writer.option("password", config.password)
    writer.save()
  }

  /** ET/entrypoint.py:22-33 — end-to-end job. */
  def run(spark: SparkSession, config: FeatureStoreConfig): Unit = {
    import spark.implicits._
    val df = Seq(1L, 2L, 3L, 2L, 3L).toDF("value")
    saveFeatureStoreTable(exampleTransform(df), config)
  }
}
