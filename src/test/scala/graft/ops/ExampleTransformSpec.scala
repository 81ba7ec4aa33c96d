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
