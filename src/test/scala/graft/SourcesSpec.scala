// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format coverage beyond parquet (S10/S11 families): CSV
  * and JSON round-trips preserve the relational surface, so any of the
  * engine's operators run unchanged over them.
  */
class SourcesSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  test("csv and json round-trip the events subset losslessly") {
    val dir = Files.createTempDirectory("graft_sources").toString
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))
      .orderBy("event_id")
      .limit(100)

    events.write.option("header", "true").csv(s"$dir/csv")
    events.write.json(s"$dir/json")

    val fromCsv = spark.read.option("header", "true")
      .schema(events.schema).csv(s"$dir/csv")
    val fromJson = spark.read.schema(events.schema).json(s"$dir/json")

    val expected = events.collect().map(_.toSeq).toSet
    assert(fromCsv.collect().map(_.toSeq).toSet === expected)
    assert(fromJson.collect().map(_.toSeq).toSet === expected)

    // the engine's operators run unchanged over the non-parquet source
    val agg = fromJson.groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = events.groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg === direct)
    graft.lake.MiniLake.deleteRecursively(dir)
  }

  test("orc round-trips with predicate pushdown intact") {
    val dir = Files.createTempDirectory("graft_orc").toString
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    events.write.orc(s"$dir/orc")
    val back = spark.read.orc(s"$dir/orc")
    assert(back.count() === events.count())
    assert(back.schema === events.schema)
    // filters reach the ORC scan like they do the parquet one
    val plan = back.filter(col("event_type") === "click")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)"), plan)
    assert(back.filter(col("event_type") === "click").count() ===
      events.filter(col("event_type") === "click").count())
    graft.lake.MiniLake.deleteRecursively(dir)
  }
}
