// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Null-injection totality: every registered query must run against a
  * dataset where ~30% of every NON-KEY column is NULL (keys, join
  * columns, and timestamps stay populated — a null PK is a different
  * table's bug). This is the dirty-feed shape: missing payloads, null
  * embeddings, absent labels. The guards this pins were all real
  * failures: typed Datasets asserting non-null fields, driver-side
  * samples collecting null vectors, sketch witnesses comparing a null
  * group against an estimate that can't exist.
  */
class NullInputSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private val keyCols = Set("doc_id", "vec_id", "event_id", "l_orderkey",
    "l_partkey", "l_suppkey", "l_linenumber", "o_orderkey", "o_custkey",
    "c_custkey", "s_suppkey", "p_partkey", "n_nationkey", "r_regionkey",
    "user_id", "ts")

  private lazy val nullDir: String = {
    val dir = Files.createTempDirectory("graft_sfnull").toString
    val src = "/root/testdata/sf0.001"
    Files.list(java.nio.file.Paths.get(src)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet"))
      .foreach { f =>
        val name = java.nio.file.Paths.get(f).getFileName.toString
        val t = spark.read.parquet(f)
        // per-column seeds: identical seeds would null every column on
        // the SAME rows, never producing the partially-null rows
        // (null value + live type, null embedding + live label) that
        // are the actual dirty-feed shape
        val masked = t.columns.zipWithIndex.foldLeft(t) {
          case (d, (c, i)) =>
            if (keyCols(c)) d
            else d.withColumn(c,
              when(rand(42 + i) < 0.3, lit(null)).otherwise(col(c)))
        }
        masked.coalesce(1).write.parquet(s"$dir/tmp_$name")
        val part = Files.list(java.nio.file.Paths.get(s"$dir/tmp_$name"))
          .toArray.map(_.toString).filter(_.endsWith(".parquet")).head
        Files.move(java.nio.file.Paths.get(part),
          java.nio.file.Paths.get(s"$dir/$name"))
      }
    dir
  }

  test("every query is total on 30%-null non-key columns") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, nullDir).count(); None }
        catch {
          case e: Throwable =>
            Some(s"$name: ${e.getClass.getSimpleName}: " +
              Option(e.getMessage).getOrElse("")
                .linesIterator.take(1).mkString.take(140))
        }
    }
    assert(failures.isEmpty,
      failures.mkString(s"${failures.size} queries died on null input:\n  ",
        "\n  ", ""))
  }
}
