// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Empty-input totality: every registered query must run (not
  * necessarily return rows) against a dataset where every table has
  * ZERO rows. This is the new-deployment / fully-filtered-partition
  * shape a production pipeline hits constantly, and the failure modes
  * are all driver-side: scalar fetches reading NULL aggregate rows,
  * sample-fit quantizers with nothing to fit, streams whose sink table
  * never materialized, schema inference over zero part files. Each of
  * those classes had a real instance before this spec existed.
  */
class EmptyInputSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private lazy val emptyDir: String = {
    val dir = Files.createTempDirectory("graft_sf0").toString
    val src = "/root/testdata/sf0.001"
    Files.list(java.nio.file.Paths.get(src)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet"))
      .foreach { f =>
        val name = java.nio.file.Paths.get(f).getFileName.toString
        // limit(0) keeps the exact on-disk schema (incl. ns timestamps)
        spark.read.parquet(f).limit(0)
          .coalesce(1).write.parquet(s"$dir/tmp_$name")
        val part = Files.list(java.nio.file.Paths.get(s"$dir/tmp_$name"))
          .toArray.map(_.toString).filter(_.endsWith(".parquet")).head
        Files.move(java.nio.file.Paths.get(part),
          java.nio.file.Paths.get(s"$dir/$name"))
      }
    dir
  }

  test("every query is total on zero-row tables") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, emptyDir).count(); None }
        catch {
          case e: Throwable =>
            Some(s"$name: ${e.getClass.getSimpleName}: " +
              Option(e.getMessage).getOrElse("")
                .linesIterator.take(1).mkString.take(140))
        }
    }
    assert(failures.isEmpty,
      failures.mkString(s"${failures.size} queries died on empty input:\n  ",
        "\n  ", ""))
  }
}
