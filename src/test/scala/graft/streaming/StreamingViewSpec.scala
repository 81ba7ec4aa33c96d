// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.lake.MiniLake

/** q116's load-bearing property: the view fold is append-only with
  * (appId, batchId) txn markers, so a REPLAYED micro-batch folds zero
  * times — exactly-once without read-modify-write.
  */
class StreamingViewSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("replayed batch is skipped; distinct batches accumulate") {
    val dir = Files.createTempDirectory("sivm").toString + "/gold"
    val t = MiniLake.compact(spark, dir)
    def fold(rows: Seq[(String, Long, Long)], batchId: Long): Unit = {
      t.appendIfAbsent(rows.toDF("event_type", "d_n", "d_cents"),
        "spec_view", batchId)
      ()
    }
    def view: Map[String, (Long, Long)] =
      t.snapshot().groupBy("event_type")
        .agg(sum("d_n").as("n"), sum("d_cents").as("c"))
        .as[(String, Long, Long)].collect()
        .map { case (k, n, c) => k -> (n, c) }.toMap

    fold(Seq(("click", 10L, 100L)), batchId = 0L)
    assert(view === Map("click" -> (10L, 100L)))
    // crash-replay of batch 0: same batchId → must fold ZERO times
    fold(Seq(("click", 10L, 100L)), batchId = 0L)
    assert(view === Map("click" -> (10L, 100L)), "replay double-folded")
    // a genuinely new batch accumulates
    fold(Seq(("click", 5L, 50L), ("view", 2L, 20L)), batchId = 1L)
    assert(view === Map("click" -> (15L, 150L), "view" -> (2L, 20L)))
    MiniLake.deleteRecursively(dir)
  }

  test("q116 end-to-end equals the direct batch aggregate") {
    val sf = "/root/testdata/sf0.001"
    val got = LakeIngestStream.q116StreamingView(spark, sf)
      .as[(String, Long, Long)].collect().toSet
    val direct = graft.Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100, 0).cast("long")).as("total_cents"))
      .as[(String, Long, Long)].collect().toSet
    assert(got === direct)
  }
}
