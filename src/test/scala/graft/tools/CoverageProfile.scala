// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for the q216 greedy loop: per-round wall time. */
object CoverageProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    import graft.functions.Text.tokens
    val ws = tokens(col("text"))
    val bigrams = when(size(ws) >= 2,
      transform(sequence(lit(1), size(ws) - 1),
        i => concat(element_at(ws, i), lit(" "), element_at(ws, i + 1))))
      .otherwise(array().cast("array<string>"))
    var t0 = System.nanoTime()
    val tokD = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), explode(bigrams).as("tk"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(f"[cov] rows=${tokD.count()} build=${(System.nanoTime()-t0)/1e9}%.2f s")
    val picked = scala.collection.mutable.ArrayBuffer.empty[Long]
    for (round <- 1 to 8) {
      t0 = System.nanoTime()
      val uncovered =
        if (picked.isEmpty) tokD
        else tokD.join(
          // no distinct: LEFT ANTI ignores build-side duplicates, and
          // dropping it removes a whole shuffle stage from every round
          broadcast(tokD.filter(col("doc_id").isin(picked.toSeq: _*))
            .select(col("tk"))),
          Seq("tk"), "left_anti")
      val win = uncovered
        .groupBy("doc_id").agg(count(lit(1)).as("g"))
        .orderBy(col("g").desc, col("doc_id")).limit(1).collect()
      println(f"[cov] round $round: ${(System.nanoTime()-t0)/1e9}%.2f s win=${win.head.getLong(0)} g=${win.head.getLong(1)}")
      picked += win.head.getLong(0)
    }
  }
}
