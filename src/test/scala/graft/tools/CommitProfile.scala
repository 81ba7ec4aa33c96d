// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiler: where does a metadata-sized MiniLake commit spend its
  * time? Drives 60 one-row appends and prints per-phase wall times.
  */
object CommitProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cp").toString + "/t"
    val t = graft.lake.MiniLake.compact(spark, dir)
    t.create(Seq((0L, 0L)).toDF("k", "cents"))
    // warm
    for (i <- 1L to 10L) t.append(Seq((i, i)).toDF("k", "cents"))
    val t0 = System.nanoTime()
    for (i <- 11L to 70L) t.append(Seq((i, i)).toDF("k", "cents"))
    val t1 = System.nanoTime()
    println(f"[profile] 60 appends: ${(t1 - t0) / 1e9}%.2f s  " +
      f"(${(t1 - t0) / 60 / 1e6}%.1f ms/commit)")
    // raw spark write for comparison
    val t2 = System.nanoTime()
    for (i <- 0 until 20)
      Seq((1L, 1L)).toDF("k", "cents").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir-raw$i")
    val t3 = System.nanoTime()
    println(f"[profile] 20 raw writes: ${(t3 - t2) / 20 / 1e6}%.1f ms/write")
    graft.lake.MiniLake.deleteRecursively(dir)
  }
}
