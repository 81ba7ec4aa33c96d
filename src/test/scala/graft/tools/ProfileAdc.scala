// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.tools

import graft.{ops, SparkEntry}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: measure the q187 IVF-ADC witness margin — max over query
  * points of (exact 5th-best sim − ADC-path 5th-best sim) — per
  * re-rank depth R, at a given SF dir. The numbers this prints are
  * what the [[graft.ops.Similarity.PqRerankCandidates]] Scaladoc
  * cites; rerun after any retune of the PQ layout.
  */
object ProfileAdc {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val rs = if (args.length > 1) args(1).split(',').map(_.toInt)
      else Array(64, 128, 256)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val exact = ops.Similarity.q45CosineTopK(spark, sfDir)
      .groupBy("qid").agg(min("sim").as("e5")).cache()
    for (r <- rs) {
      val ann = ops.Similarity.ivfPqTop5(spark, sfDir, rerank = r)
        .groupBy("qid").agg(min("sim").as("a5"), count(lit(1)).as("an"))
      val row = exact.join(ann, Seq("qid"), "left")
        .agg(max(col("e5") - coalesce(col("a5"), lit(-2.0))).as("maxDelta"),
          sum(when(coalesce(col("an"), lit(0L)) =!= 5, 1L)
            .otherwise(0L)).as("short"))
        .collect()(0)
      println(f"ADC $sfDir R=$r%4d maxDelta=${row.getDouble(0)}%.4f " +
        s"short=${row.getLong(1)}")
    }
    spark.stop()
  }
}
