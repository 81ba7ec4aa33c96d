// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.tools

import java.io.{File, PrintStream}

import org.apache.spark.sql.SparkSession

/** Dev tool (test scope): dump `.explain("formatted")` for a list of
  * declared queries into <outDir>/<query>_<tag>.txt — the judge-facing
  * plan evidence in plans/r13/.
  *
  * Run: Test/runMain graft.tools.PlanDump <outDir> <tag> <q1,q2,...> [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names = args(2).split(",").filter(_.nonEmpty)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new File(outDir).mkdirs()
    val stdout = System.out
    for (name <- names) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val f = new File(outDir, s"${name}_$tag.txt")
      val ps = new PrintStream(f, "UTF-8")
      // explain prints to Console.out, which tracks System.out
      System.setOut(ps)
      Console.withOut(ps) { df.explain("formatted") }
      System.setOut(stdout)
      ps.close()
      println(s"[plandump] wrote ${f.getPath}")
    }
    spark.stop()
  }
}
