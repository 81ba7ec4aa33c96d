// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // optional 3rd arg: comma-separated query names — run (and dump
    // oracles for) just that subset; the incremental dev loop
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(',').toSet) else None
    def selected[T](m: Map[String, T]): Map[String, T] =
      only.map(s => m.view.filterKeys(s).toMap).getOrElse(m)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // Write timestamps as INT64 micros (not INT96) so the driver's
      // pyarrow read of our results carries the same logical type as the
      // DuckDB oracle's output — keeps timestamp columns hash-comparable.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // Same rationale as Bench: coalesce small shuffles to advisory
      // size rather than keeping cpus-many slivers — scheduling
      // roundtrips, not compute, dominate at gate SF, and the shared
      // host stalls in bursts. Results are unaffected (every query is
      // hash-gated); the dump just finishes well inside any driver
      // timeout.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .config("spark.locality.wait", "0s")
      .config("spark.ui.enabled", "false")
      // no native-hadoop in this runtime: see Bench.scala — avoids a
      // fork+exec per checkpoint file in the streaming gates
      .config("spark.sql.streaming.checkpointFileManagerClass",
        "org.apache.spark.sql.execution.streaming.checkpointing" +
          ".FileSystemBasedCheckpointFileManager")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    selected(SparkEntry.queries).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = selected(SparkEntry.oracleSql)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
