// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Checkpoint recovery — the exactly-once property a long-lived
  * deployment actually relies on: a streaming query stopped and
  * RESTARTED from its checkpoint must (a) resume from committed
  * source offsets instead of re-ingesting history, and (b) recover
  * its aggregation state. The in-run replay gates (q58/q63) prove
  * idempotence within one query; these prove it across process
  * restarts, which is where a real cluster exercises it (executor
  * loss, code deploys, weekly batch windows).
  */
class StreamRecoverySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("kind", StringType)))

  private def writeChunk(dir: String, name: String,
      rows: Seq[(Long, String)]): Unit = {
    val tmp = Files.createTempDirectory("graft_chunk").toString
    rows.toDF("id", "kind").coalesce(1).write.parquet(s"$tmp/p")
    val part = Files.list(Paths.get(s"$tmp/p")).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).head
    Files.move(Paths.get(part), Paths.get(dir, name))
    graft.lake.MiniLake.deleteRecursively(tmp)
  }

  test("restart from checkpoint resumes offsets: no re-ingest into a plain sink") {
    val base = Files.createTempDirectory("graft_recover").toString
    val watch = s"$base/in"; Files.createDirectories(Paths.get(watch))
    val ckpt = s"$base/ckpt"
    val out = s"$base/out"; Files.createDirectories(Paths.get(out))

    def runOnce(): Unit = {
      // deliberately NON-idempotent sink (plain parquet append): if the
      // restarted query re-read chunk A, duplicates would be visible
      val q = spark.readStream.schema(schema).parquet(watch)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.write.mode("append").parquet(out): Unit
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    val a = (0L until 50L).map(i => i -> "a")
    val b = (50L until 80L).map(i => i -> "b")
    writeChunk(watch, "chunk_a.parquet", a)
    runOnce()
    writeChunk(watch, "chunk_b.parquet", b)
    runOnce() // fresh query object, same checkpoint

    val got = spark.read.schema(schema).parquet(out)
      .as[(Long, String)].collect().sorted.toSeq
    assert(got === (a ++ b).sorted.toSeq) // each row exactly once
    graft.lake.MiniLake.deleteRecursively(base)
  }

  test("restart from checkpoint recovers stream-stream join state") {
    // left rows arrive in run 1, matching right rows only in run 2:
    // the pairs can appear in run 2's sink ONLY if the join's buffered
    // left state survived the restart — the recovery half of what the
    // in-run gates (q62/q168) prove
    val base = Files.createTempDirectory("graft_recover_join").toString
    val watch = s"$base/in"; Files.createDirectories(Paths.get(watch))
    val ckpt = s"$base/ckpt"
    val tsSchema = StructType(Seq(
      StructField("id", LongType), StructField("kind", StringType),
      StructField("ts", TimestampType)))

    def writeTsChunk(name: String, rows: Seq[(Long, String, Int)]): Unit = {
      val tmp = Files.createTempDirectory("graft_chunk").toString
      rows.toDF("id", "kind", "mins")
        .withColumn("ts", expr(
          "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,mins,0)"))
        .drop("mins")
        .coalesce(1).write.parquet(s"$tmp/p")
      val part = Files.list(Paths.get(s"$tmp/p")).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      Files.move(Paths.get(part), Paths.get(watch, name))
      graft.lake.MiniLake.deleteRecursively(tmp)
    }

    val out = s"$base/out"; Files.createDirectories(Paths.get(out))

    def runOnce(): Unit = {
      val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      val raw = spark.readStream.schema(tsSchema).parquet(watch)
      val left = raw.filter(col("kind") === "v")
        .select(col("id").as("v_id"), col("ts").as("v_ts"))
        .withWatermark("v_ts", "1 hour")
      val right = raw.filter(col("kind") === "p")
        .select(col("id").as("p_id"), col("ts").as("p_ts"))
        .withWatermark("p_ts", "1 hour")
      // the memory sink refuses checkpoint recovery; foreachBatch is
      // the recoverable sink shape (and the production one)
      val q = left.join(right,
          expr("v_id = p_id AND p_ts >= v_ts AND " +
            "p_ts <= v_ts + interval 1 hour"))
        .select(col("v_id"), col("p_id"))
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.write.mode("append").parquet(out): Unit
        }
        .start()
      try q.processAllAvailable() finally {
        q.stop()
        spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      }
    }

    val pairSchema = StructType(Seq(
      StructField("v_id", LongType), StructField("p_id", LongType)))
    def sunk(): Seq[(Long, Long)] =
      spark.read.schema(pairSchema).parquet(out)
        .as[(Long, Long)].collect().sorted.toSeq

    writeTsChunk("chunk_a.parquet",
      (0L until 20L).map(i => (i, "v", 0)))
    runOnce()
    assert(sunk().isEmpty, "no right side yet")
    writeTsChunk("chunk_b.parquet",
      (0L until 20L).map(i => (i, "p", 10)))
    // a NEW query over the SAME checkpoint reads only chunk_b; pairs
    // require chunk_a's left rows out of the recovered join state
    runOnce()
    assert(sunk() === (0L until 20L).map(i => (i, i)),
      "join state must survive the restart")
    graft.lake.MiniLake.deleteRecursively(base)
  }

  test("restart from checkpoint recovers transformWithState RocksDB state " +
      "(q161 TWS sessionizer killed and resumed mid-stream)") {
    // Split the q161 input at a time cutoff: pass 1 sessionizes the
    // early half and is STOPPED with sessions still open in the
    // RocksDB ValueState; pass 2 is a NEW query over the SAME
    // checkpoint that sees only the late half (+ sentinels). The union
    // of the two passes' outputs can match the single-run sessionizer
    // ONLY if pass 2 recovered both the source offsets and every
    // open-session accumulator.
    val sf = "/root/testdata/sf0.001"
    val base = Files.createTempDirectory("graft_recover_tws").toString
    val watch = s"$base/in"; Files.createDirectories(Paths.get(watch))
    val ckpt = s"$base/ckpt"
    val out = s"$base/out"; Files.createDirectories(Paths.get(out))

    // Kill point = the median over times t1 where the SAME user has a
    // next event t2 with 0 < t2−t1 ≤ gap: splitting at such a t1 cuts
    // that user's session mid-flight, so pass 1 provably stops with
    // open accumulators (a plain median event time can land in a
    // global inactivity gap and test nothing). Sentinels clock past
    // maxMs and land in pass 2 by construction.
    val gap = SessionizeStream.GapMs
    val cutoff = graft.Tables.events(spark, sf)
      .select(col("user_id"),
        unix_millis(col("ts").cast("timestamp")).as("ms"))
      .withColumn("nxt", lead("ms", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ms")))
      .filter(col("nxt") > col("ms") && col("nxt") - col("ms") <= gap)
      .agg(expr("cast(approx_percentile(ms, 0.5) as long)"))
      .head().getLong(0)

    TwsSessionizeStream.stageInput(spark, sf, watch, m => m <= cutoff)
    TwsSessionizeStream.runPass(spark, watch, ckpt, out)
    val afterPass1 = spark.read.parquet(out).count()

    TwsSessionizeStream.stageInput(spark, sf, watch, m => m > cutoff)
    TwsSessionizeStream.runPass(spark, watch, ckpt, out) // new query, same ckpt

    val recovered = spark.read.parquet(out)
      .withColumn("session_value",
        col("session_value").cast("decimal(18,2)").cast("double"))
      .select("user_id", "session_seq", "n_events", "start_ms", "end_ms",
        "session_value")
      .as[(Long, Long, Long, Long, Long, Double)].collect().sorted.toSeq

    val single = TwsSessionizeStream.sessions(spark, sf)
      .select("user_id", "session_seq", "n_events", "start_ms", "end_ms",
        "session_value")
      .as[(Long, Long, Long, Long, Long, Double)].collect().sorted.toSeq

    assert(recovered === single,
      "killed-and-resumed TWS run must equal the single-run sessionizer")
    // the restart genuinely exercised state recovery: pass 1 emitted
    // only part of the output, and at least one final session SPANS
    // the kill point — such a session exists only if its open
    // accumulator survived in RocksDB across the restart
    assert(afterPass1 < single.size.toLong,
      "pass 1 must stop with sessions still open")
    assert(single.exists(r => r._4 <= cutoff && r._5 > cutoff),
      "no session spans the kill point — the split doesn't test recovery")
    graft.lake.MiniLake.deleteRecursively(base)
  }

  test("restart from checkpoint recovers aggregation state") {
    val base = Files.createTempDirectory("graft_recover_agg").toString
    val watch = s"$base/in"; Files.createDirectories(Paths.get(watch))
    val ckpt = s"$base/ckpt"

    def runOnce(tableName: String): Map[String, Long] = {
      val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      val q = spark.readStream.schema(schema).parquet(watch)
        .groupBy("kind").agg(count(lit(1)).as("n"))
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("complete")
        .format("memory")
        .queryName(tableName)
        .start()
      try {
        q.processAllAvailable()
        spark.table(tableName).as[(String, Long)].collect().toMap
      } finally {
        q.stop()
        spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      }
    }

    writeChunk(watch, "chunk_a.parquet",
      (0L until 40L).map(i => i -> (if (i % 2 == 0) "x" else "y")))
    val first = runOnce("graft_rec_t1")
    assert(first === Map("x" -> 20L, "y" -> 20L))

    writeChunk(watch, "chunk_b.parquet",
      (40L until 50L).map(i => i -> "x"))
    // a NEW query (new memory table) over the SAME checkpoint: the
    // restarted run reads only chunk_b, so these totals are correct
    // ONLY if the state store recovered chunk_a's counts
    val second = runOnce("graft_rec_t2")
    assert(second === Map("x" -> 30L, "y" -> 20L))
    graft.lake.MiniLake.deleteRecursively(base)
  }
}
