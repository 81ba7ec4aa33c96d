// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.lake.MiniLake

class CdfSourceSpec extends AnyFunSuite with BeforeAndAfterEach {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private var dir: String = _
  override def beforeEach(): Unit =
    dir = Files.createTempDirectory("cdfsrc").toString + "/t"
  override def afterEach(): Unit =
    MiniLake.deleteRecursively(dir)

  private def kv(rows: (Long, String)*) = rows.toDF("key", "value")

  private def readCdfStream() = spark.readStream
    .format(classOf[MiniLakeCdfSourceProvider].getName)
    .option("path", dir)
    .load()

  test("streamed change feed equals the batch CDF read, including " +
      "incremental micro-batches for later commits") {
    val t = MiniLake(spark, dir)
    t.create(kv(1L -> "a", 2L -> "b"))                         // v0
    t.append(kv(3L -> "c"))                                    // v1
    t.merge(inserts = kv(4L -> "d"), deletes = kv(2L -> "b"),
      pks = Seq("key"))                                        // v2

    val seen = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, Long)]
    val q = readCdfStream().writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          _: Long) =>
        seen.synchronized {
          seen ++= batch
            .select("key", "value", MiniLake.ChangeType,
              MiniLake.CommitVersion)
            .collect()
            .map(r => (r.getLong(0), r.getString(1), r.getString(2),
              r.getLong(3)))
        }
        ()
    }.start()
    try {
      q.processAllAvailable()
      def batchCdf(lo: Long, hi: Long) =
        t.readChanges(lo, hi)
          .select("key", "value", MiniLake.ChangeType, MiniLake.CommitVersion)
          .collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2),
            r.getLong(3)))
      assert(seen.sorted.toSeq === batchCdf(0, 2).toSeq.sorted)

      // commits landing while the stream runs surface as new batches
      seen.clear()
      t.append(kv(5L -> "e"))                                  // v3
      t.update(col("key") === 1L, Map("value" -> lit("a2")))   // v4
      q.processAllAvailable()
      assert(seen.sorted.toSeq === batchCdf(3, 4).toSeq.sorted)
    } finally q.stop()
  }

  test("startingVersion skips history; checkpointed restart does not " +
      "redeliver (replay idempotence at the offset level)") {
    val t = MiniLake(spark, dir)
    t.create(kv(1L -> "a"))            // v0 — history to skip
    t.append(kv(2L -> "b"))            // v1
    val ckpt = Files.createTempDirectory("cdfsrc_ck").toString

    def run(): Seq[(Long, Long)] = {
      val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val q = spark.readStream
        .format(classOf[MiniLakeCdfSourceProvider].getName)
        .option("path", dir).option("startingVersion", "1")
        .load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
              _: Long) =>
            seen.synchronized {
              seen ++= batch.select("key", MiniLake.CommitVersion).collect()
                .map(r => (r.getLong(0), r.getLong(1)))
            }
            ()
        }.start()
      try q.processAllAvailable() finally q.stop()
      seen.toSeq
    }

    // first run: v1 only (v0 skipped by startingVersion)
    assert(run().sorted === Seq(2L -> 1L))
    // restart with the same checkpoint after one more commit: ONLY the
    // new version arrives — no redelivery of v1
    t.append(kv(3L -> "c"))            // v2
    assert(run().sorted === Seq(3L -> 2L))
    // idle restart delivers nothing
    assert(run() === Seq.empty)
  }

  test("startingTimestamp resolves FORWARD at stream start (the q287 " +
      "rule): between-commit instants start at the next commit; " +
      "past-the-end and combining with startingVersion are errors") {
    val t = MiniLake.compact(spark, dir)
    t.create(kv(1L -> "a"))                    // v0
    Thread.sleep(25)
    t.append(kv(2L -> "b"), mergeSchema = false) // v1
    val ts = t.history.select("version", "timestamp_ms")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    def collectFrom(tsMillis: Long): Seq[(Long, Long)] = {
      val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val q = spark.readStream
        .format(classOf[MiniLakeCdfSourceProvider].getName)
        .option("path", dir).option("startingTimestamp", tsMillis.toString)
        .load()
        .writeStream.foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
              _: Long) =>
            seen.synchronized {
              seen ++= batch.select("key", MiniLake.CommitVersion)
                .collect().map(r => (r.getLong(0), r.getLong(1)))
            }
            ()
        }.start()
      try q.processAllAvailable() finally q.stop()
      seen.toSeq.sorted
    }

    assert(collectFrom(ts(0L)) === Seq(1L -> 0L, 2L -> 1L))
    // an instant strictly between the commits starts at v1
    assert(collectFrom(ts(0L) + 1) === Seq(2L -> 1L))
    // past the end of history: explicit error, never an empty stream
    val exPast = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      collectFrom(ts(1L) + 1)
    }
    assert(exPast.getMessage.contains("at or after") ||
      Option(exPast.getCause).exists(_.getMessage.contains("at or after")))
    // mutually exclusive with startingVersion, like Delta
    val exBoth = intercept[Exception] {
      val q = spark.readStream
        .format(classOf[MiniLakeCdfSourceProvider].getName)
        .option("path", dir).option("startingTimestamp", ts(0L).toString)
        .option("startingVersion", "0").load()
        .writeStream.foreachBatch {
          (_: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
              _: Long) => ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(exBoth).exists(_.contains("mutually exclusive")))
  }

  test("mid-stream schema evolution fails the stream explicitly; " +
      "a restart picks up the new schema") {
    val t = MiniLake(spark, dir)
    t.create(kv(1L -> "a"))                                    // v0
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    def start() = readCdfStream().writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          _: Long) =>
        seen.synchronized { seen ++= batch.select("key").as[Long].collect() }
        ()
    }.start()
    val q = start()
    try {
      q.processAllAvailable()
      assert(seen.sorted.toSeq === Seq(1L))
      // a mergeSchema append lands MID-STREAM: the next batch must
      // fail with the explicit restart error — not silently mis-bind
      // or drop the new column
      t.append(Seq((2L, "b", 7L)).toDF("key", "value", "extra"),
        mergeSchema = true)                                    // v1
      val err = intercept[org.apache.spark.sql.streaming
          .StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination()
      }
      def rootMessages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e =>
          Option(e.getMessage).toSeq ++ rootMessages(e.getCause))
      assert(rootMessages(err).exists(_.contains("schema changed")),
        s"wanted the explicit schema-changed error, got: $err")
    } finally q.stop()

    // a RESTARTED stream pins the evolved schema and serves the
    // commit that failed the old stream (fresh temp checkpoint here,
    // so v0 redelivers too — the point is v1 now flows)
    seen.clear()
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(seen.sorted.toSeq === Seq(1L, 2L))
    } finally q2.stop()
  }

  test("mid-stream rename fails the stream explicitly") {
    val t = MiniLake(spark, dir)
    t.create(kv(1L -> "a"))                                    // v0
    val q = readCdfStream().writeStream.foreachBatch {
      (_: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          _: Long) => ()
    }.start()
    try {
      q.processAllAvailable()
      t.renameColumn("value", "val2")                          // v1
      t.append(Seq((2L, "b")).toDF("key", "val2"))             // v2
      val err = intercept[org.apache.spark.sql.streaming
          .StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination()
      }
      def rootMessages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e =>
          Option(e.getMessage).toSeq ++ rootMessages(e.getCause))
      assert(rootMessages(err).exists(_.contains("schema changed")))
    } finally q.stop()
  }

  test("maxCommitsPerBatch drains a backlog in bounded micro-batches " +
      "with the same total content as the uncapped stream") {
    val t = MiniLake.compact(spark, dir)
    t.create(kv(1L -> "a"))                                    // v0
    for (i <- 2L to 7L) t.append(kv(i -> s"v$i"))              // v1..v6
    val batches =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val ckpt = Files.createTempDirectory("cdfcap").toString
    val q = spark.readStream
      .format(classOf[MiniLakeCdfSourceProvider].getName)
      .option("path", dir)
      .option("maxCommitsPerBatch", "3")
      .load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            id: Long) =>
          val r = b.agg(count(lit(1)),
            countDistinct(col(MiniLake.CommitVersion))).collect().head
          batches.synchronized { batches += ((id, r.getLong(0),
            r.getLong(1))) }
          ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    // 7 commits at cap 3 → ceil(7/3) = 3 micro-batches of ≤ 3 versions
    assert(batches.map(_._3).toSeq === Seq(3L, 3L, 1L), batches)
    // nothing lost, nothing duplicated: total rows = the batch read
    assert(batches.map(_._2).sum === t.readChanges(0, 6).count())
  }

  test("rate-limited checkpointed restart never redelivers committed " +
      "versions (admission cursor must not regress the WAL)") {
    val t = MiniLake.compact(spark, dir)
    t.create(kv(1L -> "a"))                                    // v0
    for (i <- 2L to 5L) t.append(kv(i -> s"v$i"))              // v1..v4
    val ckpt = Files.createTempDirectory("cdfcap_rs").toString
    def run(): Seq[(Long, Long)] = {
      val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val q = spark.readStream
        .format(classOf[MiniLakeCdfSourceProvider].getName)
        .option("path", dir)
        .option("maxCommitsPerBatch", "2")
        .load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
              _: Long) =>
            seen.synchronized {
              seen ++= b.select("key", MiniLake.CommitVersion).collect()
                .map(r => (r.getLong(0), r.getLong(1)))
            }
            ()
        }.start()
      try q.processAllAvailable() finally q.stop()
      seen.toSeq
    }
    assert(run().map(_._2).distinct.sorted === Seq(0L, 1L, 2L, 3L, 4L))
    // append a backlog LARGER than the cap and restart with the same
    // checkpoint: the first capped offer lands below the WAL-committed
    // offset — versions the first run already delivered must NOT come
    // back, only the new backlog (in capped batches)
    for (i <- 6L to 9L) t.append(kv(i -> s"v$i"))              // v5..v8
    val second = run()
    assert(second.map(_._2).distinct.sorted === Seq(5L, 6L, 7L, 8L),
      s"redelivered committed versions: $second")
    // idle restart delivers nothing
    assert(run() === Seq.empty)
  }

  test("maxCommitsPerBatch rejects non-positive values") {
    val t = MiniLake.compact(spark, dir)
    t.create(kv(1L -> "a"))
    val ex = intercept[Exception] {
      new MiniLakeCdfSource(t, 0L, Some(0L))
    }
    assert(ex.getMessage.contains("must be positive"))
  }

  test("Trigger.AvailableNow drains the backlog in capped batches and " +
      "STOPS at the start snapshot; the restart picks up only new work") {
    val t = MiniLake.compact(spark, dir)
    t.create(kv(1L -> "a"))                                    // v0
    for (i <- 2L to 6L) t.append(kv(i -> s"v$i"))              // v1..v5
    val ckpt = Files.createTempDirectory("cdfan").toString
    def drain(): Seq[(Long, Long, Long)] = {
      val batches =
        scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      val q = spark.readStream
        .format(classOf[MiniLakeCdfSourceProvider].getName)
        .option("path", dir)
        .option("maxCommitsPerBatch", "2")
        .load()
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
              id: Long) =>
            val r = b.agg(count(lit(1)),
              countDistinct(col(MiniLake.CommitVersion))).collect().head
            batches.synchronized {
              batches += ((id, r.getLong(0), r.getLong(1))) }
            ()
        }.start()
      // run-to-current-then-stop: the QUERY terminates itself — no
      // processAllAvailable/stop driving from the test
      assert(q.awaitTermination(60000), "AvailableNow query did not stop")
      batches.toSeq
    }
    // 6 commits at cap 2 → exactly 3 bounded batches, then termination
    assert(drain().map(_._3) === Seq(2L, 2L, 2L))
    // append AFTER the drain; a fresh AvailableNow run serves only it
    t.append(kv(7L -> "v7"))                                   // v6
    assert(drain().map(_._3) === Seq(1L))
    // idle restart: terminates with nothing
    assert(drain() === Seq.empty)
  }

  test("skipChangeCommits streams inserts only, skipping rewrite " +
      "commits wholesale; ignoreDeletes skips delete-only commits " +
      "but errors on rewrites") {
    val t = MiniLake(spark, dir)
    t.create(kv(1L -> "a", 2L -> "b"))                         // v0 insert
    t.append(kv(3L -> "c"))                                    // v1 insert
    t.merge(inserts = MiniLake.emptyDf(spark, t.schema),
      deletes = kv(2L -> "b"), pks = Seq("key"))               // v2 delete
    t.update(col("key") === 1L, Map("value" -> lit("A")))      // v3 update
    t.append(kv(4L -> "d"))                                    // v4 insert
    def collectWith(opts: Map[String, String]): Seq[(Long, String, Long)] = {
      val seen =
        scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
      val ckpt = Files.createTempDirectory("cdfskip").toString
      var reader = spark.readStream
        .format(classOf[MiniLakeCdfSourceProvider].getName)
        .option("path", dir)
      opts.foreach { case (k, v) => reader = reader.option(k, v) }
      val q = reader.load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
              _: Long) =>
            seen.synchronized {
              seen ++= b.select("key", MiniLake.ChangeType,
                  MiniLake.CommitVersion).collect()
                .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
            }
            ()
        }.start()
      try q.processAllAvailable() finally q.stop()
      seen.toSeq
    }
    // skipChangeCommits: v2 (delete) and v3 (update) vanish wholesale
    val skipped = collectWith(Map("skipChangeCommits" -> "true"))
    assert(skipped.map(_._3).distinct.sorted === Seq(0L, 1L, 4L), skipped)
    assert(skipped.forall(_._2 == "insert"), skipped)
    // ignoreDeletes alone: v2 skips, v3 (a rewrite) fails the stream
    val ex = intercept[Exception] {
      collectWith(Map("ignoreDeletes" -> "true"))
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(ex).exists(c => Option(c.getMessage)
      .exists(_.contains("ignoreDeletes only skips delete commits"))), ex)
  }
}
