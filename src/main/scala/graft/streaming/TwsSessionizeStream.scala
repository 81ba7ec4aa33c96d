// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}
import org.apache.spark.sql.types._

import SessionizeStream.{Event, Session, SessionAcc, GapMs}

/** Sessionization through `transformWithState` — Spark 4's
  * arbitrary-stateful-processing API (the successor to
  * `flatMapGroupsWithState`, SPARK-40434): state lives in named,
  * individually-evolvable RocksDB column families instead of one
  * opaque blob, timers are first-class, and the state schema can grow
  * without breaking checkpoints. Semantics here are IDENTICAL to
  * [[SessionizeStream]] (30-min inactivity gap) and both gate against
  * the BATCH sessionizer's oracle — three independent engines (window
  * batch, fMGWS, TWS) must agree row-for-row.
  *
  * Scale posture: per-user state is one constant-size accumulator in
  * a RocksDB ValueState — bounded memory per key with spill-to-disk,
  * which is exactly what lets a 1000-executor cluster hold hundreds
  * of millions of open sessions; the shuffle is the single
  * key-partitioning on user_id that any stateful op pays.
  */
object TwsSessionizeStream {

  private val SentinelId = -1L

  private class SessionProcessor
      extends StatefulProcessor[Long, Event, Session] {
    @transient private var open: ValueState[(SessionAcc, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[(SessionAcc, Long)]("open",
        Encoders.product[(SessionAcc, Long)], TTLConfig.NONE)

    private def close(userId: Long, seq: Long, acc: SessionAcc): Session =
      Session(userId, seq, acc.n, acc.start_ms, acc.end_ms,
        math.round(acc.total * 100).toDouble / 100)

    override def handleInputRows(userId: Long, rows: Iterator[Event],
        timers: TimerValues): Iterator[Session] = {
      var acc: Option[SessionAcc] =
        if (open.exists()) Some(open.get()._1) else None
      var seq: Long = if (open.exists()) open.get()._2 else 0L
      val out = Seq.newBuilder[Session]
      def closeOpen(): Unit = acc.foreach { a =>
        seq += 1; out += close(userId, seq, a); acc = None
      }
      rows.toSeq.sortBy(e => (e.ms, e.event_id)).foreach { e =>
        if (e.event_id == SentinelId) closeOpen()
        else acc match {
          case Some(a) if e.ms - a.end_ms <= GapMs =>
            acc = Some(a.copy(end_ms = e.ms, n = a.n + 1,
              total = a.total + e.value))
          case _ =>
            closeOpen()
            acc = Some(SessionAcc(e.ms, e.ms, 1, e.value))
        }
      }
      acc match {
        case Some(a) => open.update((a, seq))
        case None => open.clear()
      }
      out.result().iterator
    }
  }

  /** The TWS pipeline over a parquet file-stream directory — shared by
    * the one-shot gate ([[sessions]]) and the restart spec
    * ([[runPass]]) so recovery is proven on the production plan, not a
    * test replica.
    */
  private def pipeline(s: SparkSession, watchDir: String)
      : org.apache.spark.sql.Dataset[Session] = {
    import s.implicits._
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ms", LongType),
      StructField("value", DoubleType), StructField("event_id", LongType)))
    s.readStream.schema(schema).parquet(watchDir).as[Event]
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** transformWithState requires the RocksDB state store; scope the
    * provider switch (and a small shuffle width) to the enclosed run —
    * HDFS-backed remains the default for the other streams.
    */
  private def withRocksDb[T](s: SparkSession)(f: => T): T = {
    val prevProvider =
      s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s.conf.set("spark.sql.shuffle.partitions",
      math.min(prevShuffle.toInt, 4).toString)
    try f finally {
      s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      prevProvider match {
        case Some(p) =>
          s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          s.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  /** One restartable pass: start the TWS query over `watchDir` against
    * `ckpt`, drain everything currently available, and stop — the
    * recovery spec's kill point. Sink is foreachBatch parquet-append
    * (the memory sink refuses checkpoint recovery); a resumed pass
    * must pick up both the source offsets AND the open-session
    * ValueState from RocksDB for the union of pass outputs to match
    * the single-run sessionizer.
    */
  private[streaming] def runPass(s: SparkSession, watchDir: String,
      ckpt: String, outDir: String): Unit = withRocksDb(s) {
    val q = pipeline(s, watchDir).writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch {
        (df: org.apache.spark.sql.Dataset[Session], _: Long) =>
          df.toDF().write.mode("append").parquet(outDir): Unit
      }
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** Drive the TWS query over the bounded events table; output shape
    * matches [[SessionizeStream.sessions]] exactly.
    */
  def sessions(s: SparkSession, dir: String): DataFrame = {
    val watchDir = graft.Scratch.dir("graft_tws")
    stageInput(s, dir, watchDir.toString + "/in", _ => lit(true))

    val sessionized = pipeline(s, watchDir.toString + "/in")
    val name = "graft_tws_" + java.util.UUID.randomUUID.toString.replace("-", "")
    withRocksDb(s) {
      val q = sessionized.writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        q.processAllAvailable()
        val result = s.table(name)
          .withColumn("session_value",
            col("session_value").cast("decimal(18,2)").cast("double"))
          .orderBy("user_id", "session_seq")
        result.cache().count()
        result
      } finally q.stop()
    }
  }

  /** Stage the bounded events table (+ per-user end-of-stream
    * sentinels) as the file-stream input, keeping only rows the
    * predicate admits — the restart spec stages two disjoint
    * time-split chunks into the same directory across its passes.
    */
  private[streaming] def stageInput(s: SparkSession, dir: String,
      inDir: String, admit: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Unit = {
    val batch = graft.Tables.events(s, dir)
      .select(col("user_id"),
        unix_millis(col("ts").cast("timestamp")).as("ms"),
        coalesce(col("value"), lit(0.0)).as("value"),
        coalesce(col("event_id"), lit(Long.MinValue)).as("event_id")) // never the sentinel
    // empty input handled the same way as SessionizeStream: clock the
    // sentinels off 0 and let the stream materialize an empty sink
    val maxRow = batch.agg(max("ms")).head()
    val maxMs = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
    val sentinels = batch.select(col("user_id")).distinct()
      .select(col("user_id"), lit(maxMs + 2 * GapMs).as("ms"),
        lit(0.0).as("value"), lit(SentinelId).as("event_id"))
    batch.unionByName(sentinels)
      .filter(admit(col("ms")))
      .coalesce(2)
      .write.mode("append").parquet(inDir)
  }
}
