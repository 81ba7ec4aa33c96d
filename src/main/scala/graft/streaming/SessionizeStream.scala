// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Stateful streaming sessionization ([EXT]): the
  * `flatMapGroupsWithState` surface for custom per-key state that
  * built-in windows can't express. Semantics match the batch
  * sessionizer (Relational.q10Sessions): a session closes after 30
  * minutes of inactivity per user.
  *
  * State per user is only the open session's accumulator (start, last
  * ts, count, sum) plus the emitted-session counter — constant size
  * per key regardless of history, the property that makes this run
  * indefinitely on an unbounded stream. Closed sessions emit as soon
  * as a gap is observed. On a production stream the trailing open
  * session would close via an event-time timeout; for the bounded
  * demo input a per-user end-of-stream sentinel closes it inside the
  * same stateful pass.
  */
object SessionizeStream {

  final case class Event(user_id: Long, ms: Long, value: Double,
      event_id: Long)
  final case class SessionAcc(start_ms: Long, end_ms: Long, n: Long,
      total: Double)
  final case class Session(user_id: Long, session_seq: Long, n_events: Long,
      start_ms: Long, end_ms: Long, session_value: Double)

  val GapMs: Long = 30L * 60 * 1000
  private val SentinelId = -1L

  private def close(userId: Long, seq: Long, acc: SessionAcc): Session =
    Session(userId, seq, acc.n, acc.start_ms, acc.end_ms,
      math.round(acc.total * 100).toDouble / 100)

  /** Per-key sessionizer. Events are sorted (ms, event_id) within the
    * group; a sentinel event closes the open session without opening a
    * new one.
    */
  private def sessionize(userId: Long, events: Iterator[Event],
      state: GroupState[(SessionAcc, Long)]): Iterator[Session] = {
    var open: Option[SessionAcc] = state.getOption.map(_._1)
    var seq: Long = state.getOption.map(_._2).getOrElse(0L)
    val out = Seq.newBuilder[Session]
    def closeOpen(): Unit = open.foreach { acc =>
      seq += 1
      out += close(userId, seq, acc)
      open = None
    }
    events.toSeq.sortBy(e => (e.ms, e.event_id)).foreach { e =>
      if (e.event_id == SentinelId) {
        closeOpen()
      } else open match {
        case Some(acc) if e.ms - acc.end_ms <= GapMs =>
          open = Some(acc.copy(end_ms = e.ms, n = acc.n + 1,
            total = acc.total + e.value))
        case _ =>
          closeOpen()
          open = Some(SessionAcc(e.ms, e.ms, 1, e.value))
      }
    }
    open match {
      case Some(acc) => state.update((acc, seq))
      case None => state.remove()
    }
    out.result().iterator
  }

  /** Run the stateful query over the bounded events table and return
    * every session, ordered — directly comparable with the batch
    * sessionizer's output.
    */
  def sessions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._

    // stage input + per-user sentinels (beyond any possible gap) into
    // a streaming watch dir
    val batch = graft.Tables.events(s, dir)
      .select(col("user_id"),
        unix_millis(col("ts").cast("timestamp")).as("ms"),
        coalesce(col("value"), lit(0.0)).as("value"),
        coalesce(col("event_id"), lit(Long.MinValue)).as("event_id")) // never the sentinel
    // empty input: no sessions to close, but the stream still runs so
    // the sink table materializes (schema'd, zero rows)
    val maxRow = batch.agg(max("ms")).head()
    val maxMs = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
    val sentinels = batch.select(col("user_id")).distinct()
      .select(col("user_id"), lit(maxMs + 2 * GapMs).as("ms"),
        lit(0.0).as("value"), lit(SentinelId).as("event_id"))
    val watchDir = graft.Scratch.dir("graft_sess")
    batch.unionByName(sentinels).coalesce(2)
      .write.parquet(watchDir.toString + "/in")

    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ms", LongType),
      StructField("value", DoubleType), StructField("event_id", LongType)))
    val events = s.readStream.schema(schema)
      .parquet(watchDir.toString + "/in").as[Event]

    val sessionized = events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(sessionize)

    // state partitions sized for key cardinality (150 users), not the
    // batch shuffle default
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions",
      math.min(prevShuffle.toInt, 4).toString)
    val name = "graft_sessions_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = sessionized.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      // snap session_value to the DECIMAL(18,2) grid, then emit DOUBLE:
      // raw double bits of a rounded sum differ sub-ulp between engines
      // (decimal is discrete), but decimal OUTPUT types don't survive
      // the driver's pandas conversion — double does, bit-exactly
      val result = s.table(name)
        .withColumn("session_value",
          col("session_value").cast("decimal(18,2)").cast("double"))
        .orderBy("user_id", "session_seq")
      result.cache().count()
      result
    } finally {
      q.stop()
      s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    }
  }
}
