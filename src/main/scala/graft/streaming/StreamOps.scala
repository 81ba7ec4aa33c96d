package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Stream-stream join and streaming deduplication ([EXT] Structured
  * Streaming surface, complementing q48 window-agg, q51 stateful
  * sessions, q58 lake ingest).
  *
  * Both queries run the streaming plan to completion over the bounded
  * testdata and aggregate the sink BATCH-side, so the result is
  * deterministic and the DuckDB oracle can state it directly — the
  * streaming machinery (join state, dedup state, watermark eviction) is
  * what's under test.
  */
object StreamOps {

  private def watchDirFor(dir: String, copies: Int): String = {
    val watch = graft.Scratch.dir("graft_stream_ops")
    (1 to copies).foreach(i => java.nio.file.Files.createSymbolicLink(
      watch.resolve(s"events_$i.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet")))
    watch.toString
  }

  private def rawStream(s: SparkSession, watch: String, srcDir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    // schema must match the footer exactly (its ts physical type varies
    // by testdata vintage) — a mismatched declared type makes the
    // vectorized reader surface raw physical values
    val reader = s.readStream.schema(graft.Tables.eventsRawSchema(s, srcDir))
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    graft.Tables.normalizeEventTsLtz(reader.parquet(watch))
  }

  private def runToMemorySink(s: SparkSession, out: DataFrame): DataFrame = {
    val name = "graft_sops_" + java.util.UUID.randomUUID.toString.replace("-", "")
    // join/dedup state stores are per-shuffle-partition; size to the
    // key cardinality, not the batch default
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions",
      math.min(prevShuffle.toInt, 4).toString)
    val query = out.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      query.processAllAvailable()
      s.table(name)
    } finally {
      query.stop()
      s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    }
  }

  /** Watermarked stream-stream inner join: views joined to the same
    * user's purchases within the following hour (the conversion-funnel
    * shape). The time-range predicate plus both watermarks bound the
    * join state — each side retains only rows inside the watermark
    * horizon, the non-negotiable ingredient for an unbounded run.
    * Result: per-day conversion counts, aggregated batch-side from the
    * joined pairs.
    */
  def q62StreamJoin(s: SparkSession, dir: String): DataFrame = {
    val raw = rawStream(s, watchDirFor(dir, 1), dir)
    val views = raw.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", "1 hour")
    val purchases = raw.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "1 hour")
    val pairs = views.join(purchases,
      expr("v_user = p_user AND p_ts >= v_ts AND " +
        "p_ts <= v_ts + interval 1 hour"))
    runToMemorySink(s, pairs)
      .groupBy(date_format(col("v_ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_pairs"),
        count_distinct(col("v_user")).as("n_users"))
      .orderBy("day")
  }

  /** Oracle on µs-floored timestamps (the engine reads the ns parquet
    * column as `ts div 1000` µs — make_timestamp(epoch_us(ts)) is the
    * same floor).
    */
  val q62Oracle: String =
    """WITH e AS (SELECT event_id, user_id, event_type,
      |  make_timestamp(epoch_us(ts)) AS ts FROM events)
      |SELECT strftime(v.ts, '%Y-%m-%d') AS day, count(*) AS n_pairs,
      | count(DISTINCT v.user_id) AS n_users
      |FROM e v JOIN e p
      |  ON v.user_id = p.user_id
      | AND v.event_type = 'view' AND p.event_type = 'purchase'
      | AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
      |GROUP BY 1
      |ORDER BY day""".stripMargin

  /** Streaming deduplication across micro-batches: the watch dir holds
    * TWO copies of the events file delivered as separate micro-batches
    * (maxFilesPerTrigger=1); dropDuplicatesWithinWatermark keys state
    * on event_id so the replayed copy contributes nothing — first-seen
    * rows emit, duplicates die in the dedup state while inside the
    * watermark horizon and as late data once past it (either way:
    * dropped, which is what a replayed firehose segment needs). The
    * batch-side aggregate over the sink must therefore equal the
    * single-copy batch answer.
    */
  def q63StreamDedup(s: SparkSession, dir: String): DataFrame = {
    val deduped = rawStream(s, watchDirFor(dir, 2), dir, maxFilesPerTrigger = Some(1))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    runToMemorySink(s, deduped)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(sum("value"), 2).cast("decimal(18,2)")
          .cast("double").as("total_value"))
      .orderBy("event_type")
  }

  val q63Oracle: String =
    """SELECT event_type, count(*) AS n,
      | CAST(CAST(round(sum(value), 2) AS DECIMAL(18,2)) AS DOUBLE)
      |   AS total_value
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Stream-STATIC join: the streaming fact enriched with a broadcast
    * batch dimension — the third join shape after stream-stream (q62)
    * and batch-batch. No watermark and no join state: the static side
    * is broadcast to every micro-batch's tasks, so enrichment costs a
    * map-side hash probe per row exactly as it would on a 100 TB/day
    * firehose with a dimension table that fits an executor. Events key
    * on user_id against the customer dimension; the report aggregates
    * the sink per market segment.
    */
  def q99StreamStaticJoin(s: SparkSession, dir: String): DataFrame = {
    val dim = graft.Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val enriched = rawStream(s, watchDirFor(dir, 1), dir)
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
    runToMemorySink(s, enriched)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        count_distinct(col("user_id")).as("n_users"),
        round(sum("value"), 2).cast("decimal(18,2)")
          .cast("double").as("total_value"))
      .orderBy("c_mktsegment")
  }

  val q99Oracle: String =
    """SELECT c_mktsegment, count(*) AS n,
      | count(DISTINCT user_id) AS n_users,
      | CAST(CAST(round(sum(value), 2) AS DECIMAL(18,2)) AS DOUBLE)
      |   AS total_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q62_stream_join" -> (q62StreamJoin _),
    "q63_stream_dedup" -> (q63StreamDedup _),
    "q99_stream_static_join" -> (q99StreamStaticJoin _)
  )

  def oracles: Map[String, String] = Map(
    "q62_stream_join" -> q62Oracle,
    "q63_stream_dedup" -> q63Oracle,
    "q99_stream_static_join" -> q99Oracle
  )
}
