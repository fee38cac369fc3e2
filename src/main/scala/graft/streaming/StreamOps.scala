package graft.streaming

import graft.{QueryDef, Tables, Work}
import graft.connector.LogStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** One event from the `events` table as carried through the log store.
  * `ts` is epoch nanoseconds (the parquet column is TIMESTAMP(NANOS),
  * read as long — see Verify session config).
  */
final case class Ev(event_id: Long, ts: Long, user_id: Long,
    event_type: String, value: Double, props: String)

final case class SessionSummary(user_id: Long, n_events: Long,
    n_sessions: Long, first_ts: Long, last_ts: Long)

/** Stream-store operators: the reference's Pravega sink/scan pair
  * (stream_sink_json / stream_scan_bounded, SURVEY.md §2.1 #3/#4) plus
  * the Structured Streaming surface (windows, watermarks, stateful
  * sessionization) the engine exposes beyond the reference's
  * bounded-only usage (SURVEY.md §2.3 "Streaming" row).
  */
object StreamOps {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private val dec = DecimalType(18, 2)
  private val outDec = DecimalType(38, 4)

  /** Write events into a log stream as JSON and read them back bounded —
    * the datagen→train transport of the reference (processor.py:67-114)
    * with `events` standing in for the iris rows.
    */
  val roundtrip = QueryDef(
    "stream_roundtrip",
    (s, dir) => {
      val base = s"${Work.dir}/log_roundtrip"
      Work.clean(base)
      val store = LogStore(base)
      store.append(Tables(s, dir, "events"), "scope", "events-stream")
      // ts exposed at microsecond granularity: DuckDB truncates nanos
      // parquet timestamps to micros on read, so the oracle can't see
      // the low 3 digits. Integer `div`, not `/` — double division
      // loses precision above 2^53 (epoch nanos are ~1.7e18).
      store.readBounded(s, "scope", "events-stream", eventSchema)
        .select(col("event_id"), expr("ts div 1000").as("ts_us"),
          col("user_id"), col("event_type"), col("value"))
    },
    Some("""
      SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
      FROM events"""))

  /** Structured Streaming from the log store: event-time tumbling window
    * (5 min) + watermark, complete-mode memory sink, AvailableNow trigger
    * (the unified batch-on-streaming posture of the reference's
    * FlinkStreamEnv, processor.py:36).
    * Scale: the only shuffle is on (window, event_type); state is bounded
    * by watermark eviction on a real cluster.
    */
  val windowAgg = QueryDef(
    "stream_window_agg",
    (s, dir) => {
      val base = s"${Work.dir}/log_window"
      Work.clean(base)
      val store = LogStore(base)
      store.append(Tables(s, dir, "events"), "scope", "events-stream")
      val src = store.readStream(s, "scope", "events-stream", eventSchema)
        .withColumn("ts_t", timestamp_micros(expr("ts div 1000")))
        .withWatermark("ts_t", "10 minutes")
        .groupBy(window(col("ts_t"), "300 seconds"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(dec)).cast(outDec).as("sum_value"))
        .select(col("window.start").cast(LongType).as("win_start"),
          col("event_type"), col("n"), col("sum_value"))
      val q = src.writeStream
        .format("memory").queryName("graft_stream_window_agg")
        .outputMode("complete")
        .option("checkpointLocation", s"$base/checkpoint")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table("graft_stream_window_agg")
    },
    Some("""
      SELECT (epoch_ns(ts) // 1000 // 1000000 // 300) * 300 AS win_start,
             event_type, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS sum_value
      FROM events
      GROUP BY 1, 2"""))

  /** Sessionize a group's events: sorted by (ts, event_id), a gap larger
    * than `gapNs` starts a new session. Shared by the batch query and the
    * streaming mapGroupsWithState twin (StreamingSpec).
    */
  def summarize(userId: Long, events: Iterator[Ev],
      gapNs: Long): SessionSummary = {
    val sorted = events.toArray.sortBy(e => (e.ts, e.event_id))
    var sessions = 0
    var prev = Long.MinValue
    sorted.foreach { e =>
      if (prev == Long.MinValue || e.ts - prev > gapNs) sessions += 1
      prev = e.ts
    }
    SessionSummary(userId, sorted.length.toLong, sessions.toLong,
      sorted.head.ts, sorted.last.ts)
  }

  val sessionGapNs: Long = 3600L * 1000 * 1000 * 1000 // 1 hour
  val sessionGapUs: Long = 3600L * 1000 * 1000

  /** Per-user session counts over event time via the typed
    * KeyValueGroupedDataset surface — the batch face of the stateful
    * operator (streaming face: mapGroupsWithState, see StreamingSpec).
    * Scale: one shuffle on user_id; per-group work is O(events-per-user
    * log n) locally, no driver involvement.
    */
  val sessionize = QueryDef(
    "stream_sessionize",
    (s, dir) => {
      val sp = s
      import sp.implicits._
      // Micros on both sides — DuckDB truncates nanos parquet
      // timestamps to micros, so session math runs at micro grain.
      Tables(s, dir, "events").as[Ev]
        .map(e => e.copy(ts = e.ts / 1000))
        .groupByKey(_.user_id)
        .mapGroups((uid, it) => summarize(uid, it, sessionGapUs))
        .toDF()
    },
    Some("""
      WITH x AS (
        SELECT user_id, event_id, epoch_us(ts) AS tsu,
               lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                       ORDER BY epoch_us(ts), event_id) AS prev
        FROM events)
      SELECT user_id, count(*) AS n_events,
             count(CASE WHEN prev IS NULL OR tsu - prev > 3600000000
                        THEN 1 END) AS n_sessions,
             min(tsu) AS first_ts, max(tsu) AS last_ts
      FROM x GROUP BY user_id"""))

  /** Identity pass-through — the reference's user_define_operation that
    * returns its input unchanged (processor.py:62-64). */
  val identity = QueryDef(
    "identity_project",
    (s, dir) => Tables(s, dir, "documents").select("*"),
    Some("SELECT * FROM documents"))

  val all: Seq[QueryDef] = Seq(roundtrip, windowAgg, sessionize, identity)
}
