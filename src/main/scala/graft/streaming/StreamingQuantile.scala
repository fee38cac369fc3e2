package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One bucketed observation routed to its event-time window. */
final case class WinBucket(win_start: Long, b: Long)

/** [[WinBucket]] plus the watermarked timestamp — the event-time
  * timeout requires the watermark-tagged column to survive into the
  * stateful operator's input (a cast of `window.start` strips the
  * tag), so the stream variant carries it alongside the key. */
final case class WinBucketW(win_start: Long, b: Long,
    ts_t: java.sql.Timestamp)

/** A window's current bucket-exact quantile row. `n` — the window's
  * total observation count at emission — is monotone per window across
  * triggers, so "latest rows" are selectable from an Update-mode sink
  * without relying on sink ordering. */
final case class WinQuantile(win_start: Long, qtile: String,
    krank: Long, val_floor: Long, n: Long)

/** Checkpointable per-window histogram (bucket → count). */
final case class HistState(counts: Map[Long, Long])

/** Streaming twin of [[StreamOps.windowQuantileOf]]: continuous
  * bucket-exact order statistics per event-time window with BOUNDED
  * state — one histogram per window still inside the watermark
  * horizon, #non-empty buckets entries each (domain-bounded, like the
  * batch plan's post-shuffle cardinality), regardless of how many rows
  * flow past.
  *
  * Keyed state is the window's bucket histogram, resumed from the
  * checkpoint each micro-batch (histograms are mergeable summaries:
  * seeding with saved counts and continuing IS the same fold — the
  * same incremental-summary argument as the Misra–Gries twin). Every
  * trigger an updated window re-emits its current p25/p50/p75 rows;
  * after all data, the latest rows per window equal the batch operator
  * exactly (StreamingSpec pins this across a mid-stream split).
  *
  * State lifecycle (round-9 advice: the old NoTimeout form kept one
  * histogram per window EVER OPENED — unbounded on a long-running
  * stream): the input is watermarked by `lateness`, and each window's
  * state carries an event-time timeout at its window end; once the
  * watermark (max event time − lateness) passes the end, the
  * histogram is dropped. So live state = windows covering the last
  * `lateness` of event time, a fixed horizon. Data later than the
  * watermark for an already-evicted window is best-effort: it reopens
  * a partial histogram (emitting recount-from-late-rows quantiles)
  * that is evicted again next trigger — the standard watermark
  * contract, same as the windowed-aggregate twins; keep cross-batch
  * disorder under `lateness` for exact stream==batch equality.
  */
object StreamingQuantile {

  /** Window length (seconds) — fixed, shared with the timeout math. */
  private val WindowSec = 300L

  def windowQuantileStream(events: DataFrame,
      bucketWidth: Long = StreamOps.QuantileBucket,
      lateness: String = "10 minutes"): Dataset[WinQuantile] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("ts_t", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts_t", lateness)
      .select(window(col("ts_t"), s"$WindowSec seconds").as("w"),
        expr(s"CAST(round(value * 100) AS BIGINT) div $bucketWidth").as("b"),
        col("ts_t"))
      .select(col("w.start").cast("long").as("win_start"), col("b"),
        col("ts_t"))
      .as[WinBucketW]
      .groupByKey(_.win_start)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout)(updateWindow(bucketWidth))
  }

  private[streaming] def updateWindow(bucketWidth: Long)(
      win: Long, batch: Iterator[WinBucketW],
      state: GroupState[HistState]): Iterator[WinQuantile] = {
    if (state.hasTimedOut) {
      // watermark passed the window end: no more in-contract data can
      // arrive — drop the histogram, emit nothing (final rows already
      // left in update mode)
      state.remove()
      Iterator.empty
    } else {
      val counts = scala.collection.mutable.Map.empty[Long, Long]
      state.getOption.foreach(_.counts.foreach { case (b, c) =>
        counts(b) = c })
      batch.foreach(wb => counts(wb.b) = counts.getOrElse(wb.b, 0L) + 1L)
      state.update(HistState(counts.toMap))
      // evict when the watermark clears the window end; a late reopen
      // (end already behind the watermark) gets watermark+1 — evicted
      // at the very next trigger
      state.setTimeoutTimestamp(math.max((win + WindowSec) * 1000L,
        state.getCurrentWatermarkMs() + 1L))
      quantilesOf(win, counts.toMap, bucketWidth).iterator
    }
  }

  /** The same cumulative-walk arithmetic as the batch plan, over one
    * window's histogram. */
  private[streaming] def quantilesOf(win: Long,
      counts: Map[Long, Long],
      bucketWidth: Long = StreamOps.QuantileBucket): Seq[WinQuantile] = {
    val hist = counts.toSeq.sortBy(_._1)
    val n = hist.map(_._2).sum
    val targets = Seq(("p25", (n + 3) / 4), ("p50", (n + 1) / 2),
      ("p75", (3 * n + 3) / 4))
    targets.map { case (name, k) =>
      var cum = 0L
      val bkt = hist.collectFirst {
        case (b, cnt) if { cum += cnt; cum >= k } => b
      }.getOrElse(sys.error(s"rank $k beyond histogram total $n"))
      WinQuantile(win, name, k, bkt * bucketWidth, n)
    }
  }
}
