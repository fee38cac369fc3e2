package graft.streaming

import graft.ext.Dedup
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One doc in one LSH band bucket, with its hashed shingle set for
  * in-state verification. Hashes (64-bit xxhash64), not shingle
  * strings: state is replicated across the 16 bands a doc lands in,
  * so the per-element footprint is the multiplier on state-store and
  * checkpoint size — 8 bytes beats a shingle string. The Jaccard
  * count over hashes equals the count over strings except under a
  * cross-doc 64-bit collision (~m_a·m_b/2^64 per pair — negligible).
  */
final case class BandedDoc(band: Int, bucket: Long, doc_id: Long,
    shl: Seq[Long])

/** [[BandedDoc]] plus the doc's event time — the retention-bounded
  * variant's clock. The TIMESTAMP column itself rides through to the
  * stateful operator (not a precomputed epoch), because Spark requires
  * the watermarked attribute in the stateful operator's child output
  * to allow event-time timeouts. */
final case class BandedDocTs(band: Int, bucket: Long, doc_id: Long,
    shl: Seq[Long], ts_t: java.sql.Timestamp) {
  def tsMs: Long = ts_t.getTime
}

/** A verified near-dup pair (same contract as Dedup.jaccardPairs). */
final case class NearDupPair(a: Long, b: Long, n_common: Int,
    n_a: Int, n_b: Int)

/** Incremental near-dup dedup over an UNBOUNDED document stream — the
  * streaming twin of [[graft.ext.Dedup.minhashDedup]]: as documents
  * arrive, each is checked against everything previously seen and the
  * verified near-dup pairs are emitted immediately. This is the shape
  * of a continuous ingestion pipeline ("is this crawl batch a dup of
  * anything in the corpus?") where re-running batch dedup from scratch
  * per batch would be quadratic in corpus lifetime.
  *
  * Shape: the stateless stages are identical to the batch path (shingle
  * UDF → MinHash signatures as pure projections → band explode), then
  * `flatMapGroupsWithState` keyed on (band, bucket) holds the bucket's
  * previously-seen docs as state. A new doc is verified (exact shingle
  * Jaccard, same integer threshold as batch) against its bucket peers
  * only — candidates ∝ bucket sizes, never all-pairs, exactly like the
  * batch join.
  *
  * Semantics/caveats (all shared with any LSH dedup):
  * - A pair sharing several buckets is emitted once PER shared bucket —
  *   at-least-once pair delivery; consumers dedupe on (a, b) (the
  *   batch path's `.distinct()`; the spec collects to a set).
  * - State grows with the corpus — that is the operator's contract
  *   ("dedup against everything seen"). Production deployments bound
  *   it with a retention policy: swap NoTimeout for event-time timeout
  *   so buckets idle past the retention watermark are evicted ("dedup
  *   within N days" — the C4/CCNet regime).
  * - Pairs are ordered (min, max) so emission order never affects the
  *   pair identity.
  */
object StreamingDedup {

  /** docs: streaming DataFrame with (doc_id LONG, text STRING). Returns
    * a streaming Dataset of verified pairs (append mode). */
  def nearDupPairsStream(docs: DataFrame): Dataset[NearDupPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    banded(docs, extras = Seq("shl"))
      .select(col("band").cast("int").as("band"), col("bucket"),
        col("doc_id"), col("shl"))
      .as[BandedDoc]
      .groupByKey(d => (d.band, d.bucket))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(verifyAgainstState)
  }

  /** Retention-bounded variant — "dedup within the last N days", the
    * C4/CCNet regime that keeps state finite on an infinite stream:
    * docs carry an event-time column (already watermarked by the
    * caller), each bucket's state is kept alive `retentionMs` past its
    * newest doc's event time, and buckets idle longer are EVICTED by
    * the engine when the watermark passes (a doc arriving later simply
    * starts the bucket fresh — near-dups of evicted docs are no longer
    * reported, by design). State is bounded by stream rate × retention
    * instead of corpus lifetime.
    *
    * docs: streaming DataFrame with (doc_id LONG, text STRING,
    * <tsCol> TIMESTAMP) and `withWatermark(tsCol, ...)` applied.
    */
  def nearDupPairsStreamWithRetention(docs: DataFrame, tsCol: String,
      retentionMs: Long): Dataset[NearDupPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    banded(docs.withColumn("ts_t", col(tsCol)),
        extras = Seq("shl", "ts_t"))
      .select(col("band").cast("int").as("band"), col("bucket"),
        col("doc_id"), col("shl"), col("ts_t"))
      .as[BandedDocTs]
      .groupByKey(d => (d.band, d.bucket))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        verifyWithRetention(retentionMs))
  }

  /** Retention verify: a pair is reported iff the two docs' event
    * times are within `retentionMs` of each other — enforced in the
    * PREDICATE, not via state timeout, because timeouts only fire for
    * groups receiving NO data in a batch: a bucket whose expired state
    * meets a new arrival in the same batch would otherwise resurrect
    * pairs past retention (batch-boundary-dependent results). The
    * event-time timeout is only garbage collection for idle buckets;
    * storage is additionally pruned to the newest arrival's retention
    * window on every invocation.
    */
  private[streaming] def verifyWithRetention(retentionMs: Long)(
      key: (Int, Long), rows: Iterator[BandedDocTs],
      state: GroupState[Seq[BandedDocTs]]): Iterator[NearDupPair] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val fresh = rows.toArray.sortBy(_.doc_id)
    if (fresh.isEmpty) return Iterator.empty
    val newest = fresh.map(_.tsMs).max
    var seen = state.getOption.getOrElse(Seq.empty).toVector
      .filter(_.tsMs >= newest - retentionMs)
    val out = Vector.newBuilder[NearDupPair]
    fresh.foreach { d =>
      val dSet = d.shl.toSet
      seen.foreach { s =>
        if (s.doc_id != d.doc_id &&
            math.abs(d.tsMs - s.tsMs) <= retentionMs) {
          val common = s.shl.count(dSet.contains)
          if (common * 3 >= d.shl.size + s.shl.size) {
            out += (if (s.doc_id < d.doc_id)
              NearDupPair(s.doc_id, d.doc_id, common, s.shl.size, d.shl.size)
            else
              NearDupPair(d.doc_id, s.doc_id, common, d.shl.size, s.shl.size))
          }
        }
      }
      seen = seen :+ d
    }
    state.update(seen)
    // idle-bucket GC: evict once the watermark passes the newest doc's
    // retention window (must stay ahead of the current watermark or
    // Spark rejects the timestamp)
    state.setTimeoutTimestamp(
      math.max(newest + retentionMs, state.getCurrentWatermarkMs() + 1))
    out.result().iterator
  }

  /** Shared stateless prefix: shingles → MinHash signatures → 64-bit
    * shingle hashes → band explode. `extras` columns ride through to
    * the banded rows. */
  private def banded(docs: DataFrame, extras: Seq[String]): DataFrame = {
    val sigs = Dedup.minhashSignatures(Dedup.shingleSets(docs))
      .withColumn("shl", transform(col("shs"), sh => xxhash64(sh)))
    Dedup.bandBuckets(sigs, extras = extras)
  }

  /** Verify each newly arrived doc against the bucket's seen docs (and
    * the earlier arrivals of the same batch), emit passing pairs, fold
    * the arrivals into state. Deterministic: arrivals processed in
    * doc_id order. */
  private[streaming] def verifyAgainstState(
      key: (Int, Long), rows: Iterator[BandedDoc],
      state: GroupState[Seq[BandedDoc]]): Iterator[NearDupPair] = {
    // state-timeout invocations deliver an empty iterator; with
    // NoTimeout this is just a safe no-op
    val fresh = rows.toArray.sortBy(_.doc_id)
    if (fresh.isEmpty) return Iterator.empty
    var seen = state.getOption.getOrElse(Seq.empty).toVector
    val out = Vector.newBuilder[NearDupPair]
    fresh.foreach { d =>
      val dSet = d.shl.toSet
      seen.foreach { s =>
        if (s.doc_id != d.doc_id) {
          val common = s.shl.count(dSet.contains)
          // integer threshold: 3*common >= nA+nB  ⟺  J >= 0.5 — the
          // exact predicate of the batch verify join
          if (common * 3 >= d.shl.size + s.shl.size) {
            // (a, b) ordered by id; n_a/n_b follow the same order
            out += (if (s.doc_id < d.doc_id)
              NearDupPair(s.doc_id, d.doc_id, common, s.shl.size, d.shl.size)
            else
              NearDupPair(d.doc_id, s.doc_id, common, d.shl.size, s.shl.size))
          }
        }
      }
      seen = seen :+ d
    }
    state.update(seen)
    out.result().iterator
  }
}
