package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One term routed to its counter shard. */
final case class ShardTerm(g: Int, term: String)

/** A shard's current frequent-items summary: exact element total plus
  * the ≤ m Misra–Gries candidate keys. */
final case class HhShardSummary(g: Int, total: Long, cands: Seq[String])

/** Checkpointable MG shard state (the counters, not just the keys). */
final case class MgState(total: Long, counts: Map[String, Long])

/** Streaming twin of the `heavy_hitters` MG pass
  * ([[graft.ext.Corpus.heavyHittersOfTerms]]): continuous frequent-items
  * tracking over an unbounded term stream with BOUNDED state — G shards
  * × m counters, regardless of how many distinct keys flow past.
  *
  * Terms shard by hash so one hot shard never serializes the stream;
  * each shard's keyed state is its own Misra–Gries buffer, resumed from
  * the checkpoint every micro-batch (incremental MG: seeding a buffer
  * with its saved counters and continuing IS the same fold). Every
  * trigger, an updated shard emits its current (total, candidates)
  * summary.
  *
  * Guarantee carried over from the batch aggregate: within a shard, any
  * key with shard-frequency > shardTotal/(m+1) holds a counter. A key
  * lives in exactly ONE shard and shardTotal ≤ streamTotal, so the
  * UNION of shard candidates is a superset of every key with global
  * frequency > streamTotal/(m+1) — the same superset contract the batch
  * recount filters to exactness with, here available continuously
  * ("which keys are trending" on a live event stream, or the hot-key
  * feed a salted join refreshes its salt list from). StreamingSpec pins
  * the guarantee across micro-batches, with every batch-2 counter
  * update made against checkpointed state.
  */
object StreamingFrequency {

  def heavyHittersStream(terms: DataFrame, m: Int,
      shards: Int): Dataset[HhShardSummary] = {
    val spark = terms.sparkSession
    import spark.implicits._
    terms
      .select(pmod(hash(col("term")), lit(shards)).cast("int").as("g"),
        col("term"))
      .as[ShardTerm]
      .groupByKey(_.g)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(updateShard(m))
  }

  private[streaming] def updateShard(m: Int)(
      g: Int, batch: Iterator[ShardTerm],
      state: GroupState[MgState]): Iterator[HhShardSummary] = {
    val buf = new graft.functions.MGBuffer(m)
    state.getOption.foreach { s0 =>
      buf.total = s0.total
      s0.counts.foreach { case (k, c) => buf.addCount(k, c) }
    }
    batch.foreach(t => buf.add(t.term))
    state.update(MgState(buf.total, buf.counts.toMap))
    Iterator.single(HhShardSummary(g, buf.total,
      buf.counts.keys.toSeq.sorted))
  }
}
