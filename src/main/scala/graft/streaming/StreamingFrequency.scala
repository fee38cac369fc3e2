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

/** One bigint key routed to its Count-Min shard. */
final case class ShardKey(g: Int, key: Long)

/** A shard's current Count-Min grid (row-major d×w). */
final case class CmShardGrid(g: Int, total: Long, grid: Seq[Long])

/** Checkpointable Count-Min shard state. */
final case class CmState(total: Long, grid: Seq[Long])

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

  /** Streaming twin of the `count_min` aggregate
    * ([[graft.functions.CountMinAgg]]): continuous frequency sketching
    * with G·d·w bounded state. Keys shard by hash; each shard's keyed
    * state is its own d×w grid, resumed from the checkpoint per
    * micro-batch. Because every CM cell is an EXACT sum over the rows
    * that hash into it and a key's rows live in exactly one shard, the
    * elementwise sum of the shard grids equals the batch-built global
    * grid bit-for-bit at every trigger — the mergeable-summaries
    * property, witnessed across checkpointed micro-batches in
    * StreamingSpec. A live estimate for any key is then
    * `min_i Σ_g grid_g[i·w + h_i(u)]`.
    */
  def countMinStream(keys: DataFrame, d: Int, w: Int,
      shards: Int): Dataset[CmShardGrid] = {
    val spark = keys.sparkSession
    import spark.implicits._
    keys
      .select(pmod(hash(col("key")), lit(shards)).cast("int").as("g"),
        col("key"))
      .as[ShardKey]
      .groupByKey(_.g)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(updateCmShard(d, w))
  }

  private[streaming] def updateCmShard(d: Int, w: Int)(
      g: Int, batch: Iterator[ShardKey],
      state: GroupState[CmState]): Iterator[CmShardGrid] = {
    val buf = new graft.functions.CMBuffer(d, w)
    state.getOption.foreach { s0 =>
      buf.total = s0.total
      var i = 0
      while (i < buf.grid.length) { buf.grid(i) = s0.grid(i); i += 1 }
    }
    batch.foreach(k => buf.add(k.key))
    state.update(CmState(buf.total, buf.grid.toSeq))
    Iterator.single(CmShardGrid(g, buf.total, buf.grid.toSeq))
  }
}
