package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — each left row matched to the latest right row with
  * `right.ts <= left.ts` per key (the time-series enrichment join the
  * builder brief names as an operator Spark lacks). Built by
  * composition, the brief's preferred order: tag and union both sides,
  * then one `last(..., ignoreNulls)` window ordered by (ts, tag) — a
  * single shuffle on the key, no custom physical operator needed.
  * Rights sort before lefts at equal ts, so an exactly-simultaneous
  * snapshot IS visible (<= semantics, matching DuckDB's ASOF JOIN,
  * which is the independent oracle implementation).
  * Scale: one shuffle + one spill-able sort per side — the same cost
  * class as any window; no n×m inequality join.
  */
object AsofJoin {

  /** @param left      any frame with `key` and `ts` columns
    * @param right     frame with `key`, `ts`, `value` (unique (key,ts))
    * @param out       name of the as-of value column in the result
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      value: String, out: String): DataFrame = {
    val vType = right.schema(value).dataType
    val l = left
      .withColumn("__tag", lit(1))
      .withColumn("__v", lit(null).cast(vType))
    val r = right
      .select(col(key), col(ts), col(value).as("__v"))
      .withColumn("__tag", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the carried value is boxed in a struct so a right row whose VALUE
    // is null still registers as "a snapshot exists" — last(ignoreNulls)
    // skips only left rows, not null-valued snapshots (ASOF semantics:
    // the latest snapshot wins even if its value is null)
    unioned
      .withColumn("__boxed",
        last(when(col("__tag") === 0, struct(col("__v"))),
          ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .withColumn(out, col("__boxed.__v"))
      .drop("__tag", "__v", "__boxed")
  }

  /** Driver-verified witness: every event enriched with the value of
    * the user's latest snapshot event (every 20th event id) at or
    * before its timestamp; NULL before the first snapshot. The oracle
    * is DuckDB's native ASOF LEFT JOIN — an independent implementation
    * of the same semantics.
    */
  val asofEnrich = QueryDef(
    "asof_join",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          expr("ts div 1000").as("tsu"), col("value"))
      // snapshots, deduped to one row per (user, ts): max event_id wins
      val rnW = Window.partitionBy("user_id", "tsu")
        .orderBy(col("event_id").desc)
      val snaps = ev.filter(col("event_id") % 20 === 0)
        .withColumn("rn", row_number().over(rnW))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("tsu"), col("value"))
      asofJoin(ev.drop("value"), snaps, "user_id", "tsu", "value",
        "snap_value")
    },
    Some("""
      WITH snap AS (
        SELECT user_id, epoch_us(ts) AS tsu, "value", event_id,
               row_number() OVER (PARTITION BY user_id, epoch_us(ts)
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_id % 20 = 0),
      snap1 AS (SELECT user_id, tsu, "value" FROM snap WHERE rn = 1),
      ev AS (SELECT event_id, user_id, epoch_us(ts) AS tsu FROM events)
      SELECT e.event_id, e.user_id, e.tsu, s."value" AS snap_value
      FROM ev e ASOF LEFT JOIN snap1 s
        ON e.user_id = s.user_id AND e.tsu >= s.tsu"""))

  /** FORWARD as-of join — each left row matched to the EARLIEST right
    * row with `right.ts >= left.ts` per key: the label-alignment
    * direction (next tick after an order, next conversion after an
    * impression, next sensor reading after a fault), where
    * [[asofJoin]] is the enrichment direction. Same one-shuffle
    * composition mirrored: union both sides, one `first(...,
    * ignoreNulls)` window over (currentRow, unboundedFollowing). At
    * equal ts, LEFTS sort before rights (tag desc) so a simultaneous
    * right IS visible — `>=` semantics, matching DuckDB's forward
    * ASOF JOIN, the independent oracle implementation.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
      ts: String, value: String, out: String): DataFrame = {
    val vType = right.schema(value).dataType
    val l = left
      .withColumn("__tag", lit(1))
      .withColumn("__v", lit(null).cast(vType))
    val r = right
      .select(col(key), col(ts), col(value).as("__v"))
      .withColumn("__tag", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("__tag").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // boxed for the same null-valued-snapshot reason as [[asofJoin]]
    unioned
      .withColumn("__boxed",
        first(when(col("__tag") === 0, struct(col("__v"))),
          ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .withColumn(out, col("__boxed.__v"))
      .drop("__tag", "__v", "__boxed")
  }

  /** Forward witness — the mirror of [[asofEnrich]]: every event
    * carries the value of the user's NEXT snapshot at or after its
    * timestamp; NULL after the last snapshot. */
  val asofEnrichForward = QueryDef(
    "asof_join_forward",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          expr("ts div 1000").as("tsu"), col("value"))
      // same snapshot dedup as the backward witness: max event_id wins
      val rnW = Window.partitionBy("user_id", "tsu")
        .orderBy(col("event_id").desc)
      val snaps = ev.filter(col("event_id") % 20 === 0)
        .withColumn("rn", row_number().over(rnW))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("tsu"), col("value"))
      asofJoinForward(ev.drop("value"), snaps, "user_id", "tsu", "value",
        "snap_value")
    },
    Some("""
      WITH snap AS (
        SELECT user_id, epoch_us(ts) AS tsu, "value", event_id,
               row_number() OVER (PARTITION BY user_id, epoch_us(ts)
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_id % 20 = 0),
      snap1 AS (SELECT user_id, tsu, "value" FROM snap WHERE rn = 1),
      ev AS (SELECT event_id, user_id, epoch_us(ts) AS tsu FROM events)
      SELECT e.event_id, e.user_id, e.tsu, s."value" AS snap_value
      FROM ev e ASOF LEFT JOIN snap1 s
        ON e.user_id = s.user_id AND e.tsu <= s.tsu"""))

  val all: Seq[QueryDef] = Seq(asofEnrich, asofEnrichForward)
}
