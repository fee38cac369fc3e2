package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ordered-sequence funnel over the event stream — the
  * view → click → purchase progression per user, the event-analytics
  * staple (ClickHouse windowFunnel / Flink CEP's simplest pattern,
  * public literature). A user advances a stage only with an event
  * STRICTLY LATER than their previous stage's completion, so the
  * output is the per-user stage-completion timestamp chain (nulls
  * where the funnel stalled).
  *
  * Determinism: timestamps are epoch-nanos BIGINT and every stage is a
  * min() over an equi-join restriction — integer mins are
  * order-independent, so the chain replays hash-exact in SQL.
  *
  * 100 TB shape: three map-side-combined min-aggregations and three
  * equi-joins, ALL keyed on user_id — co-partitioning the event log by
  * user makes the whole funnel shuffle-once; each stage's frame only
  * shrinks (users who reached that stage). No window over the raw
  * events, no per-user sort: the CEP-style alternative (collect +
  * per-user ordered scan) sorts every user's history to answer the
  * same three mins.
  */
object Funnel {

  val Stages = Seq("view", "click", "purchase")

  def funnelOf(events: DataFrame): DataFrame = {
    val ev = events.select(col("user_id"), col("event_type"), col("ts"))
    val a = ev.filter(col("event_type") === Stages(0))
      .groupBy("user_id").agg(min("ts").as("t_view"))
    val b = ev.filter(col("event_type") === Stages(1))
      .join(a, "user_id")
      .filter(col("ts") > col("t_view"))
      .groupBy("user_id").agg(min("ts").as("t_click"))
    val c = ev.filter(col("event_type") === Stages(2))
      .join(b, "user_id")
      .filter(col("ts") > col("t_click"))
      .groupBy("user_id").agg(min("ts").as("t_purchase"))
    a.join(b, Seq("user_id"), "left")
      .join(c, Seq("user_id"), "left")
      .select(col("user_id"), col("t_view"), col("t_click"),
        col("t_purchase"))
  }

  val funnelQuery = QueryDef(
    "event_funnel",
    (s, dir) => funnelOf(Tables(s, dir, "events")),
    Some("""
      WITH ev AS (SELECT user_id, event_type, epoch_ns(ts) AS ts
                  FROM events),
           a AS (SELECT user_id, min(ts) AS t_view
                 FROM ev WHERE event_type = 'view' GROUP BY user_id),
           b AS (SELECT ev.user_id, min(ts) AS t_click
                 FROM ev JOIN a USING (user_id)
                 WHERE event_type = 'click' AND ts > t_view
                 GROUP BY ev.user_id),
           c AS (SELECT ev.user_id, min(ts) AS t_purchase
                 FROM ev JOIN b USING (user_id)
                 WHERE event_type = 'purchase' AND ts > t_click
                 GROUP BY ev.user_id)
      SELECT a.user_id, t_view, t_click, t_purchase
      FROM a
      LEFT JOIN b ON a.user_id = b.user_id
      LEFT JOIN c ON a.user_id = c.user_id"""))

  // --- cohort retention ----------------------------------------------

  val WeekNs = 7L * 86400 * 1000000000L

  /** Cohort retention triangle — the other event-analytics staple:
    * bucket each user into the week of their FIRST event (the cohort),
    * then count, for every (cohort_week, week_offset), how many of
    * that cohort had any activity offset weeks later. All arithmetic
    * is integer epoch-nanos floor-division into week buckets (both
    * engines share the div — timestamps are non-negative), so the
    * triangle replays hash-exact.
    *
    * Shape: one min-aggregation for cohorts, one distinct over
    * (user, week) — both map-side combined and keyed on user — then a
    * user-keyed equi-join and a (cohort, offset)-keyed count. At
    * scale: co-partition by user; the final count's group space is
    * weeks², metadata-sized.
    */
  def retentionOf(events: DataFrame): DataFrame = {
    val weeks = events.select(col("user_id"),
      expr(s"ts div $WeekNs").as("wk"))
    val cohort = weeks.groupBy("user_id").agg(min("wk").as("cohort_wk"))
    val active = weeks.distinct()
    active.join(cohort, "user_id")
      .groupBy(col("cohort_wk"),
        (col("wk") - col("cohort_wk")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  val retentionQuery = QueryDef(
    "event_retention_cohorts",
    (s, dir) => retentionOf(Tables(s, dir, "events")),
    Some(s"""
      WITH w AS (SELECT user_id, epoch_ns(ts) // ${WeekNs} AS wk
                 FROM events),
           cohort AS (SELECT user_id, min(wk) AS cohort_wk
                      FROM w GROUP BY user_id),
           active AS (SELECT DISTINCT user_id, wk FROM w)
      SELECT cohort_wk, wk - cohort_wk AS week_offset,
             count(*) AS n_users
      FROM active JOIN cohort USING (user_id)
      GROUP BY 1, 2"""))

  /** First-order transition counts — the empirical Markov matrix over
    * per-user event sequences (the "what happens after a click"
    * question; also the statistic sequence-model pretraining data gets
    * audited with). Events order by (ts, event_id) — a TOTAL,
    * engine-shared order, so ties cannot flip a transition between
    * engines.
    *
    * Shape: ONE shuffle — the per-user lead() window — then a
    * map-side-combined count on the (from, to) pairs (group space =
    * |event_type|², metadata). The window sorts each user's history;
    * a skewed user degrades to a spill-able sort, and the funnel/
    * retention operators above show the windowless alternative when
    * the question reduces to mins.
    */
  def transitionsOf(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events.select(col("user_id"), col("event_id"), col("ts"),
      col("event_type").as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
  }

  val transitionsQuery = QueryDef(
    "event_transitions",
    (s, dir) => transitionsOf(Tables(s, dir, "events")),
    Some("""
      WITH seq AS (SELECT user_id, event_type AS from_type,
                          lead(event_type) OVER (PARTITION BY user_id
                            ORDER BY epoch_ns(ts), event_id) AS to_type
                   FROM events)
      SELECT from_type, to_type, count(*) AS n
      FROM seq WHERE to_type IS NOT NULL
      GROUP BY 1, 2"""))

  /** Last-touch attribution with a lookback window — every purchase is
    * credited to the user's most recent click STRICTLY before it and at
    * most 30 minutes old; otherwise it is organic (NULL click). The
    * marketing-analytics staple next to the funnel (which asks "did the
    * user progress", where attribution asks "which touch gets the
    * credit").
    *
    * Built as the asof-join composition ([[AsofJoin]]) with a bound
    * check instead of an inequality join: tag clicks and purchases,
    * union, ONE window per user ordered by (ts_us, tag, event_id) with
    * purchases sorting BEFORE same-instant clicks (strict-precedence),
    * carry the last click as a boxed struct, then apply the 30-min
    * lookback as a per-row filter on the carried timestamp. One shuffle
    * on user_id, no range join, no per-purchase rescan — the candidate
    * set for each purchase is exactly one carried row regardless of
    * click volume, which is what makes this shape survive a 100 TB
    * click log (the interval-join form rescans every click in the
    * window per purchase).
    */
  def lastTouchOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val LookbackUs = 30L * 60 * 1000000
    val ev = events
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("ts div 1000").as("ts_us"),
        // purchases first at equal instants → same-ts clicks invisible
        when(col("event_type") === "purchase", 0).otherwise(1).as("tag"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("lastc",
        last(when(col("tag") === 1,
          struct(col("ts_us").as("cts"), col("event_id").as("cid"))),
          ignoreNulls = true).over(w))
      .filter(col("tag") === 0)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        when(col("lastc.cts") >= col("ts_us") - LookbackUs,
          col("lastc.cid")).as("click_id"),
        when(col("lastc.cts") >= col("ts_us") - LookbackUs,
          col("ts_us") - col("lastc.cts")).as("lag_us"))
  }

  val attributionQuery = QueryDef(
    "attribution_last_touch",
    (s, dir) => lastTouchOf(Tables(s, dir, "events")),
    Some("""
      WITH ev AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS tag
        FROM events WHERE event_type IN ('click', 'purchase')),
      w AS (
        SELECT *,
               last_value(CASE WHEN tag = 1 THEN
                   struct_pack(cts := ts_us, cid := event_id) END
                 IGNORE NULLS)
                 OVER (PARTITION BY user_id
                       ORDER BY ts_us, tag, event_id
                       ROWS UNBOUNDED PRECEDING) AS lastc
        FROM ev)
      SELECT event_id AS purchase_id, user_id,
             CASE WHEN lastc.cts >= ts_us - 1800000000
                  THEN lastc.cid END AS click_id,
             CASE WHEN lastc.cts >= ts_us - 1800000000
                  THEN ts_us - lastc.cts END AS lag_us
      FROM w WHERE tag = 0"""))

  /** Daily new-vs-returning active users — the growth-accounting
    * counterpart of the retention triangle (retention follows a cohort
    * forward; this splits each day's actives by whether the day IS the
    * user's first). Integer epoch-day arithmetic on both engines.
    *
    * Scale: first-day is a map-side-combined min per user; actives are
    * one (user, day) distinct; the classifying join is user-keyed —
    * co-partitioning the log by user makes all three share one
    * shuffle. The final day-keyed count runs on (users × active days)
    * rows, bounded by the distinct, never the raw log.
    */
  def newVsReturningOf(events: DataFrame): DataFrame = {
    val ev = events.select(col("user_id"),
      expr("(ts div 1000) div 86400000000").as("day"))
    val firstDay = ev.groupBy("user_id").agg(min("day").as("first_day"))
    ev.distinct().join(firstDay, "user_id")
      .groupBy("day")
      .agg(count(lit(1)).as("n_active"),
        sum((col("day") === col("first_day"))
          .cast("long")).as("n_new"))
      .withColumn("n_returning", col("n_active") - col("n_new"))
  }

  val newVsReturningQuery = QueryDef(
    "event_new_vs_returning",
    (s, dir) => newVsReturningOf(Tables(s, dir, "events")),
    Some("""
      WITH ev AS (
        SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
      fd AS (SELECT user_id, min(day) AS first_day FROM ev GROUP BY 1),
      act AS (SELECT DISTINCT user_id, day FROM ev)
      SELECT day, count(*) AS n_active,
             CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_new,
             count(*) - CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0
                                 END) AS BIGINT) AS n_returning
      FROM act JOIN fd USING (user_id)
      GROUP BY 1"""))

  /** Position-based (U-shaped) multi-touch attribution — the
    * many-credit complement of [[lastTouchOf]]: every click strictly
    * before a purchase and within the 6-hour lookback shares the
    * credit, 40%/40% to first/last touch and 20% split across the
    * middles (the standard position-based model). Weights are integer
    * ppm with the flooring remainder assigned to the LAST touch, so
    * each purchase's weights sum to exactly 1,000,000 — engines cannot
    * disagree on a rounding crumb.
    *
    * Unlike last-touch (one carried row per purchase), multi-touch
    * genuinely needs the purchase×click pairs — the interval join is
    * bounded by TIME-BUCKET equi-keys: each purchase probes its own
    * lookback-sized bucket and the previous one (the [[RangeJoin]] grid trick
    * on the time axis), so candidates are clicks-in-two-buckets per
    * purchase, never the user's full click history. The per-purchase
    * rank window then runs on lookback-bounded groups.
    */
  def multiTouchOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // 6 h (vs last-touch's 30 min): at the testdata's event density a
    // 30-min window yields almost no multi-click paths, and the model's
    // interesting arithmetic IS the n>=3 split
    val LookbackUs = 6L * 3600 * 1000000
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        expr("ts div 1000").as("cts"),
        expr(s"(ts div 1000) div $LookbackUs").as("bkt"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        expr("ts div 1000").as("pts"))
      .select(col("*"),
        explode(array(expr(s"pts div $LookbackUs - 1"),
          expr(s"pts div $LookbackUs"))).as("bkt"))
    val cand = purchases.join(clicks, Seq("user_id", "bkt"))
      .filter(col("cts") < col("pts") &&
        col("cts") >= col("pts") - LookbackUs)
    val w = Window.partitionBy("purchase_id")
      .orderBy(col("cts"), col("click_id"))
    cand
      .withColumn("touch_rank", row_number().over(w))
      .withColumn("n_touches",
        count(lit(1)).over(Window.partitionBy("purchase_id")))
      .select(col("purchase_id"), col("user_id"), col("click_id"),
        col("touch_rank").cast("int").as("touch_rank"),
        col("n_touches"),
        expr("""CASE
            WHEN n_touches = 1 THEN 1000000
            WHEN n_touches = 2 THEN 500000
            WHEN touch_rank = 1 THEN 400000
            WHEN touch_rank = n_touches THEN
              1000000 - 400000 - 400000
                - (n_touches - 2) * (200000 div (n_touches - 2))
                + 400000
            ELSE 200000 div (n_touches - 2)
          END""").cast("long").as("weight_ppm"))
  }

  val multiTouchQuery = QueryDef(
    "attribution_position_multi",
    (s, dir) => multiTouchOf(Tables(s, dir, "events")),
    Some("""
      WITH clicks AS (
        SELECT user_id, event_id AS click_id, epoch_us(ts) AS cts,
               epoch_us(ts) // 21600000000 AS bkt
        FROM events WHERE event_type = 'click'),
      purchases AS (
        SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS pts,
               unnest([epoch_us(ts) // 21600000000 - 1,
                       epoch_us(ts) // 21600000000]) AS bkt
        FROM events WHERE event_type = 'purchase'),
      cand AS (
        SELECT p.purchase_id, p.user_id, p.pts, c.click_id, c.cts
        FROM purchases p JOIN clicks c
          ON p.user_id = c.user_id AND p.bkt = c.bkt
        WHERE c.cts < p.pts AND c.cts >= p.pts - 21600000000),
      r AS (
        SELECT *,
               row_number() OVER (PARTITION BY purchase_id
                                  ORDER BY cts, click_id) AS touch_rank,
               count(*) OVER (PARTITION BY purchase_id) AS n_touches
        FROM cand)
      SELECT purchase_id, user_id, click_id,
             CAST(touch_rank AS INT) AS touch_rank, n_touches,
             CAST(CASE
               WHEN n_touches = 1 THEN 1000000
               WHEN n_touches = 2 THEN 500000
               WHEN touch_rank = 1 THEN 400000
               WHEN touch_rank = n_touches THEN
                 1000000 - 400000 - 400000
                   - (n_touches - 2) * (200000 // (n_touches - 2))
                   + 400000
               ELSE 200000 // (n_touches - 2)
             END AS BIGINT) AS weight_ppm
      FROM r"""))

  /** Top user journeys — the most common prefixes of user behavior:
    * each user's first 5 events (by the total (ts, event_id) key)
    * concatenated into a path string, counted, top-20 paths emitted
    * (product-analytics "top paths" / Sankey feed; the many-step
    * generalization of [[transitionsOf]]'s single step).
    *
    * Shape: the per-user rank window is the one per-user sort (same
    * cost class as transitions); the path build is a doc-sized
    * collect per user; path counting is a map-side-combined count on
    * a path-string key space bounded by |types|⁵; top-20 is
    * TakeOrderedAndProject. Determinism: rank ties cannot exist under
    * the total key, and the (n desc, path asc) final order pins the
    * limit boundary.
    */
  def topPathsOf(events: DataFrame, depth: Int = 5,
      topN: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    events.select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= depth)
      .groupBy("user_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("rn"),
          col("event_type")))), x => x.getField("event_type")),
        ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path").asc)
      .limit(topN)
  }

  val topPathsQuery = QueryDef(
    "event_top_paths",
    (s, dir) => topPathsOf(Tables(s, dir, "events")),
    Some("""
      WITH r AS (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY epoch_ns(ts), event_id) AS rn
        FROM events),
      paths AS (
        SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        FROM r WHERE rn <= 5
        GROUP BY 1)
      SELECT path, count(*) AS n_users
      FROM paths GROUP BY 1
      ORDER BY n_users DESC, path ASC
      LIMIT 20"""))

  /** Deadline-bounded funnel — the ClickHouse-windowFunnel semantic
    * proper: each stage must complete within `stepDeadlineNs` of the
    * PREVIOUS stage's completion, not just eventually ([[funnelOf]] is
    * the unbounded-patience form). Same windowless min-fold shape: the
    * deadline is one more predicate on each stage's equi-join
    * restriction, so the plan — three user-keyed min-aggregations and
    * joins — is unchanged, and a stage that misses its deadline nulls
    * the rest of the chain exactly like a stalled stage.
    */
  def funnelWindowedOf(events: DataFrame,
      stepDeadlineNs: Long): DataFrame = {
    val ev = events.select(col("user_id"), col("event_type"), col("ts"))
    val a = ev.filter(col("event_type") === Stages(0))
      .groupBy("user_id").agg(min("ts").as("t_view"))
    val b = ev.filter(col("event_type") === Stages(1))
      .join(a, "user_id")
      .filter(col("ts") > col("t_view") &&
        col("ts") <= col("t_view") + stepDeadlineNs)
      .groupBy("user_id").agg(min("ts").as("t_click"))
    val c = ev.filter(col("event_type") === Stages(2))
      .join(b, "user_id")
      .filter(col("ts") > col("t_click") &&
        col("ts") <= col("t_click") + stepDeadlineNs)
      .groupBy("user_id").agg(min("ts").as("t_purchase"))
    a.join(b, Seq("user_id"), "left")
      .join(c, Seq("user_id"), "left")
      .select(col("user_id"), col("t_view"), col("t_click"),
        col("t_purchase"))
  }

  /** 3-day per-step deadline at the testdata's event density (~11 h
    * between a user's events): tight enough that a visible fraction of
    * chains expire, loose enough that most convert — both branches
    * witnessed. */
  val FunnelDeadlineNs = 3L * 86400 * 1000000000L

  val funnelWindowedQuery = QueryDef(
    "event_funnel_windowed",
    (s, dir) => funnelWindowedOf(Tables(s, dir, "events"),
      FunnelDeadlineNs),
    Some(s"""
      WITH ev AS (SELECT user_id, event_type, epoch_ns(ts) AS ts
                  FROM events),
           a AS (SELECT user_id, min(ts) AS t_view
                 FROM ev WHERE event_type = 'view' GROUP BY user_id),
           b AS (SELECT ev.user_id, min(ts) AS t_click
                 FROM ev JOIN a USING (user_id)
                 WHERE event_type = 'click' AND ts > t_view
                   AND ts <= t_view + ${FunnelDeadlineNs}
                 GROUP BY ev.user_id),
           c AS (SELECT ev.user_id, min(ts) AS t_purchase
                 FROM ev JOIN b USING (user_id)
                 WHERE event_type = 'purchase' AND ts > t_click
                   AND ts <= t_click + ${FunnelDeadlineNs}
                 GROUP BY ev.user_id)
      SELECT a.user_id, t_view, t_click, t_purchase
      FROM a
      LEFT JOIN b ON a.user_id = b.user_id
      LEFT JOIN c ON a.user_id = c.user_id"""))

  val all: Seq[QueryDef] =
    Seq(funnelQuery, retentionQuery, transitionsQuery, attributionQuery,
      newVsReturningQuery, multiTouchQuery, topPathsQuery,
      funnelWindowedQuery)
}
