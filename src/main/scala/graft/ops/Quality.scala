package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Data-expectations audit — the declarative validation report every
  * ingestion pipeline runs before promoting a batch (Great-Expectations
  * / dbt-test semantics re-expressed as Spark aggregates): each rule
  * yields one row `(rule, n_checked, n_violations)`. The reference's
  * CSV ingestion already embodies one such rule (malformed rows dropped
  * via csv.ignore-parse-errors, processor.py:55); this generalizes the
  * idea into an auditable report instead of a silent drop.
  *
  * The testdata is constraint-clean, so a violation slice is PLANTED
  * deterministically (dup keys, null / dangling FK custkeys, negative
  * totals, out-of-domain status — both engines replay the same
  * mutations), proving the rules actually fire; one FK rule stays
  * zero-violation to witness the clean case.
  *
  * Shape at 100 TB: all row-local rules for a table fold into ONE
  * conditional aggregate — a single scan with map-side combine and a
  * one-row result regardless of input size; uniqueness piggybacks the
  * same pass as count − count(distinct). The two referential rules are
  * left-anti equi-joins (the key-side table collapses to its distinct
  * keys first; AQE broadcasts dimension-sized sides). Nothing here is
  * per-rule-per-scan — adding a row-local rule costs one more column in
  * the aggregate, not another pass over the fact table.
  */
object Quality {

  val expectations = QueryDef(
    "quality_expectations",
    (s, dir) => {
      val orders = Tables(s, dir, "orders")
      val li = Tables(s, dir, "lineitem")
      val cust = Tables(s, dir, "customer")
      // planted violation slice: every 500th order re-appended mutated
      val bad = orders.filter(col("o_orderkey") % 500 === 0).select(
        col("o_orderkey"),
        when(col("o_orderkey") % 1000 === 0, lit(null))
          .otherwise(col("o_custkey") + 1000000000L).as("o_custkey"),
        lit("X").as("o_orderstatus"),
        (-col("o_totalprice")).as("o_totalprice"),
        col("o_orderdate"), col("o_orderpriority"))
      val o2 = orders.unionByName(bad)
      val oAgg = o2.agg(
        count(lit(1)).as("n_o"),
        countDistinct(col("o_orderkey")).as("n_ok"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("v_null"),
        sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("v_price"),
        sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L)
          .otherwise(0L)).as("v_status"))
      val liAgg = li.agg(
        count(lit(1)).as("n_li"),
        sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1L)
          .otherwise(0L)).as("v_disc"),
        sum(when(col("l_quantity") <= 0, 1L).otherwise(0L)).as("v_qty"))
      val fkO = o2.filter(col("o_custkey").isNotNull)
        .join(cust, col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("v_fk_o"))
      val fkL = li
        // no .distinct() on the anti-join's right side (r20): LEFT ANTI
        // is set-wise on the left regardless of right multiplicity, and
        // the distinct only added an aggregate exchange
        .join(o2.select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("v_fk_l"))
      oAgg.crossJoin(broadcast(liAgg)).crossJoin(broadcast(fkO))
        .crossJoin(broadcast(fkL))
        .selectExpr(
          """stack(8,
            'orders_orderkey_unique',      n_o,          n_o - n_ok,
            'orders_custkey_not_null',     n_o,          v_null,
            'orders_totalprice_positive',  n_o,          v_price,
            'orders_status_domain',        n_o,          v_status,
            'orders_custkey_fk_customer',  n_o - v_null, v_fk_o,
            'lineitem_orderkey_fk_orders', n_li,         v_fk_l,
            'lineitem_discount_range',     n_li,         v_disc,
            'lineitem_quantity_positive',  n_li,         v_qty)
            AS (rule, n_checked, n_violations)""")
    },
    Some("""
      WITH bad AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 1000 = 0 THEN NULL
                    ELSE o_custkey + 1000000000 END AS o_custkey,
               'X' AS o_orderstatus,
               -o_totalprice AS o_totalprice,
               o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey % 500 = 0),
      o2 AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority FROM orders
        UNION ALL SELECT * FROM bad),
      oa AS (
        SELECT count(*) AS n_o,
               count(DISTINCT o_orderkey) AS n_ok,
               CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_null,
               CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_price,
               CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                        THEN 1 ELSE 0 END) AS BIGINT) AS v_status
        FROM o2),
      la AS (
        SELECT count(*) AS n_li,
               CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS v_disc,
               CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_qty
        FROM lineitem),
      fko AS (
        SELECT count(*) AS v_fk_o FROM o2
        WHERE o_custkey IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM customer
                          WHERE c_custkey = o_custkey)),
      fkl AS (
        SELECT count(*) AS v_fk_l FROM lineitem
        WHERE NOT EXISTS (SELECT 1 FROM o2
                          WHERE o_orderkey = l_orderkey))
      SELECT rule, n_checked, n_violations FROM (
        SELECT 'orders_orderkey_unique' AS rule, n_o AS n_checked,
               n_o - n_ok AS n_violations FROM oa
        UNION ALL SELECT 'orders_custkey_not_null', n_o,
               v_null FROM oa
        UNION ALL SELECT 'orders_totalprice_positive', n_o,
               v_price FROM oa
        UNION ALL SELECT 'orders_status_domain', n_o,
               v_status FROM oa
        UNION ALL SELECT 'orders_custkey_fk_customer', n_o - v_null,
               (SELECT v_fk_o FROM fko) FROM oa
        UNION ALL SELECT 'lineitem_orderkey_fk_orders', n_li,
               (SELECT v_fk_l FROM fkl) FROM la
        UNION ALL SELECT 'lineitem_discount_range', n_li,
               v_disc FROM la
        UNION ALL SELECT 'lineitem_quantity_positive', n_li,
               v_qty FROM la)"""))

  /** Two-sample Kolmogorov–Smirnov drift gate — the distribution-QA
    * check an LLM-data pipeline runs when a new crawl slice lands:
    * does the per-document token-count distribution of the slice
    * (doc_id % 7 = 0, the stand-in "new source") match the reference
    * corpus? Reported as the KS statistic D = max |ECDF_a − ECDF_b| in
    * EXACT integer arithmetic: with cum_a/cum_b the running counts and
    * n_a/n_b the totals, D·(n_a·n_b) = max |cum_a·n_b − cum_b·n_a| —
    * every operand an integer, so the DuckDB oracle replays the whole
    * statistic bit-for-bit (emitted as ppm via integer division; all
    * operands non-negative, so `div` and `//` agree). The same shape
    * gates numeric drift between any two slices (quality scores,
    * lengths, perplexities) — swap the value column.
    *
    * Scale: one combine-enabled aggregate collapses the corpus to
    * per-value counts FIRST, so the single global-order running-sum
    * window runs over the DOMAIN (distinct token counts — hundreds),
    * never the corpus; the totals ride a one-row broadcast. Cost at
    * 100 TB = one scan + one domain-sized exchange, the
    * stream_window_topk leaderboard discipline.
    */
  val ksDrift = QueryDef(
    "dist_drift_ks",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables(s, dir, "documents").select(
        size(filter(split(trim(col("text")), "\\s+"),
          t => length(t) > 0)).cast("long").as("v"),
        (col("doc_id") % 7 === 0).as("is_a"))
      val counts = docs.groupBy("v").agg(
        sum(when(col("is_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("cb"))
      val w = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = counts.select(
        sum("ca").over(w).as("cuma"), sum("cb").over(w).as("cumb"))
      val totals = counts.agg(sum("ca").as("na"), sum("cb").as("nb"))
      cum.crossJoin(broadcast(totals))
        .agg(max(abs(col("cuma") * col("nb") - col("cumb") * col("na")))
          .as("dnum"), first("na").as("na"), first("nb").as("nb"))
        .select(col("na").cast("long").as("n_a"),
          col("nb").cast("long").as("n_b"),
          expr("CAST((dnum * 1000000) div (na * nb) AS BIGINT)")
            .as("ks_ppm"))
    },
    Some("""
      WITH d AS (
        SELECT len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                 t -> len(t) > 0)) AS v,
               (doc_id % 7 = 0) AS is_a
        FROM documents),
      c AS (
        SELECT v,
               sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS ca,
               sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS cb
        FROM d GROUP BY v),
      cum AS (
        SELECT sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cuma,
               sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cumb
        FROM c),
      t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM c)
      SELECT CAST(t.na AS BIGINT) AS n_a, CAST(t.nb AS BIGINT) AS n_b,
             CAST(max(abs(cuma * t.nb - cumb * t.na)) * 1000000
                  // (t.na * t.nb) AS BIGINT) AS ks_ppm
      FROM cum, t GROUP BY t.na, t.nb"""))

  val all: Seq[QueryDef] = Seq(expectations, ksDrift)
}
