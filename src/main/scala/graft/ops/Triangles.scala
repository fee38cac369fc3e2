package graft.ops

import graft.{QueryDef, Tables, Work}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Triangle counting over the part co-purchase graph — the local
  * clustering signal link-analysis pipelines compute next to PageRank
  * (community density, spam/bot-net detection on web graphs). Nodes are
  * parts; an edge joins two parts bought in the same order.
  *
  * The count uses DEGREE-ORDERED ORIENTATION (Schank–Wagner / Cohen's
  * MapReduce form): every undirected edge is directed from its
  * lower-(degree, id) endpoint to the higher one, each triangle then
  * has exactly one node with two out-edges, so it is found exactly once
  * — no /3 correction, no duplicate pairs — and, the actual point at
  * scale, the wedge join's fan-out is bounded by the ORIENTED
  * out-degree, which is O(√m) for ANY graph (a node of degree d > √m
  * has out-degree ≤ √m because only higher-degree neighbors receive its
  * out-edges). Total wedge rows Σ outdeg² ≤ m^1.5 even on power-law
  * graphs whose raw wedge count Σ deg² is quadratic in the hub degree —
  * orientation is what makes the hub survivable, the same reason the
  * salted join (q14) exists for skewed keys.
  *
  * Shuffles: pair-gen self-join on l_orderkey (order-sized groups,
  * bounded per-order fan-out), distinct on (u, v), degree count, wedge
  * join on the oriented source, and the closing (b, c) equi-join against
  * the oriented edge list — every one an equi-join or combine-enabled
  * aggregate on bounded groups; nothing all-pairs, nothing driver-side.
  *
  * The oracle replays the count from the orientation-free a<b<c id-form
  * (each triangle once by id order) — per-node counts are identical, so
  * the hash compare proves the oriented plan loses/duplicates nothing.
  */
object Triangles {

  /** Undirected co-purchase edges (u < v, distinct): two parts sharing
    * an order. The driver-verified witness restricts to every 3rd order
    * (a scan-pushed filter): the sf0.1 full graph is dense enough
    * (~1.9M triangles, 14.5 s) to make the BENCH key about raw triangle
    * volume rather than plan shape — the full-graph growth row lives in
    * StressMain (8× measured at 5.5×, sub-linear) where volume IS the
    * question. */
  def coPurchaseEdges(s: SparkSession, dir: String): DataFrame =
    coPurchaseEdgesOf(
      Tables(s, dir, "lineitem").filter(col("l_orderkey") % 3 === 0))

  def coPurchaseEdgesOf(lineitem: DataFrame): DataFrame = {
    val li = lineitem
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v"))
      .distinct()
  }

  /** Wedge-join partition sizing (round-11 verdict punch #2): the r11
    * deep-growth measurement (SCALE.md) proved the oriented plan is
    * linear ONLY when partitions track edge count — at FIXED 32
    * shuffle partitions the per-partition wedge working set outgrew
    * memory and spilled at 16× sf0.1 (31.57× vs the linear bound 16;
    * 19.1M edges = ~600k edges/partition), while 256 partitions (~75k
    * edges/partition) restored 10.86 ≤ 16. So the library function
    * sizes the wedge join itself from the measured edge count instead
    * of relying on the session default: ~[[WedgeEdgesPerPart]] edges
    * per partition, floored at the session default (small graphs keep
    * their parallelism, and the sf0.1 witness plan is unchanged),
    * capped only at a sanity bound — a 100 TB deployment WANTS
    * partitions ∝ data.
    */
  private[graft] val WedgeEdgesPerPart = 75000L
  private[graft] def wedgeParts(m: Long, sessionDefault: Int): Int =
    math.max(sessionDefault,
      math.min(1 << 18, (m - 1) / WedgeEdgesPerPart + 1).toInt)

  /** (a, b, c) triangle rows, each triangle exactly once (a = the
    * rank-minimal apex; rank = (degree, id) packed into one long).
    *
    * The edge list is materialized once (leak-free Work.materialize):
    * the distinct pair-gen is the expensive subtree and is consumed
    * four times (degree count + three join sides), and the
    * materialized count — one metadata-cheap parquet count — drives
    * [[wedgeParts]]. Measured alternatives at sf0.1: persist() instead
    * of materialize benches 2× WORSE (the InMemoryRelation blocks AQE
    * through every downstream join), and the r11 shape (no
    * materialization, recompute per consumer) was ~1 s faster at 1×
    * but knee'd 31.57× at 16× data on default confs — the measured
    * price of the auto-linear growth this function now owns
    * (SCALE.md deep-growth table; 16× at defaults: 14.33 ≤ 16). */
  def triangleList(edges: DataFrame): DataFrame = {
    val mat = Work.materialize("tri_edges", edges)
    val m = mat.count()
    val sessionDefault = mat.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    triangleListOn(mat, wedgeParts(m, sessionDefault))
  }

  /** The oriented plan over an already-materialized edge list with an
    * explicit wedge-join partition count. Both wedge-join inputs are
    * repartitioned by src into `parts` (one exchange, reused by both
    * sides of the self-join; EnsureRequirements adds none on top), and
    * the closing join's two sides by their least/greatest-normalized
    * undirected keys — (bb, cc) on the wedge side, (zu, zv) on the raw
    * edge list (r15) — explicit-numPartitions repartitions that AQE
    * never coalesces, so the per-partition wedge working set stays
    * ~bounded regardless of the session default. */
  private[ops] def triangleListOn(edges: DataFrame,
      parts: Int): DataFrame = {
    val deg = edges.select(col("u").as("node"))
      .unionAll(edges.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // total order on nodes: degree first (hub-avoidance), id tiebreak;
    // node ids are key-domain (< 1e9), so the packing never collides
    val rank = (col("deg") * 1000000000L + col("node")).as("rank")
    val ranked = deg.select(col("node"), rank)
    val withRanks = edges
      .join(ranked.withColumnRenamed("node", "u")
        .withColumnRenamed("rank", "ru"), "u")
      .join(ranked.withColumnRenamed("node", "v")
        .withColumnRenamed("rank", "rv"), "v")
    val oriented = withRanks.select(
      when(col("ru") < col("rv"), col("u")).otherwise(col("v")).as("src"),
      when(col("ru") < col("rv"), col("v")).otherwise(col("u")).as("dst"),
      when(col("ru") < col("rv"), col("rv")).otherwise(col("ru")).as("rdst"))
    val bySrc = oriented.repartition(parts, col("src"))
    val wedges = bySrc.as("x").join(bySrc.as("y"),
        col("x.src") === col("y.src") && col("x.rdst") < col("y.rdst"))
      .select(col("x.src").as("a"), col("x.dst").as("b"),
        col("y.dst").as("c"))
    // closing join against the RAW materialized edge list, not the
    // oriented frame (r15 profile): closure only needs UNDIRECTED
    // membership of {b, c} — the wedge already fixed the triangle's
    // unique apex — so the z side is a bare parquet scan instead of a
    // full recompute of the deg-aggregate + two rank joins (persisting
    // `oriented` across its two consumers was measured WORSE: the
    // InMemoryRelation blocks AQE, same as the r11 materialize
    // finding; recompute-vs-persist numbers in SCALE.md). BOTH sides
    // are least/greatest-normalized: the in-repo edge builder emits
    // u < v by id, but triangleList's contract is any distinct
    // undirected edge set, and an un-normalized z side would silently
    // drop triangles whose closing edge arrived as (v, u) (r15 review).
    wedges
      .withColumn("bb", least(col("b"), col("c")))
      .withColumn("cc", greatest(col("b"), col("c")))
      .repartition(parts, col("bb"), col("cc"))
      .join(edges.select(least(col("u"), col("v")).as("zu"),
          greatest(col("u"), col("v")).as("zv"))
          .repartition(parts, col("zu"), col("zv")),
        col("bb") === col("zu") && col("cc") === col("zv"))
      .select("a", "b", "c")
  }

  val trianglesQuery = QueryDef(
    "graph_triangles",
    (s, dir) =>
      triangleList(coPurchaseEdges(s, dir))
        .select(explode(array(col("a"), col("b"), col("c"))).as("part"))
        .groupBy("part").agg(count(lit(1)).as("n_triangles")),
    Some("""
      WITH pr AS (
        SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
                        greatest(a.l_partkey, b.l_partkey) AS v
        FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_partkey < b.l_partkey AND a.l_orderkey % 3 = 0),
      tri AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM pr e1
        JOIN pr e2 ON e2.u = e1.v
        JOIN pr e3 ON e3.u = e1.u AND e3.v = e2.v),
      nodes AS (
        SELECT a AS part FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri)
      SELECT part, count(*) AS n_triangles
      FROM nodes GROUP BY 1"""))

  /** "People also bought": top-5 co-purchased parts per part by shared
    * order count — the item-item collaborative-filtering staple, and
    * the WEIGHTED face of the same co-purchase pair generation the
    * triangle count uses (there: distinct edges; here: multiplicity is
    * the signal).
    *
    * Scale: pair counts are one combine-enabled aggregate over the
    * bounded per-order fan-out; the per-item top-k runs on the
    * bounded-heap aggregate (k entries per (item, partition) map-side —
    * the shuffle never carries an item's full neighbor list, which for
    * a hub item is catalog-sized). Ranking is integer (n desc, id asc)
    * through the heap's (−n, id) order, so the window-form oracle
    * replays it exactly.
    */
  val copurchaseTopK = QueryDef(
    "copurchase_topk_similar",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
        .filter(col("l_orderkey") % 3 === 0)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val pairs = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("u"), col("b.pk").as("v"))
        .agg(count(lit(1)).as("n"))
      val sym = pairs.unionAll(
        pairs.select(col("v").as("u"), col("u").as("v"), col("n")))
      sym.groupBy("u")
        .agg(graft.functions.TopK.smallestK(
          (-col("n")).cast("double"), col("v"), lit(0), 5).as("top"))
        .select(col("u"), posexplode(col("top")))
        .select(col("u").as("part"), (col("pos") + 1).cast("int").as("rank"),
          col("col.id").as("similar_part"),
          (-col("col.score")).cast("long").as("n_co"))
    },
    Some("""
      WITH li AS (
        SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        WHERE l_orderkey % 3 = 0),
      pc AS (
        SELECT a.pk AS u, b.pk AS v, count(*) AS n
        FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        GROUP BY 1, 2),
      sym AS (SELECT u, v, n FROM pc
              UNION ALL SELECT v, u, n FROM pc),
      r AS (SELECT u, v, n,
                   row_number() OVER (PARTITION BY u
                                      ORDER BY n DESC, v ASC) AS rank
            FROM sym)
      SELECT u AS part, CAST(rank AS INT) AS rank, v AS similar_part,
             n AS n_co
      FROM r WHERE rank <= 5"""))

  val all: Seq[QueryDef] = Seq(trianglesQuery, copurchaseTopK)
}
