package graft.ops

import graft.{QueryDef, Tables, Work}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-engineering operators every large-scale training pipeline needs
  * beyond the query surface: deterministic sampling / train-eval-test
  * splitting, and partition-pruned storage layout. Both are first-class
  * citizens of the 100 TB posture — sampling must be reproducible across
  * reruns and engines (no RNG), and a pruned scan is the difference
  * between reading 100 TB and reading one partition.
  */
object PipelineOps {

  /** Knuth multiplicative hash to [0, 2^32) — pure 64-bit integer
    * arithmetic, expressible identically in any engine (no RNG, no
    * engine-specific hash function), so the oracle can reproduce the
    * exact value. The key is pre-reduced mod 2^31 so the multiply
    * stays within 63 bits for ANY long key: without it, ids >= ~3.47e9
    * overflow — which Spark wraps silently (non-ANSI) while DuckDB
    * errors on, i.e. assignments would silently diverge. Keys must
    * still be NON-NEGATIVE (Spark's pmod and SQL's `%` agree only
    * there); callers pass row ids, which are.
    */
  def hash32(key: Column): Column =
    pmod(pmod(key, lit(2147483648L)) * lit(2654435761L), lit(4294967296L))

  /** [[hash32]] folded to a percentage bucket in [0, 100) — the
    * train/val/test and sampling-rate assignment primitive. */
  def hashBucket(key: Column): Column = pmod(hash32(key), lit(100L))

  /** Deterministic sample + split assignment: every doc gets a stable
    * bucket; buckets < 80 → train, < 90 → val, rest → test. The
    * reference's label_split divides columns; this divides ROWS — the
    * train/eval split step of a training-data pipeline. Per-row,
    * shuffle-free, reproducible under retries and engine swaps.
    */
  val sampleSplit = QueryDef(
    "sample_split_hash",
    (s, dir) => {
      val b = hashBucket(col("doc_id"))
      Tables(s, dir, "documents").select(
        col("doc_id"),
        b.as("bucket"),
        when(b < 80, lit("train"))
          .when(b < 90, lit("val"))
          .otherwise(lit("test")).as("split"))
    },
    Some("""
      SELECT doc_id,
             (((doc_id % 2147483648) * 2654435761) % 4294967296) % 100 AS bucket,
             CASE WHEN (((doc_id % 2147483648) * 2654435761) % 4294967296) % 100 < 80 THEN 'train'
                  WHEN (((doc_id % 2147483648) * 2654435761) % 4294967296) % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents"""))

  /** Leakage-safe split (r13): train/val/test assignment keyed on the
    * duplicate-CLUSTER label, not the document id — near/exact copies
    * of one document must land in the SAME split, or eval rows leak
    * into training through their surviving twins (the train/test
    * contamination every dedup paper warns the split step about; a
    * per-doc hash split like [[sampleSplit]] cannot guarantee it).
    * Takes ANY (doc_id, cluster) labels — exact-dedup groups here,
    * [[graft.ext.Dedup.connectedComponents]] output at full fidelity —
    * and assigns `hashBucket(cluster)`: members of a cluster agree by
    * construction. Per-row and shuffle-free GIVEN labels; the witness
    * key's labels are one groupBy(text) + one join. */
  def splitByCluster(labels: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val b = hashBucket(col("cluster"))
    labels.select(col("doc_id"), col("cluster"),
      when(b < 80, lit("train"))
        .when(b < 90, lit("val"))
        .otherwise(lit("test")).as("split"))
  }

  val splitLeakageSafe = QueryDef(
    "split_leakage_safe",
    (s, dir) => {
      // planted exact copies (+20M on every 10th doc) make the
      // guarantee observable: copy and original must co-locate
      val docs = Tables(s, dir, "documents").select("doc_id", "text")
      val corpus = docs.unionAll(
        docs.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 20000000L).as("doc_id"), col("text")))
      val labels = corpus.groupBy("text")
        .agg(min(col("doc_id")).as("cluster"),
          collect_list(col("doc_id")).as("members"))
        .select(explode(col("members")).as("doc_id"), col("cluster"))
      splitByCluster(labels)
    },
    Some("""
      WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 20000000, text FROM documents WHERE doc_id % 10 = 0),
      lab AS (
        SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS cluster
        FROM corpus),
      b AS (
        SELECT doc_id, cluster,
               (((cluster % 2147483648) * 2654435761) % 4294967296) % 100
                 AS bk
        FROM lab)
      SELECT doc_id, cluster,
             CASE WHEN bk < 80 THEN 'train'
                  WHEN bk < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM b"""))

  /** Partition-pruned layout: write orders hive-partitioned by order
    * year, then scan ONE partition back. The filter on the partition
    * column never touches the other years' files (PartitionFilters in
    * the scan node — asserted in PlanSpec); at 100 TB this is the
    * standard date-partitioned fact-table layout where a year-scoped
    * query reads only its slice.
    */
  val partitionedPrune = QueryDef(
    "partitioned_prune_scan",
    (s, dir) => {
      val path = Work.scratch("orders_by_year")
      Work.clean(path)
      Tables(s, dir, "orders")
        .withColumn("o_year", year(col("o_orderdate")))
        .write.mode("overwrite").partitionBy("o_year").parquet(path)
      s.read.parquet(path)
        .filter(col("o_year") === 1997)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_year")
    },
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year
      FROM orders
      WHERE EXTRACT(YEAR FROM o_orderdate) = 1997"""))

  /** Stratified sampling: per-class keep rates (10% / 50% / 100% by
    * label residue) applied through the same deterministic hash bucket —
    * downsample over-represented classes, keep rare ones whole. Per-row
    * and shuffle-free like [[sampleSplit]]; rates are data-independent
    * so the sample composition is stable under retries and engine swaps.
    */
  val sampleStratified = QueryDef(
    "sample_stratified",
    (s, dir) => {
      val rate = when(col("label") % 3 === 0, 10)
        .when(col("label") % 3 === 1, 50)
        .otherwise(100)
      Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("label"))
        .filter(hashBucket(col("vec_id")) < rate)
    },
    Some("""
      SELECT vec_id, label FROM embeddings
      WHERE (((vec_id % 2147483648) * 2654435761) % 4294967296) % 100 <
            CASE WHEN label % 3 = 0 THEN 10
                 WHEN label % 3 = 1 THEN 50
                 ELSE 100 END"""))

  /** Class-cap rebalancing: keep at most N rows per label, chosen by a
    * deterministic pseudo-random order (the hash bucket, then id) — the
    * "cap each class at N examples" step of dataset balancing, with a
    * selection that is reproducible and engine-portable (no RNG, no
    * first-N-encountered nondeterminism).
    * Scale: one shuffle on label; for extreme-cardinality classes the
    * row_number window becomes the bounded-heap top-k aggregate
    * (functions/TopKAggregate.scala) — same contract, no full sort.
    */
  val sampleClassCap = QueryDef(
    "sample_class_cap",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cap = 20
      val w = Window.partitionBy("label")
        .orderBy(hashBucket(col("vec_id")).asc, col("vec_id").asc)
      Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("label"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= cap)
        .select("vec_id", "label")
    },
    Some("""
      SELECT vec_id, label FROM
        (SELECT vec_id, label,
                row_number() OVER (PARTITION BY label
                  ORDER BY (((vec_id % 2147483648) * 2654435761) % 4294967296) % 100,
                           vec_id) AS rn
         FROM embeddings)
      WHERE rn <= 20"""))

  /** Schema evolution: two parquet batches with drifted schemas (a
    * column dropped, two added) under one partitioned root, read back
    * with mergeSchema — the unified view a long-lived ingestion table
    * needs as producers evolve. Absent columns surface as NULLs; the
    * partition column tags provenance. Scale: merge happens at footer/
    * planning time (schemas, not data); the scan stays parallel.
    */
  val schemaEvolution = QueryDef(
    "schema_evolution",
    (s, dir) => {
      val base = Work.scratch("schema_evo")
      Work.clean(base)
      val nation = Tables(s, dir, "nation")
      nation.select(col("n_nationkey"), col("n_name"))
        .write.mode("overwrite").parquet(s"$base/batch=1")
      nation.select(col("n_nationkey"), col("n_regionkey"),
          lit("ingest-v2").as("source"))
        .write.mode("overwrite").parquet(s"$base/batch=2")
      s.read.option("mergeSchema", "true").parquet(base)
        .select("n_nationkey", "n_name", "n_regionkey", "source", "batch")
    },
    Some("""
      SELECT n_nationkey, n_name,
             CAST(NULL AS INT) AS n_regionkey,
             CAST(NULL AS VARCHAR) AS source, 1 AS batch
      FROM nation
      UNION ALL
      SELECT n_nationkey, CAST(NULL AS VARCHAR), n_regionkey,
             'ingest-v2', 2
      FROM nation"""))

  /** 16-bit × 16-bit Morton (Z-order) interleave: bit i of x lands at
    * position 2i, bit i of y at 2i+1 — pure integer arithmetic, so the
    * oracle reproduces it exactly. */
  def zValue(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  private def zValueSql(x: String, y: String): String =
    (0 until 16).map { i =>
      s"(($x >> $i) & 1) * ${1L << (2 * i)} + (($y >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")

  /** Z-order layout: cluster rows along a Morton curve over two key
    * dimensions, then range-partition + sort by the z-value at write.
    * Each output file then covers a small rectangle in (x, y) space, so
    * min/max file skipping prunes on EITHER dimension — the multi-
    * dimensional generalization of [[partitionedPrune]]'s single-column
    * layout (what table formats call OPTIMIZE ZORDER). The clustering
    * effect (per-file spans ≪ global span on both dims) is asserted in
    * PlanSpec. The query output is the z-values themselves, oracle-
    * checked as exact integer arithmetic.
    */
  val zorderLayout = QueryDef(
    "zorder_layout",
    (s, dir) => {
      val path = Work.scratch("orders_zorder")
      Work.clean(path)
      // equal 7-bit widths on both dims (fully populated at every SF): z-order clusters only when the
      // interleaved dimensions have comparable bit widths (a wider dim's
      // high bits would otherwise own the top of every z-range)
      val keyed = Tables(s, dir, "orders").select(
        col("o_orderkey"),
        (col("o_custkey") % 128).as("x"),
        (col("o_orderkey") % 128).as("y"))
        .withColumn("z", zValue(col("x"), col("y")))
      keyed.repartitionByRange(8, col("z"))
        .sortWithinPartitions("z")
        .write.mode("overwrite").parquet(path)
      s.read.parquet(path).select("o_orderkey", "x", "y", "z")
    },
    Some(s"""
      SELECT o_orderkey,
             o_custkey % 128 AS x,
             o_orderkey % 128 AS y,
             ${zValueSql("(o_custkey % 128)", "(o_orderkey % 128)")} AS z
      FROM orders"""))

  val all: Seq[QueryDef] =
    Seq(sampleSplit, splitLeakageSafe, sampleStratified, sampleClassCap,
      partitionedPrune, schemaEvolution, zorderLayout)
}
