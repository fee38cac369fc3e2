package graft.ext

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding-column preprocessing (SURVEY.md §2.4 multimodal/vector
  * tier): L2 normalization (so cosine reduces to a dot product) and
  * int8 quantization (the 8× vector-storage/IO lever at 100 TB — FAISS
  *-style scalar quantization). Both are per-row projections: shuffle-
  * free, whole-stage-codegen'd, embarrassingly parallel at any scale.
  *
  * Determinism discipline for the oracle hash: the norm is a
  * SEQUENTIAL left fold on both sides (Spark `aggregate` / DuckDB
  * `list_reduce` are both defined sequential), so the doubles are
  * bit-identical before the identical round-and-scale step; outputs are
  * integers and comma-joined integer strings (never raw float columns,
  * and never array columns — the driver compare sorts scalars).
  */
object Embeddings {

  private def asVec(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("e"))

  /** Unit-normalized vector, pinned at 1e-6 resolution as a joined
    * integer string. */
  val normalize = QueryDef(
    "embedding_normalize",
    (s, dir) =>
      asVec(s, dir)
        .withColumn("norm",
          sqrt(aggregate(transform(col("e"), x => x * x), lit(0.0), _ + _)))
        .filter(col("norm") > 0)
        .select(col("vec_id"),
          array_join(transform(col("e"),
            x => round(x / col("norm") * 1e6).cast(LongType)), ",")
            .as("unit_e6")),
    Some("""
      WITH x AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                 FROM embeddings),
           n AS (SELECT vec_id, e,
                        sqrt(list_reduce(list_transform(e, v -> v * v),
                                         (a, b) -> a + b)) AS norm
                 -- guard BEFORE list_reduce: it errors on an empty
                 -- list where the Spark fold returns 0.0
                 FROM x WHERE len(e) > 0)
      SELECT vec_id,
             array_to_string(list_transform(e,
               v -> CAST(round(v / norm * 1000000) AS BIGINT)), ',')
               AS unit_e6
      FROM n WHERE norm > 0"""))

  /** Symmetric max-abs int8 quantization: q_i = round(x_i·127/maxabs),
    * plus the per-vector scale needed to dequantize. maxabs is an
    * order-independent max, so no fold discipline needed there. */
  val quantizeInt8 = QueryDef(
    "embedding_quantize_int8",
    (s, dir) =>
      asVec(s, dir)
        .withColumn("maxabs", array_max(transform(col("e"), x => abs(x))))
        .filter(col("maxabs") > 0)
        .select(col("vec_id"),
          round(col("maxabs") * 1e6).cast(LongType).as("scale_e6"),
          array_join(transform(col("e"),
            x => round(x * 127 / col("maxabs")).cast(LongType)), ",").as("q")),
    Some("""
      WITH x AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                 FROM embeddings),
           m AS (SELECT vec_id, e,
                        list_max(list_transform(e, v -> abs(v))) AS maxabs
                 FROM x)
      SELECT vec_id,
             CAST(round(maxabs * 1000000) AS BIGINT) AS scale_e6,
             array_to_string(list_transform(e,
               v -> CAST(round(v * 127 / maxabs) AS BIGINT)), ',') AS q
      FROM m WHERE maxabs > 0"""))

  // --- product quantization (PQ) --------------------------------------

  /** PQ geometry: 64-dim vectors cut into M=8 subspaces of D=8 dims,
    * each encoded as the index of its nearest codeword in a K=16-entry
    * per-subspace codebook — 64 doubles (512 B) become 8 small ints
    * (8 B with nbits=4 packing): the 64× vector-storage lever behind
    * IVF-PQ indexes at 10⁹–10¹² vectors (Jégou et al., PAMI 2011),
    * complementing [[quantizeInt8]]'s 8×.
    *
    * Determinism discipline: vectors are integer-scaled
    * (round(x·1000)) BEFORE codebook extraction, encoding, and ADC
    * scoring, so every distance in the pipeline is EXACT integer
    * arithmetic — no float accumulation-order or tie risk anywhere,
    * and the whole pipeline (codebooks → codes → ADC top-k) replays
    * verbatim in the DuckDB oracle. Codebooks are the first K vectors
    * by id (deterministic, SQL-replayable; swap in per-subspace Lloyd
    * for trained codebooks — same shapes, [[graft.ext.Similarity.kmeansCentroids]]
    * precedent).
    */
  val PqM = 8
  val PqD = 8
  val PqK = 16

  private[graft] def intScale(e: Column): Column =
    transform(e, x => round(x * 1000))

  /** One-row broadcastable codebook map: s → sorted array<struct<cid,
    * ce>> of that subspace's K codewords (cid = codeword index). The
    * same single-broadcast-row quantizer shape as semantic dedup / IVF
    * — training data never shuffles, encoding is pure map work. */
  private[graft] def pqCodebook(scaled: DataFrame, idCol: String): DataFrame =
    scaled.orderBy(idCol).limit(PqK)
      .withColumn("j", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(idCol)) - 1)
      .select(explode(sequence(lit(0), lit(PqM - 1))).as("s"), col("j"),
        col("sc"))
      .select(col("s"), struct(col("j").cast(LongType).as("cid"),
        slice(col("sc"), col("s") * PqD + 1, lit(PqD)).as("ce")).as("cw"))
      .groupBy("s").agg(sort_array(collect_list(col("cw"))).as("cws"))
      .agg(map_from_entries(sort_array(
        collect_list(struct(col("s"), col("cws"))))).as("cb"))

  /** codes[s] = argmin_j L2(subvector_s, codebook[s][j]), lowest j on
    * ties — the native L2Argmin per subspace (the outer per-subspace
    * loop is a tiny HOF; the K·D hot loop inside is codegen'd). */
  private[graft] def pqEncode(sc: Column, cb: Column): Column =
    transform(sequence(lit(0), lit(PqM - 1)), s =>
      graft.functions.VectorFunctions.l2Argmin(
        slice(sc, s * PqD + 1, lit(PqD)), element_at(cb, s)))

  /** Asymmetric-distance (ADC) score: the query stays full-precision
    * (integer-scaled), the reference is its 8 codes — distance is the
    * sum over subspaces of exact integer L2 to the looked-up codeword. */
  private[graft] def adcDist(qs: Column, codes: Column, cb: Column): Column =
    aggregate(
      zip_with(codes, sequence(lit(0), lit(PqM - 1)), (c, s) =>
        graft.functions.VectorFunctions.l2Sq(
          slice(qs, s * PqD + 1, lit(PqD)),
          element_at(element_at(cb, s), (c + 1).cast(IntegerType))
            .getField("ce"))),
      lit(0.0), _ + _)

  /** Trained codebooks: per-subspace Lloyd k-means over the subvector
    * space ([[Similarity.kmeansCentroids]], init = the untrained
    * first-K books), same one-row broadcast shape as [[pqCodebook]].
    * Lloyd never increases distortion from its init, so reconstruction
    * error is <= the untrained books' by construction — pinned in
    * ExtSpec via [[pqReconstructionError]]. Trained books are floats
    * (means), so the exact-integer oracle discipline doesn't apply —
    * they serve the quality path, the oracled keys keep the
    * deterministic books. */
  private[graft] def pqCodebookTrained(scaled: DataFrame, idCol: String,
      iters: Int = 3): DataFrame =
    (0 until PqM).map { s =>
      val sub = scaled.select(col(idCol).as("rid"),
        slice(col("sc"), s * PqD + 1, PqD).as("re"))
      Similarity.kmeansCentroids(sub, PqK, iters)
        .select(lit(s).as("s"), struct(col("cid"), col("ce")).as("cw"))
    }.reduce(_ unionAll _)
      .groupBy("s").agg(sort_array(collect_list(col("cw"))).as("cws"))
      .agg(map_from_entries(sort_array(
        collect_list(struct(col("s"), col("cws"))))).as("cb"))

  /** Total squared reconstruction error of a corpus against a codebook
    * — the distortion Lloyd minimizes (a vector's error is its ADC
    * distance to its own codes). */
  private[graft] def pqReconstructionError(scaled: DataFrame,
      cb: DataFrame): Double =
    scaled.crossJoin(broadcast(cb))
      .select(adcDist(col("sc"),
        pqEncode(col("sc"), col("cb")), col("cb")).as("err"))
      .agg(sum("err")).head.getDouble(0)

  /** PQ encoding of the corpus: (vec_id, comma-joined codes). */
  val pqCodes = QueryDef(
    "embedding_pq_codes",
    (s, dir) => {
      val scaled = asVec(s, dir)
        .select(col("vec_id"), intScale(col("e")).as("sc"))
      scaled.crossJoin(broadcast(pqCodebook(scaled, "vec_id")))
        .select(col("vec_id"),
          array_join(pqEncode(col("sc"), col("cb")), ",").as("codes"))
    },
    Some("""
      WITH x AS (SELECT vec_id,
                        list_transform(CAST(embedding AS DOUBLE[]),
                                       v -> round(v * 1000)) AS sc
                 FROM embeddings),
      t AS (SELECT sc, row_number() OVER (ORDER BY vec_id) - 1 AS j
            FROM x ORDER BY vec_id LIMIT 16),
      cw AS (SELECT s, j, list_slice(sc, s * 8 + 1, s * 8 + 8) AS ce
             FROM t CROSS JOIN (SELECT unnest(range(8)) AS s)),
      sub AS (SELECT vec_id, s, list_slice(sc, s * 8 + 1, s * 8 + 8) AS sq
              FROM x CROSS JOIN (SELECT unnest(range(8)) AS s)),
      enc AS (
        SELECT vec_id, s, j FROM (
          SELECT sub.vec_id, sub.s, cw.j,
                 row_number() OVER (PARTITION BY sub.vec_id, sub.s
                   ORDER BY list_sum(list_transform(range(1, 9),
                     i -> (sub.sq[i] - cw.ce[i]) * (sub.sq[i] - cw.ce[i]))),
                   cw.j) AS rn
          FROM sub JOIN cw ON sub.s = cw.s) WHERE rn = 1)
      SELECT vec_id,
             array_to_string(list(j ORDER BY s), ',') AS codes
      FROM enc GROUP BY vec_id"""))

  /** PQ ADC top-k search: queries stay full-precision, references are
    * searched AS CODES — the memory-bound regime where the corpus no
    * longer fits as raw vectors. One broadcast of (codebook, queries),
    * one bounded-heap aggregate; ranks are exact over the integer
    * distances, ties (identical codes — e.g. duplicate vectors) break
    * by rid like every top-k in the library. */
  val pqTopK = QueryDef(
    "topk_pq_adc",
    (s, dir) => {
      val (q, r) = Similarity.split(s, dir)
      val rs = r.select(col("rid"), intScale(col("re")).as("sc"))
      val qs = q.select(col("qid"), intScale(col("qe")).as("qs"))
      val cb = pqCodebook(rs, "rid")
      val enc = rs.crossJoin(broadcast(cb))
        .select(col("rid"), pqEncode(col("sc"), col("cb")).as("codes"))
      // the classic ADC structure: per QUERY, one m×K table of exact
      // subspace distances to every codeword (tiny — computed once per
      // query, HOF cost immaterial at |Q| rows), then the pair scan is
      // m table lookups per (query, reference) via the native
      // codegen'd adc_lookup — identical sums in identical order to
      // folding l2_sq per pair ([[adcDist]], the equivalence twin the
      // reconstruction-error path still uses), so the oracle is
      // untouched
      val qtab = qs.crossJoin(broadcast(cb))
        .select(col("qid"),
          transform(sequence(lit(0), lit(PqM - 1)), sb =>
            transform(element_at(col("cb"), sb), cw =>
              graft.functions.VectorFunctions.l2Sq(
                slice(col("qs"), sb * PqD + 1, lit(PqD)),
                cw.getField("ce")))).as("tbl"))
      enc.crossJoin(broadcast(qtab))
        .select(col("qid"),
          graft.functions.VectorFunctions
            .adcLookup(col("tbl"), col("codes")).as("dist"),
          col("rid"))
        .groupBy("qid")
        .agg(graft.functions.TopK.smallestK(
          col("dist"), col("rid"), lit(0), Similarity.K).as("top"))
        .select(col("qid"), posexplode(col("top.id")))
        .select(col("qid"), (col("pos") + 1).cast(IntegerType).as("rank"),
          col("col").as("rid"))
    },
    Some("""
      WITH q AS (SELECT vec_id AS qid,
                        list_transform(CAST(embedding AS DOUBLE[]),
                                       v -> round(v * 1000)) AS qsc
                 FROM embeddings WHERE vec_id % 10 = 0),
      r AS (SELECT vec_id AS rid,
                   list_transform(CAST(embedding AS DOUBLE[]),
                                  v -> round(v * 1000)) AS sc
            FROM embeddings WHERE vec_id % 10 <> 0),
      t AS (SELECT sc, row_number() OVER (ORDER BY rid) - 1 AS j
            FROM r ORDER BY rid LIMIT 16),
      cw AS (SELECT s, j, list_slice(sc, s * 8 + 1, s * 8 + 8) AS ce
             FROM t CROSS JOIN (SELECT unnest(range(8)) AS s)),
      sub AS (SELECT rid, s, list_slice(sc, s * 8 + 1, s * 8 + 8) AS sq
              FROM r CROSS JOIN (SELECT unnest(range(8)) AS s)),
      enc AS (
        SELECT rid, s, j FROM (
          SELECT sub.rid, sub.s, cw.j,
                 row_number() OVER (PARTITION BY sub.rid, sub.s
                   ORDER BY list_sum(list_transform(range(1, 9),
                     i -> (sub.sq[i] - cw.ce[i]) * (sub.sq[i] - cw.ce[i]))),
                   cw.j) AS rn
          FROM sub JOIN cw ON sub.s = cw.s) WHERE rn = 1),
      dists AS (
        SELECT q.qid, enc.rid,
               sum(list_sum(list_transform(range(1, 9), i ->
                 (list_slice(q.qsc, enc.s * 8 + 1, enc.s * 8 + 8)[i]
                    - cw.ce[i])
                 * (list_slice(q.qsc, enc.s * 8 + 1, enc.s * 8 + 8)[i]
                    - cw.ce[i])))) AS dist
        FROM q CROSS JOIN enc JOIN cw ON enc.s = cw.s AND enc.j = cw.j
        GROUP BY q.qid, enc.rid)
      SELECT qid, rank, rid FROM (
        SELECT qid, rid, row_number() OVER (PARTITION BY qid
                 ORDER BY dist, rid) AS rank
        FROM dists)
      WHERE rank <= 10"""))

  /** IVF-PQ ADC search — the production regime at 10⁹–10¹² vectors
    * (FAISS's IVFADC, Jégou et al. 2011): the coarse quantizer prunes
    * WHICH references are scored (only the [[Similarity.IvfProbes]]
    * probed cells' members), PQ codes compress HOW they are scored
    * (8 nibbles per vector, ADC table lookups). Both quantizers are
    * the library's deterministic defaults (every-16th ref coarse,
    * first-16 codebooks) so the oracle replays the full pipeline
    * bit-for-bit in integer arithmetic.
    *
    * 100 TB shape: coarse quantizer AND codebook are one-row
    * broadcasts; reference-side assignment + encoding is one pure-map
    * pass (never re-shuffled); the probe→cell candidate restriction is
    * a broadcast equi-join on cid (queries×probes is the tiny side);
    * the only wide exchange is the final per-query top-k aggregation.
    * Memory: scored corpus lives as codes (64 B → 8 B per vector).
    */
  val ivfPqTopK = QueryDef(
    "topk_ivfpq_adc",
    (s, dir) => {
      val (q, r) = Similarity.split(s, dir)
      val qs = q.select(col("qid"), intScale(col("qe")).as("qs"))
      val rs = r.select(col("rid"), intScale(col("re")).as("sc"))
      val cents = rs.filter(col("rid") % 16 === 0)
        .select(col("rid").as("cid"), col("sc").as("ce"))
      val qt = cents.agg(sort_array(
        collect_list(struct(col("cid"), col("ce")))).as("cents"))
      val cb = pqCodebook(rs, "rid")
      val enc = rs.crossJoin(broadcast(qt)).crossJoin(broadcast(cb))
        .select(graft.functions.VectorFunctions
            .l2Argmin(col("sc"), col("cents")).as("cid"),
          col("rid"), pqEncode(col("sc"), col("cb")).as("codes"))
      val qtab = qs.crossJoin(broadcast(qt)).crossJoin(broadcast(cb))
        .select(col("qid"),
          explode(graft.functions.VectorFunctions.l2ArgminTopK(
            col("qs"), col("cents"), Similarity.IvfProbes)).as("cid"),
          transform(sequence(lit(0), lit(PqM - 1)), sb =>
            transform(element_at(col("cb"), sb), cw =>
              graft.functions.VectorFunctions.l2Sq(
                slice(col("qs"), sb * PqD + 1, lit(PqD)),
                cw.getField("ce")))).as("tbl"))
      enc.join(broadcast(qtab), "cid")
        .select(col("qid"),
          graft.functions.VectorFunctions
            .adcLookup(col("tbl"), col("codes")).as("dist"),
          col("rid"))
        .groupBy("qid")
        .agg(graft.functions.TopK.smallestK(
          col("dist"), col("rid"), lit(0), Similarity.K).as("top"))
        .select(col("qid"), posexplode(col("top.id")))
        .select(col("qid"), (col("pos") + 1).cast(IntegerType).as("rank"),
          col("col").as("rid"))
    },
    Some(s"""
      WITH q AS (SELECT vec_id AS qid,
                        list_transform(CAST(embedding AS DOUBLE[]),
                                       v -> round(v * 1000)) AS qsc
                 FROM embeddings WHERE vec_id % 10 = 0),
      r AS (SELECT vec_id AS rid,
                   list_transform(CAST(embedding AS DOUBLE[]),
                                  v -> round(v * 1000)) AS sc
            FROM embeddings WHERE vec_id % 10 <> 0),
      c AS (SELECT rid AS cid, sc AS ce64 FROM r WHERE rid % 16 = 0),
      assigned AS (SELECT cid, rid FROM (
          SELECT c.cid, r.rid,
                 row_number() OVER (PARTITION BY r.rid
                   ORDER BY list_sum(list_transform(range(1, 65),
                     i -> (r.sc[i] - c.ce64[i]) * (r.sc[i] - c.ce64[i]))),
                   c.cid) AS arn
          FROM r CROSS JOIN c) WHERE arn = 1),
      probes AS (SELECT qid, cid FROM (
          SELECT q.qid, c.cid,
                 row_number() OVER (PARTITION BY q.qid
                   ORDER BY list_sum(list_transform(range(1, 65),
                     i -> (q.qsc[i] - c.ce64[i]) * (q.qsc[i] - c.ce64[i]))),
                   c.cid) AS prn
          FROM q CROSS JOIN c) WHERE prn <= ${Similarity.IvfProbes}),
      t AS (SELECT sc, row_number() OVER (ORDER BY rid) - 1 AS j
            FROM r ORDER BY rid LIMIT 16),
      cw AS (SELECT s, j, list_slice(sc, s * 8 + 1, s * 8 + 8) AS ce
             FROM t CROSS JOIN (SELECT unnest(range(8)) AS s)),
      sub AS (SELECT rid, s, list_slice(sc, s * 8 + 1, s * 8 + 8) AS sq
              FROM r CROSS JOIN (SELECT unnest(range(8)) AS s)),
      enc AS (
        SELECT rid, s, j FROM (
          SELECT sub.rid, sub.s, cw.j,
                 row_number() OVER (PARTITION BY sub.rid, sub.s
                   ORDER BY list_sum(list_transform(range(1, 9),
                     i -> (sub.sq[i] - cw.ce[i]) * (sub.sq[i] - cw.ce[i]))),
                   cw.j) AS rn
          FROM sub JOIN cw ON sub.s = cw.s) WHERE rn = 1),
      cand AS (SELECT p.qid, a.rid
               FROM probes p JOIN assigned a USING (cid)),
      dists AS (
        SELECT q.qid, enc.rid,
               sum(list_sum(list_transform(range(1, 9), i ->
                 (list_slice(q.qsc, enc.s * 8 + 1, enc.s * 8 + 8)[i]
                    - cw.ce[i])
                 * (list_slice(q.qsc, enc.s * 8 + 1, enc.s * 8 + 8)[i]
                    - cw.ce[i])))) AS dist
        FROM q JOIN cand ON q.qid = cand.qid
        JOIN enc ON enc.rid = cand.rid
        JOIN cw ON enc.s = cw.s AND enc.j = cw.j
        GROUP BY q.qid, enc.rid)
      SELECT qid, rank, rid FROM (
        SELECT qid, rid, row_number() OVER (PARTITION BY qid
                 ORDER BY dist, rid) AS rank
        FROM dists)
      WHERE rank <= ${Similarity.K}"""))

  val all: Seq[QueryDef] =
    Seq(normalize, quantizeInt8, pqCodes, pqTopK, ivfPqTopK)
}
