package graft.ext

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level statistics and ordering operators for training-data
  * pipelines (SURVEY.md §2.4 extension surface): vocabulary building,
  * TF-IDF term ranking, and deterministic corpus shuffling — the steps
  * between a curated corpus and a tokenizer/training run.
  *
  * All outputs are integers/strings with total-order tie-breaks so the
  * DuckDB oracle reproduces them exactly (QueryDef float discipline).
  */
object Corpus {

  val VocabSize = 200
  val TfIdfTopK = 3
  val ShuffleShards = 8

  /** Corpus vocabulary: global token counts, top-N by (count desc,
    * token asc) — the frequency pass a tokenizer-training or
    * stopword-mining step runs first.
    *
    * Scale: explode → one shuffle on token with map-side combine
    * (shuffle volume is O(distinct tokens × partitions), not O(tokens));
    * the top-N is TakeOrderedAndProject (per-partition bounded heaps,
    * no global sort). The tie-break on the unique token string makes
    * the LIMIT boundary deterministic.
    */
  val buildVocab = QueryDef(
    "build_vocab",
    (s, dir) => {
      Tables(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token").asc)
        .limit(VocabSize)
    },
    Some(s"""
      SELECT token, count(*) AS cnt
      FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
            FROM documents)
      WHERE length(token) > 0
      GROUP BY token
      ORDER BY cnt DESC, token
      LIMIT $VocabSize"""))

  /** Per-document top-k salient terms, TF-IDF-style but with a purely
    * integer deterministic ranking: high term frequency first, then LOW
    * document frequency (the IDF signal), then the term string. Floats
    * never enter the ranking, so engines cannot disagree on ties.
    *
    * Scale: tf = one shuffle on (doc_id, term); df reuses tf with a
    * shuffle on term; the df join is on term (AQE broadcasts it when the
    * vocabulary is small); the per-doc rank windows partition by doc_id
    * — all partitioned, nothing global.
    */
  val tfidfTopTerms = QueryDef(
    "tfidf_topterms",
    (s, dir) => {
      val toks = Tables(s, dir, "documents")
        .select(col("doc_id"),
          explode(TextAnalysis.tokens(col("text"))).as("term"))
        .filter(length(col("term")) > 0)
      val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfc = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("tf").desc, col("df").asc, col("term").asc)
      tf.join(dfc, "term")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= TfIdfTopK)
        .select("doc_id", "term", "tf", "df", "rnk")
    },
    Some(s"""
      WITH t AS (SELECT doc_id,
                        unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
                 FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf
             FROM t WHERE length(term) > 0 GROUP BY doc_id, term),
      df AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
      SELECT doc_id, term, tf, df, rnk FROM
        (SELECT tf.doc_id, tf.term, tf.tf, df.df,
                row_number() OVER (PARTITION BY tf.doc_id
                  ORDER BY tf.tf DESC, df.df ASC, tf.term) AS rnk
         FROM tf JOIN df USING (term))
      WHERE rnk <= $TfIdfTopK"""))

  /** Deterministic corpus shuffle into training shards: every doc gets a
    * pseudo-random 32-bit position from the engine-portable Knuth hash
    * (graft.ops.PipelineOps.hash32 — no RNG, reproducible under retries
    * and engine swaps), a shard = hash mod N, and a contiguous rank
    * within its shard. This is the "globally shuffle the corpus, write N
    * shard files, fixed order within each shard" step before training —
    * epoch order is a pure function of doc_id.
    *
    * Scale: the rank window partitions by shard (parallel, never a
    * single-partition global window); at 100 TB shards are sized so one
    * shard's ranking fits an executor's sort spill budget (raise N with
    * the data; shard count = output file count).
    */
  val shuffleDeterministic = QueryDef(
    "shuffle_deterministic",
    (s, dir) => {
      val h = graft.ops.PipelineOps.hash32(col("doc_id"))
      val w = Window.partitionBy("shard")
        .orderBy(col("h").asc, col("doc_id").asc)
      Tables(s, dir, "documents")
        .select(col("doc_id"), h.as("h"),
          pmod(h, lit(ShuffleShards.toLong)).as("shard"))
        .withColumn("pos", row_number().over(w))
        .select("doc_id", "shard", "pos")
    },
    Some(s"""
      WITH h AS (SELECT doc_id,
                        ((doc_id % 2147483648) * 2654435761) % 4294967296 AS h
                 FROM documents)
      SELECT doc_id, h % $ShuffleShards AS shard,
             row_number() OVER (PARTITION BY h % $ShuffleShards
                                ORDER BY h, doc_id) AS pos
      FROM h"""))

  val all: Seq[QueryDef] =
    Seq(buildVocab, tfidfTopTerms, shuffleDeterministic)
}
