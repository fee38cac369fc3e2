package graft.ext

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Chunking and packing — the two steps between a curated corpus and a
  * training/embedding batch:
  *
  *  - [[chunk]]: split each document into overlapping fixed-size token
  *    windows (the chunking step before embedding or retrieval
  *    indexing). Per-row generate: pipelined, no shuffle.
  *  - [[pack]]: assign documents to fixed-token-budget context bins by
  *    a running token count (pretraining concatenate-and-split
  *    packing). Packing is inherently sequential, so it runs PER SHARD:
  *    one window partition per shard = parallel across shards, exact
  *    within a shard — the shape real pipelines use (pack within
  *    worker shard, never a global order).
  */
object Chunking {

  val ChunkTokens = 32
  val ChunkStride = 24 // 8-token overlap
  val ContextTokens = 512
  val Shards = 8

  /** One row per (doc, chunk): overlapping token windows; a doc at or
    * under the window size yields exactly one chunk. Chunk k covers
    * tokens [k·stride, k·stride + size); the last chunk may be short
    * but always reaches the document's end.
    */
  val chunk = QueryDef(
    "chunk_documents",
    (s, dir) => {
      val toks = TextAnalysis.tokens(col("text"))
      Tables(s, dir, "documents")
        .select(col("doc_id"), toks.as("ws"))
        .withColumn("n", size(col("ws")))
        .filter(col("n") > 0)
        .withColumn("n_chunks",
          when(col("n") <= ChunkTokens, lit(1L))
            .otherwise(ceil((col("n") - lit(ChunkTokens)) / lit(ChunkStride.toDouble))
              .cast(LongType) + 1L))
        .select(col("doc_id"), col("ws"), col("n"),
          explode(sequence(lit(0L), col("n_chunks") - 1L)).as("chunk_idx"))
        .select(col("doc_id"), col("chunk_idx"),
          array_join(slice(col("ws"),
            (col("chunk_idx") * ChunkStride + 1).cast(IntegerType),
            lit(ChunkTokens)), " ").as("chunk_text"),
          least(col("n") - col("chunk_idx") * ChunkStride,
            lit(ChunkTokens.toLong)).as("n_chunk_tokens"))
    },
    Some(s"""
      WITH d AS (SELECT doc_id,
                        regexp_split_to_array(trim(text), '\\s+') AS ws,
                        len(regexp_split_to_array(trim(text), '\\s+')) AS n
                 FROM documents),
      c AS (SELECT doc_id, ws, n,
                   CASE WHEN n <= $ChunkTokens THEN 1
                        ELSE CAST(ceil((n - $ChunkTokens) / ${ChunkStride.toDouble}) AS BIGINT) + 1
                   END AS n_chunks
            FROM d WHERE n > 0),
      e AS (SELECT doc_id, ws, n,
                   unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
            FROM c)
      SELECT doc_id, chunk_idx,
             array_to_string(
               ws[CAST(chunk_idx * $ChunkStride + 1 AS BIGINT)
                  : CAST(chunk_idx * $ChunkStride + $ChunkTokens AS BIGINT)],
               ' ') AS chunk_text,
             least(n - chunk_idx * $ChunkStride,
                   $ChunkTokens) AS n_chunk_tokens
      FROM e"""))

  /** Concatenate-and-split packing per shard: each doc lands at a
    * running token offset within its shard; the context bin is
    * offset div budget (docs may straddle bin boundaries — exactly the
    * pretraining concatenation semantics). Deterministic: shard and
    * order are functions of doc_id alone.
    */
  val pack = QueryDef(
    "pack_sequences",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val toks = TextAnalysis.tokens(col("text"))
      val w = Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "documents")
        .select(col("doc_id"), (col("doc_id") % Shards).as("shard"),
          size(toks).cast(LongType).as("n_tokens"))
        .withColumn("end_off", sum(col("n_tokens")).over(w))
        .select(col("doc_id"), col("shard"), col("n_tokens"),
          (col("end_off") - col("n_tokens")).as("start_off"),
          // floor-div on both sides: a raw double division CAST would
          // truncate here but ROUND in DuckDB
          floor((col("end_off") - col("n_tokens")) / ContextTokens)
            .cast(LongType).as("bin"))
    },
    Some(s"""
      WITH d AS (SELECT doc_id, doc_id % $Shards AS shard,
                        CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
                          AS n_tokens
                 FROM documents),
      o AS (SELECT doc_id, shard, n_tokens,
                   CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     - n_tokens AS BIGINT) AS start_off
            FROM d)
      SELECT doc_id, shard, n_tokens, start_off,
             CAST(floor(start_off / ${ContextTokens.toDouble}) AS BIGINT) AS bin
      FROM o"""))

  /** Materialize the packed training sequences themselves: docs are
    * concatenated per shard in doc_id order and cut into fixed
    * [[ContextTokens]]-token bins, with documents straddling bin
    * boundaries (the GPT-style concatenate-and-split text, not just the
    * [[pack]] bin assignment). Each doc emits one fragment per bin it
    * overlaps; bins reassemble fragments in offset order.
    *
    * Scale: offsets via a per-shard running-sum window (parallel across
    * shards), the fragment explode is per-row, and reassembly is one
    * shuffle on (shard, bin) whose groups are bounded by the token
    * budget — no global order, no unbounded group.
    */
  /** df-in/df-out core over any (doc_id, text) frame. */
  def packChunkTextOf(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = TextAnalysis.tokens(col("text"))
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fragStart = greatest(col("bin") * ContextTokens, col("start_off"))
    val fragEnd = least((col("bin") + 1) * ContextTokens, col("end_off"))
    docs
      // a real guard: split(trim(''), '\s+') is [""] (size 1, never 0),
      // so filtering on n > 0 alone would let empty docs inject a
      // phantom empty-string token into the packed sequences
      .filter(trim(col("text")) =!= "")
      .select(col("doc_id"), (col("doc_id") % Shards).as("shard"),
        toks.as("ws"), size(toks).cast(LongType).as("n"))
      .withColumn("end_off", sum(col("n")).over(w))
      .withColumn("start_off", col("end_off") - col("n"))
      // bins this doc overlaps: floor(start/CT) .. floor((end-1)/CT)
      .select(col("shard"), col("ws"), col("start_off"), col("end_off"),
        explode(sequence(expr(s"start_off div $ContextTokens"),
          expr(s"(end_off - 1) div $ContextTokens"))).as("bin"))
      .select(col("shard"), col("bin"), col("start_off"),
        slice(col("ws"), (fragStart - col("start_off") + 1).cast(IntegerType),
          (fragEnd - fragStart).cast(IntegerType)).as("frag"))
      .groupBy("shard", "bin")
      .agg(
        sum(size(col("frag"))).cast(LongType).as("n_seq_tokens"),
        array_join(
          flatten(transform(
            sort_array(collect_list(struct(col("start_off"), col("frag")))),
            t => t.getField("frag"))), " ").as("seq_text"))
  }

  val packChunkText = QueryDef(
    "pack_chunk_text",
    (s, dir) => packChunkTextOf(Tables(s, dir, "documents")),
    Some(s"""
      WITH d AS (SELECT doc_id, doc_id % $Shards AS shard,
                        regexp_split_to_array(trim(text), '\\s+') AS ws,
                        CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
                          AS n
                 FROM documents
                 WHERE trim(text) <> ''),
      o AS (SELECT doc_id, shard, ws, n,
                   CAST(sum(n) OVER (PARTITION BY shard ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS end_off
            FROM d),
      e AS (SELECT shard, ws, end_off - n AS start_off, end_off,
                   unnest(generate_series((end_off - n) // $ContextTokens,
                                          (end_off - 1) // $ContextTokens)) AS bin
            FROM o),
      f AS (SELECT shard, bin, start_off,
                   ws[CAST(greatest(bin * $ContextTokens, start_off) - start_off + 1 AS BIGINT)
                      : CAST(least((bin + 1) * $ContextTokens, end_off) - start_off AS BIGINT)]
                     AS frag
            FROM e)
      SELECT shard, bin,
             CAST(sum(len(frag)) AS BIGINT) AS n_seq_tokens,
             array_to_string(flatten(list(frag ORDER BY start_off)), ' ')
               AS seq_text
      FROM f
      GROUP BY shard, bin"""))

  /** Equi-width document-length histogram — the pre-packing diagnostic
    * that sizes [[pack]]'s context budget and predicts padding waste:
    * docs bucketed by token count (width 16), each bucket reporting its
    * doc count and total tokens. One map-side-combined aggregate on a
    * domain-bounded (length-bucket) key space; the same histogram shape
    * `percentile_2pass` and the window-quantile family reduce over, here
    * exposed as the report itself.
    */
  val lengthHistogram = QueryDef(
    "doc_length_histogram",
    (s, dir) => {
      Tables(s, dir, "documents")
        .select(size(TextAnalysis.tokens(col("text"))).cast(LongType)
          .as("n_tokens"))
        .select(expr("n_tokens div 16").as("bucket"), col("n_tokens"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"))
    },
    Some("""
      WITH t AS (
        SELECT CAST(len(regexp_split_to_array(trim(text), '\s+'))
                    AS BIGINT) AS n_tokens
        FROM documents)
      SELECT n_tokens // 16 AS bucket, count(*) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
      FROM t GROUP BY 1"""))

  /** Sentence segmentation (r12) — the boundary-respecting chunker
    * face next to [[chunk]]'s fixed token windows: RAG pipelines split
    * at sentence boundaries so a chunk never cuts a thought mid-word.
    * The synthetic corpus carries no punctuation, so a deterministic
    * planting pass inserts `.` after every 5th token first (the
    * plantedCorpus pattern), then the operator segments on the
    * `[.!?] +` boundary class and emits (doc_id, sent_idx, sentence,
    * n_tokens) — the feed a sentence-packing or embedding step
    * consumes. Regexes stay in the Java∩RE2 common dialect; only the
    * replacement syntax differs ($1 Spark, \\1 DuckDB) and both mean
    * the same capture.
    * Scale: per-row regexp + split + explode — shuffle-free, the
    * explode fan-out bounded by sentence count per doc.
    */
  val chunkSentences = QueryDef(
    "chunk_sentences",
    (s, dir) => {
      val planted = regexp_replace(col("text"),
        "((?:\\S+ ){4}\\S+) ", "$1. ")
      Tables(s, dir, "documents")
        .select(col("doc_id"), split(planted, "[.!?] +").as("arr"))
        .select(col("doc_id"), posexplode(col("arr")))
        .select(col("doc_id"), col("pos").cast("int").as("sent_idx"),
          col("col").as("sentence"))
        .filter(length(trim(col("sentence"))) > 0)
        .withColumn("n_tokens",
          size(TextAnalysis.tokens(col("sentence"))).cast(LongType))
    },
    Some("""
      WITH p AS (
        SELECT doc_id,
               regexp_split_to_array(
                 regexp_replace(text, '((?:\S+ ){4}\S+) ', '\1. ', 'g'),
                 '[.!?] +') AS arr
        FROM documents),
      e AS (
        SELECT doc_id,
               CAST(unnest(generate_series(1, len(arr))) - 1 AS INT)
                 AS sent_idx,
               unnest(arr) AS sentence
        FROM p)
      SELECT doc_id, sent_idx, sentence,
             CAST(len(list_filter(
               regexp_split_to_array(trim(sentence), '\s+'),
               t -> len(t) > 0)) AS BIGINT) AS n_tokens
      FROM e
      WHERE length(trim(sentence)) > 0"""))

  val all: Seq[QueryDef] =
    Seq(chunk, chunkSentences, pack, packChunkText, lengthHistogram)
}
