package graft.ext

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for LLM-data pipelines (SURVEY.md §2.4):
  * token/char statistics, rule-based quality scoring, n-gram language
  * ID, and rolling-hash fingerprinting — all over the `documents` table,
  * all shuffle-free per-row column functions (scale = embarrassingly
  * parallel scan).
  */
object TextAnalysis {

  /** Whitespace tokens of trimmed text (codegen'd split). */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Word n-gram shingles (distinct), empty below n words — declarative
    * form. NOTE: the chained higher-order array functions cost ~1ms/doc
    * (measured); use [[shinglesUdf]] on hot paths. */
  def shingles(c: Column, n: Int): Column = {
    val w = tokens(c)
    array_distinct(
      when(size(w) >= n,
        transform(sequence(lit(1), size(w) - (n - 1)),
          i => array_join(slice(w, i, lit(n)), " ")))
        .otherwise(array().cast(ArrayType(StringType))))
  }

  /** Same semantics as [[shingles]] (split on \s+ of trimmed text,
    * space-joined n-grams, distinct) as one compact UDF — ~100× faster
    * than the interpreted higher-order expression chain. */
  def shinglesUdf(n: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String) =>
      // null text behaves like empty text (built-in split/trim would
      // null-propagate; a raw .trim would NPE the whole job)
      val w = Option(text).getOrElse("").trim.split("\\s+")
      if (w.length < n) Array.empty[String]
      else w.sliding(n).map(_.mkString(" ")).toArray.distinct
    }

  val stopwords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is")

  /** Integer-only per-document statistics (ratios derivable downstream;
    * integers keep the oracle hash exact).
    */
  val stats = QueryDef(
    "text_stats",
    (s, dir) => {
      val t = tokens(col("text"))
      Tables(s, dir, "documents").select(
        col("doc_id"),
        length(col("text")).as("n_chars"),
        size(t).as("n_tokens"),
        size(array_distinct(t)).as("n_uniq_tokens"),
        size(filter(t, w => w.isin(stopwords: _*))).as("n_stopwords"))
    },
    Some(s"""
      SELECT doc_id,
             length(text) AS n_chars,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
             len(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS n_uniq_tokens,
             len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                 w -> w IN (${stopwords.map("'" + _ + "'").mkString(",")}))) AS n_stopwords
      FROM documents"""))

  /** Rule-based quality gate (Gopher/C4-style length + stopword-density
    * heuristics), pure integer logic so both engines agree exactly.
    */
  val quality = QueryDef(
    "text_quality",
    (s, dir) => {
      val t = tokens(col("text"))
      val nTok = size(t)
      val nStop = size(filter(t, w => w.isin(stopwords: _*)))
      val meanLenOk = length(col("text")) <= nTok * 15 // avg token len <= 15
      Tables(s, dir, "documents").select(
        col("doc_id"),
        when(nTok.between(10, 10000) && nStop * 20 >= nTok && meanLenOk,
          lit("keep")).otherwise(lit("drop")).as("quality"))
    },
    Some(s"""
      SELECT doc_id,
             CASE WHEN len(regexp_split_to_array(trim(text), '\\s+')) BETWEEN 10 AND 10000
                   AND len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                       w -> w IN (${stopwords.map("'" + _ + "'").mkString(",")}))) * 20
                       >= len(regexp_split_to_array(trim(text), '\\s+'))
                   AND length(text) <= len(regexp_split_to_array(trim(text), '\\s+')) * 15
                  THEN 'keep' ELSE 'drop' END AS quality
      FROM documents"""))

  // --- language ID (n-gram heuristic; not SQL-expressible → tests) ----

  /** Tiny public-knowledge marker profiles; scored by distinct-marker
    * hits, ties broken alphabetically. CJK codepoints short-circuit zh.
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is", "ing ", " th"),
    "es" -> Seq("el ", "la ", "los", "ción", "de ", "que"),
    "de" -> Seq("der", "die", "und", "sch", "ein", "ich"),
    "fr" -> Seq("le ", "les", "des", "est", "une", "eau"))

  def langIdOf(rawText: String): String = {
    val text = Option(rawText).getOrElse("")
    if (text.exists(ch => ch >= '一' && ch <= '鿿')) "zh"
    else {
      val lower = text.toLowerCase
      val scored = langMarkers.toSeq.map { case (lang, ms) =>
        (-ms.count(lower.contains), lang)
      }
      scored.min._2
    }
  }

  val langId = QueryDef(
    "lang_id",
    (s, dir) => {
      val f = udf(langIdOf _)
      Tables(s, dir, "documents").select(
        col("doc_id"), f(col("text")).as("lang_pred"))
    },
    // the marker heuristic IS SQL: per-language count of contained
    // markers, max count wins, ties resolved in ascending language
    // order (the CASE chain mirrors Scala's (-count, lang) min). The
    // testdata is ASCII, so lower() agrees across engines.
    Some("""
      WITH s AS (SELECT doc_id, text, lower(text) AS t FROM documents),
      c AS (SELECT doc_id, text,
        contains(t,'the')::INT + contains(t,'and')::INT + contains(t,'of')::INT +
        contains(t,'is')::INT + contains(t,'ing ')::INT + contains(t,' th')::INT AS cen,
        contains(t,'el ')::INT + contains(t,'la ')::INT + contains(t,'los')::INT +
        contains(t,'ción')::INT + contains(t,'de ')::INT + contains(t,'que')::INT AS ces,
        contains(t,'der')::INT + contains(t,'die')::INT + contains(t,'und')::INT +
        contains(t,'sch')::INT + contains(t,'ein')::INT + contains(t,'ich')::INT AS cde,
        contains(t,'le ')::INT + contains(t,'les')::INT + contains(t,'des')::INT +
        contains(t,'est')::INT + contains(t,'une')::INT + contains(t,'eau')::INT AS cfr
        FROM s)
      SELECT doc_id,
        CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
             WHEN cde >= cen AND cde >= ces AND cde >= cfr THEN 'de'
             WHEN cen >= ces AND cen >= cfr THEN 'en'
             WHEN ces >= cfr THEN 'es'
             ELSE 'fr' END AS lang_pred
      FROM c"""))

  // --- fingerprint (rolling hash; oracled via HUGEINT mod 2^64) ------

  /** 64-bit polynomial rolling hash (Karp-Rabin family) over normalized
    * tokens — order-sensitive document fingerprint.
    */
  def fingerprintOf(text: String): Long = {
    val B = 1000003L
    var h = 1469598103934665603L // FNV offset as seed
    Option(text).getOrElse("").trim.split("\\s+").foreach { tok =>
      var th = -3750763034362895579L // FNV-1a 64 offset basis (wrapped)
      tok.foreach(ch => th = th * 1099511628211L + ch.toLong)
      h = h * B + th
    }
    h
  }

  val fingerprint = QueryDef(
    "doc_fingerprint",
    (s, dir) => {
      val f = udf(fingerprintOf _)
      Tables(s, dir, "documents").select(
        col("doc_id"), f(col("text")).as("fp"))
    },
    // Scala's wrapping Long arithmetic replayed exactly: fold in
    // UBIGINT with every step taken mod 2^64 through HUGEINT (DuckDB
    // integer ops error on overflow rather than wrap), then the final
    // unsigned value re-interpreted as signed 64-bit. list_reduce in
    // DuckDB v1.0 has no init parameter, so the seed is prepended as
    // the first list element.
    Some("""
      WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
        FROM documents),
      th AS (
        SELECT doc_id, list_transform(ws, tok ->
          list_reduce(
            [CAST(14695981039346656037 AS UBIGINT)] ||
              list_transform(list_filter(string_split(tok,''), c -> c <> ''),
                             c -> CAST(unicode(c) AS UBIGINT)),
            (acc, ch) -> CAST((acc::HUGEINT * 1099511628211 + ch)
                              % 18446744073709551616 AS UBIGINT))) AS ths
        FROM toks)
      SELECT doc_id,
        CAST(CASE WHEN r >= 9223372036854775808
                  THEN r::HUGEINT - 18446744073709551616
                  ELSE r::HUGEINT END AS BIGINT) AS fp
      FROM (
        SELECT doc_id,
          list_reduce([CAST(1469598103934665603 AS UBIGINT)] || ths,
            (acc, t) -> CAST((acc::HUGEINT * 1000003 + t)
                             % 18446744073709551616 AS UBIGINT)) AS r
        FROM th)"""))

  /** Approximate BPE-ish token count: whitespace words plus an extra
    * token per 4 chars of long words (public rule of thumb: ~4 chars per
    * subword token). SQL-expressible in integers.
    */
  val tokenCount = QueryDef(
    "token_count",
    (s, dir) => {
      val t = tokens(col("text"))
      Tables(s, dir, "documents").select(
        col("doc_id"),
        size(t).as("n_words"),
        aggregate(t, lit(0),
          (acc, w) => acc + greatest(lit(1), ceil(length(w) / 4.0).cast(IntegerType)))
          .as("n_subword_est"))
    },
    Some("""
      SELECT doc_id,
             len(regexp_split_to_array(trim(text), '\s+')) AS n_words,
             list_sum(list_transform(regexp_split_to_array(trim(text), '\s+'),
               w -> greatest(1, CAST(ceil(length(w) / 4.0) AS INT))))::INT AS n_subword_est
      FROM documents"""))

  /** Repetition signal (Gopher-style): total and top 2-gram occurrence
    * counts per doc — a high max/total ratio marks boilerplate or
    * degenerate repetition. Non-distinct n-grams (counts, not sets).
    * Scale: one shuffle on (doc_id, gram) with map-side combine, then
    * one on doc_id.
    */
  val repetition = QueryDef(
    "text_repetition",
    (s, dir) => {
      val grams2 = udf { (text: String) =>
        val w = Option(text).getOrElse("").trim.split("\\s+")
        if (w.length < 2) Array.empty[String]
        else w.sliding(2).map(_.mkString(" ")).toArray
      }
      Tables(s, dir, "documents")
        .select(col("doc_id"), explode(grams2(col("text"))).as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum(col("c")).as("n_2grams"),
          max(col("c")).as("max_2gram_count"))
    },
    Some("""
      WITH g AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(ws) - 1),
                 i -> ws[i] || ' ' || ws[i + 1])) AS g
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
              FROM documents)
        WHERE len(ws) >= 2),
      c AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2)
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_2grams,
             max(c) AS max_2gram_count
      FROM c GROUP BY 1"""))

  /** PII scrubbing: redact email addresses (the pattern is identical in
    * Java and RE2 regex dialects, so both engines agree byte-for-byte).
    * The corpus plants a deterministic email on every 10th doc so the
    * operator is non-trivially exercised. Per-row, shuffle-free.
    */
  val piiScrub = QueryDef(
    "text_pii_scrub",
    (s, dir) => {
      val re = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val withPii = Tables(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 10 === 0,
          concat(col("text"), lit(" contact"), col("doc_id"),
            lit("@example.com")))
          .otherwise(col("text")).as("text"))
      withPii.select(
        col("doc_id"),
        regexp_count(col("text"), lit(re)).as("n_emails"),
        regexp_replace(col("text"), re, "<EMAIL>").as("redacted"))
    },
    Some("""
      WITH withpii AS (
        SELECT doc_id,
               CASE WHEN doc_id % 10 = 0
                    THEN text || ' contact' || doc_id || '@example.com'
                    ELSE text END AS text
        FROM documents)
      SELECT doc_id,
             len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
               '<EMAIL>', 'g') AS redacted
      FROM withpii"""))

  /** Text normalization: lowercase, strip non-alphanumerics, collapse
    * whitespace — the canonicalization step before exact dedup (its
    * output is what sha2-groupBy dedup should hash). Per-row, shuffle-
    * free; simple character classes so both regex dialects agree.
    */
  val normalize = QueryDef(
    "text_normalize",
    (s, dir) => {
      Tables(s, dir, "documents").select(
        col("doc_id"),
        trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "),
          " +", " ")).as("norm_text"))
    },
    Some("""
      SELECT doc_id,
             trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
               ' +', ' ', 'g')) AS norm_text
      FROM documents"""))

  val all: Seq[QueryDef] =
    Seq(stats, quality, langId, fingerprint, tokenCount, repetition,
      piiScrub, normalize)
}
