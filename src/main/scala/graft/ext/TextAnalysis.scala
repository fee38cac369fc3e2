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

  /** Whitespace tokens of trimmed text (codegen'd split). Spark's
    * `trim` strips ASCII SPACE only — the same default as the DuckDB
    * `trim` the oracle SQL uses, so this is the spelling for columns
    * whose oracle contract is `regexp_split_to_array(trim(text), ..)`.
    * For the shingle/dedup path use [[tokensWs]], whose trim matches
    * the UDF tokenizer on tab/newline-bordered text.
    *
    * ==Which tokenizer does my operator use? (r14 ADVICE)==
    * Two regimes coexist, each pinned to its oracle's trim spelling; a
    * new caller MUST pick the variant its oracle (and any native-guard
    * ⟺ UDF equivalence) is written against:
    *
    * | family | variant | oracle trim spelling |
    * |---|---|---|
    * | text stats / quality / curation gates | [[tokens]] | `trim(text)` (space-only) |
    * | vocab / TF-IDF / token-count / OOV / UNK | [[tokens]] | `trim(text)` |
    * | SimHash token frequencies | [[tokens]] | `trim(text)` |
    * | shingles / all near-dup (MinHash, Jaccard, containment, clusters, keep-best, incremental, decontam) | [[tokensWs]]/[[wsTokens]] | explicit class via [[wsSplitSql]] |
    * | bigram LM / ccnet fluency | [[wsTokens]] (via `Corpus.bigrams`) | [[wsSplitSql]] |
    * | DSIR feature buckets | [[wsTokens]] | explicit class (Dsir.weightsSql) |
    */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** DuckDB oracle spelling of [[tokensWs]]/[[wsTokens]]: trim + split
    * on the EXPLICIT whitespace class `[ \t\n\r\f\x0b]` (== Java regex
    * `\s`). RE2's `\s` lacks `\x0b` and DuckDB's `trim()` is
    * space-only, so both sides of the cross-engine contract spell the
    * class out — the oracle then matches the engine on tab/newline/
    * VT-bordered text too, instead of resting on the committed
    * testdata having space-only edge whitespace (r14 ADVICE; the same
    * spelling Dsir.weightsSql already used). */
  def wsSplitSql(expr: String): String = {
    val c = "[ \\t\\n\\r\\f\\x0b]"
    s"regexp_split_to_array(" +
      s"regexp_replace($expr, '^$c+|$c+$$', '', 'g'), '$c+')"
  }

  /** Whitespace-ROBUST tokens: regex-trims all `\s` (tab, newline, CR,
    * FF, VT — Java regex semantics, identical on executor and in
    * [[shinglesUdf]]'s `replaceAll`) before splitting. This is the
    * exact native twin of the UDF tokenization: for every input,
    * `size(tokensWs(text)) == shinglesUdf-token-count`, which is what
    * makes the shingle guard in [[Dedup.shingleSets]] provably
    * equivalent to "the shingle array is non-empty" (r13 ADVICE: the
    * space-only `trim` let a tab-bordered doc with n-1 real words pass
    * the guard while the UDF produced an EMPTY shingle set, whose
    * all-MaxValue minhash signature collides in every band). */
  def tokensWs(c: Column): Column =
    split(regexp_replace(c, "^\\s+|\\s+$", ""), "\\s+")

  // compiled ONCE: these run per ROW inside the hottest UDFs (the
  // shingle pass, DSIR featureBuckets) — String.replaceAll/split would
  // Pattern.compile on every document (r14 review). Pattern is
  // thread-safe; only Matchers are per-call.
  private[graft] val WsEdge =
    java.util.regex.Pattern.compile("^\\s+|\\s+$")
  private[graft] val WsRun = java.util.regex.Pattern.compile("\\s+")

  /** JVM-side twin of [[tokensWs]] (null ⇒ like empty text; empty
    * text ⇒ one "" token, exactly like String.split). */
  private[graft] def wsTokens(text: String): Array[String] =
    WsRun.split(WsEdge.matcher(Option(text).getOrElse("")).replaceAll(""))

  /** Word n-gram shingles (distinct), empty below n words — declarative
    * form. NOTE: the chained higher-order array functions cost ~1ms/doc
    * (measured); use [[shinglesUdf]] on hot paths. */
  def shingles(c: Column, n: Int): Column = {
    val w = tokensWs(c)
    array_distinct(
      when(size(w) >= n,
        transform(sequence(lit(1), size(w) - (n - 1)),
          i => array_join(slice(w, i, lit(n)), " ")))
        .otherwise(array().cast(ArrayType(StringType))))
  }

  /** Same semantics as [[shingles]] (split on \s+ of regex-trimmed
    * text, space-joined n-grams, distinct) as one compact UDF — ~100×
    * faster than the interpreted higher-order expression chain. Trims
    * via the SAME Java `\s` regex as [[tokensWs]] (NOT `String.trim`,
    * which also strips control chars < U+0009 — r13 ADVICE: the two
    * trims disagreed on which docs shingle to empty, breaking the
    * native-guard ⟺ non-empty-shingles equivalence). */
  def shinglesUdf(n: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String) =>
      // wsTokens: null text behaves like empty text, and the trim/split
      // Patterns are compiled once, not per document.
      // Hand-rolled window loop (r20 optimization round): the previous
      // `w.sliding(n).map(_.mkString(" ")).toArray.distinct` spends most
      // of its time in Scala collection machinery — Iterator.sliding
      // allocates a fresh ArraySeq per window and distinct re-hashes
      // into a second array. One reused StringBuilder + a
      // LinkedHashSet produces the IDENTICAL array (space-joined
      // n-grams, first-occurrence order = sliding+distinct's order)
      // at a fraction of the allocation. This UDF is the hottest code
      // in the suite (every shingle-family key runs it per document).
      val w = wsTokens(text)
      if (w.length < n) Array.empty[String]
      else {
        val seen = new java.util.LinkedHashSet[String](
          math.max(8, (w.length - n + 1) * 2))
        val sb = new java.lang.StringBuilder(64)
        var i = 0
        val last = w.length - n
        while (i <= last) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(w(i + j))
            j += 1
          }
          seen.add(sb.toString): Unit
          i += 1
        }
        seen.toArray(new Array[String](seen.size()))
      }
    }

  /** HASHED word n-gram shingles — `tokenHash` of each space-joined
    * n-gram (bit-for-bit: the fold runs over the same UTF-16 units the
    * joined string would contain, separators included), distinct,
    * first-occurrence order; empty below n words. The r20 pair-family
    * payload cut (guide §2.3 "shuffle keys, not payloads"): every
    * inverted-index explode, candidate equi-join, verify-side shuffle
    * and published index segment carried ~25-char shingle STRINGS whose
    * only uses are equality joins, distinct-counting and set
    * intersection — an 8-byte id serves all three at a fraction of the
    * shuffle bytes and compare cost, and no n-gram string is ever
    * materialized (the hash folds straight over the token chars).
    *
    * Identity: tokenHash, NOT a new family — MinHash signatures
    * (which already based on tokenHash(shingle)) are unchanged
    * bit-for-bit, so banding plans and published band-bucket tables
    * are unaffected. Collision bound: two distinct n-grams colliding
    * within one comparison universe is p ≈ k²/2⁶⁵ (k = distinct
    * shingles in scope) — negligible to ~1e8 shingles, the same
    * documented regime as [[graft.ext.Dedup.repeatedSpans]]' xxhash64
    * gram ids; a 100 TB corpus pairs this with a 128-bit fold (two
    * seeds), same plan. PropertySpec pins equality with
    * tokenHash-of-declarative-shingles on arbitrary text. */
  def shingleHashesUdf(n: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String) =>
      val w = wsTokens(text)
      if (w.length < n) Array.empty[Long]
      else {
        val seen = new java.util.LinkedHashSet[java.lang.Long](
          math.max(8, (w.length - n + 1) * 2))
        var i = 0
        val last = w.length - n
        while (i <= last) {
          var h = -3750763034362895579L // FNV-1a 64 offset (wrapped)
          var j = 0
          while (j < n) {
            if (j > 0) h = h * 1099511628211L + ' '.toLong
            val t = w(i + j)
            var c = 0
            while (c < t.length) {
              h = h * 1099511628211L + t.charAt(c).toLong
              c += 1
            }
            j += 1
          }
          seen.add(h): Unit
          i += 1
        }
        val out = new Array[Long](seen.size())
        val it = seen.iterator()
        var k = 0
        while (it.hasNext) { out(k) = it.next(); k += 1 }
        out
      }
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

  /** Embedded per-language training snippets (sentences of common
    * words, public linguistic knowledge) — the tiny corpus the char
    * trigram profiles are trained on at class load. A real deployment
    * swaps these for a larger sample table; the MODEL (truncated
    * ranked trigram profile, Cavnar–Trenkle family) is the real one.
    */
  val langSamples: Map[String, String] = Map(
    "en" -> ("the quick brown fox jumps over the lazy dog and then it was " +
      "running through the woods with all of the other animals that they " +
      "had seen in this story which is one of the best known sentences " +
      "in the english language for testing and it should have enough " +
      "of the most common words that the profile is representative"),
    "es" -> ("el rápido zorro marrón salta sobre el perro perezoso y " +
      "luego la ciudad estaba llena de gente que quería ver los colores " +
      "de la mañana con una canción que todos conocían porque es parte " +
      "de la historia y de la lengua española con muchas palabras " +
      "comunes para que el perfil sea representativo de este idioma"),
    "de" -> ("der schnelle braune fuchs springt über den faulen hund und " +
      "dann war die stadt voller menschen die das licht des morgens " +
      "sehen wollten mit einem lied das ich schon kannte weil es ein " +
      "teil der deutschen geschichte ist und genug häufige wörter " +
      "enthält damit das profil dieser sprache repräsentativ wird"),
    "fr" -> ("le rapide renard brun saute par dessus le chien paresseux " +
      "et puis la ville était pleine de gens qui voulaient voir les " +
      "couleurs du matin avec une chanson que tout le monde connaissait " +
      "parce que c'est une partie de l'histoire et de la langue " +
      "française avec assez de mots communs pour que le profil soit " +
      "représentatif de cette langue"))

  /** Profile depth: the classic truncated-profile size; weight of a
    * profile trigram = ProfileN − rank (rank by count desc, trigram
    * asc — total and deterministic). */
  val LangProfileN = 64

  private def charTrigrams(t: String): Iterator[String] =
    if (t.length < 3) Iterator.empty
    else (0 to t.length - 3).iterator.map(i => t.substring(i, i + 3))

  /** lang -> (trigram -> weight): trained once from [[langSamples]]. */
  lazy val langProfiles: Map[String, Map[String, Int]] =
    langSamples.map { case (lang, sample) =>
      val counts = charTrigrams(sample.toLowerCase)
        .toSeq.groupBy(identity).view.mapValues(_.size).toSeq
      val top = counts.sortBy { case (tri, c) => (-c, tri) }
        .take(LangProfileN)
      lang -> top.zipWithIndex
        .map { case ((tri, _), r) => tri -> (LangProfileN - r) }.toMap
    }

  /** n-gram-profile language ID: score = Σ over the doc's char-trigram
    * OCCURRENCES of the language profile's weight; argmax wins, ties
    * (including the all-zero doc) resolve in ascending language order.
    * CJK codepoints short-circuit zh (no trigram profile needed).
    */
  def langIdOf(rawText: String): String = {
    val text = Option(rawText).getOrElse("")
    if (text.exists(ch => ch >= '一' && ch <= '鿿')) "zh"
    else {
      val lower = text.toLowerCase
      val scored = langProfiles.toSeq.map { case (lang, prof) =>
        (-charTrigrams(lower).map(prof.getOrElse(_, 0)).sum, lang)
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
    // the trained profile replays in SQL: the trigram weight table is
    // embedded as VALUES (it is a deterministic function of the
    // embedded samples), per-doc per-lang scores are integer sums over
    // trigram occurrences, and the CASE chain mirrors Scala's
    // (-score, lang) min tie-break. The testdata is ASCII, so lower()
    // and char slicing agree across engines.
    Some {
      def q(str: String) = "'" + str.replace("'", "''") + "'"
      val values = langProfiles.toSeq.sortBy(_._1).flatMap {
        case (lang, prof) => prof.toSeq.sorted.map {
          case (tri, wt) => s"(${q(tri)}, ${q(lang)}, $wt)" }
      }.mkString(",\n        ")
      s"""
      WITH s AS (SELECT doc_id, text, lower(text) AS t FROM documents),
      g AS (SELECT doc_id,
                   unnest(list_transform(range(1, len(t) - 1),
                                         i -> t[i:i+2])) AS tri
            FROM s),
      w(tri, lang, wt) AS (VALUES
        $values),
      sc AS (SELECT doc_id, lang, sum(wt) AS score
             FROM g JOIN w USING (tri) GROUP BY 1, 2),
      p AS (SELECT doc_id,
                   coalesce(max(CASE WHEN lang = 'de' THEN score END), 0) AS sde,
                   coalesce(max(CASE WHEN lang = 'en' THEN score END), 0) AS sen,
                   coalesce(max(CASE WHEN lang = 'es' THEN score END), 0) AS ses,
                   coalesce(max(CASE WHEN lang = 'fr' THEN score END), 0) AS sfr
            FROM sc GROUP BY 1)
      SELECT s.doc_id,
        CASE WHEN regexp_matches(s.text, '[一-鿿]') THEN 'zh'
             WHEN coalesce(sde, 0) >= coalesce(sen, 0)
              AND coalesce(sde, 0) >= coalesce(ses, 0)
              AND coalesce(sde, 0) >= coalesce(sfr, 0) THEN 'de'
             WHEN coalesce(sen, 0) >= coalesce(ses, 0)
              AND coalesce(sen, 0) >= coalesce(sfr, 0) THEN 'en'
             WHEN coalesce(ses, 0) >= coalesce(sfr, 0) THEN 'es'
             ELSE 'fr' END AS lang_pred
      FROM s LEFT JOIN p USING (doc_id)"""
    })

  // --- fingerprint (rolling hash; oracled via HUGEINT mod 2^64) ------

  /** Portable 64-bit token hash: multiply-add fold over UTF-16 units
    * (FNV offset/prime constants), wrapping mod 2^64 — replayable
    * exactly in DuckDB via HUGEINT-mod-2^64 list_reduce (see the
    * [[fingerprint]] oracle). Shared by the fingerprint and the SimHash
    * signatures so every hash-bearing key stays oracle-able.
    */
  def tokenHash(tok: String): Long = {
    var th = -3750763034362895579L // FNV-1a 64 offset basis (wrapped)
    tok.foreach(ch => th = th * 1099511628211L + ch.toLong)
    th
  }

  /** DuckDB replay of [[tokenHash]] for a VARCHAR sql expression:
    * char-fold in UBIGINT with each step mod 2^64 through HUGEINT
    * (DuckDB integer ops error on overflow rather than wrap). The JVM
    * side folds UTF-16 CODE UNITS while DuckDB's string_split yields
    * codepoints, so supplementary-plane characters (emoji, rare CJK)
    * are re-encoded as their surrogate pair here — the fold matches
    * [[tokenHash]] on ALL inputs, not just the BMP (round-6 advice;
    * verified against the JVM fold for emoji/astral CJK). */
  def tokenHashSql(tok: String): String =
    s"""list_reduce(
            [CAST(14695981039346656037 AS UBIGINT)] ||
              flatten(list_transform(
                list_filter(string_split($tok,''), c -> c <> ''),
                c -> CASE WHEN unicode(c) > 65535 THEN
                       [CAST(55296 + (unicode(c) - 65536) // 1024 AS UBIGINT),
                        CAST(56320 + (unicode(c) - 65536) % 1024 AS UBIGINT)]
                     ELSE [CAST(unicode(c) AS UBIGINT)] END)),
            (acc, ch) -> CAST((acc::HUGEINT * 1099511628211 + ch)
                              % 18446744073709551616 AS UBIGINT))"""

  /** 64-bit polynomial rolling hash (Karp-Rabin family) over normalized
    * tokens — order-sensitive document fingerprint.
    */
  def fingerprintOf(text: String): Long = {
    val B = 1000003L
    var h = 1469598103934665603L // FNV offset as seed
    Option(text).getOrElse("").trim.split("\\s+").foreach { tok =>
      h = h * B + tokenHash(tok)
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
        // NOTE: String.trim + split — this key's historical (and
        // oracle-matched) tokenization; do not swap for wsTokens.
        // Hand-rolled window (r20): Iterator.sliding allocates one
        // ArraySeq per window — identical output, less allocation.
        val w = Option(text).getOrElse("").trim.split("\\s+")
        if (w.length < 2) Array.empty[String]
        else {
          val out = new Array[String](w.length - 1)
          var i = 0
          while (i < out.length) {
            out(i) = new java.lang.StringBuilder(
              w(i).length + w(i + 1).length + 1)
              .append(w(i)).append(' ').append(w(i + 1)).toString
            i += 1
          }
          out
        }
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
  /** PII scrub over four kinds — emails, card-shaped 4×4 digit runs,
    * NANP-style phone numbers, IPv4s (r19 verdict #5: a real curation
    * pipeline redacts more than emails). One SEQUENTIAL redaction
    * chain (email → card → phone → ip), each stage counting on the
    * PREVIOUS stage's output — later patterns never see text an
    * earlier stage already redacted, so the stages compose without
    * overlap ambiguity, and the oracle replays the identical chain.
    * All four patterns live in the Java∩RE2 portable dialect
    * (character classes, bounded repetition, optional escapes — no
    * lookaround, no backreferences), the `text_html_strip` rule.
    * Planting is deterministic per doc_id with deliberately
    * overlapping residues (a doc can carry several kinds). */
  val piiScrub = QueryDef(
    "text_pii_scrub",
    (s, dir) => {
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val cardRe = "[0-9]{4}([ -][0-9]{4}){3}"
      val phoneRe = "\\(?[0-9]{3}\\)?[ -][0-9]{3}-[0-9]{4}"
      val ipRe = "[0-9]{1,3}(\\.[0-9]{1,3}){3}"
      val d4 = lpad((col("doc_id") % 10000).cast("string"), 4, "0")
      val t0 = when(col("doc_id") % 10 === 0,
        concat(col("text"), lit(" contact"), col("doc_id"),
          lit("@example.com"))).otherwise(col("text"))
      val t1 = when(col("doc_id") % 9 === 0,
        concat(t0, lit(" card 4111 1111 1111 "), d4)).otherwise(t0)
      val t2 = when(col("doc_id") % 7 === 0,
        concat(t1, lit(" call (555) 123-"), d4)).otherwise(t1)
      val planted = when(col("doc_id") % 11 === 0,
        concat(t2, lit(" from 192.168."),
          (col("doc_id") % 256).cast("string"), lit("."),
          (col("doc_id") % 200 + 1).cast("string"))).otherwise(t2)
      Tables(s, dir, "documents")
        .select(col("doc_id"), planted.as("text"))
        .withColumn("n_emails", regexp_count(col("text"), lit(emailRe)))
        .withColumn("r1", regexp_replace(col("text"), emailRe, "<EMAIL>"))
        .withColumn("n_cards", regexp_count(col("r1"), lit(cardRe)))
        .withColumn("r2", regexp_replace(col("r1"), cardRe, "<CARD>"))
        .withColumn("n_phones", regexp_count(col("r2"), lit(phoneRe)))
        .withColumn("r3", regexp_replace(col("r2"), phoneRe, "<PHONE>"))
        .withColumn("n_ips", regexp_count(col("r3"), lit(ipRe)))
        .withColumn("redacted", regexp_replace(col("r3"), ipRe, "<IP>"))
        .select("doc_id", "n_emails", "n_cards", "n_phones", "n_ips",
          "redacted")
    },
    Some("""
      WITH withpii AS (
        SELECT doc_id,
               CASE WHEN doc_id % 10 = 0
                    THEN text || ' contact' || doc_id || '@example.com'
                    ELSE text END
               AS t0
        FROM documents),
      p1 AS (SELECT doc_id,
               CASE WHEN doc_id % 9 = 0
                    THEN t0 || ' card 4111 1111 1111 ' ||
                         lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    ELSE t0 END AS t1
             FROM withpii),
      p2 AS (SELECT doc_id,
               CASE WHEN doc_id % 7 = 0
                    THEN t1 || ' call (555) 123-' ||
                         lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    ELSE t1 END AS t2
             FROM p1),
      planted AS (SELECT doc_id,
               CASE WHEN doc_id % 11 = 0
                    THEN t2 || ' from 192.168.' ||
                         CAST(doc_id % 256 AS VARCHAR) || '.' ||
                         CAST(doc_id % 200 + 1 AS VARCHAR)
                    ELSE t2 END AS text
             FROM p2),
      s1 AS (SELECT doc_id,
               len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                 AS n_emails,
               regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                 '<EMAIL>', 'g') AS r1
             FROM planted),
      s2 AS (SELECT doc_id, n_emails,
               len(regexp_extract_all(r1, '[0-9]{4}([ -][0-9]{4}){3}'))
                 AS n_cards,
               regexp_replace(r1, '[0-9]{4}([ -][0-9]{4}){3}',
                 '<CARD>', 'g') AS r2
             FROM s1),
      s3 AS (SELECT doc_id, n_emails, n_cards,
               len(regexp_extract_all(r2,
                 '\(?[0-9]{3}\)?[ -][0-9]{3}-[0-9]{4}')) AS n_phones,
               regexp_replace(r2, '\(?[0-9]{3}\)?[ -][0-9]{3}-[0-9]{4}',
                 '<PHONE>', 'g') AS r3
             FROM s2)
      SELECT doc_id, n_emails, n_cards, n_phones,
             len(regexp_extract_all(r3, '[0-9]{1,3}(\.[0-9]{1,3}){3}'))
               AS n_ips,
             regexp_replace(r3, '[0-9]{1,3}(\.[0-9]{1,3}){3}',
               '<IP>', 'g') AS redacted
      FROM s3"""))

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

  /** Corpus-level boilerplate-line removal — the C4/RefinedWeb cleaning
    * rule `dedup_lines` only measures: a LINE that recurs across a
    * meaningful fraction of documents (nav text, footers, cookie
    * banners) is dropped from every document; everything else keeps its
    * original order. The testdata corpus has no line structure, so
    * lines are planted deterministically — each doc becomes its 10-word
    * windows, and two boilerplate footers are appended to every 3rd /
    * 5th doc (df ≈ n/3 and n/5 clear the ≥10%-of-docs bar by design;
    * every natural window is unique word soup).
    *
    * Shape at 100 TB: line df is one distinct + one count aggregate
    * keyed by the line (hash the line text for 8-byte shuffle keys at
    * scale, exactly like `dedup_exact`), the flag join streams the
    * corpus past the line-df table once, and the rebuild is one
    * groupBy(doc_id) whose state is a single document — no window, no
    * driver state, nothing all-pairs. Reference: the reference's SQL
    * escape hatch reaches arbitrary cleaning like this
    * (processor.py:44 execute_sql); the operator itself follows
    * Raffel et al. 2020 (C4) §2.2's line-filter family.
    */
  val Footer1 = "subscribe to our newsletter for daily updates"
  val Footer2 = "all rights reserved terms of service apply"

  def boilerplateOf(docsIn: DataFrame): DataFrame = {
      val docs = docsIn.select(col("doc_id"), col("text"))
      // 10-word windows as one compact UDF — same semantics as the
      // declarative transform(sequence)+slice chain (split on \s+ of
      // trimmed text, grouped in 10s, space-joined; empty text → one
      // empty line, like the slice form), but the interpreted
      // higher-order chain costs ~1 ms/doc (the shinglesUdf lesson)
      val linesUdf = udf { (text: String) =>
        Option(text).getOrElse("").trim.split("\\s+")
          .grouped(10).map(_.mkString(" ")).toArray
      }
      val base = linesUdf(col("text"))
      val empty = array().cast(ArrayType(StringType))
      val planted = concat(base,
        when(col("doc_id") % 3 === 0, array(lit(Footer1))).otherwise(empty),
        when(col("doc_id") % 5 === 0, array(lit(Footer2))).otherwise(empty))
      val ex = docs
        .select(col("doc_id"), posexplode(planted).as(Seq("pos", "line")))
      val dfs = ex.select("doc_id", "line").distinct()
        .groupBy("line").agg(count(lit(1)).as("df"))
      val nd = docs.agg(count(lit(1)).as("nd"))
      ex.join(dfs, "line").crossJoin(broadcast(nd))
        .select(col("doc_id"), col("pos"), col("line"),
          (col("df") * 10 >= col("nd")).as("boil"))
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_lines"),
          sum(col("boil").cast(LongType)).as("n_removed"),
          array_join(
            transform(
              filter(
                array_sort(collect_list(
                  struct(col("pos"), col("line"), col("boil")))),
                x => !x.getField("boil")),
              x => x.getField("line")),
            ". ").as("clean_text"))
  }

  val boilerplate = QueryDef(
    "text_boilerplate_removal",
    (s, dir) => boilerplateOf(Tables(s, dir, "documents")),
    Some(s"""
      WITH ws AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
        FROM documents),
      l0 AS (
        SELECT doc_id,
               list_transform(generate_series(1, (len(w) + 9) // 10),
                 i -> array_to_string(w[(i-1)*10+1:(i-1)*10+10], ' ')) AS ls
        FROM ws),
      l1 AS (SELECT doc_id,
                    CASE WHEN doc_id % 3 = 0
                         THEN list_append(ls, '$Footer1') ELSE ls END AS ls
             FROM l0),
      l2 AS (SELECT doc_id,
                    CASE WHEN doc_id % 5 = 0
                         THEN list_append(ls, '$Footer2') ELSE ls END AS ls
             FROM l1),
      ex AS (SELECT doc_id,
                    unnest(generate_series(1, len(ls))) - 1 AS pos,
                    unnest(ls) AS line
             FROM l2),
      dfs AS (SELECT line, count(*) AS df
              FROM (SELECT DISTINCT doc_id, line FROM ex) GROUP BY 1),
      nd AS (SELECT count(*) AS nd FROM documents)
      SELECT doc_id, count(*) AS n_lines,
             CAST(sum(CASE WHEN df * 10 >= nd THEN 1 ELSE 0 END) AS BIGINT)
               AS n_removed,
             coalesce(string_agg(CASE WHEN df * 10 < nd THEN line END,
                                 '. ' ORDER BY pos), '') AS clean_text
      FROM ex JOIN dfs USING (line) CROSS JOIN nd
      GROUP BY doc_id"""))

  /** HTML tag stripping — the step a web-crawl ingest (C4/CCNet class)
    * runs before any text analysis: drop comments, drop tags, decode
    * the common entities, collapse whitespace. Distinct from
    * [[boilerplate]] (which removes recurring TEXT lines after
    * markup is gone — this is the markup pass that precedes it). The
    * testdata corpus has no markup, so each doc is deterministically
    * wrapped in a fixed page skeleton (nav div, comment, entities) and
    * the operator must recover the original text plus the nav's
    * now-visible text — a planted-input pattern shared with
    * [[boilerplate]] / dedup's plantedCorpus.
    *
    * Scale: shuffle-free per-row regexp chain (codegen'd), same class
    * as [[normalize]]. The regexes stay in the Java∩RE2 common dialect
    * (`<[^>]*>`, non-greedy comment match) so the DuckDB oracle runs
    * the literally-identical patterns.
    */
  val htmlStrip = QueryDef(
    "text_html_strip",
    (s, dir) => {
      val planted = concat(
        lit("<html><body><!-- generated --><p>"), col("text"),
        lit("</p><div class=\"nav\">home &amp; about &lt;here&gt;</div></body></html>"))
      val noComment = regexp_replace(planted, "<!--.*?-->", " ")
      val noTags = regexp_replace(noComment, "<[^>]*>", " ")
      val decoded =
        regexp_replace(
          regexp_replace(
            regexp_replace(noTags, "&amp;", "&"),
            "&lt;", "<"),
          "&gt;", ">")
      Tables(s, dir, "documents").select(
        col("doc_id"),
        trim(regexp_replace(decoded, "\\s+", " ")).as("text_clean"),
        regexp_count(planted, lit("<[^>]*>")).cast(LongType).as("n_tags"))
    },
    Some("""
      WITH p AS (
        SELECT doc_id,
               '<html><body><!-- generated --><p>' || text ||
               '</p><div class="nav">home &amp; about &lt;here&gt;</div></body></html>'
                 AS h
        FROM documents)
      SELECT doc_id,
             trim(regexp_replace(
               replace(replace(replace(
                 regexp_replace(
                   regexp_replace(h, '<!--.*?-->', ' ', 'g'),
                   '<[^>]*>', ' ', 'g'),
                 '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
               '\s+', ' ', 'g')) AS text_clean,
             CAST(len(regexp_extract_all(h, '<[^>]*>')) AS BIGINT)
               AS n_tags
      FROM p"""))

  // --- trained quality classifier (fastText/DCLM-style linear scorer) --

  /** Stopword list for the quality scorer — larger than the 7-word
    * [[stopwords]] heuristic list so the stopword-rate feature has
    * real dynamic range; embedded verbatim in the oracle SQL. */
  val QsStop: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "was", "it",
    "that", "for", "on", "with", "as", "at", "by", "this", "be", "are",
    "from", "had", "she", "he", "they", "we", "his", "her", "were")

  /** Integer feature vector of a document — the exact arithmetic the
    * Spark columns and the DuckDB oracle replay (floor division over
    * non-negative operands, so `div` and `//` agree):
    * [bias, min(ntoks,1000), 100·nchars/ntoks, 1000·stop/ntoks,
    *  1000·punct/nchars, 1000·digit/nchars, 1000·upper/nchars]. */
  def qsFeatures(rawText: String): Array[Long] = {
    val t = Option(rawText).getOrElse("")
    val toks = t.trim.split("\\s+").filter(_.nonEmpty)
    val ntoks = toks.length.toLong
    // code POINTS, not UTF-16 units — the Spark/DuckDB pipelines both
    // count code points (length()/len()), so non-BMP text must not make
    // the trainer/held-out gate disagree with the shipped scorer
    val nchars = t.codePointCount(0, t.length).toLong
    val dTok = math.max(ntoks, 1L)
    val dCh = math.max(nchars, 1L)
    // Locale.ROOT: the pipelines use locale-independent lower(); a
    // Turkish-default-locale JVM must not dot-less-i the stopword match
    val stop = toks.count(w =>
      QsStop.contains(w.toLowerCase(java.util.Locale.ROOT))).toLong
    val punct = t.count(c => ".,!?;:".indexOf(c.toInt) >= 0).toLong
    val digit = t.count(c => c >= '0' && c <= '9').toLong
    val upper = t.count(c => c >= 'A' && c <= 'Z').toLong
    Array(1L, math.min(ntoks, 1000L), 100L * nchars / dTok,
      1000L * stop / dTok, 1000L * punct / dCh, 1000L * digit / dCh,
      1000L * upper / dCh)
  }

  /** Embedded labeled training snippets (public-knowledge prose vs
    * synthetic spam/boilerplate — the standard LLM-pipeline quality
    * split). Like [[langSamples]], the tiny corpus is the stand-in; the
    * MODEL (integer perceptron over the [[qsFeatures]] vector, the
    * fastText/DCLM linear-scorer family) is the real artifact, and a
    * deployment swaps the samples for its own labeled table. */
  val qsTrainPos: Seq[String] = Seq(
    "The committee reviewed the proposal and agreed to fund the project for another year.",
    "She walked along the river in the early morning and watched the light change on the water.",
    "After the storm had passed, the villagers returned to the fields and began the harvest.",
    "He explained that the results of the experiment were consistent with the earlier findings.",
    "The library was quiet in the afternoon, and she found a seat by the window to read.",
    "They traveled by train across the mountains and arrived at the station before sunset.",
    "In the second chapter, the author describes the history of the city and its markets.",
    "The teacher asked the students to write a short essay about their favorite season.",
    "A gentle rain fell through the night, and by morning the garden was green again.",
    "The engineers tested the bridge for weeks before it was opened to the public.",
    "When the letter arrived, she read it twice and then placed it carefully in the drawer.",
    "The recipe calls for two cups of flour, a pinch of salt, and a spoonful of honey.",
    "Over the years, the small shop on the corner became a meeting place for the whole town.",
    "The doctor listened patiently and suggested that he rest for a few days at home.",
    "Most of the visitors came in the summer, when the days were long and the sea was warm.",
    "It was the kind of evening that made everyone want to stay outside a little longer.")

  val qsTrainNeg: Seq[String] = Seq(
    "BUY NOW!!! CHEAP PILLS 100% FREE CLICK HERE WIN WIN WIN $$$ 4999 2999 1999",
    "cheap watches cheap watches cheap watches best price best price buy buy buy",
    "CLICK CLICK CLICK FREE MONEY 77777 88888 99999 JACKPOT CASINO BONUS NOW NOW",
    "viagra cialis discount discount discount order order order pharmacy pharmacy",
    "!!!! $$$$ #### 0000 1111 2222 3333 4444 5555 6666 7777 8888 9999 !!!!",
    "WINNER WINNER WINNER CALL 1800 555 0199 CLAIM PRIZE CASH CASH CASH URGENT",
    "seo backlinks seo backlinks seo backlinks rank rank rank traffic traffic",
    "FREE FREE FREE DOWNLOAD CRACK KEYGEN SERIAL 2024 2025 FULL VERSION NO SURVEY",
    "lose weight fast lose weight fast lose weight fast miracle miracle miracle",
    "hot singles hot singles hot singles near you near you near you chat chat",
    "MAKE $5000 PER DAY FROM HOME!!! NO EXPERIENCE!!! 100% GUARANTEED!!! ACT NOW",
    "replica handbags replica handbags replica handbags lowest prices lowest prices")

  /** Held-out labeled set (never trained on): the accuracy floor in
    * ExtSpec is the regression gate on the embedded model. */
  val qsHeldout: Seq[(String, Boolean)] = Seq(
    ("The museum opened a new exhibit about the early history of navigation and mapmaking.", true),
    ("On Sunday afternoons, the family would gather on the porch and tell stories until dark.", true),
    ("The report concluded that the changes to the schedule had improved the service for most riders.", true),
    ("A narrow path led from the gate to the orchard, where the apples were almost ripe.", true),
    ("The orchestra rehearsed the final movement until every entrance was exactly together.", true),
    ("CONGRATULATIONS YOU WON!!! CLAIM 10000 NOW CLICK CLICK 555 7777 FREE CASH", false),
    ("best loans best loans best loans approval approval approval apply apply apply", false),
    ("ROLEX GUCCI PRADA 90% OFF!!! 2024 2025 SALE SALE SALE BUY BUY BUY", false),
    ("crypto pump crypto pump crypto pump 1000x 1000x guaranteed profit profit", false),
    ("FREE IPHONE FREE IPHONE CALL 1800 999 0000 LIMITED LIMITED LIMITED!!!", false))

  /** Integer perceptron trained at class load on the embedded samples:
    * deterministic order, fixed 200 epochs, unit learning rate — every
    * weight is an exact integer, so the scorer replays bit-for-bit in
    * SQL (the [[langProfiles]] pattern, with training instead of
    * count-ranking). Mistake-driven updates (y·s ≤ 0 → w += y·f). */
  lazy val qsWeights: Array[Long] = {
    val data = qsTrainPos.map(t => (qsFeatures(t), 1L)) ++
      qsTrainNeg.map(t => (qsFeatures(t), -1L))
    val w = new Array[Long](7)
    var epoch = 0
    while (epoch < 200) {
      data.foreach { case (f, y) =>
        var s = 0L
        var i = 0
        while (i < 7) { s += w(i) * f(i); i += 1 }
        if (s * y <= 0L) {
          i = 0
          while (i < 7) { w(i) += y * f(i); i += 1 }
        }
      }
      epoch += 1
    }
    w
  }

  /** Map-only quality scoring of a text column: the integer feature
    * extraction as native column expressions (regexp counts + a token
    * filter — all codegen'd), the trained weights folded into one
    * integer dot product. No shuffle, no UDF: at 100 TB this is a pure
    * scan-side projection that AQE/pushdown never have to work around.
    */
  def qualityScoreOf(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    withQualityScore(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("score"),
        when(col("score") > 0L, "keep").otherwise("drop").as("quality"))

  /** Bolt the trained `score` column onto ANY frame carrying `text`,
    * preserving every other caller column (and dropping `text` plus
    * the feature temps). This is the composition face of
    * [[qualityScoreOf]]: a consumer that already has a projection in
    * flight (e.g. [[UrlOps]]' canonical columns) scores it in the SAME
    * map-only pass instead of a doc_id self-join between two scans of
    * the corpus (r13 verdict #3 — the join was the only non-map step
    * in the domain-stats pipeline). */
  def withQualityScore(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val stopArr = array(QsStop.map(lit): _*)
    val w = qsWeights
    docs
      .withColumn("__toks",
        filter(split(trim(col("text")), "\\s+"), t => length(t) > 0))
      .withColumn("__ntoks", size(col("__toks")).cast("long"))
      .withColumn("__nchars", length(col("text")).cast("long"))
      .withColumn("__nstop", size(filter(col("__toks"),
        t => array_contains(stopArr, lower(t)))).cast("long"))
      .withColumn("__npunct",
        length(regexp_replace(col("text"), "[^.,!?;:]", "")).cast("long"))
      .withColumn("__ndigit",
        length(regexp_replace(col("text"), "[^0-9]", "")).cast("long"))
      .withColumn("__nupper",
        length(regexp_replace(col("text"), "[^A-Z]", "")).cast("long"))
      .withColumn("score", expr(
        s"CAST((${w(0)}) + (${w(1)}) * least(__ntoks, 1000L)" +
          s" + (${w(2)}) * ((__nchars * 100L) div greatest(__ntoks, 1L))" +
          s" + (${w(3)}) * ((__nstop * 1000L) div greatest(__ntoks, 1L))" +
          s" + (${w(4)}) * ((__npunct * 1000L) div greatest(__nchars, 1L))" +
          s" + (${w(5)}) * ((__ndigit * 1000L) div greatest(__nchars, 1L))" +
          s" + (${w(6)}) * ((__nupper * 1000L) div greatest(__nchars, 1L))" +
          " AS BIGINT)"))
      .drop("text", "__toks", "__ntoks", "__nchars", "__nstop",
        "__npunct", "__ndigit", "__nupper")
  }

  /** The trained-scorer replay as reusable DuckDB CTEs over a named
    * relation — two CTEs `qsf`/`qss`; `qss` is (doc_id, score). Weights
    * and the stopword list are embedded literals; `//` floors like
    * Spark's `div` because every operand is non-negative. Shared by
    * the quality_score oracle and r13's dedup_keep_best (argmax
    * canonical per dup cluster). */
  def qsScoreSql(corpusRef: String): String = {
    val w = qsWeights
    val stopList = QsStop.map(s0 => s"'$s0'").mkString("[", ", ", "]")
    s"""
      qsf AS (
        SELECT doc_id,
          len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
              t -> len(t) > 0)) AS ntoks,
          length(text) AS nchars,
          len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
              t -> len(t) > 0 AND list_contains($stopList, lower(t))))
            AS nstop,
          length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS npunct,
          length(regexp_replace(text, '[^0-9]', '', 'g')) AS ndigit,
          length(regexp_replace(text, '[^A-Z]', '', 'g')) AS nupper
        FROM $corpusRef),
      qss AS (
        SELECT doc_id, CAST(
          (${w(0)}) + (${w(1)}) * least(ntoks, 1000)
          + (${w(2)}) * ((nchars * 100) // greatest(ntoks, 1))
          + (${w(3)}) * ((nstop * 1000) // greatest(ntoks, 1))
          + (${w(4)}) * ((npunct * 1000) // greatest(nchars, 1))
          + (${w(5)}) * ((ndigit * 1000) // greatest(nchars, 1))
          + (${w(6)}) * ((nupper * 1000) // greatest(nchars, 1))
          AS BIGINT) AS score
        FROM qsf)"""
  }

  val qualityScore = QueryDef(
    "quality_score",
    (s, dir) => qualityScoreOf(Tables(s, dir, "documents")),
    Some(s"""
      WITH ${qsScoreSql("documents")}
      SELECT doc_id, CAST(score AS BIGINT) AS score,
             CASE WHEN score > 0 THEN 'keep' ELSE 'drop' END AS quality
      FROM qss"""))

  val all: Seq[QueryDef] =
    Seq(stats, quality, langId, fingerprint, tokenCount, repetition,
      piiScrub, normalize, boilerplate, htmlStrip, qualityScore)
}
