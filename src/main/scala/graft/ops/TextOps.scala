package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines over a `text`
  * column: tokenization, counting, quality scoring, language ID,
  * fingerprinting. All pure column expressions (whole-stage codegen'd —
  * no UDFs), so they scale to 100 TB document sets as map-only work:
  * no shuffle unless the caller aggregates.
  */
object TextOps {

  /** Whitespace tokens (`\S+` runs) — the BPE-ish baseline tokenizer. */
  def tokens(text: Column): Column =
    regexp_extract_all(text, lit("\\S+"), lit(0))

  def tokenCount(text: Column): Column =
    regexp_count(text, lit("\\S+")).cast("bigint")

  /** GPT-2-style BPE pre-tokenizer pattern (contractions, letter runs,
    * digit runs, punctuation runs, each with optional leading space),
    * restricted to syntax with identical semantics under both Java regex
    * (Spark) and RE2 (DuckDB oracle): no lookahead, and the whitespace
    * class spelled out — Java's \s includes vertical tab \x0B, RE2's
    * does not.
    */
  val BpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \\t\\n\\r\\f\\x0B]+"

  /** BPE-ish token count — the ~token-budget estimator for training-data
    * accounting (whitespace counting under-counts punctuation-heavy text).
    */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(BpePattern)).cast("bigint")

  /** PII patterns, restricted (like [[BpePattern]]) to syntax with
    * identical semantics under Java regex (Spark) and RE2 (DuckDB
    * oracle): character classes, bounded repeats, `\b` word boundaries —
    * no lookahead. Deliberately simple recall-oriented shapes; a
    * production scrubber layers more patterns through the same map-only
    * pipeline.
    */
  val EmailPattern: String =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern: String = "\\b[0-9]{3}-[0-9]{4}\\b"
  val Ipv4Pattern: String =
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Mask emails / IPv4 addresses / phone numbers with typed placeholder
    * tokens — the PII-scrubbing step of a training-data pipeline. Order
    * matters and is fixed: emails first (their local/domain parts contain
    * digit-dot runs an IP pattern could claim), then IPs, then phones.
    * Pure column expression: map-only, codegen'd, no shuffle.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")

  /** Polynomial rolling hash over a pre-projected token array:
    * h ← (31·h + t) mod 1e9+7, t = first 24 bits of md5(token).
    * Order-sensitive, unlike [[fingerprint]]: reordered-token documents
    * fingerprint differently. Pure integer math, engine-portable.
    */
  def rollingFingerprint(toks: Column): Column =
    aggregate(toks, lit(0L),
      (h, tok) => pmod(
        h * lit(31L) +
          // Md5Prefix64 is the first 32 md5 bits; >>> 8 keeps the first 24
          // (= the oracle's substr(md5, 1, 6) parsed base-16)
          shiftrightunsigned(graft.functions.Md5Prefix64(tok), 8),
        lit(1000000007L)))

  /** Word 3-gram shingles from a pre-projected token array. Guarded:
    * Spark's `sequence(1, n)` runs DESCENDING when n < 1, so short texts
    * must short-circuit to an empty array. Prefer passing a projected
    * token *column* (not `tokens(text)` inline): expressions inside
    * higher-order lambdas are not common-subexpression-eliminated, so an
    * inline tokenizer would re-run the regex per element.
    */
  def shingles3FromTokens(t: Column): Column = ngramsFromTokens(t, 3)

  /** Word n-grams from a pre-projected token array, space-joined; same
    * short-text guard as the 3-gram case. */
  def ngramsFromTokens(t: Column, n: Int): Column = {
    require(n >= 1, s"ngram width < 1: $n")
    when(size(t) >= n,
      transform(
        sequence(lit(1), size(t) - (n - 1)),
        i => concat_ws(" ",
          (0 until n).map(k => element_at(t, i + k)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Fixed-width token chunks, each space-joined: the token stream cut
    * into consecutive `width`-token groups — the dedup unit of d30
    * (within-doc) and d33 (corpus-wide). Real web text would cut on
    * sentence/paragraph boundaries; the mechanics are width-independent.
    * Map-only; empty token streams chunk to an empty array, not [""].
    */
  def fixedChunks(text: Column, width: Int): Column = {
    require(width >= 1, s"chunk width < 1: $width")
    val tk = tokens(text)
    when(size(tk) === 0, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), floor((size(tk) - 1) / width).cast("int")),
        i => array_join(slice(tk, i * width + 1, lit(width)), " ")))
  }

  /** Dominant element of a SORTED string array as struct
    * (best, best_cnt, n_distinct), via one linear fold: the longest run
    * wins; ties keep the FIRST run, which in an ascending array is the
    * smallest element — the deterministic `ORDER BY cnt DESC, x ASC`
    * tie-break. Map-side replacement for the explode → count → rank
    * pattern, whose shuffle is ~|corpus| × element width at scale.
    */
  def dominantOfSorted(arr: Column): Column =
    aggregate(arr,
      // NULL `prev` sentinel, not "": an empty string is a legal array
      // element, and a "" sentinel would absorb a leading "" into a
      // phantom run (n_distinct one short). NULL can't collide — the
      // comparisons below are explicitly null-guarded.
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("best_cnt"), lit("").as("best"),
        lit(0L).as("n_distinct")),
      (acc, x) => {
        val continues = acc("prev").isNotNull && (x === acc("prev"))
        val run = when(continues, acc("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          when(run > acc("best_cnt"), run).otherwise(acc("best_cnt"))
            .as("best_cnt"),
          when(run > acc("best_cnt"), x).otherwise(acc("best")).as("best"),
          (acc("n_distinct") + when(continues, 0L).otherwise(1L))
            .as("n_distinct"))
      },
      acc => struct(acc("best").as("best"), acc("best_cnt").as("best_cnt"),
        acc("n_distinct").as("n_distinct")))

  /** Occurrences belonging to elements appearing more than once in a
    * SORTED array — the duplicate-n-gram repetition signal of the Gopher
    * data pipeline (Rae et al. 2021, §A1.1). Exact integers, map-side;
    * the finish step flushes the last run.
    */
  def dupOccurrencesOfSorted(arr: Column): Column =
    aggregate(arr,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("dup")),
      (acc, x) => {
        val closes = x =!= acc("prev")
        struct(x.as("prev"),
          when(closes, lit(1L)).otherwise(acc("run") + 1L).as("run"),
          (acc("dup") +
            when(closes && acc("run") > 1L, acc("run")).otherwise(0L))
            .as("dup"))
      },
      acc => acc("dup") +
        when(acc("run") > 1L, acc("run")).otherwise(lit(0L)))

  /** Word 3-gram shingles (for n-gram Jaccard / MinHash input). */
  def shingles3(text: Column): Column = shingles3FromTokens(tokens(text))

  /** Type-token ratio: distinct / total tokens (lexical diversity).
    * Distinctness is case-insensitive, consistent with every other
    * token-set operator here (and the DuckDB oracles).
    */
  def typeTokenRatio(text: Column): Column = {
    // ONE tokenize pass: lowercasing never changes \S+ run boundaries
    // (case mapping maps non-space to non-space), so the lowered token
    // count equals the raw one — the second regex pass was pure waste
    // on the quality-score hot path
    val t = tokens(lower(text))
    size(array_distinct(t)).cast("double") /
      greatest(size(t), lit(1)).cast("double")
  }

  /** Punctuation-to-character ratio. */
  def punctRatio(text: Column): Column =
    regexp_count(text, lit("[\\p{Punct}]")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Mean token length in characters. */
  def meanTokenLen(text: Column): Column =
    meanTokenLenFromTokens(tokens(text))

  /** Mean token length from a pre-projected token array — use this form
    * when the tokens are already materialized in the plan (the tokenizer
    * regex inside a HOF lambda is NOT common-subexpression-eliminated,
    * so `meanTokenLen(text)` re-tokenizes twice).
    */
  def meanTokenLenFromTokens(t: Column): Column =
    aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") /
      greatest(size(t), lit(1)).cast("double")

  /** Per-language stopword hit counts — the n-gram-heuristic language ID.
    * Deterministic: argmax over fixed language order (first wins ties).
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "for", "on", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "ein", "mit", "zu", "auf"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "por", "con", "para"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "que", "pour", "dans", "sur"))

  def langScoresFromTokens(dtoks: Column): Seq[(String, Column)] =
    stopwords.map { case (lang, words) =>
      lang -> size(array_intersect(dtoks, array(words.map(lit): _*)))
    }

  /** Predicted language from a pre-projected distinct-token column + the
    * raw text (for the CJK check): CJK-presence beats the stopword vote
    * (zh has no whitespace stopwords); then argmax in declaration order;
    * "und" (undetermined) when no signal.
    */
  def langIdFromTokens(dtoks: Column, text: Column): Column = {
    val scores = langScoresFromTokens(dtoks)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val cjk = regexp_count(text, lit("[\\x{4e00}-\\x{9fff}]")) > 0
    val vote = scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
    // foldRight gives earlier languages precedence on ties
    when(cjk, lit("zh")).otherwise(vote)
  }

  def langId(text: Column): Column =
    langIdFromTokens(array_distinct(tokens(lower(text))), text)

  /** Canonical content fingerprint: md5 over lowercased,
    * whitespace-normalized text. Identical in any engine with md5 —
    * the exact-dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ",
      regexp_extract_all(lower(text), lit("\\S+"), lit(0))))

  /** Composite quality score in [0,1]: length signal × diversity ×
    * (1 − punctuation excess). A filterable heuristic, not a model.
    */
  def qualityScore(text: Column): Column = {
    val lenSig = least(tokenCount(text).cast("double") / lit(100.0), lit(1.0))
    val diversity = typeTokenRatio(text)
    val punct = greatest(lit(0.0), lit(1.0) - punctRatio(text) * lit(5.0))
    lenSig * diversity * punct
  }
}
