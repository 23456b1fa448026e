package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders: tokenization, quality scoring, language ID,
  * fingerprinting, token stats. All pure Catalyst expressions (codegen'd, no
  * UDFs) so they stay inside WholeStageCodegen and scale linearly with rows.
  *
  * Generalizes the reference's load-time text vectorization
  * (transform_data.py:566-571) and search parse/rank (db_extractor.py:44,51)
  * into reusable ops over any string column.
  */
object TextOps {

  /** Whitespace tokens of the lower-cased text. */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Tokens via full normalization: strip non-alphanumerics then split —
    * the analogue of to_tsvector's lexeme split (transform_data.py:566). */
  def normTokens(text: Column): Column =
    split(trim(regexp_replace(lower(text), "[^\\p{L}\\p{Nd}]+", " ")), " ")

  val stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "to", "and", "in", "is", "on", "for")

  /** Count of tokens that appear in `set` (with multiplicity). One
    * codegen'd JVM loop per row — the lambda formulation
    * (size(filter(toks, IN))) evaluates interpreted per element and was
    * the hot path of quality/lang-id scoring. */
  def countIn(toks: Column, set: Seq[String]): Column =
    graft.functions.CountInSetExpr.countInSet(toks, set)

  /** AND-match of query terms against a token array (plainto_tsquery
    * semantics, db_extractor.py:44). */
  def matchesAll(toks: Column, terms: Seq[String]): Column =
    terms.map(t => array_contains(toks, t)).reduce(_ && _)

  /** Term-frequency relevance: total occurrences of the query terms
    * (simplified ts_rank — ordering semantics only, SURVEY.md §2.8 T3).
    * Query terms are distinct by construction, so the summed per-term
    * counts equal one multiplicity-counting set-membership pass. */
  def tfScore(toks: Column, terms: Seq[String]): Column =
    countIn(toks, terms.distinct)

  /** ts_rank's documented normalization bitmask (PostgreSQL docs §12.3.3),
    * applied to a raw relevance score in the documented order. The
    * within-document accumulation stays the declared simplified tf score;
    * the length normalizations here are the faithful part:
    *   1  — divide by 1 + ln(document token count)
    *   2  — divide by document token count
    *   8  — divide by the number of unique tokens
    *   16 — divide by 1 + ln(unique token count)
    *   32 — rank / (rank + 1)
    * (4 — mean harmonic distance — applies to ts_rank_cd's cover density
    * only and is out of scope for the tf score.) Zero-length documents
    * divide by 1, matching Postgres's guard. */
  def tsRankNormalize(score: Column, toks: Column, bits: Int): Column = {
    val n = size(toks).cast("double")
    val uniq = size(array_distinct(toks)).cast("double")
    var r = score.cast("double")
    if ((bits & 1) != 0) r = r / (lit(1.0) + log(greatest(n, lit(1.0))))
    if ((bits & 2) != 0) r = r / greatest(n, lit(1.0))
    if ((bits & 8) != 0) r = r / greatest(uniq, lit(1.0))
    if ((bits & 16) != 0) r = r / (lit(1.0) + log(greatest(uniq, lit(1.0))))
    if ((bits & 32) != 0) r = r / (r + lit(1.0))
    r
  }

  /** Corpus text cleaning (training-data hygiene): NFC-normalize, strip
    * control + zero-width/format characters (keeping \n and \t as
    * whitespace), collapse whitespace runs, trim. Deterministic and
    * engine-reproducible — the DuckDB twin is nfc_normalize +
    * regexp_replace with the same classes (q82's oracle). One codegen'd
    * projection; no UDF. */
  def cleanText(c: Column): Column = {
    val nfc = graft.functions.NfcNormalizeExpr.nfc(c)
    val noCtrl = regexp_replace(nfc,
      "[\\u0000-\\u0008\\u000B-\\u001F\\u007F\\u200B-\\u200D\\uFEFF]", "")
    trim(regexp_replace(noCtrl, "\\s+", " "))
  }

  /** Stopword ratio ∈ [0,1], 4dp. */
  def stopwordRatio(toks: Column): Column =
    round(countIn(toks, stopwords).cast("double") / size(toks), 4)

  /** Mean token length, 4dp (chars excluding separators / token count). */
  def avgTokenLen(text: Column, toks: Column): Column =
    round(length(regexp_replace(text, "\\s", "")).cast("double") / size(toks), 4)

  /** Composite quality ∈ [0,1]: length factor × content (non-stopword) ratio.
    * Mirrors the heuristic quality gates of the reference doc pipeline
    * (document_spider.py:327-381) as a continuous score. */
  def qualityScore(toks: Column): Column =
    round(least(lit(1.0), size(toks) / lit(100.0))
      * (lit(1.0) - countIn(toks, stopwords).cast("double") / size(toks)), 4)

  /** The same composite quality as [[qualityScore]] but in EXACT integer
    * basis points (0..10000), floor-rounded. The score is rational —
    * min(1, n/100)·(n−stop)/n equals (n−stop)·100 when n ≤ 100 and
    * (n−stop)·10000/n otherwise — so integer arithmetic computes it with
    * no doubles anywhere: no .5·10⁻⁴ rounding boundaries, no dependence on
    * an engine's round() tie-breaking (the q124 micro-unit lesson applied
    * to quality gating). Use this form wherever the score feeds a
    * threshold or a cross-engine-checked aggregate. */
  def qualityBp(toks: Column): Column = {
    val n = size(toks).cast("long")
    val content = n - countIn(toks, stopwords)
    when(n <= 100, content * lit(100L))
      .otherwise(graft.Tables.ldiv(content * lit(10000L), n))
  }

  /** Language marker words. Chosen from common function words; scoring is a
    * deterministic n-gram-free heuristic: count marker hits per language. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "und", "die", "nicht", "ist"),
    "en" -> Seq("the", "and", "of", "is", "fast"),
    "es" -> Seq("el", "de", "que", "los", "una"),
    "fr" -> Seq("le", "et", "les", "des", "une"),
    "zh" -> Seq("de", "shi", "zai", "le", "he"),
  )

  /** Per-language marker-hit counts as (lang -> count Column). */
  def langScores(toks: Column): Seq[(String, Column)] =
    langMarkers.map { case (lang, words) => lang -> countIn(toks, words) }

  /** Predicted language: max score, ties broken alphabetically-first. */
  def langPredict(scores: Seq[(String, Column)]): Column = {
    val cols = scores.map(_._2)
    scores.foldRight(lit(scores.head._1)) { case ((lang, sc), els) =>
      when(cols.map(sc >= _).reduce(_ && _), lit(lang)).otherwise(els)
    }
  }

  /** Whole-document fingerprint: md5 of whitespace-normalized lower text. */
  def docFingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " ").cast("binary"))

  /** Content fingerprint robust to token order: lexicographic min of the
    * per-token md5s (a 1-permutation MinHash — rolling-hash analogue). */
  def minTokenHash(toks: Column): Column =
    array_min(transform(array_distinct(toks), x => md5(x.cast("binary"))))

  /** Word k-grams with multiplicity (unlike `shingles`, which is distinct)
    * — the counting form for n-gram frequency / language-model statistics.
    * Fewer than k tokens yields an empty array. */
  def ngrams(toks: Column, k: Int): Column = {
    val idx = sequence(lit(0), size(toks) - k)
    when(size(toks) >= k,
      transform(idx, i =>
        concat_ws(" ", (0 until k).map(j => element_at(toks, i + j + 1)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** PII patterns shared by redaction and counting — deliberately in the
    * common regex subset (no backreferences, no lookaround) so the same
    * pattern runs identically under Java regex and RE2-style engines. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\(\\d{3}\\) ?\\d{3}-\\d{4}|\\d{3}-\\d{3}-\\d{4}"

  /** Redact emails and phone numbers (training-data hygiene op): every
    * match replaced with a stable tag, one codegen'd projection. */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, emailRe, "[EMAIL]"),
      phoneRe, "[PHONE]")

  /** Count of PII matches of `re` in the text. */
  def piiCount(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0))).cast("long")

  /** Word k-shingles ("a b c") from a token array, for MinHash/Jaccard.
    * Fewer than k tokens yields an empty array (standard shingling; same
    * semantics as the one-pass ShinglesExpr twin). The size guard keeps
    * every element_at index in [1, size] so ANSI mode cannot throw. */
  def shingles(toks: Column, k: Int): Column = {
    val idx = sequence(lit(0), size(toks) - k)
    when(size(toks) >= k,
      array_distinct(transform(idx, i =>
        concat_ws(" ", (0 until k).map(j => element_at(toks, i + j + 1)): _*))))
      .otherwise(array().cast("array<string>"))
  }
}
