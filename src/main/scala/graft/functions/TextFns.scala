package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data pipeline: tokenizing,
  * shingling, language-ID scoring, quality features, fingerprinting.
  * All pure `functions._` compositions (codegen'd, no UDFs) with
  * DuckDB-SQL-expressible semantics so each derived query can be
  * oracle-checked.
  */
object TextFns {

  /** Lowercased alphanumeric tokens; empty strings (leading/trailing
    * delimiters) removed.
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** Distinct word n-gram shingles from an ALREADY-MATERIALIZED tokens
    * column (an attribute, not an expression). Passing `tokens(text)`
    * directly here would re-run the whole split+filter pipeline once
    * per `element_at` — ~3×shingle-count tokenizations per document,
    * measured 50× slower at sf0.1. Operators project tokens into a
    * column first (see Dedup.shingleRows).
    */
  def shinglesFromTokens(toks: Column, n: Int): Column = {
    // sequence upper bound clamped to >=1: Spark's sequence(1, 0) counts
    // DOWN (inferred step -1) and would feed element_at an index 0.
    val grams = transform(
      sequence(lit(1), greatest(size(toks) - lit(n - 1), lit(1))),
      i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + lit(k))): _*))
    array_distinct(when(size(toks) >= n, grams)
      .otherwise(array().cast("array<string>")))
  }

  /** Convenience single-expression form — fine for literals/tests; use
    * the two-phase `shinglesFromTokens` in operators (see above).
    */
  def wordShingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(text), n)

  /** POSITIONED k-token windows from a materialized tokens column:
    * `array<struct<pos:int, gram:string>>` with 1-based positions and
    * NO distinct — unlike `shinglesFromTokens`, every occurrence is
    * kept because span-level dedup (Dedup.duplicatedSpans) is
    * position-sensitive. Same clamp-to-1 guard as shinglesFromTokens
    * (Spark's `sequence(1, 0)` counts DOWN).
    */
  def windowGrams(toks: Column, k: Int): Column = {
    val wins = transform(
      sequence(lit(1), greatest(size(toks) - lit(k - 1), lit(1))),
      i => struct(
        i.as("pos"),
        concat_ws(" ", (0 until k).map(j => element_at(toks, i + lit(j))): _*)
          .as("gram")))
    when(size(toks) >= k, wins)
      .otherwise(array().cast("array<struct<pos:int,gram:string>>"))
  }

  /** Count of tokens that appear in the given vocabulary. Duplicates
    * count — this is occurrence counting, not set intersection.
    */
  def vocabHits(text: Column, vocab: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(vocab.map(lit): _*)))

  /** Tiny per-language stopword profiles for heuristic language ID.
    * Deterministic tie-break: profile order below (en first).
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "und", "ist", "das", "ein", "nicht"),
    "es" -> Seq("el", "los", "que", "y", "de", "la", "una"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "est"),
    "zh" -> Seq("de", "shi", "bu", "wo", "zhe", "ren", "ta"))

  /** Heuristic language-ID prediction as a scalar column: the t03
    * argmax over [[langProfiles]] with the same deterministic
    * profile-order tie-break (first profile whose score is >= all
    * others wins). Backs the SQL surface's `graft_lang_id`. The
    * per-profile hit counts are bound ONCE as a lambda array value —
    * the argmax references every score |profiles| times, and a scalar
    * function has no materializing select to dodge the
    * expression-reuse trap with.
    */
  def langIdColumn(text: Column): Column = {
    val profs = langProfiles
    element_at(transform(
      array(array(profs.map { case (_, v) => vocabHits(text, v) }: _*)),
      ss => profs.map(_._1).zipWithIndex
        .foldRight(lit("??"): Column) { case ((l, i), rest) =>
          val isMax = profs.indices
            .map(j => element_at(ss, i + 1) >= element_at(ss, j + 1))
            .reduce(_ && _)
          when(isMax, lit(l)).otherwise(rest)
        }), 1)
  }

  /** t04's composite quality score as a scalar column (token count ×
    * punctuation cleanliness × stopword prose-likeness, rounded to 4)
    * — factored here so t04, the quality-aware dedup representative
    * (t36), and the SQL surface's `graft_quality_score` all compute
    * EXACTLY the same number.
    */
  def qualityScore(text: Column): Column = {
    val nToks = size(tokens(text)).cast("long")
    val nChars = length(text).cast("long")
    val punct = (length(text) -
      length(translate(text, ".,!?;:", ""))).cast("long")
    val nStop = vocabHits(text, langProfiles.head._2).cast("long")
    val safeToks = greatest(nToks, lit(1L))
    round(least(nToks, lit(100L)) / 100.0 *
      (lit(1.0) - punct / greatest(nChars, lit(1L))) *
      (lit(0.5) + lit(0.5) * (nStop / safeToks)), 4)
  }

  /** Normalized text: lowercase, non-alphanumerics collapsed to single
    * spaces, trimmed — the canonical form for fingerprinting.
    */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** Deterministic document fingerprint = md5 of the normalized text.
    * (A rolling/Karp-Rabin content hash lives in `rollingHash` for
    * chunk-level fingerprinting.)
    */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** Polynomial rolling hash (Karp-Rabin flavor) over the normalized
    * text's characters: h = Σ ascii(c_i)·31^i mod 1e9+7, folded left.
    * Pure-column arithmetic; used by the Scala-side dedup API.
    */
  def rollingHash(text: Column): Column = {
    // 1e9+7: keeps acc*31+c < 2^35, safe under ANSI long arithmetic
    val prime = lit(1000000007L)
    aggregate(
      transform(split(normalized(text), ""), c => ascii(c).cast("long")),
      lit(0L),
      (acc, c) => pmod(acc * lit(31L) + c, prime))
  }

  /** PII patterns every pretraining pipeline scrubs before the
    * tokenizer sees the text. Deliberately conservative/recall-biased
    * (emails, international-ish phone shapes, 13-16-digit card runs) —
    * the POINT is the codegen'd sequential regexp_replace chain, not a
    * production PII model. Each pattern is Re2-free POSIX-ish syntax
    * so the same regex runs verbatim in DuckDB for the oracle.
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\+?[0-9][0-9()\\-\\. ]{7,14}[0-9]" -> "<PHONE>",
    "[0-9]{13,16}" -> "<NUMBER>")

  /** Redacted text: the PII patterns applied in order. */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (re, tag)) =>
      regexp_replace(c, re, tag)
    }

  /** Count of redactions applied (length delta per pattern is not
    * recoverable, so count matches instead): Σ per-pattern match count.
    */
  def piiMatchCount(text: Column): Column =
    PiiPatterns.map { case (re, _) =>
      // group 0 = whole match: the 2-arg form defaults to group 1 and
      // throws on group-free patterns
      size(regexp_extract_all(text, lit(re), lit(0)))
    }.reduce(_ + _).cast("long")
}
