package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Named quality-filter rule sets over raw document text — the
  * "repetition-free, readable prose" gates every pretraining pipeline
  * runs before tokenization (Gopher, Rae et al. 2021, App. A1.1; the
  * same family backs C4/MassiveText/RefinedWeb cleaning).
  *
  * Reference tie-in: the playground's quality surface is the arbitrary
  * SQL endpoint (`duckdb_rest_server.py:73-78`) — rule filters are the
  * canonical thing a curation user runs through it, so the rule set is
  * a first-class operator here (builder mandate: text analysis /
  * quality scoring).
  *
  * Scale shape: one scan, zero shuffles, zero UDFs — every metric and
  * every verdict is a codegen'd column expression, so the gate runs at
  * parquet-scan speed on any corpus size and pushes nothing to the
  * driver. On 100 TB this is a map-only pass.
  *
  * FP discipline: displayed ratios are single divides of exact integer
  * counts (rounded for the oracle diff), but every RULE VERDICT is
  * evaluated in integer cross-multiplied form (`sum_len >= 3*n` rather
  * than `sum_len/n >= 3.0`), so a boundary document cannot flip its
  * keep flag between engines on float noise — the same exactness move
  * as the money-grid aggregates.
  */
object QualityRules {

  /** The Gopher stop-set: a document must contain at least
    * `minStopHits` of these to look like running prose.
    */
  val StopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-rule quality gate. Emits one row per document with the
    * raw metrics, each rule's verdict, and the conjunction `keep`.
    *
    * Rules (Rae et al. 2021, Appendix A1.1), evaluated on
    * `TextFns.tokens` words and raw-text lines:
    *  1. word count in [minWords, maxWords]
    *  2. mean word length in [3, 10] characters
    *  3. symbol-to-word ratio ('#' or '…'/'...') <= 0.1
    *  4. <= 90% of lines start with a bullet ('-', '*', '•')
    *  5. <= 30% of lines end with an ellipsis
    *  6. >= 80% of words contain at least one alphabetic character
    *  7. >= minStopHits DISTINCT stop-set words present (the paper's
    *     reading — two occurrences of a single "the" do not make
    *     prose; `stop_hits` still reports total occurrences as a
    *     metric, `stop_distinct` the rule's input)
    */
  def gopher(docsDf: DataFrame,
             minWords: Int = 50,
             maxWords: Int = 100000,
             minStopHits: Int = 2): DataFrame = {
    val toks = TextFns.tokens(col("text"))
    // Materialize tokens once (attribute, not expression) — the same
    // re-tokenization trap shinglesFromTokens documents.
    val base = docsDf.select(col("doc_id"), col("text"), toks.as("toks"))
    val cols = ruleCols(col("text"), col("toks"), minWords, maxWords,
      minStopHits)
    base.select(col("doc_id") +: cols.map { case (n, c) => c.as(n) }: _*)
  }

  /** The keep verdict as a SCALAR column over any text expression —
    * what backs the SQL surface's `graft_gopher_pass(text)` (round-9
    * VERDICT item 5). The text and its token array are bound ONCE as
    * lambda values (the single-element-transform trick), so each of
    * the seven rules reads an evaluated value instead of re-inlining
    * the tokenization — the shinglesFromTokens trap, which a scalar
    * function cannot dodge with a materializing select.
    */
  def keepColumn(text: Column,
                 minWords: Int = 50,
                 maxWords: Int = 100000,
                 minStopHits: Int = 2): Column =
    element_at(transform(
      array(struct(text.as("t"), TextFns.tokens(text).as("tk"))),
      r => ruleCols(r.getField("t"), r.getField("tk"), minWords, maxWords,
        minStopHits).last._2), 1)

  /** Gopher REPETITION signals (Rae et al. 2021, App. A1.1
    * "repetition removal" — the half of the Gopher gate [[gopher]]
    * does not cover): per document,
    *
    *  - `top{topN}gram_chars` — characters covered by the single most
    *    covering word topN-gram, max over grams of
    *    `count × charlen(gram)` (charlen includes the joining spaces,
    *    matching the character base below). Taking the max of the
    *    COVERAGE product rather than argmax-count-then-length makes
    *    the metric deterministic without a tie-break protocol — ties
    *    in count resolve by what the rule actually cares about,
    *    characters covered.
    *  - `dup{dupN}gram_chars` — characters covered by ALL occurrences
    *    of duplicated dupN-grams (`Σ count × charlen` over grams with
    *    count > 1). Overlapping windows overlap in coverage, so the
    *    fraction may exceed 1 on degenerate input — kept unclipped so
    *    the metric stays a sum of exact integer products.
    *  - fractions of `stream_chars` (the space-joined token stream —
    *    punctuation-independent, identical in both engines), rounded
    *    for display; the keep VERDICTS are integer cross-multiplied
    *    against basis-point thresholds (`chars × 10000 ≤ bp × stream`)
    *    — the same FP discipline as [[gopher]].
    *
    * Threshold defaults follow the paper's bands (top-2-gram ≤ 0.20,
    * dup-5-gram ≤ 0.15), expressed in basis points.
    *
    * Scale shape: tokens materialize once; each n-gram family is one
    * `explode` → (doc_id, gram) count with map-side partials → one
    * doc_id aggregation. Per-doc state is gram counts, never text;
    * nothing touches the driver. Line/paragraph-level duplicate
    * signals live in [[lineRepetition]] (newline-bearing corpora).
    */
  def repetition(docsDf: DataFrame,
                 topN: Int = 2,
                 dupN: Int = 5,
                 maxTopBp: Long = 2000,
                 maxDupBp: Long = 1500): DataFrame = {
    val base = docsDf
      .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_words"),
        length(concat_ws(" ", col("toks"))).cast("long").as("stream_chars"),
        col("toks"))

    // Spark's sequence(1, stop) counts DOWN when stop < 1 ([1, 0]) —
    // a short doc must produce an explicitly empty index array, not a
    // descending one that drives slice(start = 0) into an error.
    def gramIdx(n: Int): Column =
      when(size(col("toks")) >= n,
        sequence(lit(1), size(col("toks")) - (n - 1)))
        .otherwise(array().cast("array<int>"))

    def gramCoverage(n: Int, agg: Column => Column, as: String): DataFrame =
      base
        .select(col("doc_id"), explode(transform(gramIdx(n),
          i => concat_ws(" ", slice(col("toks"), i, lit(n))))).as("gram"))
        .groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(agg(col("c") * length(col("gram")).cast("long")).as(as))

    val top = gramCoverage(topN, max, "top_chars")
    val dup = gramCoverage(dupN,
      c => sum(when(col("c") > 1, c).otherwise(0L)), "dup_chars")

    // Docs with fewer than n words emit no grams — left joins restore
    // them with 0 coverage (an empty doc repeats nothing).
    val safe = greatest(col("stream_chars"), lit(1L))
    base.select("doc_id", "n_words", "stream_chars")
      .join(top, Seq("doc_id"), "left")
      .join(dup, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"), col("stream_chars"),
        coalesce(col("top_chars"), lit(0L)).as("top_chars"),
        coalesce(col("dup_chars"), lit(0L)).as("dup_chars"))
      .select(col("doc_id"), col("n_words"), col("stream_chars"),
        col("top_chars"), col("dup_chars"),
        round(col("top_chars") / safe, 4).as(s"top${topN}gram_frac"),
        round(col("dup_chars") / safe, 4).as(s"dup${dupN}gram_frac"),
        (col("top_chars") * 10000L <= lit(maxTopBp) * safe).as("r_top"),
        (col("dup_chars") * 10000L <= lit(maxDupBp) * safe).as("r_dup"))
      .withColumn("keep", col("r_top") && col("r_dup"))
  }

  /** Duplicate line / paragraph fractions (the remaining App. A1.1
    * signals) for newline-bearing corpora: the count fraction of
    * non-empty trimmed lines (paragraphs = blank-line-separated runs)
    * that are repeats of an earlier one, and the char fraction those
    * repeats cover. Map-only — every metric is an array expression
    * over one `split`, no shuffle at all (duplicate detection is
    * `array_distinct` against the full list, per row).
    */
  def lineRepetition(docsDf: DataFrame): DataFrame = {
    def stats(unit: Column, prefix: String): Seq[(String, Column)] = {
      val dist = array_distinct(unit)
      val n = size(unit).cast("long")
      val nd = size(dist).cast("long")
      val chars = aggregate(unit, lit(0L), (acc, x) => acc + length(x))
      val charsD = aggregate(dist, lit(0L), (acc, x) => acc + length(x))
      val safeN = greatest(n, lit(1L))
      val safeC = greatest(chars, lit(1L))
      Seq(
        s"n_${prefix}s" -> n,
        s"dup_${prefix}_frac" -> round((n - nd) / safeN, 4),
        s"dup_${prefix}_char_frac" -> round((chars - charsD) / safeC, 4))
    }
    val lines = filter(transform(split(col("text"), "\n"), l => trim(l)),
      l => l =!= "")
    // paragraphs: blank-line-separated runs; any newline run >= 2 splits
    val paras = filter(transform(split(col("text"), "\n\\s*\n"),
      p => trim(p)), p => p =!= "")
    val cols = stats(lines, "line") ++ stats(paras, "para")
    docsDf.select(col("doc_id") +: cols.map { case (n, c) => c.as(n) }: _*)
  }

  /** Readability profile (Flesch 1948 / Kincaid et al. 1975) on an
    * exact integer grid — the classic prose-difficulty score data
    * mixes bucket by (simple-English subsets, grade-banded sampling).
    * Counting heuristics, identical in both engines:
    *
    *  - words     = `TextFns.tokens` count
    *  - sentences = maximal `[.!?]+` runs (min 1)
    *  - syllables = maximal `[aeiouy]+` runs in the lowercased text —
    *    the standard vowel-group approximation, applied streamwise
    *    (word boundaries never split a vowel run, so counting over the
    *    whole text equals the per-word sum)
    *
    * Scores are published ×100 on the integer grid with each division
    * truncated (`DIV`), so the doc-level value is bit-stable
    * cross-engine — the PageRank discipline applied to a formula with
    * two mixed denominators:
    *
    *   fk100  = (39·words) DIV sents + (1180·syll) DIV words − 1559
    *   fre100 = 20684 − (1015·words) DIV sents − (8460·syll) DIV words
    *
    * (The float constants 0.39/11.8/15.59 and 206.835/1.015/84.6
    * quantize to ×100 once, here — a documented property of THIS
    * metric, not drift.) `band` buckets fre100 at the conventional
    * 60/30 thresholds. Map-only: one scan, zero shuffles, all codegen.
    */
  def readability(docsDf: DataFrame): DataFrame = {
    val base = docsDf.select(col("doc_id"), readCounts(col("text")).as("c"))
      .select(col("doc_id"), col("c.w").as("n_words"),
        col("c.s").as("n_sents"), col("c.y").as("n_syll"))
    val (fk, fre) = readabilityScores(col("n_words"), col("n_sents"),
      col("n_syll"))
    base.select(col("doc_id"), col("n_words"), col("n_sents"), col("n_syll"),
      fk.as("fk100"), fre.as("fre100"))
      .withColumn("band",
        when(col("fre100") >= 6000L, "easy")
          .when(col("fre100") >= 3000L, "medium")
          .otherwise("hard"))
  }

  /** fre100 / fk100 as SCALAR columns over any text expression — the
    * SQL surface's `graft_fre100` / `graft_fk100`. Counts bind ONCE as
    * a lambda-bound struct (the keepColumn trick), then feed the SAME
    * score arithmetic the frame operator uses — one implementation,
    * two surfaces, no drift.
    */
  def fre100Column(text: Column): Column = scoreColumn(text, fk = false)

  def fk100Column(text: Column): Column = scoreColumn(text, fk = true)

  private def scoreColumn(text: Column, fk: Boolean): Column =
    element_at(transform(array(readCounts(text)), r => {
      val (f, e) = readabilityScores(r.getField("w"), r.getField("s"),
        r.getField("y"))
      if (fk) f else e
    }), 1)

  // word / sentence-run / vowel-run counts, the single source for both
  // readability surfaces
  private def readCounts(text: Column): Column = struct(
    size(TextFns.tokens(text)).cast("long").as("w"),
    greatest(size(regexp_extract_all(text, lit("[.!?]+"), lit(0))),
      lit(1)).cast("long").as("s"),
    size(regexp_extract_all(lower(text), lit("[aeiouy]+"), lit(0)))
      .cast("long").as("y"))

  // integral divide as a Column (the SQL DIV operator's expression) —
  // keeps the grid arithmetic exact on attribute AND lambda inputs
  private def idiv(a: Column, b: Column): Column = call_function("div", a, b)

  private def readabilityScores(w: Column, s: Column, y: Column)
      : (Column, Column) = {
    val safeW = greatest(w, lit(1L))
    (idiv(lit(39L) * w, s) + idiv(lit(1180L) * y, safeW) - 1559L,
      lit(20684L) - idiv(lit(1015L) * w, s) - idiv(lit(8460L) * y, safeW))
  }

  /** Boilerplate line removal (a jusText / Readability-lite gate,
    * Pomikálek 2011's shape without the HTML DOM): per document,
    * non-empty trimmed lines are dropped when they look like chrome
    * rather than prose —
    *
    *  - shorter than `minChars` characters, or
    *  - bullet-led ('-', '*', '•'), or
    *  - without a single lowercase letter (ALL-CAPS headers, dividers,
    *    numeric rows)
    *
    * Emits the audit a production extraction pass needs: line/char
    * totals, kept counts, the kept-content md5 (so the CLEANED text is
    * hash-pinned cross-engine, not just counted) and the kept-char
    * fraction. Map-only — the line list, both filters, and the joined
    * digest are array expressions over one `split`; text never
    * shuffles, nothing reaches the driver.
    */
  def boilerplateLines(docsDf: DataFrame, minChars: Int = 30): DataFrame = {
    val base = docsDf.select(col("doc_id"), docLines(col("text")).as("ls"))
      .select(col("doc_id"), col("ls"),
        filter(col("ls"), contentLine(minChars)).as("kept"))
    val chars = (c: Column) => aggregate(c, lit(0L), (acc, x) => acc + length(x))
    base.select(col("doc_id"),
      size(col("ls")).cast("long").as("n_lines"),
      size(col("kept")).cast("long").as("kept_lines"),
      chars(col("ls")).as("total_chars"),
      chars(col("kept")).as("kept_chars"),
      md5(concat_ws("\n", col("kept"))).as("content_hash"))
      .withColumn("kept_char_frac",
        round(col("kept_chars") / greatest(col("total_chars"), lit(1L)), 4))
  }

  /** Cleaned text (surviving lines re-joined) as a SCALAR column — the
    * SQL surface's `graft_clean_lines(text[, minChars])`. Same line
    * model and content test as [[boilerplateLines]].
    */
  def cleanedColumn(text: Column, minChars: Int = 30): Column =
    concat_ws("\n", filter(docLines(text), contentLine(minChars)))

  // non-empty trimmed lines / the prose-line test — the single source
  // for both boilerplate surfaces
  private def docLines(text: Column): Column =
    filter(transform(split(text, "\n"), l => trim(l)), l => l =!= "")

  private def contentLine(minChars: Int): Column => Column = l =>
    length(l) >= minChars &&
      !(l.startsWith("-") || l.startsWith("*") || l.startsWith("•")) &&
      l.rlike("[a-z]")

  // Every metric and verdict from a text column and its MATERIALIZED
  // token array — shared by gopher() (attribute inputs) and
  // keepColumn() (lambda-bound inputs). Ordered; `keep` is last.
  private def ruleCols(text: Column, toks: Column, minWords: Int,
      maxWords: Int, minStopHits: Int): Seq[(String, Column)] = {
    val nWords = size(toks).cast("long")
    val sumLen = length(concat_ws("", toks)).cast("long")
    // '#' count + ellipsis count ('…' or literal '...'); counting via
    // length deltas keeps it translate/replace-only (no regex corners).
    val hashCount =
      (length(text) - length(translate(text, "#", ""))).cast("long")
    val uniEll =
      (length(text) - length(translate(text, "…", ""))).cast("long")
    val asciiEll =
      ((length(text) - length(replace(text, lit("..."), lit("")))) / 3)
        .cast("long")
    val symbols = hashCount + uniEll + asciiEll

    val lines = filter(split(text, "\n"), l => l =!= "")
    val nLines = greatest(size(lines), lit(1)).cast("long")
    val bulletLines = size(filter(lines, l =>
      l.startsWith("-") || l.startsWith("*") || l.startsWith("•"))).cast("long")
    val ellipsisLines = size(filter(lines, l =>
      l.endsWith("...") || l.endsWith("…"))).cast("long")

    val alphaWords =
      size(filter(toks, t => t.rlike("[a-z]"))).cast("long")
    val stopHits = size(filter(toks,
      t => t.isin(StopWords.map(lit): _*))).cast("long")
    // distinct-presence count: scan the 8-word stop set against the
    // token array (8 array_contains per row) rather than
    // array_distinct'ing the tokens — the stop set is the small side
    val stopDistinct = size(filter(typedlit(StopWords),
      s => array_contains(toks, s))).cast("long")

    val safeN = greatest(nWords, lit(1L))

    // Integer cross-multiplied verdicts — see scaladoc.
    val rWords = nWords >= minWords && nWords <= maxWords
    val rWordLen = sumLen >= lit(3L) * safeN && sumLen <= lit(10L) * safeN
    val rSymbol = symbols * 10L <= safeN
    val rBullet = bulletLines * 10L <= nLines * 9L
    val rEllipsis = ellipsisLines * 10L <= nLines * 3L
    val rAlpha = alphaWords * 5L >= nWords * 4L
    val rStop = stopDistinct >= minStopHits

    Seq(
      "n_words" -> nWords,
      "mean_word_len" -> round(sumLen / safeN, 4),
      "n_symbols" -> symbols,
      "bullet_lines" -> bulletLines,
      "ellipsis_lines" -> ellipsisLines,
      "alpha_word_ratio" -> round(alphaWords / safeN, 4),
      "stop_hits" -> stopHits,
      "stop_distinct" -> stopDistinct,
      "r_word_count" -> rWords,
      "r_word_len" -> rWordLen,
      "r_symbol" -> rSymbol,
      "r_bullet" -> rBullet,
      "r_ellipsis" -> rEllipsis,
      "r_alpha" -> rAlpha,
      "r_stop" -> rStop,
      "keep" -> (rWords && rWordLen && rSymbol && rBullet && rEllipsis &&
        rAlpha && rStop))
  }
}
