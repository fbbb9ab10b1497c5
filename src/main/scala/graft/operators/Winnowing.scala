package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
  * 2003): hash every k-char gram of the normalized text, slide a
  * window of `w` consecutive gram hashes, and keep each window's
  * minimum. The selected set is a position-robust fingerprint — any
  * shared substring of length >= k + w - 1 between two documents
  * yields at least one shared selected hash (the paper's guarantee),
  * at an expected density of 2/(w+1) of all grams.
  *
  * This is the local complement of the repo's global fingerprints
  * (t06 md5, t31 span dedup): winnowing detects PARTIAL overlap —
  * quotation, boilerplate, mirrored passages — which whole-document
  * hashing misses and which all-pairs n-gram Jaccard (t02) only finds
  * at quadratic candidate cost.
  *
  * Scale shape: fingerprint extraction is a SINGLE PROJECTION — the
  * gram hashes, the sliding minima, and the distinct-set digest are
  * array expressions inside one codegen'd select, so no explode, no
  * shuffle, nothing leaves the row until the per-doc summary. On
  * 100 TB the extraction is a map-only pass at scan speed; only the
  * optional pair-matching step shuffles, and it shuffles the SELECTED
  * hashes (2/(w+1) density), never the text.
  *
  * Determinism: minima are plain string-min over md5 hex — equal
  * k-grams hash equally, so ties only arise from genuinely repeated
  * text and resolve identically in any engine. We keep the selected
  * SET (the fingerprint), not positions, which sidesteps the
  * rightmost-tie rule of "robust winnowing" without affecting the
  * overlap guarantee.
  */
object Winnowing {

  /** Per-document fingerprint summary: gram count, selected-hash set
    * size, and an order-canonical digest of the selected set.
    * Columns: doc_id, n_grams, n_fps, fp_digest.
    */
  def fingerprints(docsDf: DataFrame, k: Int = 8, w: Int = 4): DataFrame =
    withSelected(docsDf, k, w).select(
      col("doc_id"),
      col("n_grams"),
      size(col("fps")).cast("long").as("n_fps"),
      md5(concat_ws("", col("fps"))).as("fp_digest"))

  /** doc_id, n_grams, fps: the selected fingerprint hashes (sorted,
    * distinct) — the join-able form pair-matching consumes.
    */
  def withSelected(docsDf: DataFrame, k: Int = 8, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"k and w must be positive, got k=$k w=$w")
    docsDf
      .select(col("doc_id"), TextFns.normalized(col("text")).as("norm"))
      .select(col("doc_id"), col("norm"),
        greatest(length(col("norm")) - lit(k - 1), lit(0)).cast("long")
          .as("n_grams"))
      // Materialize the gram-hash ARRAY before the window pass: passing
      // the transform expression straight into sortedMinima would
      // re-evaluate every md5 once per window — O(n²) hashing, the
      // re-tokenization trap TextFns.shinglesFromTokens documents
      // (observed: sf0.1 extraction pegged one core for >10 min; with
      // the materialized attribute it is O(n·w) and finishes in
      // seconds).
      .select(col("doc_id"), col("n_grams"),
        gramHashes(col("norm"), k).as("hashes"))
      .select(
        col("doc_id"),
        col("n_grams"),
        when(col("n_grams") >= 1L,
          sortedMinima(col("hashes"), col("n_grams"), w))
          .otherwise(array().cast("array<string>"))
          .as("fps"))
  }

  // md5 hex of each k-gram of `norm` (1-based starts 1..n-k+1; the
  // sequence upper bound is clamped to 1 for the same count-DOWN trap
  // TextFns.shinglesFromTokens documents — callers gate on n_grams).
  private def gramHashes(norm: Column, k: Int): Column =
    transform(
      sequence(lit(1), greatest(length(norm) - lit(k - 1), lit(1))),
      i => md5(norm.substr(i, lit(k))))

  // Distinct, sorted window minima: window j covers gram hashes
  // j..j+w-1 (slice truncates at the array end, which collapses a
  // shorter-than-w document to a single whole-array window).
  private def sortedMinima(hashes: Column, nGrams: Column, w: Int): Column =
    array_sort(array_distinct(transform(
      sequence(lit(1), greatest(nGrams - lit(w - 1), lit(1L)).cast("int")),
      j => array_min(slice(hashes, j, lit(w))))))

  /** The fp_digest as a SCALAR column over any text expression — the
    * SQL surface's `graft_winnow_digest(text)` (round-9 VERDICT item
    * 5). Matches [[fingerprints]]' `fp_digest` exactly (md5 of the
    * sorted distinct selected hashes; md5('') for gram-less docs).
    * The normalized text and the gram-hash array are bound as lambda
    * values (single-element-transform trick) so the window minima read
    * evaluated arrays — the same O(n²) re-evaluation trap
    * [[withSelected]] dodges with its materializing select, which a
    * scalar function has no select stage to dodge with.
    */
  def digestColumn(text: Column, k: Int = 8, w: Int = 4): Column = {
    require(k >= 1 && w >= 1, s"k and w must be positive, got k=$k w=$w")
    element_at(transform(array(TextFns.normalized(text)), norm => {
      val nGrams = greatest(length(norm) - lit(k - 1), lit(0)).cast("long")
      element_at(transform(array(gramHashes(norm, k)), hashes =>
        md5(concat_ws("",
          when(nGrams >= 1L, sortedMinima(hashes, nGrams, w))
            .otherwise(array().cast("array<string>"))))), 1)
    }), 1)
  }

  /** Near-dup candidate pairs by shared selected fingerprints: pairs
    * of documents sharing >= `minShared` selected hashes, with the
    * shared count. One shuffle keyed on the selected hash (the
    * 2/(w+1)-density set), self-joined like the LSH banding joins —
    * the text never shuffles.
    */
  def sharedPairs(docsDf: DataFrame, k: Int = 8, w: Int = 4,
                  minShared: Int = 2): DataFrame = {
    val sel = withSelected(docsDf, k, w)
      .select(col("doc_id"), explode(col("fps")).as("fp"))
    sel.as("x").join(sel.as("y"),
        col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
  }
}
