package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** DSIR — Data Selection with Importance Resampling (Xie et al.,
  * NeurIPS 2023): score every raw document by how much more likely its
  * hashed n-gram features are under a TARGET distribution (the data
  * you want more of) than under the RAW pool, then keep the
  * highest-weight documents. This is the standard cheap alternative to
  * classifier-based selection (t33) when the "quality" signal is an
  * exemplar corpus rather than labels: log w(x) = Σ_b n_b(x) ·
  * (log p_target[b] − log p_raw[b]) over hashed unigram+bigram bucket
  * counts with add-1 smoothing.
  *
  * Scale shape, stage by stage:
  *  - featurize: tokens → unigrams+bigrams → md5-prefix bucket, all
  *    codegen'd column arithmetic; one explode (gram-count rows, the
  *    same volume every shingling operator here carries), immediately
  *    COMPACTED to the per-doc count vector (doc_id, bucket, cnt) —
  *    the frame both later passes read (persisted; raw gram rows are
  *    never materialized twice nor cached);
  *  - bucket stats: ONE shuffle bounded by `nBuckets` keys (map-side
  *    partial sums make the exchange `nBuckets × partitions` rows at
  *    most) — the model is `nBuckets` log-ratios, nothing driver-side;
  *  - scoring: grams join the λ-table via BROADCAST (the table is
  *    `nBuckets` rows by construction), then one doc_id-keyed
  *    aggregation — the only data-sized shuffle, keyed on the output
  *    grain;
  *  - selection: top-K ids via orderBy+limit (TakeOrdered — no global
  *    sort materialization) broadcast back as a semi-join flag, the
  *    q05/e07 pattern, so the full corpus is never globally sorted.
  *
  * FP discipline: scores are sums of `ln` values, so cross-engine
  * equality relies on the t27 argument — last-ulp libm differences
  * summed over ~10² grams sit ~1e-13 relative, 9+ orders below the
  * 4-decimal rounding; ranking ties on the ROUNDED score break by
  * doc_id, so selection is deterministic in both engines.
  */
object Dsir {

  /** Per-document DSIR importance weights against `isTarget` docs.
    * Columns: doc_id, n_grams, log_w (per-gram mean log importance,
    * rounded to 4), selected (top-`selectK` by (log_w desc, doc_id)).
    */
  def importanceWeights(docsDf: DataFrame, isTarget: Column,
                        nBuckets: Int = 1024, selectK: Int = 250): DataFrame = {
    require(nBuckets > 0 && selectK >= 0, "nBuckets/selectK must be positive")
    // The raw gram rows feed BOTH the bucket-stats training pass and
    // the scoring pass; materializing them raw would persist a frame
    // ~2× corpus tokens. Compacting to the per-document COUNT VECTOR
    // first — (doc_id, tgt, bucket, cnt), ≤ docs × min(nBuckets,
    // grams-per-doc) rows — is what actually gets persisted: it is the
    // DSIR feature vector itself, it map-side-combines on the way in,
    // and both consumers read it instead of re-running
    // tokenize→explode→md5 per pass (round-10: RepBench sf0.1 min fell
    // 3.5 s → see SCALING.md; output identical, sum(lam·cnt) vs
    // Σ-per-occurrence differs at ~1e-16 relative, far below the
    // 4-decimal rounding).
    val gramCounts = hashedGrams(docsDf, isTarget, nBuckets)
      .groupBy("doc_id", "tgt", "bucket").agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // nBuckets-keyed stats + 1-row totals; the cross join is the
    // documented 1-row-broadcast shape (TrainingData e07 precedent).
    val stats = gramCounts.groupBy("bucket").agg(
      sum(when(col("tgt"), col("cnt")).otherwise(0L)).as("ct"),
      sum(when(col("tgt"), 0L).otherwise(col("cnt"))).as("cr"))
    val totals = stats.agg(
      sum("ct").as("t_total"), sum("cr").as("r_total"))
    val lambda = stats.crossJoin(broadcast(totals)).select(
      col("bucket"),
      (log((col("ct") + 1.0) / (col("t_total") + nBuckets.toDouble)) -
        log((col("cr") + 1.0) / (col("r_total") + nBuckets.toDouble)))
        .as("lam"))

    // Persisted at the doc grain (one small row per document): the
    // scored frame is consumed twice — once to pick the top-K ids,
    // once in the final flag join — and without the persist the whole
    // train+score lineage runs twice (RepBench min 4.1 s → 1.5 s at
    // sf0.1). The e05 aug.persist precedent.
    val scored = gramCounts.join(broadcast(lambda), "bucket")
      .groupBy("doc_id")
      // + 0.0 canonicalizes IEEE negative zero (a tiny negative mean
      // rounds to -0.0 in one engine and 0.0 in the other otherwise).
      .agg(sum("cnt").as("n_grams"),
        (round(sum(col("lam") * col("cnt")) / sum("cnt"), 4) + 0.0).as("log_w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val topIds = scored
      .orderBy(col("log_w").desc, col("doc_id"))
      .limit(selectK)
      .select(col("doc_id").as("sel_id"))
    // LEFT from the full doc set: a token-less document has no gram
    // rows and would otherwise vanish from the output entirely —
    // downstream joins would read "missing" where the contract says
    // "not selected". Such docs carry n_grams 0, log_w 0.0, selected
    // false.
    docsDf.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .join(broadcast(topIds), col("doc_id") === col("sel_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("log_w"), lit(0.0)).as("log_w"),
        col("sel_id").isNotNull.as("selected"))
  }

  /** (doc_id, tgt, bucket) rows: one per unigram and bigram OCCURRENCE
    * (hashed counts, not distinct sets — DSIR's feature is the count
    * vector), bucketed by md5-prefix mod `nBuckets`.
    */
  private def hashedGrams(docsDf: DataFrame, isTarget: Column,
                          nBuckets: Int): DataFrame = {
    val base = docsDf.select(col("doc_id"), isTarget.as("tgt"),
      TextFns.tokens(col("text")).as("toks"))
    val bigrams = when(size(col("toks")) >= 2,
      transform(sequence(lit(1), greatest(size(col("toks")) - 1, lit(1))),
        i => concat_ws(" ", element_at(col("toks"), i),
          element_at(col("toks"), i + 1))))
      .otherwise(array().cast("array<string>"))
    base
      .select(col("doc_id"), col("tgt"),
        explode(concat(col("toks"), bigrams)).as("gram"))
      .select(col("doc_id"), col("tgt"),
        (conv(substring(md5(col("gram")), 1, 6), 16, 10).cast("long") %
          nBuckets).as("bucket"))
  }
}
