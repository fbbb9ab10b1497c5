package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi:
  * Optimizing Data Mixtures Speeds Up Language Model Pretraining"):
  * per-domain EXCESS LOSS — how much a weak proxy model lags a
  * stronger reference on that domain — drives a multiplicative update
  * of the sampling weights, upweighting hard-but-learnable domains
  * and downweighting both the saturated (no excess) and the noisy
  * (reference struggles too, excess clips at 0 only when the proxy is
  * AHEAD).
  *
  * The paper's proxy/reference are small LMs trained in the loop;
  * here both come from the repo's own corpus-trained models — proxy =
  * add-α bigram ([[NgramLm.perplexityScores]], the underfit model),
  * reference = interpolated Kneser–Ney ([[NgramLm.kneserNeyScores]],
  * the stronger smoothing of the SAME events) — so the whole update
  * is computable in one engine pass and restatable in SQL:
  *
  *   excess_d = max(0, nll_proxy(d) − nll_ref(d))     (bigram-count-
  *                                                     weighted means)
  *   w_d ∝ share_d · exp(η · excess_d)                (share = domain
  *                                                     token fraction)
  *   weight_d = (1−c)·ŵ_d + c/|D|                     (uniform
  *                                                     smoothing mix)
  *
  * Scale shape: the two scorings are the t27/t54 shapes (distinct-
  * bigram model tables, per-doc multisets aggregated before any
  * shuffle); everything after is a |D|-row aggregation with the two
  * scalar totals riding broadcast cross joins — nothing wider than
  * (domain, few doubles) moves, and the driver sees nothing.
  */
object Doremi {

  def mixtureWeights(docs: DataFrame, eta: Double = 1.0,
      smoothing: Double = 0.1, groupCol: String = "source",
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(smoothing >= 0 && smoothing < 1, s"need 0 <= c < 1, got $smoothing")
    // ONE tokenize pass feeds both models (lazy persist, released by
    // CacheHygiene — the annFromBuckets contract)
    val db = NgramLm.docBigrams(docs, textCol, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val proxy = NgramLm.perplexityScores(docs, textCol = textCol,
      idCol = idCol, bigrams = Some(db))
      .select(col(idCol), col("n_bigrams").as("kp"), col("avg_nll").as("np"))
    val ref = NgramLm.kneserNeyScores(docs, textCol = textCol,
      idCol = idCol, bigrams = Some(db))
      .select(col(idCol), col("n_bigrams").as("kr"), col("avg_nll").as("nr"))
    val base = docs.select(col(idCol), col(groupCol),
      size(TextFns.tokens(col(textCol))).cast("long").as("nt"))
    // docs too short to score (< 2 tokens) keep their token share but
    // contribute nothing to either nll — the left joins' null terms
    // drop out of the sums on both engines identically
    // dom is |D| rows (one per domain) but its subtree is the WHOLE
    // double-LM scoring pipeline; the two scalar cross joins below
    // consume it four times (raw, totals, z's raw, the final select),
    // and without a persist Catalyst re-ran the entire 242-node
    // scoring plan per consumption — 127 Exchanges in the r16 t55
    // before-plan. Persisting the |D|-row frame runs the scoring once
    // (released by CacheHygiene, same contract as `db` above).
    val dom = base
      .join(proxy, Seq(idCol), "left")
      .join(ref, Seq(idCol), "left")
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"),
        sum("nt").as("n_tokens"),
        (sum(col("kp") * col("np")) / sum("kp")).as("proxy_nll"),
        (sum(col("kr") * col("nr")) / sum("kr")).as("ref_nll"))
      .withColumn("excess",
        greatest(col("proxy_nll") - col("ref_nll"), lit(0.0)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = dom.agg(sum("n_tokens").as("_t"),
      count(lit(1)).as("_d"))
    val raw = dom.crossJoin(broadcast(totals))
      .withColumn("share", col("n_tokens") / col("_t"))
      .withColumn("raw", col("share") * exp(lit(eta) * col("excess")))
    val z = raw.agg(sum("raw").as("_z"))
    raw.crossJoin(broadcast(z))
      .select(col(groupCol), col("n_docs"), col("n_tokens"),
        col("proxy_nll"), col("ref_nll"), col("excess"), col("share"),
        (lit(1.0 - smoothing) * (col("raw") / col("_z")) +
          lit(smoothing) / col("_d")).as("weight"))
  }
}
