package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Corpus-trained n-gram language-model scoring — the CCNet-style
  * quality filter (Wenzek et al. 2020, arXiv:1911.00359): documents
  * whose token sequences the corpus LM finds surprising (high mean
  * negative log-likelihood) are boilerplate/gibberish candidates;
  * unusually LOW nll flags templated/repetitive text. The reference
  * pipeline has no LM filter; this is part of the builder's
  * training-data mandate.
  *
  * Model: add-alpha smoothed word bigrams,
  * p(w2|w1) = (c(w1,w2) + alpha) / (c(w1) + alpha * V), with c(w1)
  * counted over CONTEXTS (occurrences of w1 as a bigram left side) so
  * probabilities normalize exactly, and V the distinct-token vocabulary
  * size. The per-document score is the count-weighted mean nll over its
  * bigrams.
  *
  * Scale shape (everything is one tokenize pass + aggregations):
  *  - per-doc bigram multisets `(doc_id, w1, w2, k)` are aggregated
  *    FIRST (map-side partial; repeated bigrams inside a doc collapse),
  *    and both model tables derive from that same frame — the corpus is
  *    tokenized exactly once and the raw (doc, position) rows never
  *    shuffle;
  *  - the vocabulary scalar V rides a broadcast cross join (the t09
  *    pattern) — no driver-side count;
  *  - scoring joins doc-bigrams to the model on (w1, w2) then (w1).
  *    The model side is one row per DISTINCT bigram/context — at web
  *    scale prune it with `minCount` (rare bigrams hit the smoothing
  *    floor anyway, the standard CCNet trick) and the model becomes
  *    broadcastable by construction; hot bigrams ("of the") skew the
  *    shuffle join, which AQE skew-split handles (conf'd on in
  *    GraftSession).
  */
object NgramLm {

  /** Per-document bigram multiset: (idCol, w1, w2, k). Documents with
    * fewer than two tokens contribute no rows.
    */
  def docBigrams(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val toks = docs.select(col(idCol), TextFns.tokens(col(textCol)).as("ts"))
    toks
      .filter(size(col("ts")) >= 2)
      .select(col(idCol), explode(
        transform(sequence(lit(1), size(col("ts")) - 1),
          i => struct(element_at(col("ts"), i).as("w1"),
            element_at(col("ts"), i + 1).as("w2")))).as("b"))
      .groupBy(col(idCol), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("k"))
  }

  /** Score every document under the corpus bigram LM:
    * (idCol, n_bigrams, avg_nll). `minCount` > 1 drops rare bigrams
    * from the model (their contexts stay); dropped bigrams score at the
    * unseen-pair smoothing floor.
    */
  def perplexityScores(docs: DataFrame, alpha: Double = 0.5,
      minCount: Long = 1L, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val db = docBigrams(docs, textCol, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n12 = db.groupBy("w1", "w2").agg(sum("k").as("n12"))
      .filter(col("n12") >= minCount)
    val n1 = db.groupBy("w1").agg(sum("k").as("n1"))
    val vocab = docs
      .select(explode(TextFns.tokens(col(textCol))).as("w"))
      .agg(countDistinct(col("w")).as("_v"))
    val nll = -log((coalesce(col("n12"), lit(0L)) + lit(alpha)) /
      (col("n1") + lit(alpha) * col("_v")))
    db.join(n12, Seq("w1", "w2"), "left")
      .join(n1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("nll", nll)
      .groupBy(col(idCol))
      .agg(sum("k").as("n_bigrams"),
        (sum(col("k") * col("nll")) / sum("k")).as("avg_nll"))
  }
}
