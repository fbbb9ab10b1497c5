package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Production corpora are sampled by CONTENT-STABLE hash, not RNG:
  * re-running the pipeline, adding executors, or re-partitioning must
  * not change which documents are kept (otherwise dedup/train/eval
  * splits drift between runs). `rand(seed)` is partition-dependent in
  * Spark; a key hash is not.
  *
  * The hash here is the first 4 hex chars of md5(key) compared against
  * a threshold — 65536 buckets, rate granularity 2^-16. md5 renders
  * identically in every engine (lowercase hex), so each sample is
  * reproducible in DuckDB/Trino/pandas byte-for-byte — which is also
  * what makes the oracle checks possible.
  *
  * Scale: a sample is a pure per-row filter — no shuffle, no state,
  * pushed into the scan stage. Stratified rates ride a broadcast map
  * expression; the mixture union is N filtered scans.
  */
object Sampling {

  /** 4-hex-digit threshold for a keep-rate in [0,1]; "g" (> every hex
    * digit) means keep-all, so the compare stays a plain string <.
    */
  private[graft] def rateThreshold(rate: Double): String = {
    val n = math.round(rate.max(0).min(1) * 65536).toInt
    if (n >= 65536) "g" else f"$n%04x"
  }

  /** Hash-bucket expression: first 4 hex chars of md5(key as string). */
  def hashBucket(key: Column): Column = substring(md5(key.cast("string")), 1, 4)

  /** Keep ~rate of rows, selected by stable key hash. */
  def hashSample(df: DataFrame, keyCol: String, rate: Double): DataFrame =
    df.filter(hashBucket(col(keyCol)) < lit(rateThreshold(rate)))

  /** Per-stratum keep-rates (strata not in the map are dropped —
    * explicit allow-list, the usual curation posture).
    */
  def stratifiedSample(df: DataFrame, strataCol: Column, keyCol: String,
      rates: Map[String, Double]): DataFrame = {
    val threshold = rates.foldLeft(lit(null).cast("string")) {
      case (acc, (stratum, rate)) =>
        when(strataCol === stratum, lit(rateThreshold(rate))).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol)) < threshold) // null threshold -> dropped
  }

  /** Weighted mixture of sources: each source is hash-sampled at its
    * rate and tagged; the union preserves per-source schemas projected
    * to (source, id, payload). The LLM dataset-mixing primitive — at
    * 100 TB each source stays a filtered scan, the union is free
    * (no shuffle), and the mix is reproducible run-over-run.
    */
  def mixture(sources: Seq[(String, DataFrame, Double)]): DataFrame =
    sources.map { case (name, df, rate) =>
      hashSample(df, "id", rate).withColumn("source", lit(name))
        .select("source", "id", "payload")
    }.reduce(_ unionAll _)

  /** Temperature-scaled mixture weights: per group (language, source,
    * domain…), the sampling probability p_g ∝ size_g^alpha normalized
    * over groups — the multilingual-balancing rule (alpha < 1 upsamples
    * low-resource groups, alpha = 1 is proportional, alpha = 0 is
    * uniform; XLM-R trains with alpha = 0.3 over per-language token
    * counts). Emits per group: n_docs, total size, the natural share,
    * the temperature weight, and boost = weight/share — the factor an
    * epoch plan multiplies into each group's sampling rate (feed it to
    * [[stratifiedSample]]/[[epochPlan]]).
    *
    * Scale posture: one aggregation keyed on the group column (size
    * values partial-aggregate map-side), then the normalization joins
    * the GROUPED frame — #groups rows, never corpus rows — against its
    * own one-row total via broadcast. Corpus text is scanned once and
    * nothing wider than (group, two longs) shuffles.
    */
  def temperatureWeights(df: DataFrame, groupCol: String, sizeCol: Column,
      alpha: Double): DataFrame = {
    require(alpha >= 0.0, s"alpha must be >= 0, got $alpha")
    val g = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"), sum(sizeCol).cast("long").as("total"))
    val sums = g.agg(sum("total").as("gt"),
      sum(pow(col("total"), alpha)).as("gp"))
    val share = col("total") / col("gt")
    val weight = pow(col("total"), alpha) / col("gp")
    g.crossJoin(broadcast(sums))
      .select(col(groupCol), col("n_docs"), col("total"),
        round(share, 4).as("share"),
        round(weight, 4).as("weight"),
        round(weight / share, 4).as("boost"))
  }

  /** Deterministic train/val/test split assignment: every row gets the
    * split whose cumulative hash-bucket range contains md5(key) — the
    * canonical "90/5/5" partition of a training corpus. Content-stable
    * like every sampler here: re-runs, re-partitioning, and adding
    * executors never move a document between splits, and a document
    * added tomorrow lands in the same split it would have today
    * (fractions move only the boundaries). Pure per-row expression —
    * no shuffle; granularity 2^-16 as in [[rateThreshold]].
    */
  def split(df: DataFrame, keyCol: String,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "at least one split")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${splits.map(_._2).sum}")
    val cums = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val b = hashBucket(col(keyCol))
    val assign = splits.zip(cums).reverse
      .foldLeft(lit(null).cast("string")) {
        case (els, ((name, _), cum)) =>
          when(b < lit(rateThreshold(cum)), lit(name)).otherwise(els)
      }
    df.withColumn("split", assign)
  }

  /** Per-ROW keep probability — importance/quality-weighted
    * downsampling: keep iff hashBucket(key) < threshold(rate), where
    * `rate` is a column in [0,1] (e.g. a quality score). The soft
    * filter between "keep all" and "drop all": low-quality documents
    * survive at reduced rates instead of a cliff, content-stable like
    * every sampler here (same doc, same decision, any run). Pure
    * per-row expressions; same 2^-16 grid as [[rateThreshold]].
    */
  def weightedSample(df: DataFrame, keyCol: String, rate: Column): DataFrame = {
    val n = least(greatest(round(rate * 65536).cast("int"), lit(0)), lit(65536))
    val thr = when(n >= 65536, lit("g"))
      .otherwise(lower(lpad(conv(n.cast("string"), 10, 16), 4, "0")))
    df.filter(hashBucket(col(keyCol)) < thr)
  }

  /** Per-group quota: keep at most `k` rows per group, chosen in
    * stable hash order of the key (deterministic "cap every domain /
    * language / cluster at k" curation — the operation that stops one
    * CommonCrawl domain from dominating a mixture). One shuffle on
    * the group key; per-group TOP-K via row_number, never a global
    * sort. Groups hotter than a partition → the Skew salting pattern.
    */
  def groupQuota(df: DataFrame, groupCol: String, keyCol: String,
      k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
      // full md5 then key: hash order, total and deterministic
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k)
      .drop("_rk")
  }

  /** Token-budget EPOCH PLANNING — the upsampling half of mixture
    * construction (t11's `mixture` is the downsampling half): each
    * source gets `budget / n_sources` target tokens; sources smaller
    * than their target repeat (`full_epochs` whole passes) plus a
    * hash-sampled FRACTIONAL epoch covering the remainder, so the
    * emitted token count tracks the target without truncating to
    * whole passes (the standard pretraining-mixture recipe: small
    * high-quality sources run multiple epochs, big crawls run < 1).
    *
    * Everything is derived per source from one aggregation; the
    * fractional-epoch membership is the same content-stable md5
    * threshold as [[hashSample]], so the plan AND the sampled doc set
    * are reproducible across runs/engines. Output per source:
    * (n_docs, n_tokens, target_tokens, full_epochs, rem_frac,
    * rem_docs, rem_tokens, emitted_tokens).
    *
    * Scale: one groupBy(source) pass + one broadcast of the per-source
    * plan back onto the corpus for the remainder count — the corpus is
    * scanned twice and never shuffled (the plan frame is
    * sources-sized). The expansion itself (emitting epoch copies) is a
    * later `explode(sequence(1, full_epochs))` over the planned frame
    * — metadata until materialization.
    */
  def epochPlan(df: DataFrame, sourceCol: String, tokenCol: String,
      budgetTokens: Long, keyCol: String = "doc_id"): DataFrame = {
    val per = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokenCol)).cast("long").as("n_tokens"))
    val nSrc = per.agg(count(lit(1)).as("_n_src"))
    val planned = per.crossJoin(broadcast(nSrc))
      .withColumn("target_tokens",
        floor(lit(budgetTokens) / col("_n_src")).cast("long"))
      .withColumn("full_epochs",
        floor(col("target_tokens") / col("n_tokens")).cast("long"))
      .withColumn("rem_frac",
        (col("target_tokens") - col("full_epochs") * col("n_tokens")) /
          col("n_tokens"))
    // fractional-epoch membership: md5(doc key) under the source's
    // remainder-rate threshold (rateThreshold semantics inline so the
    // per-source rate can be a COLUMN, not a constant)
    val n16 = least(greatest(round(col("rem_frac") * 65536).cast("int"),
      lit(0)), lit(65536))
    val thr = when(n16 >= 65536, lit("g"))
      .otherwise(lpad(lower(conv(n16.cast("string"), 10, 16)), 4, "0"))
    val rem = df
      .join(broadcast(planned.select(col(sourceCol), col("rem_frac"))),
        Seq(sourceCol))
      .filter(hashBucket(col(keyCol)) < thr)
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("rem_docs"),
        sum(col(tokenCol)).cast("long").as("rem_tokens"))
    planned.join(rem, Seq(sourceCol), "left")
      .select(col(sourceCol), col("n_docs"), col("n_tokens"),
        col("target_tokens"), col("full_epochs"),
        round(col("rem_frac"), 4).as("rem_frac"),
        coalesce(col("rem_docs"), lit(0L)).as("rem_docs"),
        coalesce(col("rem_tokens"), lit(0L)).as("rem_tokens"),
        (col("full_epochs") * col("n_tokens") +
          coalesce(col("rem_tokens"), lit(0L))).as("emitted_tokens"))
  }

  /** Deterministic shard + within-shard position assignment — the
    * "globally shuffle the corpus and write S balanced training
    * shards" step every pretraining run ends with. shard =
    * md5-prefix(key) mod S (uniform, seed-free, reproducible across
    * engines and runs); pos = rank of the full md5 within the shard,
    * so the read order inside a shard is also content-derived, not
    * ingest-order. One shuffle on shard (S-way); NO global sort —
    * the mod-hash shard is what a `repartitionByRange(md5)` global
    * shuffle converges to, minus the range-boundary sampling pass.
    * Balance: multinomial(n, 1/S) → shard sizes within O(√(n/S)).
    * Write side: `df.repartition(S, col("shard")).sortWithinPartitions
    * ("pos")` streams each shard as one sorted file.
    */
  def shards(df: DataFrame, keyCol: String, nShards: Int): DataFrame = {
    val h = md5(col(keyCol).cast("string"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("_h"), col(keyCol))
    df.withColumn("_h", h)
      .withColumn("shard",
        (conv(substring(col("_h"), 1, 6), 16, 10).cast("long") % nShards)
          .as("shard"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("_h")
  }
}
