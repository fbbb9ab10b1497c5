package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Per-group corpus-health statistics — the audit every corpus gets
  * before joining a training mixture: is a source's token distribution
  * shaped like natural language (Zipf's law: rank-frequency slope near
  * −1 on a log-log plot; a templated/machine dump flattens or
  * cliff-drops), how large/diverse is its vocabulary, and what
  * dominates it. The reference exposes corpus profiling only as ad-hoc
  * SQL through its passthrough endpoint; here it is one declarative
  * operator.
  *
  * Scale shape: one tokenize→explode into a (group, token) count —
  * the only data-sized shuffle, with map-side partials — then
  * everything downstream works on the term-frequency table (vocab
  * rows, ≪ token occurrences). The per-group rank window sorts vocab
  * rows within each group; at 100 TB vocabulary grows ~Heaps
  * (∝ N^0.5), so the window's sort input is sublinear in the corpus, and the
  * slope regression reads only the top `zipfK` rows per group.
  */
object CorpusStats {

  /** (groupCol, n_tokens, n_vocab, ttr, top_token, top_freq,
    * zipf_slope): exact counts, the type-token ratio, the modal token
    * (count-desc/token-asc deterministic tie-break), and the
    * least-squares slope of ln(freq) on ln(rank) over the group's top
    * `zipfK` tokens (the textbook Zipf exponent estimate; healthy
    * running text sits near −1).
    */
  def zipfProfile(docs: DataFrame, groupCol: String = "source",
      zipfK: Int = 50): DataFrame = {
    val tf = docs
      .select(col(groupCol).as("grp"),
        explode(TextFns.tokens(col("text"))).as("tok"))
      .groupBy("grp", "tok").agg(count(lit(1)).as("f"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val w = Window.partitionBy("grp").orderBy(col("f").desc, col("tok"))
    val ranked = tf.withColumn("r", row_number().over(w))
    val totals = tf.groupBy("grp")
      .agg(sum("f").as("n_tokens"), count(lit(1)).as("n_vocab"))
    val top = ranked.filter(col("r") === 1)
      .select(col("grp"), col("tok").as("top_token"), col("f").as("top_freq"))
    // slope = (Σxy − ΣxΣy/m) / (Σxx − ΣxΣx/m) on x=ln r, y=ln f —
    // the same moment form DuckDB's regr_slope evaluates, so the two
    // engines disagree only in summation order (~1e-14 relative on
    // ≤ zipfK O(1) terms, absorbed by the 4-decimal rounding)
    val zipf = ranked.filter(col("r") <= zipfK)
      .select(col("grp"), log(col("r").cast("double")).as("x"),
        log(col("f").cast("double")).as("y"))
      .groupBy("grp")
      .agg(count(lit(1)).cast("double").as("m"), sum("x").as("sx"),
        sum("y").as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("grp"),
        ((col("sxy") - col("sx") * col("sy") / col("m")) /
          (col("sxx") - col("sx") * col("sx") / col("m"))).as("zipf_slope"))
    totals.join(top, Seq("grp")).join(zipf, Seq("grp"))
      .select(col("grp").as(groupCol), col("n_tokens"), col("n_vocab"),
        round(col("n_vocab") / col("n_tokens"), 4).as("ttr"),
        col("top_token"), col("top_freq"),
        round(col("zipf_slope"), 4).as("zipf_slope"))
  }
}
