package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities for hot-key workloads (builder mandate:
  * "skewed keys → salting or AQE skew-join").
  *
  * AQE's skew-join handling (on by default in GraftSession) splits
  * oversized shuffle partitions at runtime; these explicit tools cover
  * the cases AQE cannot: skewed AGGREGATION state (one reducer owns a
  * hot group) and deterministic pre-planned salting when runtime
  * re-planning is unavailable (e.g. inside foreachBatch sinks).
  */
object Skew {

  /** Two-phase salted aggregation: rows are spread over `salts`
    * sub-groups per key (phase 1: partial aggregate on (key, salt) —
    * a hot key's state is built by `salts` reducers in parallel),
    * then merged per key (phase 2: tiny — one row per key per salt).
    *
    * The salt is derived from the full row hash: deterministic for a
    * given dataset, uniformly spreading, and independent of physical
    * partitioning.
    *
    * Supported merges: additive aggregates (count/sum/min/max).
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      salts: Int,
      sums: Seq[String] = Nil,
      counts: Boolean = true): DataFrame = {
    require(counts || sums.nonEmpty,
      "saltedAgg needs at least one aggregate: counts=true or a non-empty sums list")
    val salted = df.withColumn("_salt",
      pmod(xxhash64(df.columns.map(col): _*), lit(salts.toLong)))
    val phase1Aggs =
      (if (counts) Seq(count(lit(1)).as("_cnt")) else Nil) ++
        sums.map(c => sum(col(c)).as(s"_sum_$c"))
    val phase1 = salted.groupBy((keys :+ "_salt").map(col): _*)
      .agg(phase1Aggs.head, phase1Aggs.tail: _*)
    val phase2Aggs =
      (if (counts) Seq(sum(col("_cnt")).as("n")) else Nil) ++
        sums.map(c => sum(col(s"_sum_$c")).as(s"sum_$c"))
    phase1.groupBy(keys.map(col): _*)
      .agg(phase2Aggs.head, phase2Aggs.tail: _*)
  }

  /** Salted equi-join for a skewed LEFT side: left rows get a random-
    * but-deterministic salt in [0, salts); the right side is replicated
    * `salts` times, so each hot left key's rows land on `salts`
    * reducers instead of one. Right side must be the smaller relation
    * (its shuffle volume multiplies by `salts`).
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    // Right rows are replicated once per salt: for right/full outer the
    // unmatched right rows would appear `salts` times, and right_semi/
    // right_anti change cardinality the same way — only join types that
    // never emit unmatched RIGHT rows are sound.
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti", "cross")(joinType.toLowerCase),
      s"saltedJoin supports inner/left/left_semi/left_anti/cross, not $joinType " +
        "(replicated right rows would duplicate unmatched right output)")
    val l = left.withColumn("_salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(salts.toLong)))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    l.join(r, keys :+ "_salt", joinType).drop("_salt")
  }
}
