package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream join — the impressions-to-clicks /
  * request-to-response correlation operator.
  *
  * Spark only admits an unbounded stream-stream join when BOTH sides
  * carry a watermark and the join condition bounds event time; this
  * operator packages exactly that shape: equality on a key plus
  * `right.ts in [left.ts, left.ts + horizon]`.
  *
  * Scale posture: state is partitioned by the join key like any
  * shuffle, and the watermark + time-range bound lets the state store
  * EVICT rows once they can no longer match — so per-executor state is
  * bounded by (rate x (watermark + horizon)), not stream lifetime.
  * Correlations across micro-batches (a click arriving batches after
  * its impression) come from the checkpointed state for free.
  */
object StreamJoin {

  /** @param key      join-key column name, same on both sides
    * @param leftTs   event-time column on `left` (must differ from
    *                 `rightTs` — both survive into the output)
    * @param horizon  how far after `leftTs` a right row may arrive and
    *                 still correlate (e.g. "5 minutes")
    * @param joinType "inner" or "leftOuter" (left-unmatched rows emit
    *                 with nulls once the watermark passes)
    */
  def eventCorrelation(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      watermark: String = "10 minutes",
      horizon: String = "5 minutes",
      joinType: String = "inner"): DataFrame = {
    require(leftTs != rightTs, "timestamp columns must be named differently")
    val l = left.withWatermark(leftTs, watermark).alias("l")
    val r = right.withWatermark(rightTs, watermark).alias("r")
    val cond = col(s"l.$key") === col(s"r.$key") &&
      col(s"r.$rightTs") >= col(s"l.$leftTs") &&
      col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"interval $horizon")
    l.join(r, cond, joinType).drop(col(s"r.$key"))
  }

  /** Stream-static enrichment: the streaming side joins a BATCH
    * dimension table, stateless — no watermark, no join state, because
    * the static side is re-evaluated per micro-batch (which also means
    * a dimension refreshed on disk is picked up by the NEXT batch
    * without restarting the query). The dimension is broadcast: at
    * 100 TB of stream the enrich stage stays a map-side hash join per
    * batch, never a shuffle of the stream. `joinType` left_outer keeps
    * unmatched stream rows (nulls), the usual enrichment posture.
    */
  def enrich(
      stream: DataFrame,
      dim: DataFrame,
      key: String,
      joinType: String = "left_outer"): DataFrame =
    stream.join(broadcast(dim), Seq(key), joinType)
}
