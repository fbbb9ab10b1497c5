package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with a watermark — the streaming
  * extension SURVEY §2.5 flags beyond the reference's partition-only
  * event-time handling: the reference routes records into 20 s
  * partition paths (s3-connector-config.json:20-23) but never
  * aggregates; this operator adds tumbling-window aggregates with a
  * late-data bound, the Spark-native upgrade path.
  */
object WindowedAggs {

  /** Tumbling event-time windows over an epoch-millis column.
    * In streaming mode the watermark bounds state and drops
    * later-than-`lateness` data; the same expression tree runs in batch
    * (watermark is a no-op there), so batch backfills and the live
    * stream share one definition.
    */
  def tumbling(
      events: DataFrame,
      tsMsCol: String,
      windowLength: String,
      lateness: String,
      valueCol: String): DataFrame =
    events
      .withColumn("ets", timestamp_millis(col(tsMsCol).cast("long")))
      .withWatermark("ets", lateness)
      .groupBy(window(col("ets"), windowLength))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 2).as("total"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("n_events"), col("total"))

  /** Per-key session windows (`session_window`, gap-merged inside the
    * aggregation): one row per (key, session) with bounds and event
    * count. In streaming mode the watermark both bounds state AND
    * finalizes sessions (a session can only merge with future events
    * until the watermark passes its close); batch runs the identical
    * expression tree — q31 hash-checks those semantics against the
    * gaps-and-islands oracle.
    */
  def sessions(
      events: DataFrame,
      tsMsCol: String,
      keyCol: String,
      gap: String,
      lateness: String): DataFrame =
    events
      .withColumn("ets", timestamp_millis(col(tsMsCol).cast("long")))
      .withWatermark("ets", lateness)
      .groupBy(col(keyCol), session_window(col("ets"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        col("sw.start").as("session_start"),
        col("sw.end").as("session_end"),
        col("n_events"))
}
