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
}
