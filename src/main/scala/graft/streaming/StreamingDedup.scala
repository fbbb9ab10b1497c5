package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication for a continuous ingest pipeline
  * (the stream-side sibling of `operators.Dedup.exact`): fingerprint
  * the content, then `dropDuplicatesWithinWatermark` — the first
  * occurrence flows through, repeats are dropped while their
  * fingerprint is still inside the watermark horizon.
  *
  * Scale posture: the deduplication state is ONE row per distinct
  * fingerprint seen within the horizon, partitioned by fingerprint in
  * the state store like any keyed shuffle — and, unlike plain
  * `dropDuplicates` on an unbounded stream, the watermark EVICTS old
  * fingerprints, so state is bounded by (ingest rate × horizon), not
  * by stream lifetime. Exactly-once emission of first occurrences
  * comes from the checkpointed state + replayable source, same as the
  * session operator.
  */
object StreamingDedup {

  /** `tsCol` must be a timestamp column (event time); duplicates are
    * detected on md5(content).
    */
  def dedup(docs: DataFrame, tsCol: String, contentCol: String,
      watermark: String = "10 minutes"): DataFrame =
    docs.withColumn("fp", md5(col(contentCol).cast("string")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")
}
