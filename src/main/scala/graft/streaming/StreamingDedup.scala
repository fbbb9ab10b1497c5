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

  /** Streamed maintenance of t45's standing (shingle, df) index
    * ([[graft.operators.Dedup.corpusShingleIndex]] as a streaming
    * MATERIALIZED VIEW): each micro-batch's docs explode into hashed
    * word-`n`-gram shingles, an update-mode aggregation carries
    * document frequencies across batches through the checkpoint, and
    * [[Sinks.upsertSink]] applies only the CHANGED keys in place (df
    * is monotone under appends, so it is its own upsert sequence —
    * the streamed-LM-model discipline).
    *
    * Serving is unchanged batch code:
    * `Dedup.ngramNoveltyAgainst(newBatch, catalog.read(ns, table), n)`
    * scores a candidate batch against the standing index the moment a
    * micro-batch commits — no corpus rescan, no index rebuild
    * (StreamingSpec pins streamed == batch-built index equality).
    *
    * Scale posture: per-trigger state is one row per distinct shingle
    * TOUCHED in the horizon (state-store keyed shuffle); the upsert
    * rewrites only key-range-intersecting files. At 100 TB the index
    * table is the (shingle, df) aggregate — orders of magnitude
    * smaller than the corpus — and the ingest cost per batch is
    * O(batch), exactly the t19/t45 incremental contract.
    */
  /** Streamed maintenance of t19's standing posting index
    * ([[graft.operators.Dedup.postingRows]] as an append-only catalog
    * table): the (doc_id, shingle) rows are a PURE PROJECTION of each
    * micro-batch — no aggregation state at all — so the sink is a
    * plain atomic append per batch ([[Sinks.icebergLike]] replay
    * discipline). Serving is
    * `Dedup.ngramJaccardAgainstIndex(batch, catalog.read(ns, table))`:
    * a fresh ingest batch dedups against everything committed so far
    * without the corpus ever being re-shingled — the t19 incremental
    * contract with the index maintained BY the stream instead of a
    * nightly rebuild.
    */
  def postingIndexSink(docs: DataFrame, n: Int,
      catalog: graft.catalog.SnapshotCatalog, ns: String, table: String,
      checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime("5 seconds")):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    Sinks.icebergLike(graft.operators.Dedup.postingRows(docs, n),
      catalog, ns, table, checkpointDir, trigger)

  def shingleIndexSink(docs: DataFrame, n: Int,
      catalog: graft.catalog.SnapshotCatalog, ns: String, table: String,
      checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime("5 seconds")):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val df = graft.operators.Dedup.shingleRows(docs, n)
      .select(xxhash64(col("shingle")).as("shingle"))
      .groupBy("shingle")
      .agg(count(lit(1)).as("df"))
    Sinks.upsertSink(df, catalog, ns, table,
      keyCol = "shingle", seqCol = "df", checkpointDir, trigger)
  }
}
