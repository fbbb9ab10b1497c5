package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.catalog.{PartitionSpec, SnapshotCatalog}
import graft.operators.Pq

/** Streaming ANN-index maintenance: vectors arriving on a stream are
  * encoded into their IVF-PQ index rows by the SAME pure-projection
  * codegen expressions the batch operators use
  * ([[Pq.indexRows]]: normalize → nearest cell → residual → PQ code)
  * and appended to the catalog index table — one atomic snapshot per
  * micro-batch, same checkpoint discipline as [[Sinks.icebergLike]].
  *
  * Why this shape holds at 100 TB:
  *  - the projection is STATELESS (no join, no shuffle, no streaming
  *    state store) — a micro-batch costs one map pass regardless of
  *    index size, so ingest latency is independent of how big the
  *    index has grown;
  *  - the index table is hidden-partitioned `identity(cell)`, and
  *    [[Pq.searchIndexPruned]] resolves a query batch's probed cells
  *    through the manifest's recorded partition values
  *    (`SnapshotCatalog.readEquals`), so serving reads only those
  *    cells' files and never scans the firehose's history;
  *  - centroids/codebooks are FIXED inputs (trained offline on a
  *    sample, as [[Pq.trainCodebooks]] documents) — retraining is a
  *    new table + backfill, never an in-place mutation, so readers
  *    keep snapshot isolation.
  */
object VectorIndex {

  /** Start-ready writer: encode the vector stream and append to
    * `ns.table` (auto-created with `identity(cell)` hidden
    * partitioning). `vecs` needs (`idCol`, embedding) columns.
    *
    * Replay-safe: foreachBatch is at-least-once, so a micro-batch
    * retried after a mid-commit failure re-runs — the last committed
    * batchId rides each append's own snapshot commit
    * ([[Sinks.lastBatchKey]]), and already-committed batches are
    * skipped. Duplicate (id, cell, codes) rows would otherwise break
    * the VectorIndexSpec-pinned streamed==batch index equivalence and
    * could displace true neighbors in served top-k.
    */
  def indexSink(vecs: DataFrame, coarse: Array[Array[Double]],
      books: Pq.Codebooks, catalog: SnapshotCatalog, ns: String,
      table: String, checkpointDir: String, idCol: String = "vec_id",
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): DataStreamWriter[Row] =
    Pq.indexRows(vecs, coarse, books, idCol).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch(commitBatch(catalog, ns, table, checkpointDir) _)

  /** Streamed maintenance of the e21-style IVF × Hamming index
    * ([[graft.operators.Similarity.hammingIndexRows]]): same
    * architecture as [[indexSink]] — stateless pure-projection
    * encoding (frozen centroids + hyperplanes ride as expression
    * literals), one atomic cell-partitioned append per micro-batch,
    * replay-safe via the committed-batch marker. New vectors are
    * servable the moment their batch publishes; the quantizer is
    * never retrained in place (retrain = new table + backfill, the
    * snapshot-isolation contract above).
    */
  def hammingIndexSink(vecs: DataFrame, centroids: Array[Array[Double]],
      catalog: SnapshotCatalog, ns: String, table: String,
      checkpointDir: String, nBits: Int = 256, dim: Int = 64,
      seed: Long = 42L, idCol: String = "vec_id",
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): DataStreamWriter[Row] =
    graft.operators.Similarity
      .hammingIndexRows(vecs, centroids, nBits, dim, seed, idCol)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch(commitBatch(catalog, ns, table, checkpointDir) _)

  /** Serve from the streamed Hamming index reading ONLY the probed
    * cells' files (the [[graft.operators.Pq.searchIndexPruned]]
    * discipline): the query batch's probe cells resolve through the
    * manifest's recorded `identity(cell)` partition values
    * (`readEquals`), so at 100 TB a query touches nProbe cells of
    * data, never the accumulated firehose history.
    */
  def searchHammingPruned(catalog: SnapshotCatalog, ns: String,
      table: String, queries: DataFrame, k: Int, nProbe: Int,
      centroids: Array[Array[Double]], nBits: Int = 256, dim: Int = 64,
      rerank: Int = 100, seed: Long = 42L,
      queryFilter: org.apache.spark.sql.Column = org.apache.spark.sql.functions.lit(true),
      idCol: String = "vec_id"): DataFrame = {
    val unitQ = graft.operators.Similarity
      .unitVectors(queries, idCol, "id", "uv").filter(queryFilter)
    val cells = graft.operators.Pq.probedCellIds(unitQ, centroids, nProbe)
    val index = cells.map(c => catalog.readEquals(ns, table, "cell", c.toString))
      .reduceOption(_.unionAll(_))
      .getOrElse(catalog.read(ns, table).limit(0))
    graft.operators.Similarity.searchHammingIndex(index, queries, k,
      nProbe, centroids, nBits, dim, rerank, seed, queryFilter, idCol)
  }

  /** One audit's verdict: mean served recall@k over the sampled
    * queries, the sample size, and whether the alarm threshold tripped.
    */
  final case class RecallAudit(recall: Double, queries: Long, alarm: Boolean)

  /** Served-recall DRIFT AUDIT for a streamed Hamming index. The
    * quantizer (centroids + hyperplanes) is frozen by design — retrain
    * would break snapshot isolation — so as the streamed corpus drifts
    * away from the training distribution, served recall decays
    * SILENTLY: cell assignments stop separating the data and the
    * probed cells miss true neighbors. This audit is the alarm: sample
    * query vectors from the live corpus, compute EXACT top-k ground
    * truth ([[graft.operators.Similarity.knnExact]] — the tiny sample
    * broadcasts, the corpus is scanned ONCE with map-side top-k, so
    * audit cost is one corpus pass scaled by `sampleFraction`, the e19
    * audit discipline) and compare with the SERVED top-k
    * ([[searchHammingPruned]], the exact path production queries take).
    *
    * Run it as a periodic audit batch (e.g. every N micro-batches or
    * on a schedule). ON ALARM, the runbook is retrain-and-backfill:
    * train fresh centroids on a current sample
    * ([[graft.operators.Similarity.kmeansCentroids]]), build a NEW
    * index table with a backfill pass ([[graft.operators.Similarity
    * .hammingIndexRows]] over the corpus), point the serving layer at
    * the new table, then drop the old one — never an in-place mutation,
    * so readers keep snapshot isolation throughout.
    */
  def hammingRecallAudit(catalog: SnapshotCatalog, ns: String,
      table: String, corpus: DataFrame, k: Int, nProbe: Int,
      centroids: Array[Array[Double]], nBits: Int = 256, dim: Int = 64,
      rerank: Int = 100, seed: Long = 42L, idCol: String = "vec_id",
      sampleFraction: Double = 0.05, sampleSeed: Long = 7L,
      threshold: Double = 0.8): RecallAudit = {
    import org.apache.spark.sql.functions.col
    // one materialization: ground truth and the served path must see
    // the IDENTICAL query sample
    val sample = corpus
      .sample(withReplacement = false, sampleFraction, sampleSeed)
      .localCheckpoint()
    val exact = graft.operators.Similarity.knnExact(sample, corpus, k, idCol)
    val served = searchHammingPruned(catalog, ns, table, sample, k,
      nProbe, centroids, nBits, dim, rerank, seed, idCol = idCol)
    val denom = exact.count()
    val hits =
      if (denom == 0L) 0L
      else exact.select(col("query_id"), col("neighbor_id"))
        .join(served.select(col("query_id"), col("neighbor_id")),
          Seq("query_id", "neighbor_id"), "left_semi")
        .count()
    val recall = if (denom == 0L) 1.0 else hits.toDouble / denom
    RecallAudit(recall, denom, alarm = recall < threshold)
  }

  /** Per-batch commit, extracted for direct replay testing
    * (VectorIndexSpec re-delivers a batchId and asserts one snapshot).
    */
  private[graft] def commitBatch(catalog: SnapshotCatalog, ns: String,
      table: String, checkpointDir: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val key = Sinks.lastBatchKey(checkpointDir)
    if (!Sinks.alreadyCommitted(catalog, ns, table, key, batchId)) {
      if (!catalog.tableExists(ns, table))
        catalog.createTable(ns, table, batch.schema,
          properties = Map(PartitionSpec.PropertyKey -> "identity(cell)"))
      catalog.append(ns, table, batch, Map(key -> batchId.toString)): Unit
    }
  }
}
