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
  *  - the index table is hidden-partitioned `identity(cell)`, so
  *    [[Pq.searchIndex]] probes prune to nProbe cells' files via the
  *    manifest, and a query batch never scans the firehose's history;
  *  - centroids/codebooks are FIXED inputs (trained offline on a
  *    sample, as [[Pq.trainCodebooks]] documents) — retraining is a
  *    new table + backfill, never an in-place mutation, so readers
  *    keep snapshot isolation.
  */
object VectorIndex {

  /** Start-ready writer: encode the vector stream and append to
    * `ns.table` (auto-created with `identity(cell)` hidden
    * partitioning). `vecs` needs (`idCol`, embedding) columns.
    */
  def indexSink(vecs: DataFrame, coarse: Array[Array[Double]],
      books: Pq.Codebooks, catalog: SnapshotCatalog, ns: String,
      table: String, checkpointDir: String, idCol: String = "vec_id",
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): DataStreamWriter[Row] =
    Pq.indexRows(vecs, coarse, books, idCol).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!catalog.tableExists(ns, table))
          catalog.createTable(ns, table, batch.schema,
            properties = Map(PartitionSpec.PropertyKey -> "identity(cell)"))
        catalog.append(ns, table, batch): Unit
      }
}
