package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.catalog.SnapshotCatalog

/** The reference's two sink connectors, re-expressed as Structured
  * Streaming sinks (SURVEY §2.1 S6/S7, §3.3).
  *
  * Offsets/exactly-once: the stream checkpoint directory replaces the
  * Connect clusters' internal offset topics (docker-compose.yml:126-128)
  * — on restart the query resumes from the last committed batch.
  */
object Sinks {

  /** Property key under which a sink records the last committed
    * micro-batch id for its checkpoint lineage (keyed by a checkpoint-
    * dir hash, so several streams can feed one table without
    * clobbering each other's markers).
    */
  private[graft] def lastBatchKey(checkpointDir: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(checkpointDir.getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    s"graft.stream.$h.last-batch-id"
  }

  /** foreachBatch is AT-LEAST-once: a micro-batch retried after a
    * mid-commit failure re-runs with the same batchId. True iff that
    * id is already recorded in the table — the recording rides the
    * same atomic commit as the rows (`append(..., extraProperties)`),
    * so "marker present" exactly means "rows landed".
    */
  private[graft] def alreadyCommitted(catalog: SnapshotCatalog,
      ns: String, table: String, key: String, batchId: Long): Boolean =
    catalog.tableExists(ns, table) &&
      catalog.describe(ns, table).properties.get(key).exists(_.toLong >= batchId)

  /** S6 — Iceberg-like append sink: every trigger (default 5 s, matching
    * `iceberg.control.commit-interval-ms=5000`,
    * connector-config.json:27) appends the micro-batch to the snapshot
    * catalog with auto-create + BACKWARD-gated schema evolution
    * (connector-config.json:5,19-23). Each micro-batch = one atomic
    * snapshot commit, mirroring the sink's commit cadence; replayed
    * batches are skipped via the [[lastBatchKey]] marker, making the
    * sink exactly-once end-to-end.
    */
  def icebergLike(
      events: DataFrame,
      catalog: SnapshotCatalog,
      ns: String,
      table: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch(appendBatch(catalog, ns, table, checkpointDir) _)

  /** The icebergLike per-batch commit, extracted so replay idempotence
    * is directly testable (StreamingSpec calls it twice with one id).
    */
  private[graft] def appendBatch(catalog: SnapshotCatalog, ns: String,
      table: String, checkpointDir: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val key = lastBatchKey(checkpointDir)
    if (!alreadyCommitted(catalog, ns, table, key, batchId)) {
      if (!catalog.tableExists(ns, table))            // auto-create-enabled
        catalog.createTable(ns, table, batch.schema)
      catalog.append(ns, table, batch,                // evolve inside
        Map(key -> batchId.toString)): Unit
    }
  }

  /** Streaming write-audit-publish sink: every micro-batch is staged
    * on a catalog BRANCH, the audit predicate inspects the staged view
    * (current table + this batch), and only a passing audit
    * fast-forwards the readers' pointer — a failing batch is discarded
    * by resetting the branch, and no reader ever saw it. This is the
    * data-quality gate an ingest pipeline puts in front of a 100 TB
    * table: the audit costs one metadata read + whatever the predicate
    * scans, publish is one pointer write, and a bad batch costs
    * nothing to undo — its snapshot is simply abandoned history whose
    * files [[SnapshotCatalog.expireSnapshots]] reclaims.
    *
    * Effectively-once: same checkpoint discipline as [[icebergLike]];
    * a replayed batch re-stages and re-audits.
    */
  def wapSink(
      events: DataFrame,
      catalog: SnapshotCatalog,
      ns: String,
      table: String,
      branch: String,
      audit: DataFrame => Boolean,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds"),
      auditBatchOnly: Boolean = false): DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val key = lastBatchKey(checkpointDir)
        if (!alreadyCommitted(catalog, ns, table, key, batchId)) {
          if (!catalog.tableExists(ns, table))
            catalog.createTable(ns, table, batch.schema)
          if (catalog.describe(ns, table).currentSnapshotId.isEmpty) {
            // bootstrap: no snapshot to branch from yet — the staged
            // view IS the batch, so audit it directly
            if (audit(batch))
              catalog.append(ns, table, batch,
                Map(key -> batchId.toString)): Unit
          } else {
            // (re)point the staging branch at the published state,
            // stage, audit, publish or discard. The batch marker rides
            // the PUBLISH commit (the first one readers see): a crash
            // after staging but before publish replays cleanly — the
            // re-run resets the branch and the orphaned staging
            // snapshot is abandoned history.
            //
            // Audit scope: aggregate invariants (row counts, drift)
            // need the whole staged view; a PER-ROW/PER-DOC gate
            // (`auditBatchOnly`) is decided by the new rows alone —
            // published rows already passed it — so at 100 TB the
            // audit reads one micro-batch, not the accumulated table.
            if (catalog.describe(ns, table).refs.contains(branch))
              catalog.dropRef(ns, table, branch)
            catalog.createBranch(ns, table, branch)
            catalog.appendToBranch(ns, table, branch, batch)
            val auditFrame =
              if (auditBatchOnly) batch else catalog.readRef(ns, table, branch)
            if (audit(auditFrame))
              catalog.publish(ns, table, branch,
                Map(key -> batchId.toString)): Unit
          }
        }
      }

  /** The per-item contamination report (t56,
    * [[graft.operators.Dedup.contaminationReport]]) as a WAP audit
    * gate — the composition the reference's commit-gating implies
    * (connector-config.json:27, commit-interval batching feeding an
    * audited table): a staged micro-batch containing ANY document that
    * shares ≥ `minShared` word-`n`-gram shingles with ANY benchmark
    * item never publishes; the eval-set leak is stopped at the
    * pointer, before a single reader sees it.
    *
    * Pass with `auditBatchOnly = true`: contamination is per-document,
    * so the new rows alone decide it and the audit cost per batch is
    * O(batch), not O(table). The benchmark side broadcasts (the
    * [[graft.operators.Dedup.contaminationReport]] scale posture);
    * `isEmpty` is a LIMIT-1 probe, not a full count.
    */
  def contaminationGate(benchmark: DataFrame, n: Int = 3,
      minShared: Long = 2L): DataFrame => Boolean =
    staged => graft.operators.Dedup
      .contaminationReport(staged, benchmark, n, minShared).isEmpty

  /** CDC-style streaming MERGE sink: every micro-batch is UPSERTED
    * into the snapshot catalog by `keyCol` (`MERGE INTO … WHEN MATCHED
    * UPDATE WHEN NOT MATCHED INSERT`), the changelog-consumption shape
    * that append sinks can't express — late updates to existing keys
    * rewrite in place instead of duplicating.
    *
    * Within one micro-batch the last row per key wins, ordered by
    * `seqCol` (a monotonically increasing changelog offset/timestamp) —
    * the standard CDC tie-break; without it, cross-partition duplicates
    * would make the commit nondeterministic. Each batch is one atomic
    * copy-on-write commit that rewrites only key-range-intersecting
    * files (SnapshotCatalog.upsert), so steady-state write
    * amplification tracks the batch's key spread, not table size; the
    * checkpoint gives effectively-once application on restart (a
    * replayed batch re-upserts the same keys — idempotent).
    */
  def upsertSink(
      events: DataFrame,
      catalog: SnapshotCatalog,
      ns: String,
      table: String,
      keyCol: String,
      seqCol: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds"),
      outputMode: String = "update"): DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      // "update" admits stateful aggregations (each trigger emits the
      // CHANGED per-key rows, which the upsert applies in place — a
      // streaming MATERIALIZED VIEW) and equals append for stateless
      // changelog streams
      .outputMode(outputMode)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import org.apache.spark.sql.expressions.Window
        val latest = batch
          .withColumn("_rk", row_number().over(
            Window.partitionBy(keyCol).orderBy(col(seqCol).desc)))
          .filter(col("_rk") === 1).drop("_rk")
        if (!catalog.tableExists(ns, table))
          catalog.createTable(ns, table, latest.schema)
        catalog.upsert(ns, table, latest, keyCol): Unit
      }

  /** CDC changelog sink, the MERGE-ON-READ flavor (the Flink/Kafka →
    * Iceberg v2 pattern): each micro-batch carries an op column
    * ("I"/"U" = new row version, "D" = delete) and commits ONE atomic
    * snapshot via [[SnapshotCatalog.cdcUpsert]] — an equality delete
    * file over every touched key plus the new row versions as appended
    * data files. ZERO existing data is read or rewritten, so a batch
    * costs O(batch) IO regardless of table size — the shape that beats
    * [[upsertSink]]'s copy-on-write rewrite when updates are frequent
    * and scattered (compact/maintain folds the accumulated delete side
    * on schedule). Last-write-per-key within a batch wins by `seqCol`;
    * replay safety rides the committed-batch marker in the SAME commit
    * (a re-delivered batch id is skipped whole).
    */
  def cdcMorSink(
      events: DataFrame,
      catalog: SnapshotCatalog,
      ns: String,
      table: String,
      keyCols: Seq[String],
      seqCol: String,
      opCol: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch(cdcMorBatch(catalog, ns, table, keyCols, seqCol,
        opCol, checkpointDir) _)

  /** Per-batch CDC commit, extracted for direct replay testing. */
  private[graft] def cdcMorBatch(catalog: SnapshotCatalog, ns: String,
      table: String, keyCols: Seq[String], seqCol: String, opCol: String,
      checkpointDir: String)(batch: DataFrame, batchId: Long): Unit = {
    import org.apache.spark.sql.expressions.Window
    val key = lastBatchKey(checkpointDir)
    if (!alreadyCommitted(catalog, ns, table, key, batchId)) {
      val latest = batch
        .withColumn("_rk", row_number().over(
          Window.partitionBy(keyCols.map(col): _*).orderBy(col(seqCol).desc)))
        .filter(col("_rk") === 1).drop("_rk")
      val rows = latest.filter(col(opCol) =!= "D").drop(opCol)
      val dels = latest.filter(col(opCol) === "D")
        .select(keyCols.map(col): _*)
      if (!catalog.tableExists(ns, table))
        catalog.createTable(ns, table, rows.schema)
      val marker = Map(key -> batchId.toString)
      if (catalog.describe(ns, table).currentSnapshot.isEmpty)
        // first batch: nothing to delete against, plain marked append
        catalog.append(ns, table, rows, marker): Unit
      else
        catalog.cdcUpsert(ns, table, rows, dels, keyCols, marker): Unit
    }
  }

  /** Downstream CHANGELOG FOLLOWER — the reference's Kafka-Connect
    * table-to-table topology (docker-compose.yml:108-225: a connector
    * moving one store's changes into another) rebuilt on snapshots: a
    * downstream table subscribes to an upstream catalog table by
    * consuming its net-change changelog windows
    * ([[SnapshotCatalog.readChangelog]]) and applying each window as
    * ONE atomic CDC commit ([[SnapshotCatalog.cdcUpsert]]: equality
    * delete over the window's delete keys + the window's inserts as
    * new data files). The consumed upstream position rides IN the same
    * downstream commit's properties, so a crashed/replayed window is
    * idempotent — the at-least-once discipline every sink here uses.
    * Each poll costs O(window delta) IO, never O(upstream table).
    *
    * `poll()` returns whether a window was applied; [[batch]] adapts
    * it to foreachBatch so any ticking stream drives the subscription.
    * An upstream compaction inside an unconsumed window destroys row
    * identity, and an upstream [[SnapshotCatalog.expireSnapshots]] can
    * take the follower's `from` snapshot with it — in BOTH cases
    * readChangelog refuses and the follower RESYNCS: one atomic
    * OVERWRITE of the downstream with the upstream's current state
    * (position recorded in the same commit). O(upstream) once, loudly
    * logged — the "full refresh" every CDC mirror needs as its escape
    * hatch — and the next polls are incremental again.
    *
    * The common case never needs it: each consumed position is ALSO
    * pinned with an upstream branch ref (`graft.follow.<downNs>.
    * <downTable>`, advanced via [[SnapshotCatalog.setRef]] right after
    * the downstream commit), and expireSnapshots always retains ref'd
    * snapshots — so a follower lagging arbitrarily far behind a
    * maintained upstream still finds its `from` snapshot alive. The
    * pin trails the downstream commit by one non-atomic step; a crash
    * in between leaves the pin one window old, which at worst means
    * one resync — never a wrong result.
    */
  /** @param transform optional ROW-WISE derivation applied to every
    *   row flowing downstream (bootstrap copy, window inserts, resync
    *   overwrite) — the maintained-derived-table hook: the downstream
    *   holds `transform(upstream)` kept current by CDC windows (e.g. a
    *   streamed ANN index: vectors in, encoded index rows out,
    *   [[graft.streaming.VectorIndex.hammingIndexFollower]]). MUST be
    *   deterministic, per-row (no aggregation across rows), and pass
    *   `keyCols` through UNCHANGED — the window's delete keys are
    *   taken from the upstream changelog and applied to the
    *   transformed table by those same columns.
    * @param tableProperties properties for the auto-created downstream
    *   table (e.g. a hidden partition spec for cell-pruned serving).
    */
  def changelogFollower(catalog: SnapshotCatalog, upNs: String,
      upTable: String, downNs: String, downTable: String,
      keyCols: Seq[String],
      transform: DataFrame => DataFrame = identity,
      tableProperties: Map[String, String] = Map.empty): ChangelogFollower =
    new ChangelogFollower(catalog, upNs, upTable, downNs, downTable,
      keyCols, transform, tableProperties)

  /** The subscription as a FIRST-CLASS Structured Streaming query: a
    * rate-ticked stream drives [[ChangelogFollower.poll]] every
    * trigger — `Sinks.changelogStream(...).start()` is the whole
    * table→table topology. Restart semantics are stronger than the
    * checkpoint's: the consumed position is recorded IN the downstream
    * table's own commits (and ref-pinned upstream), so a restarted
    * query — even with a fresh checkpoint — resumes exactly after the
    * last applied window; a replayed tick that finds nothing new
    * commits nothing (no window is ever skipped or duplicated). The
    * checkpoint only makes the TICKING resumable.
    */
  def changelogStream(
      spark: org.apache.spark.sql.SparkSession,
      catalog: SnapshotCatalog,
      upNs: String, upTable: String,
      downNs: String, downTable: String,
      keyCols: Seq[String],
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds"),
      transform: DataFrame => DataFrame = identity,
      tableProperties: Map[String, String] = Map.empty): DataStreamWriter[org.apache.spark.sql.Row] = {
    val f = changelogFollower(catalog, upNs, upTable, downNs, downTable,
      keyCols, transform, tableProperties)
    spark.readStream.format("rate").option("rowsPerSecond", 1).load()
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch(f.batch _)
  }

  final class ChangelogFollower private[Sinks] (catalog: SnapshotCatalog,
      upNs: String, upTable: String, downNs: String, downTable: String,
      keyCols: Seq[String],
      transform: DataFrame => DataFrame = identity,
      tableProperties: Map[String, String] = Map.empty) {
    private val posKey = s"graft.follow.$upNs.$upTable.snapshot"
    /** The upstream branch ref pinning the consumed position against
      * snapshot expiry (see the class scaladoc).
      */
    private[graft] val posRef = s"graft.follow.$downNs.$downTable"

    /** Consume everything committed upstream since the last poll.
      * Returns true when a window was applied (false = caught up).
      */
    def poll(): Boolean = {
      val upMeta = catalog.describe(upNs, upTable)
      val upSnap = upMeta.currentSnapshotId.getOrElse(return false)
      if (!catalog.tableExists(downNs, downTable))
        catalog.createTable(downNs, downTable,
          transform(catalog.read(upNs, upTable)).schema,
          tableProperties): Unit
      val downMeta = catalog.describe(downNs, downTable)
      downMeta.properties.get(posKey).map(_.toLong) match {
        case None =>
          // bootstrap: the upstream's current state (transformed), the
          // position recorded atomically with the copy
          catalog.append(downNs, downTable,
            transform(catalog.read(upNs, upTable)),
            Map(posKey -> upSnap.toString))
          pin(upSnap)
          true
        case Some(from) if from == upSnap => false // caught up
        case Some(from) =>
          try {
            // Walk the upstream snapshot chain from→upSnap and SKIP
            // content-preserving "replace" snapshots (compaction /
            // Z-order — Iceberg changelog scans skip them the same
            // way): maximal runs of row-changing commits between
            // replaces apply as one atomic window each, and a replace
            // edge contributes nothing. Before round 15 ANY compaction
            // inside an unconsumed window — including routine
            // maintenance on a caught-up upstream — forced the
            // O(upstream) full-refresh resync; now maintenance and
            // subscription compose. A broken chain (expired
            // intermediate) or a row-CHANGING rewrite (INSERT
            // OVERWRITE, CoW DML) still lands in the resync below.
            val byId = upMeta.snapshots.map(s => s.snapshotId -> s).toMap
            val chainBuf = scala.collection.mutable.ListBuffer
              .empty[graft.catalog.SnapshotCatalog.SnapshotMeta]
            var cur = byId.get(upSnap)
            while (cur.isDefined && cur.get.snapshotId != from) {
              chainBuf.prepend(cur.get)
              cur = cur.get.parentId.flatMap(byId.get)
            }
            // chain broken = intermediate snapshots EXPIRED while the
            // pinned endpoints live on (the lagging-follower shape).
            // File lists are cumulative, so the direct endpoint window
            // still reads fine — consume it whole (the replace-skip
            // walk needs the intact chain and is skipped: an edge is
            // only provably content-preserving against its true
            // parent); only a rewrite inside the window
            // (IllegalStateException below) forces the resync.
            val intact = cur.isDefined
            def applyWindow(a: Long, b: Long): Unit = {
              // each applied window is a single ordinal by construction
              // (the chain walk already split at replaces), so the
              // ordinal column is constant — dropped before the commit
              val ct = catalog.readChangelog(upNs, upTable, a, Some(b))
              val ins = ct.filter(col("_change_type") === "insert")
                .drop("_change_type", "_change_ordinal")
              val dels = ct.filter(col("_change_type") === "delete")
                .select(keyCols.map(col): _*)
              // an update is its delete+insert pair: the eq-delete
              // hides the old version, the insert (same commit, higher
              // sequence) survives it — exactly cdcUpsert's contract.
              // The delete keys come from the UPSTREAM changelog rows
              // and apply to the transformed table (transform's
              // contract: keyCols pass through unchanged); cdcUpsert
              // touches ZERO existing downstream files, so every
              // cell/file a window doesn't name stays byte-identical.
              catalog.cdcUpsert(downNs, downTable, transform(ins), dels,
                keyCols, Map(posKey -> b.toString)): Unit
            }
            // COMPOSED catch-up for a lagging follower (round 16): a
            // backlog spanning multiple replace-separated runs used to
            // apply one cdcUpsert PER RUN — k interleaved compactions
            // meant k commits of trigger overhead. Instead, ONE
            // readChangelog over the whole span (its `_change_ordinal`
            // decomposes around the replaces) resolved to per-key
            // FINAL state: the key's last-touching run decides, the
            // insert (new version) wins over its paired delete inside
            // that run. One cdcUpsert applies the lot — deletes are
            // every touched key, inserts the surviving final versions
            // — so catch-up is O(1) commits at any lag. Also the only
            // CORRECT shape for the broken-chain (expired
            // intermediates) endpoint window: a naive type-filtered
            // apply would let a run-0 insert survive its run-1 delete
            // (the eq-delete seq sits below the re-inserted row).
            def applyComposed(a: Long, b: Long): Unit = {
              val ord = "_change_ordinal"
              val ct = "_change_type"
              val ch = catalog.readChangelog(upNs, upTable, a, Some(b))
              // compose the runs EXACTLY as sequential application
              // would: a pre-existing downstream row dies iff its key
              // has a DELETE row anywhere in the span (insert-only
              // appends never delete — keys are CDC matching columns,
              // not a uniqueness constraint); an insert survives iff
              // no LATER run deletes its key (same-ordinal
              // delete+insert is an update pair — the insert wins,
              // cdcUpsert's same-commit seq gate). All surviving
              // inserts are kept — not a row_number()-picked single
              // row per key — so upstreams carrying duplicate-key
              // rows converge to the per-window path's state
              val w = org.apache.spark.sql.expressions.Window
                .partitionBy(keyCols.map(col): _*)
              val delOrd = org.apache.spark.sql.functions.max(
                org.apache.spark.sql.functions
                  .when(col(ct) === "delete", col(ord))).over(w)
              val ins = ch.withColumn("__f_delord", delOrd)
                .filter(col(ct) === "insert" &&
                  (col("__f_delord").isNull ||
                    col(ord) >= col("__f_delord")))
                .drop("__f_delord", ct, ord)
              val dels = ch.filter(col(ct) === "delete")
                .select(keyCols.map(col): _*).distinct()
              catalog.cdcUpsert(downNs, downTable, transform(ins), dels,
                keyCols, Map(posKey -> b.toString)): Unit
            }
            if (!intact) applyComposed(from, upSnap)
            else {
              // collect the replace-separated runs first; a single run
              // takes the direct (no window-function) apply
              val runs = scala.collection.mutable.ListBuffer
                .empty[(Long, Long)]
              var runFrom = from
              var prev = from
              chainBuf.foreach { s =>
                // a STITCHED edge (expiry re-parented it across expired
                // commits) may hide row changes — never skip it
                if (s.operation.contains("replace") &&
                    !s.stitched.contains(true)) {
                  if (runFrom != prev) runs += ((runFrom, prev))
                  runFrom = s.snapshotId // skip the replace edge
                }
                prev = s.snapshotId
              }
              if (runFrom != prev) runs += ((runFrom, prev))
              if (runs.size <= 1) runs.foreach { case (a, b) =>
                applyWindow(a, b)
              }
              else applyComposed(runs.head._1, runs.last._2)
            }
            // trailing replace snapshots applied no window — advance
            // the authoritative bookmark with a metadata-only commit
            if (catalog.describe(downNs, downTable).properties
                  .get(posKey).map(_.toLong).getOrElse(from) != upSnap)
              catalog.updateProperties(downNs, downTable,
                Map(posKey -> upSnap.toString)): Unit
          } catch {
            // IllegalStateException: data files rewritten by a
            // row-CHANGING commit inside a window (INSERT OVERWRITE,
            // CoW DML) — identity-based deltas are gone.
            // NoSuchElementException: the `from` snapshot itself was
            // expired (the pin was dropped, or trailed a crash).
            // Either way: full refresh, once, loudly.
            case e @ (_: IllegalStateException | _: NoSuchElementException) =>
              org.slf4j.LoggerFactory.getLogger(classOf[ChangelogFollower])
                .warn(s"changelog window $from->$upSnap of " +
                  s"$upNs.$upTable is unreadable (${e.getMessage}); " +
                  "resyncing downstream with one atomic overwrite")
              resyncCount += 1
              catalog.overwrite(downNs, downTable,
                transform(catalog.read(upNs, upTable)),
                Map(posKey -> upSnap.toString)): Unit
          }
          pin(upSnap)
          true
      }
    }

    /** Full-refresh resyncs taken so far — observable so tests (and
      * operators) can assert maintenance did NOT force one.
      */
    private[graft] var resyncCount: Int = 0

    /** Advance the retention pin to the consumed position. Best-effort
      * (the position PROPERTY in the downstream commit is the
      * authoritative bookmark): if the upstream races a concurrent
      * expiry/rollback that already dropped `upSnap`, the pin simply
      * stays where it was and the next poll resyncs.
      */
    private def pin(upSnap: Long): Unit =
      try catalog.setRef(upNs, upTable, posRef, upSnap): Unit
      catch {
        // best-effort means BEST-EFFORT: a lost commit race after
        // retries (FileAlreadyExistsException) or a concurrently
        // expired/rolled-back target must not fail the poll whose
        // authoritative bookmark already landed downstream — the pin
        // simply stays where it was and the next poll advances it
        case scala.util.control.NonFatal(e) =>
          org.slf4j.LoggerFactory.getLogger(classOf[ChangelogFollower])
            .warn(s"could not pin follower position $upSnap on " +
              s"$upNs.$upTable: ${e.getMessage}")
      }

    /** foreachBatch adapter: attach the subscription to any ticking
      * stream (`rate` source, upstream commit notifications, …).
      */
    def batch(ignored: DataFrame, batchId: Long): Unit = { poll(); () }
  }

  /** S7 — event-time partitioned parquet sink
    * (s3-connector-config.json:15-25): paths
    * `year=YYYY/month=MM/day=dd/hour=HH` derived from the RECORD's
    * timestamp field (epoch millis, UTC), zero-padded to match the
    * connector's `path.format`; `flush.size=1000` becomes
    * maxRecordsPerFile, `rotate.interval.ms=10000` the 10 s trigger.
    */
  /** WebDataset tar-shard streaming sink — the training-ingest
    * archival shape: each micro-batch packs its samples (the
    * `ingest.WebDataset` contract: (key, files[(name, data)]) rows)
    * into `nShardsPerBatch` USTAR shards under `outputDir/batch=<id>/`.
    * Batch-scoped subdirs make at-least-once foreachBatch idempotent
    * BY CONSTRUCTION: a retried id rewrites its own directory, and the
    * deterministic writer (fixed headers, key-partitioned + key-sorted
    * layout) converges to byte-identical shards. Downstream training
    * jobs treat the batch dirs as an append-only shard set
    * (`readShards(spark, s"$dir/batch=*")` lists them all).
    */
  def webdatasetShards(
      samples: DataFrame,
      outputDir: String,
      checkpointDir: String,
      nShardsPerBatch: Int,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds")): DataStreamWriter[org.apache.spark.sql.Row] =
    samples.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch(writeShardBatch(outputDir, nShardsPerBatch) _)

  private[graft] def writeShardBatch(outputDir: String, nShards: Int)(
      batch: DataFrame, batchId: Long): Unit =
    graft.ingest.WebDataset.writeShards(batch,
      s"$outputDir/batch=$batchId", nShards)

  def partitionedParquet(
      events: DataFrame,
      tsMsCol: String,
      outputDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds")): DataStreamWriter[org.apache.spark.sql.Row] =
    withEventTimePartitions(events, tsMsCol).writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outputDir)
      .option("checkpointLocation", checkpointDir)
      .option("maxRecordsPerFile", 1000)
      .trigger(trigger)
      .partitionBy("year", "month", "day", "hour")

  /** The partition-column derivation, shared with batch writes and
    * tested against the connector's path.format directly.
    */
  def withEventTimePartitions(df: DataFrame, tsMsCol: String): DataFrame = {
    val ets = timestamp_millis(col(tsMsCol).cast("long"))
    df.withColumn("year", date_format(ets, "yyyy"))
      .withColumn("month", date_format(ets, "MM"))
      .withColumn("day", date_format(ets, "dd"))
      .withColumn("hour", date_format(ets, "HH"))
  }
}
