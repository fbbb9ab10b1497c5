package graft.tools

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.catalog.SnapshotCatalog
import graft.streaming.Sinks

/** Measures end-to-end micro-batch commit latency — event GENERATED to
  * event QUERYABLE by a reader — for the two production streaming
  * sinks, at the reference's 5 s commit cadence (BASELINE.md's only
  * hard streaming characteristic, `commit-interval-ms=5000`).
  *
  * Method (reader-observed, uniform across sinks): a rate source
  * stamps each row at generation (`timestamp`); the driver polls the
  * catalog's CURRENT snapshot pointer every 25 ms and records the
  * wall-clock instant each new snapshot becomes visible — exactly what
  * a reader sees, including the WAP sink's stage→audit→publish path
  * (whose staging commits are invisible until the pointer moves).
  * Latency sample = observed-visible(snapshot) − row.timestamp for
  * every row in that snapshot's delta files. The first committed batch
  * is excluded (stream-start warm-up: source initialization + first
  * trigger alignment), stated in the output.
  *
  * Expected shape: uniform arrivals against a T-second trigger give a
  * mean wait of T/2 + commit cost; p95 ≈ T + commit cost. The SCALING
  * acceptance bar is p95 < 2×T.
  *
  *   sbt "runMain graft.tools.StreamLatency [triggerSec] [batches] [rowsPerSec]"
  */
object StreamLatency {
  def main(args: Array[String]): Unit = {
    val triggerSec = args.lift(0).map(_.toInt).getOrElse(5)
    val minBatches = args.lift(1).map(_.toInt).getOrElse(10)
    val rate = args.lift(2).map(_.toInt).getOrElse(200)
    val spark = graft.core.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def events: DataFrame = spark.readStream.format("rate")
      .option("rowsPerSecond", rate).load()
      .select(col("timestamp").as("ts"), col("value"))

    def run(label: String)(
        mk: (DataFrame, SnapshotCatalog, String) => DataStreamWriter[Row]): Unit = {
      val wh = java.nio.file.Files.createTempDirectory("graft_lat_wh").toString
      val ckpt = java.nio.file.Files.createTempDirectory("graft_lat_ck").toString
      val cat = new SnapshotCatalog(spark, wh)
      val q = mk(events, cat, ckpt).start()

      // poll the reader-visible pointer; visibility instant per snapshot
      val seen = mutable.LinkedHashMap[Long, Long]()
      val deadline =
        System.currentTimeMillis() + (minBatches + 5) * triggerSec * 1000L
      while (seen.size < minBatches + 1 && // +1: first batch is warm-up
          System.currentTimeMillis() < deadline) {
        if (cat.tableExists("lat", "events"))
          cat.describe("lat", "events").currentSnapshotId.foreach { sid =>
            if (!seen.contains(sid)) seen(sid) = System.currentTimeMillis()
          }
        Thread.sleep(25)
      }
      q.stop()
      q.awaitTermination()

      // Walk ALL snapshots in commit order, advancing the cumulative
      // file set over every one, but sample only those whose
      // visibility instant was actually observed: a snapshot whose
      // pointer move landed entirely between two polls has no honest
      // observation time, and folding its rows into the NEXT observed
      // snapshot's delta (the previous formulation) would overstate
      // their latency by up to a full trigger interval. Excluded
      // snapshots are counted and reported instead.
      val meta = cat.describe("lat", "events")
      val samples = mutable.ArrayBuffer[Double]()
      var prevFiles = Set.empty[String]
      var observed = 0
      var unobserved = 0
      meta.snapshots.sortBy(_.sequenceNumber).foreach { s =>
        val delta = s.files.filterNot(prevFiles)
        prevFiles ++= s.files
        if (seen.contains(s.snapshotId)) {
          observed += 1
          if (observed > 1 && delta.nonEmpty) { // skip warm-up batch 1
            val obs = seen(s.snapshotId)
            spark.read.parquet(delta: _*)
              .select(unix_millis(col("ts"))).collect()
              .foreach(r => samples += (obs - r.getLong(0)) / 1000.0)
          }
        } else unobserved += 1
      }
      val xs = samples.sorted
      require(xs.nonEmpty, s"$label: no post-warm-up samples (run too short?)")
      def pct(p: Double): Double = xs(((xs.length - 1) * p).round.toInt)
      println(f"[latency] $label trigger=${triggerSec}s " +
        f"batches=${observed - 1} unobserved=$unobserved events=${xs.length} " +
        f"p50=${pct(0.5)}%.2fs p95=${pct(0.95)}%.2fs max=${xs.last}%.2fs " +
        f"bar(2x trigger)=${2.0 * triggerSec}%.1fs " +
        (if (pct(0.95) < 2.0 * triggerSec) "PASS" else "FAIL"))
    }

    run("icebergLike") { (df, cat, ckpt) =>
      Sinks.icebergLike(df, cat, "lat", "events", ckpt,
        Trigger.ProcessingTime(s"$triggerSec seconds"))
    }
    // audit = a real scan of the staged view (row count non-negative —
    // always passes; the point is to pay a representative audit cost)
    run("wapSink") { (df, cat, ckpt) =>
      Sinks.wapSink(df, cat, "lat", "events", "audit",
        b => b.select(count(lit(1))).head.getLong(0) >= 0L, ckpt,
        Trigger.ProcessingTime(s"$triggerSec seconds"))
    }
    runPartitioned()
    spark.stop()
  }

  /** S7 (the reference's S3 sink plane, 10 s rotate interval): the
    * event-time-partitioned parquet file sink. Visibility here is the
    * file sink's OWN atomicity point — a reader lists files through
    * `_spark_metadata`, so an event is queryable the instant its
    * batch's log entry lands. Same reader-observed method: poll the
    * metadata log for new batch entries, stamp the observation, read
    * the entry's files for the rows' generation timestamps.
    */
  private def runPartitioned(): Unit = {
    val triggerSec = 10 // rotate.interval.ms=10000 parity
    val minBatches = 6
    val spark = graft.core.GraftSession.builder("local[8]", 8).getOrCreate()
    val out = java.nio.file.Files.createTempDirectory("graft_lat_part").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_lat_pck").toString
    val events = spark.readStream.format("rate")
      .option("rowsPerSecond", 200).load()
      .select(unix_millis(col("timestamp")).as("ts_ms"), col("value"))
    val q = Sinks.partitionedParquet(events, "ts_ms", out, ckpt,
      Trigger.ProcessingTime(s"$triggerSec seconds")).start()

    val logDir = java.nio.file.Path.of(out, "_spark_metadata")
    val seen = mutable.LinkedHashMap[Long, Long]() // batchId -> observed ms
    val deadline =
      System.currentTimeMillis() + (minBatches + 4) * triggerSec * 1000L
    while (seen.size < minBatches + 1 &&
        System.currentTimeMillis() < deadline) {
      if (java.nio.file.Files.isDirectory(logDir)) {
        val now = System.currentTimeMillis()
        // Files.list holds a directory fd until closed — this polls
        // 40×/s for up to ~100 s, so leaking it to GC can exhaust the
        // ulimit mid-run
        val listing = java.nio.file.Files.list(logDir)
        try listing.forEach { p =>
          val n = p.getFileName.toString
          if (n.forall(_.isDigit) && !seen.contains(n.toLong))
            seen(n.toLong) = now
        } finally listing.close()
      }
      Thread.sleep(25)
    }
    q.stop()
    q.awaitTermination()

    val samples = mutable.ArrayBuffer[Double]()
    val pathRe = """"path":"([^"]+)"""".r
    seen.toSeq.sortBy(_._1).drop(1).foreach { case (batchId, obs) => // drop warm-up
      val entry = java.nio.file.Path.of(out, "_spark_metadata", batchId.toString)
      val files = pathRe.findAllMatchIn(java.nio.file.Files.readString(entry))
        .map(_.group(1).stripPrefix("file:")).toSeq
      if (files.nonEmpty)
        spark.read.parquet(files: _*).select(col("ts_ms")).collect()
          .foreach(r => samples += (obs - r.getLong(0)) / 1000.0)
    }
    val xs = samples.sorted
    require(xs.nonEmpty, "partitionedParquet: no post-warm-up samples")
    def pct(p: Double): Double = xs(((xs.length - 1) * p).round.toInt)
    println(f"[latency] partitionedParquet trigger=${triggerSec}s " +
      f"batches=${seen.size - 1} events=${xs.length} " +
      f"p50=${pct(0.5)}%.2fs p95=${pct(0.95)}%.2fs max=${xs.last}%.2fs " +
      f"bar(2x trigger)=${2.0 * triggerSec}%.1fs " +
      (if (pct(0.95) < 2.0 * triggerSec) "PASS" else "FAIL"))
  }
}
