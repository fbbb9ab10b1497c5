package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query seconds.
  *
  * Each query is executed three times and the fastest run reported — the first
  * execution of a query pays JIT/codegen warm-up that a long-lived
  * cluster never sees per-query, and single-shot timings on this shared
  * box showed up to 10× run-to-run variance from external load bursts.
  */
object Bench {

  /** Quiet-box seconds for the fixed calibration aggregate (400M-row
    * in-memory `sum(id % 97)` at local[32]) — measured on this box at
    * load avg < 0.5 (round 15). The artifact stamps `load_suspect`
    * when even the best of the six per-pass calibrations (start AND
    * end of each pass, round 16) exceeds 1.3x this floor: per-query
    * times in such a run are inflated by external load, not code (the
    * BENCH_r14 failure mode — committed 174.5 s vs the judge's
    * idle-box 140.1 s re-run). `load_degraded` marks the softer band
    * (best sample 1.15–1.3x): moderate sustained contention, compare
    * with care.
    *
    * The constant is THIS box's floor; on a different machine set
    * `SPARK_GRAFT_CALIB_FLOOR` (seconds) or the suspect verdict is
    * meaningless — the flag compares load, not hardware.
    *
    * Round-17 re-baseline (VERDICT r16 item 7): measured on a provably
    * idle window (loadavg < 1.4 at start, external-quiet confirmed by
    * the runs themselves) across two FULL 162-query runs and six
    * filtered runs — best-of-run calibration 0.107–0.155 s under the
    * discard-first sampling. Floor 0.15 puts `load_degraded` at
    * > 0.173 s and `load_suspect` at > 0.195 s: the r16 flapping run
    * (best 0.131) would still read clean, a genuinely loaded run
    * (r16 baseline's 0.25+ bests) now stamps itself.
    */
  val CalibrationFloorSec: Double =
    sys.env.get("SPARK_GRAFT_CALIB_FLOOR")
      .flatMap(v => scala.util.Try(v.toDouble).toOption)
      .getOrElse(0.15)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // Spark-default AQE coalescing (GraftSession rationale: the
      // round-17 quiet-box A/B, VERDICT r16 item 1, measured r16's
      // size-based `false` as a net loss at bench SF — it serializes
      // CPU-dense small-byte stages). SPARK_GRAFT_PARALLELISM_FIRST
      // exists ONLY to reproduce that A/B on one binary; the driver
      // never sets it, so driver runs measure the engine as shipped.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_PARALLELISM_FIRST", "true"))
      // nanos-generation parquet readable (set at build, never per-call)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // janino class cache sized for multi-statement queries
      // (GraftSession rationale; default 100 wraps within one DML
      // lifecycle so min-of-3 re-runs recompiled everything)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      // binary-stat truncation pinned off (GraftSession rationale:
      // footer-stats exactness contract enforced, not incidental)
      .config("spark.hadoop.parquet.statistics.truncate.length",
        String.valueOf(Int.MaxValue))
      // int64-micros timestamps (GraftSession rationale: footer stats
      // + Iceberg's required physical type; INT96 has no usable stats)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val metrics = BenchMetrics.install(spark.sparkContext)

    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, BenchMetrics.Snapshot) = {
      metrics.reset()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case _: Throwable => return (-1.0, metrics.snapshotAfter())
      }
      val t = (System.nanoTime() - t0) / 1e9
      (t, metrics.snapshotAfter())
    }

    // ---- load calibration (round 15, VERDICT r14 items 1/8): the
    // committed BENCH_r14 artifact was inflated ~1.28x uniformly by
    // external box load that outlasted all three round-robin passes —
    // a phantom regression min-of-3 cannot defeat. Each pass now
    // records /proc/loadavg plus a FIXED pure-CPU calibration query
    // (constant in-memory aggregate, no IO, whole-stage codegen), and
    // the artifact self-flags when even the BEST calibration exceeds
    // 1.3x the committed quiet-box floor — so a load-polluted artifact
    // announces itself instead of reading as a code regression.
    def loadavg(): String =
      try new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("/proc/loadavg")),
          java.nio.charset.StandardCharsets.UTF_8)
        .trim.split("\\s+").take(3).mkString("[", ",", "]")
      catch { case scala.util.control.NonFatal(_) => "[]" }
    def calibrateOnce(): Double = {
      import org.apache.spark.sql.functions.{col, sum}
      val t0 = System.nanoTime()
      spark.range(0L, 400000000L, 1L, 32)
        .select(sum(col("id") % 97L)).collect(): Unit
      (System.nanoTime() - t0) / 1e9
    }
    // each SAMPLE is a discard-first double run: the post-pass cache
    // hygiene evicts this query's codegen, so a single run right after
    // a pass pays a ~0.15 s recompile that reads as phantom load
    // (observed round 16: back-to-back samples 0.321 → 0.160 with
    // nothing between them). The warm second run isolates the box.
    def calibrate(): Double = { calibrateOnce(): Unit; calibrateOnce() }
    calibrate(): Unit // JIT/codegen warm-up, discarded

    // Optional comma-separated name filter for local iteration, e.g.
    // SPARK_GRAFT_BENCH_ONLY=t09_tfidf,e01_knn_exact — the driver never
    // sets it, so driver runs always time the full suite.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).toSet)
    val specs = only.fold(SparkEntry.specs)(f => SparkEntry.specs.filter(s => f(s.name)))

    // Three passes over the whole suite round-robin (not 3 consecutive
    // runs per query): this box's external load bursts last seconds to
    // a minute, so consecutive runs of one query can all land inside a
    // burst — interleaving means a burst inflates at most one of a
    // query's three samples and the min stays clean.
    val passLoad = scala.collection.mutable.ArrayBuffer.empty[String]
    val passCalib = scala.collection.mutable.ArrayBuffer.empty[Double]
    val passes = (1 to 3).map { _ =>
      passLoad += loadavg()
      passCalib += calibrate()
      val out = specs.map { spec =>
        val t = once(spec.run)
        // drop session caches (Dedup-style), query-layer persists AND
        // checkpoint blocks — no run inherits block-manager state.
        // blocking = true so this query's block-removal events are
        // delivered BEFORE the next query's metrics.reset(), keeping
        // block_removals attributed to the run that owned the blocks
        // (round-9 ADVICE)
        graft.core.CacheHygiene.releaseAll(spark, blocking = true)
        spec.name -> t
      }
      // END-of-pass calibration too (round 16): a pass runs for
      // minutes, so start-only samples let a mid-pass load burst
      // inflate every query of the pass while all three calibrations
      // read clean — doubling to six samples closes the larger half
      // of that blind window
      passLoad += loadavg()
      passCalib += calibrate()
      out
    }
    val results = specs.map { spec =>
      val runs = passes.map(_.find(_._1 == spec.name).get._2)
      val times = runs.map(_._1)
      val best =
        if (times.exists(_ < 0)) (-1.0, runs.head._2)
        else runs.minBy(_._1)
      spec.name -> best
    }
    // Honest-cost probes (round 14, VERDICT r13 item 8): the MoR read
    // tax and the maintenance dirty-bytes cost ride the round-over-
    // round bench signal, not just the green queries — a regression in
    // either shows up here even though the 152-query surface keeps
    // only tiny delete-bearing windows. Runs AFTER the query loop so
    // it inherits nothing and pollutes nothing.
    def fmt(v: Double, digits: Int = 3): String = String.format(
      java.util.Locale.ROOT, s"%.${digits}f", Double.box(v))
    // NonFatal only (round-14 ADVICE): a fatal error (OOM, interrupt)
    // must propagate — collapsing it to "{}" would lose the interrupt
    // flag and mask a dying JVM; the temp warehouse is removed either
    // way so repeated local runs don't accrete /tmp litter.
    val probeWh = java.nio.file.Files.createTempDirectory("graft-bench-probe")
    val probes: String = try {
      import org.apache.spark.sql.functions.{col, count, lit, round => fround, sum}
      val wh = probeWh
      val cat = new graft.catalog.SnapshotCatalog(spark, wh.toString)
      val orders = spark.read.parquet(s"$sfDir/orders.parquet")
        .select(col("o_orderkey"),
          fround(col("o_totalprice") * 100, 0).cast("long").as("price_c"))
      cat.createTable("db", "o", orders.schema)
      cat.append("db", "o", orders.repartitionByRange(15, col("o_orderkey")))
      def scanSec(): Double = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        cat.read("db", "o").agg(sum("price_c"), count(lit(1))).collect()
        (System.nanoTime() - t0) / 1e9
      }.min
      val cleanSec = scanSec()
      val snap = cat.describe("db", "o").currentSnapshot.get
      val pos = cat.readFilesWithRowId(snap, orders.schema, snap.files)
        .filter(col("o_orderkey") >= 1000).limit(1)
        .select(graft.catalog.SnapshotCatalog.RowIdFileCol,
          graft.catalog.SnapshotCatalog.RowIdPosCol)
      cat.addDeleteFile("db", "o", pos, None)
      val needleSec = scanSec() // full scan with ONE live delete
      // maintenance: fixed small-file + delete debt, dirty-bytes cost
      for (b <- 0 until 4)
        cat.append("db", "o", spark.range(b * 5L, b * 5L + 5L)
          .select(col("id").as("o_orderkey"), lit(1L).as("price_c"))
          .coalesce(1))
      val pre = cat.describe("db", "o").currentSnapshot.get
      def sz(f: String): Long = scala.util.Try(
        java.nio.file.Files.size(java.nio.file.Paths.get(f))).getOrElse(0L)
      val tableBytes = math.max(1L, pre.files.map(sz).sum)
      val t0 = System.nanoTime()
      val rep = cat.compactFileGroups("db", "o", minFileBytes = 64L << 10)
      val maintSec = (System.nanoTime() - t0) / 1e9
      s"""{"mor_clean_sec":${fmt(cleanSec)},""" +
        s""""mor_needle_sec":${fmt(needleSec)},""" +
        s""""maint_dirty_frac":${fmt(
          rep.bytesRewritten.toDouble / tableBytes, 4)},""" +
        s""""maint_sec":${fmt(maintSec)}}"""
    } catch { case scala.util.control.NonFatal(_) => "{}" }
    finally {
      def rm(p: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(p)) {
          val s = java.nio.file.Files.list(p)
          try { s.iterator().forEachRemaining(rm(_)) } finally s.close()
        }
        java.nio.file.Files.deleteIfExists(p): Unit
      }
      try rm(probeWh)
      catch { case scala.util.control.NonFatal(_) => () }
    }

    // calibration verdict: the floor below is the quiet-box cost of
    // calibrate() on this 32-CPU box (measured round 15, load avg
    // <0.5); best-of-3 above 1.3x it means sustained external load
    // polluted every pass and per-query numbers are NOT comparable
    // round-over-round.
    val calibFloorSec = Bench.CalibrationFloorSec
    val minCalib = if (passCalib.isEmpty) -1.0 else passCalib.min
    val loadSuspect = minCalib > calibFloorSec * 1.3
    // DEGRADED (round 16): the band a moderate sustained load lands
    // in — every sample inflated but under the suspect line (this
    // round's host contention ran +25% on queries with best-of-pass
    // calibration at 1.24x, evading the 1.3x stamp). Quiet-box
    // best-of-samples sits at or below ~1.13x floor, so above 1.15x
    // the numbers are comparable only with care
    val loadDegraded = !loadSuspect && minCalib > calibFloorSec * 1.15
    // flapping = the samples DISAGREE (bursty external load): per-query
    // minimums may still be clean, but the TOTAL mixes loaded passes —
    // compare per-query, not by total, when this is set
    val loadFlapping = passCalib.nonEmpty &&
      passCalib.max > math.max(minCalib, 1e-9) * 1.5
    // best/worst stated explicitly (VERDICT r16 item 7): the judge
    // gates on these without re-deriving them from the sample array
    val loadJson =
      s"""{"loadavg":${passLoad.mkString("[", ",", "]")},""" +
        s""""calibration_sec":${passCalib.map(fmt(_)).mkString("[", ",", "]")},""" +
        s""""calibration_best_sec":${fmt(minCalib)},""" +
        s""""calibration_worst_sec":${fmt(
          if (passCalib.isEmpty) -1.0 else passCalib.max)},""" +
        s""""calibration_floor_sec":${fmt(calibFloorSec)},""" +
        s""""load_suspect":$loadSuspect,""" +
        s""""load_degraded":$loadDegraded,""" +
        s""""load_flapping":$loadFlapping}"""

    val qs = results.map { case (k, (t, _)) => "\"" + k + "\":" + t }
      .mkString("{", ",", "}")
    // engine metrics of each query's fastest run (VERDICT r8 item 4):
    // shuffle bytes, spill, block removals — the counters a 100 TB
    // deployment alarms on, measured instead of inferred
    val ms = results.map { case (k, (_, m)) => "\"" + k + "\":" + m.json }
      .mkString("{", ",", "}")
    val total = results.map(_._2._1).filter(_ >= 0).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","probes":$probes,"load":$loadJson,"metrics":$ms}"""
    println(line)
    // The COMPLETE line (113 queries + per-query engine metrics, ~16 KB)
    // is the file artifact; SPARK_GRAFT_BENCH_OUT overrides the name
    // (BENCH_SF1.json for the standing sf1 run; the driver never sets
    // it, so driver runs keep writing BENCH_LOCAL).
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Throwable => () }
    spark.stop()
    // FINAL stdout line, after Spark's shutdown chatter, sized to FIT:
    // the driver records only the last 2000 characters of the log
    // (measured across BENCH_r01..r09 — every full-width line was
    // truncated mid-map and "parsed" came back null), so the closer is
    // a compact summary: total + the slowest queries at ms precision,
    // with the full map's filename for the rest.
    // Locale.ROOT: a comma-decimal default locale would emit "0,123"
    // and break the JSON
    def ms3(t: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(t))
    // 12 slowest, not 30: the closer must fit WHOLE inside the
    // driver's 2000-char tail window together with sbt's trailing
    // "[success] Total time ..." line — the r10 closer (30 queries,
    // ~1.9 KB) was cut mid-line and "parsed" came back null again.
    // 12 queries ≈ 600 B; worst case leaves >1 KB of slack.
    val slowest = results.filter(_._2._1 >= 0).sortBy(-_._2._1).take(12)
      .map { case (k, (t, _)) => "\"" + k + "\":" + ms3(t) }
      .mkString("{", ",", "}")
    val closer = s"""{"metric":"total","value":${ms3(total)},"unit":"sec","sf":"$sfDir","n_queries":${results.length},"queries":$slowest,"probes":$probes,"load":$loadJson,"full":"$out"}"""
    // Belt and braces for the driver's tail-parse (BENCH_r11 item 2):
    // (a) build.sbt sets `run / outputStrategy := StdoutOutput`, so this
    //     println reaches the log UNPREFIXED (sbt's "[info] " was what
    //     kept breaking the parse);
    // (b) the same line also goes to stderr (sbt never prefixes it);
    // (c) and to BENCH_SUMMARY.json as a file artifact.
    println(closer)
    System.err.println(closer)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_SUMMARY.json"),
      closer.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Throwable => () }
  }
}
