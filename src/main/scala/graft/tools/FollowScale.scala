package graft.tools

import org.apache.spark.sql.functions._

import graft.catalog.SnapshotCatalog
import graft.streaming.Sinks

/** Measures PER-WINDOW changelog-consumption cost for SCALING.md
  * (round-15 item 1): stages an upstream catalog table, attaches a
  * [[Sinks.changelogFollower]], then lands N fixed-size CDC windows
  * (a few upserted keys + a couple of deletes each) and times every
  * `poll()`.
  *
  * The claim under test: a window costs O(window delta), NOT
  * O(accumulated delete side) and NOT O(table) — so (a) the LAST
  * windows cost the same as the FIRST (the delete side has grown N
  * entries by then; the round-15 per-entry/per-file memos are what
  * make this hold — before them every window re-read the entire
  * accumulated delete side), and (b) the per-window cost is ~flat
  * between a 1x and a 10x upstream (pass sf0.01 vs sf0.1).
  *
  * Run: sbt "runMain graft.tools.FollowScale [sfDir] [windows]"; one
  * JSON line.
  */
object FollowScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val windows = args.lift(1).map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wh = java.nio.file.Files.createTempDirectory("graft_followscale").toString
    val cat = new SnapshotCatalog(spark, wh)

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("price_c"),
        col("o_orderstatus").as("status"))
    val n = orders.count()
    val rowsPerFile = 10000
    val nFiles = math.max(4, (n / rowsPerFile).toInt)
    cat.createTable("db", "up", orders.schema)
    cat.append("db", "up",
      orders.repartitionByRange(nFiles, col("o_orderkey")))

    val f = Sinks.changelogFollower(cat, "db", "up", "db", "down",
      Seq("o_orderkey"))
    val t0 = System.nanoTime()
    f.poll() // bootstrap copy — O(table) once by design, reported apart
    val bootstrapSec = (System.nanoTime() - t0) / 1e9

    def fmt(v: Double): String = String.format(
      java.util.Locale.ROOT, "%.3f", Double.box(v))
    val times = (0 until windows).map { w =>
      // fixed-size window: 5 upserts + 2 deletes over a narrow key
      // range, scattered so consecutive windows touch different files
      val base = 1L + (w.toLong * 9973L) % math.max(1L, n - 100L)
      cat.cdcUpsert("db", "up",
        rows = spark.range(base, base + 5)
          .select(col("id").as("o_orderkey"), lit(1L).as("price_c"),
            lit("U").as("status")),
        deletes = spark.range(base + 50, base + 52)
          .select(col("id").as("o_orderkey")),
        keyCols = Seq("o_orderkey"))
      val t1 = System.nanoTime()
      val applied = f.poll()
      val dt = (System.nanoTime() - t1) / 1e9
      require(applied, s"window $w did not apply")
      dt
    }
    val first5 = times.take(5).sum / 5
    val last5 = times.takeRight(5).sum / 5

    // CATCH-UP mode (round 16): land another `windows` CDC commits
    // (with a compaction mid-backlog, the adversarial shape) WITHOUT
    // polling, then consume the whole backlog in one poll. The claim:
    // the composed catch-up costs O(1) downstream commits and ~one
    // window's wall-clock — not k× the per-window trigger overhead.
    val downBefore = cat.describe("db", "down").snapshots.size
    (0 until windows).foreach { w =>
      val base = 1L + ((w + windows).toLong * 9973L) % math.max(1L, n - 100L)
      cat.cdcUpsert("db", "up",
        rows = spark.range(base, base + 5)
          .select(col("id").as("o_orderkey"), lit(2L).as("price_c"),
            lit("C").as("status")),
        deletes = spark.range(base + 50, base + 52)
          .select(col("id").as("o_orderkey")),
        keyCols = Seq("o_orderkey")): Unit
      if (w == windows / 2)
        cat.compactFileGroups("db", "up"): Unit
    }
    val t2 = System.nanoTime()
    require(f.poll(), "catch-up poll did not apply")
    val catchupSec = (System.nanoTime() - t2) / 1e9
    val catchupCommits = cat.describe("db", "down").snapshots.size - downBefore
    require(!f.poll(), "catch-up must fully consume the backlog")
    require(f.resyncCount == 0, "catch-up must not resync")
    // converged exactly
    val uSum = cat.read("db", "up").agg(sum("price_c")).head().getLong(0)
    val dSum = cat.read("db", "down").agg(sum("price_c")).head().getLong(0)
    require(uSum == dSum, s"catch-up diverged: up=$uSum down=$dSum")

    val line = s"""{"metric":"follow_window_sec","sf":"$sfDir",""" +
      s""""windows":${times.map(fmt).mkString("[", ",", "]")},""" +
      s""""bootstrap_sec":${fmt(bootstrapSec)},""" +
      s""""first5_avg":${fmt(first5)},"last5_avg":${fmt(last5)},""" +
      s""""last_over_first":${fmt(last5 / math.max(first5, 1e-9))},""" +
      s""""catchup_backlog":$windows,"catchup_sec":${fmt(catchupSec)},""" +
      s""""catchup_commits":$catchupCommits,""" +
      s""""catchup_over_window":${fmt(catchupSec / math.max(last5, 1e-9))},""" +
      s""""table_rows":$n,"table_files":$nFiles}"""
    println(line)
    System.err.println(line)
    spark.stop()
  }
}
