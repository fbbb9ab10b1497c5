package graft.tools

import org.apache.spark.sql.functions._

import graft.catalog.SnapshotCatalog

/** Measures MAINTENANCE cost scaling for SCALING.md (round-13 item 1):
  * stages `orders` as a key-clustered catalog table of fixed-size
  * files, lands a FIXED-SIZE stream of CDC debt on top (a handful of
  * small appends + one merge-on-read delete over a narrow key range),
  * then runs one [[SnapshotCatalog.compactFileGroups]] pass and
  * reports what it actually rewrote.
  *
  * The claim under test: per-file-group compaction's cost is
  * proportional to DIRTY bytes (the small shards + the delete-touched
  * files), NOT table bytes — so as the table grows 10× with the same
  * debt, bytesRewritten and wall seconds stay ~flat while tableBytes
  * grows 10×. The old full-table `compact` shape is measured alongside
  * for the contrast.
  *
  * Run: sbt "runMain graft.tools.MaintScale [sfDir]"; one JSON line
  * per phase.
  */
object MaintScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wh = java.nio.file.Files.createTempDirectory("graft_maintscale").toString
    val cat = new SnapshotCatalog(spark, wh)

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("price_c"),
        col("o_orderstatus").as("status"))
    val n = orders.count()
    val rowsPerFile = 10000
    val nFiles = math.max(4, (n / rowsPerFile).toInt)
    cat.createTable("db", "t", orders.schema)
    cat.append("db", "t",
      orders.repartitionByRange(nFiles, col("o_orderkey")))

    // FIXED-SIZE debt, independent of table size: 6 tiny streaming
    // shards + one CDC batch deleting a narrow key range
    for (b <- 0 until 6)
      cat.append("db", "t",
        spark.range(b * 10, b * 10 + 10)
          .select(col("id").as("o_orderkey"),
            lit(1L).as("price_c"), lit("S").as("status"))
          .coalesce(1))
    val preCdc = cat.describe("db", "t").currentSnapshot.get
    cat.cdcUpsert("db", "t",
      rows = spark.range(0, 0).select(col("id").as("o_orderkey"),
        lit(0L).as("price_c"), lit("X").as("status")),
      deletes = spark.range(100, 200).select(col("id").as("o_orderkey")),
      keyCols = Seq("o_orderkey"))
    // changelog candidate pruning under the eq-delete window: the
    // narrow key range must cost O(touched files) at every scale
    val curSnap = cat.describe("db", "t").currentSnapshot.get
    val cands = cat.changelogCandidates(preCdc, curSnap,
      cat.schemaOf("db", "t"))
    println(s"""{"phase":"changelog_candidates","sf":"$sfDir",""" +
      s""""from_files":${preCdc.files.size},"candidates":${cands.size}}""")

    def sz(f: String) =
      scala.util.Try(java.nio.file.Files.size(
        java.nio.file.Paths.get(f))).getOrElse(0L)
    val before = cat.describe("db", "t").currentSnapshot.get
    val tableBytes = before.files.map(sz).sum
    def ms3(t: Double) = String.format(
      java.util.Locale.ROOT, "%.3f", Double.box(t))

    // the scale-honest pass: only dirty files move
    val t0 = System.nanoTime()
    val report = cat.compactFileGroups("db", "t",
      minFileBytes = 64L << 10) // tiny shards qualify; staged files not
    val groupSec = (System.nanoTime() - t0) / 1e9
    println(s"""{"phase":"file_groups","sf":"$sfDir","rows":$n,""" +
      s""""files_total":${before.files.size},"table_bytes":$tableBytes,""" +
      s""""files_rewritten":${report.rewrittenFiles},""" +
      s""""bytes_rewritten":${report.bytesRewritten},""" +
      s""""pos_folded":${report.posDeleteFilesFolded},""" +
      s""""eq_folded":${report.eqDeleteFilesFolded},""" +
      s""""dirty_fraction":${ms3(report.bytesRewritten.toDouble /
        math.max(1L, tableBytes))},"sec":${ms3(groupSec)}}""")

    // the old shape, for contrast: full-table rewrite
    val t1 = System.nanoTime()
    cat.compact("db", "t", numFiles = math.max(4, nFiles))
    val fullSec = (System.nanoTime() - t1) / 1e9
    println(s"""{"phase":"full_rewrite","sf":"$sfDir",""" +
      s""""table_bytes":$tableBytes,"sec":${ms3(fullSec)}}""")
    spark.stop()
  }
}
