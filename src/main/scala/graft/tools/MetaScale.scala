package graft.tools

import org.apache.spark.sql.functions._

import graft.catalog.SnapshotCatalog

/** Measures METADATA COMMIT cost vs table width for SCALING.md
  * (round 15, the manifest-split change): stages two tables — one
  * narrow (few files), one wide (many files, same rows) — then times a
  * burst of METADATA-ONLY commits (`updateProperties`: no Spark job,
  * no data IO — the pure cost of serializing and writing a version).
  *
  * The claim under test: with per-snapshot side manifests, a commit
  * serializes O(its own new files) + O(1) per historical snapshot —
  * so the metadata-only commit cost is FLAT in table width. Before the
  * split every commit re-serialized EVERY snapshot's per-file stats
  * into the versioned metadata.json: at 100 TB (millions of files)
  * that is hundreds of MB of JSON per commit — the table would stop
  * accepting commits long before the data layer strained.
  *
  * Run: sbt "runMain graft.tools.MetaScale [narrowFiles] [wideFiles]";
  * one JSON line.
  */
object MetaScale {
  def main(args: Array[String]): Unit = {
    val narrow = args.lift(0).map(_.toInt).getOrElse(50)
    val wide = args.lift(1).map(_.toInt).getOrElse(2000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wh = java.nio.file.Files.createTempDirectory("graft_metascale").toString
    val cat = new SnapshotCatalog(spark, wh)

    def stage(tbl: String, nFiles: Int): Unit = {
      val df = spark.range(0L, nFiles * 100L)
        .select(col("id").as("k"), (col("id") * 2).as("v"))
      cat.createTable("db", tbl, df.schema)
      cat.append("db", tbl, df.repartition(nFiles))
    }
    stage("narrow", narrow)
    stage("wide", wide)

    def burst(tbl: String, n: Int): Double = {
      // warm-up commit (JIT + first parse)
      cat.updateProperties("db", tbl, Map("warm" -> "1"))
      val t0 = System.nanoTime()
      for (i <- 0 until n)
        cat.updateProperties("db", tbl, Map(s"k$i" -> i.toString))
      (System.nanoTime() - t0) / 1e9 / n
    }
    val nCommits = 50
    val narrowSec = burst("narrow", nCommits)
    val wideSec = burst("wide", nCommits)
    def sz(tbl: String): Long = {
      val mdir = java.nio.file.Paths.get(wh, "db", tbl, "metadata")
      val s = java.nio.file.Files.list(mdir)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".metadata.json"))
          .map(java.nio.file.Files.size).max
      } finally s.close()
    }
    def fmt(v: Double): String = String.format(
      java.util.Locale.ROOT, "%.5f", Double.box(v))

    // RENAME cost vs width × history (round 16, the NameLink change):
    // deepen both tables to ~50 snapshots, then time ALTER RENAME.
    // The claim: rename appends one link to the slim metadata and
    // touches ZERO manifests — flat in file count and history depth
    // (the old design rewrote every historical manifest: O(history ×
    // files) IO per rename).
    def deepen(tbl: String, upTo: Int): Unit = {
      var n = cat.describe("db", tbl).snapshots.size
      while (n < upTo) {
        cat.append("db", tbl, spark.range(n, n + 1L)
          .select(col("id").as("k"), (col("id") * 2).as("v")).coalesce(1))
        n += 1
      }
    }
    def manifestSet(tbl: String): Set[(String, Long)] = {
      val mdir = java.nio.file.Paths.get(wh, "db", tbl, "metadata")
      val s = java.nio.file.Files.list(mdir)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(_.getFileName.toString.startsWith("manifest-"))
          .map(p => p.toString -> java.nio.file.Files
            .getLastModifiedTime(p).toMillis).toSet
      } finally s.close()
    }
    def renameSec(tbl: String): (Double, Int) = {
      val before = manifestSet(tbl)
      val t0 = System.nanoTime()
      cat.renameColumn("db", tbl, "v", "v2")
      val sec = (System.nanoTime() - t0) / 1e9
      val touched = (manifestSet(tbl) diff before).size +
        (before diff manifestSet(tbl)).size
      // reads still correct under the renamed view
      require(cat.read("db", tbl).filter(col("v2").isNotNull).count() > 0)
      (sec, touched)
    }
    deepen("narrow", 50)
    deepen("wide", 50)
    val (renNarrow, touchedNarrow) = renameSec("narrow")
    val (renWide, touchedWide) = renameSec("wide")

    val line = s"""{"metric":"meta_commit_sec","narrow_files":$narrow,""" +
      s""""wide_files":$wide,"commits":$nCommits,""" +
      s""""narrow_commit_sec":${fmt(narrowSec)},""" +
      s""""wide_commit_sec":${fmt(wideSec)},""" +
      s""""wide_over_narrow":${fmt(wideSec / math.max(narrowSec, 1e-9))},""" +
      s""""narrow_meta_bytes":${sz("narrow")},"wide_meta_bytes":${sz("wide")},""" +
      s""""rename_narrow_sec":${fmt(renNarrow)},""" +
      s""""rename_wide_sec":${fmt(renWide)},""" +
      s""""rename_wide_over_narrow":${fmt(renWide / math.max(renNarrow, 1e-9))},""" +
      s""""rename_manifests_touched_narrow":$touchedNarrow,""" +
      s""""rename_manifests_touched_wide":$touchedWide}"""
    println(line)
    System.err.println(line)
    spark.stop()
  }
}
