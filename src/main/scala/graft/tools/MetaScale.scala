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
    val line = s"""{"metric":"meta_commit_sec","narrow_files":$narrow,""" +
      s""""wide_files":$wide,"commits":$nCommits,""" +
      s""""narrow_commit_sec":${fmt(narrowSec)},""" +
      s""""wide_commit_sec":${fmt(wideSec)},""" +
      s""""wide_over_narrow":${fmt(wideSec / math.max(narrowSec, 1e-9))},""" +
      s""""narrow_meta_bytes":${sz("narrow")},"wide_meta_bytes":${sz("wide")}}"""
    println(line)
    System.err.println(line)
    spark.stop()
  }
}
