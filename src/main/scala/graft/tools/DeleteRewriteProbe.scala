package graft.tools

import org.apache.spark.sql.functions._

import graft.catalog.SnapshotCatalog

/** Measures what `rewrite_position_delete_files` buys a READER
  * (round 16, SCALING.md): stages a clustered table, lands N CDC
  * windows (each an equality-delete + upsert commit — the shape that
  * accretes one eq entry and one data file per window) plus N needle
  * positional deletes, then times a full-scan aggregate BEFORE the
  * delete-side rewrite (N eq entries seq-gate-anti-joined per read +
  * N tiny pos files) and AFTER (one consolidated positional file on
  * the needle/memo path, eq side empty). Also times the rewrite pass
  * itself — the claim is O(delete side + dirty files), never O(table
  * history) — and requires the aggregate byte-identical across it.
  *
  * Run: sbt "runMain graft.tools.DeleteRewriteProbe [sfDir] [windows]";
  * JSON lines.
  */
object DeleteRewriteProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val windows = args.lift(1).map(_.toInt).getOrElse(30)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wh = java.nio.file.Files.createTempDirectory("graft_delrw").toString
    val cat = new SnapshotCatalog(spark, wh)

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("price_c"),
        col("o_orderstatus").as("status"))
    val n = orders.count()
    val nFiles = math.max(4, (n / 10000).toInt)
    cat.createTable("db", "t", orders.schema)
    cat.append("db", "t",
      orders.repartitionByRange(nFiles, col("o_orderkey")))

    // N CDC windows: each commit = 1 eq-delete entry + 1 upsert file
    (0 until windows).foreach { w =>
      val base = 1L + (w.toLong * 9973L) % math.max(1L, n - 100L)
      cat.cdcUpsert("db", "t",
        rows = spark.range(base, base + 5)
          .select(col("id").as("o_orderkey"), lit(1L).as("price_c"),
            lit("U").as("status")),
        deletes = spark.range(base + 50, base + 52)
          .select(col("id").as("o_orderkey")),
        keyCols = Seq("o_orderkey"))
    }
    // N needle positional deletes (one tiny delete file each)
    (0 until windows).foreach { w =>
      val cur = cat.describe("db", "t").currentSnapshot.get
      val key = 7L + (w.toLong * 7919L) % math.max(1L, n - 100L)
      val pos = cat.readFilesWithRowId(cur, orders.schema, cur.files)
        .filter(col("o_orderkey") === key)
        .select(SnapshotCatalog.RowIdFileCol, SnapshotCatalog.RowIdPosCol)
      cat.addDeleteFile("db", "t", pos, None)
    }
    val before = cat.describe("db", "t").currentSnapshot.get
    def fmt(v: Double): String = String.format(
      java.util.Locale.ROOT, "%.3f", Double.box(v))
    def timeMin(body: => Seq[Any]): (Double, Seq[Any]) = {
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        val r = body
        ((System.nanoTime() - t0) / 1e9, r)
      }
      (runs.map(_._1).min, runs.head._2)
    }
    def scan(): Seq[Any] = {
      val r = cat.read("db", "t")
        .agg(sum("price_c"), count(lit(1))).head()
      Seq(r.getLong(0), r.getLong(1))
    }
    val (secBefore, aggBefore) = timeMin(scan())
    require(before.statsRowCount.isEmpty,
      "precondition: eq entries must force the scan-count path")

    val t0 = System.nanoTime()
    val rep = cat.rewriteDeleteFiles("db", "t")
    val rewriteSec = (System.nanoTime() - t0) / 1e9
    val after = cat.describe("db", "t").currentSnapshot.get
    val (secAfter, aggAfter) = timeMin(scan())
    require(aggAfter == aggBefore,
      s"delete rewrite changed results: $aggBefore -> $aggAfter")
    require(after.files == before.files, "data files must be untouched")
    require(after.eqDeletes.isEmpty && after.statsRowCount.isDefined,
      "eq side must convert and restore the metadata count")

    println(s"""{"probe":"delete_rewrite","windows":$windows,""" +
      s""""delete_files_before":${rep.deleteFilesBefore},""" +
      s""""delete_files_after":${rep.deleteFilesAfter},""" +
      s""""eq_entries_converted":${rep.eqDeleteFilesConverted},""" +
      s""""pos_entries_after":${rep.entriesAfter},""" +
      s""""scan_before_sec":${fmt(secBefore)},""" +
      s""""scan_after_sec":${fmt(secAfter)},""" +
      s""""rewrite_sec":${fmt(rewriteSec)},""" +
      s""""stats_count_restored":${after.statsRowCount.isDefined}}""")
    spark.stop()
  }
}
