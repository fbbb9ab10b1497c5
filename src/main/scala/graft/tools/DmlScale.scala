package graft.tools

import org.apache.spark.sql.functions._

import graft.catalog.SnapshotCatalog
import graft.query.Engine

/** Measures SQL DML write amplification at scale for SCALING.md's
  * replica table (round-12 item 8): stages `orders` as a key-clustered
  * catalog table (fixed rows-per-file, so the FILE COUNT grows with
  * the data), then runs the q56/q57 statement shapes — copy-on-write
  * DELETE, merge-on-read DELETE, UPDATE, MERGE upsert — over a FIXED
  * key range, and reports rows_affected, files_rewritten/files_total,
  * and wall seconds per statement.
  *
  * The claim under test: candidate selection rides the same manifest
  * range pruning as reads, so a key-local statement touches a
  * CONSTANT number of files as the table grows — files_rewritten
  * stays flat from sf0.1 to sf1 while files_total grows 10×, i.e. the
  * amplification RATIO drops 10×. Merge-on-read DELETE additionally
  * rewrites zero data files at any scale.
  *
  * Run: sbt "runMain graft.tools.DmlScale [sfDir]"; one JSON line per
  * statement.
  */
object DmlScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wh = java.nio.file.Files.createTempDirectory("graft_dmlscale").toString
    val cat = new SnapshotCatalog(spark, wh)
    val eng = new Engine(spark, cat)

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("price_c"),
        col("o_orderstatus").as("status"))
    val n = orders.count()
    val rowsPerFile = 10000
    val nFiles = math.max(4, (n / rowsPerFile).toInt)

    def stage(t: String, mode: String): Unit = {
      cat.createTable("db", t, orders.schema)
      cat.updateProperties("db", t,
        Map(SnapshotCatalog.DeleteModeProp -> mode)): Unit
      // key-clustered layout: range partitioning makes per-file
      // o_orderkey stats tight, the shape manifest pruning needs
      cat.append("db", t,
        orders.repartitionByRange(nFiles, col("o_orderkey"))): Unit
    }
    stage("cow", "copy-on-write")
    stage("mor", "merge-on-read")

    val stats = scala.collection.mutable.ListBuffer.empty[String]
    def run(op: String, sql: String): Unit = {
      val t0 = System.nanoTime()
      val out = eng.sqlQuery(sql)
      val sec = (System.nanoTime() - t0) / 1e9
      require(!out.startsWith("""{"error""""), s"$op failed: $out")
      def grab(k: String): String =
        ("\"" + k + "\":(-?\\d+)").r.findFirstMatchIn(out).map(_.group(1)).getOrElse("-1")
      val line = s"""{"op":"$op","sf":"$sfDir","rows_affected":${grab("rows_affected")},""" +
        s""""files_rewritten":${grab("files_rewritten")},"files_total":${grab("files_total")},""" +
        s""""sec":${f"$sec%.3f"}}"""
      println(line)
      stats += line
    }

    // the q56/q57 statement shapes over a FIXED key range (present at
    // every scale: replica key offsets are 1e9-spaced, range is local)
    run("delete_cow",
      "DELETE FROM db.cow WHERE o_orderkey >= 1000 AND o_orderkey < 6000")
    run("delete_mor",
      "DELETE FROM db.mor WHERE o_orderkey >= 1000 AND o_orderkey < 6000")
    run("update_cow",
      "UPDATE db.cow SET price_c = price_c + 100 " +
        "WHERE o_orderkey >= 20000 AND o_orderkey < 25000")
    run("merge_cow",
      s"""MERGE INTO db.cow t
         |USING (SELECT o_orderkey, o_custkey,
         |         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_c,
         |         'M' AS status
         |       FROM parquet.`$sfDir/orders.parquet`
         |       WHERE o_orderkey >= 40000 AND o_orderkey < 45000) s
         |ON t.o_orderkey = s.o_orderkey
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    run("merge_conditional_cow",
      s"""MERGE INTO db.cow t
         |USING (SELECT o_orderkey,
         |         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS amt
         |       FROM parquet.`$sfDir/orders.parquet`
         |       WHERE o_orderkey >= 60000 AND o_orderkey < 65000) s
         |ON t.o_orderkey = s.o_orderkey
         |WHEN MATCHED AND t.status = 'O' THEN UPDATE SET price_c = t.price_c + 1
         |WHEN MATCHED AND s.amt > 20000000 THEN DELETE""".stripMargin)

    // the O(batch) merge-on-read write paths: UPDATE and a CDC batch
    cat.updateProperties("db", "mor",
      Map("write.update.mode" -> "merge-on-read")): Unit
    run("update_mor",
      "UPDATE db.mor SET price_c = price_c + 100 " +
        "WHERE o_orderkey >= 20000 AND o_orderkey < 25000")
    val t0 = System.nanoTime()
    cat.cdcUpsert("db", "mor",
      rows = orders.filter(col("o_orderkey") >= 80000 &&
        col("o_orderkey") < 85000),
      deletes = orders.filter(col("o_orderkey") >= 90000 &&
        col("o_orderkey") < 95000).select("o_orderkey"),
      keyCols = Seq("o_orderkey")): Unit
    val cdcSec = (System.nanoTime() - t0) / 1e9
    val post = cat.describe("db", "mor").currentSnapshot.get
    println(s"""{"op":"cdc_upsert_mor","sf":"$sfDir","rows_affected":-1,""" +
      s""""files_rewritten":0,"files_total":${post.files.size},""" +
      s""""sec":${f"$cdcSec%.3f"}}""")

    println(s"""{"summary":"dml_scale","sf":"$sfDir","rows":$n,"files":$nFiles}""")
    spark.stop()
  }
}
