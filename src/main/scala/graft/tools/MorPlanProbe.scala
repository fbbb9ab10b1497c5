package graft.tools

import org.apache.spark.sql.functions._

import graft.catalog.SnapshotCatalog

/** Plan + cost audit of the merge-on-read READ path (round 12): stages
  * a key-clustered table, commits a positional and an equality delete,
  * and (a) prints the formatted physical plan of the MoR read — the
  * delete sides must ride BroadcastHashJoin LeftAnti, never a shuffle
  * of the data side — and (b) times a full-scan aggregate on the MoR
  * table vs the same table compacted, isolating the anti-join
  * overhead readers pay between maintenance passes.
  *
  * Run: sbt "runMain graft.tools.MorPlanProbe [sfDir]"
  */
object MorPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.builder("local[16]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wh = java.nio.file.Files.createTempDirectory("graft_morplan").toString
    val cat = new SnapshotCatalog(spark, wh)
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("price_c"),
        col("o_orderstatus").as("status"))
    cat.createTable("db", "o", orders.schema)
    cat.append("db", "o",
      orders.repartitionByRange(
        math.max(4, (orders.count() / 10000).toInt), col("o_orderkey")))
    val snap0 = cat.describe("db", "o").currentSnapshot.get
    val pos = cat.readFilesWithRowId(snap0, orders.schema, snap0.files)
      .filter(col("o_orderkey") >= 1000 && col("o_orderkey") < 6000)
      .select(SnapshotCatalog.RowIdFileCol, SnapshotCatalog.RowIdPosCol)
    cat.addDeleteFile("db", "o", pos, None)
    cat.addEqualityDeleteFile("db", "o",
      orders.filter(col("o_orderkey") >= 20000 && col("o_orderkey") < 25000)
        .select("o_orderkey"), Seq("o_orderkey"))
    println("========== merge-on-read full read plan ==========")
    cat.read("db", "o").explain("formatted")
    // HARD assertion (round-13 item 5): the delete-side anti-joins must
    // be pinned broadcasts — a sort-merge anti-join here means the
    // 100 TB data side is being shuffled for a KB-sized delete side
    val planStr = cat.read("db", "o").queryExecution.executedPlan.toString
    require(planStr.contains("BroadcastHashJoin") &&
      planStr.contains("LeftAnti"),
      "MoR read plan lost its broadcast anti-join:\n" + planStr)
    require(!planStr.contains("SortMergeJoin"),
      "MoR read plan shuffles the data side:\n" + planStr)
    println("""{"probe":"plan","broadcast_anti_join":true}""")
    def time(tag: String)(body: => Unit): Unit = {
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"""{"probe":"$tag","sec":$best%.3f}""")
    }
    time("scan_with_deletes") {
      cat.read("db", "o").agg(sum("price_c"), count(lit(1))).collect(): Unit
    }
    cat.compact("db", "o", numFiles = 15)
    time("scan_compacted") {
      cat.read("db", "o").agg(sum("price_c"), count(lit(1))).collect(): Unit
    }
    spark.stop()
  }
}
