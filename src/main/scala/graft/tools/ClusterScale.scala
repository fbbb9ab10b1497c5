package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness behind SCALING.md's declared-clustering claims
  * (round 16): builds the q66 layout (three shuffled appends of
  * lineitem-derived rows — every file's min/max envelope spans the
  * whole key space), runs the one-shot `rewrite_data_files` SORT
  * strategy, and prints how many files a 1/64-area box predicate
  * intersects before and after, plus the same numbers for the
  * ROUTINE dirty-bytes pass under a declared `write.order` (small
  * appends landing after the sort stay clustered group-locally).
  *
  * Usage: runMain graft.tools.ClusterScale [sfDir]
  */
object ClusterScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wh = java.nio.file.Files.createTempDirectory("graft_cluster_wh")
    val cat = new graft.catalog.SnapshotCatalog(spark, wh.toString)
    val eng = new graft.query.Engine(spark, cat)
    try {
      val src = spark.read.parquet(s"$dir/lineitem.parquet").select(
        col("l_orderkey").as("k"), col("l_partkey").as("x"),
        col("l_suppkey").as("y"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("price_c"))
      cat.createTable("db", "e", src.schema)
      (0 until 3).foreach(i =>
        cat.append("db", "e", src.filter(col("k") % 3 === i)
          .repartition(4)))
      val b = src.agg(max("x"), max("y")).head()
      val xq = b.getAs[Number](0).longValue / 8
      val yq = b.getAs[Number](1).longValue / 8
      def boxStats(tag: String): Unit = {
        val cur = cat.describe("db", "e").currentSnapshot.get
        val live = cur.files.toSet
        val sts = cur.fileStats.filter(st => live(st.path))
        val hit = sts.count(st =>
          st.min.get("x").map(_.toDouble).getOrElse(-1e18) <= xq &&
          st.min.get("y").map(_.toDouble).getOrElse(-1e18) <= yq)
        println(s"[cluster-scale] $tag box-hit files: $hit/${sts.size}")
      }
      boxStats("scattered layout    ")
      val tblBytes = cat.describe("db", "e").currentSnapshot.get.files
        .map(f => java.nio.file.Files.size(java.nio.file.Paths.get(f))).sum
      val target = math.max(16384L, tblBytes / 8)
      val t0 = System.nanoTime()
      val rw = eng.sqlQuery(
        s"CALL system.rewrite_data_files('db.e', 1, $target, 'x,y')")
      require(!rw.startsWith("""{"error""""), rw)
      println(f"[cluster-scale] sorted rewrite: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      boxStats("after sort strategy ")
      // ROUTINE pass under declared write.order: new small appends land
      // scattered, the dirty-bytes bin-pack re-clusters just them
      val ap = eng.sqlQuery(
        "ALTER TABLE db.e SET TBLPROPERTIES ('write.order' = 'x,y')")
      require(!ap.startsWith("""{"error""""), ap)
      (0 until 4).foreach(i =>
        cat.append("db", "e", src.filter(col("k") % 97 === i).coalesce(1)))
      boxStats("after small appends ")
      val rw2 = eng.sqlQuery(
        s"CALL system.rewrite_data_files('db.e', ${target / 2}, $target)")
      require(!rw2.startsWith("""{"error""""), rw2)
      boxStats("after routine pass  ")
    } finally {
      spark.stop()
      val walk = java.nio.file.Files.walk(wh)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq.sortBy(-_.getNameCount)
          .foreach(p => java.nio.file.Files.deleteIfExists(p): Unit)
      } finally walk.close()
    }
  }
}
