package graft.tools

import org.apache.spark.sql.functions._

/** Stage-timing probe for e05's sf1 wall (round 9): where do the
  * seconds go between aug materialization, bucket checkpoint, and the
  * in-bucket verify join?
  */
object E05Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    import graft.operators.Similarity

    def t[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[e05probe] $what%-18s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val base = e.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    val jit = base
      .withColumn("_j", transform(col("embedding"),
        x => x * (lit(1.0) + lit(0.05) * sin(x * 1000 + col("vec_id")))))
      .select((col("vec_id") + 100000L).as("vec_id"), col("_j").as("embedding"))
    val aug = base.unionAll(jit)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = t("aug count") { aug.count() }
    val planes = Similarity.autoPlanes(n)
    val tables = 6 + (planes - 8 + 2) / 3
    println(s"[e05probe] n=$n planes=$planes tables=$tables")
    val out = t("fused pairs") {
      Similarity.lshNearDupPairs(aug, 0.9, nPlanes = planes, dim = 64,
        nTables = tables).count()
    }
    println(s"[e05probe] pairs=$out")
    t("full query") {
      graft.SparkEntry.queries("e05_neardup_lsh_verified")(spark, dir).count()
    }
    spark.stop()
  }
}
