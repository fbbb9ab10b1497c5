package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Probes the two fixed-granularity cliffs the sf1 full-suite smoke
  * exposed (SCALING.md "Full-suite 10× smoke"): e05's LSH candidate
  * volume under fixed plane count, and the same corpus under
  * occupancy-scaled planes. Prints candidate counts, verified-pair
  * counts, and wall time per configuration.
  *
  *   sbt "runMain graft.tools.ScaleProbe [sfDir ...]"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_sf1")
    val spark = graft.core.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (dir <- dirs) {
      val base = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val jit = base
        .withColumn("_j", transform(col("embedding"),
          x => x * (lit(1.0) + lit(0.05) * sin(x * 1000 + col("vec_id")))))
        .select((col("vec_id") + 100000L).as("vec_id"), col("_j").as("embedding"))
      val aug = base.unionAll(jit)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = aug.count()

      for ((planes, tables) <- Seq((8, 6), (Similarity.autoPlanes(n), 6))) {
        val t0 = System.nanoTime()
        val cand = Similarity.lshCandidatePairs(aug, nPlanes = planes,
          dim = 64, nTables = tables)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nCand = cand.count()
        val nPairs = Similarity.nearDupPairs(aug, threshold = 0.9,
          candidates = Some(cand)).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[probe] $dir n=$n planes=$planes tables=$tables " +
          f"candidates=$nCand verified=$nPairs time=$sec%.1fs")
        cand.unpersist()
      }
      aug.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
