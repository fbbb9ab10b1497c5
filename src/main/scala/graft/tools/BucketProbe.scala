package graft.tools

import org.apache.spark.sql.functions._

/** Occupancy-skew probe for e05's sign-LSH buckets at sf1: per-table
  * Σ count² is the pair-join work; a few dense buckets dominate it.
  */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    import graft.operators.Similarity
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val base = e.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    val jit = base
      .withColumn("_j", transform(col("embedding"),
        x => x * (lit(1.0) + lit(0.05) * sin(x * 1000 + col("vec_id")))))
      .select((col("vec_id") + 100000L).as("vec_id"), col("_j").as("embedding"))
    val aug = base.unionAll(jit)
    val b = Similarity.lshBuckets(aug, nPlanes = 12, dim = 64)
    val occ = b.groupBy("bucket").agg(count(lit(1)).as("c"))
    occ.agg(count(lit(1)).as("n_buckets"), max("c").as("max_occ"),
        sum(col("c") * col("c")).as("sum_sq"), sum("c").as("n"))
      .show(false)
    occ.orderBy(desc("c")).limit(10).show(false)
    spark.stop()
  }
}
