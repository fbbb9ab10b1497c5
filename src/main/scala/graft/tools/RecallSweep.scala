package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Sign-LSH tuning harness (round-2 VERDICT item 5): sweeps
  * (nPlanes × nTables) against the exact-kNN oracle on the real
  * embeddings and prints recall plus the candidate-pair count (the
  * bucket-join cost driver). Run:
  *
  *   sbt "runMain graft.tools.RecallSweep /root/testdata/sf0.01"
  *
  * The chosen default is wired into SparkEntry's e03 and pinned by
  * OperatorSpec's recall floor; the measured table lives in SCALING.md.
  */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.core.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = e.count()

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.knnExact(e.filter(col("vec_id") < 50), e, 5))

    println(f"n=$n exact_top5_pairs=${exact.size}")
    println("planes tables    recall  candidates  cand_frac")
    for (p <- Seq(3, 4, 5, 6); l <- Seq(4, 8, 12, 16)) {
      val cand = Similarity.lshCandidatePairs(e, nPlanes = p, dim = 64, nTables = l)
      val nc = cand.count()
      val lsh = pairs(Similarity.knnLsh(e, 5, p, 64, col("id") < 50, nTables = l))
      val rec = (lsh & exact).size.toDouble / exact.size
      println(f"$p%6d $l%6d $rec%9.3f $nc%11d ${nc * 2.0 / (n * (n - 1))}%9.4f")
    }
    spark.stop()
  }
}
