package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.{Pq, Similarity}

/** PQ / IVF-PQ tuning harness (same discipline as [[RecallSweep]]):
  * sweeps subspace count × rerank depth against the exact-kNN oracle on
  * the real embeddings and prints top-5 recall plus bytes/vector (the
  * axis PQ exists for). Run:
  *
  *   sbt "runMain graft.tools.PqSweep /root/testdata/sf0.01"
  *
  * The chosen defaults are wired into SparkEntry's e08/e09 and pinned
  * by OperatorSpec's recall floors; the measured table lives in
  * SCALING.md.
  */
object PqSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.core.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.knnExact(e.filter(col("vec_id") < 50), e, 5))

    println("      m  rerank  recall  bytes/vec")
    for (m <- Seq(4, 8, 16); rr <- Seq(0, 25, 50)) {
      val books = Pq.trainCodebooks(e, m, ksub = 16, dim = 64, iters = 3)
      val pq = pairs(Pq.knnPq(e, 5, books, 64, col("id") < 50, rerank = rr))
      val rec = (pq & exact).size.toDouble / exact.size
      println(f"$m%7d $rr%7d $rec%7.3f $m%10d")
    }
    println("ivfpq: nProbe sweep at m=8 ksub=16 rerank=50 (nCells=16)")
    for (np <- Seq(4, 8, 12)) {
      val ivfpq = pairs(Pq.knnIvfPq(e, 5, nCells = 16, nProbe = np,
        m = 8, ksub = 16, dim = 64, col("id") < 50, rerank = 50))
      val rec = (ivfpq & exact).size.toDouble / exact.size
      println(f"nProbe=$np%2d recall=$rec%7.3f probed_frac=${np / 16.0}%5.2f")
    }
    spark.stop()
  }
}
