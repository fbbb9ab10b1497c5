package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Recall@5 of the binary-signature flat scan (Similarity.knnHamming)
  * vs exact kNN, across rerank depths and SFs — the sweep behind e20's
  * rerank default and `annFloors("e20")` (table in SCALING.md).
  *
  *   sbt "runMain graft.tools.HammingSweep"
  */
object HammingSweep {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[16]", 16).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    println("sf            bits  rerank  recall")
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val exact = pairs(Similarity.knnExact(e.filter(col("vec_id") < 50), e, 5))
      for (bits <- Seq(64, 128, 256); rr <- Seq(50, 100, 150)) {
        val got = pairs(Similarity.knnHamming(e, 5, col("id") < 50,
          nBits = bits, rerank = rr))
        val rec = (got & exact).size.toDouble / exact.size
        println(f"${dir.split('/').last}%-12s $bits%4d $rr%6d $rec%7.3f")
        graft.core.CacheHygiene.releaseAll(spark, blocking = true)
      }
    }
    spark.stop()
  }
}
