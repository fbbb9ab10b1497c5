package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** JL-projection ANN measurement harness: recall of sign-LSH with
  * bucket generation on `randomProject`ed vectors (scoring always
  * full-dim) vs the exact-kNN oracle, across reduction targets. Run:
  *
  *   sbt "runMain graft.tools.ProjRecall /root/testdata/sf0.001"
  *
  * Measured (seed-42 testdata, 4 planes × 12 tables): dimOut=8 →
  * 0.776, dimOut=16 → 0.824, dimOut=32 → 0.788; full-dim e03 is
  * 0.820 — the 64→16 projection matches full-dim recall at 4× less
  * bucket-hash work. e10 wires dimOut=16; OperatorSpec pins ≥ 0.70.
  */
object ProjRecall {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.core.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.knnExact(e.filter(col("vec_id") < 50), e, 5))
    for (dOut <- Seq(8, 16, 32)) {
      val proj = Similarity.randomProject(e, 64, dOut)
      val got = pairs(Similarity.knnLsh(e, 5, 4, dOut, col("id") < 50,
        bucketFrame = Some(proj)))
      println(f"dimOut=$dOut recall=${(got & exact).size.toDouble / exact.size}%.3f")
    }
    for (dProj <- Seq(4, 8, 16); nT <- Seq(6, 12)) {
      val got = pairs(Similarity.knnCp(e, 5, dProj, col("id") < 50,
        nTables = nT))
      println(f"cp dimProj=$dProj tables=$nT recall=${(got & exact).size.toDouble / exact.size}%.3f")
    }
    spark.stop()
  }
}
