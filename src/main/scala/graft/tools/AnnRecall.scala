package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.queries.TrainingData

/** Measures mean recall@5 of every audited ANN query (e03/e04/e08-e12
  * raw top-k builders) against exact kNN, per scale factor — the
  * numbers behind the `TrainingData.annFloors` pins (table in
  * SCALING.md). Run:
  *
  *   sbt "runMain graft.tools.AnnRecall"            # all three SFs
  *   sbt "runMain graft.tools.AnnRecall /root/testdata/sf0.01"
  */
object AnnRecall {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.builder("local[16]", 16).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val raws: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "e03" -> (TrainingData.e03Raw _),
      "e04" -> (TrainingData.e04Raw _),
      "e08" -> (TrainingData.e08Raw _),
      "e09" -> (TrainingData.e09Raw _),
      "e10" -> (TrainingData.e10Raw _),
      "e11" -> (TrainingData.e11Raw _),
      "e12" -> (TrainingData.e12Raw _),
      "e15" -> (TrainingData.e15Raw _),
      "e20" -> (TrainingData.e20Raw _),
      "e21" -> (TrainingData.e21Raw _))

    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    println("sf            query  recall  floor  margin")
    for (dir <- dirs) {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val exact = pairs(Similarity.knnExact(e.filter(col("vec_id") < 50), e, 5))
      for ((name, fn) <- raws) {
        val rec = (pairs(fn(spark, dir)) & exact).size.toDouble / exact.size
        val floor = TrainingData.annFloors(name)
        println(f"${dir.split('/').last}%-12s $name%6s $rec%7.3f $floor%6.2f " +
          f"${rec - floor}%7.3f")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
