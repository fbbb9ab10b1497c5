package graft.tools
import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.operators.TextClassifier
object LrTune {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val stopRatio = TextFns.vocabHits(col("text"), TextFns.langProfiles.head._2).cast("double") /
      greatest(size(TextFns.tokens(col("text"))), lit(1)).cast("double")
    val label = (stopRatio >= 0.06).cast("double")
    for (it <- Seq(12, 24, 40); st <- Seq(1.0, 2.0, 4.0)) {
      val (w, b) = TextClassifier.trainLogReg(d, label, 1024, it, st)
      val acc = TextClassifier.score(d, w, b, 1024)
        .select(avg(((col("prob") >= 0.5).cast("double") === label).cast("double")))
        .head.getDouble(0)
      println(f"iters=$it%3d step=$st acc=$acc%.4f")
    }
    spark.stop()
  }
}
