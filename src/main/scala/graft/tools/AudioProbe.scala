package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage isolation for the m06 audio path: where does the wall go —
  * text read, WAV synthesis, PCM decode+featurize, or the final sort?
  */
object AudioProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val spark = graft.core.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val base = graft.core.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, String)].cache()
    time("read+repartition+cache")(base.count())
    val media = base.map { case (id, t) =>
      graft.operators.Multimodal.MediaRow(id, "audio/wav",
        graft.operators.Audio.wavFixture(t))
    }
    (1 to 2).foreach(i => time(s"synthesize only (pass $i)")(media.count()))
    val feats = graft.operators.Audio.features(media)
    (1 to 2).foreach(i => time(s"synthesize+decode+feat ($i)")(feats.count()))
    time("full m06 with sort")(
      feats.toDF().orderBy("doc_id").count())
    println("[probe] partitions: " + media.rdd.getNumPartitions)
    spark.stop()
  }
}
