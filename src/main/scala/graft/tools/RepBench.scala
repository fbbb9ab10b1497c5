package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** High-repetition re-measurement for specific queries (round-6 VERDICT
  * item 6: q04/q05/q06/q08/q11 looked 1.3-1.5× slower in the r05 batch
  * than in r03). Bench's min-of-3 is tuned for a 97-query sweep; this
  * tool takes the SAME queries through n interleaved passes (default
  * 12) in an otherwise idle JVM and prints min / median / max per
  * query, which separates a real plan regression (min shifts) from
  * co-scheduling noise (min stable, tail inflated).
  *
  *   sbt "runMain graft.tools.RepBench [n] [name,name,...]"
  */
object RepBench {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(12)
    val names = args.lift(1)
      .map(_.split(',').map(_.trim).toSet)
      .getOrElse(Set("q04_window_rank", "q05_topk", "q06_setops",
        "q08_distinct_agg", "q11_semi_anti"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val metrics = graft.BenchMetrics.install(spark.sparkContext)
    // blocking: removal events must land before the next reset() so
    // block_removals attribute to the run that owned the blocks
    def clean(): Unit = graft.core.CacheHygiene.releaseAll(spark, blocking = true)
    val specs = SparkEntry.specs.filter(s => names(s.name))
    // one untimed warm-up pass (JIT + codegen cache), then n timed
    // passes — each from a clean block manager (incl. after warm-up)
    specs.foreach(s => s.run(spark, sfDir).count())
    clean()
    val samples = (1 to n).map { _ =>
      specs.map { s =>
        metrics.reset()
        val t0 = System.nanoTime()
        s.run(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        val m = metrics.snapshotAfter()
        clean()
        s.name -> (t, m)
      }
    }
    specs.foreach { s =>
      val runs = samples.map(_.find(_._1 == s.name).get._2)
      val xs = runs.map(_._1).sorted
      val med = xs(xs.length / 2)
      println(f"[repbench] ${s.name}%-20s n=$n min=${xs.head}%.3f " +
        f"med=$med%.3f max=${xs.last}%.3f")
      // engine metrics of the MEDIAN-time run (VERDICT r8 item 4)
      val medRun = runs.sortBy(_._1).apply(runs.length / 2)._2
      println(s"[repbench-metrics] ${s.name} ${medRun.json}")
    }
    spark.stop()
  }
}
