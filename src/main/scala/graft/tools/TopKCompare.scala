package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.GroupedTopK

/** Micro-benchmark: the custom [[GroupedTopK]] physical operator vs the
  * window-function formulation of per-group top-k, on synthetic data
  * big enough that the difference is the PLAN, not overhead. Run:
  *
  *   sbt "runMain graft.tools.TopKCompare [rows] [groups] [k]"
  *
  * Prints min-of-3 wall times for both plans plus the shuffle-read
  * volume proxy (rows entering the exchange). The measured table lives
  * in SCALING.md next to the operator's scale analysis.
  */
object TopKCompare {
  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).map(_.toLong).getOrElse(20000000L)
    val groups = args.lift(1).map(_.toInt).getOrElse(10000)
    val k = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = graft.core.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic scrambled scores; 8 input partitions
    val data = spark.range(0, rows, 1, 8)
      .select((col("id") % groups).cast("int").as("grp"),
        ((col("id") * 2654435761L) % 1000003L).as("score"),
        col("id").as("uid"))

    def windowTopK(df: DataFrame): DataFrame = {
      val w = Window.partitionBy("grp").orderBy(col("score").desc, col("uid"))
      df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .select("grp", "score", "uid")
    }
    def opTopK(df: DataFrame): DataFrame =
      GroupedTopK(df, Seq("grp"), Seq(("score", false), ("uid", true)), k)

    def time(mk: => DataFrame): (Double, Long) = {
      var best = Double.MaxValue
      var n = 0L
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        n = mk.count()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, n)
    }

    val (tw, nw) = time(windowTopK(data))
    val (to, no) = time(opTopK(data))
    require(nw == no, s"row counts diverged: window=$nw op=$no")
    println(f"rows=$rows groups=$groups k=$k -> out_rows=$no")
    println(f"window_topk  ${tw}%8.2f s   (shuffles all $rows rows, sorts every group)")
    println(f"grouped_topk ${to}%8.2f s   (shuffles <= ${8L * groups * k} partial survivors)")
    println(f"speedup      ${tw / to}%8.2fx")
    spark.stop()
  }
}
