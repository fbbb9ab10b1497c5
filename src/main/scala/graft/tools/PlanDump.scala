package graft.tools

/** Prints the formatted physical plan of named SparkEntry queries —
  * the .explain audit loop (pushdown present? broadcasts where
  * expected? no stray cartesian?). Run:
  *
  *   sbt "runMain graft.tools.PlanDump /root/testdata/sf0.01 q32_column_profile t27_lm_perplexity"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1)
    require(names.nonEmpty, "usage: PlanDump <sfDir> <queryName>...")
    val spark = graft.core.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"========== $n ==========")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
