package graft.tools

import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.{Bpe, Similarity, TextClassifier}

/** Measures the quantities behind the t33 / e06 audit floors and the
  * t28 pinned tokenizer (round-6 oracle-ization of the last rows-only
  * queries): per scale factor, the t33 classifier accuracy vs its
  * teacher rule, the e06 planted-twin collapse rate, and the learned
  * 10-merge BPE list. Run:
  *
  *   sbt "runMain graft.tools.AuditMeasure"
  */
object AuditMeasure {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.builder("local[16]", 16).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (dir <- dirs) {
      val sf = dir.split('/').last
      val d = graft.core.Tables.load(spark, dir, "documents")

      // ----- t33: classifier accuracy vs teacher rule
      val toksQ = TextFns.tokens(col("text"))
      val stopRatio = TextFns.vocabHits(col("text"),
        TextFns.langProfiles.head._2).cast("double") /
        greatest(size(toksQ), lit(1)).cast("double")
      val label = (stopRatio >= 0.06).cast("double")
      val (w, b) = TextClassifier.trainLogReg(d, label, nBuckets = 1024,
        iters = 12, step = 2.0)
      val acc = TextClassifier.score(d, w, b, nBuckets = 1024)
        .select(((col("prob") >= 0.5).cast("double") === label)
          .cast("double").as("ok"))
        .agg(avg("ok")).head.getDouble(0)
      println(f"[measure] $sf%-8s t33 accuracy = $acc%.4f")

      // ----- e06: planted-twin collapse rate + one-keep-per-component
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val base = e.select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      val jit = base
        .withColumn("_j", transform(col("embedding"),
          x => x * (lit(1.0) + lit(0.05) * sin(x * 1000 + col("vec_id")))))
        .select((col("vec_id") + 100000L).as("vec_id"),
          col("_j").as("embedding"))
      val aug = base.unionAll(jit)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val dd = Similarity.semanticDedup(aug, threshold = 0.9, nCells = 8,
        iters = 2, trainFraction = 0.2).persist()
      val n = base.count()
      val collapsed = dd.select(col("vec_id"), col("component"))
        .join(dd.select((col("vec_id") - 100000L).as("vec_id"),
          col("component").as("c2")), Seq("vec_id"))
        .filter(col("component") === col("c2")).count()
      val badComps = dd.groupBy("component")
        .agg(sum("keep").as("nk")).filter(col("nk") =!= 1).count()
      println(f"[measure] $sf%-8s e06 collapse = ${collapsed.toDouble / n}%.4f" +
        f" ($collapsed/$n), components with keep!=1: $badComps")
      aug.unpersist(); dd.unpersist()

      // ----- t28: learned merge list (to pin one SF-independent artifact)
      val (merges, _) = Bpe.train(d, nMerges = 10)
      println(s"[measure] $sf t26/t28 merges = " +
        merges.map { case (a, bb) => s"($a,$bb)" }.mkString(" "))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
