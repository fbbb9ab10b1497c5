package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scale-up smoke: replicate the sf0.1 documents 10× (doc ids offset,
  * text deterministically perturbed per replica so the dup structure
  * per replica stays the corpus's own, instead of every doc becoming a
  * 10-way duplicate) and compare dedup-tier runtimes at 1× vs 10×. A
  * shuffle-on-key linear operator should scale ≈ data ratio; anything
  * super-linear is a candidate-generation blowup. Run:
  *
  *   sbt "runMain graft.tools.ScaleSmoke /root/testdata/sf0.1"
  *
  * Measured (local[32], min of 2): see SCALING.md "Scale-up smoke".
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d0 = spark.read.parquet(s"$sf/documents.parquet")

    // every token gets a per-replica prefix: replicas are DISJOINT in
    // shingle/window space (no cross-replica dups) while each replica
    // keeps the corpus's own internal dup structure — a true 10× of
    // the same workload, not a 10-way-duplicate workload
    def replicate(n: Int) = (0 until n).map { i =>
      d0.select((col("doc_id") + lit(i * 1000000000L)).as("doc_id"),
        concat_ws(" ", transform(split(col("text"), " "),
          t => concat(lit(s"r${i}x"), t))).as("text"))
    }.reduce(_ unionByName _)

    def time(f: => Long): (Double, Long) = {
      var rows = 0L
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        rows = f
        (System.nanoTime() - t0) / 1e9
      }
      (runs.min, rows)
    }

    for (n <- Seq(1, 10)) {
      val d = replicate(n).persist()
      val total = d.count()
      val (te, re) = time(Dedup.exact(d).count())
      val (ts, rs) = time(Dedup.duplicatedSpans(d, 5).count())
      val (tm, rm) = time(Dedup.minHashLsh(d, 3, 0.5).count())
      println(f"x$n%-2d docs=$total%7d | exact $te%6.2fs ($re%d rows) " +
        f"| spans $ts%6.2fs ($rs%d) | minhash $tm%6.2fs ($rm%d)")
      d.unpersist()
      spark.catalog.clearCache()
    }

    // ANN tier: PQ encode + IVF search over a replicated embedding
    // corpus, with the index (coarse cells + codebooks) TRAINED ONCE
    // at 1× and held fixed — the deployment shape (train on a sample,
    // index the world). Encode is a pure codegen projection and IVF
    // probe cost is ∝ corpus/nCells, so both should track the data
    // ratio; super-linear growth would mean assignment started
    // shuffling the corpus again.
    import graft.operators.{Pq, Similarity}
    val e0 = spark.read.parquet(s"$sf/embeddings.parquet")
    def replicateE(n: Int) = (0 until n).map { i =>
      // deterministic per-replica perturbation: scale dim j by a
      // replica-dependent factor so replicas aren't bit-identical
      // (unit-normalization in the operators absorbs global scale)
      e0.select((col("vec_id") + lit(i * 1000000000L)).as("vec_id"),
        transform(col("embedding"),
          (x, j) => x * (lit(1.0f) + lit(i * 0.01f) * (j % 7))).as("embedding"))
    }.reduce(_ unionByName _)
    val books = Pq.trainCodebooks(e0, m = 8, ksub = 16, dim = 64, iters = 3)
    val cents = Similarity.kmeansCentroids(e0, 16, 4)
    for (n <- Seq(1, 10)) {
      val e = replicateE(n).persist()
      val total = e.count()
      val (tc, rc) = time(Pq.encode(e, books, dim = 64).count())
      val (ti, ri) = time(Similarity.knnIvf(e, 5, nCells = 16, nProbe = 4,
        col("id") < 50, centroids = Some(cents)).count())
      println(f"x$n%-2d vecs=$total%7d | pq-encode $tc%6.2fs ($rc%d rows) " +
        f"| ivf-knn $ti%6.2fs ($ri%d)")
      e.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
