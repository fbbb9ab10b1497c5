package graft

import org.apache.spark.sql.functions._

import graft.core.CacheHygiene
import graft.operators.Similarity

/** The round-9 lifecycle contract, evidenced: after a query's action
  * plus `CacheHygiene.releaseAll`, the block manager holds NOTHING —
  * neither cache-manager persists (query-layer/Dedup `cached` frames)
  * nor localCheckpoint blocks (connectedComponents' per-round labels),
  * and repeating the cycle never accumulates state. This is the
  * mechanism behind RepBench's e05 spread collapsing from 5.5× to
  * within 1.2× of min at sf1.
  */
class CacheHygieneSpec extends SparkTestBase {
  import spark.implicits._

  private def persistentRddCount: Int =
    spark.sparkContext.getPersistentRDDs.size

  test("releaseAll drops Dataset persists AND checkpoint blocks") {
    CacheHygiene.releaseAll(spark) // clean slate from other suites
    val df = spark.range(0, 1000).select(col("id"), (col("id") % 7).as("k"))
      .persist()
    df.count()
    val ck = spark.range(0, 100).toDF("v").localCheckpoint(true)
    ck.count()
    assert(persistentRddCount >= 2, s"expected cached state, got $persistentRddCount")
    assert(!spark.sharedState.cacheManager.isEmpty)
    CacheHygiene.releaseAll(spark)
    assert(spark.sharedState.cacheManager.isEmpty)
    assert(persistentRddCount == 0,
      s"$persistentRddCount persistent RDDs survived releaseAll")
  }

  test("a query cycle with operator-internal caches leaves zero residue, repeatedly") {
    CacheHygiene.releaseAll(spark)
    val docs = (1L to 60L).map(i =>
      (i, s"alpha bravo charlie delta echo foxtrot golf hotel token$i " * 3))
      .toDF("doc_id", "text")
    for (rep <- 1 to 3) {
      // runs Dedup.cached (shingle index) + connectedComponents'
      // localCheckpoint rounds — both block-manager consumers
      val out = graft.operators.Dedup.connectedComponents(
        graft.operators.Dedup.ngramJaccard(docs, n = 3, threshold = 0.3))
      out.count()
      CacheHygiene.releaseAll(spark)
      assert(persistentRddCount == 0,
        s"rep $rep left $persistentRddCount persistent RDDs")
      assert(spark.sharedState.cacheManager.isEmpty, s"rep $rep left cache entries")
    }
  }

  test("scoped release frees only the RDDs created inside the scope") {
    CacheHygiene.releaseAll(spark)
    // a "concurrent" query's long-lived state: a checkpoint taken
    // BEFORE the scope — session-global releaseAll would kill it
    // (truncated lineage, unrecoverable); the scoped pair must not
    val outside = spark.range(0, 50).toDF("v").localCheckpoint(true)
    outside.count()
    val before = CacheHygiene.snapshotRdds(spark.sparkContext)
    val inside = spark.range(0, 500).select(col("id"), (col("id") % 3).as("k"))
      .localCheckpoint(true)
    inside.count()
    assert(persistentRddCount >= 2)
    CacheHygiene.releaseNewSince(spark.sparkContext, before)
    assert(persistentRddCount == before.size,
      s"scoped release left $persistentRddCount, expected ${before.size}")
    // the outside frame is still readable — its blocks survived
    assert(outside.count() == 50L)
    CacheHygiene.releaseAll(spark)
  }

  test("lshNearDupPairs' internal persists are released by the session hook") {
    CacheHygiene.releaseAll(spark)
    val rnd = new scala.util.Random(5L)
    val vecs = (1L to 200L).map(i =>
      (i, Array.fill(16)(rnd.nextGaussian()))).toDF("vec_id", "embedding")
    Similarity.lshNearDupPairs(vecs, threshold = 0.99, nPlanes = 6, dim = 16)
      .count()
    assert(persistentRddCount > 0, "operator should have cached internally")
    CacheHygiene.releaseAll(spark)
    assert(persistentRddCount == 0 && spark.sharedState.cacheManager.isEmpty)
  }
}
