package graft.core

import org.apache.spark.SparkContext
import org.apache.spark.sql.SparkSession

/** Deterministic release of ALL block-manager state a query left
  * behind — the session-level half of the round-9 persist-lifecycle
  * fix.
  *
  * Two kinds of state accumulate in a long-lived session:
  *  - Dataset-level persists (the query-layer multi-consumer frames
  *    marked by `TrainingData.releasing`, Dedup's session-scoped
  *    `cached` intermediates) — registered with the cache manager,
  *    dropped by `catalog.clearCache()`;
  *  - `localCheckpoint` blocks (operator-internal materializations in
  *    Similarity/UnigramLm) — owned by their plan and reclaimed by the
  *    ContextCleaner on GC, which is correct but LAZY: a 112-query
  *    one-JVM run can churn the block manager long before a periodic
  *    GC fires. These never appear in the cache manager; only
  *    `getPersistentRDDs` sees them.
  *
  * Calling this after each query's action releases both. Safe between
  * sequential queries: the next query builds its plan from source and
  * re-reads nothing dropped here. Bench, Verify, and RepBench all call
  * it per query (the RepBench evidence: e05's sf1 spread fell from
  * min 3.38 s / med 18.5 s to med within 1.2× of min); an embedding
  * application with its own query loop should do the same.
  */
object CacheHygiene {

  def releaseAll(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    releaseRdds(spark.sparkContext)
  }

  /** The RDD-level half only (checkpoint blocks + raw RDD persists). */
  def releaseRdds(sc: SparkContext): Unit =
    sc.getPersistentRDDs.valuesIterator.foreach(_.unpersist(blocking = false))
}
