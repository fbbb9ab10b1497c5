package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`array<float>`).
  *
  * Scale design: the query set is broadcast (top-k queries are few);
  * the candidate corpus stays partitioned, so scoring is an embarrassed
  * map over corpus partitions followed by a per-query top-k — Spark
  * plans the rank filter as a windowed partial sort, never a global
  * collect. The LSH variant buckets the corpus once (one shuffle) and
  * only scores within buckets.
  */
object Similarity {

  /** Exact brute-force cosine top-k. `queries` and `corpus` both need
    * (idCol, embedding). Self-matches are excluded.
    * Output: (query_id, rank, neighbor_id, sim).
    */
  def knnExact(queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      asDouble(col("embedding")).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col("embedding")).as("cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("sim"), 4).as("sim"))
  }

  /** Exact near-duplicate pairs: all (a < b) with cosine ≥ threshold.
    * O(n²) scoring — correct baseline; at 100 TB route through
    * `lshBuckets` first and verify candidates exactly.
    */
  def nearDupPairs(vecs: DataFrame, threshold: Double,
      idCol: String = "vec_id"): DataFrame = {
    val v = vecs.select(col(idCol).as("id"), asDouble(col("embedding")).as("v"))
    v.as("x").join(v.as("y"), col("x.id") < col("y.id"))
      .withColumn("sim", cosine(col("x.v"), col("y.v")))
      .filter(col("sim") >= threshold)
      .select(col("x.id").as("a"), col("y.id").as("b"),
        round(col("sim"), 4).as("sim"))
  }

  /** Deterministic random hyperplanes (fixed seed) for sign-LSH. */
  private[operators] def hyperplanes(nPlanes: Int, dim: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  /** Sign-LSH bucket id (0 until 2^nPlanes) for each vector. */
  def lshBuckets(vecs: DataFrame, nPlanes: Int, dim: Int,
      idCol: String = "vec_id"): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)
    val v = asDouble(col("embedding"))
    val bucket = (0 until nPlanes).map { p =>
      val proj = dot(v, typedlit(planes(p).toSeq))
      when(proj >= 0, shiftleft(lit(1), p)).otherwise(lit(0))
    }.reduce((a, b) => a.bitwiseOR(b))
    vecs.select(col(idCol).as("id"), v.as("v"), bucket.as("bucket"))
  }

  /** ANN top-k via sign-LSH: score only within the query's bucket.
    * Recall < 1 by construction (bucket boundaries); the scale path
    * that replaces the O(n²) scan. Output shape matches `knnExact`.
    */
  def knnLsh(vecs: DataFrame, k: Int, nPlanes: Int, dim: Int,
      queryFilter: org.apache.spark.sql.Column,
      idCol: String = "vec_id"): DataFrame = {
    val bucketed = lshBuckets(vecs, nPlanes, dim, idCol)
    val queries = bucketed.filter(queryFilter)
      .select(col("id").as("query_id"), col("v").as("qv"), col("bucket"))
    val scored = queries.join(bucketed.select(col("id").as("neighbor_id"),
        col("v").as("cv"), col("bucket")), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("sim"), 4).as("sim"))
  }
}
