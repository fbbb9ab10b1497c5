package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materializes a 10× replica of an SF directory (default sf0.1 →
  * /tmp/graft_sf1) for the full-suite scale smoke: every query from
  * SparkEntry then runs at both scales via Bench and the per-query
  * ratios land in SCALING.md.
  *
  * Replication preserves the WORKLOAD SHAPE, not bit-identity:
  *  - fact/dimension keys offset by 10⁹ per replica so referential
  *    integrity holds (orders→customer, lineitem→orders/part/supplier)
  *    and key cardinalities scale with the data;
  *  - region/nation stay fixed (they're SF-independent in TPC-H);
  *  - document text gets a per-replica token prefix (ScaleSmoke's
  *    trick) so each replica keeps the corpus's own near-dup
  *    structure instead of every doc becoming a 10-way duplicate —
  *    posting-list/candidate costs then scale like real corpus
  *    growth, not like an adversarial all-dup workload;
  *  - embeddings get a deterministic per-replica dim scaling (unit
  *    normalization absorbs global scale; replicas land in distinct
  *    cosine neighborhoods);
  *  - events keep their time range (10× rows per window — growth in
  *    DATA not TIME) with user ids offset per replica so per-user
  *    session state stays bounded;
  *  - events.ts is written as raw int64 nanos so core.Tables.load's
  *    nanos branch keeps working on the replica dir.
  *
  * Run: sbt "runMain graft.tools.ScaleUp [srcDir dstDir factor]"
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/graft_sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = graft.core.GraftSession.builder("local[16]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val K = 1000000000L
    def rep(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => f(df, i)).reduce(_ unionByName _)
    def offset(df: DataFrame, keys: String*): DataFrame =
      rep(df) { (d, i) =>
        keys.foldLeft(d)((acc, k) => acc.withColumn(k, col(k) + lit(i * K)))
      }

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name done")
    }

    for (t <- Seq("region", "nation"))
      write(t, spark.read.parquet(s"$src/$t.parquet"))

    write("customer", offset(spark.read.parquet(s"$src/customer.parquet"),
      "c_custkey"))
    write("supplier", offset(spark.read.parquet(s"$src/supplier.parquet"),
      "s_suppkey"))
    write("part", offset(spark.read.parquet(s"$src/part.parquet"),
      "p_partkey"))
    write("orders", offset(spark.read.parquet(s"$src/orders.parquet"),
      "o_orderkey", "o_custkey"))
    write("lineitem", offset(spark.read.parquet(s"$src/lineitem.parquet"),
      "l_orderkey", "l_partkey", "l_suppkey"))

    val ev = graft.core.Tables.load(spark, src, "events")
      .withColumn("ts", unix_micros(col("ts")) * 1000L) // back to int64 nanos
    write("events", rep(ev) { (d, i) =>
      d.withColumn("event_id", col("event_id") + lit(i * K))
        .withColumn("user_id", col("user_id") + lit(i * K))
    })

    val docs = spark.read.parquet(s"$src/documents.parquet")
    write("documents", rep(docs) { (d, i) =>
      if (i == 0) d
      else d.withColumn("doc_id", col("doc_id") + lit(i * K))
        .withColumn("text", concat_ws(" ",
          transform(split(col("text"), " "), t => concat(lit(s"r${i}x"), t))))
    })

    // replicas get a CIRCULAR DIMENSION SHIFT (norm-preserving, and
    // decorrelates against all other replicas' vectors) — a first cut
    // that merely rescaled dims kept cross-replica cosines ≥ 0.9, so
    // the true near-dup answer grew 190× for 10× vectors and the e05
    // smoke measured workload blowup, not engine scaling (ScaleProbe)
    val embs = spark.read.parquet(s"$src/embeddings.parquet")
    val dim = embs.select(size(col("embedding"))).head.getInt(0)
    write("embeddings", rep(embs) { (d, i) =>
      if (i == 0) d
      else d.withColumn("vec_id", col("vec_id") + lit(i * K))
        .withColumn("embedding", transform(col("embedding"),
          (_, j) => element_at(col("embedding"), ((j + lit(i)) % dim) + 1)))
    })

    spark.stop()
  }
}
