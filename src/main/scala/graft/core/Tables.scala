package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}

/** Loaders for the driver-provided deterministic tables (TESTDATA.md).
  * One parquet file per table under /root/testdata/sf{0.001,0.01,0.1}.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects. Read nanos as long, floor-divide to micros
      // (integer `div` — a double division would lose precision at
      // 1.7e18), and rebuild a proper TimestampType column. DuckDB
      // reads the same file as TIMESTAMP_NS, so sub-micro truncation
      // matches between engines for ms-level derivations.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register tables as temp views so `spark.sql` pass-through
    * (SURVEY.md §2 R6) sees the same relation names as the DuckDB
    * oracle. Registering a view reads the parquet footer (schema
    * inference), so callers that know their relations pass `only` to
    * avoid ~10 footer reads of fixed cost per query.
    */
  def registerAll(spark: SparkSession, dir: String,
      only: Seq[String] = names): Unit =
    only.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
