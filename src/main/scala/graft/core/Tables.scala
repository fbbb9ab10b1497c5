package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided deterministic tables (TESTDATA.md).
  * One parquet file per table under /root/testdata/sf{0.001,0.01,0.1}.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts has shipped as two different physical types across
      // testdata generations: parquet TIMESTAMP(NANOS) (which Spark's
      // vectorized reader rejects — read nanos as long and rebuild),
      // and plain timestamp[us] with isAdjustedToUTC=false (which
      // Spark reads as TIMESTAMP_NTZ). Adapt on the footer schema so
      // either generation loads as a session-TZ TimestampType column
      // with identical wall-clock values (session TZ is pinned UTC,
      // so the NTZ→TZ cast is value-preserving). Reading the nanos
      // generation requires spark.sql.legacy.parquet.nanosAsLong=true,
      // set at session construction (GraftSession.builder and the
      // entry-point mains) — NOT here: a conf.set inside a load path
      // would mutate the shared session mid-flight for concurrent
      // readers.
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case LongType =>
          // nanos epoch as long; integer `div` (not double division,
          // which loses precision at 1.7e18) floors to micros.
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType =>
          df.withColumn("ts", col("ts").cast(TimestampType))
        case _ => df // already TimestampType
      }
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
