package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's one first-class record type and its generator
  * arithmetic (SURVEY §1.1/§2.3; kafka_publisher.py:28-84,303-330).
  */
object PurchaseEvents {

  /** Typed model: nested struct, map, array — Avro schema equivalent. */
  final case class UserDetails(name: String, age: Int, email: String)
  final case class PurchaseEvent(
      timestamp: Long,
      user_id: String,
      action: String,
      amount: Double,
      user_details: UserDetails,
      purchase_metadata: Map[String, String],
      previous_purchases: Seq[Double])

  /** StructType mirror of the Avro schema (all fields required —
    * kafka_publisher.py:28-84 declares no unions). FIXTURES.md §1.
    */
  val schema: StructType = StructType(Seq(
    StructField("timestamp", LongType, nullable = false),
    StructField("user_id", StringType, nullable = false),
    StructField("action", StringType, nullable = false),
    StructField("amount", DoubleType, nullable = false),
    StructField("user_details", StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("age", IntegerType, nullable = false),
      StructField("email", StringType, nullable = false))), nullable = false),
    StructField("purchase_metadata",
      MapType(StringType, StringType), nullable = false),
    StructField("previous_purchases",
      ArrayType(DoubleType), nullable = false)))

  /** amount formula: float(int(t_seconds*100) % 1000) / 100
    * (kafka_publisher.py:306) — t*100 == ms div 10 for positive epochs.
    */
  private def amountOfMs(tsMs: Column): Column =
    pmod((tsMs / lit(10L)).cast("long"), lit(1000L)) / 100.0

  /** previous_purchases formula — NOTE the reference's own scale quirk:
    * it multiplies the *millisecond* timestamp by 100
    * (kafka_publisher.py:324-327), unlike `amount` which uses seconds.
    * Reproduced faithfully.
    */
  private def prevPurchases(tsMs: Column): Column =
    transform(sequence(lit(0), lit(2)),
      i => pmod((tsMs - i.cast("long") * 1000L) * 100L, lit(1000L)) / 100.0)

  /** G1-G8: derive the full event from an epoch-millis column.
    * Deterministic — tests pass literal timestamps; streaming passes the
    * source's clock (SURVEY §5 "wall-clock generation must be
    * injectable").
    */
  def fromTimestampMs(df: DataFrame, tsCol: String): DataFrame = {
    val ts = col(tsCol).cast("long")
    val userNum = pmod(ts, lit(1000L))                                   // G2
    df.select(
      ts.as("timestamp"),                                                // G1
      concat(lit("user_"), userNum.cast("string")).as("user_id"),        // G4
      lit("purchase").as("action"),
      amountOfMs(ts).as("amount"),                                       // G3
      struct(                                                            // G6
        concat(lit("User Name "), userNum.cast("string")).as("name"),
        (pmod(userNum, lit(50L)) + 18L).cast("int").as("age"),           // G5
        concat(lit("user"), userNum.cast("string"), lit("@example.com"))
          .as("email")).as("user_details"),
      map(                                                               // G7
        lit("device"), lit("mobile"),
        lit("location"), lit("online"),
        lit("payment_method"), lit("credit_card"),
        lit("category"), lit("electronics")).as("purchase_metadata"),
      prevPurchases(ts).as("previous_purchases"))                        // G8
  }

  /** Live stream of generated events at the reference's cadence (G9:
    * one event per 5 s loop, kafka_publisher.py:350,376): the
    * rate-micro-batch source emits `rowsPerBatch` rows per trigger with
    * event time advancing 5000 ms per batch, and the same derivation
    * expressions as the batch path produce the events. `startMs`
    * makes the stream fully deterministic for tests.
    */
  def stream(spark: org.apache.spark.sql.SparkSession,
      rowsPerBatch: Int = 1, startMs: Long = 0L): DataFrame = {
    val rate = spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch.toString)
      .option("advanceMillisPerBatch", "5000")
      .option("startTimestamp", startMs.toString)
      .load()
      .select(unix_millis(col("timestamp")).as("ts_ms"))
    fromTimestampMs(rate, "ts_ms")
  }

  /** Deterministic batch of events: one per `stepMs` starting at
    * `startMs` — the batch analogue of the 5 s producer loop (G9,
    * kafka_publisher.py:350,376).
    */
  def batch(spark: org.apache.spark.sql.SparkSession, startMs: Long,
      count: Int, stepMs: Long = 5000L): DataFrame = {
    val base = spark.range(count.toLong)
      .select((lit(startMs) + col("id") * stepMs).as("ts_ms"))
    fromTimestampMs(base, "ts_ms")
  }
}
