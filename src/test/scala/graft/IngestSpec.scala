package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ingest.PurchaseEvents

class IngestSpec extends SparkTestBase {

  test("generator reproduces the reference's literal derivations (G1-G8)") {
    // ts chosen so every modular derivation is easy to hand-check:
    // kafka_publisher.py:303-330 semantics.
    val ts = 1743171234567L
    val row = PurchaseEvents.batch(spark, startMs = ts, count = 1).head()
    assert(row.getAs[Long]("timestamp") == ts)
    val userNum = ts % 1000 // 567
    assert(row.getAs[String]("user_id") == s"user_$userNum")
    assert(row.getAs[String]("action") == "purchase")
    // amount = (ms div 10) % 1000 / 100
    assert(row.getAs[Double]("amount") == ((ts / 10) % 1000) / 100.0)
    val details = row.getAs[Row]("user_details")
    assert(details.getAs[String]("name") == s"User Name $userNum")
    assert(details.getAs[Int]("age") == (userNum % 50 + 18))
    assert(details.getAs[String]("email") == s"user$userNum@example.com")
    assert(row.getAs[Map[String, String]]("purchase_metadata") == Map(
      "device" -> "mobile", "location" -> "online",
      "payment_method" -> "credit_card", "category" -> "electronics"))
    // previous_purchases: the reference multiplies the MS timestamp by
    // 100 (kafka_publisher.py:324-327) — faithful quirk reproduction.
    val expectedPrev = (0 until 3).map(i => ((ts - i * 1000L) * 100L % 1000L) / 100.0)
    assert(row.getAs[scala.collection.Seq[Double]]("previous_purchases").toSeq
      == expectedPrev)
  }

  test("generated invariants hold across a batch (FIXTURES.md)") {
    val df = PurchaseEvents.batch(spark, startMs = 1700000000000L, count = 200)
    assert(df.count() == 200)
    val bad = df.filter(
      col("amount") < 0 || col("amount") > 9.99 ||
      col("user_details.age") < 18 || col("user_details.age") > 67 ||
      size(col("previous_purchases")) =!= 3 ||
      !col("user_id").startsWith("user_"))
    assert(bad.count() == 0)
    // 5 s cadence (G9): consecutive timestamps differ by stepMs
    val ts = df.select("timestamp").orderBy("timestamp")
      .collect().map(_.getLong(0))
    assert(ts.sliding(2).forall(p => p(1) - p(0) == 5000L))
  }

  test("schema matches the declared Avro-mirror StructType") {
    val df = PurchaseEvents.batch(spark, 1700000000000L, 1)
    // nullability is writer-dependent; names + types are the contract
    assert(graft.schema.SchemaCompat.isCompatible(PurchaseEvents.schema, df.schema))
    assert(graft.schema.SchemaCompat.isCompatible(df.schema, PurchaseEvents.schema))
    assert(df.schema.fieldNames.toSeq == PurchaseEvents.schema.fieldNames.toSeq)
  }

  // ------------------------------------------------- Kafka seam (S4)

  test("kafka frame decode round-trips registry-framed Avro values") {
    import graft.ingest.KafkaStreamSource
    import graft.schema.AvroSerde
    val events = PurchaseEvents.batch(spark, startMs = 1743171234567L,
      count = 25)
    val avro = AvroSerde.toAvroSchema(PurchaseEvents.schema)
    // what the topic would carry: one framed Avro value per event
    val framed = events.collect().toSeq.map(r =>
      AvroSerde.serialize(r, PurchaseEvents.schema, avro, schemaId = 7))
    import spark.implicits._
    val raw = framed.toDF("value")
    val decoded = KafkaStreamSource.decodeValues(raw, PurchaseEvents.schema)
    assert(decoded.schema.fieldNames.toSeq ==
      PurchaseEvents.schema.fieldNames.toSeq)
    val back = decoded.orderBy("timestamp").collect()
    val orig = events.orderBy("timestamp").collect()
    assert(back.length == orig.length)
    back.zip(orig).foreach { case (b, o) =>
      assert(b.getAs[Long]("timestamp") == o.getAs[Long]("timestamp"))
      assert(b.getAs[String]("user_id") == o.getAs[String]("user_id"))
      assert(b.getAs[Double]("amount") == o.getAs[Double]("amount"))
      assert(b.getAs[Row]("user_details") == o.getAs[Row]("user_details"))
      assert(b.getAs[Map[String, String]]("purchase_metadata") ==
        o.getAs[Map[String, String]]("purchase_metadata"))
      assert(b.getAs[scala.collection.Seq[Double]]("previous_purchases") ==
        o.getAs[scala.collection.Seq[Double]]("previous_purchases"))
    }
  }

  test("stream source config degrades gracefully without the kafka jar") {
    import graft.ingest.{EmulatedSource, KafkaStreamSource, StreamSources}
    // this sandbox has no spark-sql-kafka connector
    assert(!StreamSources.kafkaAvailable)
    // kafka requested but jar absent → emulated fallback binds
    val fallback = StreamSources.forConfig(Map(
      "kafka.bootstrap.servers" -> "${KAFKA_BROKERS}",
      "topics" -> "purchase-events",
      "emulated.rows-per-batch" -> "3"),
      env = Map("KAFKA_BROKERS" -> "broker:9092"))
    assert(fallback.isInstanceOf[EmulatedSource])
    // unless the deployment declares kafka REQUIRED → loud error
    val err = intercept[IllegalStateException] {
      StreamSources.forConfig(Map(
        "kafka.bootstrap.servers" -> "broker:9092",
        "kafka.required" -> "true"))
    }
    assert(err.getMessage.contains("spark-sql-kafka"))
    // direct construction compiles + fails only at stream() with a
    // clear message (not a mid-query ClassNotFoundException)
    val ks = new KafkaStreamSource("broker:9092", "purchase-events")
    val e2 = intercept[IllegalArgumentException] { ks.stream(spark) }
    assert(e2.getMessage.contains("spark-sql-kafka"))
    // no kafka keys at all → emulated with defaults
    assert(StreamSources.forConfig(Map.empty)
      .isInstanceOf[EmulatedSource])
  }

  test("emulated source streams the same derivation as the batch path") {
    import graft.ingest.EmulatedSource
    val src = new EmulatedSource(rowsPerBatch = 2, startMs = 1700000000000L)
    val q = src.stream(spark).writeStream
      .format("memory").queryName("seam_emulated")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.table("seam_emulated").orderBy("timestamp")
    assert(got.schema.fieldNames.toSeq ==
      PurchaseEvents.schema.fieldNames.toSeq)
    assert(got.count() >= 2)
    val ts0 = got.select("timestamp").head.getLong(0)
    val expect = PurchaseEvents.batch(spark, ts0, 1).head
    assert(got.head == expect)
  }
}
