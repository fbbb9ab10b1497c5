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
}
