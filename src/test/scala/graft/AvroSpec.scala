package graft

import org.apache.avro.Schema
import org.apache.spark.sql.Row

import graft.ingest.PurchaseEvents
import graft.schema.AvroSerde

class AvroSpec extends SparkTestBase {

  test("StructType -> Avro schema mirrors the reference's event schema") {
    val avro = AvroSerde.toAvroSchema(PurchaseEvents.schema)
    assert(avro.getType == Schema.Type.RECORD)
    val names = avro.getFields
    assert(names.size == 7)
    assert(avro.getField("user_details").schema().getType == Schema.Type.RECORD)
    assert(avro.getField("purchase_metadata").schema().getType == Schema.Type.MAP)
    assert(avro.getField("previous_purchases").schema().getType == Schema.Type.ARRAY)
  }

  test("registry-framed round trip of the canonical self-test payload") {
    // kafka_publisher.py:152-160 fixture (C1/C4)
    val row = Row(1743171234567L, "test_user", "test", 0.0,
      Row("Test User", 30, "test@example.com"),
      Map("test" -> "value"), Seq(0.0))
    val avro = AvroSerde.toAvroSchema(PurchaseEvents.schema)
    val bytes = AvroSerde.serialize(row, PurchaseEvents.schema, avro, schemaId = 7)
    assert(bytes(0) == AvroSerde.MagicByte)
    val (id, rec) = AvroSerde.deserialize(bytes, avro)
    assert(id == 7)
    val back = AvroSerde.toRow(rec, PurchaseEvents.schema)
    assert(back == row)
  }

  test("generated events survive serde batch-wise") {
    val rows = PurchaseEvents.batch(spark, 1700000000000L, 20).collect()
    val avro = AvroSerde.toAvroSchema(PurchaseEvents.schema)
    rows.foreach { r =>
      val plain = Row(r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3),
        r.getStruct(4), r.getMap[String, String](5).toMap,
        r.getSeq[Double](6).toSeq)
      val bytes = AvroSerde.serialize(plain, PurchaseEvents.schema, avro, 1)
      val (_, rec) = AvroSerde.deserialize(bytes, avro)
      val back = AvroSerde.toRow(rec, PurchaseEvents.schema)
      assert(back.getLong(0) == r.getLong(0))
      assert(back.getString(1) == r.getString(1))
      assert(back.getAs[Seq[Double]](6) == r.getSeq[Double](6).toSeq)
    }
  }
}
