package graft.schema

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Registry-framed Avro serde (SURVEY §2.4 C1; kafka_publisher.py:
  * 144-148,359-362) on the plain `avro-1.12.1` jars that ship with
  * Spark (no spark-avro / no Confluent client in this offline env —
  * SURVEY §7.3 documents this as the swap-in point).
  *
  * Framing matches the Schema-Registry wire format: magic byte 0x0,
  * 4-byte big-endian schema id, then Avro binary.
  *
  * Schema conversion covers the reference event's type surface
  * (primitives, non-null struct/map/array — the Avro schema declares no
  * unions, kafka_publisher.py:28-84); nullable fields map to
  * `[null, T]` unions for generality.
  */
object AvroSerde {

  val MagicByte: Byte = 0x0

  // ---------------------------------------------------- schema mapping

  def toAvroSchema(st: StructType, recordName: String = "PurchaseEvent",
      namespace: String = "graft"): Schema = {
    val fields = st.fields.map { f =>
      val base = toAvroType(f.dataType, s"${recordName}_${f.name}", namespace)
      val t = if (f.nullable) Schema.createUnion(
        java.util.List.of(Schema.create(Schema.Type.NULL), base)) else base
      new Schema.Field(f.name, t, null, null)
    }
    Schema.createRecord(recordName, null, namespace, false, fields.toList.asJava)
  }

  private def toAvroType(dt: DataType, name: String, ns: String): Schema = dt match {
    case LongType => Schema.create(Schema.Type.LONG)
    case IntegerType => Schema.create(Schema.Type.INT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case s: StructType => toAvroSchema(s, name, ns)
    case ArrayType(et, _) => Schema.createArray(toAvroType(et, name + "_item", ns))
    case MapType(StringType, vt, _) => Schema.createMap(toAvroType(vt, name + "_value", ns))
    case other =>
      throw new IllegalArgumentException(s"unsupported type for Avro: $other")
  }

  // ------------------------------------------------------- serialize

  def serialize(row: Row, schema: StructType, avro: Schema, schemaId: Int): Array[Byte] = {
    val record = toRecord(row, schema, avro)
    val out = new ByteArrayOutputStream()
    out.write(MagicByte.toInt)
    out.write(ByteBuffer.allocate(4).putInt(schemaId).array())
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](avro).write(record, enc)
    enc.flush()
    out.toByteArray
  }

  def deserialize(bytes: Array[Byte], avro: Schema): (Int, GenericRecord) = {
    require(bytes(0) == MagicByte, "missing registry magic byte")
    val schemaId = ByteBuffer.wrap(bytes, 1, 4).getInt
    val dec = DecoderFactory.get().binaryDecoder(bytes, 5, bytes.length - 5, null)
    val rec = new GenericDatumReader[GenericRecord](avro).read(null, dec)
    (schemaId, rec)
  }

  private def nonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  private[graft] def toRecord(row: Row, st: StructType, avro: Schema): GenericRecord = {
    val rec = new GenericData.Record(nonNull(avro))
    st.fields.zipWithIndex.foreach { case (f, i) =>
      rec.put(f.name, toAvroValue(row.get(i), f.dataType,
        nonNull(nonNull(avro).getField(f.name).schema())))
    }
    rec
  }

  private def toAvroValue(v: Any, dt: DataType, avro: Schema): Any = (v, dt) match {
    case (null, _) => null
    case (r: Row, s: StructType) => toRecord(r, s, avro)
    case (xs: scala.collection.Seq[_], ArrayType(et, _)) =>
      xs.map(toAvroValue(_, et, nonNull(avro.getElementType))).asJava
    case (m: scala.collection.Map[_, _], MapType(_, vt, _)) =>
      m.map { case (k, x) =>
        k.toString -> toAvroValue(x, vt, nonNull(avro.getValueType))
      }.toMap.asJava
    case (x, _) => x
  }

  // --------------------------------------------------------- decode

  /** GenericRecord → Row in the given StructType's field order. */
  def toRow(rec: GenericRecord, st: StructType): Row =
    Row.fromSeq(st.fields.toSeq.map(f => fromAvroValue(rec.get(f.name), f.dataType)))

  private def fromAvroValue(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (r: GenericRecord, s: StructType) => toRow(r, s)
    case (xs: java.util.Collection[_], ArrayType(et, _)) =>
      xs.asScala.toSeq.map(fromAvroValue(_, et))
    case (m: java.util.Map[_, _], MapType(_, vt, _)) =>
      m.asScala.map { case (k, x) => k.toString -> fromAvroValue(x, vt) }.toMap
    case (s: CharSequence, StringType) => s.toString
    case (x, _) => x
  }
}
