package graft.schema

import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructField, StructType}

/** BACKWARD schema-compatibility gate, mirroring the reference's
  * Schema-Registry check before reuse/evolution
  * (kafka_publisher.py:113-125; BACKWARD mode per
  * s3-connector-config.json:30) and the Iceberg sink's
  * evolve-schema-enabled behavior (connector-config.json:5,23).
  *
  * A new schema is BACKWARD-compatible with the current table schema iff
  * every existing column is preserved with an identical data type;
  * new columns may be added (they read as null for old data). Type
  * changes and drops are rejected — the same failure mode as the
  * reference's `test_compatibility` raise.
  */
object SchemaCompat {

  final case class Incompatibility(field: String, reason: String)

  /** Type equality must ignore nullability flags at every nesting level:
    * a Seq-derived DataFrame marks struct fields non-nullable while the
    * declared table schema may not, and that difference is not a type
    * change.
    */
  private def normalize(dt: DataType): DataType = dt match {
    case s: StructType =>
      StructType(s.fields.map(f =>
        StructField(f.name, normalize(f.dataType), nullable = true)))
    case a: ArrayType => ArrayType(normalize(a.elementType), containsNull = true)
    case m: MapType =>
      MapType(normalize(m.keyType), normalize(m.valueType), valueContainsNull = true)
    case other => other
  }

  /** Returns the evolved (merged) schema, or the list of violations. */
  def evolve(current: StructType, incoming: StructType)
      : Either[Seq[Incompatibility], StructType] = {
    val incomingByName = incoming.fields.map(f => f.name -> f).toMap
    val violations = current.fields.flatMap { old =>
      incomingByName.get(old.name) match {
        case None =>
          Some(Incompatibility(old.name, "column dropped"))
        case Some(nw) if normalize(nw.dataType) != normalize(old.dataType) =>
          Some(Incompatibility(old.name,
            s"type changed ${old.dataType.simpleString} -> ${nw.dataType.simpleString}"))
        case _ => None
      }
    }
    if (violations.nonEmpty) Left(violations.toSeq)
    else {
      val currentNames = current.fieldNames.toSet
      val added = incoming.fields.filterNot(f => currentNames.contains(f.name))
        .map(f => StructField(f.name, f.dataType, nullable = true, f.metadata))
      Right(StructType(current.fields ++ added))
    }
  }

  def isCompatible(current: StructType, incoming: StructType): Boolean =
    evolve(current, incoming).isRight

  /** Iceberg's SAFE type-promotion set — the one evolution a long-lived
    * v2 table eventually needs (int→long, float→double, decimal
    * precision widen at the SAME scale). Deliberately NOT accepted by
    * [[evolve]]'s implicit ingest gate: promotion is an explicit DDL
    * act (`ALTER TABLE … ALTER COLUMN … TYPE …`), as in Iceberg —
    * write-side schema drift still rejects all type changes.
    */
  def safePromotion(from: DataType, to: DataType): Boolean = {
    import org.apache.spark.sql.types._
    (normalize(from), normalize(to)) match {
      case (f, t) if f == t => true
      case (IntegerType, LongType) => true
      case (FloatType, DoubleType) => true
      case (f: DecimalType, t: DecimalType) =>
        t.scale == f.scale && t.precision >= f.precision
      case _ => false
    }
  }
}
