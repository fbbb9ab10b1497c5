package graft.catalog

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Iceberg-style HIDDEN partitioning (spec v1 transforms, public
  * format): the table declares `partition.spec` = one of
  *
  *   identity(col) | days(col) | months(col) | hours(col)
  *   | bucket(N, col) | truncate(N, col)
  *
  * and the catalog derives the partition value from the SOURCE column
  * at write time — queries keep filtering on the source column and
  * never see (or misuse) a derived partition column, which is the
  * point of hidden partitioning: no "forgot to also filter on the
  * date string" correctness trap, no schema pollution.
  *
  * The derived value splits appends into value-pure files
  * (`partitionBy` on a hidden column that is stripped from the file
  * contents) and is recorded per file in the manifest — so time-range
  * predicates prune via the existing min/max file stats (value-pure
  * files make those stats tight), and equality predicates on
  * bucket/identity/truncate specs prune on the recorded partition
  * value directly (where min/max of a hashed/bucketed source column
  * would be useless).
  *
  * Transform semantics follow Iceberg spec v1 where the type is known
  * ([[valueExprFor]]): numeric `truncate(W, col)` is `v - (v mod W)`
  * (floor-division bias, not string substring), and time transforms on
  * TIMESTAMP columns render the INSTANT in UTC via a runtime
  * `current_timezone()` shift — so a session with any
  * `spark.sql.session.timeZone` derives the same pval for the same
  * instant, and write-side and prune-side can never disagree across
  * sessions (round-5 ADVICE items 3/4). DATE and wall-clock STRING
  * inputs are timezone-free end-to-end already.
  */
final case class PartitionSpec(transform: String, column: String,
    n: Int = 0) {

  import org.apache.spark.sql.types._

  /** The hidden partition-value expression over the source column,
    * UNTYPED fallback (kept for callers without a schema): correct and
    * self-consistent, but see [[valueExprFor]] for the Iceberg-exact,
    * timezone-independent typed derivations.
    */
  def valueExpr: Column = valueExprFor(None)

  /** Typed partition-value expression — pass the source column's type
    * (both the write path and literal-pruning path know it).
    */
  def valueExprFor(dt: Option[DataType]): Column = {
    // render a TIMESTAMP instant in UTC regardless of the session
    // timezone: shift by the session offset (current_timezone() is
    // evaluated at RUNTIME, so the expression itself is portable)
    def timeSrc: Column = dt match {
      case Some(TimestampType) =>
        to_utc_timestamp(col(column), expr("current_timezone()"))
      case _ => col(column)
    }
    (transform, dt) match {
      case ("identity", Some(TimestampType)) =>
        date_format(timeSrc, "yyyy-MM-dd HH:mm:ss.SSSSSS")
      case ("identity", _) => col(column).cast("string")
      case ("days", _)     => date_format(timeSrc, "yyyy-MM-dd")
      case ("months", _)   => date_format(timeSrc, "yyyy-MM")
      case ("hours", _)    => date_format(timeSrc, "yyyy-MM-dd-HH")
      case ("bucket", _)   => pmod(xxhash64(col(column)), lit(n)).cast("string")
      case ("truncate", Some(ByteType | ShortType | IntegerType | LongType)) =>
        // Iceberg numeric truncate: v - (v mod W) with floor bias
        // (pmod keeps negatives in the right bin: -7, W=10 -> -10)
        (col(column) - pmod(col(column), lit(n))).cast("string")
      case ("truncate", _) => substring(col(column).cast("string"), 1, n)
    }
  }

  /** Partition value of a literal, for equality pruning — mirrors
    * [[valueExpr]] driver-side without a Spark job. For `bucket` the
    * hash must match Spark's xxhash64(seed=42), so the one-row
    * evaluation goes through the session (callers pass the result of
    * `SnapshotCatalog.pvalOfLiteral`).
    */
  def prunesEquality: Boolean =
    transform == "identity" || transform == "bucket" || transform == "truncate"
}

object PartitionSpec {

  val PropertyKey = "partition.spec"

  /** Hidden column name the write path partitions by (stripped from
    * file contents by `partitionBy`; never visible to readers).
    */
  val HiddenCol = "_graft_p"

  private val Plain = """^(identity|days|months|hours)\(\s*([A-Za-z0-9_]+)\s*\)$""".r
  private val WithN = """^(bucket|truncate)\(\s*(\d+)\s*,\s*([A-Za-z0-9_]+)\s*\)$""".r

  def parse(spec: String): PartitionSpec = spec.trim match {
    case Plain(t, c)    => PartitionSpec(t, c)
    case WithN(t, n, c) => PartitionSpec(t, c, n.toInt)
    case other => throw new IllegalArgumentException(
      s"unsupported partition spec '$other' — expected " +
        "identity|days|months|hours(col) or bucket|truncate(N, col)")
  }

  def of(properties: Map[String, String]): Option[PartitionSpec] =
    properties.get(PropertyKey).map(parse)

  /** Inverse of Spark's Hive-style partition-path escaping: ONLY
    * `%xx` sequences decode (that is all escapePathName emits) —
    * crucially NOT `+`, which URL decoding would corrupt to a space.
    */
  def unescapePathName(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 3 <= s.length) {
        val v = try Integer.parseInt(s.substring(i + 1, i + 3), 16)
          catch { case _: NumberFormatException => -1 }
        if (v >= 0) { out.append(v.toChar); i += 3 }
        else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }
}
