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
  */
final case class PartitionSpec(transform: String, column: String,
    n: Int = 0) {

  /** The hidden partition-value expression over the source column. */
  def valueExpr: Column = transform match {
    case "identity" => col(column).cast("string")
    case "days"     => date_format(col(column), "yyyy-MM-dd")
    case "months"   => date_format(col(column), "yyyy-MM")
    case "hours"    => date_format(col(column), "yyyy-MM-dd-HH")
    case "bucket"   => pmod(xxhash64(col(column)), lit(n)).cast("string")
    case "truncate" => substring(col(column).cast("string"), 1, n)
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
