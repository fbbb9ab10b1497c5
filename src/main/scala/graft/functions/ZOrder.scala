package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve values for multi-dimensional data clustering.
  *
  * Sorting a table by one column gives perfect file-level min/max
  * pruning on that column and none on any other. Sorting by the
  * interleaved bits of k columns gives useful pruning on ALL k — each
  * file covers a small hyper-rectangle of the key space — which is the
  * standard lakehouse layout trick for multi-predicate scans over
  * 100 TB (see Delta/Iceberg `OPTIMIZE ... ZORDER BY`).
  *
  * Everything here is pure column expressions (shifts/masks —
  * whole-stage-codegen friendly); the only driver-side work in
  * [[scaled]] is a 2k-scalar min/max aggregate to normalize each
  * dimension, the same footprint as any stats collection.
  */
object ZOrder {

  /** Interleave the low `bits` bits of the given non-negative LONG
    * columns: result bit `i*k + j` is bit `i` of column `j`. Inputs
    * must already lie in `[0, 2^bits)`; total bits `k*bits` must fit
    * a long.
    */
  def interleave(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "need at least one column")
    require(bits > 0 && bits * cols.size <= 63,
      s"k*bits must fit in a long, got ${cols.size}x$bits")
    val terms = for {
      (c, j) <- cols.zipWithIndex
      b <- 0 until bits
    } yield shiftright(c, b).bitwiseAND(lit(1L)) * lit(1L << (b * cols.size + j))
    terms.reduce(_ + _)
  }

  /** Z-value over arbitrary numeric columns: min/max-scale each to
    * `[0, 2^bits)` (bounds from one scalar aggregate over `df`), then
    * interleave. Constant columns collapse to 0 harmlessly. Callers
    * that already KNOW the bounds (manifest stats, a checkpointed
    * batch) should use [[scaledWithBounds]] — this overload costs one
    * extra execution of `df`'s plan.
    */
  def scaled(df: DataFrame, colNames: Seq[String], bits: Int = 16): Column = {
    val aggs = colNames.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val bounds = df.agg(aggs.head, aggs.tail: _*).head()
    // null bounds (empty frame / all-null column) collapse the
    // dimension to 0 instead of NPEing — an empty batch must write,
    // not crash, on the write.order append path
    val lohi = colNames.indices.map { i =>
      (if (bounds.isNullAt(2 * i)) 0.0 else bounds.getDouble(2 * i),
        if (bounds.isNullAt(2 * i + 1)) 0.0 else bounds.getDouble(2 * i + 1))
    }
    scaledWithBounds(colNames.zip(lohi), bits)
  }

  /** [[scaled]] with caller-supplied per-column (lo, hi) bounds — the
    * zero-extra-pass path (compaction derives bounds from manifest
    * min/max stats; the append path from its checkpointed batch).
    */
  def scaledWithBounds(cols: Seq[(String, (Double, Double))],
      bits: Int = 16): Column = {
    val maxV = (1L << bits) - 1
    val dims = cols.map { case (c, (lo, hi)) =>
      if (hi <= lo) lit(0L)
      else least(greatest(
        floor((col(c).cast("double") - lit(lo)) / lit(hi - lo) * maxV)
          .cast("long"), lit(0L)), lit(maxV))
    }
    interleave(dims, bits)
  }

  /** Reference implementation for tests: interleave two scalars. */
  private[graft] def interleaveRef(x: Long, y: Long, bits: Int): Long = {
    var out = 0L
    for (b <- 0 until bits) {
      out |= ((x >> b) & 1L) << (2 * b)
      out |= ((y >> b) & 1L) << (2 * b + 1)
    }
    out
  }
}
