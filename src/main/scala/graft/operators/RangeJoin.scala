package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join: match each point row to every
  * interval row with `start <= point <= end`.
  *
  * Spark executes a raw non-equi join like
  * `points JOIN intervals ON p BETWEEN start AND end` as a broadcast
  * nested loop — O(|points| x |intervals|) comparisons, a scale-killer
  * the moment the interval side outgrows a broadcast. This operator
  * restores an equi-join shape by bucketing the domain
  * (builder preference (a): composition over a custom physical op):
  *
  *  - every interval is exploded to the bucket ids its span covers
  *    (`sequence(floor(start/w), floor(end/w))`);
  *  - every point maps to exactly ONE bucket id (`floor(p/w)`);
  *  - the join is an equi-join on bucket id + a residual BETWEEN
  *    filter, so Catalyst plans a shuffled hash / sort-merge join that
  *    partitions on the bucket key and scales horizontally.
  *
  * Each (interval, point) pair meets in exactly one bucket (the
  * point's), so no post-join dedup is needed. Cost: one shuffle per
  * side + interval fan-out of `ceil(span/w)+1` rows; pick
  * `bucketWidth` on the order of the typical interval span so the
  * fan-out stays ~2x. Skewed buckets (a hot time range) can be salted
  * with [[Skew]] on top — the bucket key is an ordinary join key.
  */
object RangeJoin {

  /** Derive `bucketWidth` from the data instead of a hand-picked conf.
    *
    * Cost model (uniform approximation; P points, I intervals, domain
    * extent D, mean span s̄): matching pairs meet in exactly one bucket,
    * so TRUE candidates ≈ P·I·s̄/D are width-invariant; the width only
    * trades the two overheads
    *
    *  - interval fan-out rows:   I·(s̄/w + 1)   (shrinks as w grows)
    *  - false candidates:        ≈ P·I·w/D      (grows as w grows —
    *    pairs sharing a bucket that fail the residual BETWEEN)
    *
    * The sum is minimized at w* = sqrt(s̄·D/P): width shrinks as the
    * point side grows, which is exactly what bounds per-bucket pair
    * density at scale (a FIXED width's false-candidate volume grows
    * linearly with P — the q25 sf1 finding). Clamped to
    * [1, max(1, 4·s̄)] so degenerate stats (empty/point intervals, tiny
    * point sides) keep fan-out bounded and bucket counts sane. Results
    * are width-invariant by construction (the residual filter keeps
    * exact semantics — RangeJoinRuleSpec pins it), so auto-tuning can
    * never change answers, only the fan-out/density trade.
    *
    * Cost: one map-side-combined aggregate over the interval side
    * (avg span, min/max bounds) + a count of the point side — both
    * O(scan) passes over inputs the join reads anyway, and the
    * interval side is the small one by assumption.
    */
  def autoBucketWidth(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String): Long = {
    val row = intervals.agg(
      avg(col(endCol).cast("double") - col(startCol).cast("double")),
      min(col(startCol).cast("double")),
      max(col(endCol).cast("double"))).head()
    if (row.isNullAt(0)) 1L // no intervals: any width joins nothing
    else {
      val meanSpan = math.max(0.0, row.getDouble(0))
      val domain = math.max(1.0, row.getDouble(2) - row.getDouble(1))
      val p = math.max(1L, points.select(col(pointCol)).count())
      widthFrom(meanSpan, domain, p)
    }
  }

  /** w* = clamp(sqrt(s̄·D/P), 1, 4·s̄) — see [[autoBucketWidth]]. */
  private[graft] def widthFrom(meanSpan: Double, domain: Double,
      points: Long): Long = {
    val ideal = math.sqrt(meanSpan * domain / points.toDouble)
    val cap = math.max(1.0, 4.0 * meanSpan)
    math.max(1L, math.min(cap, ideal).round)
  }

  /** [[pointInInterval]] with the width derived by [[autoBucketWidth]]. */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String): DataFrame =
    pointInInterval(points, pointCol, intervals, startCol, endCol,
      autoBucketWidth(points, pointCol, intervals, startCol, endCol))

  /** @param points      side with one numeric value per row
    * @param pointCol    LONG-castable column in `points`
    * @param intervals   side with [startCol, endCol] (inclusive both
    *                    ends), startCol <= endCol
    * @param bucketWidth domain bucket size (same unit as pointCol)
    * @return points x matching intervals, all columns from both sides
    *         (inner join; column names must not collide)
    */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucketOf(c: Column): Column = floor(c.cast("long") / bucketWidth)
    val iv = intervals.withColumn("_rj_bucket",
      explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    val pt = points.withColumn("_rj_bucket", bucketOf(col(pointCol)))
    pt.join(iv, Seq("_rj_bucket"))
      .filter(col(pointCol).between(col(startCol), col(endCol)))
      .drop("_rj_bucket")
  }

  /** [[intervalOverlap]] with the width derived from BOTH sides' span
    * stats: the point-side count in [[widthFrom]]'s cost model becomes
    * the larger side's row count and s̄ the mean of the two mean spans
    * (each side plays "points" for the other; the symmetric analogue
    * of the one-sided derivation). Results are width-invariant, as for
    * [[pointInInterval]].
    */
  def intervalOverlap(
      left: DataFrame,
      lStart: String,
      lEnd: String,
      right: DataFrame,
      rStart: String,
      rEnd: String): DataFrame = {
    def stats(df: DataFrame, s: String, e: String) = df.agg(
      avg(col(e).cast("double") - col(s).cast("double")),
      min(col(s).cast("double")), max(col(e).cast("double")),
      count(lit(1))).head()
    val l = stats(left, lStart, lEnd)
    val r = stats(right, rStart, rEnd)
    val width =
      if (l.isNullAt(0) || r.isNullAt(0)) 1L
      else {
        val meanSpan =
          (math.max(0.0, l.getDouble(0)) + math.max(0.0, r.getDouble(0))) / 2
        val domain = math.max(1.0,
          math.max(l.getDouble(2), r.getDouble(2)) -
            math.min(l.getDouble(1), r.getDouble(1)))
        widthFrom(meanSpan, domain, math.max(1L, math.max(l.getLong(3), r.getLong(3))))
      }
    intervalOverlap(left, lStart, lEnd, right, rStart, rEnd, width)
  }

  /** Interval-overlap join: pairs (a, b) whose [start, end] spans
    * intersect. Same bucketing trick, both sides exploded; a pair can
    * meet in several buckets, so the canonical meeting bucket —
    * the bucket of `max(a.start, b.start)`, which both sides cover —
    * is the only one kept (no distinct() needed, no dup shuffle).
    */
  def intervalOverlap(
      left: DataFrame,
      lStart: String,
      lEnd: String,
      right: DataFrame,
      rStart: String,
      rEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucketOf(c: Column): Column = floor(c.cast("long") / bucketWidth)
    def exploded(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("_rj_bucket",
        explode(sequence(bucketOf(col(s)), bucketOf(col(e)))))
    exploded(left, lStart, lEnd)
      .join(exploded(right, rStart, rEnd), Seq("_rj_bucket"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("_rj_bucket") === floor(
          greatest(col(lStart), col(rStart)).cast("long") / bucketWidth))
      .drop("_rj_bucket")
  }
}
