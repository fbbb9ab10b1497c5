package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY §2.5 "UDF/UDAF/UDTF — reserved for
  * extensions"): a mergeable weighted mean as an
  * `Aggregator[IN, BUF, OUT]`. The buffer is associative/commutative,
  * so Spark plans partial (map-side) + final merge like any built-in —
  * the correct template for custom aggregation at cluster scale (vs a
  * non-mergeable collect-then-compute).
  */
object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {

  /** (Σ w·x, Σ w) */
  override def zero: (Double, Double) = (0.0, 0.0)

  override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
    (b._1 + in._1 * in._2, b._2 + in._2)

  override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(r: (Double, Double)): Double =
    if (r._2 == 0.0) Double.NaN else r._1 / r._2

  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
