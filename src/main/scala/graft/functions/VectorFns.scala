package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<double>` columns, built from Spark's
  * codegen'd higher-order functions (`zip_with`/`aggregate`) — no UDFs,
  * so the expressions stay inside WholeStageCodegen and are usable on a
  * 1000-executor cluster without serialization overhead.
  *
  * Accumulation is a sequential left fold over elements, matching the
  * element order DuckDB's list functions use, which keeps cosine scores
  * bit-comparable across engines (differences ≪ the ~2e-5 rank gaps in
  * the embeddings test data).
  */
object VectorFns {

  /** Cast a float embedding column to array<double> for stable math. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column =
    aggregate(a, lit(0.0), (acc, v) => acc + v * v)

  def norm(a: Column): Column = sqrt(norm2(a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
