package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: concatenate the token stream
  * in a deterministic document order and chunk it into fixed context
  * windows ("concat-and-chunk"); each document is assigned the window
  * its FIRST token lands in.
  *
  * Semantically this is a running total over a global order — but a
  * naive `Window.orderBy(id)` with no partition key is a single-task
  * sort at 100 TB. The plan here is the classic two-phase prefix sum:
  *
  *   1. bucket the order column into coarse ranges (pure expression);
  *   2. per-bucket running totals — a window PARTITIONED by bucket, so
  *      every bucket sorts independently in parallel;
  *   3. per-bucket grand totals (one tiny aggregate, nBuckets rows) get
  *      their own running offset via a window over that tiny relation,
  *      then broadcast-join back.
  *
  * Only nBuckets scalars ever pass through a single task; the row-level
  * work stays fully parallel. The DuckDB oracle states the same
  * contract with a plain `sum() OVER (ORDER BY …)` — equal results,
  * different (scale-correct) plan.
  */
object Packing {

  /** (idCol, tokCol) → one row per input doc with its `pack_id`.
    * `bucketSize` is the id-range width per prefix-sum bucket.
    */
  def packWindows(df: DataFrame, idCol: String, tokCol: String,
      ctxLen: Int, bucketSize: Long = 1000L): DataFrame = {
    val bucketed = df.select(col(idCol).as("_id"), col(tokCol).as("_tok"))
      .withColumn("_bucket", floor(col("_id") / bucketSize))
    // 2. intra-bucket running total EXCLUSIVE of the current row
    val w = Window.partitionBy("_bucket").orderBy("_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = bucketed.withColumn("_local_before",
      coalesce(sum("_tok").over(w), lit(0L)))
    // 3. bucket totals -> exclusive running offsets (tiny relation)
    val wb = Window.orderBy("_bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy("_bucket")
      .agg(sum("_tok").as("_btot"))
      .withColumn("_offset", coalesce(sum("_btot").over(wb), lit(0L)))
      .select("_bucket", "_offset")
    local.join(broadcast(offsets), Seq("_bucket"))
      .withColumn("pack_id", floor((col("_offset") + col("_local_before")) / ctxLen))
      .select(col("_id").as(idCol), col("_tok").as(tokCol), col("pack_id"))
  }

  /** Pack summary: docs and token mass per context window. */
  def packSummary(packed: DataFrame, idCol: String, tokCol: String): DataFrame =
    packed.groupBy("pack_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(tokCol).cast("long").as("total_tokens"),
        min(idCol).as("first_id"))
      .orderBy("pack_id")

  /** Sliding-window chunking — the per-DOCUMENT counterpart of
    * [[packWindows]]: each document's token sequence is cut into
    * windows of `size` tokens whose starts step by `stride`
    * (overlap = size − stride), the fine-tuning/embedding-indexing
    * shape where examples must not cross document boundaries.
    *
    * One row per chunk: (idCol, chunk_idx, start_tok, n_tok,
    * chunk_md5) — the md5 of the space-joined window, so downstream
    * (and the oracle) can verify content without carrying it. Pure
    * per-row expressions (`sequence` → `transform`/`slice` → explode):
    * no shuffle, no state; the fan-out is ≈ len/stride rows per doc,
    * each a fixed-size digest, so output bytes stay proportional to
    * input tokens regardless of overlap.
    */
  def chunk(docs: DataFrame, tokensCol: Column, size: Int, stride: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    docs
      .select(col(idCol), tokensCol.as("_toks"))
      .filter(org.apache.spark.sql.functions.size(col("_toks")) > 0)
      .select(col(idCol),
        posexplode(sequence(lit(0),
          org.apache.spark.sql.functions.size(col("_toks")) - 1,
          lit(stride))).as(Seq("chunk_idx", "start_tok")),
        col("_toks"))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        col("start_tok").cast("long").as("start_tok"),
        least(lit(size),
          org.apache.spark.sql.functions.size(col("_toks")) - col("start_tok"))
          .cast("long").as("n_tok"),
        md5(concat_ws(" ", slice(col("_toks"), col("start_tok") + 1, lit(size))))
          .as("chunk_md5"))
  }
}
