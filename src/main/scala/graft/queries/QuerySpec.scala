package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable engine capability: a Spark query plus (when the
  * semantics are SQL-expressible) an equivalent DuckDB oracle query.
  * Column names/order must match between the two — the driver compares
  * column-sorted value hashes (builder prompt).
  *
  * Parity rules used throughout (Spark ↔ DuckDB):
  *  - every floating-point output is `round(…, k)` in BOTH engines, so
  *    summation-order differences can't break the hash;
  *  - every query has a total deterministic ORDER BY in BOTH engines;
  *  - timestamps are rendered via `date_format`/`strftime` to strings,
  *    never emitted raw.
  */
final case class QuerySpec(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])
