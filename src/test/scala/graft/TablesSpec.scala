package graft

import org.apache.spark.sql.types._

import graft.core.Tables

/** Schema contract for the driver-provided testdata (TESTDATA.md).
  *
  * The driver regenerates /root/testdata between rounds and has
  * changed physical types before (round 6: events.ts went from INT64
  * nanos to parquet timestamp[us], silently breaking 17 queries at
  * load). This spec pins the LOGICAL schema each table must present
  * AFTER Tables.load's adaptation, so the next drift produces one red
  * test naming the drifted column instead of opaque downstream
  * failures.
  */
class TablesSpec extends SparkTestBase {

  // Logical (post-load) contract. events.ts must be session-TZ
  // TimestampType regardless of the physical generation on disk.
  private val contract: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
  )

  private def checkDir(dir: String): Unit =
    for (name <- Tables.names) {
      val got = Tables.load(spark, dir, name).schema
        .map(f => f.name -> f.dataType)
      val want = contract(name)
      // Diff by NAME first (a column inserted mid-schema must report as
      // one extra column, not cascade "every later column drifted"),
      // then check order separately.
      val gotM = got.toMap
      val wantM = want.toMap
      val missing = want.collect { case (n, t) if !gotM.contains(n) =>
        s"missing column ($n,$t)" }
      val extra = got.collect { case (n, t) if !wantM.contains(n) =>
        s"extra column ($n,$t)" }
      val retyped = want.collect {
        case (n, t) if gotM.contains(n) && gotM(n) != t =>
          s"column $n: want $t got ${gotM(n)}" }
      val reordered =
        if (missing.isEmpty && extra.isEmpty &&
          want.map(_._1) != got.map(_._1))
          Seq(s"column order changed: want ${want.map(_._1).mkString(",")} " +
            s"got ${got.map(_._1).mkString(",")}")
        else Nil
      val drift = missing ++ extra ++ retyped ++ reordered
      assert(drift.isEmpty,
        s"\nTESTDATA DRIFT in $dir/$name.parquet — the driver likely " +
          s"regenerated /root/testdata with new physical types. Drifted " +
          s"columns: ${drift.mkString("; ")}. Adapt core/Tables.load " +
          s"(and re-check DuckDB oracle parity for consumers of the " +
          s"drifted columns) before trusting any other failure.")
    }

  test("sf0.001 tables match the post-load schema contract") {
    checkDir("/root/testdata/sf0.001")
  }

  test("sf0.01 tables match the post-load schema contract") {
    checkDir("/root/testdata/sf0.01")
  }

  test("sf0.1 tables match the post-load schema contract") {
    checkDir("/root/testdata/sf0.1") // the bench dir — footer reads only
  }

  test("events.ts is non-null and in a plausible epoch range") {
    import org.apache.spark.sql.functions._
    val row = Tables.load(spark, sf0001, "events")
      .agg(count(lit(1)).as("n"),
        sum(col("ts").isNull.cast("long")).as("nulls"),
        min(year(col("ts"))).as("ymin"), max(year(col("ts"))).as("ymax"))
      .head()
    assert(row.getAs[Long]("n") > 0)
    assert(row.getAs[Long]("nulls") == 0L)
    val (ymin, ymax) = (row.getAs[Int]("ymin"), row.getAs[Int]("ymax"))
    assert(ymin >= 1990 && ymax <= 2100,
      s"events.ts outside plausible epoch range: years [$ymin, $ymax] — " +
        "a unit mix-up (ns vs us vs ms) in the loader shim would land here")
  }
}
