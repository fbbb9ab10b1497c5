package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Scale-mechanism tests: salting equivalence and bucketed co-located
  * joins (shuffle elimination), per the builder's 100 TB design
  * mandate.
  */
class ScaleSpec extends SparkTestBase {

  import spark.implicits._

  test("anchor-free one-pass profile plans one scan, one aggregate, no Expand") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    // the q46 audit form carries exact countDistinct anchors, which
    // Spark plans via Expand (one projection per distinct column) —
    // the 100 TB form drops them and must plan as a plain single-pass
    // partial+final aggregate over one scan
    val audit = graft.queries.Relational.profileOnePass(li, withExactAnchors = true)
    val pure = graft.queries.Relational.profileOnePass(li, withExactAnchors = false)
    val auditPlan = audit.queryExecution.executedPlan.toString
    val purePlan = pure.queryExecution.executedPlan.toString
    assert(auditPlan.contains("Expand"), "audit form should carry the distinct rewrite")
    assert(!purePlan.contains("Expand"),
      s"anchor-free profile must be a single pass with no Expand:\n$purePlan")
    assert("Scan parquet".r.findAllIn(purePlan).size == 1,
      "anchor-free profile must read the table exactly once")
    // and the estimates it returns are the ones the audit form verified
    val est = pure.select("col_name", "n_distinct_apx").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = audit.select("col_name", "n_distinct").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (c, ex) =>
      assert(math.abs(est(c) - ex) <= ex * 0.15, s"$c estimate off: ${est(c)} vs $ex")
    }
  }

  test("salted aggregation equals plain aggregation on skewed data") {
    // one hot key with 50k rows, 100 cold keys
    val hot = spark.range(50000).select(lit("HOT").as("k"), (col("id") % 7).as("v"))
    val cold = spark.range(100).select(concat(lit("c"), col("id")).as("k"), col("id").as("v"))
    val df = hot.union(cold)

    val plain = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
      .orderBy("k").collect().toSeq
    val salted = Skew.saltedAgg(df, keys = Seq("k"), salts = 16, sums = Seq("v"))
      .orderBy("k").collect().toSeq
    assert(salted == plain)
  }

  test("salted join equals plain join on skewed data") {
    val left = spark.range(20000).select(lit("HOT").as("k"), col("id"))
      .union(spark.range(50).select(concat(lit("c"), col("id")).as("k"), col("id")))
    val right = Seq(("HOT", 1.0), ("c1", 2.0), ("c2", 3.0)).toDF("k", "w")
    val plain = left.join(right, Seq("k")).agg(
      count(lit(1)).as("n"), round(sum(col("id") * col("w")), 2).as("s")).collect().toSeq
    val salted = Skew.saltedJoin(left, right, Seq("k"), salts = 8).agg(
      count(lit(1)).as("n"), round(sum(col("id") * col("w")), 2).as("s")).collect().toSeq
    assert(salted == plain)
  }

  test("salted helpers reject unsound configurations") {
    val df = Seq(("a", 1L)).toDF("k", "id")
    val right = Seq(("a", 1.0)).toDF("k", "w")
    // no aggregates at all -> reject instead of NoSuchElementException
    intercept[IllegalArgumentException](
      Skew.saltedAgg(df, Seq("k"), salts = 4, sums = Nil, counts = false))
    // right/full outer would emit each unmatched right row `salts` times
    intercept[IllegalArgumentException](
      Skew.saltedJoin(df, right, Seq("k"), salts = 4, joinType = "right_outer"))
    intercept[IllegalArgumentException](
      Skew.saltedJoin(df, right, Seq("k"), salts = 4, joinType = "full"))
    // left_anti is sound (unmatched LEFT rows appear once)
    assert(Skew.saltedJoin(df.withColumnRenamed("id", "x"),
      right.filter(col("k") =!= "a"), Seq("k"), salts = 4,
      joinType = "left_anti").count() == 1)
  }

  test("bucketed tables join without a shuffle exchange") {
    // default warehouse dir; managed tables are dropped (data removed) below
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val ord = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("ord_bucketed")

    val joined = spark.table("li_bucketed").join(spark.table("ord_bucketed"),
      col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    // co-located: bucket layout replaces both shuffle exchanges
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected no shuffle exchange in bucketed join plan:\n$plan")
    assert(joined.count() == li.count())

    spark.sql("DROP TABLE li_bucketed")
    spark.sql("DROP TABLE ord_bucketed")
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // The third shuffle-reduction lever beside broadcasting and
    // bucketing: when a selective dimension filter feeds a shuffle
    // join, Spark can build a bloom filter from the dimension keys at
    // runtime and push it into the fact scan, skipping most fact rows
    // BEFORE the exchange. Thresholds here are shrunk to demo scale;
    // at 100 TB the defaults fire on any filtered-dim x fact join.
    val dir = tmpDir("graft-bloom")
    spark.range(200000)
      .select(col("id"), pmod(col("id"), lit(10000)).as("k"))
      .write.parquet(s"$dir/fact")
    spark.range(10000).select(col("id").as("k"),
        pmod(col("id"), lit(100)).as("grp"))
      .write.parquet(s"$dir/dim")
    val prev = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> spark.conf.getOption("spark.sql.optimizer.runtime.bloomFilter.enabled"),
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> spark.conf.getOption("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"),
      "spark.sql.autoBroadcastJoinThreshold" -> spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold"))
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter(col("grp") === 7)
      val joined = fact.join(dim, "k")
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        plan.take(2000))
      assert(joined.count() == 2000L) // 100 dim keys x 20 fact rows each
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
