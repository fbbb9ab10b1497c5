package graft

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamJoin

object StreamJoinSpec {
  final case class Imp(ad_id: Long, imp_ts: java.sql.Timestamp)
  final case class Click(ad_id: Long, click_ts: java.sql.Timestamp)
}

class StreamJoinSpec extends SparkTestBase {

  import spark.implicits._
  import StreamJoinSpec._

  private def t(s: Long) = new java.sql.Timestamp(s * 1000)

  test("stream-stream join correlates within horizon, across micro-batches") {
    val impDir = tmpDir("graft-sj-imp")
    val clkDir = tmpDir("graft-sj-clk")
    val ckpt = tmpDir("graft-sj-ckpt")
    val outDir = tmpDir("graft-sj-out")

    def run(): Set[(Long, Long, Long)] = {
      val imps = spark.readStream
        .schema(Seq.empty[Imp].toDS().schema).parquet(impDir)
      val clks = spark.readStream
        .schema(Seq.empty[Click].toDS().schema).parquet(clkDir)
      val q = StreamJoin.eventCorrelation(imps, clks, "ad_id",
          "imp_ts", "click_ts",
          watermark = "10 seconds", horizon = "30 seconds")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", outDir)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(outDir)
        .select("ad_id", "imp_ts", "click_ts").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000,
          r.getTimestamp(2).getTime / 1000)).toSet
    }

    // batch 1: ad 1 clicked in-horizon, ad 2 clicked too late (+60s),
    // ad 3 not clicked yet
    Seq(Imp(1, t(100)), Imp(2, t(100)), Imp(3, t(100)))
      .toDS().write.mode("append").parquet(impDir)
    Seq(Click(1, t(110)), Click(2, t(160)))
      .toDS().write.mode("append").parquet(clkDir)
    assert(run() == Set((1L, 100L, 110L)))

    // batch 2: click for ad 3 arrives a whole batch later but inside
    // the horizon — the checkpointed join state still correlates it;
    // a click before the impression never matches
    Seq(Click(3, t(120)), Click(1, t(90)))
      .toDS().write.mode("append").parquet(clkDir)
    assert(run() == Set((1L, 100L, 110L), (3L, 100L, 120L)))
  }

  test("left-outer stream-stream join emits unmatched rows after the watermark") {
    val impDir = tmpDir("graft-sjo-imp")
    val clkDir = tmpDir("graft-sjo-clk")
    val ckpt = tmpDir("graft-sjo-ckpt")
    val outDir = tmpDir("graft-sjo-out")

    def run(): Set[(Long, Long, Option[Long])] = {
      val imps = spark.readStream
        .schema(Seq.empty[Imp].toDS().schema).parquet(impDir)
      val clks = spark.readStream
        .schema(Seq.empty[Click].toDS().schema).parquet(clkDir)
      val q = StreamJoin.eventCorrelation(imps, clks, "ad_id",
          "imp_ts", "click_ts",
          watermark = "10 seconds", horizon = "30 seconds",
          joinType = "leftOuter")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", outDir)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(outDir)
        .select("ad_id", "imp_ts", "click_ts").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000,
          Option(r.getTimestamp(2)).map(_.getTime / 1000))).toSet
    }

    // ad 1 clicked in-horizon; ad 2 never clicked. The null-padded
    // ad-2 row may only emit once the watermark passes imp_ts+horizon.
    Seq(Imp(1, t(100)), Imp(2, t(100)))
      .toDS().write.mode("append").parquet(impDir)
    Seq(Click(1, t(110)))
      .toDS().write.mode("append").parquet(clkDir)
    val first = run()
    assert(first.contains((1L, 100L, Some(110L))))
    assert(!first.contains((2L, 100L, None)),
      "unmatched row must NOT emit before the watermark closes its window")

    // much later events on BOTH sides (the query watermark is the MIN
    // across inputs) advance it past 100+30+10 -> ad 2's window is
    // closed, the null row emits
    Seq(Imp(9, t(400)))
      .toDS().write.mode("append").parquet(impDir)
    Seq(Click(9, t(400)))
      .toDS().write.mode("append").parquet(clkDir)
    val second = run()
    assert(second.contains((2L, 100L, None)),
      s"expected null-padded ad-2 row after watermark, got $second")
  }

  test("stream-stream join requires distinct timestamp names") {
    intercept[IllegalArgumentException] {
      StreamJoin.eventCorrelation(
        spark.range(1).toDF(), spark.range(1).toDF(), "k", "ts", "ts")
    }
  }

  test("stream-static enrichment picks up a refreshed dimension next batch") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val srcDir = tmpDir("graft-se-src")
    val dimDir = tmpDir("graft-se-dim")
    val ckpt = tmpDir("graft-se-ckpt")
    val outDir = tmpDir("graft-se-out")

    Seq((1L, "us"), (2L, "de")).toDF("uid", "region")
      .write.mode("overwrite").parquet(dimDir)
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("uid", "amount")
      .write.mode("append").parquet(srcDir)

    def run(): Set[(Long, String)] = {
      val stream = spark.readStream.schema(StructType(Seq(
          StructField("uid", LongType), StructField("amount", DoubleType))))
        .parquet(srcDir)
      val dim = spark.read.parquet(dimDir)
      val q = StreamJoin.enrich(stream, dim, "uid")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(outDir).collect()
        .map(r => (r.getAs[Long]("uid"),
          Option(r.getAs[String]("region")).getOrElse("-"))).toSet
    }

    // batch 1: uid 3 has no dimension row yet -> left-outer null
    assert(run() == Set((1L, "us"), (2L, "de"), (3L, "-")))

    // the dimension gains uid 3; only NEW stream rows process (the
    // checkpoint skips batch 1), and they see the refreshed dimension
    // WITHOUT a query restart (static side re-evaluated per batch)
    Seq((1L, "us"), (2L, "de"), (3L, "fr")).toDF("uid", "region")
      .write.mode("overwrite").parquet(dimDir)
    Seq((3L, 31.0), (4L, 40.0)).toDF("uid", "amount")
      .write.mode("append").parquet(srcDir)
    assert(run() == Set((1L, "us"), (2L, "de"), (3L, "-"), (3L, "fr"), (4L, "-")))
  }
}
