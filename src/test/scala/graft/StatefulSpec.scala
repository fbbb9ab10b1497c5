package graft

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.{ClosedSession, Event}

object StatefulSpec {
  final case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String)
}

class StatefulSpec extends SparkTestBase {

  import spark.implicits._

  test("streaming dedup: first occurrence passes, repeats drop, state crosses batches") {
    import graft.streaming.StreamingDedup
    import StatefulSpec.Doc
    val src = tmpDir("graft-sd-src")
    val ckpt = tmpDir("graft-sd-ckpt")
    def t(s: Long) = new java.sql.Timestamp(s * 1000)

    val outDir = tmpDir("graft-sd-out")
    def run(): Seq[Long] = {
      val stream = spark.readStream
        .schema(Seq.empty[Doc].toDS().schema).parquet(src)
      val q = StreamingDedup.dedup(stream, "ts", "text")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", outDir) // memory sink can't resume
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(outDir).select("doc_id")
        .collect().map(_.getLong(0)).toSeq.sorted
    }

    Seq(Doc(1, t(10), "aaa"), Doc(2, t(20), "aaa"), Doc(3, t(30), "bbb"))
      .toDS().write.mode("append").parquet(src)
    assert(run() == Seq(1L, 3L)) // doc 2 is a dup of doc 1

    // next batch (checkpoint resumes, only new files): a dup of the
    // REMEMBERED "aaa" fingerprint drops even though doc 1 was a
    // previous batch; the genuinely new content passes
    Seq(Doc(4, t(40), "aaa"), Doc(5, t(50), "ccc"))
      .toDS().write.mode("append").parquet(src)
    assert(run() == Seq(1L, 3L, 5L))
  }

  test("transformWithState running totals: RocksDB state survives batches") {
    import graft.streaming.RunningTotals
    import graft.streaming.RunningTotals.{Purchase, UserTotal}
    val src = tmpDir("graft-tws-src")
    val ckpt = tmpDir("graft-tws-ckpt")
    val outDir = tmpDir("graft-tws-out")
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      RunningTotals.RocksDbProvider)
    try {
      def run(): Map[Long, (Long, Double)] = {
        val stream = spark.readStream
          .schema(Seq.empty[Purchase].toDS().schema).parquet(src)
          .as[Purchase]
        val q = RunningTotals.totals(stream)
          .writeStream.outputMode("update")
          .option("checkpointLocation", ckpt)
          .foreachBatch { (b: org.apache.spark.sql.Dataset[UserTotal], _: Long) =>
            b.write.mode("append").parquet(outDir): Unit
          }
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        // latest row per user across all emitted updates
        spark.read.parquet(outDir).as[UserTotal].collect()
          .groupBy(_.user_id)
          .map { case (u, rows) =>
            val m = rows.maxBy(_.n_purchases)
            u -> (m.n_purchases, m.total)
          }
      }
      Seq(Purchase(1, 10.0, 1000), Purchase(1, 5.0, 2000), Purchase(2, 7.0, 1500))
        .toDS().write.mode("append").parquet(src)
      assert(run() == Map(1L -> ((2L, 15.0)), 2L -> ((1L, 7.0))))
      // second batch: state resumed from RocksDB changelog — user 1
      // continues from (2, 15.0), user 3 starts fresh
      Seq(Purchase(1, 1.0, 3000), Purchase(3, 2.0, 3500))
        .toDS().write.mode("append").parquet(src)
      assert(run() == Map(1L -> ((3L, 16.0)), 2L -> ((1L, 7.0)),
        3L -> ((1L, 2.0))))
    } finally {
      prevProvider match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("flatMapGroupsWithState sessionizer: state survives across micro-batches") {
    val src = tmpDir("graft-st-src")
    val ckpt = tmpDir("graft-st-ckpt")

    def run(): Seq[ClosedSession] = {
      val stream = spark.readStream
        .schema(Seq.empty[Event].toDS().schema)
        .parquet(src)
        .as[Event]
      val q = StatefulSessions.sessionize(stream, gapMs = 60000L)
        .writeStream.outputMode("update")
        .format("memory").queryName("sessions_out")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.table("sessions_out").as[ClosedSession].collect().toSeq
    }

    // batch 1: user 1 has two clusters separated by > gap -> first closes
    Seq(Event(1L, 0L), Event(1L, 10000L), Event(1L, 200000L), Event(2L, 0L))
      .toDS().write.mode("append").parquet(src)
    val out1 = run()
    assert(out1 == Seq(ClosedSession(1L, 0L, 10000L, 2L)))

    // batch 2: continuation of user 1's OPEN session (within gap of
    // 200000), then a far event -> the continued session closes with
    // BOTH events, proving state crossed the batch boundary
    Seq(Event(1L, 230000L), Event(1L, 500000L)).toDS()
      .write.mode("append").parquet(src)
    val out2 = run()
    assert(out2.contains(ClosedSession(1L, 200000L, 230000L, 2L)))
    // user 2's single-event session never closed (still open in state)
    assert(!out2.exists(_.user_id == 2L))
  }
}
