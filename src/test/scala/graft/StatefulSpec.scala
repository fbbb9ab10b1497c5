package graft

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.{ClosedSession, Event}

class StatefulSpec extends SparkTestBase {

  import spark.implicits._

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
