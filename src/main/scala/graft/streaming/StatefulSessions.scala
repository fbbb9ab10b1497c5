package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming operator (SURVEY §2.5 "stateful ops —
  * reserved for extensions"): gap-based sessionization with
  * cross-micro-batch state via `flatMapGroupsWithState`.
  *
  * State per user = the currently-open session; a batch's events are
  * folded in event-time order, closing (emitting) a session whenever
  * the gap to the next event exceeds `gapMs`. Closed sessions flow
  * downstream in Update mode as they close; the open session survives
  * in the state store across batches/restarts (checkpointed).
  *
  * Scale: state is O(active users), one small struct each — the state
  * store partitions by group key exactly like any keyed shuffle.
  */
object StatefulSessions {

  final case class Event(user_id: Long, ts_ms: Long)
  final case class OpenSession(start_ms: Long, last_ms: Long, n_events: Long)
  final case class ClosedSession(
      user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)

  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[ClosedSession] = {
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[ClosedSession]
    implicit val longEnc = Encoders.scalaLong

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[OpenSession]) =>
          val sorted = batch.toSeq.sortBy(_.ts_ms)
          var open = state.getOption
          val closed = Seq.newBuilder[ClosedSession]
          sorted.foreach { e =>
            open = open match {
              case Some(s) if e.ts_ms - s.last_ms <= gapMs =>
                Some(s.copy(last_ms = e.ts_ms, n_events = s.n_events + 1))
              case Some(s) =>
                closed += ClosedSession(userId, s.start_ms, s.last_ms, s.n_events)
                Some(OpenSession(e.ts_ms, e.ts_ms, 1))
              case None =>
                Some(OpenSession(e.ts_ms, e.ts_ms, 1))
            }
          }
          open.foreach(state.update)
          closed.result().iterator
      }
  }
}
