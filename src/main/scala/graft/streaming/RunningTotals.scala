package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig}

/** Per-key running aggregate on the arbitrary-state API v2
  * (`transformWithState`, Spark 4.x): the successor of
  * `flatMapGroupsWithState` ([[StatefulSessions]] keeps the v1 surface)
  * with named state variables, per-state TTL, and timers. This operator
  * maintains a running (count, total) per user and emits the updated
  * row whenever a batch touches the key — the "customer lifetime spend"
  * shape a purchase stream feeds at serving time.
  *
  * State TTL is the 100 TB story here: at v1 every key lives forever
  * unless the processor hand-rolls timeout bookkeeping; here
  * `TTLConfig` ages dormant keys out of the store natively, so state
  * size tracks ACTIVE keys, not all keys ever seen. The store itself is
  * RocksDB (`transformWithState` requires the RocksDB provider —
  * GraftSession/tests set
  * `spark.sql.streaming.stateStore.providerClass`), which spills to
  * local disk and changelogs to the checkpoint — state is bounded by
  * executor disk, not memory.
  */
object RunningTotals {

  final case class Purchase(user_id: Long, amount: Double, ts_ms: Long)
  final case class UserTotal(user_id: Long, n_purchases: Long, total: Double)

  /** RocksDB provider class name callers must set as
    * `spark.sql.streaming.stateStore.providerClass`.
    */
  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private class TotalsProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, Purchase, UserTotal] {
    @transient private var totals:
      org.apache.spark.sql.streaming.ValueState[UserTotal] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[UserTotal](
        "totals", Encoders.product[UserTotal], ttl)

    override def handleInputRows(key: Long, rows: Iterator[Purchase],
        timerValues: TimerValues): Iterator[UserTotal] = {
      val prev =
        if (totals.exists()) totals.get()
        else UserTotal(key, 0L, 0.0)
      val next = rows.foldLeft(prev)((acc, p) =>
        acc.copy(n_purchases = acc.n_purchases + 1, total = acc.total + p.amount))
      totals.update(next)
      Iterator.single(next)
    }
  }

  /** Update-mode stream of per-user running totals; one output row per
    * (batch, touched user). `ttl` ages out dormant users' state.
    */
  def totals(purchases: Dataset[Purchase],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[UserTotal] = {
    implicit val outEnc = Encoders.product[UserTotal]
    implicit val keyEnc = Encoders.scalaLong
    purchases
      .groupByKey(_.user_id)
      .transformWithState(new TotalsProcessor(ttl),
        TimeMode.None(), OutputMode.Update())
  }
}
