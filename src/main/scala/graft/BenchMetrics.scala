package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerBlockUpdated, SparkListenerTaskEnd}
import org.apache.spark.storage.StorageLevel

/** Engine-metrics listener for Bench/RepBench (round-9 VERDICT item 4):
  * aggregates, per measured query run, the task-level counters a 100 TB
  * deployment watches — shuffle bytes read/written, spill (in-memory
  * and on-disk), and block-manager removals — so SCALING.md claims
  * about contention/churn cite measured numbers instead of inference.
  *
  * Sources are all public listener API: `SparkListenerTaskEnd
  * .taskMetrics` for shuffle/spill, and `SparkListenerBlockUpdated`
  * with `StorageLevel.NONE` for removals (the one public signal that a
  * cached/checkpointed block left the block manager — eviction and
  * explicit release are indistinguishable at this level, which is fine:
  * the number measures cache-state churn either way).
  *
  * Delivery caveat: the listener bus is asynchronous — events for a
  * job can trail its action by a few milliseconds. [[snapshotAfter]]
  * sleeps one delivery beat before reading, which empirically settles
  * local-mode runs; per-query attribution is exact as long as queries
  * run sequentially (Bench/RepBench do).
  */
final class BenchMetrics extends SparkListener {

  private val shuffleRead = new AtomicLong
  private val shuffleWrite = new AtomicLong
  private val spillMem = new AtomicLong
  private val spillDisk = new AtomicLong
  private val blockRemovals = new AtomicLong

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val m = e.taskMetrics
    if (m != null) {
      shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      spillMem.addAndGet(m.memoryBytesSpilled)
      spillDisk.addAndGet(m.diskBytesSpilled)
    }
  }

  override def onBlockUpdated(e: SparkListenerBlockUpdated): Unit =
    if (e.blockUpdatedInfo.storageLevel == StorageLevel.NONE)
      blockRemovals.incrementAndGet()

  def reset(): Unit = {
    shuffleRead.set(0); shuffleWrite.set(0)
    spillMem.set(0); spillDisk.set(0); blockRemovals.set(0)
  }

  /** One settle beat for the async bus, then the counters since the
    * last reset, in stable key order.
    */
  def snapshotAfter(): BenchMetrics.Snapshot = {
    Thread.sleep(100)
    BenchMetrics.Snapshot(shuffleRead.get, shuffleWrite.get,
      spillMem.get, spillDisk.get, blockRemovals.get)
  }
}

object BenchMetrics {

  final case class Snapshot(shuffleRead: Long, shuffleWrite: Long,
      spillMem: Long, spillDisk: Long, blockRemovals: Long) {
    def json: String =
      s"""{"shuffle_read":$shuffleRead,"shuffle_write":$shuffleWrite,""" +
        s""""spill_mem":$spillMem,"spill_disk":$spillDisk,""" +
        s""""block_removals":$blockRemovals}"""
  }

  def install(sc: SparkContext): BenchMetrics = {
    val m = new BenchMetrics
    sc.addSparkListener(m)
    m
  }
}
