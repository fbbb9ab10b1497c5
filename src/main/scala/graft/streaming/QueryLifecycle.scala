package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

/** Connector-lifecycle surface (SURVEY §2.4 C7) over the
  * StreamingQueryManager: the reference's wait-for-ready / create /
  * restart / status REST verbs (kafka_publisher.py:247-301,
  * s3_connector_deployer.py:37-130) map onto named managed streaming
  * queries.
  */
class QueryLifecycle(spark: SparkSession) {

  private val writers = TrieMap.empty[String, () => StreamingQuery]
  private val running = TrieMap.empty[String, StreamingQuery]

  /** Register-or-update a named "connector" (a stream writer factory)
    * and start it — the PUT-create/update verb. An already-running
    * query with the same name is stopped first (update semantics).
    */
  def deploy(name: String)(start: () => StreamingQuery): StreamingQuery =
    synchronized {
      running.get(name).filter(_.isActive).foreach(_.stop())
      writers.put(name, start)
      val q = start()
      running.put(name, q)
      q
    }

  def exists(name: String): Boolean = writers.contains(name)

  /** POST-restart: stop if active, start fresh from its factory
    * (checkpoint state carries offsets forward).
    */
  def restart(name: String): StreamingQuery = synchronized {
    val factory = writers.getOrElse(name,
      throw new NoSuchElementException(s"no connector named $name"))
    running.get(name).filter(_.isActive).foreach(_.stop())
    val q = factory()
    running.put(name, q)
    q
  }

  def stop(name: String): Unit = synchronized {
    running.get(name).filter(_.isActive).foreach(_.stop())
  }

  /** GET-status: mirror of the Connect status document. */
  def status(name: String): String =
    running.get(name) match {
      case None => s"""{"name":"$name","state":"UNREGISTERED"}"""
      case Some(q) =>
        val state = if (q.isActive) "RUNNING" else "STOPPED"
        s"""{"name":"$name","state":"$state","id":"${q.id}"}"""
    }

  def list(): Seq[String] = writers.keys.toSeq.sorted
}
