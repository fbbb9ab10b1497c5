package graft

import org.apache.spark.sql.streaming.Trigger

import graft.catalog.SnapshotCatalog
import graft.ingest.PurchaseEvents
import graft.query.Engine
import graft.streaming.WindowedAggs

/** Replays the reference's committed HTTP corpus (rest-api.http:9-71)
  * against the engine facade — SURVEY §5 "golden API tests". Each test
  * is one named request from that file.
  */
class GoldenApiSpec extends SparkTestBase {

  private lazy val engine: Engine = {
    val cat = new SnapshotCatalog(spark, tmpDir("graft-golden"))
    cat.createTable("default_db", "purchase_events", PurchaseEvents.schema)
    cat.append("default_db", "purchase_events",
      PurchaseEvents.batch(spark, 1700000000000L, 30))
    new Engine(spark, cat)
  }

  test("healthCheck (rest-api.http:9)") {
    assert(engine.health() == """{"status":"healthy"}""")
  }

  test("listNamespaces (rest-api.http:14)") {
    assert(engine.listNamespaces() == """{"namespaces":["default_db"]}""")
  }

  test("listTables?namespace=default_db (rest-api.http:19)") {
    assert(engine.listTables("default_db")
      == """{"namespace":"default_db","tables":["purchase_events"]}""")
  }

  test("getTableInfo (rest-api.http:24)") {
    val out = engine.describeTable("default_db", "purchase_events")
    // schema fields with ids, like pyiceberg_rest_server.py:148-152
    assert(out.contains(""""id":1,"name":"timestamp""""))
    assert(out.contains(""""id":5,"name":"user_details""""))
    // metadata block, lines 155-159
    assert(out.contains(""""format_version":2"""))
  }

  test("queryTableBasic limit=10 (rest-api.http:29-36)") {
    val out = engine.queryTable("default_db", "purchase_events", limit = 10)
    assert("\"action\":\"purchase\"".r.findAllIn(out).size == 10)
  }

  test("queryTableCustomLimit limit=5 (rest-api.http:41-48)") {
    val out = engine.queryTable("default_db", "purchase_events", limit = 5)
    assert("\"action\"".r.findAllIn(out).size == 5)
  }

  test("queryTableDifferentTable -> 404-style error (rest-api.http:53-60)") {
    assert(engine.queryTable("default_db", "another_table", limit = 10)
      == """{"error":"Table default_db.another_table does not exist"}""")
  }

  test("queryTableNoLimit -> default 100 enforced (rest-api.http:65-71)") {
    val cat = engine.catalog
    cat.append("default_db", "purchase_events",
      PurchaseEvents.batch(spark, 1700010000000L, 120))
    val out = engine.queryTable("default_db", "purchase_events")
    assert("\"action\"".r.findAllIn(out).size == 100)
  }

  test("streaming windowed aggregation with watermark (extension)") {
    val src = tmpDir("graft-wa-src")
    val ckpt = tmpDir("graft-wa-ckpt")
    PurchaseEvents.batch(spark, 1700000000000L, 24, stepMs = 5000L)
      .write.mode("append").parquet(src)
    val stream = spark.readStream.schema(PurchaseEvents.schema).parquet(src)
    val agg = WindowedAggs.tumbling(stream, "timestamp",
      windowLength = "1 minute", lateness = "30 seconds", valueCol = "amount")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("wa_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("wa_out").collect()
    // 24 events at 5 s cadence from 22:13:20 -> 3 windows (8, 12, 4)
    assert(got.map(_.getAs[Long]("n_events")).sum == 24)
    assert(got.map(_.getAs[Long]("n_events")).sorted.toSeq == Seq(4L, 8L, 12L))
    // batch mode shares the same definition
    val batch = WindowedAggs.tumbling(
      PurchaseEvents.batch(spark, 1700000000000L, 24, stepMs = 5000L),
      "timestamp", "1 minute", "30 seconds", "amount").collect()
    assert(batch.map(_.getAs[Long]("n_events")).sum == 24)
  }

  test("streaming session windows merge by gap and match batch (extension)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val src = tmpDir("graft-sw-src")
    val t0 = 1700000000000L
    val rows = Seq(
      ("a", t0), ("a", t0 + 10000L),  // one session...
      ("a", t0 + 2700000L),           // ...45 min later: a second one
      ("b", t0), ("b", t0 + 5000L))
    rows.toDF("user_id", "ts_ms").write.mode("append").parquet(src)
    val stream = spark.readStream.schema(StructType(Seq(
        StructField("user_id", StringType), StructField("ts_ms", LongType))))
      .parquet(src)
    val agg = WindowedAggs.sessions(stream, "ts_ms", "user_id",
      gap = "30 minutes", lateness = "10 minutes")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("sw_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("sw_out").collect()
      .map(r => (r.getString(0),
        r.getAs[java.sql.Timestamp]("session_start").getTime,
        r.getAs[Long]("n_events"))).toSet
    assert(got == Set(("a", t0, 2L), ("a", t0 + 2700000L, 1L), ("b", t0, 2L)))
    // batch shares the definition (q31 hash-checks the semantics)
    val batch = WindowedAggs.sessions(rows.toDF("user_id", "ts_ms"),
      "ts_ms", "user_id", "30 minutes", "10 minutes")
    assert(batch.count() == 3)
  }

  test("SQL route serves refs, tag time travel, and the changes() " +
      "changelog — the whole table-service surface over one endpoint " +
      "(extension)") {
    import spark.implicits._
    val cat = new SnapshotCatalog(spark, tmpDir("graft-golden-refs"))
    val eng = new Engine(spark, cat)
    cat.createTable("db", "t", Seq.empty[(Long, Double)].toDF("id", "v").schema)
    cat.append("db", "t", (0L until 6L).map(i => (i, i.toDouble)).toDF("id", "v"))
    val s1 = cat.describe("db", "t").currentSnapshotId.get
    cat.createTag("db", "t", "v1-audit", None)
    cat.cdcUpsert("db", "t", rows = Seq((1L, 10.0)).toDF("id", "v"),
      deletes = Seq(4L).toDF("id"), Seq("id"))
    // refs metadata table lists the tag over the SQL route
    val refs = eng.sqlQuery(
      "SELECT name, type, snapshot_id FROM db.t.refs ORDER BY name")
    assert(refs.contains(s""""name":"v1-audit","type":"TAG","snapshot_id":$s1"""),
      refs)
    // tag time travel over the SQL route
    assert(eng.sqlQuery(
      "SELECT count(*) AS n FROM db.t VERSION AS OF 'v1-audit'")
      .contains(""""n":6"""))
    // the changelog over the SQL route
    val ch = eng.sqlQuery(
      s"SELECT _change_type, count(*) AS n FROM changes('db.t', $s1) " +
        "GROUP BY _change_type ORDER BY _change_type")
    assert(ch.contains(""""_change_type":"delete","n":2""") &&
      ch.contains(""""_change_type":"insert","n":1"""), ch)
  }
}
