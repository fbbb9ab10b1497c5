package graft

import graft.catalog.SnapshotCatalog
import graft.ingest.PurchaseEvents
import graft.query.Engine

class EngineSpec extends SparkTestBase {

  private lazy val engine: Engine = {
    val cat = new SnapshotCatalog(spark, tmpDir("graft-eng"))
    cat.createTable("default_db", "purchase_events", PurchaseEvents.schema)
    cat.append("default_db", "purchase_events",
      PurchaseEvents.batch(spark, 1700000000000L, 25))
    new Engine(spark, cat)
  }

  test("health probe") {
    assert(engine.health() == """{"status":"healthy"}""")
  }

  test("sqlQuery: records envelope, pushed default limit") {
    val out = engine.sqlQuery(
      s"SELECT r_regionkey, r_name FROM parquet.`$sf0001/region.parquet` ORDER BY r_regionkey",
      limit = 2)
    assert(out.startsWith("""{"records":["""))
    assert(out.contains(""""r_regionkey":0"""))
    // limit applied in-plan
    assert("\"r_name\"".r.findAllIn(out).size == 2)
  }

  test("sqlQuery: reference DuckDB dialect (read_parquet) runs unchanged") {
    // README.md:288 query shape
    val out = engine.sqlQuery(
      s"SELECT * FROM read_parquet('$sf0001/region.parquet') LIMIT 3")
    assert(out.startsWith("""{"records":["""))
    assert("\"r_name\"".r.findAllIn(out).size == 3)
  }

  test("sqlQuery: error envelope on bad SQL") {
    val out = engine.sqlQuery("SELECT FROM nothing")
    assert(out.startsWith("""{"error":"""))
  }

  test("queryParquet: canned SELECT * LIMIT n (default 5)") {
    val out = engine.queryParquet(s"$sf0001/nation.parquet")
    assert("\"n_name\"".r.findAllIn(out).size == 5)
  }

  test("listParquet: glob listing with count") {
    val out = engine.listParquet(s"$sf0001/*.parquet")
    assert(out.endsWith(""","count":10}"""))
    assert(out.contains("lineitem.parquet"))
  }

  test("queryTable: enforced limit (R5 declared semantics) + records") {
    val out = engine.queryTable(limit = 7)
    assert(out.startsWith("""{"records":["""))
    assert("\"user_id\"".r.findAllIn(out).size == 7)
  }

  test("queryTable/describeTable: missing table error envelope") {
    assert(engine.queryTable("nope", "missing")
      == """{"error":"Table nope.missing does not exist"}""")
    assert(engine.describeTable("nope", "missing")
      == """{"error":"Table nope.missing does not exist"}""")
  }

  test("describeTable: schema fields + metadata introspection") {
    val out = engine.describeTable()
    assert(out.contains(""""name":"timestamp","type":"bigint""""))
    assert(out.contains(""""format_version":2"""))
    assert(out.contains(""""write.format.default":"parquet""""))
    assert(out.contains(""""current_snapshot_id":1"""))
  }

  test("time travel through the facade") {
    val cat = engine.catalog
    cat.append("default_db", "purchase_events",
      PurchaseEvents.batch(spark, 1700001000000L, 5))
    val all = engine.queryTable(limit = 1000)
    val snap1 = engine.queryTable(limit = 1000, snapshotId = Some(1L))
    assert("\"timestamp\"".r.findAllIn(all).size == 30)
    assert("\"timestamp\"".r.findAllIn(snap1).size == 25)
  }

  test("glob() table function rewrite lists matching files") {
    val out = engine.sqlQuery(
      s"SELECT count(*) AS n FROM glob('$sf0001/*.parquet')")
    assert(out == """{"records":[{"n":10}]}""")
    val named = engine.sqlQuery(
      s"SELECT file FROM glob('$sf0001/region.parquet')")
    assert(named.contains("region.parquet"))
  }

  test("timestamps render as epoch millis in JSON envelopes (pandas parity)") {
    val out = engine.sqlQuery(
      s"SELECT o_orderkey, o_orderdate FROM parquet.`$sf0001/orders.parquet` " +
        "ORDER BY o_orderkey LIMIT 1")
    // ISO strings would contain '-'; epoch millis are plain digits
    assert("\"o_orderdate\":\\d+".r.findFirstIn(out).isDefined, out)
  }

  test("rate-source generator stream has the event schema and streams") {
    val s = graft.ingest.PurchaseEvents.stream(spark)
    assert(s.isStreaming)
    assert(s.schema.fieldNames.toSeq ==
      graft.ingest.PurchaseEvents.schema.fieldNames.toSeq)
  }

  test("dialect rewrite is literal and idempotent") {
    assert(Engine.rewriteDialect("SELECT * FROM read_parquet('/a/b.parquet')")
      == "SELECT * FROM parquet.`/a/b.parquet`")
    assert(Engine.rewriteDialect("SELECT 1") == "SELECT 1")
  }
}
