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

  test("listParquet: reference wildcard->0 fallback and two-cause error") {
    // duckdb_rest_server.py:101-122 — the listing is gated on a
    // LIMIT-0 readability probe; on probe failure '*' -> '0' is
    // substituted and that SPECIFIC path's CONTENT is returned as
    // records; a double failure reports both causes.
    val dir = tmpDir("graft-listfb")
    val df = spark.read.parquet(s"$sf0001/region.parquet")
    df.write.parquet(s"$dir/part-0.parquet") // the '*'->'0' target
    // a poison member that breaks the glob's readability probe
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(s"$dir/part-1.parquet"), "not a parquet file")
    val fb = engine.listParquet(s"$dir/part-*.parquet")
    assert(fb.startsWith("""{"records":["""),
      s"expected fallback records, got: ${fb.take(120)}")
    assert("\"r_name\"".r.findAllIn(fb).size == 5) // region's 5 rows
    // both the probe and the substituted path fail -> combined error
    val err = engine.listParquet(s"$dir/zz-*.parquet")
    assert(err.startsWith("""{"error":"Failed to list Parquet files:"""))
    assert(err.contains("Alternative approach failed:"))
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

  // ------------------------- SQL → snapshot-catalog pruning bridge

  private lazy val bridgeEngine: Engine = {
    import spark.implicits._
    val cat = new SnapshotCatalog(spark, tmpDir("graft-bridge"))
    cat.createTable("db", "m",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("grp", org.apache.spark.sql.types.StringType))))
    // three appends with disjoint id ranges -> 3+ prunable file groups
    cat.append("db", "m", (1L to 100L).map(i => (i, s"g${i % 3}")).toDF("id", "grp"))
    cat.append("db", "m", (1000L to 1100L).map(i => (i, s"g${i % 3}")).toDF("id", "grp"))
    cat.append("db", "m", (5000L to 5100L).map(i => (i, s"g${i % 3}")).toDF("id", "grp"))
    new Engine(spark, cat)
  }

  test("sqlQuery resolves snapshot-catalog tables (no filter, no pruning)") {
    // a bare count(*) takes the metadata-only fast path (kept=0: no
    // files read); a projection forces the real scan of every file
    val (df, infos) = bridgeEngine.sqlDataFrame("SELECT count(*) AS n FROM db.m")
    assert(df.head().getLong(0) == 302)
    assert(infos.size == 1 && infos.head.kept == 0 && infos.head.total > 0)
    val (df2, infos2) =
      bridgeEngine.sqlDataFrame("SELECT sum(id) AS s FROM db.m")
    assert(df2.head().getLong(0) ==
      (1L to 100L).sum + (1000L to 1100L).sum + (5000L to 5100L).sum)
    assert(infos2.size == 1 && infos2.head.kept == infos2.head.total)
  }

  test("WHERE range prunes manifest files; result equals unpruned") {
    val (df, infos) = bridgeEngine.sqlDataFrame(
      "SELECT count(*) AS n, sum(id) AS s FROM db.m WHERE id >= 1000 AND id <= 1100")
    val r = df.head()
    assert(r.getLong(0) == 101 && r.getLong(1) == (1000L to 1100L).sum)
    val i = infos.head
    assert(i.kept < i.total, s"expected pruning: $i")
  }

  test("one-sided + equality predicates prune; residual filter intact") {
    val (df1, i1) = bridgeEngine.sqlDataFrame(
      "SELECT count(*) AS n FROM db.m WHERE id > 4000")
    assert(df1.head().getLong(0) == 101 && i1.head.kept < i1.head.total)
    val (df2, i2) = bridgeEngine.sqlDataFrame(
      "SELECT grp FROM db.m WHERE id = 1050")
    assert(df2.head().getString(0) == "g0" && i2.head.kept < i2.head.total)
    // residual applies INSIDE kept files: id=1050 pins one row, not a file
    val (df3, _) = bridgeEngine.sqlDataFrame(
      "SELECT count(*) AS n FROM db.m WHERE id = 1050")
    assert(df3.head().getLong(0) == 1)
  }

  test("a second unfiltered occurrence disables pruning (shared view)") {
    val (df, infos) = bridgeEngine.sqlDataFrame(
      "SELECT (SELECT count(*) FROM db.m) AS total, count(*) AS part " +
        "FROM db.m WHERE id <= 100")
    val r = df.head()
    assert(r.getLong(0) == 302 && r.getLong(1) == 100)
    assert(infos.head.kept == infos.head.total, s"must not prune: ${infos.head}")
  }

  test("string literals containing the table name are never rewritten") {
    // round-2 ADVICE: the old textual rewrite corrupted literals like 'db.m'
    val (df, _) = bridgeEngine.sqlDataFrame(
      "SELECT 'db.m' AS tag, count(*) AS n FROM db.m WHERE grp = 'db.m'")
    val r = df.head()
    assert(r.getString(0) == "db.m" && r.getLong(1) == 0L)
  }

  test("EXISTS subquery on the same table sees all rows despite outer filter") {
    val (df, _) = bridgeEngine.sqlDataFrame(
      "SELECT count(*) AS n FROM db.m WHERE id <= 100 " +
        "AND EXISTS (SELECT 1 FROM db.m m2 WHERE m2.id = 5000)")
    assert(df.head().getLong(0) == 100L) // id=5000 lives outside the outer range
  }

  test("catalog names with non-identifier characters work (sanitized view)") {
    import spark.implicits._
    val cat = new SnapshotCatalog(spark, tmpDir("graft-hyphen"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType)))
    cat.createTable("db", "my-table", schema)
    cat.append("db", "my-table", (1L to 10L).toDF("id"))
    val eng = new Engine(spark, cat)
    val (df, infos) = eng.sqlDataFrame("SELECT count(*) AS n FROM db.`my-table`")
    assert(df.head().getLong(0) == 10L)
    assert(infos.head.table == "db.my-table")
  }

  test("equality on a bloom column skips files range stats cannot") {
    import spark.implicits._
    val cat = new SnapshotCatalog(spark, tmpDir("graft-bloom-bridge"))
    cat.createTable("db", "bb",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("uid", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.LongType))),
      Map(SnapshotCatalog.BloomColumnsProp -> "uid"))
    // interleaved uid sets per append: every append's lexicographic
    // range covers any looked-up key, so min/max keeps one file per
    // append — the bloom knows which append actually holds it
    cat.append("db", "bb", (0 until 300 by 3).map(i => (f"user_$i%04d", i.toLong)).toDF("uid", "n"))
    cat.append("db", "bb", (1 until 300 by 3).map(i => (f"user_$i%04d", i.toLong)).toDF("uid", "n"))
    cat.append("db", "bb", (2 until 300 by 3).map(i => (f"user_$i%04d", i.toLong)).toDF("uid", "n"))
    val eng = new Engine(spark, cat)
    val (df, infos) = eng.sqlDataFrame("SELECT n FROM db.bb WHERE uid = 'user_0042'")
    assert(df.head().getLong(0) == 42L)
    val snap = cat.describe("db", "bb").currentSnapshot.get
    val rangeOnly = cat.prunedFilesStringRange(snap, "uid",
      Some("user_0042"), Some("user_0042")).size
    val i = infos.head
    assert(i.kept < rangeOnly,
      s"bloom kept ${i.kept}, range stats alone kept $rangeOnly")
    // a double literal against the bigint column must NOT bloom-probe
    // (rendering mismatch would wrongly skip the matching file); the
    // range prune still applies and the answer stays correct
    val (df2, _) = eng.sqlDataFrame("SELECT count(*) AS c FROM db.bb WHERE n = 42.0")
    assert(df2.head().getLong(0) == 1L)
  }

  test("equality through the SQL bridge prunes on hidden bucket partitions") {
    import spark.implicits._
    import graft.catalog.PartitionSpec
    val cat = new SnapshotCatalog(spark, tmpDir("graft-pval-bridge"))
    cat.createTable("db", "pb",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType))),
      Map(PartitionSpec.PropertyKey -> "bucket(4, k)"))
    // one append, hash-ordered keys: every bucket file's [min,max] of k
    // spans nearly the whole domain, so stats can't separate them —
    // only the recorded partition value can
    cat.append("db", "pb", (0L until 400L).map(i => (i, i * 10)).toDF("k", "v"))
    val eng = new Engine(spark, cat)
    val (df, infos) = eng.sqlDataFrame("SELECT v FROM db.pb WHERE k = 42")
    assert(df.head().getLong(0) == 420L)
    val i = infos.head
    assert(i.kept < i.total,
      s"pval pruning kept ${i.kept} of ${i.total}")
  }

  test("metadata tables: snapshots/files/history/refs queryable through SQL") {
    import spark.implicits._
    val cat = new SnapshotCatalog(spark, tmpDir("graft-meta-tbl"))
    cat.createTable("db", "mt",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType))))
    cat.append("db", "mt", Seq(1L, 2L).toDF("id"))
    // the TIMESTAMP AS OF case below anchors on snapshot 1's commit
    // instant; same-millisecond commits correctly resolve to the
    // LATER snapshot (commit-order tie-break), so keep them apart
    Thread.sleep(5)
    cat.append("db", "mt", Seq(3L).toDF("id"))
    cat.createBranch("db", "mt", "audit")
    val eng = new Engine(spark, cat)

    val (snaps, _) = eng.sqlDataFrame(
      "SELECT snapshot_id, added_rows FROM db.mt.snapshots ORDER BY snapshot_id")
    assert(snaps.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L), (2L, 1L)))

    val (files, _) = eng.sqlDataFrame(
      "SELECT count(*) AS c, CAST(sum(record_count) AS BIGINT) AS rows FROM db.mt.files")
    val fr = files.head()
    assert(fr.getLong(1) == 3L && fr.getLong(0) >= 2L)

    val (hist, _) = eng.sqlDataFrame(
      "SELECT count(*) AS c FROM db.mt.history WHERE is_current_ancestor")
    assert(hist.head().getLong(0) == 2L)

    // SQL time travel: VERSION AS OF reads the older snapshot, and can
    // join against the current state in one query
    val (tt, _) = eng.sqlDataFrame(
      "SELECT count(*) AS c FROM db.mt VERSION AS OF 1")
    assert(tt.head().getLong(0) == 2L)
    val (delta, _) = eng.sqlDataFrame(
      """SELECT count(*) AS added FROM db.mt cur
        |LEFT ANTI JOIN db.mt VERSION AS OF 1 old ON cur.id = old.id""".stripMargin)
    assert(delta.head().getLong(0) == 1L)

    // TIMESTAMP AS OF maps to the latest snapshot at-or-before ts;
    // the second append happened after `betweenTs` (captured below)
    val betweenTs = cat.describe("db", "mt").snapshots
      .find(_.snapshotId == 1L).get.createdAtMs
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss.SSS")
    val (tts, _) = eng.sqlDataFrame(
      s"SELECT count(*) AS c FROM db.mt TIMESTAMP AS OF '${fmt.format(new java.util.Date(betweenTs))}'")
    assert(tts.head().getLong(0) == 2L)

    // joins between a metadata table and the data table work too
    val (joined, _) = eng.sqlDataFrame(
      """SELECT r.name, count(m.id) AS n FROM db.mt.refs r
        |CROSS JOIN db.mt m WHERE r.name = 'audit' GROUP BY r.name""".stripMargin)
    assert(joined.head().getLong(1) == 3L)
  }

  test("partitions metadata table: per-partition file/row rollup from " +
      "the manifest, metadata-only") {
    import spark.implicits._
    val cat = new SnapshotCatalog(spark, tmpDir("graft-meta-part"))
    cat.createTable("db", "pt",
      Seq.empty[(Long, Double)].toDF("k", "v").schema,
      Map(graft.catalog.PartitionSpec.PropertyKey -> "bucket(4, k)"))
    cat.append("db", "pt",
      (0L until 200L).map(i => (i, i.toDouble)).toDF("k", "v"))
    val eng = new Engine(spark, cat)
    val (parts, _) = eng.sqlDataFrame(
      """SELECT partition_value, n_files, record_count
        |FROM db.pt.partitions ORDER BY partition_value""".stripMargin)
    val rows = parts.collect()
    assert(rows.length == 4, s"bucket(4) must roll up to 4 partitions")
    assert(rows.map(_.getLong(2)).sum == 200L)
    assert(rows.forall(r => r.getString(0) != null && r.getLong(1) >= 1L))
    // an unpartitioned table rolls up under a single NULL partition
    cat.createTable("db", "up0",
      Seq.empty[(Long, Double)].toDF("k", "v").schema)
    cat.append("db", "up0", Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"))
    val (np, _) = eng.sqlDataFrame(
      "SELECT partition_value, record_count FROM db.up0.partitions")
    val nr = np.collect()
    assert(nr.length == 1 && nr.head.isNullAt(0) && nr.head.getLong(1) == 2L)
  }

  test("CTEs over catalog tables resolve and prune") {
    val (df, infos) = bridgeEngine.sqlDataFrame(
      "WITH w AS (SELECT * FROM db.m WHERE id >= 1000 AND id <= 1100) " +
        "SELECT count(*) AS n, sum(id) AS s FROM w")
    val r = df.head()
    assert(r.getLong(0) == 101L && r.getLong(1) == (1000L to 1100L).sum)
    assert(infos.head.kept < infos.head.total, s"CTE filter should prune: $infos")
  }

  test("two catalog tables in one query prune independently") {
    import spark.implicits._
    val cat = new SnapshotCatalog(spark, tmpDir("graft-two"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType)))
    for (t <- Seq("l", "r")) {
      cat.createTable("db", t, schema)
      cat.append("db", t, (1L to 100L).toDF("id"))
      cat.append("db", t, (1000L to 1100L).toDF("id"))
      cat.append("db", t, (5000L to 5100L).toDF("id"))
    }
    val eng = new Engine(spark, cat)
    // per-relation filters (a WHERE above the JOIN binds to the join,
    // not the scans, and correctly extracts nothing)
    val (df, infos) = eng.sqlDataFrame(
      "SELECT count(*) AS n FROM " +
        "(SELECT * FROM db.l WHERE id >= 1000 AND id <= 1100) ll JOIN " +
        "(SELECT * FROM db.r WHERE id >= 1000 AND id <= 1100) rr ON ll.id = rr.id")
    assert(df.head().getLong(0) == 101L)
    assert(infos.size == 2 && infos.forall(i => i.kept < i.total),
      s"both sides should prune: $infos")
    // the join-level WHERE form still answers correctly, unpruned
    val (df2, infos2) = eng.sqlDataFrame(
      "SELECT count(*) AS n FROM db.l JOIN db.r ON l.id = r.id " +
        "WHERE l.id >= 1000 AND l.id <= 1100")
    assert(df2.head().getLong(0) == 101L)
    assert(infos2.forall(i => i.kept == i.total))
  }

  test("catalog table joins a raw parquet table in one SQL statement") {
    val (df, _) = bridgeEngine.sqlDataFrame(
      s"SELECT count(*) AS n FROM db.m m JOIN parquet.`$sf0001/region.parquet` r " +
        "ON (m.id % 5) = r.r_regionkey WHERE m.id >= 5000")
    assert(df.head().getLong(0) == 101)
  }

  test("metadata-only count(*): manifest answer, exact across delete, safe fallthrough") {
    import spark.implicits._
    val cat = new SnapshotCatalog(spark, tmpDir("graft-metacount"))
    val eng = new Engine(spark, cat)
    cat.createTable("db", "mc", Seq.empty[(Long, Double)].toDF("id", "v").schema)
    cat.append("db", "mc", (0L until 300L).map(i => (i, i * 1.0)).toDF("id", "v"))
    cat.append("db", "mc", (300L until 500L).map(i => (i, i * 1.0)).toDF("id", "v"))
    val totalFiles = cat.describe("db", "mc").currentSnapshot.get.files.size

    val (df, infos) = eng.sqlDataFrame("SELECT count(*) FROM db.mc")
    // fast path: zero files read, Spark's generated column name, exact
    assert(infos == Seq(Engine.PruneInfo("db.mc", 0, totalFiles)))
    assert(df.columns.toSeq == Seq("count(1)"))
    assert(df.head().getLong(0) == 500L)

    // row-level delete rewrites/drops files; rowCount must track exactly
    cat.deleteWhere("db", "mc", "id", 100.0, 199.0)
    val (df2, infos2) = eng.sqlDataFrame("SELECT count(*) AS n FROM db.mc")
    assert(infos2.head.kept == 0)
    assert(df2.columns.toSeq == Seq("n"))
    assert(df2.head().getLong(0) == cat.read("db", "mc").count())

    // anything beyond the bare shape falls through to the scan bridge
    val (df3, infos3) = eng.sqlDataFrame(
      "SELECT count(*) FROM db.mc WHERE id <= 49")
    assert(df3.head().getLong(0) == 50L)
    assert(infos3.head.kept > 0) // real (pruned) file read, not metadata
    val (df4, _) = eng.sqlDataFrame("SELECT count(DISTINCT v) FROM db.mc")
    assert(df4.head().getLong(0) == 400L)
    val (df5, _) = eng.sqlDataFrame("SELECT count(v) FROM db.mc")
    assert(df5.head().getLong(0) == 400L) // count(col) skips nulls -> scan

    // time travel counts are metadata-only too, per historical snapshot
    val (dfv1, iv1) = eng.sqlDataFrame(
      "SELECT count(*) FROM db.mc VERSION AS OF 1")
    assert(iv1.head.kept == 0)
    assert(dfv1.head().getLong(0) == 300L)
    val (dfv2, _) = eng.sqlDataFrame(
      "SELECT count(*) FROM db.mc VERSION AS OF 2")
    assert(dfv2.head().getLong(0) == 500L)
    // unknown snapshot id: clean rejection, not a silent zero
    intercept[Exception] {
      eng.sqlDataFrame("SELECT count(*) FROM db.mc VERSION AS OF 99")._1.head()
    }
  }

  test("bounds extraction: conjuncts, mirrored literals, strings, unknowns") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("a", LongType),
      StructField("s", StringType), StructField("other", BinaryType)))
    val parse = (sql: String) => spark.sessionState.sqlParser.parseExpression(sql)
    val b1 = Engine.extractBounds(
      parse("a >= 10 AND a < 20 AND 5 <= a AND s = 'x' AND other = X'00' AND b OR c"), schema)
    // OR at top level -> single non-And conjunct, nothing extracted from it;
    // parse: "... AND b OR c" binds OR last, so whole expr is Or -> nothing.
    assert(b1.isEmpty)
    val b2 = Engine.extractBounds(
      parse("a >= 10 AND a < 20 AND 5 <= a AND s = 'x' AND other = X'00'"), schema)
    // string equality yields BOTH the [v,v] range bound and the bloom
    // probe value (same column, two prune kinds)
    assert(b2 == Seq(
      Engine.NumBounds("a", Some(10.0), Some(20.0)),
      Engine.StrBounds("s", Some("x"), Some("x")),
      Engine.EqValue("s", "x")))
    // unknown column and non-literal comparisons are ignored
    assert(Engine.extractBounds(parse("zz > 1 AND a > a"), schema).isEmpty)
  }

  // --------------------------------------------- curation SQL surface
  // round-9 VERDICT item 5: the Tier-B arbitrary-SQL pass-through must
  // reach the curation/media operators. Each case goes through
  // Engine.sqlQuery (raw SQL text in, JSON envelope out) and pins the
  // SQL function's values to the corresponding frame operator's.

  test("sqlQuery: graft_gopher_pass equals the gopher frame operator's keep") {
    graft.core.GraftSession.registerFunctions(spark)
    val out = engine.sqlQuery(
      s"""SELECT doc_id, graft_gopher_pass(text) AS keep
         |FROM parquet.`$sf0001/documents.parquet`
         |ORDER BY doc_id""".stripMargin, limit = 1000)
    assert(out.startsWith("""{"records":["""), out.take(120))
    val expected = graft.operators.QualityRules
      .gopher(spark.read.parquet(s"$sf0001/documents.parquet"))
      .select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val got = """\{"doc_id":(\d+),"keep":(true|false)\}""".r
      .findAllMatchIn(out)
      .map(m => m.group(1).toLong -> m.group(2).toBoolean).toMap
    assert(got.nonEmpty && got == expected.filter(kv => got.contains(kv._1)))
    assert(got.size == expected.size)
  }

  test("sqlQuery: readability and line-cleaning scalars match their " +
      "t52/t53 kernels") {
    graft.core.GraftSession.registerFunctions(spark)
    import org.apache.spark.sql.functions.{col, md5}
    val out = engine.sqlQuery(
      s"""SELECT doc_id, graft_fre100(text) AS fre,
         |  graft_fk100(text) AS fk,
         |  md5(graft_clean_lines(text)) AS ch
         |FROM parquet.`$sf0001/documents.parquet`
         |WHERE doc_id < 25 ORDER BY doc_id""".stripMargin)
    assert(out.startsWith("""{"records":["""), out.take(120))
    val q = graft.operators.QualityRules
    val expected = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter("doc_id < 25")
      .select(col("doc_id"), q.fre100Column(col("text")).as("fre"),
        q.fk100Column(col("text")).as("fk"),
        md5(q.cleanedColumn(col("text"))).as("ch"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val rec =
      """\{"doc_id":(\d+),"fre":(-?\d+),"fk":(-?\d+),"ch":"([0-9a-f]{32})"\}""".r
    val got = rec.findAllMatchIn(out).map(m => m.group(1).toLong ->
      (m.group(2).toLong, m.group(3).toLong, m.group(4))).toMap
    assert(got.size == expected.size && got == expected,
      s"readability scalars diverged (${got.size}/${expected.size})")
    // and the scalar surface agrees with the t52 FRAME operator's grid
    val frame = q.readability(spark.read.parquet(s"$sf0001/documents.parquet")
        .filter("doc_id < 25"))
      .select("doc_id", "fre100").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.map { case (k, v) => k -> v._1 } == frame)
  }

  test("sqlQuery: graft_sq8_encode/dot round-trip a unit vector in raw SQL") {
    graft.core.GraftSession.registerFunctions(spark)
    // self-dot of the encoded unit vector ≈ 127² · ‖u‖² = 16129, off
    // only by int8 rounding — pin the EXACT value the Column API gives
    val out = engine.sqlQuery(
      s"""SELECT vec_id,
         |  graft_sq8_dot(graft_sq8_encode(u), graft_sq8_encode(u)) AS d
         |FROM (
         |  SELECT vec_id,
         |    transform(e, x -> x / sqrt(graft_dot(e, e))) AS u
         |  FROM (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS e
         |        FROM parquet.`$sf0001/embeddings.parquet`
         |        WHERE vec_id < 10))
         |ORDER BY vec_id""".stripMargin)
    import org.apache.spark.sql.functions._
    import graft.functions.expressions.{DotProduct, Sq8}
    Sq8.register(spark); DotProduct.register(spark)
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .select(col("vec_id"),
        transform(col("e"), x => x / sqrt(DotProduct.dot(col("e"), col("e"))))
          .as("u"))
    val expected = e.select(col("vec_id"),
      Sq8.dot(Sq8.encode(col("u")), Sq8.encode(col("u"))).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = """\{"vec_id":(\d+),"d":(\d+)\}""".r
      .findAllMatchIn(out)
      .map(m => m.group(1).toLong -> m.group(2).toLong).toMap
    assert(got == expected, s"sq8 self-dots diverged: $got vs $expected")
    // sanity: every self-dot sits near 127²·‖u‖² = 16129. Rounding
    // noise on the cross-term 2·127·uᵢ·δᵢ (|δᵢ| ≤ ½) has per-vector
    // σ = √(254²/12 · Σuᵢ²) ≈ 73 at any dim, so 4σ ≈ 300 is a loose
    // statistical envelope (sf0.001 actual max |Δ| = 124).
    assert(expected.values.forall(d => math.abs(d - 16129L) <= 300L))
  }

  test("sqlQuery: graft_winnow_digest equals fingerprints' fp_digest") {
    graft.core.GraftSession.registerFunctions(spark)
    val out = engine.sqlQuery(
      s"""SELECT doc_id, graft_winnow_digest(text) AS d
         |FROM parquet.`$sf0001/documents.parquet`
         |WHERE doc_id < 20 ORDER BY doc_id""".stripMargin)
    val expected = graft.operators.Winnowing
      .fingerprints(spark.read.parquet(s"$sf0001/documents.parquet")
        .filter("doc_id < 20"))
      .select("doc_id", "fp_digest").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = """\{"doc_id":(\d+),"d":"([0-9a-f]{32})"\}""".r
      .findAllMatchIn(out)
      .map(m => m.group(1).toLong -> m.group(2)).toMap
    assert(got == expected, s"winnow digests diverged: $got vs $expected")
  }

  test("sqlQuery: graft_cdc_cuts equals the chunks() boundary list") {
    graft.core.GraftSession.registerFunctions(spark)
    val out = engine.sqlQuery(
      s"""SELECT doc_id, graft_cdc_cuts(text) AS cuts
         |FROM parquet.`$sf0001/documents.parquet`
         |WHERE doc_id < 10 ORDER BY doc_id""".stripMargin)
    assert(out.startsWith("""{"records":["""), out.take(120))
    import org.apache.spark.sql.functions._
    val expected = graft.operators.Cdc
      .chunks(spark.read.parquet(s"$sf0001/documents.parquet")
        .filter("doc_id < 10"))
      .withColumn("end_pos", col("start_pos") + col("chunk_len") - 1)
      .groupBy("doc_id")
      .agg(sort_array(collect_list("end_pos")).as("ends"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Long]]("ends").toList).toMap
    val got = """\{"doc_id":(\d+),"cuts":\[([0-9,]*)\]\}""".r
      .findAllMatchIn(out)
      .map(m => m.group(1).toLong ->
        m.group(2).split(',').filter(_.nonEmpty).map(_.toLong).toList).toMap
    assert(got == expected, s"cdc cuts diverged: $got vs $expected")
    // explicit divisor argument: bigger divisor -> no MORE cuts
    val wide = engine.sqlQuery(
      s"""SELECT sum(size(graft_cdc_cuts(text, 4096))) AS n
         |FROM parquet.`$sf0001/documents.parquet` WHERE doc_id < 10""".stripMargin)
    val narrow = engine.sqlQuery(
      s"""SELECT sum(size(graft_cdc_cuts(text, 16))) AS n
         |FROM parquet.`$sf0001/documents.parquet` WHERE doc_id < 10""".stripMargin)
    def n(s: String) = """"n":(\d+)""".r.findFirstMatchIn(s).get.group(1).toLong
    assert(n(wide) <= n(narrow))
  }

  test("sqlQuery: text-analysis scalars match their t03/t04/t05/t06 kernels") {
    graft.core.GraftSession.registerFunctions(spark)
    import graft.functions.TextFns
    import org.apache.spark.sql.functions.{col, size}
    val out = engine.sqlQuery(
      s"""SELECT doc_id, graft_lang_id(text) AS lid,
         |  graft_quality_score(text) AS q,
         |  graft_token_count(text) AS tc,
         |  graft_fingerprint(text) AS fp
         |FROM parquet.`$sf0001/documents.parquet`
         |WHERE doc_id < 25 ORDER BY doc_id""".stripMargin)
    assert(out.startsWith("""{"records":["""), out.take(120))
    val expected = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter("doc_id < 25")
      .select(col("doc_id"),
        TextFns.langIdColumn(col("text")).as("lid"),
        TextFns.qualityScore(col("text")).as("q"),
        size(TextFns.tokens(col("text"))).cast("long").as("tc"),
        TextFns.fingerprint(col("text")).as("fp"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getDouble(2), r.getLong(3), r.getString(4))).toMap
    val rec = ("""\{"doc_id":(\d+),"lid":"(\w+)","q":([0-9.E-]+),""" +
      """"tc":(\d+),"fp":"([0-9a-f]{32})"\}""").r
    val got = rec.findAllMatchIn(out).map(m => m.group(1).toLong ->
      (m.group(2), m.group(3).toDouble, m.group(4).toLong, m.group(5))).toMap
    assert(got.size == expected.size && got == expected,
      s"text scalars diverged (${got.size}/${expected.size})")
    // shape sanity: predictions come from the profile label set (the
    // ACCURACY of the heuristic is t03's oracled concern, not the SQL
    // function's — this case pins value-parity with that kernel)
    val labels = TextFns.langProfiles.map(_._1).toSet + "??"
    assert(got.values.forall(v => labels(v._1)))
  }

  test("sqlQuery: graft_ahash64 matches Multimodal's aHash and nulls on garbage") {
    graft.core.GraftSession.registerFunctions(spark)
    // deterministic synthetic image -> PNG bytes
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16)
      img.setRGB(x, y, if ((x / 4 + y / 4) % 2 == 0) 0xFFFFFF else 0x202020)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val expected = graft.operators.Multimodal.aHashOf(
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png)))
    val dir = tmpDir("graft-ahash")
    import spark.implicits._
    Seq((1L, png), (2L, Array[Byte](1, 2, 3)))
      .toDF("id", "img").write.mode("overwrite").parquet(dir)
    val out = engine.sqlQuery(
      s"SELECT id, graft_ahash64(img) AS h FROM parquet.`$dir` ORDER BY id")
    assert(out.contains(s""""h":$expected"""), out)
    // the records envelope OMITS null fields — the garbage row must
    // appear with no "h" key at all
    assert(out.contains("""{"id":2}"""), out)
  }

  test("SQL DML through the bridge: DELETE prunes files, UPDATE casts " +
      "assignments, MERGE upserts; snapshots stay time-travelable") {
    import spark.implicits._
    val cat = new SnapshotCatalog(spark, tmpDir("graft-dml"))
    val eng = new Engine(spark, cat)
    // three key-clustered files so range DML can prove file pruning
    cat.createTable("db", "kv",
      Seq.empty[(Long, String, Long)].toDF("id", "val", "score").schema)
    for (lo <- Seq(0L, 10L, 20L))
      cat.append("db", "kv",
        (lo until lo + 10L).map(i => (i, s"v$i", i * 10L))
          .toDF("id", "val", "score").coalesce(1))
    val snapBefore = cat.describe("db", "kv").currentSnapshotId.get

    // DELETE with a range predicate: only the intersecting file rewrites
    val del = eng.sqlQuery("DELETE FROM db.kv WHERE id >= 25")
    assert(del.contains(""""operation":"DELETE""""), del)
    assert(del.contains(""""rows_affected":5"""), del)
    // 3 files total, only the [20,29] file intersects id >= 25
    assert(del.contains(""""files_rewritten":1""") &&
      del.contains(""""files_total":3"""), del)
    assert(cat.read("db", "kv").count() == 25)

    // UPDATE with arithmetic on the column, bare-name references
    val upd = eng.sqlQuery("UPDATE db.kv SET score = score * 2 WHERE id < 3")
    assert(upd.contains(""""operation":"UPDATE"""") &&
      upd.contains(""""rows_affected":3"""), upd)
    val scores = cat.read("db", "kv")
      .filter(org.apache.spark.sql.functions.col("id") < 5)
      .orderBy("id").select("score").collect().map(_.getLong(0)).toSeq
    assert(scores == Seq(0L, 20L, 40L, 30L, 40L), scores)

    // MERGE upsert: id 2 replaced, id 100 inserted (VALUES source)
    val mrg = eng.sqlQuery(
      """MERGE INTO db.kv t
        |USING (SELECT 2 AS id, 'merged' AS val, 999 AS score
        |       UNION ALL SELECT 100, 'new', 1) s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(mrg.contains(""""operation":"MERGE"""") &&
      mrg.contains(""""rows_affected":2"""), mrg)
    val after = cat.read("db", "kv").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(after(2L) == (("merged", 999L)) && after(100L) == (("new", 1L)))
    assert(after.size == 26)

    // INSERT INTO: positional alignment + type cast, atomic append
    val ins = eng.sqlQuery(
      "INSERT INTO db.kv SELECT 200, 'ins', CAST(7 AS INT)")
    assert(ins.contains(""""operation":"INSERT"""") &&
      ins.contains(""""rows_affected":1"""), ins)
    val inserted = cat.read("db", "kv")
      .filter(org.apache.spark.sql.functions.col("id") === 200L).collect()
    assert(inserted.length == 1 &&
      inserted.head.getLong(2) == 7L, "cast to declared LONG type")

    // each statement was one atomic snapshot; history time-travels
    assert(cat.read("db", "kv", Some(snapBefore)).count() == 30)

    // an unsupported DML shape (non-equality ON) falls through to a
    // clean error, never a silent partial apply
    val bad = eng.sqlQuery(
      """MERGE INTO db.kv t USING (SELECT 1 AS id) s ON t.id >= s.id
        |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(bad.startsWith("""{"error":"""), bad)
    assert(cat.read("db", "kv").count() == 27, "partial apply detected")
  }

  test("general MERGE: conditional clauses, SET subsets, MATCHED DELETE, " +
      "NOT MATCHED BY SOURCE; INSERT column lists and OVERWRITE; " +
      "partitioned CTAS") {
    import spark.implicits._
    val cat = new SnapshotCatalog(spark, tmpDir("graft-dml2"))
    val eng = new Engine(spark, cat)
    cat.createTable("db", "acc",
      Seq.empty[(Long, String, Long)].toDF("id", "st", "bal").schema)
    for (lo <- Seq(0L, 10L))
      cat.append("db", "acc",
        (lo until lo + 10L).map(i => (i, if (i % 2 == 0) "open" else "hold", i * 100L))
          .toDF("id", "st", "bal").coalesce(1))

    // conditional MERGE: matched+open → SET subset; matched+hold →
    // DELETE; not matched → INSERT with column list semantics via
    // explicit values
    val mrg = eng.sqlQuery(
      """MERGE INTO db.acc t
        |USING (SELECT 4 AS id, 77 AS amt
        |       UNION ALL SELECT 5, 88
        |       UNION ALL SELECT 100, 99) s
        |ON t.id = s.id
        |WHEN MATCHED AND t.st = 'open' THEN UPDATE SET bal = t.bal + s.amt
        |WHEN MATCHED THEN DELETE
        |WHEN NOT MATCHED AND s.amt > 50
        |  THEN INSERT (id, st, bal) VALUES (s.id, 'new', s.amt)""".stripMargin)
    assert(mrg.contains(""""operation":"MERGE"""") &&
      mrg.contains(""""rows_affected":3"""), mrg)
    val m = cat.read("db", "acc").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(m(4L) == (("open", 477L)), "SET subset must keep other columns")
    assert(!m.contains(5L), "matched hold row must be deleted")
    assert(m(100L) == (("new", 99L)), "conditional insert must fire")
    assert(m.size == 20, s"got ${m.size} rows")
    // the source key range [4,100] intersects both files' key ranges,
    // so both rewrite (the key-range pruning bound, not table size)
    assert(mrg.contains(""""files_rewritten":2""") &&
      mrg.contains(""""files_total":2"""), mrg)

    // NOT MATCHED BY SOURCE: rows absent from the source get updated
    val nms = eng.sqlQuery(
      """MERGE INTO db.acc t
        |USING (SELECT 100 AS id, 0 AS amt) s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET bal = 0
        |WHEN NOT MATCHED BY SOURCE AND t.st = 'hold' THEN DELETE""".stripMargin)
    assert(nms.contains(""""rows_affected":10"""), nms) // 1 matched + 9 holds
    val after = cat.read("db", "acc").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(after(100L)._2 == 0L)
    assert(!after.values.exists(_._1 == "hold"), "holds must be gone")

    // INSERT with an explicit column list: unnamed columns null-pad
    val insL = eng.sqlQuery("INSERT INTO db.acc (bal, id) SELECT 5, 500")
    assert(insL.contains(""""rows_affected":1"""), insL)
    val r500 = cat.read("db", "acc")
      .filter(org.apache.spark.sql.functions.col("id") === 500L).head()
    assert(r500.isNullAt(1) && r500.getLong(2) == 5L,
      "unnamed column must null-pad; list order must bind positionally")
    // unknown / duplicate names rejected cleanly
    assert(eng.sqlQuery("INSERT INTO db.acc (nope) SELECT 1")
      .startsWith("""{"error":"""))
    assert(eng.sqlQuery("INSERT INTO db.acc (id, id) SELECT 1, 2")
      .startsWith("""{"error":"""))

    // INSERT OVERWRITE: one atomic snapshot replacing the manifest
    val before = cat.describe("db", "acc").currentSnapshotId.get
    val ovw = eng.sqlQuery(
      "INSERT OVERWRITE db.acc SELECT 1, 'only', 42")
    assert(ovw.contains(""""operation":"INSERT OVERWRITE"""") &&
      ovw.contains(""""rows_affected":1"""), ovw)
    assert(cat.read("db", "acc").count() == 1)
    // history survives: the pre-overwrite snapshot still time-travels
    assert(cat.read("db", "acc", Some(before)).count() > 1)

    // partitioned CTAS: the PARTITIONED BY clause becomes the hidden
    // partition.spec, appends split into value-pure files
    val ctas = eng.sqlQuery(
      """CREATE TABLE db.bydate PARTITIONED BY (bucket(4, k)) AS
        |SELECT id AS k, CAST(id * 2 AS BIGINT) AS v FROM range(100)""".stripMargin)
    assert(ctas.contains(""""operation":"CTAS"""") &&
      ctas.contains(""""rows_affected":100"""), ctas)
    assert(cat.describe("db", "bydate")
      .properties(graft.catalog.PartitionSpec.PropertyKey) == "bucket(4, k)")
    // equality lookups on the bucketed key prune to one bucket's files
    val snapB = cat.describe("db", "bydate").currentSnapshot.get
    val keptB = cat.prunedFilesBloom(snapB, "k", "7").size
    assert(cat.readEquals("db", "bydate", "k", "7").count() == 1)
    assert(eng.sqlQuery("SELECT count(*) AS n FROM db.bydate")
      .contains(""""n":100"""))
    // a multi-transform clause falls through to a clean rejection
    assert(eng.sqlQuery(
      """CREATE TABLE db.multi (a BIGINT, b BIGINT)
        |PARTITIONED BY (bucket(4, a), bucket(4, b))""".stripMargin)
      .startsWith("""{"error":"""))
    assert(keptB <= snapB.files.size)
  }

  test("SQL DDL through the bridge: CREATE, CTAS, INSERT, SELECT, DROP " +
      "— the full lifecycle in raw SQL") {
    val cat = new SnapshotCatalog(spark, tmpDir("graft-ddl"))
    val eng = new Engine(spark, cat)
    val ct = eng.sqlQuery("CREATE TABLE db.fresh (id BIGINT, name STRING)")
    assert(ct.contains(""""operation":"CREATE""""), ct)
    assert(cat.tableExists("db", "fresh"))
    assert(cat.schemaOf("db", "fresh").fieldNames.toSeq == Seq("id", "name"))
    // creating again fails; IF NOT EXISTS is a no-op
    assert(eng.sqlQuery("CREATE TABLE db.fresh (x INT)")
      .startsWith("""{"error":"""))
    assert(eng.sqlQuery("CREATE TABLE IF NOT EXISTS db.fresh (x INT)")
      .contains(""""operation":"CREATE""""))
    assert(cat.schemaOf("db", "fresh").fieldNames.length == 2, "no clobber")
    // populate + read back through the same SQL surface
    assert(eng.sqlQuery("INSERT INTO db.fresh SELECT 1, 'a'")
      .contains(""""rows_affected":1"""))
    val ctas = eng.sqlQuery(
      s"CREATE TABLE db.copies AS SELECT r_regionkey AS k, r_name AS v " +
        s"FROM parquet.`$sf0001/region.parquet`")
    assert(ctas.contains(""""operation":"CTAS"""") &&
      ctas.contains(""""rows_affected":5"""), ctas)
    val sel = eng.sqlQuery("SELECT count(*) AS n FROM db.copies")
    assert(sel.contains(""""n":5"""), sel)
    // drop: gone from the catalog, SELECT now errors, IF EXISTS no-op
    assert(eng.sqlQuery("DROP TABLE db.copies")
      .contains(""""operation":"DROP""""))
    assert(!cat.tableExists("db", "copies"))
    assert(eng.sqlQuery("SELECT * FROM db.copies")
      .startsWith("""{"error":"""))
    assert(eng.sqlQuery("DROP TABLE IF EXISTS db.copies")
      .contains(""""operation":"DROP""""))
    assert(eng.sqlQuery("DROP TABLE db.copies").startsWith("""{"error":"""))
    // ALTER TABLE ADD COLUMNS: metadata-only evolution — the
    // pre-evolution row null-pads, new inserts carry the column
    assert(eng.sqlQuery("ALTER TABLE db.fresh ADD COLUMNS (score BIGINT)")
      .contains(""""operation":"ALTER""""))
    assert(eng.sqlQuery("INSERT INTO db.fresh SELECT 2, 'b', 9")
      .contains(""""rows_affected":1"""))
    val evolved = eng.sqlQuery(
      "SELECT id, score FROM db.fresh ORDER BY id")
    // records envelope omits null fields: row 1 has no score key
    assert(evolved.contains("""{"id":1}""") &&
      evolved.contains(""""id":2,"score":9"""), evolved)
    // duplicate add rejected by the BACKWARD gate
    assert(eng.sqlQuery("ALTER TABLE db.fresh ADD COLUMNS (score BIGINT)")
      .startsWith("""{"error":"""))
    // RENAME COLUMN: metadata-only; rows 1 and 2 (written under the
    // old name, in different schema eras) both resolve by field id
    assert(eng.sqlQuery("ALTER TABLE db.fresh RENAME COLUMN name TO label")
      .contains(""""operation":"ALTER""""))
    val renamed = eng.sqlQuery(
      "SELECT id, label FROM db.fresh ORDER BY id")
    assert(renamed.contains(""""id":1,"label":"a"""") &&
      renamed.contains(""""id":2,"label":"b""""), renamed)
    // the old name is gone from the SQL surface
    assert(eng.sqlQuery("SELECT name FROM db.fresh")
      .startsWith("""{"error":"""))
    // DROP COLUMN: metadata-only; re-adding the name gets a fresh id,
    // so the dropped data never resurfaces
    assert(eng.sqlQuery("ALTER TABLE db.fresh DROP COLUMN label")
      .contains(""""operation":"ALTER""""))
    assert(eng.sqlQuery("ALTER TABLE db.fresh ADD COLUMNS (label STRING)")
      .contains(""""operation":"ALTER""""))
    val readded = eng.sqlQuery(
      "SELECT count(label) AS n FROM db.fresh")
    assert(readded.contains(""""n":0"""), s"dropped data resurfaced: $readded")
    assert(eng.sqlQuery("ALTER TABLE db.fresh DROP COLUMN nope")
      .startsWith("""{"error":"""))
    assert(eng.sqlQuery("ALTER TABLE db.fresh DROP COLUMN IF EXISTS nope")
      .contains(""""operation":"ALTER""""))
  }

  test("scopedRelease: a request's persisted state is freed at exit; " +
      "an overlapping scope's exit defers release to quiescence") {
    val sc = spark.sparkContext
    graft.core.CacheHygiene.releaseAll(spark)
    val before = sc.getPersistentRDDs.size
    // sequential: checkpoint + persist inside one scope → gone after it
    engine.scopedRelease {
      import spark.implicits._
      val ck = spark.range(100).toDF("x").localCheckpoint(true)
      val cp = Seq(1, 2, 3).toDF("y").persist()
      assert(cp.count() == 3 && ck.count() == 100)
      assert(sc.getPersistentRDDs.size >= before + 2)
    }
    assert(sc.getPersistentRDDs.size == before,
      "a sequential request loop must release per query (the stateless " +
        "duckdb_rest_server request-loop behavior)")
    // overlap: the inner scope exits while the outer is mid-flight —
    // release MUST be deferred (freeing now would drop the outer
    // query's checkpoint blocks, which cannot recompute)
    engine.scopedRelease {
      val ck = spark.range(50).toDF("z").localCheckpoint(true)
      assert(ck.count() == 50)
      engine.scopedRelease { engine.health() }
      assert(sc.getPersistentRDDs.size > before,
        "an overlapping request's exit must not free in-flight blocks")
      assert(ck.count() == 50, "the checkpoint must still be readable")
    }
    assert(sc.getPersistentRDDs.size == before,
      "the last scope of the burst releases everything")
  }

  test("DML semantics: DELETE keeps NULL-predicate rows; UPDATE evaluates " +
      "all assignments against the pre-update row") {
    import spark.implicits._
    val cat = new SnapshotCatalog(spark, tmpDir("graft-dml-sem"))
    val eng = new Engine(spark, cat)
    // x = NULL rows: `WHERE x > 5` is NULL there → NOT deleted, NOT counted
    cat.createTable("db", "nulls",
      Seq.empty[(Long, Option[Long])].toDF("id", "x").schema)
    cat.append("db", "nulls", Seq(
      (1L, Some(10L)), (2L, Some(3L)), (3L, None), (4L, None))
      .toDF("id", "x"))
    val del = eng.sqlQuery("DELETE FROM db.nulls WHERE x > 5")
    assert(del.contains(""""rows_affected":1"""), del)
    val left = cat.read("db", "nulls").select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(left == Seq(2L, 3L, 4L),
      s"NULL-x rows must survive a `x > 5` DELETE, got ids $left")

    // SET a = a + 1, b = a: b gets the ORIGINAL a (simultaneous eval)
    cat.createTable("db", "sim",
      Seq.empty[(Long, Long, Long)].toDF("id", "a", "b").schema)
    cat.append("db", "sim", Seq((1L, 10L, 0L)).toDF("id", "a", "b"))
    val upd = eng.sqlQuery("UPDATE db.sim SET a = a + 1, b = a")
    assert(upd.contains(""""rows_affected":1"""), upd)
    val r = cat.read("db", "sim").head()
    assert(r.getLong(1) == 11L && r.getLong(2) == 10L,
      s"b must see the pre-update a: got a=${r.getLong(1)} b=${r.getLong(2)}")
    // duplicate assignment targets are rejected, not silently last-wins
    assert(eng.sqlQuery("UPDATE db.sim SET a = 1, a = 2")
      .startsWith("""{"error":"""))
  }

  test("SQL DELETE write-path: merge-on-read leaves data files " +
      "byte-identical and hash-matches the copy-on-write answer") {
    import spark.implicits._
    def md5Of(p: String) = {
      val b = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
      java.security.MessageDigest.getInstance("MD5").digest(b)
        .map("%02x".format(_)).mkString
    }
    val cat = new SnapshotCatalog(spark, tmpDir("graft-mor"))
    val eng = new Engine(spark, cat)
    def mkTable(t: String, mode: Option[String]): Unit = {
      cat.createTable("db", t,
        Seq.empty[(Long, Double)].toDF("id", "v").schema)
      mode.foreach(m => cat.updateProperties("db", t,
        Map(SnapshotCatalog.DeleteModeProp -> m)): Unit)
      for (lo <- Seq(0L, 10L, 20L))
        cat.append("db", t,
          (lo until lo + 10L).map(i => (i, i.toDouble)).toDF("id", "v")
            .coalesce(1))
    }
    mkTable("mor", Some("merge-on-read"))
    mkTable("cow", Some("copy-on-write"))
    val morFiles = cat.describe("db", "mor").currentSnapshot.get.files
    val morHashes = morFiles.map(f => f -> md5Of(f)).toMap

    // same DELETE through both write paths
    for (t <- Seq("mor", "cow"))
      assert(eng.sqlQuery(s"DELETE FROM db.$t WHERE id >= 7 AND id < 13")
        .contains(""""rows_affected":6"""))
    // MoR: identical file list, identical bytes; files_rewritten = 0
    val morAfter = cat.describe("db", "mor").currentSnapshot.get
    assert(morAfter.files == morFiles && morAfter.deleteFiles.nonEmpty)
    morFiles.foreach(f => assert(md5Of(f) == morHashes(f)))
    // both paths give the same answer, row for row
    val a = eng.sqlQuery("SELECT * FROM db.mor ORDER BY id")
    val b = eng.sqlQuery("SELECT * FROM db.cow ORDER BY id")
    assert(a == b, s"MoR and CoW answers diverged:\n$a\n$b")
    // metadata-only count subtracts the delete side exactly
    assert(eng.sqlQuery("SELECT count(*) AS n FROM db.mor")
      .contains(""""n":24"""))
    // q43-style time travel still sees the pre-delete state
    assert(eng.sqlQuery(
      "SELECT count(*) AS n FROM db.mor VERSION AS OF 3")
      .contains(""""n":30"""))
    // delete_files metadata table lists the delete side
    assert(eng.sqlQuery(
      "SELECT count(*) AS n FROM db.mor.delete_files").contains(""""n":1"""))

    // merge-on-read UPDATE (write.update.mode): one atomic commit,
    // data files untouched, answers identical to the CoW table
    cat.updateProperties("db", "mor",
      Map("write.update.mode" -> "merge-on-read"))
    val preUpd = cat.describe("db", "mor").currentSnapshot.get
    for (t <- Seq("mor", "cow"))
      assert(eng.sqlQuery(
        s"UPDATE db.$t SET v = v + 0.5 WHERE id >= 20 AND id < 24")
        .contains(""""rows_affected":4"""))
    val updAfter = cat.describe("db", "mor").currentSnapshot.get
    assert(preUpd.files.forall(updAfter.files.contains),
      "merge-on-read UPDATE must not rewrite old data files")
    assert(updAfter.deleteFiles.size > preUpd.deleteFiles.size)
    val a2 = eng.sqlQuery("SELECT * FROM db.mor ORDER BY id")
    val b2 = eng.sqlQuery("SELECT * FROM db.cow ORDER BY id")
    assert(a2 == b2, s"MoR and CoW UPDATE answers diverged:\n$a2\n$b2")
    assert(eng.sqlQuery("SELECT count(*) AS n FROM db.mor")
      .contains(""""n":24"""))

    // AUTO mode: a small fraction goes merge-on-read, a large one
    // copy-on-write
    mkTable("auto", None)
    val autoFiles = cat.describe("db", "auto").currentSnapshot.get.files
    eng.sqlQuery("DELETE FROM db.auto WHERE id = 3") // 1 of 10 candidate rows
    val s1 = cat.describe("db", "auto").currentSnapshot.get
    assert(s1.files == autoFiles && s1.deleteFiles.size == 1,
      "small fraction must take the merge-on-read path")
    eng.sqlQuery("DELETE FROM db.auto WHERE id < 25") // most rows
    val s2 = cat.describe("db", "auto").currentSnapshot.get
    assert(s2.files != autoFiles,
      "large fraction must take the copy-on-write path")
    assert(eng.sqlQuery("SELECT count(*) AS n FROM db.auto")
      .contains(""""n":5"""))
  }

  test("property: manifest pruning under random predicates never skips " +
      "a file containing a matching row, and pruned ≡ unpruned") {
    import org.scalacheck.{Gen, rng}
    import spark.implicits._
    val cat = new SnapshotCatalog(spark, tmpDir("graft-prop"))
    val eng = new Engine(spark, cat)
    cat.createTable("db", "p",
      Seq.empty[(Long, Double, String)].toDF("a", "b", "s").schema)
    val schema = cat.schemaOf("db", "p")

    case class R(a: Long, b: Double, s: String)
    def cmp[T](op: String, x: T, y: T)(implicit o: Ordering[T]): Boolean =
      op match {
        case "<" => o.lt(x, y);  case "<=" => o.lteq(x, y)
        case ">" => o.gt(x, y);  case ">=" => o.gteq(x, y)
        case "=" => o.equiv(x, y)
      }
    sealed trait Atom { def sql: String; def eval(r: R): Boolean }
    case class AtomA(op: String, v: Long, flip: Boolean) extends Atom {
      def sql = if (flip) s"$v $op a" else s"a $op $v"
      def eval(r: R) = if (flip) cmp(op, v, r.a) else cmp(op, r.a, v)
    }
    case class AtomB(op: String, v: Double, flip: Boolean) extends Atom {
      def sql = if (flip) s"$v $op b" else s"b $op $v"
      def eval(r: R) = if (flip) cmp(op, v, r.b) else cmp(op, r.b, v)
    }
    case class AtomS(op: String, v: String, flip: Boolean) extends Atom {
      def sql = if (flip) s"'$v' $op s" else s"s $op '$v'"
      def eval(r: R) = if (flip) cmp(op, v, r.s) else cmp(op, r.s, v)
    }
    case object Noise extends Atom { // extractBounds can't use this —
      def sql = "a % 2 = 0"          // it must only make pruning looser
      def eval(r: R) = r.a % 2 == 0
    }
    val genOp = Gen.oneOf("<", "<=", ">", ">=", "=")
    val genRow = for {
      a <- Gen.chooseNum(-20L, 20L)
      b <- Gen.chooseNum(-10, 10).map(_ * 0.5)
      s <- Gen.oneOf("aa", "ab", "ba", "bb", "ca", "z")
    } yield R(a, b, s)
    val genAtom: Gen[Atom] = Gen.frequency(
      (4, for { o <- genOp; v <- Gen.chooseNum(-22L, 22L); f <- Gen.oneOf(true, false) } yield AtomA(o, v, f)),
      (3, for { o <- genOp; v <- Gen.chooseNum(-11, 11).map(_ * 0.5); f <- Gen.oneOf(true, false) } yield AtomB(o, v, f)),
      (3, for { o <- genOp; v <- Gen.oneOf("aa", "am", "ba", "bz", "z", "0"); f <- Gen.oneOf(true, false) } yield AtomS(o, v, f)),
      (1, Gen.const(Noise: Atom)))
    val genCase = for {
      nFiles <- Gen.chooseNum(1, 4)
      files <- Gen.listOfN(nFiles, Gen.nonEmptyListOf(genRow).map(_.take(12)))
      nAtoms <- Gen.chooseNum(1, 4)
      atoms <- Gen.listOfN(nAtoms, genAtom)
      statless <- Gen.chooseNum(0, nFiles) // files w/o stats: always kept
    } yield (files, atoms, statless)
    val cases = Gen.listOfN(200, genCase)
      .apply(Gen.Parameters.default, rng.Seed(1234L))
      .getOrElse(sys.error("gen failed"))

    // per-file stats EXACTLY as the write side renders them: numerics
    // min/max as double strings, strings raw; blooms for a (integral
    // rendering) and s (raw)
    def bloomOf(values: Seq[String]): String = {
      val bits = new Array[Byte](SnapshotCatalog.BloomBits / 8)
      values.flatMap(SnapshotCatalog.bloomPositions).foreach { p =>
        bits(p >> 3) = (bits(p >> 3) | (1 << (p & 7))).toByte
      }
      java.util.Base64.getEncoder.encodeToString(bits)
    }
    var checked = 0
    cases.foreach { case (files, atoms, statless) =>
      val stats = files.zipWithIndex.map { case (rows, i) =>
        SnapshotCatalog.FileStats(
          path = s"f$i", rows = rows.size,
          min = Map(
            "a" -> rows.map(_.a).min.toDouble.toString,
            "b" -> rows.map(_.b).min.toString,
            "s" -> rows.map(_.s).min),
          max = Map(
            "a" -> rows.map(_.a).max.toDouble.toString,
            "b" -> rows.map(_.b).max.toString,
            "s" -> rows.map(_.s).max),
          blooms = Some(Map(
            "a" -> bloomOf(rows.map(_.a.toString)),
            "s" -> bloomOf(rows.map(_.s)))))
      }.drop(statless) // statless files carry no stats at all
      val snap = SnapshotCatalog.SnapshotMeta(
        snapshotId = 1L, parentId = None, sequenceNumber = 1L,
        files = files.indices.map(i => s"f$i"),
        rowCount = files.map(_.size).sum.toLong,
        createdAtMs = 0L, fileStats = stats)
      val cond = spark.sessionState.sqlParser
        .parseExpression(atoms.map(_.sql).mkString(" AND "))
      val bounds = Engine.extractBounds(cond, schema)
      val kept = eng.prunedFilesFor("db", "p", snap, bounds).toSet
      files.zipWithIndex.foreach { case (rows, i) =>
        if (rows.exists(r => atoms.forall(_.eval(r)))) {
          assert(kept.contains(s"f$i"),
            s"pruning dropped f$i which matches '${atoms.map(_.sql).mkString(" AND ")}' " +
              s"(rows=$rows, bounds=$bounds)")
          checked += 1
        }
      }
    }
    assert(checked > 100, s"property exercised only $checked matching files")

    // end-to-end restatement on REAL files: pruned bridge read ≡
    // unpruned filter, row for row
    val rows = cases.take(3).flatMap(_._1.flatten)
    rows.grouped(20).foreach(g =>
      cat.append("db", "p", g.map(r => (r.a, r.b, r.s)).toDF("a", "b", "s")
        .coalesce(1)))
    for (pred <- Seq("a > 5", "a = 3 AND s = 'ab'", "b <= -1.5",
        "s >= 'b' AND a < 0", "7 < a AND a % 2 = 0")) {
      val (df, _) = eng.sqlDataFrame(
        s"SELECT a, b, s FROM db.p WHERE $pred")
      val got = df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
        .sorted.toSeq
      val want = cat.read("db", "p")
        .filter(org.apache.spark.sql.functions.expr(pred)).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sorted.toSeq
      assert(got == want, s"pruned ≠ unpruned for '$pred'")
    }
  }

  test("query budget: a runaway SQL is cancelled within the budget and " +
      "returns the reference error envelope") {
    // reference behavior to match: duckdb_rest_server.py:58 bounds S3
    // reads at 300 s — here the budget covers the whole query
    val bounded = new Engine(spark, engine.catalog, queryBudgetSec = 3)
    val t0 = System.nanoTime()
    // ~1e13 products: hours of work if never cancelled
    val out = bounded.sqlQuery(
      "SELECT sum(a.id * b.id) AS s FROM range(1000) a CROSS JOIN range(10000000000) b")
    val sec = (System.nanoTime() - t0) / 1e9
    assert(out.startsWith("""{"error":"""), out.take(200))
    assert(sec < 90, s"cancellation returned only after $sec s")
    // the session must stay healthy for the next request
    val ok = bounded.sqlQuery(
      s"SELECT count(*) AS n FROM parquet.`$sf0001/region.parquet`")
    assert(ok.contains(""""n":5"""), ok)
  }

  test("MERGE write.merge.mode=merge-on-read: general and whole-row " +
      "shapes commit deletes + new versions atomically, data files " +
      "untouched, answers hash-equal to copy-on-write") {
    import spark.implicits._
    val cat = new SnapshotCatalog(spark, tmpDir("graft-mmor"))
    val eng = new Engine(spark, cat)
    def mk(t: String, mor: Boolean): Unit = {
      cat.createTable("db", t,
        Seq.empty[(Long, Double)].toDF("id", "v").schema)
      if (mor) cat.updateProperties("db", t,
        Map("write.merge.mode" -> "merge-on-read")): Unit
      for (lo <- Seq(0L, 10L))
        cat.append("db", t,
          (lo until lo + 10L).map(i => (i, i.toDouble)).toDF("id", "v")
            .coalesce(1))
    }
    mk("m", mor = true); mk("c", mor = false)
    val morFiles = cat.describe("db", "m").currentSnapshot.get.files
    val src = "(SELECT CAST(id AS BIGINT) AS id, CAST(id*10 AS DOUBLE) AS v " +
      "FROM (VALUES (5),(6),(15),(100),(101)) AS x(id))"
    def mergeSql(t: String) =
      s"""MERGE INTO db.$t t USING $src s ON t.id = s.id
         |WHEN MATCHED AND t.id < 10 THEN UPDATE SET v = s.v
         |WHEN MATCHED THEN DELETE
         |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)"""
        .stripMargin
    for (t <- Seq("m", "c")) {
      val out = eng.sqlQuery(mergeSql(t))
      assert(out.contains(""""rows_affected":5"""), out)
      // the MoR summary reports its delete file, the CoW one its bytes
      if (t == "m") assert(out.contains(""""delete_files_written":1""") &&
        out.contains(""""bytes_rewritten":0"""), out)
      else assert(out.contains(""""delete_files_written":0""") &&
        !out.contains(""""bytes_rewritten":0"""), out)
    }
    val after = cat.describe("db", "m").currentSnapshot.get
    assert(morFiles.forall(after.files.contains),
      "merge-on-read MERGE must not rewrite data files")
    assert(after.deleteFiles.nonEmpty)
    val a = eng.sqlQuery("SELECT * FROM db.m ORDER BY id")
    val b = eng.sqlQuery("SELECT * FROM db.c ORDER BY id")
    assert(a == b, s"MoR and CoW MERGE answers diverged:\n$a\n$b")

    // whole-row fast path under MoR rides the CDC commit shape:
    // equality delete + append, zero existing data read or rewritten
    val pre2 = cat.describe("db", "m").currentSnapshot.get
    def upSql(t: String) =
      s"""MERGE INTO db.$t t USING $src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin
    for (t <- Seq("m", "c"))
      assert(eng.sqlQuery(upSql(t)).contains(""""rows_affected":5"""))
    val after2 = cat.describe("db", "m").currentSnapshot.get
    assert(pre2.files.forall(after2.files.contains),
      "whole-row MoR MERGE must not rewrite data files")
    assert(after2.eqDeletes.nonEmpty)
    val a2 = eng.sqlQuery("SELECT * FROM db.m ORDER BY id")
    val b2 = eng.sqlQuery("SELECT * FROM db.c ORDER BY id")
    assert(a2 == b2, s"MoR and CoW upsert answers diverged:\n$a2\n$b2")
  }

  test("MERGE cardinality violation: a target row matched by two source " +
      "rows is rejected, not silently duplicated") {
    import spark.implicits._
    val cat = new SnapshotCatalog(spark, tmpDir("graft-mcard"))
    val eng = new Engine(spark, cat)
    cat.createTable("db", "t", Seq.empty[(Long, Double)].toDF("id", "v").schema)
    cat.append("db", "t", (0L until 5L).map(i => (i, i.toDouble)).toDF("id", "v"))
    val out = eng.sqlQuery(
      """MERGE INTO db.t t
        |USING (SELECT CAST(id AS BIGINT) AS id, CAST(9 AS DOUBLE) AS v
        |       FROM (VALUES (2),(2)) AS x(id)) s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
    assert(out.startsWith("""{"error""""), out)
    assert(out.contains("MERGE_CARDINALITY_VIOLATION"), out)
    // nothing committed
    assert(eng.sqlQuery("SELECT count(*) AS n FROM db.t")
      .contains(""""n":5"""))
    assert(eng.sqlQuery("SELECT sum(v) AS s FROM db.t")
      .contains(""""s":10.0"""))
  }

  test("insert-only MERGE over a many-to-one ON condition is LEGAL: " +
      "kept rows stay single, inserts land, zero rewrites") {
    import spark.implicits._
    val cat = new SnapshotCatalog(spark, tmpDir("graft-mins"))
    val eng = new Engine(spark, cat)
    cat.createTable("db", "t", Seq.empty[(Long, Double)].toDF("id", "v").schema)
    cat.append("db", "t", (0L until 5L).map(i => (i, i.toDouble)).toDF("id", "v"))
    // id=2 matches TWICE — standard SQL permits this when no matched/
    // by-source action exists; id=7 is the one real insert
    val out = eng.sqlQuery(
      """MERGE INTO db.t t
        |USING (SELECT CAST(id AS BIGINT) AS id, CAST(9 AS DOUBLE) AS v
        |       FROM (VALUES (2),(2),(7)) AS x(id)) s
        |ON t.id = s.id
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(!out.startsWith("""{"error""""), out)
    assert(out.contains(""""rows_affected":1"""), out)
    assert(out.contains(""""files_rewritten":0"""), out)
    assert(eng.sqlQuery("SELECT count(*) AS n FROM db.t")
      .contains(""""n":6"""))
    // the doubly-matched target row was kept exactly ONCE
    assert(eng.sqlQuery("SELECT count(*) AS n FROM db.t WHERE id = 2")
      .contains(""""n":1"""))
    assert(eng.sqlQuery("SELECT v AS v FROM db.t WHERE id = 7")
      .contains(""""v":9.0"""))
  }

  test("whole-row MoR MERGE with an EMPTY source reports zero delete " +
      "files written") {
    import spark.implicits._
    val cat = new SnapshotCatalog(spark, tmpDir("graft-mempty"))
    val eng = new Engine(spark, cat)
    cat.createTable("db", "t", Seq.empty[(Long, Double)].toDF("id", "v").schema)
    cat.updateProperties("db", "t", Map("write.merge.mode" -> "merge-on-read"))
    cat.append("db", "t", (0L until 5L).map(i => (i, i.toDouble)).toDF("id", "v"))
    val out = eng.sqlQuery(
      """MERGE INTO db.t t
        |USING (SELECT CAST(1 AS BIGINT) AS id, CAST(1 AS DOUBLE) AS v
        |       WHERE 1 = 0) s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(!out.startsWith("""{"error""""), out)
    assert(out.contains(""""rows_affected":0"""), out)
    // cdcUpsert drops the empty delete parquet — the summary must not
    // claim a delete file that was never committed
    assert(out.contains(""""delete_files_written":0"""), out)
    assert(cat.describe("db", "t").currentSnapshot.get.eqDeletes.isEmpty)
  }

  test("ALTER TABLE SET/UNSET TBLPROPERTIES through SQL drives the " +
      "write-path knobs") {
    import spark.implicits._
    val cat = new SnapshotCatalog(spark, tmpDir("graft-props"))
    val eng = new Engine(spark, cat)
    cat.createTable("db", "t", Seq.empty[(Long, Double)].toDF("id", "v").schema)
    cat.append("db", "t", (0L until 100L).map(i => (i, i.toDouble)).toDF("id", "v"))
    val st = eng.sqlQuery(
      "ALTER TABLE db.t SET TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')")
    assert(st.contains(""""operation":"ALTER""""), st)
    assert(cat.describe("db", "t").properties
      .get("write.delete.mode").contains("merge-on-read"))
    // the property picks the write path: a needle DELETE goes MoR
    val del = eng.sqlQuery("DELETE FROM db.t WHERE id = 3")
    assert(del.contains(""""delete_files_written":1""") &&
      del.contains(""""files_rewritten":0"""), del)
    // UNSET drops it; a missing key refuses without IF EXISTS
    assert(!eng.sqlQuery(
      "ALTER TABLE db.t UNSET TBLPROPERTIES ('write.delete.mode')")
      .startsWith("""{"error""""))
    assert(!cat.describe("db", "t").properties.contains("write.delete.mode"))
    assert(eng.sqlQuery("ALTER TABLE db.t UNSET TBLPROPERTIES ('nope')")
      .startsWith("""{"error""""))
    assert(!eng.sqlQuery(
      "ALTER TABLE db.t UNSET TBLPROPERTIES IF EXISTS ('nope')")
      .startsWith("""{"error""""))
  }

  test("SHOW TABLES LIKE follows glob semantics: literal metacharacters " +
      "are quoted, '*' and '|' translate") {
    import spark.implicits._
    val cat = new SnapshotCatalog(spark, tmpDir("graft-like"))
    val eng = new Engine(spark, cat)
    val schema = Seq.empty[(Long, Double)].toDF("id", "v").schema
    cat.createTable("db", "tx", schema)
    cat.createTable("db", "t1", schema)
    cat.createTable("db", "other", schema)
    // a literal '.' must NOT behave as regex any-char
    assert(!eng.sqlQuery("SHOW TABLES IN db LIKE 't.'")
      .contains(""""tableName""""))
    // regex metacharacters must not throw (PatternSyntaxException)
    assert(!eng.sqlQuery("SHOW TABLES IN db LIKE 't+'")
      .startsWith("""{"error""""))
    assert(!eng.sqlQuery("SHOW TABLES IN db LIKE '('")
      .startsWith("""{"error""""))
    // '*' glob and '|' alternation
    val globbed = eng.sqlQuery("SHOW TABLES IN db LIKE 't*'")
    assert(globbed.contains(""""tableName":"tx"""") &&
      globbed.contains(""""tableName":"t1"""") &&
      !globbed.contains(""""tableName":"other""""), globbed)
    val alts = eng.sqlQuery("SHOW TABLES IN db LIKE 'tx|other'")
    assert(alts.contains(""""tableName":"tx"""") &&
      alts.contains(""""tableName":"other"""") &&
      !alts.contains(""""tableName":"t1""""), alts)
  }

  test("changes() table function: SQL-reachable changelog; VERSION AS " +
      "OF resolves named refs (tags)") {
    import spark.implicits._
    val cat = new SnapshotCatalog(spark, tmpDir("graft-chsql"))
    val eng = new Engine(spark, cat)
    cat.createTable("db", "t", Seq.empty[(Long, Double)].toDF("id", "v").schema)
    cat.append("db", "t", (0L until 10L).map(i => (i, i.toDouble)).toDF("id", "v"))
    val s1 = cat.describe("db", "t").currentSnapshotId.get
    cat.createTag("db", "t", "audit-base", None)
    cat.cdcUpsert("db", "t", rows = Seq((3L, 33.0), (100L, 1.0)).toDF("id", "v"),
      deletes = Seq(7L).toDF("id"), Seq("id"))
    val s2 = cat.describe("db", "t").currentSnapshotId.get
    cat.cdcUpsert("db", "t", rows = Seq((200L, 2.0)).toDF("id", "v"),
      deletes = Seq.empty[Long].toDF("id"), Seq("id"))
    // open window [s1, current]: both CDC batches
    val out = eng.sqlQuery(
      s"SELECT _change_type, id, v FROM changes('db.t', $s1) " +
        "ORDER BY _change_type, id")
    for (frag <- Seq(
        """{"_change_type":"delete","id":3,"v":3.0}""",
        """{"_change_type":"delete","id":7,"v":7.0}""",
        """{"_change_type":"insert","id":3,"v":33.0}""",
        """{"_change_type":"insert","id":100,"v":1.0}""",
        """{"_change_type":"insert","id":200,"v":2.0}"""))
      assert(out.contains(frag), s"missing $frag in $out")
    // bounded window [s1, s2]: only the first batch; aggregation works
    val agg = eng.sqlQuery(
      s"SELECT _change_type, count(*) AS n FROM changes('db.t', $s1, $s2) " +
        "GROUP BY _change_type ORDER BY _change_type")
    assert(agg.contains(""""_change_type":"delete","n":2""") &&
      agg.contains(""""_change_type":"insert","n":2"""), agg)
    // a named ref resolves through VERSION AS OF (tags pin audits)
    assert(eng.sqlQuery(
      "SELECT count(*) AS n FROM db.t VERSION AS OF 'audit-base'")
      .contains(""""n":10"""))
    // ...and as a changes() window endpoint: consume since the tag
    assert(eng.sqlQuery(
      "SELECT count(*) AS n FROM changes('db.t', 'audit-base')")
      .contains(""""n":5"""))
    // changes() composes through CTEs and joins like any relation
    assert(eng.sqlQuery(
      s"""WITH w AS (SELECT * FROM changes('db.t', $s1))
         |SELECT count(*) AS n FROM w
         |JOIN db.t cur ON w.id = cur.id
         |WHERE w._change_type = 'insert'""".stripMargin)
      .contains(""""n":3"""), "CTE-wrapped changes() failed")
    // unknown function / unknown ref still reject cleanly
    assert(eng.sqlQuery("SELECT * FROM changes('db.missing', 1)")
      .startsWith("""{"error""""))
    assert(eng.sqlQuery("SELECT * FROM db.t VERSION AS OF 'no-such-ref'")
      .startsWith("""{"error""""))
    // a tag named LIKE a number is reachable when no snapshot has that
    // id (round-14 VERDICT item 3: ref-first resolution for
    // non-existent numeric ids; an EXISTING snapshot id still wins the
    // ambiguity, matching Iceberg)
    val s1Again = cat.describe("db", "t").snapshots.head.snapshotId
    cat.createTag("db", "t", "999999", None) // tag at current
    assert(eng.sqlQuery("SELECT count(*) AS n FROM changes('db.t', '999999')")
      .contains(""""n":0"""), "numeric-named tag must resolve as a ref")
    // the same literal as a plain long with an existing id resolves as
    // the id (unchanged fast path)
    assert(eng.sqlQuery(
      s"SELECT count(*) AS n FROM changes('db.t', '$s1Again')")
      .contains(""""n":"""))
  }

  test("CALL system.* procedures: the maintenance tier through SQL — " +
      "rewrite_data_files, expire, orphans, rollback, tags, maintain") {
    import spark.implicits._
    val cat = new SnapshotCatalog(spark, tmpDir("graft-call"))
    val eng = new Engine(spark, cat)
    cat.createTable("db", "t", Seq.empty[(Long, Double)].toDF("id", "v").schema)
    for (b <- 0 until 5)
      cat.append("db", "t", Seq((b.toLong, b.toDouble)).toDF("id", "v")
        .coalesce(1))
    cat.cdcUpsert("db", "t", rows = Seq((9L, 9.0)).toDF("id", "v"),
      deletes = Seq(2L).toDF("id"), Seq("id"))
    // tag BEFORE maintenance so expiry must pin it
    val out0 = eng.sqlQuery("CALL system.create_tag('db.t', 'pre-maint')")
    assert(out0.contains(""""operation":"create_tag""""), out0)
    // per-group rewrite folds the delete side; report carries numbers
    val out1 = eng.sqlQuery("CALL system.rewrite_data_files('db.t')")
    assert(out1.contains(""""operation":"rewrite_data_files"""") &&
      out1.contains(""""delete_files_folded":1"""), out1)
    assert(cat.describe("db", "t").currentSnapshot.get.eqDeletes.isEmpty)
    assert(eng.sqlQuery("SELECT count(*) AS n FROM db.t").contains(""""n":5"""))
    // expire + orphan sweep through SQL; the tag survives
    val out2 = eng.sqlQuery("CALL system.expire_snapshots('db.t', 1)")
    assert(out2.contains(""""operation":"expire_snapshots""""), out2)
    assert(eng.sqlQuery("CALL remove_orphan_files('db.t')") // unqualified too
      .contains(""""operation":"remove_orphan_files""""))
    assert(eng.sqlQuery(
      "SELECT count(*) AS n FROM db.t VERSION AS OF 'pre-maint'")
      .contains(""""n":5"""))
    // composed maintain + rollback round-trip
    val preRoll = cat.describe("db", "t").currentSnapshotId.get
    cat.append("db", "t", Seq((100L, 1.0)).toDF("id", "v"))
    assert(eng.sqlQuery(s"CALL system.rollback_to_snapshot('db.t', $preRoll)")
      .contains(""""operation":"rollback_to_snapshot""""))
    assert(eng.sqlQuery("SELECT count(*) AS n FROM db.t").contains(""""n":5"""))
    val out3 = eng.sqlQuery("CALL system.maintain('db.t', 1, 4)")
    assert(out3.contains(""""operation":"maintain""""), out3)
    // unknown procedure → clean rejection, not a silent no-op
    assert(eng.sqlQuery("CALL system.no_such_proc('db.t')")
      .startsWith("""{"error""""))
  }

  test("catalog ergonomics through SQL: TRUNCATE TABLE, DESCRIBE, " +
      "SHOW TABLES — with time travel across the truncate") {
    import spark.implicits._
    val cat = new SnapshotCatalog(spark, tmpDir("graft-ddl2"))
    val eng = new Engine(spark, cat)
    cat.createTable("db", "a", Seq.empty[(Long, Double)].toDF("id", "v").schema)
    cat.createTable("db", "b", Seq.empty[(Long, Double)].toDF("id", "v").schema)
    cat.append("db", "a", (0L until 7L).map(i => (i, i.toDouble)).toDF("id", "v"))
    val pre = cat.describe("db", "a").currentSnapshotId.get
    // SHOW TABLES lists both; LIKE filters
    val st = eng.sqlQuery("SHOW TABLES IN db")
    assert(st.contains(""""tableName":"a"""") &&
      st.contains(""""tableName":"b""""), st)
    assert(!eng.sqlQuery("SHOW TABLES IN db LIKE 'a*'")
      .contains(""""tableName":"b""""))
    // DESCRIBE renders the declared schema
    val de = eng.sqlQuery("DESCRIBE db.a")
    assert(de.contains(""""col_name":"id","data_type":"bigint"""), de)
    // TRUNCATE: rows vanish atomically, history stays time-travelable
    val tr = eng.sqlQuery("TRUNCATE TABLE db.a")
    assert(tr.contains(""""operation":"TRUNCATE"""") &&
      tr.contains(""""rows_affected":7"""), tr)
    assert(eng.sqlQuery("SELECT count(*) AS n FROM db.a").contains(""""n":0"""))
    assert(eng.sqlQuery(
      s"SELECT count(*) AS n FROM db.a VERSION AS OF $pre")
      .contains(""""n":7"""))
    // appends after a truncate start clean
    cat.append("db", "a", Seq((99L, 9.0)).toDF("id", "v"))
    assert(eng.sqlQuery("SELECT count(*) AS n FROM db.a").contains(""""n":1"""))
    // missing table still rejects cleanly
    assert(eng.sqlQuery("TRUNCATE TABLE db.zzz").startsWith("""{"error""""))
  }

  test("DML summaries expose delete_files_written / bytes_rewritten — " +
      "the write-path choice observable per statement") {
    import spark.implicits._
    val cat = new SnapshotCatalog(spark, tmpDir("graft-dmlmx"))
    val eng = new Engine(spark, cat)
    for (t <- Seq("m", "c")) {
      cat.createTable("db", t, Seq.empty[(Long, Double)].toDF("id", "v").schema)
      cat.updateProperties("db", t, Map(
        SnapshotCatalog.DeleteModeProp ->
          (if (t == "m") "merge-on-read" else "copy-on-write"),
        "write.update.mode" ->
          (if (t == "m") "merge-on-read" else "copy-on-write")))
      cat.append("db", t, (0L until 20L).map(i => (i, i.toDouble)).toDF("id", "v"))
    }
    val dm = eng.sqlQuery("DELETE FROM db.m WHERE id < 3")
    assert(dm.contains(""""delete_files_written":1""") &&
      dm.contains(""""bytes_rewritten":0"""), dm)
    val dc = eng.sqlQuery("DELETE FROM db.c WHERE id < 3")
    assert(dc.contains(""""delete_files_written":0"""), dc)
    assert("\"bytes_rewritten\":[1-9]".r.findFirstIn(dc).isDefined, dc)
    val um = eng.sqlQuery("UPDATE db.m SET v = v + 1 WHERE id >= 18")
    assert(um.contains(""""delete_files_written":1""") &&
      um.contains(""""bytes_rewritten":0"""), um)
    val uc = eng.sqlQuery("UPDATE db.c SET v = v + 1 WHERE id >= 18")
    assert(uc.contains(""""delete_files_written":0"""), uc)
    assert("\"bytes_rewritten\":[1-9]".r.findFirstIn(uc).isDefined, uc)
  }

  test("WAP branch DML: SET graft.wap.branch stages MERGE/DELETE/" +
      "UPDATE/INSERT on a branch — published state untouched until " +
      "fast_forward; branch reads see the staged chain") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cat = new SnapshotCatalog(spark, tmpDir("graft-wap"))
    val eng = new Engine(spark, cat)
    try {
      cat.createTable("db", "t",
        Seq.empty[(Long, Double)].toDF("id", "v").schema)
      cat.append("db", "t",
        (0L until 100L).map(i => (i, i.toDouble)).toDF("id", "v"))
      val published = cat.describe("db", "t").currentSnapshotId.get

      assert(!eng.sqlQuery("SET graft.wap.branch = audit")
        .startsWith("""{"error""""))
      // the branch auto-creates on first DML and the chain builds on it
      val d = eng.sqlQuery("DELETE FROM db.t WHERE id < 10")
      assert(d.contains(""""rows_affected":10"""), d)
      val u = eng.sqlQuery("UPDATE db.t SET v = v * 2 WHERE id >= 90")
      assert(u.contains(""""rows_affected":10"""), u)
      val i = eng.sqlQuery(
        "INSERT INTO db.t SELECT id + 1000, CAST(0.5 AS DOUBLE) " +
          "FROM range(5)")
      assert(!i.startsWith("""{"error""""), i)
      val m = eng.sqlQuery(
        """MERGE INTO db.t t USING
          |(SELECT CAST(50 AS BIGINT) AS id, CAST(-1.0 AS DOUBLE) AS v
          | UNION ALL
          | SELECT CAST(2000 AS BIGINT), CAST(9.0 AS DOUBLE)) s
          |ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET v = s.v
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      assert(m.contains(""""rows_affected":2"""), m)

      // published pointer and published reads: byte-unchanged
      val meta = cat.describe("db", "t")
      assert(meta.currentSnapshotId.contains(published))
      assert(cat.read("db", "t").count() == 100)
      assert(cat.read("db", "t").filter(col("id") === 50L)
        .head().getDouble(1) == 50.0)
      // the staged chain is all there via the branch read
      val staged = cat.readRef("db", "t", "audit")
      assert(staged.count() == 100 - 10 + 5 + 1)
      assert(staged.filter(col("id") === 50L).head().getDouble(1) == -1.0)
      assert(staged.filter(col("id") === 95L).head().getDouble(1) == 190.0)
      assert(staged.filter(col("id") === 2000L).count() == 1)
      assert(staged.filter(col("id") < 10L).count() == 0)

      // publish and verify the staged state IS the published state
      assert(!eng.sqlQuery("SET graft.wap.branch = ''")
        .startsWith("""{"error""""))
      assert(!eng.sqlQuery("CALL system.fast_forward('db.t', 'audit')")
        .startsWith("""{"error""""))
      val after = cat.read("db", "t")
      assert(after.count() == 96)
      assert(after.filter(col("id") === 50L).head().getDouble(1) == -1.0)
    } finally spark.conf.set(Engine.WapBranchConf, "")
  }

  test("CALL system.fast_forward on a stale branch returns the error " +
      "envelope — the refused publish is SQL-observable, nothing moves") {
    import spark.implicits._
    val cat = new SnapshotCatalog(spark, tmpDir("graft-ffstale"))
    val eng = new Engine(spark, cat)
    cat.createTable("db", "t", Seq.empty[(Long, Double)].toDF("id", "v").schema)
    cat.append("db", "t", Seq((1L, 1.0)).toDF("id", "v"))
    cat.createBranch("db", "t", "audit")
    cat.appendToBranch("db", "t", "audit", Seq((2L, 2.0)).toDF("id", "v"))
    // main moves after the fork — the branch is stale
    cat.append("db", "t", Seq((100L, 100.0)).toDF("id", "v"))
    val before = cat.describe("db", "t").currentSnapshotId
    val out = eng.sqlQuery("CALL system.fast_forward('db.t', 'audit')")
    assert(out.startsWith("""{"error"""") &&
      out.contains("not an ancestor"), out)
    assert(cat.describe("db", "t").currentSnapshotId == before)
    assert(cat.read("db", "t").count() == 2) // ids 1 and 100, untouched
  }

  test("WAP branch DML bootstraps an EMPTY table: the first staged " +
      "INSERT creates the branch with the published pointer untouched " +
      "— no unaudited rows ever publish themselves") {
    import spark.implicits._
    val cat = new SnapshotCatalog(spark, tmpDir("graft-wapboot"))
    val eng = new Engine(spark, cat)
    try {
      cat.createTable("db", "t",
        Seq.empty[(Long, Double)].toDF("id", "v").schema)
      assert(!eng.sqlQuery("SET graft.wap.branch = audit")
        .startsWith("""{"error""""))
      val i = eng.sqlQuery(
        "INSERT INTO db.t SELECT id, CAST(id AS DOUBLE) FROM range(10)")
      assert(!i.startsWith("""{"error""""), i)
      // the published table is STILL EMPTY — the staged batch went to
      // the auto-bootstrapped branch
      val meta = cat.describe("db", "t")
      assert(meta.currentSnapshotId.isEmpty,
        "bootstrap staging must not publish")
      assert(meta.refs.contains("audit"))
      assert(cat.read("db", "t").count() == 0)
      assert(cat.readRef("db", "t", "audit").count() == 10)
      // further staged DML chains on the branch
      assert(!eng.sqlQuery("DELETE FROM db.t WHERE id < 3")
        .startsWith("""{"error""""))
      assert(cat.readRef("db", "t", "audit").count() == 7)
      assert(cat.read("db", "t").count() == 0)
      // publish (empty current = trivially fast-forwardable)
      assert(!eng.sqlQuery("SET graft.wap.branch = ''")
        .startsWith("""{"error""""))
      assert(!eng.sqlQuery("CALL system.fast_forward('db.t', 'audit')")
        .startsWith("""{"error""""))
      assert(cat.read("db", "t").count() == 7)
    } finally spark.conf.set(Engine.WapBranchConf, "")
  }

  test("SET graft.wap.branch = '' CLEARS the mode: DML after the " +
      "SQL-level clear lands on the published table, not a branch " +
      "literally named ''") {
    import spark.implicits._
    val cat = new SnapshotCatalog(spark, tmpDir("graft-wapclear"))
    val eng = new Engine(spark, cat)
    try {
      cat.createTable("db", "t",
        Seq.empty[(Long, Double)].toDF("id", "v").schema)
      cat.append("db", "t",
        (0L until 10L).map(i => (i, i.toDouble)).toDF("id", "v"))
      assert(!eng.sqlQuery("SET graft.wap.branch = audit")
        .startsWith("""{"error""""))
      assert(!eng.sqlQuery("DELETE FROM db.t WHERE id = 0")
        .startsWith("""{"error""""))
      assert(cat.read("db", "t").count() == 10) // staged only
      // the documented clear idiom — Spark stores the LITERAL '' for
      // `SET k = ''`; wapBranch must unquote it, or this DML silently
      // stages onto a branch named ''
      assert(!eng.sqlQuery("SET graft.wap.branch = ''")
        .startsWith("""{"error""""))
      val d = eng.sqlQuery("DELETE FROM db.t WHERE id = 1")
      assert(d.contains(""""rows_affected":1"""), d)
      assert(cat.read("db", "t").count() == 9,
        "post-clear DML did not publish — the clear idiom is broken")
      assert(!cat.describe("db", "t").refs.keySet.exists(_.contains("'")),
        "a quote-named branch was created by the clear idiom")
      // double-quoted clear and RESET both work too
      assert(!eng.sqlQuery("SET graft.wap.branch = audit")
        .startsWith("""{"error""""))
      assert(!eng.sqlQuery("SET graft.wap.branch = \"\"")
        .startsWith("""{"error""""))
      val d2 = eng.sqlQuery("DELETE FROM db.t WHERE id = 2")
      assert(d2.contains(""""rows_affected":1"""), d2)
      assert(cat.read("db", "t").count() == 8)
      assert(!eng.sqlQuery("RESET graft.wap.branch")
        .startsWith("""{"error""""))
      val d3 = eng.sqlQuery("DELETE FROM db.t WHERE id = 3")
      assert(d3.contains(""""rows_affected":1"""), d3)
      assert(cat.read("db", "t").count() == 7)
    } finally spark.conf.set(Engine.WapBranchConf, "")
  }

  test("SET graft.wap.read = true redirects SELECT/count/changes() at " +
      "the staged branch; without it reads stay published-only") {
    import spark.implicits._
    val cat = new SnapshotCatalog(spark, tmpDir("graft-wapread"))
    val eng = new Engine(spark, cat)
    try {
      // MoR deletes: the staged changelog below must not cross a CoW
      // rewrite (changelog identity needs append-only data files)
      cat.createTable("db", "t",
        Seq.empty[(Long, Double)].toDF("id", "v").schema,
        Map("write.delete.mode" -> "merge-on-read"))
      cat.append("db", "t",
        (0L until 10L).map(i => (i, i.toDouble)).toDF("id", "v"))
      val published = cat.describe("db", "t").currentSnapshotId.get
      assert(!eng.sqlQuery("SET graft.wap.branch = audit")
        .startsWith("""{"error""""))
      assert(!eng.sqlQuery("DELETE FROM db.t WHERE id < 4")
        .startsWith("""{"error""""))
      // default: reads stay published
      val pub = eng.sqlDataFrame("SELECT count(*) AS n FROM db.t")._1
        .head().getLong(0)
      assert(pub == 10, "un-redirected read must see published state")
      // opt in: the SAME query sees the staged branch
      assert(!eng.sqlQuery("SET graft.wap.read = true")
        .startsWith("""{"error""""))
      val staged = eng.sqlDataFrame("SELECT count(*) AS n FROM db.t")._1
        .head().getLong(0)
      assert(staged == 6, "redirected read must see the staged branch")
      // full scans redirect too, not just the count fast path
      val ids = eng.sqlDataFrame("SELECT id FROM db.t ORDER BY id")._1
        .collect().map(_.getLong(0)).toSeq
      assert(ids == (4L until 10L).toSeq)
      // open-ended changes() follows the staged head
      val ch = eng.sqlDataFrame(
        s"SELECT _change_type, count(*) AS n FROM " +
          s"changes('db.t', $published) GROUP BY 1")._1
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(ch.getOrElse("delete", 0L) == 4)
      // redirect off again: published view returns
      assert(!eng.sqlQuery("SET graft.wap.read = false")
        .startsWith("""{"error""""))
      assert(eng.sqlDataFrame("SELECT count(*) AS n FROM db.t")._1
        .head().getLong(0) == 10)
    } finally {
      spark.conf.set(Engine.WapBranchConf, "")
      spark.conf.set(Engine.WapReadConf, "false")
    }
  }

  test("CALL system.drop_branch unpins an abandoned WAP branch: expiry " +
      "then reclaims its staged snapshots and manifests; published " +
      "state unaffected; kind checks refuse tag/branch mixups") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cat = new SnapshotCatalog(spark, tmpDir("graft-dropbr"))
    val eng = new Engine(spark, cat)
    try {
      cat.createTable("db", "t",
        Seq.empty[(Long, Double)].toDF("id", "v").schema)
      cat.append("db", "t",
        (0L until 10L).map(i => (i, i.toDouble)).toDF("id", "v"))
      val published = cat.describe("db", "t").currentSnapshotId.get
      assert(!eng.sqlQuery("CALL system.create_tag('db.t', 'keepme')")
        .startsWith("""{"error""""))
      // stage three commits on an audit branch, then abandon it
      assert(!eng.sqlQuery("SET graft.wap.branch = audit")
        .startsWith("""{"error""""))
      for (i <- 0 until 3)
        assert(!eng.sqlQuery(
          s"INSERT INTO db.t SELECT id + ${100 * (i + 1)}, " +
            "CAST(9 AS DOUBLE) FROM range(5)")
          .startsWith("""{"error""""))
      assert(!eng.sqlQuery("SET graft.wap.branch = ''")
        .startsWith("""{"error""""))
      val metaStaged = cat.describe("db", "t")
      val stagedIds = metaStaged.snapshots.map(_.snapshotId)
        .filterNot(_ == published)
      assert(stagedIds.size == 3)
      val publishedFiles = metaStaged.snapshots
        .find(_.snapshotId == published).get.files.toSet
      val stagedFiles = metaStaged.snapshots
        .filter(s => stagedIds.contains(s.snapshotId))
        .flatMap(_.files).distinct.filterNot(publishedFiles)
      // while the ref pins the chain, expiry keeps the branch HEAD
      // consistent (intermediates are expirable — re-parenting heals
      // the chain): the full staged content must stay readable
      assert(!eng.sqlQuery("CALL system.expire_snapshots('db.t', 1)")
        .startsWith("""{"error""""))
      assert(cat.describe("db", "t").refs.contains("audit"))
      assert(cat.readRef("db", "t", "audit").count() == 25,
        "staged content lost while the branch ref pinned it")
      // kind checks
      assert(eng.sqlQuery("CALL system.drop_branch('db.t', 'keepme')")
        .startsWith("""{"error""""))
      assert(eng.sqlQuery("CALL system.drop_tag('db.t', 'audit')")
        .startsWith("""{"error""""))
      // drop the abandoned branch; a later main commit + expiry then
      // reclaims every staged file the ref was pinning
      assert(!eng.sqlQuery("CALL system.drop_branch('db.t', 'audit')")
        .startsWith("""{"error""""))
      assert(!cat.describe("db", "t").refs.contains("audit"))
      cat.append("db", "t", Seq((999L, 0.0)).toDF("id", "v"))
      assert(!eng.sqlQuery("CALL system.expire_snapshots('db.t', 1)")
        .startsWith("""{"error""""))
      val after = cat.describe("db", "t")
      // retained: the new main head (current + keep_last floor) and
      // the tag-pinned original — the whole staged chain is gone
      assert(after.snapshots.map(_.snapshotId).toSet ==
        Set(published, after.currentSnapshotId.get),
        s"unexpected retained snapshots: ${after.snapshots.map(_.snapshotId)}")
      val keptFiles = after.snapshots.flatMap(_.files).toSet
      val reclaimed = stagedFiles.filterNot(keptFiles)
      assert(reclaimed.nonEmpty)
      reclaimed.foreach(f => assert(!new java.io.File(f).exists,
        s"unpinned staged file $f not reclaimed"))
      // published lineage readable: original rows + the main append,
      // none of the staged inserts
      assert(cat.read("db", "t").count() == 11)
      assert(cat.read("db", "t")
        .filter(col("id") >= 100L && col("id") < 999L).isEmpty)
      // the tag still resolves to the pre-branch state
      assert(cat.readRef("db", "t", "keepme").count() == 10)
      // dropping the tag with the right procedure works
      assert(!eng.sqlQuery("CALL system.drop_tag('db.t', 'keepme')")
        .startsWith("""{"error""""))
      assert(!cat.describe("db", "t").refs.contains("keepme"))
    } finally spark.conf.set(Engine.WapBranchConf, "")
  }

  test("wap.id staging: DML under SET graft.wap.id stages on the " +
      "internal wap.id ref; publish_changes cherry-picks onto a MOVED " +
      "head and drops the ref — the case fast_forward refuses") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cat = new SnapshotCatalog(spark, tmpDir("graft-wapid"))
    val eng = new Engine(spark, cat)
    try {
      cat.createTable("db", "t",
        Seq.empty[(Long, Double)].toDF("id", "v").schema)
      cat.append("db", "t",
        (0L until 50L).map(i => (i, i.toDouble)).toDF("id", "v"))
      val published = cat.describe("db", "t").currentSnapshotId.get
      assert(!eng.sqlQuery("SET graft.wap.id = b1")
        .startsWith("""{"error""""))
      val i = eng.sqlQuery(
        "INSERT INTO db.t SELECT id + 1000, CAST(0.5 AS DOUBLE) " +
          "FROM range(5)")
      assert(!i.startsWith("""{"error""""), i)
      // published pointer and reads untouched; staged ref exists
      val meta = cat.describe("db", "t")
      assert(meta.currentSnapshotId.contains(published))
      assert(cat.read("db", "t").count() == 50)
      assert(meta.refs.contains("wap.id.b1"))
      assert(cat.readRef("db", "t", "wap.id.b1").count() == 55)
      // reads are NEVER redirected under wap.id, even with the read
      // flag on (Iceberg parity: only wap.branch participates)
      assert(!eng.sqlQuery("SET graft.wap.read = true")
        .startsWith("""{"error""""))
      assert(eng.sqlQuery("SELECT count(*) AS n FROM db.t")
        .contains(""""n":50"""))
      assert(!eng.sqlQuery("SET graft.wap.read = false")
        .startsWith("""{"error""""))
      assert(!eng.sqlQuery("SET graft.wap.id = ''")
        .startsWith("""{"error""""))
      // main MOVES: a published delete lands after staging
      val d = eng.sqlQuery("DELETE FROM db.t WHERE id < 10")
      assert(d.contains(""""rows_affected":10"""), d)
      // fast_forward refuses (stale), publish_changes cherry-picks
      val ff = eng.sqlQuery("CALL system.fast_forward('db.t', 'wap.id.b1')")
      assert(ff.startsWith("""{"error"""") && ff.contains("not an ancestor"),
        ff)
      val pub = eng.sqlQuery("CALL system.publish_changes('db.t', 'b1')")
      assert(pub.contains(""""operation":"publish_changes""""), pub)
      assert(!cat.describe("db", "t").refs.contains("wap.id.b1"))
      val after = cat.read("db", "t")
      assert(after.count() == 40 + 5)
      assert(after.filter(col("id") >= 1000L).count() == 5)
      assert(after.filter(col("id") < 10L).count() == 0)
      // publishing an unknown wap.id is a clean SQL error
      assert(eng.sqlQuery("CALL system.publish_changes('db.t', 'nope')")
        .startsWith("""{"error""""))
    } finally {
      spark.conf.set(Engine.WapIdConf, "")
      spark.conf.set(Engine.WapReadConf, "false")
    }
  }

  test("wap.id guard rails: both wap confs set refuses DML; a wap.id " +
      "that staged TWO snapshots refuses publish_changes (one snapshot " +
      "per id — the cherry-pick contract)") {
    import spark.implicits._
    val cat = new SnapshotCatalog(spark, tmpDir("graft-wapid2"))
    val eng = new Engine(spark, cat)
    try {
      cat.createTable("db", "t",
        Seq.empty[(Long, Double)].toDF("id", "v").schema)
      cat.append("db", "t", Seq((1L, 1.0)).toDF("id", "v"))
      assert(!eng.sqlQuery("SET graft.wap.branch = audit")
        .startsWith("""{"error""""))
      assert(!eng.sqlQuery("SET graft.wap.id = b1")
        .startsWith("""{"error""""))
      val out = eng.sqlQuery(
        "INSERT INTO db.t SELECT CAST(2 AS BIGINT), CAST(2.0 AS DOUBLE)")
      assert(out.startsWith("""{"error"""") && out.contains("both"), out)
      assert(!eng.sqlQuery("SET graft.wap.branch = ''")
        .startsWith("""{"error""""))
      // two staged commits under one wap.id → publish refused whole
      for (k <- 10 to 11)
        assert(!eng.sqlQuery(
          s"INSERT INTO db.t SELECT CAST($k AS BIGINT), CAST(0.0 AS DOUBLE)")
          .startsWith("""{"error""""))
      val pub = eng.sqlQuery("CALL system.publish_changes('db.t', 'b1')")
      assert(pub.startsWith("""{"error"""") &&
        pub.contains("more than one snapshot"), pub)
      // nothing moved, the staged chain is intact for a branch publish
      assert(cat.read("db", "t").count() == 1)
      assert(cat.readRef("db", "t", "wap.id.b1").count() == 3)
      assert(!eng.sqlQuery("SET graft.wap.id = ''")
        .startsWith("""{"error""""))
      assert(!eng.sqlQuery("CALL system.fast_forward('db.t', 'wap.id.b1')")
        .startsWith("""{"error""""))
      assert(cat.read("db", "t").count() == 3)
    } finally {
      spark.conf.set(Engine.WapBranchConf, "")
      spark.conf.set(Engine.WapIdConf, "")
    }
  }

  test("snapshot lineage procedures: rollback_to_timestamp resolves " +
      "the latest ancestor; rollback_to_snapshot refuses a non-ancestor " +
      "(set_current_snapshot is the deliberate override); ancestors_of " +
      "walks the chain") {
    import spark.implicits._
    val cat = new SnapshotCatalog(spark, tmpDir("graft-lineage"))
    val eng = new Engine(spark, cat)
    cat.createTable("db", "t", Seq.empty[(Long, Double)].toDF("id", "v").schema)
    cat.append("db", "t", Seq((1L, 1.0)).toDF("id", "v"))
    val s1 = cat.describe("db", "t").currentSnapshotId.get
    val t1 = cat.describe("db", "t").currentSnapshot.get.createdAtMs
    Thread.sleep(5)
    cat.append("db", "t", Seq((2L, 2.0)).toDF("id", "v"))
    val s2 = cat.describe("db", "t").currentSnapshotId.get
    Thread.sleep(5)
    cat.append("db", "t", Seq((3L, 3.0)).toDF("id", "v"))
    val s3 = cat.describe("db", "t").currentSnapshotId.get
    // ancestors_of: multi-row chain report, newest first
    val anc = eng.sqlQuery("CALL system.ancestors_of('db.t')")
    assert(Seq(s1, s2, s3).forall(id => anc.contains(s""""snapshot_id":$id""")),
      anc)
    // timestamp BETWEEN s1 and s2 rolls back to s1
    val roll = eng.sqlQuery(
      s"CALL system.rollback_to_timestamp('db.t', ${t1 + 1})")
    assert(roll.contains(""""rolled_back_to":""" + s1), roll)
    assert(cat.read("db", "t").count() == 1)
    // s3 is now NOT an ancestor (abandoned fork tip): rollback refuses,
    // set_current_snapshot is the deliberate way there
    val bad = eng.sqlQuery(s"CALL system.rollback_to_snapshot('db.t', $s3)")
    assert(bad.startsWith("""{"error"""") && bad.contains("not an ancestor"),
      bad)
    assert(!eng.sqlQuery(s"CALL system.set_current_snapshot('db.t', $s3)")
      .startsWith("""{"error""""))
    assert(cat.read("db", "t").count() == 3)
    // a timestamp before every snapshot is a clean error
    assert(eng.sqlQuery("CALL system.rollback_to_timestamp('db.t', 1)")
      .startsWith("""{"error""""))
  }

  test("rewrite_data_files with a sort spec re-clusters the WHOLE " +
      "table (Iceberg sort strategy): content identical, per-file " +
      "min/max envelopes disjoint along the sort column") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cat = new SnapshotCatalog(spark, tmpDir("graft-sortrw"))
    val eng = new Engine(spark, cat)
    cat.createTable("db", "t", Seq.empty[(Long, Long)].toDF("id", "x").schema)
    // two shuffled appends: x spans the full range in every file
    for (r <- 0 until 2)
      cat.append("db", "t", (0L until 2000L).filter(_ % 2 == r)
        .map(i => (i, (i * 37) % 2000)).toDF("id", "x").repartition(3))
    val before = cat.read("db", "t").orderBy("id", "x").collect().toSeq
    val rw = eng.sqlQuery(
      "CALL system.rewrite_data_files('db.t', 1, 8192, 'x')")
    assert(rw.contains(""""operation":"rewrite_data_files""""), rw)
    val cur = cat.describe("db", "t").currentSnapshot.get
    assert(cur.operation.contains("replace"))
    val live = cur.files.toSet
    val sts = cur.fileStats.filter(st => live(st.path))
    assert(sts.size > 1, s"need multiple output files, got ${sts.size}")
    // clustered: envelopes along x must NOT all span the full range —
    // a point predicate prunes most files
    val hit = sts.count(st => st.min("x").toDouble <= 42 &&
      st.max("x").toDouble >= 42)
    assert(hit * 2 <= sts.size, s"$hit of ${sts.size} files cover x=42")
    val after = cat.read("db", "t").orderBy("id", "x").collect().toSeq
    assert(after == before, "sorted rewrite must preserve content")
    // a sort column that does not exist / wrong type is a clean error
    assert(eng.sqlQuery("CALL system.rewrite_data_files('db.t', 'nope')")
      .startsWith("""{"error""""))
    // declaring a bad write.order is refused at DDL time — garbage
    // must never land where every later rewrite would trip on it
    assert(eng.sqlQuery(
      "ALTER TABLE db.t SET TBLPROPERTIES ('write.order' = 'nope')")
      .startsWith("""{"error""""))
    assert(!eng.sqlQuery(
      "ALTER TABLE db.t SET TBLPROPERTIES ('write.order' = 'x')")
      .startsWith("""{"error""""))
  }

  test("all_files / manifests metadata tables: reachability across " +
      "snapshots and one manifest row per snapshot — metadata-only " +
      "introspection for expiry/orphan reasoning") {
    import spark.implicits._
    val cat = new SnapshotCatalog(spark, tmpDir("graft-metatbl"))
    val eng = new Engine(spark, cat)
    cat.createTable("db", "t", Seq.empty[(Long, Double)].toDF("id", "v").schema)
    cat.append("db", "t", Seq((1L, 1.0)).toDF("id", "v").coalesce(1))
    cat.append("db", "t", Seq((2L, 2.0)).toDF("id", "v").coalesce(1))
    val meta = cat.describe("db", "t")
    // all_files: first file referenced by BOTH snapshots, second by one
    val af = eng.sqlDataFrame(
      "SELECT file_path, referencing_snapshots FROM db.t.all_files " +
        "ORDER BY referencing_snapshots DESC")._1.collect()
    assert(af.length == 2, af.toSeq)
    assert(af(0).getLong(1) == 2 && af(1).getLong(1) == 1, af.toSeq)
    // manifests: one row per snapshot, each with its side file on disk
    val mf = eng.sqlDataFrame(
      "SELECT path, data_file_count FROM db.t.manifests " +
        "ORDER BY added_snapshot_id")._1.collect()
    assert(mf.length == meta.snapshots.size)
    assert(mf.forall(r => !r.isNullAt(0) &&
      java.nio.file.Files.exists(java.nio.file.Paths.get(r.getString(0)))),
      mf.toSeq)
    assert(mf.map(_.getLong(1)).toSeq == Seq(1L, 2L), mf.toSeq)
  }

  test("SHOW CREATE TABLE / SHOW TBLPROPERTIES: the reproducible-DDL " +
      "surface — schema plus every layout property, copy-paste shaped") {
    import spark.implicits._
    val cat = new SnapshotCatalog(spark, tmpDir("graft-showcreate"))
    val eng = new Engine(spark, cat)
    cat.createTable("db", "t",
      Seq.empty[(Long, Long)].toDF("id", "x").schema,
      Map("write.order" -> "x"))
    val out = eng.sqlDataFrame("SHOW CREATE TABLE db.t")._1.head().getString(0)
    assert(out.contains("CREATE TABLE db.t") &&
      out.contains("id BIGINT") && out.contains("x BIGINT") &&
      out.contains("'write.order' = 'x'"), out)
    val props = eng.sqlDataFrame("SHOW TBLPROPERTIES db.t")._1.collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("write.order").contains("x"), props)
    val one = eng.sqlDataFrame(
      "SHOW TBLPROPERTIES db.t ('write.order')")._1.collect()
    assert(one.length == 1 && one.head.getString(1) == "x", one.toSeq)
    val missing = eng.sqlDataFrame(
      "SHOW TBLPROPERTIES db.t ('nope')")._1.head().getString(1)
    assert(missing.contains("does not have property"), missing)
  }

  test("CREATE TABLE honors TBLPROPERTIES and SHOW CREATE TABLE output " +
      "replays into the SAME physical layout — the reproducibility " +
      "contract, end to end") {
    import spark.implicits._
    val cat = new SnapshotCatalog(spark, tmpDir("graft-ddl-roundtrip"))
    val eng = new Engine(spark, cat)
    // layout properties declared AT CREATE land on the table (they
    // were silently dropped before this pin)
    assert(!eng.sqlQuery("CREATE TABLE db.t (id BIGINT, x BIGINT, " +
        "v DOUBLE) TBLPROPERTIES ('write.order' = 'x', " +
        "'write.delete.mode' = 'merge-on-read')")
      .startsWith("""{"error""""))
    val props = cat.describe("db", "t").properties
    assert(props.get("write.order").contains("x") &&
      props.get("write.delete.mode").contains("merge-on-read"), props)
    // an invalid write.order is refused at CREATE, exactly like ALTER
    assert(eng.sqlQuery("CREATE TABLE db.bad (id BIGINT) " +
        "TBLPROPERTIES ('write.order' = 'nope')")
      .startsWith("""{"error""""))
    assert(!cat.tableExists("db", "bad"))
    // the declared layout properties actually BITE on the write path
    eng.sqlQuery("INSERT INTO db.t VALUES (1, 10, 1.0), (2, 20, 2.0)")
    val del = eng.sqlQuery("DELETE FROM db.t WHERE id = 1")
    assert(del.contains(""""delete_files_written":1""") &&
      del.contains(""""files_rewritten":0"""), del)
    // replay: the emitted DDL recreates an identical layout elsewhere
    val stmt = eng.sqlDataFrame("SHOW CREATE TABLE db.t")._1
      .head().getString(0)
    assert(!eng.sqlQuery(stmt.replace("CREATE TABLE db.t ",
        "CREATE TABLE db.t2 ")).startsWith("""{"error""""), stmt)
    assert(cat.describe("db", "t2").properties == props)
    assert(cat.schemaOf("db", "t2") == cat.schemaOf("db", "t"))
    // a partitioned table's spec survives the round trip too (the
    // spec is carried as a property in the emitted TBLPROPERTIES)
    eng.sqlQuery("CREATE TABLE db.p (id BIGINT, cat STRING) " +
      "PARTITIONED BY (cat)")
    val pStmt = eng.sqlDataFrame("SHOW CREATE TABLE db.p")._1
      .head().getString(0)
    assert(!eng.sqlQuery(pStmt.replace("CREATE TABLE db.p ",
        "CREATE TABLE db.p2 ")).startsWith("""{"error""""), pStmt)
    assert(cat.describe("db", "p2").properties ==
      cat.describe("db", "p").properties)
  }

  test("CALL system.add_files: zero-copy adoption through SQL, both " +
      "the plain-path and the parquet.`…` source forms; bad sources " +
      "and unknown tables error") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val cat = new SnapshotCatalog(spark, tmpDir("graft-addf-sql"))
    val eng = new Engine(spark, cat)
    val ext = tmpDir("graft-addf-ext")
    spark.range(50).select(col("id").as("k"),
        (col("id") % 5).cast("string").as("g"))
      .coalesce(2).write.parquet(s"$ext/d")
    assert(!eng.sqlQuery("CREATE TABLE db.t (k BIGINT, g STRING)")
      .startsWith("""{"error""""))
    val out = eng.sqlQuery(s"CALL system.add_files('db.t', '$ext/d')")
    assert(out.contains(""""operation":"add_files"""") &&
      out.contains(""""added_rows":50"""), out)
    // the registered paths are the external ones; SELECT serves them
    assert(cat.describe("db", "t").currentSnapshot.get.files
      .forall(_.startsWith(ext)))
    val cnt = eng.sqlQuery("SELECT count(*) AS n FROM db.t")
    assert(cnt.contains(""""n":50"""), cnt)
    // the Spark-procedure source_table spelling: parquet.`/path`
    val ext2 = tmpDir("graft-addf-ext2")
    spark.range(100, 110).select(col("id").as("k"),
        lit("z").as("g"))
      .coalesce(1).write.parquet(s"$ext2/d")
    val out2 = eng.sqlQuery(
      s"CALL system.add_files('db.t', 'parquet.`$ext2/d`')")
    assert(out2.contains(""""added_rows":10"""), out2)
    val cnt2 = eng.sqlQuery("SELECT count(*) AS n FROM db.t")
    assert(cnt2.contains(""""n":60"""), cnt2)
    // an empty/missing source errors through the SQL envelope
    assert(eng.sqlQuery(
        "CALL system.add_files('db.t', '/nonexistent/nowhere')")
      .startsWith("""{"error""""))
    // unknown table → Spark's own rejection (no report row)
    assert(eng.sqlQuery(
        s"CALL system.add_files('db.missing', '$ext/d')")
      .startsWith("""{"error""""))
  }

  test("partition-spec evolution DDL: ADD/REPLACE/DROP PARTITION " +
      "FIELD are metadata-only commits with era-exact semantics; " +
      "mismatches refuse; .entries reports provenance") {
    val cat = new SnapshotCatalog(spark, tmpDir("graft-pf-ddl"))
    val eng = new Engine(spark, cat)
    val pk = graft.catalog.PartitionSpec.PropertyKey
    def props() = cat.describe("db", "t").properties
    assert(!eng.sqlQuery("CREATE TABLE db.t (k BIGINT, g STRING)")
      .startsWith("""{"error""""))
    eng.sqlQuery("INSERT INTO db.t VALUES (1, 'a'), (2, 'b')")
    val files1 = cat.describe("db", "t").currentSnapshot.get.files
    // ADD on an unpartitioned table declares the spec, touching no data
    assert(!eng.sqlQuery(
        "ALTER TABLE db.t ADD PARTITION FIELD bucket(2, k)")
      .startsWith("""{"error""""))
    assert(props().get(pk).contains("bucket(2, k)"))
    assert(cat.describe("db", "t").currentSnapshot.get.files == files1)
    // a second ADD refuses (one field; REPLACE is the evolution verb)
    assert(eng.sqlQuery("ALTER TABLE db.t ADD PARTITION FIELD g")
      .startsWith("""{"error""""))
    // REPLACE must name the CURRENT spec
    assert(eng.sqlQuery(
        "ALTER TABLE db.t REPLACE PARTITION FIELD bucket(4, k) WITH g")
      .startsWith("""{"error""""))
    assert(!eng.sqlQuery(
        "ALTER TABLE db.t REPLACE PARTITION FIELD bucket(2, k) WITH g")
      .startsWith("""{"error""""))
    assert(props().get(pk).contains("identity(g)"))
    // an unknown column refuses at DDL time
    assert(eng.sqlQuery("ALTER TABLE db.t REPLACE PARTITION FIELD g " +
        "WITH days(nope)").startsWith("""{"error""""))
    // DROP must name the current spec too; bare column = identity
    assert(eng.sqlQuery("ALTER TABLE db.t DROP PARTITION FIELD k")
      .startsWith("""{"error""""))
    assert(!eng.sqlQuery("ALTER TABLE db.t DROP PARTITION FIELD g")
      .startsWith("""{"error""""))
    assert(!props().contains(pk))
    // .entries: after a MoR delete, data entries carry their adding
    // snapshot and the delete file surfaces as content=1, status=1
    eng.sqlQuery("ALTER TABLE db.t SET TBLPROPERTIES " +
      "('write.delete.mode' = 'merge-on-read')")
    eng.sqlQuery("INSERT INTO db.t VALUES (3, 'c')")
    eng.sqlQuery("DELETE FROM db.t WHERE k = 1")
    val out = eng.sqlQuery(
      "SELECT status, content, count(*) AS n FROM db.t.entries " +
        "GROUP BY status, content ORDER BY status, content")
    // carried-forward data files (status 0) + the delete file added
    // by the current snapshot (status 1, content 1)
    assert(out.contains("""{"status":0,"content":0"""), out)
    assert(out.contains("""{"status":1,"content":1,"n":1}"""), out)
  }

  test("_file/_pos metadata columns: per-row physical provenance on " +
      "demand, 0-based per-file positions, MoR deletes applied — a " +
      "deleted row's (file, pos) never surfaces") {
    import spark.implicits._
    val cat = new SnapshotCatalog(spark, tmpDir("graft-metacols"))
    val eng = new Engine(spark, cat)
    assert(!eng.sqlQuery("CREATE TABLE db.t (k BIGINT, g STRING) " +
        "TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')")
      .startsWith("""{"error""""))
    // two single-FILE commits → two physical files, positions 0..2
    cat.append("db", "t",
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "g").coalesce(1))
    cat.append("db", "t",
      Seq((4L, "d"), (5L, "e"), (6L, "f")).toDF("k", "g").coalesce(1))
    val files = eng.sqlQuery(
      "SELECT count(DISTINCT _file) AS nf, min(_pos) AS lo, " +
        "max(_pos) AS hi, count(*) AS n FROM db.t")
    assert(files.contains(""""nf":2""") && files.contains(""""lo":0""") &&
      files.contains(""""hi":2""") && files.contains(""""n":6"""), files)
    // plain reads stay metadata-column-free
    assert(!eng.sqlQuery("SELECT * FROM db.t LIMIT 1").contains("_file"))
    // a MoR-deleted row's (file, pos) disappears; survivors keep
    // their ORIGINAL positions (no renumbering — the row id is
    // physical identity, not a dense rank)
    eng.sqlQuery("DELETE FROM db.t WHERE k = 2")
    val after = eng.sqlQuery(
      "SELECT count(*) AS n, count(DISTINCT _file) AS nf FROM db.t " +
        "WHERE _pos >= 0")
    assert(after.contains(""""n":5""") && after.contains(""""nf":2"""), after)
    val posOfFile1 = eng.sqlQuery(
      "SELECT _pos FROM db.t WHERE k IN (1, 3) ORDER BY _pos")
    assert(posOfFile1.contains(""""_pos":0""") &&
      posOfFile1.contains(""""_pos":2"""), posOfFile1)
    // QUALIFIED references scope to their table: in a join, only the
    // named side grows metadata columns — a.* stays clean
    cat.createTable("db", "u",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType))))
    cat.append("db", "u", Seq(1L, 3L).toDF("k").coalesce(1))
    val joined = eng.sqlQuery(
      "SELECT u.*, b._file AS bf FROM db.u u JOIN db.t b ON u.k = b.k " +
        "ORDER BY u.k")
    assert(joined.contains(""""bf":"""), joined)
    assert(!joined.contains(""""_file""""),
      s"the unnamed side must not grow metadata columns: $joined")
  }

  test("publish_changes retry after a crash between cherry-pick and " +
      "ref drop COMPLETES the publish instead of refusing") {
    import spark.implicits._
    val cat = new SnapshotCatalog(spark, tmpDir("graft-wapretry"))
    val eng = new Engine(spark, cat)
    cat.createTable("db", "t", Seq.empty[(Long, Double)].toDF("id", "v").schema)
    cat.append("db", "t", Seq((1L, 1.0)).toDF("id", "v"))
    eng.sqlQuery("SET graft.wap.id = batch7")
    eng.sqlQuery("INSERT INTO db.t VALUES (2, 2.0)")
    eng.sqlQuery("RESET graft.wap.id")
    val m = cat.describe("db", "t")
    val ref = m.refs.keys.find(_.contains("batch7")).get
    val staged = m.refs(ref)
    // simulate the crash window: the cherry-pick landed, the ref
    // drop did not
    cat.cherrypick("db", "t", staged)
    assert(cat.describe("db", "t").refs.contains(ref))
    // the retry completes the publish: ref dropped, no duplicate rows
    val out = eng.sqlQuery("CALL system.publish_changes('db.t', 'batch7')")
    assert(!out.startsWith("""{"error""""), out)
    assert(!cat.describe("db", "t").refs.contains(ref))
    assert(cat.read("db", "t").count() == 2)
    // a third call reports the absence cleanly (no staged changes)
    assert(eng.sqlQuery("CALL system.publish_changes('db.t', 'batch7')")
      .startsWith("""{"error""""))
  }

  test("CREATE OR REPLACE TABLE AS SELECT: content and schema replace " +
      "in one commit, history stays time-travelable with the RTAS " +
      "field-id rule (preserved columns read, changed ones null-pad)") {
    import org.apache.spark.sql.functions.col
    val cat = new SnapshotCatalog(spark, tmpDir("graft-rtas"))
    val eng = new Engine(spark, cat)
    // plain REPLACE on a missing table refuses; OR REPLACE creates
    assert(eng.sqlQuery(
        "REPLACE TABLE db.t AS SELECT CAST(1 AS BIGINT) AS k")
      .startsWith("""{"error""""))
    assert(!eng.sqlQuery("CREATE OR REPLACE TABLE db.t AS " +
        "SELECT CAST(id AS BIGINT) AS k, CAST(id AS INT) AS old_i, " +
        "CAST('x' AS STRING) AS s FROM range(5)")
      .startsWith("""{"error""""))
    val v1 = cat.describe("db", "t").currentSnapshotId.get
    // the replace: k survives (same name+type), old_i's TYPE changes
    // (int -> string), s is dropped, n is new
    assert(!eng.sqlQuery("CREATE OR REPLACE TABLE db.t AS " +
        "SELECT CAST(id + 10 AS BIGINT) AS k, " +
        "CAST('w' AS STRING) AS old_i, CAST(id AS DOUBLE) AS n " +
        "FROM range(3)")
      .startsWith("""{"error""""))
    val m = cat.describe("db", "t")
    assert(m.snapshots.size == 2, "history must be retained")
    assert(cat.schemaOf("db", "t").fieldNames.toSeq ==
      Seq("k", "old_i", "n"))
    assert(cat.read("db", "t").count() == 3)
    val cur = eng.sqlQuery(
      "SELECT min(k) AS lo, max(old_i) AS oi FROM db.t")
    assert(cur.contains(""""lo":10""") && cur.contains(""""oi":"w""""), cur)
    // time travel to the pre-replace snapshot under the NEW schema:
    // k (preserved id) reads the old values; old_i (retired id — the
    // type changed) null-pads instead of casting garbage
    val tt = cat.read("db", "t", snapshotId = Some(v1))
    assert(tt.count() == 5)
    assert(tt.agg(org.apache.spark.sql.functions.sum("k")).head.getLong(0)
      == 10L) // 0+1+2+3+4
    assert(tt.filter(col("old_i").isNotNull).count() == 0,
      "a changed-type column must null-pad in pre-replace snapshots")
  }

  test("multi-column ALTER COLUMN TYPE is atomic: one unsafe column " +
      "commits nothing") {
    val cat = new SnapshotCatalog(spark, tmpDir("graft-promo-atomic"))
    val eng = new Engine(spark, cat)
    assert(!eng.sqlQuery(
        "CREATE TABLE db.t (a INT, b STRING, c FLOAT)")
      .startsWith("""{"error""""))
    // b STRING cannot promote — the whole statement must refuse and
    // leave a untouched
    assert(eng.sqlQuery(
        "ALTER TABLE db.t ALTER COLUMN a TYPE BIGINT, b TYPE BIGINT")
      .startsWith("""{"error""""))
    assert(cat.schemaOf("db", "t")("a").dataType ==
      org.apache.spark.sql.types.IntegerType,
      "a's promotion must not survive the failed statement")
    // the all-safe form still lands both in one commit
    val v0 = cat.describe("db", "t")
    assert(!eng.sqlQuery(
        "ALTER TABLE db.t ALTER COLUMN a TYPE BIGINT, c TYPE DOUBLE")
      .startsWith("""{"error""""))
    assert(cat.schemaOf("db", "t")("a").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(cat.schemaOf("db", "t")("c").dataType ==
      org.apache.spark.sql.types.DoubleType)
    assert(v0.snapshots.size == cat.describe("db", "t").snapshots.size)
  }
}
