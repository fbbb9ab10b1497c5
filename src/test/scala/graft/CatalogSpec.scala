package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog.SnapshotCatalog
import graft.schema.SchemaCompat

class CatalogSpec extends SparkTestBase {

  private def freshCatalog() = new SnapshotCatalog(spark, tmpDir("graft-cat"))

  private val schemaV1 = StructType(Seq(
    StructField("id", LongType), StructField("v", DoubleType)))

  test("create / list namespaces and tables") {
    val cat = freshCatalog()
    cat.createNamespace("default_db")
    cat.createTable("default_db", "purchase_events", schemaV1)
    assert(cat.listNamespaces() == Seq("default_db"))
    assert(cat.listTables("default_db") == Seq("purchase_events"))
    val meta = cat.describe("default_db", "purchase_events")
    assert(meta.formatVersion == 2)
    assert(meta.properties("write.format.default") == "parquet")
    assert(meta.currentSnapshotId.isEmpty)
  }

  test("append commits snapshots with lineage; read sees current state") {
    val cat = freshCatalog()
    cat.createTable("db", "t", schemaV1)
    import spark.implicits._
    cat.append("db", "t", Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"))
    cat.append("db", "t", Seq((3L, 3.0)).toDF("id", "v"))
    val meta = cat.describe("db", "t")
    assert(meta.snapshots.map(_.snapshotId) == Seq(1L, 2L))
    assert(meta.snapshots.last.parentId.contains(1L))
    assert(meta.snapshots.last.sequenceNumber == 2L)
    assert(cat.read("db", "t").count() == 3)
  }

  test("time travel reads an older snapshot by id") {
    val cat = freshCatalog()
    cat.createTable("db", "t", schemaV1)
    import spark.implicits._
    cat.append("db", "t", Seq((1L, 1.0)).toDF("id", "v"))
    cat.append("db", "t", Seq((2L, 2.0)).toDF("id", "v"))
    assert(cat.read("db", "t", snapshotId = Some(1L)).count() == 1)
    assert(cat.read("db", "t", snapshotId = Some(2L)).count() == 2)
    intercept[NoSuchElementException](cat.read("db", "t", Some(99L)).count())
  }

  test("schema evolution: added column null-pads old files on read") {
    val cat = freshCatalog()
    cat.createTable("db", "t", schemaV1)
    import spark.implicits._
    cat.append("db", "t", Seq((1L, 1.0)).toDF("id", "v"))
    cat.append("db", "t", Seq((2L, 2.0, "x")).toDF("id", "v", "tag"))
    val out = cat.read("db", "t")
    assert(out.schema.fieldNames.toSeq == Seq("id", "v", "tag"))
    val old = out.filter(col("id") === 1L).select("tag").collect()
    assert(old.head.isNullAt(0))
    assert(out.filter(col("id") === 2L).select("tag").head().getString(0) == "x")
  }

  test("BACKWARD gate rejects drops and type changes") {
    val cat = freshCatalog()
    cat.createTable("db", "t", schemaV1)
    import spark.implicits._
    // dropped column
    intercept[IllegalArgumentException](
      cat.append("db", "t", Seq(Tuple1(1L)).toDF("id")))
    // type change
    intercept[IllegalArgumentException](
      cat.append("db", "t", Seq((1L, "s")).toDF("id", "v")))
    // direct checker surface
    val bad = SchemaCompat.evolve(schemaV1,
      StructType(Seq(StructField("id", StringType))))
    assert(bad.isLeft && bad.swap.toOption.get.size == 2)
  }

  test("empty table reads as empty with declared schema") {
    val cat = freshCatalog()
    cat.createTable("db", "t", schemaV1)
    val df = cat.read("db", "t")
    assert(df.count() == 0 && df.schema == schemaV1)
  }

  test("file stats enable manifest pruning; pruned read equals filtered read") {
    val cat = freshCatalog()
    cat.createTable("db", "t", schemaV1)
    import spark.implicits._
    // two appends with disjoint id ranges -> disjoint per-file stats
    cat.append("db", "t", (1L to 100L).map(i => (i, i * 1.0)).toDF("id", "v"))
    cat.append("db", "t", (1000L to 1100L).map(i => (i, i * 1.0)).toDF("id", "v"))
    val snap = cat.describe("db", "t").currentSnapshot.get
    assert(snap.fileStats.nonEmpty && snap.fileStats.forall(_.min.contains("id")))
    // range [1, 100] must prune every file of the second append
    val kept = cat.prunedFiles(snap, "id", 1.0, 100.0)
    assert(kept.nonEmpty && kept.size < snap.files.size)
    val pruned = cat.readWhere("db", "t", "id", 1.0, 100.0)
    val full = cat.read("db", "t").filter(col("id").between(1L, 100L))
    assert(pruned.count() == 100 && full.count() == 100)
  }

  test("N concurrent appenders (separate catalog instances) lose no update") {
    // round-2 VERDICT item 7: `synchronized` only guards ONE instance;
    // cross-process safety rests on the CREATE_NEW optimistic commit.
    // Simulate N independent writers with N catalog instances on the
    // SAME warehouse, appending concurrently.
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext
    val wh = tmpDir("graft-mw")
    val n = 6
    new SnapshotCatalog(spark, wh).createTable("db", "t", schemaV1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val writers = (1 to n).map { i =>
      Future {
        new SnapshotCatalog(spark, wh) // own instance: no shared lock
          .append("db", "t", Seq((i.toLong, i * 1.0)).toDF("id", "v"))
      }
    }
    Await.result(Future.sequence(writers), 120.seconds)
    pool.shutdown()
    val reader = new SnapshotCatalog(spark, wh)
    val meta = reader.describe("db", "t")
    // all N commits present, linear snapshot history, no lost update
    assert(meta.snapshots.map(_.snapshotId).sorted == (1L to n.toLong))
    assert(meta.snapshots.map(_.parentId).flatten.sorted == (1L until n.toLong))
    assert(reader.read("db", "t").count() == n)
    assert(reader.read("db", "t").select(sum("id")).head.getLong(0) == (1 to n).sum)
  }

  test("readIncremental returns only post-snapshot rows; rejects rewrites") {
    val cat = freshCatalog()
    cat.createTable("db", "t", schemaV1)
    import spark.implicits._
    cat.append("db", "t", Seq((1L, 1.0)).toDF("id", "v"))
    cat.append("db", "t", Seq((2L, 2.0)).toDF("id", "v"))
    cat.append("db", "t", Seq((3L, 3.0)).toDF("id", "v"))
    // everything after snapshot 1 = rows 2 and 3
    val inc = cat.readIncremental("db", "t", fromSnapshotId = 1L)
    assert(inc.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
    // bounded window: (1, 2] = row 2 only
    val win = cat.readIncremental("db", "t", 1L, Some(2L))
    assert(win.select("id").collect().map(_.getLong(0)).toSeq == Seq(2L))
    // from == current -> empty, declared schema intact
    val none = cat.readIncremental("db", "t", 3L)
    assert(none.count() == 0 && none.schema.fieldNames.contains("id"))
    // compaction rewrites files -> incremental across it must refuse
    cat.compact("db", "t", numFiles = 1)
    intercept[IllegalStateException](
      cat.readIncremental("db", "t", 1L).count())
  }

  test("expireSnapshots retains history window and deletes orphans") {
    val cat = freshCatalog()
    cat.createTable("db", "t", schemaV1)
    import spark.implicits._
    cat.append("db", "t", Seq((1L, 1.0)).toDF("id", "v"))
    cat.append("db", "t", Seq((2L, 2.0)).toDF("id", "v"))
    cat.append("db", "t", Seq((3L, 3.0)).toDF("id", "v"))
    val meta = cat.expireSnapshots("db", "t", keepLast = 2)
    assert(meta.snapshots.map(_.snapshotId) == Seq(2L, 3L))
    // cumulative manifests: snapshot 2 still references snapshot 1's
    // files, so nothing is orphaned and the table reads intact
    assert(cat.read("db", "t").count() == 3)
    intercept[NoSuchElementException](cat.read("db", "t", Some(1L)).count())
  }

  test("compact rewrites the manifest; old snapshots time-travel; expire frees files") {
    val cat = freshCatalog()
    cat.createTable("db", "t", schemaV1)
    import spark.implicits._
    (1 to 4).foreach(i => cat.append("db", "t", Seq((i.toLong, i * 1.0)).toDF("id", "v")))
    val before = cat.describe("db", "t").currentSnapshot.get.files.size
    val meta = cat.compact("db", "t", numFiles = 1)
    assert(meta.currentSnapshot.get.files.size == 1)
    assert(cat.read("db", "t").count() == 4)
    // pre-compaction snapshot still readable (time travel)
    assert(cat.read("db", "t", Some(4L)).count() == 4)
    assert(before > 1)
    // expiring history deletes the replaced small files
    cat.expireSnapshots("db", "t", keepLast = 1)
    val remaining = cat.describe("db", "t").currentSnapshot.get.files
    assert(remaining.forall(f => new java.io.File(f).exists()))
    assert(cat.read("db", "t").count() == 4)
  }

  test("rollback moves the pointer; history survives; appends fork") {
    val cat = freshCatalog()
    cat.createTable("db", "t", schemaV1)
    import spark.implicits._
    cat.append("db", "t", Seq((1L, 1.0)).toDF("id", "v"))
    cat.append("db", "t", Seq((2L, 2.0)).toDF("id", "v"))
    cat.append("db", "t", Seq((3L, 3.0)).toDF("id", "v"))
    cat.rollback("db", "t", snapshotId = 1L)
    // current state is snapshot 1; the abandoned future still time-travels
    assert(cat.read("db", "t").collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(cat.read("db", "t", Some(3L)).count() == 3)
    intercept[IllegalArgumentException](cat.rollback("db", "t", 99L))
    // appends after rollback chain off the rolled-back snapshot
    cat.append("db", "t", Seq((4L, 4.0)).toDF("id", "v"))
    val meta = cat.describe("db", "t")
    assert(meta.snapshots.last.parentId.contains(1L))
    assert(cat.read("db", "t").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 4L))
    // roll FORWARD is just another rollback
    cat.rollback("db", "t", 3L)
    assert(cat.read("db", "t").count() == 3)
  }

  test("expire after rollback always retains the current snapshot") {
    val cat = freshCatalog()
    cat.createTable("db", "t", schemaV1)
    import spark.implicits._
    (1 to 4).foreach(i => cat.append("db", "t", Seq((i.toLong, 1.0)).toDF("id", "v")))
    cat.rollback("db", "t", snapshotId = 1L)
    val meta = cat.expireSnapshots("db", "t", keepLast = 1)
    // tail-1 is snapshot 4, but current (1) must survive too
    assert(meta.snapshots.map(_.snapshotId).sorted == Seq(1L, 4L))
    assert(cat.read("db", "t").count() == 1)
  }

  test("branches + tags: write-audit-publish flow; tags immutable; expire pins refs") {
    val cat = freshCatalog()
    cat.createTable("db", "t", schemaV1)
    import spark.implicits._
    cat.append("db", "t", Seq((1L, 1.0)).toDF("id", "v"))
    cat.createTag("db", "t", "v1.0")
    cat.createBranch("db", "t", "audit")
    // stage two batches on the branch: readers still see only row 1
    cat.appendToBranch("db", "t", "audit", Seq((2L, 2.0)).toDF("id", "v"))
    cat.appendToBranch("db", "t", "audit", Seq((3L, 3.0)).toDF("id", "v"))
    assert(cat.read("db", "t").count() == 1)
    assert(cat.readRef("db", "t", "audit").count() == 3) // the audit view
    assert(cat.readRef("db", "t", "v1.0").count() == 1)
    // tags reject writes; unknown refs reject reads
    intercept[IllegalArgumentException](
      cat.appendToBranch("db", "t", "v1.0", Seq((9L, 9.0)).toDF("id", "v")))
    intercept[IllegalArgumentException](cat.readRef("db", "t", "nope"))
    // publish fast-forwards the current pointer; branch lineage intact
    cat.publish("db", "t", "audit")
    assert(cat.read("db", "t").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L))
    assert(cat.describe("db", "t").snapshots.last.parentId.contains(2L))
    // expire keeps every ref'd snapshot (the v1.0 tag pins snapshot 1)
    val meta = cat.expireSnapshots("db", "t", keepLast = 1)
    assert(meta.snapshots.map(_.snapshotId).contains(1L))
    assert(cat.readRef("db", "t", "v1.0").count() == 1)
    // dropping the tag then expiring frees it
    cat.dropRef("db", "t", "v1.0")
    val meta2 = cat.expireSnapshots("db", "t", keepLast = 1)
    assert(!meta2.snapshots.map(_.snapshotId).contains(1L))
  }

  test("removeOrphanFiles deletes only unreferenced data files") {
    val wh = tmpDir("graft-cat")
    val cat = new SnapshotCatalog(spark, wh)
    cat.createTable("db", "t", schemaV1)
    import spark.implicits._
    cat.append("db", "t", Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"))
    // plant a stray file where a failed write would leave one
    val stray = java.nio.file.Paths.get(wh, "db", "t", "data", "stray.parquet")
    Seq((9L, 9.0)).toDF("id", "v").coalesce(1)
      .write.mode("overwrite").parquet(stray.toString + ".dir")
    val part = java.nio.file.Files.list(
        java.nio.file.Paths.get(stray.toString + ".dir"))
      .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
    java.nio.file.Files.move(part, stray)
    // the DEFAULT sweep refuses the fresh stray: an unreferenced file
    // younger than the safety window may be a concurrent writer's
    // in-flight output (writes run outside the catalog lock) — the
    // Iceberg older_than contract
    assert(cat.removeOrphanFiles("db", "t").isEmpty,
      "a fresh unreferenced file must survive the default sweep")
    val deleted = cat.removeOrphanFiles("db", "t",
      Some(System.currentTimeMillis() + 1000))
    assert(deleted.map(p => p.substring(p.lastIndexOf('/') + 1)) ==
      Seq("stray.parquet"))
    assert(!java.nio.file.Files.exists(stray))
    // referenced data intact; a second vacuum is a no-op
    assert(cat.read("db", "t").count() == 2)
    assert(cat.removeOrphanFiles("db", "t",
      Some(System.currentTimeMillis() + 1000)).isEmpty)
  }

  test("incremental dedup pipeline: CDC file-diff feeds batch-vs-corpus dedup") {
    // the maintained-asset workflow from SCALING's t19 entry, end to
    // end: a catalog table of documents grows by appends; each ingest
    // reads ONLY the new files (readIncremental) and dedups the new
    // batch against the standing corpus — no corpus rescan, no
    // corpus-internal pair mining
    import graft.operators.Dedup
    val cat = freshCatalog()
    import spark.implicits._
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    cat.createTable("db", "docs", docSchema)
    val m0 = cat.append("db", "docs", Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different text with other words entirely")
    ).toDF("doc_id", "text"))
    val baseSnap = m0.currentSnapshotId.get
    // second ingest: one dup of doc 1, one novel doc
    cat.append("db", "docs", Seq(
      (3L, "the quick brown fox jumps over the lazy dog"),
      (4L, "nothing like anything seen before in this corpus")
    ).toDF("doc_id", "text"))
    val newBatch = cat.readIncremental("db", "docs", fromSnapshotId = baseSnap)
    assert(newBatch.collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 4L))
    val corpus = cat.read("db", "docs", snapshotId = Some(baseSnap))
    val dups = Dedup.ngramJaccardAgainst(newBatch, corpus, n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // only the new-vs-standing dup appears: (3 -> 1); 4 is clean and
    // the corpus-internal non-pair (1,2) is never even considered
    assert(dups == Seq((3L, 1L)))
  }

  test("string column stats: truncated bounds prune lexicographic ranges") {
    val cat = freshCatalog()
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("cat", StringType)))
    cat.createTable("db", "t", schema)
    import spark.implicits._
    cat.append("db", "t", Seq((1L, "apple"), (2L, "banana")).toDF("id", "cat"))
    cat.append("db", "t", Seq((3L, "yak" + "z" * 100), (4L, "zebra")).toDF("id", "cat"))
    val snap = cat.describe("db", "t").currentSnapshot.get
    // truncated upper bound stays a valid upper bound
    val longStat = snap.fileStats.flatMap(_.max.get("cat")).find(_.length <= 65)
    assert(snap.fileStats.flatMap(_.max.get("cat")).forall(_.length <= 65))
    val kept = cat.prunedFilesString(snap, "cat", "a", "c")
    assert(kept.nonEmpty && kept.size < snap.files.size,
      s"files ${snap.files.size} kept ${kept.size} ($longStat)")
  }

  test("concurrent writers: optimistic commit retry loses no appends") {
    val wh = tmpDir("graft-race")
    val catA = new SnapshotCatalog(spark, wh)
    val catB = new SnapshotCatalog(spark, wh) // separate instance = real FS race
    catA.createTable("db", "t", schemaV1)
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fa = Future {
      (1 to 3).foreach(i => catA.append("db", "t", Seq((i.toLong, 1.0)).toDF("id", "v")))
    }
    val fb = Future {
      (4 to 6).foreach(i => catB.append("db", "t", Seq((i.toLong, 2.0)).toDF("id", "v")))
    }
    Await.result(fa, 120.seconds)
    Await.result(fb, 120.seconds)
    val meta = catA.describe("db", "t")
    assert(meta.snapshots.size == 6, meta.snapshots.map(_.snapshotId))
    assert(catA.read("db", "t").count() == 6)
  }

  test("commit is versioned: losing writer cannot overwrite metadata") {
    val cat = freshCatalog()
    cat.createTable("db", "t", schemaV1)
    import spark.implicits._
    cat.append("db", "t", Seq((1L, 1.0)).toDF("id", "v"))
    // v00001 (create) and v00002 (append) both exist; pointer at 2;
    // the append's heavy payload went to its side manifest (round 15)
    val metaDir = new java.io.File(s"${cat.warehouse}/db/t/metadata")
    val versions = metaDir.listFiles().map(_.getName)
      .filter(_.startsWith("v")).filter(_.endsWith(".json")).sorted
    assert(versions.toSeq == Seq("v00001.metadata.json", "v00002.metadata.json"))
    assert(metaDir.listFiles().map(_.getName)
      .count(_.startsWith("manifest-")) == 1)
    intercept[java.nio.file.FileAlreadyExistsException] {
      java.nio.file.Files.write(
        metaDir.toPath.resolve("v00002.metadata.json"), "x".getBytes,
        java.nio.file.StandardOpenOption.CREATE_NEW)
    }
  }

  test("per-file blooms: point lookups skip files min/max cannot") {
    val cat = freshCatalog()
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("uid", StringType), StructField("n", LongType)))
    cat.createTable("db", "b", schema,
      Map(SnapshotCatalog.BloomColumnsProp -> "uid, n"))
    // three appends = three file sets with INTERLEAVED uid ranges, so
    // lexicographic min/max stats cannot separate them — only the bloom
    cat.append("db", "b", (0 until 300 by 3).map(i => (f"user_$i%04d", i.toLong)).toDF("uid", "n"))
    cat.append("db", "b", (1 until 300 by 3).map(i => (f"user_$i%04d", i.toLong)).toDF("uid", "n"))
    cat.append("db", "b", (2 until 300 by 3).map(i => (f"user_$i%04d", i.toLong)).toDF("uid", "n"))
    val snap = cat.describe("db", "b").currentSnapshot.get
    assert(snap.fileStats.forall(_.blooms.exists(_.contains("uid"))))

    // present value: exactly the matching row comes back, and at least
    // the two other appends' files are skipped
    val kept = cat.prunedFilesBloom(snap, "uid", "user_0042")
    assert(kept.size < snap.files.size, s"bloom skipped nothing (${snap.files.size} files)")
    val hit = cat.readEquals("db", "b", "uid", "user_0042").collect()
    assert(hit.map(_.getString(0)).toSeq == Seq("user_0042"))

    // integral-column bloom probes via the canonical rendering
    assert(cat.readEquals("db", "b", "n", "41").count() == 1)

    // absent value: overwhelmingly pruned to nothing, result empty
    assert(cat.readEquals("db", "b", "uid", "user_9999").count() == 0)

    // equality stays consistent with the unpruned read
    val full = cat.read("db", "b").filter(col("uid") === "user_0123").count()
    assert(cat.readEquals("db", "b", "uid", "user_0123").count() == full)
  }

  test("hidden partitioning: days() spec writes value-pure files, range reads prune") {
    import graft.catalog.PartitionSpec
    val cat = freshCatalog()
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("v", LongType)))
    cat.createTable("db", "p", schema,
      Map(PartitionSpec.PropertyKey -> "days(ts)"))
    // 3 days x 8 events in ONE append — an unpartitioned write would
    // put all days in each task's file
    val rows = for (d <- 0 until 3; i <- 0 until 8)
      yield (new java.sql.Timestamp(86400000L * (20000 + d) + i * 3600000L),
        (d * 8 + i).toLong)
    cat.append("db", "p", rows.toDF("ts", "v"))

    val snap = cat.describe("db", "p").currentSnapshot.get
    // every file is value-pure and carries its partition value
    assert(snap.fileStats.nonEmpty && snap.fileStats.forall(_.pval.isDefined))
    assert(snap.fileStats.map(_.pval.get).distinct.size == 3)
    // the hidden column never reaches readers
    val out = cat.read("db", "p")
    assert(out.columns.toSeq == Seq("ts", "v") && out.count() == 24)
    // a one-day ts range prunes to that day's files via the (now
    // tight) source-column stats — the hidden-partitioning payoff:
    // the query filters ts, never a derived date string
    val day1 = 86400000L * 20001 / 1000.0
    val kept = cat.prunedFiles(snap, "ts", day1, day1 + 86399.0)
    assert(kept.size < snap.files.size, "range read pruned nothing")
    val keptPvals = snap.fileStats.filter(s => kept.contains(s.path))
      .flatMap(_.pval).distinct
    assert(keptPvals.forall(_ == keptPvals.head), s"kept mixed days: $keptPvals")
    assert(cat.readWhere("db", "p", "ts", day1, day1 + 86399.0).count() == 8)
  }

  test("hidden partitioning: bucket() spec makes equality lookups metadata-pruned") {
    import graft.catalog.PartitionSpec
    val cat = freshCatalog()
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", LongType)))
    cat.createTable("db", "bk", schema,
      Map(PartitionSpec.PropertyKey -> "bucket(4, k)"))
    cat.append("db", "bk", (0L until 400L).map(i => (i, i * 10)).toDF("k", "v"))

    val snap = cat.describe("db", "bk").currentSnapshot.get
    assert(snap.fileStats.forall(_.pval.isDefined))
    assert(snap.fileStats.map(_.pval.get).distinct.size == 4)
    // k's min/max stats span every bucket file (hash order), so range
    // stats cannot help an equality lookup — the recorded bucket value
    // can: only the matching bucket's files survive
    val spec = cat.partitionSpecOf("db", "bk").get
    val pv = cat.pvalOfLiteral(spec, "42", LongType)
    val kept = cat.prunedFilesPval(snap, pv, "bucket(4, k)")
    assert(kept.size < snap.files.size, "bucket pruning kept everything")
    val hit = cat.readEquals("db", "bk", "k", "42").collect()
    assert(hit.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((42L, 420L)))
    // parity with the unpruned read on a value from another bucket
    assert(cat.readEquals("db", "bk", "k", "7").count() ==
      cat.read("db", "bk").filter(col("k") === 7).count())
  }

  test("partition spec evolution: old files stay readable, new appends use the new spec") {
    import graft.catalog.PartitionSpec
    val cat = freshCatalog()
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("v", LongType)))
    cat.createTable("db", "ev", schema)                      // unpartitioned era
    val rows = for (d <- 0 until 2; i <- 0 until 4)
      yield (new java.sql.Timestamp(86400000L * (20000 + d) + i * 3600000L),
        (d * 4 + i).toLong)
    cat.append("db", "ev", rows.toDF("ts", "v"))
    cat.updateProperties("db", "ev",
      Map(PartitionSpec.PropertyKey -> "days(ts)"))          // evolve
    cat.append("db", "ev", rows.map { case (t, v) => (t, v + 100) }.toDF("ts", "v"))

    val snap = cat.describe("db", "ev").currentSnapshot.get
    val (oldEra, newEra) = snap.fileStats.partition(_.pval.isEmpty)
    assert(oldEra.nonEmpty && newEra.nonEmpty)
    assert(newEra.map(_.pval.get).distinct.size == 2)
    // mixed-era reads stay correct: 16 rows, both value sets
    assert(cat.read("db", "ev").count() == 16)
    // range pruning keeps ALL old-era files (no pval, wide stats ok)
    // plus only the matching new-era day — conservative, never wrong
    val day1 = 86400000L * 20001 / 1000.0
    assert(cat.readWhere("db", "ev", "ts", day1, day1 + 86399.0).count() == 8)
  }

  test("timestamp pvals are UTC-instant based — cross-timezone sessions agree") {
    import graft.catalog.PartitionSpec
    val cat = freshCatalog()
    import spark.implicits._
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
      val i0 = java.time.Instant.parse("2020-03-10T01:30:00Z")
      val i1 = java.time.Instant.parse("2020-03-11T23:45:00Z")
      val df = Seq(
        (java.sql.Timestamp.from(i0), 1L),
        (java.sql.Timestamp.from(i1), 2L)).toDF("ts", "v")
      cat.createTable("db", "tzp", df.schema,
        Map(PartitionSpec.PropertyKey -> "identity(ts)"))
      cat.append("db", "tzp", df)
      // recorded pvals render the INSTANT in UTC, not the writer's zone
      val pvals = cat.describe("db", "tzp").currentSnapshot.get
        .fileStats.flatMap(_.pval).toSet
      assert(pvals == Set("2020-03-10 01:30:00.000000",
        "2020-03-11 23:45:00.000000"), pvals)

      // a session in a DIFFERENT timezone probes the same instant and
      // still finds the row — the pre-fix behavior derived the pval in
      // the prober's zone and silently pruned the matching file away
      spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
      val tokyoWall = java.time.LocalDateTime
        .ofInstant(i0, java.time.ZoneId.of("Asia/Tokyo"))
        .format(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss"))
      val got = cat.readEquals("db", "tzp", "ts", tokyoWall)
      assert(got.count() == 1 && got.head().getLong(1) == 1L)
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("truncate(): numeric columns truncate to width multiples, strings substring") {
    import graft.catalog.PartitionSpec
    import spark.implicits._
    val spec = PartitionSpec.parse("truncate(10, v)")
    val got = Seq(17L, -7L, 103L, 0L).toDF("v")
      .select(spec.valueExprFor(Some(LongType)).as("p"))
      .collect().map(_.getString(0)).toSeq
    // Iceberg spec-v1 semantics: v - (v mod W), floor-biased
    assert(got == Seq("10", "-10", "100", "0"), got)
    val sspec = PartitionSpec.parse("truncate(3, s)")
    val sgot = Seq("abcdef", "ab").toDF("s")
      .select(sspec.valueExprFor(Some(StringType)).as("p"))
      .collect().map(_.getString(0)).toSeq
    assert(sgot == Seq("abc", "ab"), sgot)
    // write + equality probe agree end-to-end (17 and -7 land in
    // different width bins; the probe must re-derive the same bin)
    val cat = freshCatalog()
    cat.createTable("db", "tr", StructType(Seq(StructField("v", LongType))),
      Map(PartitionSpec.PropertyKey -> "truncate(10, v)"))
    cat.append("db", "tr", Seq(17L, -7L, 25L).toDF("v"))
    assert(cat.readEquals("db", "tr", "v", "17").count() == 1)
    assert(cat.readEquals("db", "tr", "v", "-7").count() == 1)
  }

  test("snapshot isolation: an in-flight reader is unaffected by later commits") {
    val cat = freshCatalog()
    import spark.implicits._
    val schema = StructType(Seq(StructField("id", LongType)))
    cat.createTable("db", "iso", schema)
    cat.append("db", "iso", Seq(1L, 2L).toDF("id"))
    // resolve the read BEFORE further commits: pointer -> snapshot ->
    // file list happens at read() time, and data files are immutable,
    // so the frame keeps answering from its snapshot
    val reader = cat.read("db", "iso")
    cat.append("db", "iso", Seq(3L, 4L).toDF("id"))
    cat.deleteWhere("db", "iso", "id", 0.0, 1.5) // rewrites id=1 away
    assert(reader.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L),
      "reader must keep its snapshot view")
    assert(cat.read("db", "iso").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(2L, 3L, 4L))
  }

  test("partition spec evolution between bucket widths keeps old-era files") {
    import graft.catalog.PartitionSpec
    val cat = freshCatalog()
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", LongType)))
    cat.createTable("db", "bw", schema,
      Map(PartitionSpec.PropertyKey -> "bucket(4, k)"))
    cat.append("db", "bw", (0L until 100L).map(i => (i, i)).toDF("k", "v"))
    cat.updateProperties("db", "bw",
      Map(PartitionSpec.PropertyKey -> "bucket(8, k)"))
    cat.append("db", "bw", (100L until 200L).map(i => (i, i)).toDF("k", "v"))
    // a mod-4-era pval is meaningless under the mod-8 spec: old files
    // must be kept conservatively, so every key still resolves
    for (key <- Seq(7L, 42L, 150L)) {
      assert(cat.readEquals("db", "bw", "k", key.toString).count() == 1L,
        s"key $key lost across spec evolution")
    }
    // new-era files still prune: some file is skipped for a new-era key
    val snap = cat.describe("db", "bw").currentSnapshot.get
    val spec = cat.partitionSpecOf("db", "bw").get
    val pv = cat.pvalOfLiteral(spec, "150", LongType)
    val kept = cat.prunedFilesPval(snap, pv, "bucket(8, k)")
    assert(kept.size < snap.files.size)
  }

  test("partition-spec EVOLUTION prunes per era (per-file spec ids): " +
      "equality lookups stay metadata-exact in BOTH eras; compaction " +
      "migrates rewritten files to the current spec") {
    import graft.catalog.PartitionSpec
    val cat = freshCatalog()
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", LongType)))
    cat.createTable("db", "pe", schema,
      Map(PartitionSpec.PropertyKey -> "bucket(4, k)"))
    // coalesce(1): one file per bucket value, so the per-era file
    // counts below are exact (partitionBy splits per input partition)
    cat.append("db", "pe",
      (0L until 100L).map(i => (i, i)).toDF("k", "v").coalesce(1))
    cat.updateProperties("db", "pe",
      Map(PartitionSpec.PropertyKey -> "bucket(8, k)"))
    cat.append("db", "pe",
      (100L until 200L).map(i => (i, i)).toDF("k", "v").coalesce(1))
    val snap = cat.describe("db", "pe").currentSnapshot.get
    val eraA = snap.fileStats.filter(_.pspec.contains("bucket(4, k)"))
      .map(_.path).toSet
    val eraB = snap.fileStats.filter(_.pspec.contains("bucket(8, k)"))
      .map(_.path).toSet
    assert(eraA.size == 4 && eraB.size == 8,
      s"expected 4+8 era files, got ${eraA.size}+${eraB.size}")
    // per-era pruning: a key in era A's range keeps exactly ONE era-A
    // file (its mod-4 bucket) and ONE era-B file (its mod-8 bucket) —
    // plan-pinned file counts, no conservative whole-era keeps
    val kept42 = cat.prunedFilesPvalEras(snap, "k", "42", LongType).toSet
    assert((kept42 & eraA).size == 1,
      s"era-A must prune to its one bucket file, kept ${(kept42 & eraA).size}")
    assert((kept42 & eraB).size == 1,
      s"era-B must prune to its one bucket file, kept ${(kept42 & eraB).size}")
    // results stay exact in both eras
    for (key <- Seq(7L, 42L, 150L, 199L))
      assert(cat.readEquals("db", "pe", "k", key.toString).count() == 1L,
        s"key $key lost under per-era pruning")
    // a value present in NEITHER era reads empty through the pruned path
    assert(cat.readEquals("db", "pe", "k", "5000").count() == 0L)
    // compaction migrates every rewritten file to the CURRENT spec:
    // all 12 files are tiny, so one bin-pack pass drains era A
    cat.compactFileGroups("db", "pe", minFileBytes = 1L << 20)
    val after = cat.describe("db", "pe").currentSnapshot.get
    assert(after.fileStats.forall(_.pspec.contains("bucket(8, k)")),
      s"compaction must migrate to the current spec, got " +
        s"${after.fileStats.flatMap(_.pspec).distinct}")
    val keptAfter = cat.prunedFilesPvalEras(after, "k", "42", LongType)
    assert(keptAfter.size < after.files.size)
    assert(cat.readEquals("db", "pe", "k", "42").count() == 1L)
  }

  test("identity partition values with '+' survive path escaping") {
    import graft.catalog.PartitionSpec
    val cat = freshCatalog()
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("tag", StringType), StructField("v", LongType)))
    cat.createTable("db", "pp", schema,
      Map(PartitionSpec.PropertyKey -> "identity(tag)"))
    cat.append("db", "pp",
      Seq(("c+err", 1L), ("ok tag", 2L), ("a%2Fb", 3L)).toDF("tag", "v"))
    // '+' must NOT decode to space; '%xx' written by Spark's path
    // escaping must decode; a literal %2F in the DATA round-trips
    val snap = cat.describe("db", "pp").currentSnapshot.get
    assert(snap.fileStats.flatMap(_.pval).toSet ==
      Set("c+err", "ok tag", "a%2Fb"))
    for ((tag, v) <- Seq(("c+err", 1L), ("ok tag", 2L), ("a%2Fb", 3L))) {
      val got = cat.readEquals("db", "pp", "tag", tag).collect()
      assert(got.map(_.getLong(1)).toSeq == Seq(v), s"tag '$tag'")
    }
  }

  test("bloom positions agree between probe side and write side") {
    // the SQL-expression mirror (md5/conv/substring) must hash to the
    // same positions as the JVM probe — otherwise pruning silently
    // drops matching files
    import spark.implicits._
    val values = Seq("a", "user_0042", "", "∆-unicode", "123")
    val sparkPos = values.toDF("v").select(
      expr(s"transform(sequence(0, ${SnapshotCatalog.BloomProbes - 1}), " +
        s"i -> cast(conv(substring(md5(v), i * 8 + 1, 8), 16, 10) as long) " +
        s"% ${SnapshotCatalog.BloomBits})").as("ps"))
      .collect().map(_.getSeq[Long](0).map(_.toInt))
    values.zip(sparkPos).foreach { case (v, ps) =>
      assert(SnapshotCatalog.bloomPositions(v) == ps, s"drift for '$v'")
    }
  }

  test("metadata without blooms (pre-bloom tables) still reads and prunes") {
    val cat = freshCatalog()
    import spark.implicits._
    cat.createTable("db", "nb", schemaV1) // no bloom property
    cat.append("db", "nb", Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"))
    val snap = cat.describe("db", "nb").currentSnapshot.get
    assert(snap.fileStats.forall(_.blooms.isEmpty))
    // bloom pruning keeps everything (conservative), equality still right
    assert(cat.prunedFilesBloom(snap, "id", "1") == snap.files)
    assert(cat.readEquals("db", "nb", "id", "2").count() == 1)
  }

  test("truncUpper carries past \\uffff so the bound stays >= the data") {
    val cat = freshCatalog()
    // plain case: last truncated char incremented
    assert(cat.truncUpper("a" * 65) == "a" * 63 + "b")
    // char 64 is uffff: increment must carry LEFT, not wrap to NUL
    val v = "a" * 63 + "\uffff" + "zzz"
    val up = cat.truncUpper(v)
    assert(up == "a" * 62 + "b", s"got ${up.length} chars")
    assert(up.compareTo(v) > 0, "upper bound must compare above the value")
    // all-uffff prefix: no finite truncated bound exists; keep full value
    val all = "\uffff" * 70
    assert(cat.truncUpper(all) == all)
    // short strings pass through untouched
    assert(cat.truncUpper("abc") == "abc")
  }

  test("rewriteFiles optimistic guard: a plan made against a stale " +
      "snapshot is refused; a fresh plan commits") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cat = freshCatalog()
    cat.createTable("db", "t", schemaV1)
    cat.append("db", "t", Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"))
    val stale = cat.describe("db", "t").currentSnapshot.get
    // a concurrent writer lands between plan and rewrite
    cat.append("db", "t", Seq((3L, 3.0)).toDF("id", "v"))
    intercept[java.util.ConcurrentModificationException] {
      cat.rewriteFiles("db", "t", stale.files,
        d => d.filter(col("id") =!= 1L), Some(stale.snapshotId))
    }
    // nothing moved: the refused rewrite committed no snapshot
    assert(cat.read("db", "t").count() == 3)
    // re-plan against the current snapshot → commits
    val cur = cat.describe("db", "t").currentSnapshot.get
    cat.rewriteFiles("db", "t", cur.files,
      d => d.filter(col("id") =!= 1L), Some(cur.snapshotId))
    assert(cat.read("db", "t").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(2L, 3L))
  }

  test("maintain: 50 streamed micro-batches, then one maintenance pass — " +
      "file count drops, tagged snapshot still time-travels, refs never dangle") {
    import spark.implicits._
    val cat = freshCatalog()
    cat.createTable("db", "s", schemaV1)
    // a streaming sink's commit pattern: one tiny append per micro-batch
    for (b <- 0 until 50)
      cat.append("db", "s",
        Seq((b.toLong, b.toDouble)).toDF("id", "v").coalesce(1),
        Map("graft.test.batch" -> b.toString))
    // audit tag early in the history (the WAP pattern's pinned ref)
    val taggedSnap = cat.describe("db", "s").snapshots(9).snapshotId
    cat.createTag("db", "s", "audit-b10", Some(taggedSnap))
    // plus a merge-on-read delete so maintenance has a delete side to fold
    val cur = cat.describe("db", "s").currentSnapshot.get
    val pos = cat.readFilesWithRowId(cur, schemaV1, cur.files)
      .filter(col("id") < 5L)
      .select(SnapshotCatalog.RowIdFileCol, SnapshotCatalog.RowIdPosCol)
    cat.addDeleteFile("db", "s", pos, None)
    val filesBefore = cat.describe("db", "s").currentSnapshot.get.files.size
    assert(filesBefore >= 50)

    val report = cat.maintain("db", "s", keepLast = 5, targetFiles = 4)
    assert(report.compacted && report.filesAfter <= 4,
      s"file count did not drop: $report")
    assert(report.snapshotsAfter < report.snapshotsBefore)
    // the current state reads correctly (delete side folded in)
    assert(cat.read("db", "s").count() == 45)
    assert(cat.describe("db", "s").currentSnapshot.get.deleteFiles.isEmpty)
    // the TAGGED snapshot survived expiry and still time-travels
    val tagged = cat.readRef("db", "s", "audit-b10")
    assert(tagged.count() == 10)
    assert(tagged.collect().map(_.getLong(0)).sorted.toSeq == (0L until 10L))
    // on-disk file population matches the retained manifests exactly:
    // another orphan sweep finds nothing left to do
    assert(cat.removeOrphanFiles("db", "s",
      Some(System.currentTimeMillis() + 1000)).isEmpty)
    // a second maintenance pass is a cheap no-op (already compacted)
    val again = cat.maintain("db", "s", keepLast = 5, targetFiles = 4)
    assert(!again.compacted && again.orphansRemoved == 0)
  }

  private def md5Of(path: String): String = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString
  }

  test("merge-on-read positional deletes: data files stay byte-identical, " +
      "reads hide deleted rows, time travel and stats arithmetic hold") {
    import spark.implicits._
    val cat = freshCatalog()
    cat.createTable("db", "t", schemaV1)
    for (lo <- Seq(0L, 10L, 20L))
      cat.append("db", "t",
        (lo until lo + 10L).map(i => (i, i.toDouble)).toDF("id", "v").coalesce(1))
    val before = cat.describe("db", "t").currentSnapshot.get
    val hashesBefore = before.files.map(f => f -> md5Of(f)).toMap

    // delete ids 3..5 via a positional delete file
    val positions = cat.readFilesWithRowId(before, schemaV1, before.files)
      .filter(col("id").between(3L, 5L))
      .select(SnapshotCatalog.RowIdFileCol, SnapshotCatalog.RowIdPosCol)
    val (metaAfter, written) =
      cat.addDeleteFile("db", "t", positions, Some(before.snapshotId))
    assert(written == 3L)
    val after = metaAfter.currentSnapshot.get
    // the defining v2 property: the SAME data files, byte for byte
    assert(after.files == before.files)
    after.files.foreach(f => assert(md5Of(f) == hashesBefore(f),
      s"data file $f changed under a merge-on-read delete"))
    assert(after.deleteFiles.size == 1)
    // reads hide the deleted rows; time travel still sees them
    assert(cat.read("db", "t").count() == 27)
    assert(!cat.read("db", "t").collect().map(_.getLong(0)).contains(4L))
    assert(cat.read("db", "t", Some(before.snapshotId)).count() == 30)
    // manifest live-row arithmetic is exact (the metadata-count path)
    assert(after.statsRowCount.contains(27L))

    // a second overlapping delete dedupes: only NEW positions count
    val pos2 = cat.readFilesWithRowId(before, schemaV1, before.files)
      .filter(col("id").between(5L, 7L))
      .select(SnapshotCatalog.RowIdFileCol, SnapshotCatalog.RowIdPosCol)
    val (m2, w2) = cat.addDeleteFile("db", "t", pos2, None)
    assert(w2 == 2L, "id 5 was already deleted — must not double-count")
    assert(m2.currentSnapshot.get.statsRowCount.contains(25L))
    assert(cat.read("db", "t").count() == 25)

    // pruned + equality reads apply deletes too
    assert(cat.readWhere("db", "t", "id", 0.0, 9.0).count() == 5)
    assert(cat.readEquals("db", "t", "id", "6").count() == 0)
    assert(cat.readEquals("db", "t", "id", "8").count() == 1)

    // incremental read across a delete snapshot must refuse
    intercept[IllegalStateException] {
      cat.readIncremental("db", "t", before.snapshotId).count()
    }

    // compact folds the delete side back into data files
    val folded = cat.compact("db", "t", numFiles = 2).currentSnapshot.get
    assert(folded.deleteFiles.isEmpty)
    assert(cat.read("db", "t").count() == 25)
    assert(folded.statsRowCount.contains(25L))
  }

  test("RENAME/DROP COLUMN with field ids: old files resolve by id, " +
      "time travel stays correct, re-added names never resurrect data") {
    import spark.implicits._
    val cat = freshCatalog()
    cat.createTable("db", "t", schemaV1) // (id, v)
    cat.append("db", "t", Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"))
    val preRename = cat.describe("db", "t").currentSnapshotId.get

    // metadata-only rename: NO data file rewritten
    val filesBefore = cat.describe("db", "t").currentSnapshot.get.files
    cat.renameColumn("db", "t", "v", "amount")
    assert(cat.describe("db", "t").currentSnapshot.get.files == filesBefore)
    assert(cat.schemaOf("db", "t").fieldNames.toSeq == Seq("id", "amount"))
    // old files (written under 'v') resolve by field id
    val rows = cat.read("db", "t").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows == Seq((1L, 10.0), (2L, 20.0)), s"got $rows")
    // time travel to a PRE-rename snapshot reads correct data too
    assert(cat.read("db", "t", Some(preRename)).orderBy("id")
      .collect().map(_.getDouble(1)).toSeq == Seq(10.0, 20.0))
    // appends under the NEW name mix with old-name files transparently
    cat.append("db", "t", Seq((3L, 30.0)).toDF("id", "amount"))
    assert(cat.read("db", "t").agg(sum("amount")).head().getDouble(0) == 60.0)
    // stats re-keyed: pruning on the new name still works
    val snapR = cat.describe("db", "t").currentSnapshot.get
    assert(cat.readWhere("db", "t", "amount", 25.0, 35.0).count() == 1)
    assert(snapR.fileStats.forall(_.min.contains("amount")))
    assert(snapR.fileStats.forall(!_.min.contains("v")))
    // rename collision + unknown source rejected
    intercept[IllegalArgumentException](cat.renameColumn("db", "t", "id", "amount"))
    intercept[IllegalArgumentException](cat.renameColumn("db", "t", "nope", "x"))

    // DROP then re-ADD the same name: fresh id, old data must NOT
    // resurface from files that physically still contain 'amount'
    cat.dropColumn("db", "t", "amount")
    assert(cat.schemaOf("db", "t").fieldNames.toSeq == Seq("id"))
    assert(cat.read("db", "t").count() == 3)
    cat.addColumns("db", "t", Seq(
      org.apache.spark.sql.types.StructField("amount",
        org.apache.spark.sql.types.DoubleType)))
    val resurrected = cat.read("db", "t")
      .filter(col("amount").isNotNull).count()
    assert(resurrected == 0,
      s"dropped column data resurfaced in $resurrected rows")
    // new writes under the re-added name are visible
    cat.append("db", "t", Seq((4L, 40.0)).toDF("id", "amount"))
    assert(cat.read("db", "t").filter(col("amount").isNotNull).count() == 1)
  }

  test("merge-on-read delete entries survive a rename (positions are " +
      "name-independent)") {
    import spark.implicits._
    val cat = freshCatalog()
    cat.createTable("db", "t", schemaV1)
    cat.append("db", "t",
      (0L until 10L).map(i => (i, i.toDouble)).toDF("id", "v").coalesce(1))
    val snap = cat.describe("db", "t").currentSnapshot.get
    val pos = cat.readFilesWithRowId(snap, schemaV1, snap.files)
      .filter(col("id") < 4L)
      .select(SnapshotCatalog.RowIdFileCol, SnapshotCatalog.RowIdPosCol)
    cat.addDeleteFile("db", "t", pos, None)
    cat.renameColumn("db", "t", "v", "w")
    assert(cat.read("db", "t").count() == 6)
    assert(cat.read("db", "t").agg(sum("w")).head().getDouble(0) ==
      (4 to 9).sum.toDouble)
  }

  test("append after a merge-on-read delete carries the delete side — " +
      "deleted rows never resurrect") {
    import spark.implicits._
    val cat = freshCatalog()
    cat.createTable("db", "t", schemaV1)
    cat.append("db", "t",
      (0L until 10L).map(i => (i, i.toDouble)).toDF("id", "v").coalesce(1))
    val snap = cat.describe("db", "t").currentSnapshot.get
    val pos = cat.readFilesWithRowId(snap, schemaV1, snap.files)
      .filter(col("id") < 3L)
      .select(SnapshotCatalog.RowIdFileCol, SnapshotCatalog.RowIdPosCol)
    cat.addDeleteFile("db", "t", pos, None)
    assert(cat.read("db", "t").count() == 7)
    // the regression shape: a plain append commits a NEW snapshot — it
    // must keep referencing the delete file, not silently drop it
    cat.append("db", "t", Seq((100L, 1.0)).toDF("id", "v"))
    val after = cat.describe("db", "t").currentSnapshot.get
    assert(after.deleteFiles.size == 1,
      "append dropped the merge-on-read delete side")
    assert(cat.read("db", "t").count() == 8)
    assert(after.statsRowCount.contains(8L))
    // overwrite REPLACES everything: no stale delete side survives
    cat.overwrite("db", "t", Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"))
    val ow = cat.describe("db", "t").currentSnapshot.get
    assert(ow.deleteFiles.isEmpty && cat.read("db", "t").count() == 2)
  }

  test("equality deletes: delete-by-key with zero read IO; a row " +
      "re-appended AFTER the delete survives it (sequence rule)") {
    import spark.implicits._
    val cat = freshCatalog()
    cat.createTable("db", "t", schemaV1)
    cat.append("db", "t",
      (0L until 10L).map(i => (i, i.toDouble)).toDF("id", "v").coalesce(1))
    val dataFiles = cat.describe("db", "t").currentSnapshot.get.files
    val hashBefore = dataFiles.map(f =>
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f)).length)

    // CDC-style delete of keys 2,3,99 (99 matches nothing)
    val (m1, entries) = cat.addEqualityDeleteFile("db", "t",
      Seq(2L, 3L, 99L).toDF("id"), Seq("id"))
    assert(entries == 3L)
    // zero read/write amplification: same data files, byte for byte
    assert(m1.currentSnapshot.get.files == dataFiles)
    assert(dataFiles.map(f => java.nio.file.Files
      .readAllBytes(java.nio.file.Paths.get(f)).length) == hashBefore)
    assert(cat.read("db", "t").count() == 8)
    assert(!cat.read("db", "t").collect().map(_.getLong(0)).contains(2L))
    // metadata count falls through to the scan (never a silent
    // undercount): statsRowCount is unprovable under equality deletes
    assert(m1.currentSnapshot.get.statsRowCount.isEmpty)

    // THE SEQUENCE RULE: re-append id=2 after the delete — the new row
    // must survive (its file's seq > the delete's seq)
    cat.append("db", "t", Seq((2L, 22.0)).toDF("id", "v"))
    val back = cat.read("db", "t").filter(col("id") === 2L).collect()
    assert(back.length == 1 && back.head.getDouble(1) == 22.0,
      "re-inserted row must survive an OLDER equality delete")
    assert(cat.read("db", "t").count() == 9)

    // positional + equality compose: positionally delete id=5 too
    val snap = cat.describe("db", "t").currentSnapshot.get
    val pos = cat.readFilesWithRowId(snap, schemaV1, snap.files)
      .filter(col("id") === 5L)
      .select(SnapshotCatalog.RowIdFileCol, SnapshotCatalog.RowIdPosCol)
    cat.addDeleteFile("db", "t", pos, None)
    assert(cat.read("db", "t").count() == 8)
    // time travel: before any deletes all 10 rows
    assert(cat.read("db", "t", Some(1L)).count() == 10)

    // compact folds BOTH flavors into plain data files
    val folded = cat.compact("db", "t", numFiles = 1).currentSnapshot.get
    assert(folded.deleteFiles.isEmpty && folded.eqDeletes.isEmpty)
    assert(cat.read("db", "t").count() == 8)
    assert(folded.statsRowCount.contains(8L))
    // maintenance never reaps a referenced equality delete file
    assert(cat.removeOrphanFiles("db", "t",
      Some(System.currentTimeMillis() + 1000)).isEmpty)
  }

  test("readChangelog: net row-level changes across delete-bearing " +
      "windows, where readIncremental refuses") {
    import spark.implicits._
    val cat = freshCatalog()
    cat.createTable("db", "t", schemaV1)
    cat.append("db", "t",
      (0L until 10L).map(i => (i, i.toDouble)).toDF("id", "v").coalesce(1))
    val s1 = cat.describe("db", "t").currentSnapshotId.get
    // window: a CDC batch (update key 3, delete key 7, insert key 100)
    cat.cdcUpsert("db", "t",
      rows = Seq((3L, 33.0), (100L, 1.0)).toDF("id", "v"),
      deletes = Seq(7L).toDF("id"), Seq("id"))
    // plus a positional delete of key 5
    val cur = cat.describe("db", "t").currentSnapshot.get
    val pos = cat.readFilesWithRowId(cur, schemaV1, cur.files)
      .filter(col("id") === 5L)
      .select(SnapshotCatalog.RowIdFileCol, SnapshotCatalog.RowIdPosCol)
    cat.addDeleteFile("db", "t", pos, None)
    // incremental read refuses the window...
    intercept[IllegalStateException] {
      cat.readIncremental("db", "t", s1).count()
    }
    // ...the changelog serves it: updates appear as delete+insert pairs
    val changes = cat.readChangelog("db", "t", s1)
      .collect().map(r => (r.getString(2), r.getLong(0), r.getDouble(1)))
      .toSet
    assert(changes == Set(
      ("insert", 3L, 33.0), ("insert", 100L, 1.0),
      ("delete", 3L, 3.0), ("delete", 7L, 7.0), ("delete", 5L, 5.0)),
      s"got $changes")
    // replaying the changelog onto the from-state yields the to-state
    val fromState = cat.read("db", "t", Some(s1))
    val ins = changes.filter(_._1 == "insert").map(c => (c._2, c._3)).toSeq
    val delKeys = changes.filter(_._1 == "delete").map(_._2).toSeq
    val replayed = fromState
      .join(delKeys.toDF("id"), Seq("id"), "left_anti")
      .unionByName(ins.toDF("id", "v"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val toState = cat.read("db", "t")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(replayed == toState)
    // a row inserted AND deleted inside the window never appears:
    // add then delete key 200 in a second window
    val s2 = cat.describe("db", "t").currentSnapshotId.get
    cat.cdcUpsert("db", "t", rows = Seq((200L, 2.0)).toDF("id", "v"),
      deletes = Seq.empty[Long].toDF("id"), Seq("id"))
    cat.cdcUpsert("db", "t", rows = Seq.empty[(Long, Double)].toDF("id", "v"),
      deletes = Seq(200L).toDF("id"), Seq("id"))
    val w2 = cat.readChangelog("db", "t", s2)
      .collect().map(r => (r.getString(2), r.getLong(0))).toSet
    assert(!w2.contains(("insert", 200L)),
      s"transient row leaked into the net changelog: $w2")
  }

  test("merge-on-read UPDATE: one atomic commit hides old versions and " +
      "appends new ones; data files untouched") {
    import spark.implicits._
    val cat = freshCatalog()
    cat.createTable("db", "t", schemaV1)
    cat.append("db", "t",
      (0L until 10L).map(i => (i, i.toDouble)).toDF("id", "v").coalesce(1))
    val before = cat.describe("db", "t").currentSnapshot.get
    val withId = cat.readFilesWithRowId(before, schemaV1, before.files)
      .filter(col("id").between(3L, 5L))
    val positions = withId.select(
      SnapshotCatalog.RowIdFileCol, SnapshotCatalog.RowIdPosCol)
    val updated = withId.select(col("id"), (col("v") * 10).as("v"))
    val (m1, hidden) =
      cat.addDeleteFileWithAppend("db", "t", positions, updated,
        Some(before.snapshotId))
    assert(hidden == 3L)
    val s1 = m1.currentSnapshot.get
    // ONE snapshot: old files all still present, new files appended
    assert(m1.snapshots.size == 2)
    assert(before.files.forall(s1.files.contains))
    assert(s1.files.size > before.files.size && s1.deleteFiles.size == 1)
    val rows = cat.read("db", "t").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows == (0L until 10L).map(i =>
      (i, if (i >= 3 && i <= 5) i * 10.0 else i.toDouble)), s"got $rows")
    // manifest arithmetic stays exact: 10 + 3 appended - 3 hidden
    assert(s1.statsRowCount.contains(10L))
  }

  test("merge-on-read + copy-on-write interplay: a rewrite folds its " +
      "targets' delete entries and carries the survivors'") {
    import spark.implicits._
    val cat = freshCatalog()
    cat.createTable("db", "t", schemaV1)
    for (lo <- Seq(0L, 10L))
      cat.append("db", "t",
        (lo until lo + 10L).map(i => (i, i.toDouble)).toDF("id", "v").coalesce(1))
    val snap0 = cat.describe("db", "t").currentSnapshot.get
    val fileOfLow = snap0.fileStats
      .find(_.min.get("id").exists(_.toDouble == 0.0)).get.path
    // delete one row in EACH file positionally
    val pos = cat.readFilesWithRowId(snap0, schemaV1, snap0.files)
      .filter(col("id").isin(2L, 12L))
      .select(SnapshotCatalog.RowIdFileCol, SnapshotCatalog.RowIdPosCol)
    cat.addDeleteFile("db", "t", pos, None)
    assert(cat.read("db", "t").count() == 18)
    // CoW-rewrite only the low file (delete id 5): its entry (id 2)
    // folds into the rewrite; the high file's entry (id 12) carries
    cat.rewriteFiles("db", "t", Seq(fileOfLow),
      d => d.filter(col("id") =!= 5L), None)
    val after = cat.describe("db", "t").currentSnapshot.get
    assert(after.deleteFiles.size == 1, "survivor's delete entry must carry")
    val ids = cat.read("db", "t").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == ((0L until 20L).filterNot(Set(2L, 5L, 12L))),
      s"got $ids")
    assert(after.statsRowCount.contains(17L))
    // maintenance never reaps a referenced delete file
    assert(cat.removeOrphanFiles("db", "t",
      Some(System.currentTimeMillis() + 1000)).isEmpty)
    assert(cat.read("db", "t").count() == 17)
    // expire old snapshots: current state (incl. its delete file) intact
    cat.expireSnapshots("db", "t", keepLast = 1)
    assert(cat.read("db", "t").count() == 17)
    assert(cat.describe("db", "t").currentSnapshot.get.deleteFiles.size == 1)
  }

  test("compactFileGroups: only DIRTY files rewrite — clean data files " +
      "stay byte-identical, delete side folds, cost ∝ dirty bytes") {
    val cat = freshCatalog()
    cat.createTable("db", "t", schemaV1)
    import spark.implicits._
    // 4 big files with disjoint key ranges + 2 tiny streaming shards
    for (k <- 0 until 4)
      cat.append("db", "t", (k * 1000L until k * 1000L + 500L)
        .map(i => (i, i.toDouble)).toDF("id", "v").coalesce(1))
    cat.append("db", "t", Seq((9000L, 1.0)).toDF("id", "v").coalesce(1))
    cat.append("db", "t", Seq((9001L, 2.0)).toDF("id", "v").coalesce(1))
    // one positional delete, touching exactly one big file's row
    val cur = cat.describe("db", "t").currentSnapshot.get
    val pos = cat.readFilesWithRowId(cur, schemaV1, cur.files)
      .filter(col("id") === 2001L)
      .select(SnapshotCatalog.RowIdFileCol, SnapshotCatalog.RowIdPosCol)
    cat.addDeleteFile("db", "t", pos, None)
    val before = cat.describe("db", "t").currentSnapshot.get
    def sz(f: String) = java.nio.file.Files.size(java.nio.file.Paths.get(f))
    val statsBy = before.fileStats.map(s => s.path -> s).toMap
    val (bigs, smalls) = before.files.partition(f => statsBy(f).rows > 1)
    assert(bigs.size == 4 && smalls.size == 2)
    // the dirty big file = the one whose key range covers 2001
    val dirtyBig = bigs.filter(f => statsBy(f).min("id").toDouble <= 2001 &&
      statsBy(f).max("id").toDouble >= 2001)
    assert(dirtyBig.size == 1)
    val cleanBigs = bigs.filterNot(dirtyBig.toSet)
    val hashesBefore = cleanBigs.map(f => f -> md5Of(f)).toMap
    val tableBytes = before.files.map(sz).sum
    val report = cat.compactFileGroups("db", "t",
      minFileBytes = bigs.map(sz).min, // big files are NOT small
      targetFileBytes = 512L << 20)
    // rewrite set = 2 small shards + the 1 delete-touched big file
    assert(report.compacted && report.rewrittenFiles == 3,
      s"unexpected report: $report")
    assert(report.posDeleteFilesFolded == 1)
    // maintenance cost ∝ dirty bytes: the 3 clean big files' bytes
    // never moved (the full-table rewrite would have paid tableBytes)
    assert(report.bytesRewritten < tableBytes / 2,
      s"rewrote ${report.bytesRewritten} of $tableBytes table bytes")
    val after = cat.describe("db", "t").currentSnapshot.get
    assert(after.deleteFiles.isEmpty && after.eqDeletes.isEmpty)
    cleanBigs.foreach { f =>
      assert(after.files.contains(f), s"clean file $f dropped")
      assert(md5Of(f) == hashesBefore(f), s"clean file $f was rewritten")
    }
    assert(!after.files.contains(dirtyBig.head))
    assert(cat.read("db", "t").count() == 2001) // 2000 + 2 - 1 deleted
    assert(after.statsRowCount.contains(2001L))
    // a second pass is a no-op: nothing dirty remains (the packed
    // output is a lone small file — nothing to pack it with)
    val again = cat.compactFileGroups("db", "t",
      minFileBytes = bigs.map(sz).min, targetFileBytes = 512L << 20)
    assert(!again.compacted && again.rewrittenFiles == 0)
  }

  test("equality-delete keys survive RENAME COLUMN (field-id discipline " +
      "on the delete side); DROP of a keyed column is refused") {
    val cat = freshCatalog()
    cat.createTable("db", "t", schemaV1)
    import spark.implicits._
    cat.append("db", "t",
      (0L until 10L).map(i => (i, i.toDouble)).toDF("id", "v"))
    // CDC batch keyed on `id`: update 3, delete 7
    cat.cdcUpsert("db", "t", rows = Seq((3L, 33.0)).toDF("id", "v"),
      deletes = Seq(7L).toDF("id"), Seq("id"))
    cat.renameColumn("db", "t", "id", "ident")
    // the ADVICE failure mode: reads after renaming an eq-delete key
    // column threw (schema("id") gone) — now the delete entries follow
    // the rename and the delete parquet resolves under physical names
    val out = cat.read("db", "t")
    assert(out.schema.fieldNames.toSeq == Seq("ident", "v"))
    assert(out.count() == 9)
    assert(out.filter(col("ident") === 7L).isEmpty)
    assert(out.filter(col("ident") === 3L).head().getDouble(1) == 33.0)
    // DROP of the (still-referenced) key column refuses loudly
    val e = intercept[IllegalArgumentException](
      cat.dropColumn("db", "t", "ident"))
    assert(e.getMessage.contains("equality delete"))
    // compact folds the delete side post-rename (it reads through the
    // same path the ADVICE showed breaking)...
    assert(cat.compactFileGroups("db", "t",
      minFileBytes = Long.MaxValue).compacted)
    assert(cat.read("db", "t").count() == 9)
    // ...and once no retained snapshot references the key, DROP works
    cat.expireSnapshots("db", "t", keepLast = 1)
    cat.dropColumn("db", "t", "ident")
    assert(cat.read("db", "t").schema.fieldNames.toSeq == Seq("v"))
  }

  test("changelog candidates are stat-pruned under equality deletes: a " +
      "narrow-key window reads O(touched) files, and pruned ≡ brute force") {
    val cat = freshCatalog()
    cat.createTable("db", "t", schemaV1)
    import spark.implicits._
    // 8 files with disjoint key ranges
    for (k <- 0 until 8)
      cat.append("db", "t", (k * 100L until k * 100L + 100L)
        .map(i => (i, i.toDouble)).toDF("id", "v").coalesce(1))
    val s1 = cat.describe("db", "t").currentSnapshotId.get
    // CDC window: delete keys 250..259 (one file's range), insert fresh
    cat.cdcUpsert("db", "t",
      rows = (9000L until 9005L).map(i => (i, 1.0)).toDF("id", "v"),
      deletes = (250L until 260L).toDF("id"), Seq("id"))
    val meta = cat.describe("db", "t")
    val from = meta.snapshots.find(_.snapshotId == s1).get
    val to = meta.currentSnapshot.get
    val cands = cat.changelogCandidates(from, to, schemaV1)
    // the old code read ALL 8 from-files on any eq-delete window; the
    // stat pruning keeps only the file whose range covers [250,260)
    assert(cands.size == 1, s"expected 1 candidate, got ${cands.size}")
    assert(from.files.size == 8)
    // pruned result ≡ brute force over ALL from-files
    val changes = cat.readChangelog("db", "t", s1)
      .collect().map(r => (r.getString(2), r.getLong(0))).toSet
    val was = cat.readFilesWithRowId(from, schemaV1, from.files)
    val still = cat.readFilesWithRowId(to, schemaV1, from.files)
      .select(col(SnapshotCatalog.RowIdFileCol).as("__f"),
        col(SnapshotCatalog.RowIdPosCol).as("__p"))
    val bruteDeleted = was.join(still,
        was(SnapshotCatalog.RowIdFileCol) === still("__f") &&
          was(SnapshotCatalog.RowIdPosCol) === still("__p"), "left_anti")
      .collect().map(r => ("delete", r.getLong(0))).toSet
    val bruteInserted = (9000L until 9005L).map(("insert", _)).toSet
    assert(changes == bruteDeleted ++ bruteInserted,
      s"pruned=$changes brute=${bruteDeleted ++ bruteInserted}")
  }

  test("readChangelog CROSSES a compaction: the window decomposes into " +
      "ordinal-ordered runs around the replace snapshot; ordinal replay " +
      "reconstructs the final state; a row-changing rewrite still refuses") {
    val cat = freshCatalog()
    import spark.implicits._
    cat.createTable("db", "t", schemaV1)
    for (b <- 0 until 3)
      cat.append("db", "t", (b * 10L until b * 10L + 10L)
        .map(i => (i, i.toDouble)).toDF("id", "v").coalesce(1))
    val s1 = cat.describe("db", "t").currentSnapshotId.get
    // run 0: update 3 -> 33, delete 7
    cat.cdcUpsert("db", "t", rows = Seq((3L, 33.0)).toDF("id", "v"),
      deletes = Seq(7L).toDF("id"), Seq("id"))
    // the replace: folds the delete side, rewrites identity
    val rep = cat.compactFileGroups("db", "t", minFileBytes = 1L << 20)
    assert(rep.compacted)
    // run 1: update 3 -> 66, insert 300
    cat.cdcUpsert("db", "t", rows = Seq((3L, 66.0), (300L, 1.0)).toDF("id", "v"),
      deletes = Seq.empty[Long].toDF("id"), Seq("id"))
    val rows = cat.readChangelog("db", "t", s1).collect()
    val ords = rows.map(_.getInt(3)).distinct.sorted
    assert(ords.toSeq == Seq(0, 1), s"expected 2 ordinal runs, got $ords")
    // run 0 carries the FIRST version transition, run 1 the second —
    // the ordering the ordinal exists to preserve
    def ofOrd(o: Int) = rows.filter(_.getInt(3) == o)
      .map(r => (r.getString(2), r.getLong(0), r.getDouble(1))).toSet
    assert(ofOrd(0) == Set(("delete", 3L, 3.0), ("delete", 7L, 7.0),
      ("insert", 3L, 33.0)), s"run0=${ofOrd(0)}")
    assert(ofOrd(1) == Set(("delete", 3L, 33.0), ("insert", 3L, 66.0),
      ("insert", 300L, 1.0)), s"run1=${ofOrd(1)}")
    // ordinal replay over the from-state == the current state
    var state = cat.read("db", "t", Some(s1)).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ords.foreach { o =>
      val dels = rows.filter(r => r.getInt(3) == o &&
        r.getString(2) == "delete").map(_.getLong(0)).toSet
      val ins = rows.filter(r => r.getInt(3) == o &&
        r.getString(2) == "insert")
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      state = (state -- dels) ++ ins
    }
    val current = cat.read("db", "t").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(state == current)
    // a genuinely row-changing rewrite still refuses
    val s2 = cat.describe("db", "t").currentSnapshotId.get
    cat.overwrite("db", "t", Seq((1L, -1.0)).toDF("id", "v"))
    intercept[IllegalStateException] {
      cat.readChangelog("db", "t", s2).count()
    }
  }

  test("multi-column equality deletes: bounds-intersect candidates, " +
      "compaction folds them, manifest bounds make misses zero-IO") {
    import spark.implicits._
    val cat = freshCatalog()
    val schema3 = StructType(Seq(StructField("id", LongType),
      StructField("grp", StringType), StructField("v", DoubleType)))
    cat.createTable("db", "t", schema3)
    // 4 files, disjoint id ranges, two group values
    for (k <- 0 until 4)
      cat.append("db", "t", (k * 100L until k * 100L + 100L)
        .map(i => (i, if (k < 2) "a" else "b", i.toDouble))
        .toDF("id", "grp", "v").coalesce(1))
    val s1 = cat.describe("db", "t").currentSnapshotId.get
    // composite-key delete: (id, grp) pairs inside file 1's range only
    cat.addEqualityDeleteFile("db", "t",
      Seq((150L, "a"), (160L, "a")).toDF("id", "grp"), Seq("id", "grp"))
    val meta = cat.describe("db", "t")
    val d = meta.currentSnapshot.get.eqDeletes.head
    // bounds stamped into the manifest at commit
    assert(d.keyMin.exists(_.get("id").exists(_.toDouble == 150.0)), d)
    assert(d.keyMax.exists(_.get("grp").contains("a")), d)
    // candidate pruning: only the file covering ids [100,200) × grp a
    val from = meta.snapshots.find(_.snapshotId == s1).get
    val cands = cat.changelogCandidates(from, meta.currentSnapshot.get,
      schema3)
    assert(cands.size == 1, s"expected 1 candidate, got $cands")
    // rows actually vanish (both columns must match)
    assert(cat.read("db", "t").count() == 398)
    assert(cat.read("db", "t").filter(col("id") === 150L).isEmpty)
    // per-group compaction folds it touching only that file
    val pre = meta.currentSnapshot.get.files
    val report = cat.compactFileGroups("db", "t", minFileBytes = 1L)
    assert(report.compacted && report.rewrittenFiles == 1 &&
      report.eqDeleteFilesFolded == 1, report)
    val after = cat.describe("db", "t").currentSnapshot.get
    assert(after.eqDeletes.isEmpty)
    assert(pre.count(after.files.contains) == 3)
    assert(cat.read("db", "t").count() == 398)
  }

  test("composite-key exact refinement: tuple-level candidates beat " +
      "the per-column smear; random composite deletes stay exact " +
      "(property)") {
    import spark.implicits._
    val cat = freshCatalog()
    val schema3 = StructType(Seq(StructField("grp", StringType),
      StructField("id", LongType), StructField("v", DoubleType)))
    cat.createTable("db", "t", schema3)
    // 8 files: disjoint id ranges [k*100,(k+1)*100), grp alternating
    val rows = for (k <- 0 until 8; i <- 0 until 100) yield
      ((if (k % 2 == 0) "a" else "b"), k * 100L + i, (k * 100 + i).toDouble)
    for (k <- 0 until 8)
      cat.append("db", "t", rows.slice(k * 100, k * 100 + 100)
        .toDF("grp", "id", "v").coalesce(1))
    assert(cat.describe("db", "t").currentSnapshot.get.files.size == 8)
    // the SMEAR case: tuples at opposite corners of the key space —
    // per-column bounds (grp∈[a,b], id∈[50,750]) coarsely match ALL
    // files; tuple-exact refinement keeps only the two real homes
    cat.addEqualityDeleteFile("db", "t",
      Seq(("a", 50L), ("b", 750L)).toDF("grp", "id"), Seq("grp", "id"))
    val cur = cat.describe("db", "t").currentSnapshot.get
    val dirty = cat.deleteTouchedFiles(cur, schema3, cur.files)
    assert(dirty.size == 2,
      s"per-column smear not refined to tuple grain: ${dirty.size} dirty")
    assert(cat.read("db", "t").count() == 798)
    assert(cat.read("db", "t").filter(col("id") === 50L).isEmpty)
    assert(cat.read("db", "t").filter(col("id") === 150L).count() == 1)

    // property: random composite deletes (hits and misses mixed) —
    // the pruned read stays EXACTLY the set-minus semantics
    val rnd = new scala.util.Random(7)
    val allKeys = rows.map { case (g, i, _) => (g, i) }
    var expected = allKeys.toSet - (("a", 50L)) - (("b", 750L))
    for (_ <- 0 until 3) {
      val dels = Seq.fill(5)(
        if (rnd.nextBoolean()) allKeys(rnd.nextInt(allKeys.size))
        else ((if (rnd.nextBoolean()) "a" else "b"),
          rnd.between(0L, 1000L)))
      cat.addEqualityDeleteFile("db", "t",
        dels.toDF("grp", "id"), Seq("grp", "id"))
      expected = expected -- dels
      val got = cat.read("db", "t").select("grp", "id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == expected, "pruned read diverged from set semantics")
      val snap = cat.describe("db", "t").currentSnapshot.get
      assert(cat.deleteTouchedFiles(snap, schema3, snap.files).size <
        snap.files.size, "narrow composite window must prune")
    }
  }

  test("compactFileGroups on a partitioned table: rewritten files stay " +
      "value-pure with fresh pvals — partition pruning never erodes") {
    import graft.catalog.PartitionSpec
    val cat = freshCatalog()
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", LongType)))
    cat.createTable("db", "bk", schema,
      Map(PartitionSpec.PropertyKey -> "bucket(4, k)"))
    // several small partitioned appends (the streaming-commit shape)
    for (b <- 0 until 3)
      cat.append("db", "bk",
        (b * 100L until b * 100L + 100L).map(i => (i, i * 10)).toDF("k", "v"))
    // a positional delete so the pass has a delete side to fold
    val cur = cat.describe("db", "bk").currentSnapshot.get
    val pos = cat.readFilesWithRowId(cur, schema, cur.files)
      .filter(col("k") === 42L)
      .select(SnapshotCatalog.RowIdFileCol, SnapshotCatalog.RowIdPosCol)
    cat.addDeleteFile("db", "bk", pos, None)
    val report = cat.compactFileGroups("db", "bk")
    assert(report.compacted && report.posDeleteFilesFolded == 1, report)
    val after = cat.describe("db", "bk").currentSnapshot.get
    assert(after.deleteFiles.isEmpty)
    // every rewritten file is value-pure under the SAME spec era
    val newStats = after.fileStats
    assert(newStats.nonEmpty && newStats.forall(s =>
      s.pval.isDefined && s.pspec.contains("bucket(4, k)")),
      s"pvals lost in maintenance: $newStats")
    // bucket pruning still metadata-exact post-maintenance
    val spec = cat.partitionSpecOf("db", "bk").get
    val pv = cat.pvalOfLiteral(spec, "43", LongType)
    val kept = cat.prunedFilesPval(after, pv, "bucket(4, k)")
    assert(kept.size < after.files.size,
      "bucket pruning eroded after compaction")
    assert(cat.readEquals("db", "bk", "k", "43").count() == 1)
    assert(cat.read("db", "bk").count() == 299) // 300 - the deleted 42
  }

  test("eq-delete candidates: bloom veto skips range-straddling files " +
      "that provably lack the key") {
    import spark.implicits._
    val cat = freshCatalog()
    cat.createTable("db", "t", schemaV1)
    cat.updateProperties("db", "t",
      Map(SnapshotCatalog.BloomColumnsProp -> "id"))
    // three files with OVERLAPPING id ranges — range stats alone can't
    // tell which holds a given key
    cat.append("db", "t", Seq(0L, 10L, 20L, 100L).map(i => (i, 1.0))
      .toDF("id", "v").coalesce(1))
    cat.append("db", "t", Seq(5L, 15L, 55L, 95L).map(i => (i, 2.0))
      .toDF("id", "v").coalesce(1))
    cat.append("db", "t", Seq(1L, 33L, 66L, 99L).map(i => (i, 3.0))
      .toDF("id", "v").coalesce(1))
    val s1 = cat.describe("db", "t").currentSnapshotId.get
    // delete key 55: inside every file's [min,max], present in one
    cat.addEqualityDeleteFile("db", "t", Seq(55L).toDF("id"), Seq("id"))
    val meta = cat.describe("db", "t")
    val from = meta.snapshots.find(_.snapshotId == s1).get
    val cands = cat.changelogCandidates(from, meta.currentSnapshot.get,
      schemaV1)
    assert(cands.size == 1, s"bloom veto failed: $cands")
    // and the candidate is the file that actually holds 55
    val st = meta.currentSnapshot.get.fileStats
      .find(_.path == cands.head).get
    assert(st.min("v").toDouble == 2.0 && st.max("v").toDouble == 2.0)
    // correctness unchanged: 55 is gone, everything else stays
    assert(cat.read("db", "t").count() == 11)
    assert(cat.read("db", "t").filter(col("id") === 55L).isEmpty)
  }

  test("compactFileGroups clusterBy: the rewritten group comes out " +
      "range-clustered while clean files stay byte-identical") {
    val cat = freshCatalog()
    cat.createTable("db", "t", schemaV1)
    import spark.implicits._
    for (k <- 0 until 2)
      cat.append("db", "t", (k * 500L until k * 500L + 500L)
        .map(i => (i, i.toDouble)).toDF("id", "v").coalesce(1))
    // 4 tiny shards with INTERLEAVED ids — the layout-entropy shape a
    // streaming sink accumulates
    for (k <- 0 until 4)
      cat.append("db", "t",
        Seq(1000L + k, 1010L + k, 1020L + k).map(i => (i, 1.0))
          .toDF("id", "v").coalesce(1))
    val before = cat.describe("db", "t").currentSnapshot.get
    def sz(f: String) = java.nio.file.Files.size(java.nio.file.Paths.get(f))
    val statsBy = before.fileStats.map(s => s.path -> s).toMap
    val (bigs, smalls) = before.files.partition(f => statsBy(f).rows > 3)
    assert(bigs.size == 2 && smalls.size == 4)
    val hashes = bigs.map(f => f -> md5Of(f)).toMap
    val report = cat.compactFileGroups("db", "t",
      minFileBytes = bigs.map(sz).min,
      targetFileBytes = smalls.map(sz).sum / 2, clusterBy = Seq("id"))
    assert(report.compacted && report.rewrittenFiles == 4, report)
    val after = cat.describe("db", "t").currentSnapshot.get
    bigs.foreach(f => assert(after.files.contains(f) &&
      md5Of(f) == hashes(f), s"clean file $f was touched"))
    // the packed output is range-clustered: new files' id ranges are
    // pairwise disjoint, so manifest pruning stays sharp
    val newStats = after.fileStats.filterNot(s => before.files.contains(s.path))
    val ranges = newStats.map(s =>
      (s.min("id").toDouble, s.max("id").toDouble)).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) => assert(hi1 < lo2,
        s"overlapping clustered ranges: $ranges")
      case _ => ()
    }
    assert(cat.read("db", "t").count() == 1012)
  }

  test("merge-on-read read path pins the delete-side broadcast; an " +
      "oversized delete side still reads correctly") {
    val cat = freshCatalog()
    cat.createTable("db", "t", schemaV1)
    import spark.implicits._
    cat.append("db", "t",
      (0L until 100L).map(i => (i, i.toDouble)).toDF("id", "v").coalesce(2))
    val cur = cat.describe("db", "t").currentSnapshot.get
    val pos = cat.readFilesWithRowId(cur, schemaV1, cur.files)
      .filter(col("id") < 3L)
      .select(SnapshotCatalog.RowIdFileCol, SnapshotCatalog.RowIdPosCol)
    cat.addDeleteFile("db", "t", pos, None)
    cat.cdcUpsert("db", "t", rows = Seq((200L, 2.0)).toDF("id", "v"),
      deletes = Seq(50L).toDF("id"), Seq("id"))
    // under the default cap the anti-joins are EXPLICITLY broadcast —
    // no AQE judgment call, no shuffle of the data side
    val plan = cat.read("db", "t").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti-joins, got:\n$plan")
    val expect = cat.read("db", "t")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    // cap 0 = every delete side "oversized": the hint is withheld (the
    // loud-degrade path) but results are identical
    spark.conf.set(SnapshotCatalog.MorBroadcastMaxRowsConf, "0")
    try {
      val got = cat.read("db", "t")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(got == expect)
    } finally spark.conf.unset(SnapshotCatalog.MorBroadcastMaxRowsConf)
  }

  test("compactFileGroups write-outside/commit-inside: CDC commits " +
      "land DURING the rewrite; both sides commit, reads stay correct") {
    import spark.implicits._
    val cat = freshCatalog()
    cat.createTable("db", "t", schemaV1)
    // real rewrite work: 20 small files + delete debt
    for (k <- 0 until 20)
      cat.append("db", "t", (k * 1000L until k * 1000L + 1000L)
        .map(i => (i, i.toDouble)).toDF("id", "v").coalesce(1))
    cat.cdcUpsert("db", "t", rows = Seq((100000L, 1.0)).toDF("id", "v"),
      deletes = Seq(5L).toDF("id"), Seq("id"))
    @volatile var report: SnapshotCatalog.CompactReport = null
    @volatile var err: Throwable = null
    val th = new Thread(() => {
      try report = cat.compactFileGroups("db", "t", minFileBytes = 1L << 20)
      catch { case e: Throwable => err = e }
    })
    th.start()
    // a concurrent CDC stream while the compaction rewrites — before
    // round 14 these queued behind the whole-rewrite lock; now they
    // land mid-flight and the compaction re-plans (bounded, final
    // attempt serialized)
    var k = 0L
    while (th.isAlive && k < 50) {
      cat.cdcUpsert("db", "t",
        rows = Seq((200000L + k, k.toDouble)).toDF("id", "v"),
        deletes = Seq.empty[Long].toDF("id"), Seq("id"))
      k += 1
    }
    th.join(120000)
    assert(err == null, s"compaction failed: $err")
    assert(report != null && report.compacted, report)
    val got = cat.read("db", "t")
    assert(got.filter(col("id") >= 200000L).count() == k,
      "a concurrent CDC commit was lost")
    assert(got.filter(col("id") === 5L).isEmpty)
    assert(got.count() == 20000L + k)
    // no torn state: every referenced file exists
    val cur = cat.describe("db", "t").currentSnapshot.get
    assert(cur.files.forall(f => new java.io.File(f).exists))
  }

  test("dirty-set memo is rollback-safe: a rolled-back-to file is " +
      "decided freshly — deleted rows never resurface") {
    import spark.implicits._
    val wh = tmpDir("graft-rbmemo")
    val cat = new SnapshotCatalog(spark, wh)
    cat.createTable("db", "t", schemaV1)
    cat.append("db", "t",
      (0L until 100L).map(i => (i, i.toDouble)).toDF("id", "v").coalesce(1))
    cat.append("db", "t",
      (100L until 200L).map(i => (i, i.toDouble)).toDF("id", "v").coalesce(1))
    cat.addEqualityDeleteFile("db", "t", Seq(5L).toDF("id"), Seq("id"))
    val s2 = cat.describe("db", "t").currentSnapshotId.get
    // rewrite the file holding id=5 (folds the delete into its rows);
    // the eq-delete entry is CARRIED unchanged into the new snapshot
    val snap2 = cat.describe("db", "t").currentSnapshot.get
    val lowFile = snap2.files.find(f => snap2.fileStats
      .find(_.path == f).exists(_.min("id").toDouble <= 5)).get
    cat.rewriteFiles("db", "t", Seq(lowFile), d => d, None)
    // a FRESH catalog instance (cold caches) whose first read is
    // post-rewrite: the memo for this delete side decides only the
    // post-rewrite files…
    val cat2 = new SnapshotCatalog(spark, wh)
    assert(cat2.read("db", "t").count() == 199)
    // …then a rollback resurfaces the PRE-rewrite file — it must be
    // decided freshly (dirty), not served from the memo as clean
    cat2.rollback("db", "t", s2)
    assert(cat2.read("db", "t").count() == 199,
      "deleted rows resurfaced after rollback — stale dirty-set memo")
    assert(cat2.read("db", "t").filter(col("id") === 5L).isEmpty)
  }

  test("in-process commits are write-parallel: concurrent appends and " +
      "CDC batches all land, none lost") {
    import spark.implicits._
    val cat = freshCatalog()
    cat.createTable("db", "t", schemaV1)
    cat.append("db", "t", Seq((0L, 0.0)).toDF("id", "v")) // seed
    @volatile var err: Throwable = null
    val threads = (1 to 6).map { i =>
      new Thread(() => try {
        if (i % 2 == 0)
          cat.append("db", "t",
            Seq((i * 100L, i.toDouble)).toDF("id", "v")): Unit
        else
          cat.cdcUpsert("db", "t",
            rows = Seq((i * 100L + 1, i.toDouble)).toDF("id", "v"),
            deletes = Seq.empty[Long].toDF("id"), Seq("id")): Unit
      } catch { case e: Throwable => err = e })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(err == null, s"concurrent commit failed: $err")
    assert(cat.read("db", "t").count() == 7)
    assert(cat.describe("db", "t").snapshots.size == 7,
      "every concurrent commit must produce its own snapshot")
  }

  test("age-based snapshot expiry: older_than expires only old " +
      "snapshots, keep_last floors, refs stay pinned") {
    val cat = freshCatalog()
    cat.createTable("db", "t", schemaV1)
    import spark.implicits._
    // four snapshots with distinct wall-clock ages
    for (i <- 0 until 4) {
      cat.append("db", "t", Seq((i.toLong, i.toDouble)).toDF("id", "v"))
      Thread.sleep(5)
    }
    val metaAll = cat.describe("db", "t")
    assert(metaAll.snapshots.size == 4)
    val ids = metaAll.snapshots.sortBy(_.snapshotId).map(_.snapshotId)
    cat.createTag("db", "t", "pin", Some(ids.head)) // pin the OLDEST
    val cutMs = metaAll.snapshots
      .find(_.snapshotId == ids(2)).get.createdAtMs
    // only snapshots strictly older than the cut are eligible: ids(1)
    // expires; ids(0) is equally old but TAG-pinned; ids(2)/ids(3) are
    // age-protected
    cat.expireSnapshots("db", "t", keepLast = 1, olderThanMs = Some(cutMs))
    assert(cat.describe("db", "t").snapshots.map(_.snapshotId).toSet ==
      Set(ids(0), ids(2), ids(3)))
    // older_than = 0 age-protects everything — a no-op regardless of
    // keep_last
    cat.expireSnapshots("db", "t", keepLast = 1, olderThanMs = Some(0L))
    assert(cat.describe("db", "t").snapshots.size == 3)
    // all old (far-future cut): keep_last floors what survives, the
    // pin still holds
    cat.expireSnapshots("db", "t", keepLast = 1,
      olderThanMs = Some(Long.MaxValue))
    assert(cat.describe("db", "t").snapshots.map(_.snapshotId).toSet ==
      Set(ids(0), ids(3)))
    // current state unaffected throughout (appends are cumulative)
    assert(cat.read("db", "t").count() == 4)
    // the pinned snapshot still time-travels
    assert(cat.read("db", "t", Some(ids(0))).count() == 1)
  }

  test("merge-on-read clean/dirty split: files no delete entry touches " +
      "scan vectorized, without row-identity or anti-join stages") {
    val cat = freshCatalog()
    cat.createTable("db", "t", schemaV1)
    import spark.implicits._
    // three key-clustered files: ids [0,100), [100,200), [200,300)
    cat.append("db", "t",
      (0L until 300L).map(i => (i, i.toDouble)).toDF("id", "v")
        .repartitionByRange(3, col("id")).sortWithinPartitions("id"))
    val snap0 = cat.describe("db", "t").currentSnapshot.get
    assert(snap0.files.size == 3)
    // a NEEDLE positional delete in exactly one file
    val pos = cat.readFilesWithRowId(snap0, schemaV1, snap0.files)
      .filter(col("id") === 42L)
      .select(SnapshotCatalog.RowIdFileCol, SnapshotCatalog.RowIdPosCol)
    cat.addDeleteFile("db", "t", pos, None)
    val cur = cat.describe("db", "t").currentSnapshot.get
    val dirty = cat.deleteTouchedFiles(cur, schemaV1, cur.files)
    assert(dirty.size == 1, s"expected 1 dirty file, got $dirty")
    val ds = cur.fileStats.find(_.path == dirty.head).get
    assert(ds.min("id").toDouble <= 42 && ds.max("id").toDouble >= 42)
    val df = cat.read("db", "t")
    val plan = df.queryExecution.executedPlan.toString
    // a NEEDLE positional delete applies as an inline literal filter:
    // NO anti-join, NO broadcast exchange, NO delete-file scan — just
    // the clean vectorized scan unioned with one filtered dirty scan
    assert(!plan.contains("LeftAnti"),
      s"needle delete must inline as a filter, got:\n$plan")
    assert(plan.sliding("Scan parquet".length)
      .count(_ == "Scan parquet") == 2, s"expected 2 scans, got:\n$plan")
    // the clean files' scan (2 paths) carries NO row-identity columns
    val cleanScan = plan.linesIterator.find(l =>
      l.contains("FileScan parquet") && l.contains("(2 paths)"))
    assert(cleanScan.exists(l =>
      !l.contains("row_index") && !l.contains("_metadata")),
      s"row identity leaked into the clean scan:\n$plan")
    // semantics unchanged: 299 rows, the needle gone
    assert(df.count() == 299 && df.filter(col("id") === 42L).count() == 0)

    // an EQUALITY delete over keys in the third file dirties it too —
    // candidates stay stat-pruned, the first file remains clean
    cat.addEqualityDeleteFile("db", "t",
      (250L until 260L).toDF("id"), Seq("id"))
    val cur2 = cat.describe("db", "t").currentSnapshot.get
    val dirty2 = cat.deleteTouchedFiles(cur2, schemaV1, cur2.files)
    assert(dirty2.size == 2, s"expected 2 dirty files, got $dirty2")
    val clean2 = cur2.files.filterNot(dirty2.toSet)
    assert(clean2.size == 1)
    val cs = cur2.fileStats.find(_.path == clean2.head).get
    // the untouched middle file [100,200)
    assert(cs.min("id").toDouble >= 100 && cs.max("id").toDouble < 200)
    assert(cat.read("db", "t").count() == 289)
  }

  test("publish is FAST-FORWARD only: a concurrent main-line commit " +
      "after the branch fork refuses the pointer move instead of " +
      "silently discarding it") {
    val cat = freshCatalog()
    import spark.implicits._
    cat.createTable("db", "t", schemaV1)
    cat.append("db", "t", Seq((1L, 1.0)).toDF("id", "v"))
    cat.createBranch("db", "t", "audit")
    cat.appendToBranch("db", "t", "audit", Seq((2L, 2.0)).toDF("id", "v"))
    // the clean fast-forward: current is the fork parent = an ancestor
    cat.publish("db", "t", "audit")
    assert(cat.read("db", "t").count() == 2)
    // stage again, but let a MAIN commit land after the fork
    cat.createBranch("db", "t", "audit2")
    cat.appendToBranch("db", "t", "audit2", Seq((3L, 3.0)).toDF("id", "v"))
    cat.append("db", "t", Seq((100L, 100.0)).toDF("id", "v")) // concurrent
    val before = cat.read("db", "t").count()
    intercept[java.util.ConcurrentModificationException] {
      cat.publish("db", "t", "audit2")
    }
    // nothing moved, nothing lost
    assert(cat.read("db", "t").count() == before)
    assert(cat.read("db", "t").filter(col("id") === 100L).count() == 1)
    // re-staging against the new current state publishes cleanly
    cat.dropRef("db", "t", "audit2")
    cat.createBranch("db", "t", "audit2")
    cat.appendToBranch("db", "t", "audit2", Seq((3L, 3.0)).toDF("id", "v"))
    cat.publish("db", "t", "audit2")
    assert(cat.read("db", "t").count() == before + 1)
  }

  test("expiry re-parents survivors over expired gaps: a staged branch " +
      "stays publishable after its intermediates expire; a stitched " +
      "replace edge is never skipped as changeless") {
    val cat = freshCatalog()
    import spark.implicits._
    cat.createTable("db", "t", schemaV1)
    cat.append("db", "t", Seq((1L, 1.0)).toDF("id", "v"))
    // stage a 4-commit chain on the branch, then expire aggressively:
    // keepLast=1 retains {head, current(pinned)}; the intermediates go
    cat.createBranch("db", "t", "audit")
    for (i <- 2 to 5)
      cat.appendToBranch("db", "t", "audit",
        Seq((i.toLong, i.toDouble)).toDF("id", "v"))
    cat.expireSnapshots("db", "t", keepLast = 1)
    val meta = cat.describe("db", "t")
    assert(meta.snapshots.size == 2, meta.snapshots.map(_.snapshotId))
    // the surviving branch head was re-parented onto the retained
    // ancestor and marked stitched
    val head = meta.snapshots.maxBy(_.snapshotId)
    assert(head.parentId == meta.currentSnapshotId)
    assert(head.stitched.contains(true))
    // publish still fast-forwards: current IS an ancestor via the heal
    cat.publish("db", "t", "audit")
    assert(cat.read("db", "t").count() == 5)

    // stitched REPLACE edge: cdc (expired) then compaction (retained)
    // — skipping it would lose the expired window's changes
    val cat2 = freshCatalog()
    cat2.createTable("db", "u", schemaV1)
    for (b <- 0 until 3)
      cat2.append("db", "u", (b * 10L until b * 10L + 10L)
        .map(i => (i, i.toDouble)).toDF("id", "v").coalesce(1))
    val f = graft.streaming.Sinks.changelogFollower(
      cat2, "db", "u", "db", "d", Seq("id"))
    assert(f.poll())
    cat2.cdcUpsert("db", "u", rows = Seq((100L, 1.0)).toDF("id", "v"),
      deletes = Seq(5L).toDF("id"), Seq("id"))
    cat2.compactFileGroups("db", "u", minFileBytes = 1L << 20)
    // the follower's pin holds its position; the cdc snapshot between
    // position and the replace head expires
    cat2.expireSnapshots("db", "u", keepLast = 1)
    val upMeta = cat2.describe("db", "u")
    assert(upMeta.currentSnapshot.get.stitched.contains(true),
      "the surviving replace head must be marked stitched")
    assert(f.poll())
    // it must RESYNC (the stitched edge hides row changes), never
    // skip-as-replace — and converge
    assert(f.resyncCount == 1,
      s"stitched replace must resync, got ${f.resyncCount}")
    val u = cat2.read("db", "u").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    val d = cat2.read("db", "d").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(u == d)
  }

  test("cdcUpsert honors the hidden partition spec: CDC-committed files " +
      "are value-pure with recorded pval/pspec, so pruning never erodes") {
    import graft.catalog.PartitionSpec
    val cat = freshCatalog()
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", LongType)))
    cat.createTable("db", "pc", schema,
      Map(PartitionSpec.PropertyKey -> "bucket(4, k)"))
    cat.append("db", "pc",
      (0L until 100L).map(i => (i, i)).toDF("k", "v").coalesce(1))
    // two CDC windows — updates + inserts across buckets
    cat.cdcUpsert("db", "pc",
      rows = (0L until 20L).map(i => (i, i * 10)).toDF("k", "v"),
      deletes = Seq(50L).toDF("k"), Seq("k"))
    cat.cdcUpsert("db", "pc",
      rows = (200L until 220L).map(i => (i, i)).toDF("k", "v"),
      deletes = Seq.empty[Long].toDF("k"), Seq("k"))
    val snap = cat.describe("db", "pc").currentSnapshot.get
    // every CDC-committed data file is value-pure under the spec
    assert(snap.fileStats.forall(s =>
      s.pval.isDefined && s.pspec.contains("bucket(4, k)")),
      s"CDC files missing pval/pspec: ${snap.fileStats.filter(_.pval.isEmpty).map(_.path)}")
    // and equality pruning keeps working across accumulated windows
    val kept = cat.prunedFilesPvalEras(snap, "k", "7", LongType)
    assert(kept.size < snap.files.size, "pval pruning eroded under CDC")
    assert(cat.readEquals("db", "pc", "k", "7").count() == 1)
    assert(cat.readEquals("db", "pc", "k", "210").count() == 1)
    assert(cat.readEquals("db", "pc", "k", "50").count() == 0) // deleted
  }

  test("manifest split: slim metadata + immutable side manifests — " +
      "commits serialize O(new files); cold reads rehydrate; expiry " +
      "reclaims manifests; pre-split inline metadata still reads") {
    val wh = tmpDir("graft-mansplit")
    val cat = new SnapshotCatalog(spark, wh)
    cat.createTable("db", "t", schemaV1)
    import spark.implicits._
    // one WIDE snapshot (many files) + two small ones
    cat.append("db", "t",
      (0L until 400L).map(i => (i, i.toDouble)).toDF("id", "v")
        .repartition(40))
    cat.append("db", "t", Seq((1000L, 1.0)).toDF("id", "v"))
    cat.append("db", "t", Seq((1001L, 1.0)).toDF("id", "v"))
    val mdir = java.nio.file.Paths.get(wh, "db", "t", "metadata")
    def names() = {
      val s = java.nio.file.Files.list(mdir)
      try { import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString).toList }
      finally s.close()
    }
    assert(names().count(_.startsWith("manifest-")) == 3)
    // the slim metadata carries NO per-file payload: the latest
    // version file is small and does not scale with the wide
    // snapshot's 40 files — its manifest holds that
    val latest = names().filter(_.endsWith(".metadata.json")).max
    val slimBytes = java.nio.file.Files.size(mdir.resolve(latest))
    val raw = new String(java.nio.file.Files.readAllBytes(
      mdir.resolve(latest)), "UTF-8")
    assert(!raw.contains("\"min\""), "slim metadata leaked file stats")
    val wideManifest = names().filter(_.startsWith("manifest-2")).head
    assert(java.nio.file.Files.size(mdir.resolve(wideManifest)) > slimBytes,
      "the wide snapshot's manifest must dwarf the slim metadata")
    // cold process (fresh catalog instance = empty caches) reads whole
    val cold = new SnapshotCatalog(spark, wh)
    assert(cold.read("db", "t").count() == 402)
    assert(cold.describe("db", "t").currentSnapshot.get.fileStats.nonEmpty)
    // expiry reclaims dropped snapshots' manifests with their files
    cat.expireSnapshots("db", "t", keepLast = 1)
    assert(names().count(_.startsWith("manifest-")) == 1)
    assert(cat.read("db", "t").count() == 402)
    // PRE-SPLIT compatibility: a legacy metadata version with the
    // heavy payload INLINE (no manifestPath) must keep reading
    val hydrated = cat.describe("db", "t")
    val legacy = hydrated.copy(snapshots = hydrated.snapshots.map(
      _.copy(manifestPath = None)))
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.registerModule(
      com.fasterxml.jackson.module.scala.DefaultScalaModule)
    val curV = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(wh, "db", "t", "metadata",
        "version-hint.text")), "UTF-8").trim.toInt
    java.nio.file.Files.write(
      mdir.resolve(f"v${curV + 1}%05d.metadata.json"),
      m.writeValueAsBytes(legacy))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(wh, "db", "t", "metadata",
        "version-hint.text"),
      (curV + 1).toString.getBytes("UTF-8"))
    val legacyRead = new SnapshotCatalog(spark, wh)
    assert(legacyRead.read("db", "t").count() == 402)
    assert(legacyRead.describe("db", "t")
      .currentSnapshot.get.fileStats.nonEmpty)
    // and the next commit MIGRATES the inline payload out to manifests
    legacyRead.append("db", "t", Seq((2000L, 2.0)).toDF("id", "v"))
    val newest = names().filter(_.endsWith(".metadata.json")).max
    assert(!new String(java.nio.file.Files.readAllBytes(
      mdir.resolve(newest)), "UTF-8").contains("\"min\""))
    assert(legacyRead.read("db", "t").count() == 403)
  }

  test("removeOrphanFiles reaps abandoned write DIRECTORIES (a dir " +
      "holding only a stale _SUCCESS marker) and keeps live ones") {
    val wh = tmpDir("graft-cat")
    val cat = new SnapshotCatalog(spark, wh)
    cat.createTable("db", "t", schemaV1)
    import spark.implicits._
    cat.append("db", "t", Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"))
    val dataDir = java.nio.file.Paths.get(wh, "db", "t", "data")
    // an abandoned optimistic-concurrency attempt: the parquet parts
    // were discarded, the dir + _SUCCESS marker remained (the pre-fix
    // residue shape) — plus a nested empty subdir (partitioned-write
    // residue)
    val ghost = dataDir.resolve("rewrite-deadbeef")
    java.nio.file.Files.createDirectories(ghost.resolve("_graft_p=9"))
    java.nio.file.Files.write(ghost.resolve("_SUCCESS"), Array.empty[Byte])
    val liveDirs = java.nio.file.Files.list(dataDir)
      .filter(p => java.nio.file.Files.isDirectory(p) && p != ghost)
      .count()
    assert(liveDirs >= 1)
    // inside the safety window: untouched (could be an in-flight write)
    // — including the fresh EMPTY nested dir, which has no entry to
    // age-check and must gate on its own mtime (a writer's just-created
    // output dir looks exactly like this between mkdir and first file)
    cat.removeOrphanFiles("db", "t")
    assert(java.nio.file.Files.exists(ghost))
    assert(java.nio.file.Files.exists(ghost.resolve("_graft_p=9")),
      "a fresh empty dir must survive the default sweep")
    // past the window: the whole dir goes; live snapshot dirs stay
    cat.removeOrphanFiles("db", "t",
      Some(System.currentTimeMillis() + 1000))
    assert(!java.nio.file.Files.exists(ghost),
      "abandoned write dir must be reaped whole")
    assert(cat.read("db", "t").count() == 2)
    val liveAfter = java.nio.file.Files.list(dataDir)
      .filter(p => java.nio.file.Files.isDirectory(p)).count()
    assert(liveAfter == liveDirs,
      "live snapshot write dirs must survive the dir sweep")
  }

  test("a discarded rewrite attempt deletes its write dirs whole — no " +
      "directory/_SUCCESS residue accumulates under commit churn") {
    val wh = tmpDir("graft-cat")
    val cat = new SnapshotCatalog(spark, wh)
    cat.createTable("db", "t", schemaV1)
    import spark.implicits._
    cat.append("db", "t", (0L until 50L).map(i => (i, i.toDouble)).toDF("id", "v"))
    val files = cat.describe("db", "t").currentSnapshot.get.files
    // the transform runs in the UNLOCKED write phase — committing an
    // append from inside it deterministically moves the table between
    // plan and commit, forcing the validate-and-commit discard path
    val other = new SnapshotCatalog(spark, wh)
    intercept[java.util.ConcurrentModificationException] {
      cat.rewriteFiles("db", "t", files, { df =>
        other.append("db", "t", Seq((100L, 1.0)).toDF("id", "v"))
        df
      })
    }
    val dataDir = java.nio.file.Paths.get(wh, "db", "t", "data")
    val residue = {
      val s = java.nio.file.Files.list(dataDir)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.toList.filter(
          _.getFileName.toString.startsWith("rewrite-"))
      } finally s.close()
    }
    assert(residue.isEmpty,
      s"discarded rewrite left directories behind: $residue")
  }

  test("compactFileGroups terminates under continuous cross-process " +
      "commit churn (bounded locked retries, never spins or corrupts)") {
    val wh = tmpDir("graft-cat")
    val cat = new SnapshotCatalog(spark, wh)
    // a SECOND catalog instance over the same warehouse = a separate
    // lock monitor, i.e. a cross-process committer the in-process
    // synchronized block cannot exclude
    val other = new SnapshotCatalog(spark, wh)
    cat.createTable("db", "t", schemaV1)
    import spark.implicits._
    cat.append("db", "t", (0L until 20L).map(i => (i, i.toDouble)).toDF("id", "v"))
    val appended = new java.util.concurrent.atomic.AtomicInteger(0)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val churn = new Thread(() => {
      var i = 0
      while (!stop.get() && i < 60) {
        other.append("db", "t",
          Seq((1000L + i, i.toDouble)).toDF("id", "v").coalesce(1))
        appended.incrementAndGet()
        i += 1
      }
    })
    churn.start()
    var reports = 0
    var conflicts = 0
    try {
      // each pass must TERMINATE — with a report or a clean
      // ConcurrentModificationException, never an unbounded spin or
      // an unrelated error
      while (churn.isAlive && (reports + conflicts) < 30) {
        try { cat.compactFileGroups("db", "t", minFileBytes = 1L << 20); reports += 1 }
        catch { case _: java.util.ConcurrentModificationException => conflicts += 1 }
      }
    } finally { stop.set(true); churn.join(30000) }
    assert(reports + conflicts > 0)
    // consistency: every churn append that committed is readable
    val n = cat.read("db", "t").count()
    assert(n == 20L + appended.get(),
      s"expected ${20 + appended.get()} rows after churn, got $n")
  }

  test("delete-memo eviction is semantics-free: a delete side larger " +
      "than the memo cap still hides every deleted row") {
    import spark.implicits._
    val cat = freshCatalog()
    cat.createTable("db", "t", schemaV1)
    cat.append("db", "t",
      (0L until 40L).map(i => (i, i.toDouble)).toDF("id", "v").coalesce(1))
    // cap the per-delete-file memos far below the delete-file count:
    // with the pre-fix final-lookup-falls-to-empty behavior, evicted
    // files would be treated as naming NO rows and their deletes
    // silently resurrect
    spark.conf.set("spark.graft.catalog.deleteMemoCap", "3")
    try {
      for (i <- 0L until 10L) {
        val cur = cat.describe("db", "t").currentSnapshot.get
        val pos = cat.readFilesWithRowId(cur, schemaV1, cur.files)
          .filter(col("id") === i)
          .select(SnapshotCatalog.RowIdFileCol, SnapshotCatalog.RowIdPosCol)
        cat.addDeleteFile("db", "t", pos, None)
      }
      assert(cat.describe("db", "t").currentSnapshot.get.deleteFiles.size == 10)
      val got = cat.read("db", "t").collect().map(_.getLong(0)).toSet
      assert(got == (10L until 40L).toSet,
        s"rows resurrected under memo eviction: ${(got -- (10L until 40L)).toSeq.sorted}")
      // the changelog path consults the same memos
      val meta = cat.describe("db", "t")
      val first = meta.snapshots.head.snapshotId
      val last = meta.currentSnapshotId.get
      val ch = cat.readChangelog("db", "t", first, Some(last))
      assert(ch.filter(col("_change_type") === "delete").count() == 10)
    } finally spark.conf.unset("spark.graft.catalog.deleteMemoCap")
  }

  test("URI-hostile warehouse path (spaces): MoR deletes attribute " +
      "correctly — never silently dropped") {
    import spark.implicits._
    val wh = tmpDir("graft wh space") // a space in every file URI
    val cat = new SnapshotCatalog(spark, wh)
    cat.createTable("db", "t", schemaV1)
    cat.append("db", "t",
      (0L until 20L).map(i => (i, i.toDouble)).toDF("id", "v").coalesce(1))
    val cur = cat.describe("db", "t").currentSnapshot.get
    val pos = cat.readFilesWithRowId(cur, schemaV1, cur.files)
      .filter(col("id") < 5L)
      .select(SnapshotCatalog.RowIdFileCol, SnapshotCatalog.RowIdPosCol)
    cat.addDeleteFile("db", "t", pos, None)
    assert(cat.read("db", "t").count() == 15,
      "deletes dropped under a URI-hostile warehouse path")
    assert(cat.read("db", "t").filter(col("id") < 5L).isEmpty)
    // the changelog's row-identity anti-join speaks the same form
    val meta = cat.describe("db", "t")
    val ch = cat.readChangelog("db", "t",
      meta.snapshots.head.snapshotId, meta.currentSnapshotId)
    assert(ch.filter(col("_change_type") === "delete").count() == 5)
  }

  test("per-incarnation uuid: DROP + re-CREATE through a second " +
      "catalog instance is seen by the first — no stale cached parse") {
    import spark.implicits._
    val wh = tmpDir("graft-incarn")
    val catA = new SnapshotCatalog(spark, wh)
    catA.createTable("db", "t", schemaV1)
    catA.append("db", "t", Seq((1L, 1.0)).toDF("id", "v"))
    assert(catA.read("db", "t").count() == 1) // warm catA's caches
    val uuid1 = catA.incarnationUuid("db", "t")
    assert(uuid1.nonEmpty)
    // second instance = a different process's catalog: drop and
    // re-create with the SAME version numbers
    val catB = new SnapshotCatalog(spark, wh)
    catB.dropTable("db", "t")
    catB.createTable("db", "t", schemaV1)
    catB.append("db", "t", Seq((7L, 7.0), (8L, 8.0)).toDF("id", "v"))
    val uuid2 = catA.incarnationUuid("db", "t")
    assert(uuid2.nonEmpty && uuid2 != uuid1,
      "re-CREATE must mint a fresh incarnation uuid")
    assert(catA.describe("db", "t").tableUuid == uuid2)
    // the first instance's next read reflects the NEW incarnation
    assert(catA.read("db", "t").collect().map(_.getLong(0)).toSet ==
      Set(7L, 8L), "stale cached parse served across incarnations")
  }

  test("hydration reuse: a history deeper than the manifest cache " +
      "stays exact across commits") {
    import spark.implicits._
    val cat = freshCatalog()
    cat.createTable("db", "t", schemaV1)
    // more snapshots than hydratedByPath strictly needs, each tiny;
    // every loadMeta along the way must keep ALL history exact
    for (i <- 0L until 12L)
      cat.append("db", "t", Seq((i, i.toDouble)).toDF("id", "v"))
    val meta = cat.describe("db", "t")
    assert(meta.snapshots.size == 12)
    // every snapshot's hydrated payload is complete (files grow 1/commit)
    meta.snapshots.sortBy(_.snapshotId).zipWithIndex.foreach {
      case (s, i) => assert(s.files.size == i + 1,
        s"snapshot ${s.snapshotId} lost hydrated files")
    }
    assert(cat.read("db", "t").count() == 12)
    assert(cat.read("db", "t", Some(5L)).count() == 5)
  }

  test("safe type promotion: int->long / float->double / decimal widen " +
      "are metadata-only; mixed-era reads aggregate exactly") {
    import spark.implicits._
    val cat = freshCatalog()
    val narrow = StructType(Seq(
      StructField("id", IntegerType), StructField("x", FloatType),
      StructField("d", DecimalType(6, 2))))
    cat.createTable("db", "t", narrow)
    cat.append("db", "t", spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1, 1.5f, BigDecimal("12.34").bigDecimal),
        org.apache.spark.sql.Row(2, 2.5f, BigDecimal("56.78").bigDecimal)),
      narrow))
    val filesBefore = cat.describe("db", "t").currentSnapshot.get.files
    val hashes = filesBefore.map(f => f -> md5Of(f)).toMap
    cat.promoteColumnType("db", "t", "id", LongType)
    cat.promoteColumnType("db", "t", "x", DoubleType)
    cat.promoteColumnType("db", "t", "d", DecimalType(12, 2))
    // metadata-only: same files, byte-identical, no new snapshot data
    val after = cat.describe("db", "t")
    assert(after.currentSnapshot.get.files == filesBefore)
    filesBefore.foreach(f => assert(md5Of(f) == hashes(f),
      "promotion rewrote a data file — must be metadata-only"))
    val wide = StructType(Seq(
      StructField("id", LongType), StructField("x", DoubleType),
      StructField("d", DecimalType(12, 2))))
    assert(cat.schemaOf("db", "t") == wide)
    // wide-era rows append under the promoted schema
    cat.append("db", "t", spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(3000000000L, 3.25,
          BigDecimal("9999999999.99").bigDecimal)),
      wide))
    val got = cat.read("db", "t")
    assert(got.schema == wide)
    assert(got.count() == 3)
    // exact mixed-era aggregates: old int/float/decimal values widen
    val agg = got.agg(sum("id"), sum("x"), sum("d")).head()
    assert(agg.getLong(0) == 3000000003L)
    assert(agg.getDouble(1) == 1.5 + 2.5 + 3.25)
    assert(agg.getDecimal(2) == BigDecimal("10000000069.11").bigDecimal)
    // pruned point lookups still work across eras
    assert(cat.readEquals("db", "t", "id", "1").count() == 1)
    assert(cat.readEquals("db", "t", "id", "3000000000").count() == 1)
    assert(cat.readWhere("db", "t", "id", 0.0, 2.0).count() == 2)
  }

  test("type promotion: eq-delete keys written pre-promotion keep " +
      "hiding rows post-promotion") {
    import spark.implicits._
    val cat = freshCatalog()
    val narrow = StructType(Seq(
      StructField("id", IntegerType), StructField("v", DoubleType)))
    cat.createTable("db", "t", narrow)
    cat.append("db", "t", (0 until 20).map(i => (i, i.toDouble))
      .toDF("id", "v").select(col("id").cast("int"), col("v")).coalesce(1))
    // eq-delete keyed on the INT column, written pre-promotion
    cat.addEqualityDeleteFile("db", "t",
      Seq(3, 7).toDF("id").select(col("id").cast("int")), Seq("id"))
    assert(cat.read("db", "t").count() == 18)
    cat.promoteColumnType("db", "t", "id", LongType)
    // the old delete file (int keys) still resolves under the wide type
    assert(cat.read("db", "t").count() == 18)
    assert(cat.read("db", "t").filter(col("id").isin(3L, 7L)).isEmpty)
    // a post-promotion eq-delete with LONG keys composes with it
    cat.addEqualityDeleteFile("db", "t", Seq(11L).toDF("id"), Seq("id"))
    assert(cat.read("db", "t").count() == 17)
    assert(cat.read("db", "t").filter(col("id") === 11L).isEmpty)
    // compaction folds both delete eras away exactly
    cat.compactFileGroups("db", "t")
    assert(cat.read("db", "t").count() == 17)
    assert(cat.read("db", "t").filter(col("id").isin(3L, 7L, 11L)).isEmpty)
  }

  test("type promotion refusals: narrowing, string casts, and " +
      "bucket-partitioned sources are rejected loudly") {
    import spark.implicits._
    val cat = freshCatalog()
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("s", StringType)))
    cat.createTable("db", "t", schema)
    cat.append("db", "t", Seq((1, "a")).toDF("id", "s")
      .select(col("id").cast("int"), col("s")))
    intercept[IllegalArgumentException](
      cat.promoteColumnType("db", "t", "id", ShortType))
    intercept[IllegalArgumentException](
      cat.promoteColumnType("db", "t", "s", IntegerType))
    intercept[IllegalArgumentException](
      cat.promoteColumnType("db", "t", "id", DoubleType))
    intercept[IllegalArgumentException](
      cat.promoteColumnType("db", "t", "missing", LongType))
    // bucket pvals hash type-dependently: promotion under a live
    // bucket era must refuse, identity stays allowed
    val cat2 = freshCatalog()
    cat2.createTable("db", "b", schema,
      Map("partition.spec" -> "bucket(4, id)"))
    cat2.append("db", "b", Seq((1, "a"), (2, "b")).toDF("id", "s")
      .select(col("id").cast("int"), col("s")))
    val e = intercept[IllegalArgumentException](
      cat2.promoteColumnType("db", "b", "id", LongType))
    assert(e.getMessage.contains("type-dependent"))
    val cat3 = freshCatalog()
    cat3.createTable("db", "i", schema,
      Map("partition.spec" -> "identity(id)"))
    cat3.append("db", "i", Seq((1, "a"), (2, "b")).toDF("id", "s")
      .select(col("id").cast("int"), col("s")))
    cat3.promoteColumnType("db", "i", "id", LongType)
    assert(cat3.readEquals("db", "i", "id", "2").count() == 1)
    // the write-side BACKWARD gate still rejects implicit type changes
    val viol = SchemaCompat.evolve(
      StructType(Seq(StructField("id", LongType))),
      StructType(Seq(StructField("id", IntegerType))))
    assert(viol.isLeft, "implicit narrowing must stay rejected")
  }

  test("O(1) rename: manifests stay byte-identical; a column SWAP " +
      "chain resolves in order; compaction-carried stats never " +
      "double-apply the chain") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val wh = tmpDir("graft-nlink")
    val cat = new SnapshotCatalog(spark, wh)
    cat.createTable("db", "t", schemaV1) // (id, v)
    cat.append("db", "t",
      (0L until 10L).map(i => (i, i * 10.0)).toDF("id", "v").coalesce(1))
    val manifestsBefore = java.nio.file.Files.list(
        java.nio.file.Paths.get(wh, "db", "t", "metadata"))
      .iterator().asScala.map(_.toString)
      .filter(_.contains("manifest-")).toSet
    // SWAP the two columns via a temp name — three renames, zero IO
    cat.renameColumn("db", "t", "id", "tmp")
    cat.renameColumn("db", "t", "v", "id")
    cat.renameColumn("db", "t", "tmp", "v")
    val manifestsAfter = java.nio.file.Files.list(
        java.nio.file.Paths.get(wh, "db", "t", "metadata"))
      .iterator().asScala.map(_.toString)
      .filter(_.contains("manifest-")).toSet
    assert(manifestsAfter == manifestsBefore,
      "rename rewrote manifests — must be a slim metadata-only commit")
    assert(cat.schemaOf("db", "t").fieldNames.toSeq == Seq("v", "id"))
    // data follows the swap: new 'id' column holds the old v values
    val r = cat.read("db", "t").orderBy("v").collect()
    assert(r.map(_.getLong(0)).toSeq == (0L until 10L))
    assert(r.map(_.getDouble(1)).toSeq == (0 until 10).map(_ * 10.0))
    // stats swapped too: range pruning on the new names is exact
    assert(cat.readWhere("db", "t", "id", 45.0, 55.0).count() == 1)
    val st = cat.describe("db", "t").currentSnapshot.get.fileStats.head
    assert(st.min("id").toDouble == 0.0 && st.max("id").toDouble == 90.0)
    // compaction persists CURRENT-named stats with a name-era stamp:
    // a fresh instance reloading the raw manifests must not re-apply
    // the swap chain to them (double-swap)
    cat.append("db", "t",
      (10L until 20L).map(i => (i, i * 10.0)).toDF("v", "id").coalesce(1))
    cat.compactFileGroups("db", "t")
    val cold = new SnapshotCatalog(spark, wh) // cold caches: raw parse
    val st2 = cold.describe("db", "t").currentSnapshot.get.fileStats
    assert(st2.forall(s => s.max("id").toDouble <= 190.0 &&
      s.max("v").toDouble <= 19.0),
      s"chain double-applied on reload: $st2")
    assert(cold.read("db", "t").agg(sum("v")).head().getLong(0) ==
      (0 until 20).sum.toLong)
  }

  test("O(1) rename: a freed name re-ADDED as a new column never " +
      "inherits old entries; cross-instance loads see the chain") {
    import spark.implicits._
    val wh = tmpDir("graft-nlink2")
    val cat = new SnapshotCatalog(spark, wh)
    cat.createTable("db", "t", schemaV1) // (id, v)
    cat.append("db", "t", Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"))
    cat.renameColumn("db", "t", "v", "w")
    cat.addColumns("db", "t", Seq(StructField("v", DoubleType)))
    // new-era file writes BOTH columns; its 'v' entries are post-link
    cat.append("db", "t", Seq((3L, 30.0, 77.0)).toDF("id", "w", "v"))
    val got = new SnapshotCatalog(spark, wh).read("db", "t") // cold
    assert(got.filter(col("v").isNotNull).count() == 1,
      "old 'v' data resurfaced under the re-added name")
    assert(got.agg(sum("w")).head().getDouble(0) == 60.0)
    // stats: old files' entries moved to 'w'; the new file keeps both
    val sts = new SnapshotCatalog(spark, wh)
      .describe("db", "t").currentSnapshot.get.fileStats
    assert(sts.forall(s => s.min.contains("w")))
    val newEra = sts.filter(_.min.contains("v"))
    assert(newEra.size == 1 && newEra.head.min("v").toDouble == 77.0,
      s"re-added-name stats polluted by the old column: $sts")
  }

  test("cherrypick re-attaches a staged append onto a MOVED head " +
      "metadata-only, restamping sequence numbers so the head's older " +
      "equality deletes do not hide the re-committed rows") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cat = new SnapshotCatalog(spark, tmpDir("graft-cherry"))
    cat.createTable("db", "t", Seq.empty[(Long, Double)].toDF("id", "v").schema)
    cat.append("db", "t", (0L until 10L).map(i => (i, i.toDouble))
      .toDF("id", "v"))
    // stage a correction batch: id=7 re-landed with a fixed value
    cat.createBranch("db", "t", "stage")
    cat.appendToBranch("db", "t", "stage",
      Seq((7L, 777.0)).toDF("id", "v"))
    val stagedId = cat.describe("db", "t").refs("stage")
    val stagedFiles = cat.describe("db", "t").snapshots
      .find(_.snapshotId == stagedId).get.files.toSet
    // main MOVES: an equality delete lands on id=7 (merge-on-read)
    cat.cdcUpsert("db", "t",
      rows = Seq.empty[(Long, Double)].toDF("id", "v"),
      deletes = Seq(7L).toDF("id"), Seq("id"))
    assert(cat.read("db", "t").count() == 9)
    // cherry-pick the staged batch onto the moved head
    val meta = cat.cherrypick("db", "t", stagedId)
    val head = meta.currentSnapshot.get
    // metadata-only: the staged file is re-attached byte-identical
    val staged = head.files.toSet.intersect(stagedFiles)
    assert(staged.nonEmpty, "staged files must be re-attached, not copied")
    // the restamped sequence beats the eq delete: id=7 is VISIBLE with
    // the corrected value, exactly once
    val row7 = cat.read("db", "t").filter(col("id") === 7L).collect()
    assert(row7.length == 1 && row7.head.getDouble(1) == 777.0,
      s"cherry-picked row hidden or duplicated: ${row7.toSeq}")
    assert(cat.read("db", "t").count() == 10)
    // re-publishing the same snapshot is refused (files already live)
    val again = intercept[IllegalArgumentException](
      cat.cherrypick("db", "t", stagedId))
    assert(again.getMessage.contains("already published"))
    // a row-CHANGING snapshot cannot cherry-pick onto a moved head
    cat.createBranch("db", "t", "risky")
    val rmMeta = cat.cdcUpsert("db", "t",
      rows = Seq.empty[(Long, Double)].toDF("id", "v"),
      deletes = Seq(3L).toDF("id"), Seq("id"), toBranch = Some("risky"))
    val riskyId = rmMeta.refs("risky")
    cat.append("db", "t", Seq((50L, 50.0)).toDF("id", "v")) // head moves
    val bad = intercept[IllegalArgumentException](
      cat.cherrypick("db", "t", riskyId))
    assert(bad.getMessage.contains("only append"))
  }

  test("publish retry across a compaction is still refused: the " +
      "cherry-pick provenance marker outlives the rewritten files, so " +
      "a crash-retry can never double-apply a staged batch") {
    import spark.implicits._
    val cat = new SnapshotCatalog(spark, tmpDir("graft-cherry-compact"))
    cat.createTable("db", "t",
      Seq.empty[(Long, Double)].toDF("id", "v").schema)
    cat.append("db", "t", (0L until 10L).map(i => (i, i.toDouble))
      .toDF("id", "v"))
    cat.createBranch("db", "t", "stage")
    cat.appendToBranch("db", "t", "stage",
      Seq((100L, 100.0)).toDF("id", "v"))
    val stagedId = cat.describe("db", "t").refs("stage")
    cat.append("db", "t", Seq((50L, 50.0)).toDF("id", "v")) // head moves
    cat.cherrypick("db", "t", stagedId)
    assert(cat.read("db", "t").count() == 12)
    // a FULL rewrite replaces every live data file — a guard built on
    // path overlap alone would now wave a retry through
    cat.compactFileGroups("db", "t", fullRewrite = true)
    val headFiles = cat.describe("db", "t").currentSnapshot.get.files.toSet
    val stagedFiles = cat.describe("db", "t").snapshots
      .find(_.snapshotId == stagedId).get.files.toSet
    assert(stagedFiles.intersect(headFiles).isEmpty,
      "precondition: compaction must have rewritten the re-attached files")
    val again = intercept[IllegalArgumentException](
      cat.cherrypick("db", "t", stagedId))
    assert(again.getMessage.contains("already published"), again.getMessage)
    assert(cat.read("db", "t").count() == 12)
  }

  test("rewriteDeleteFiles: the delete side consolidates WITHOUT " +
      "touching data bytes — N positional files fold to one, equality " +
      "deletes convert to exact positions (seq gate honored), reads " +
      "identical, and the row count is metadata-only again") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cat = new SnapshotCatalog(spark, tmpDir("graft-delrw"))
    val schema = Seq.empty[(Long, Double)].toDF("id", "v").schema
    cat.createTable("db", "t", schema)
    for (lo <- Seq(0L, 10L, 20L))
      cat.append("db", "t", (lo until lo + 10L)
        .map(i => (i, i.toDouble)).toDF("id", "v").coalesce(1))
    // three SEPARATE MoR deletes → three positional delete files
    for (range <- Seq((3L, 5L), (12L, 13L), (21L, 21L))) {
      val cur = cat.describe("db", "t").currentSnapshot.get
      val pos = cat.readFilesWithRowId(cur, schema, cur.files)
        .filter(col("id").between(range._1, range._2))
        .select(SnapshotCatalog.RowIdFileCol, SnapshotCatalog.RowIdPosCol)
      cat.addDeleteFile("db", "t", pos, None)
    }
    // an equality-delete + same-commit re-insert of id=7: the eq entry
    // hides only the OLD row (strictly-lower seq), the re-landed one
    // survives — the conversion must reproduce exactly that
    cat.cdcUpsert("db", "t", rows = Seq((7L, 777.0)).toDF("id", "v"),
      deletes = Seq(7L).toDF("id"), Seq("id"))
    val before = cat.describe("db", "t").currentSnapshot.get
    assert(before.deleteFiles.size >= 3 && before.eqDeletes.nonEmpty)
    assert(before.statsRowCount.isEmpty,
      "precondition: eq entries force the scan-count path")
    val rowsBefore = cat.read("db", "t").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    assert(rowsBefore.size == 24 &&
      rowsBefore.contains((7L, 777.0)) && !rowsBefore.contains((7L, 7.0)))
    val hashes = before.files.map(f => f -> md5Of(f)).toMap

    val r = cat.rewriteDeleteFiles("db", "t")
    assert(r.rewritten && r.deleteFilesAfter == 1 &&
      r.eqDeleteFilesConverted == before.eqDeletes.size, r.toString)
    val after = cat.describe("db", "t").currentSnapshot.get
    // ZERO data bytes moved: same file list, byte-identical
    assert(after.files == before.files)
    after.files.foreach(f => assert(md5Of(f) == hashes(f),
      s"data file $f changed under a delete-side-only rewrite"))
    assert(after.eqDeletes.isEmpty && after.deleteFiles.size == 1)
    // content-preserving replace: subscribers skip it
    assert(after.operation.contains("replace"))
    // reads identical, including the seq-gated re-insert
    val rowsAfter = cat.read("db", "t").collect()
      .map(r2 => (r2.getLong(0), r2.getDouble(1))).sorted.toSeq
    assert(rowsAfter == rowsBefore)
    // eq→pos conversion restores the metadata-only count
    assert(after.statsRowCount.contains(24L), after.statsRowCount)
    // time travel to the pre-rewrite snapshot still serves the OLD side
    assert(cat.read("db", "t", Some(before.snapshotId)).count() == 24)
    // a second pass (pos-only, already consolidated) stays correct
    val r2 = cat.rewriteDeleteFiles("db", "t")
    assert(r2.rewritten && r2.deleteFilesAfter == 1 &&
      r2.entriesAfter == r.entriesAfter, r2.toString)
    assert(cat.read("db", "t").collect()
      .map(x => (x.getLong(0), x.getDouble(1))).sorted.toSeq == rowsBefore)
  }

  test("write.order clusters at WRITE time: a declared-clustering " +
      "append range-distributes on the Z-value so new files land with " +
      "tight envelopes; batches missing the column still write") {
    import spark.implicits._
    val cat = new SnapshotCatalog(spark, tmpDir("graft-worder"))
    cat.createTable("db", "t",
      Seq.empty[(Long, Long)].toDF("id", "x").schema)
    cat.updateProperties("db", "t",
      Map(SnapshotCatalog.WriteOrderProp -> "x"))
    // a 4-partition shuffled batch: without write-time clustering every
    // file would span the whole x range
    cat.append("db", "t", (0L until 4000L).map(i => (i, (i * 37) % 4000))
      .toDF("id", "x").repartition(4))
    val cur = cat.describe("db", "t").currentSnapshot.get
    val sts = cur.fileStats.filter(st => cur.files.contains(st.path))
    assert(sts.size > 1, s"need multiple files, got ${sts.size}")
    // tight envelopes: a point predicate on x hits few files
    val hit = sts.count(st =>
      st.min("x").toDouble <= 42 && st.max("x").toDouble >= 42)
    assert(hit * 2 <= sts.size,
      s"$hit of ${sts.size} write-clustered files cover x=42: " +
        sts.map(st => st.min("x") + ".." + st.max("x")))
    // content is exactly the batch
    assert(cat.read("db", "t").count() == 4000)
    // an EMPTY batch under write.order writes cleanly (null bounds)
    cat.append("db", "t", Seq.empty[(Long, Long)].toDF("id", "x"))
    assert(cat.read("db", "t").count() == 4000)
  }

  test("write.order composes with hidden partitioning: files stay " +
      "value-pure per partition AND carry tight sort-column envelopes") {
    val cat = freshCatalog()
    import spark.implicits._
    import graft.catalog.PartitionSpec
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("x", LongType)))
    cat.createTable("db", "pw", schema,
      Map(PartitionSpec.PropertyKey -> "bucket(2, k)",
        SnapshotCatalog.WriteOrderProp -> "x"))
    cat.append("db", "pw", (0L until 2000L).map(i => (i, (i * 37) % 2000))
      .toDF("k", "x").repartition(4))
    val snap = cat.describe("db", "pw").currentSnapshot.get
    // every file is still value-pure under the bucket spec
    assert(snap.fileStats.forall(_.pval.isDefined),
      snap.fileStats.map(f => f.path -> f.pval))
    assert(snap.fileStats.map(_.pval.get).distinct.size == 2)
    // and the sort column's envelopes are tight: a point predicate on
    // x hits a minority of files
    assert(snap.files.size > 2)
    val hit = snap.fileStats.count(st =>
      st.min("x").toDouble <= 42 && st.max("x").toDouble >= 42)
    assert(hit * 2 <= snap.files.size,
      s"$hit of ${snap.files.size} files cover x=42: " +
        snap.fileStats.map(st => st.min("x") + ".." + st.max("x")))
    assert(cat.read("db", "pw").count() == 2000)
  }

  test("cherrypick survives a main-side COMPACTION between staging " +
      "and publish: the replace rewrote every head file, the staged " +
      "append still re-attaches byte-identical") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cat = freshCatalog()
    cat.createTable("db", "t", Seq.empty[(Long, Double)].toDF("id", "v").schema)
    for (b <- 0 until 4)
      cat.append("db", "t", Seq((b.toLong, b.toDouble)).toDF("id", "v")
        .coalesce(1))
    cat.createBranch("db", "t", "stage")
    cat.appendToBranch("db", "t", "stage",
      Seq((100L, 100.0)).toDF("id", "v"))
    val stagedId = cat.describe("db", "t").refs("stage")
    val stagedFiles = cat.describe("db", "t").snapshots
      .find(_.snapshotId == stagedId).get.files.toSet
    // main compacts: every pre-fork file is rewritten (replace)
    val rep = cat.compactFileGroups("db", "t")
    assert(rep.compacted)
    assert(cat.describe("db", "t").currentSnapshot.get.operation
      .contains("replace"))
    val meta = cat.cherrypick("db", "t", stagedId)
    val head = meta.currentSnapshot.get
    assert(head.files.toSet.intersect(stagedFiles).nonEmpty,
      "staged file must re-attach byte-identical across the compaction")
    assert(cat.read("db", "t").count() == 5)
    assert(cat.read("db", "t").filter(col("id") === 100L).count() == 1)
  }

  test("addFiles adopts external parquet ZERO-COPY: stats prune, a " +
      "later rename resolves into imports, duplicates/schema/" +
      "partitioned targets refuse") {
    import spark.implicits._
    val cat = freshCatalog()
    val ext = tmpDir("graft-addfiles-src")
    (0 until 4).foreach { b =>
      spark.range(b * 100, (b + 1) * 100)
        .select(col("id"), (col("id") * 2).cast("double").as("v"))
        .coalesce(1).write.parquet(s"$ext/part$b")
    }
    cat.createTable("db", "t", schemaV1)
    val rep = cat.addFiles("db", "t", ext)
    assert(rep.addedFiles == 4 && rep.addedRows == 400L)
    val snap = cat.describe("db", "t").currentSnapshot.get
    assert(snap.files.size == 4 &&
      snap.files.forall(_.startsWith(ext)),
      s"zero-copy: registered paths must be the external ones: ${snap.files}")
    assert(cat.read("db", "t").count() == 400)
    assert(cat.read("db", "t").agg(sum("id")).head.getLong(0) ==
      (0L until 400L).sum)
    // imported stats are as sharp as written ones: a range predicate
    // prunes to the one covering file
    assert(cat.prunedFiles(snap, "id", 150.0, 160.0).size == 1)
    // the import's colIds name-mapping makes later renames resolve
    // into imported files like native ones
    cat.renameColumn("db", "t", "v", "val2")
    assert(cat.read("db", "t").filter(col("id") === 399L)
      .select("val2").head.getDouble(0) == 798.0)
    // duplicate registration refuses — including under an alternate
    // `..`-spelled path of the same files (guards compare CANONICAL
    // paths, so a respelling can never double-register rows)
    intercept[IllegalArgumentException](cat.addFiles("db", "t", ext))
    val respelled =
      s"$ext/part0/../../${new java.io.File(ext).getName}"
    intercept[IllegalArgumentException](
      cat.addFiles("db", "t", respelled))
    // schema-mismatch refuses (int id vs declared long after restore)
    val ext2 = tmpDir("graft-addfiles-bad")
    spark.range(5).select(col("id").cast("int").as("id"),
      lit(1.0).as("val2")).write.parquet(s"$ext2/d")
    intercept[IllegalArgumentException](cat.addFiles("db", "t", ext2))
    // hidden-partitioned targets refuse (imports carry no pvals)
    cat.createTable("db", "pt", schemaV1,
      Map(graft.catalog.PartitionSpec.PropertyKey -> "bucket(4, id)"))
    intercept[IllegalArgumentException](cat.addFiles("db", "pt", ext))
  }

  test("addFiles ownership boundary: expiry forgets unreferenced " +
      "imports from metadata but NEVER deletes the external bytes; " +
      "native files still reap") {
    import spark.implicits._
    val cat = freshCatalog()
    val ext = tmpDir("graft-addfiles-own")
    spark.range(100).select(col("id"), col("id").cast("double").as("v"))
      .coalesce(1).write.parquet(s"$ext/d")
    cat.createTable("db", "t", schemaV1)
    cat.addFiles("db", "t", ext)
    // native commits around the import, then a compaction folds
    // everything — imported AND native originals become unreferenced
    cat.append("db", "t",
      Seq((1000L, 1.0), (1001L, 2.0)).toDF("id", "v").coalesce(1))
    val preCompact = cat.describe("db", "t").currentSnapshot.get.files
    val imported = preCompact.filter(_.startsWith(ext))
    val native = preCompact.filterNot(_.startsWith(ext))
    assert(imported.nonEmpty && native.nonEmpty)
    assert(cat.compactFileGroups("db", "t").compacted)
    cat.expireSnapshots("db", "t", keepLast = 1)
    val after = cat.describe("db", "t")
    assert(after.snapshots.size == 1)
    assert(!after.currentSnapshot.get.files.exists(_.startsWith(ext)),
      "metadata must forget the unreferenced imports")
    imported.foreach(f => assert(
      java.nio.file.Files.exists(java.nio.file.Paths.get(f)),
      s"expiry must never delete external bytes: $f"))
    native.foreach(f => assert(
      !java.nio.file.Files.exists(java.nio.file.Paths.get(f)),
      s"unreferenced NATIVE file must still reap: $f"))
    // content survived the whole lifecycle
    assert(cat.read("db", "t").count() == 102)
  }

  test("snapshotTable forks a MoR table zero-copy: identical reads, " +
      "total isolation both ways, and fork maintenance never reaps " +
      "source bytes") {
    import spark.implicits._
    val cat = freshCatalog()
    cat.createTable("db", "prod", schemaV1,
      Map("write.delete.mode" -> "merge-on-read"))
    cat.append("db", "prod",
      (0L until 100L).map(i => (i, i.toDouble)).toDF("id", "v")
        .repartition(2))
    // a live merge-on-read delete side at fork time
    val eng = new graft.query.Engine(spark, cat)
    assert(!eng.sqlQuery("DELETE FROM db.prod WHERE id < 10")
      .startsWith("""{"error""""))
    val prodSnap = cat.describe("db", "prod").currentSnapshot.get
    assert(prodSnap.deleteFiles.nonEmpty)
    cat.snapshotTable("db", "prod", "db", "fork")
    val forkSnap = cat.describe("db", "fork").currentSnapshot.get
    // zero-copy: the fork references the SOURCE paths, delete side too
    assert(forkSnap.files == prodSnap.files &&
      forkSnap.deleteFiles == prodSnap.deleteFiles)
    assert(cat.read("db", "fork").count() == 90)
    // isolation: DML on the fork never moves the source (and vice
    // versa); the fork's new delete file lands in the FORK's tree
    assert(!eng.sqlQuery("DELETE FROM db.fork WHERE id < 20")
      .startsWith("""{"error""""))
    assert(cat.read("db", "fork").count() == 80)
    assert(cat.read("db", "prod").count() == 90)
    assert(cat.describe("db", "prod").currentSnapshot.get == prodSnap)
    // fork maintenance rewrites into the fork's own tree and expiry
    // NEVER deletes referenced-source bytes (the addFiles ownership
    // boundary)
    assert(cat.compactFileGroups("db", "fork").compacted)
    cat.expireSnapshots("db", "fork", keepLast = 1)
    prodSnap.files.foreach(f => assert(
      java.nio.file.Files.exists(java.nio.file.Paths.get(f)),
      s"fork expiry must never reap a source file: $f"))
    assert(cat.read("db", "prod").count() == 90)
    // DROP the fork entirely — the source remains whole
    cat.dropTable("db", "fork")
    assert(cat.read("db", "prod").count() == 90)
    // forking onto an existing name refuses
    intercept[IllegalArgumentException](
      cat.snapshotTable("db", "prod", "db", "prod"))
  }

  test("ref aging (history.expire.max-ref-age-ms): expiry drops refs " +
      "whose head snapshot is older than the window; fresh refs and " +
      "property-less tables keep pinning") {
    import spark.implicits._
    val cat = freshCatalog()
    cat.createTable("db", "t", schemaV1)
    cat.append("db", "t", Seq((1L, 1.0)).toDF("id", "v"))
    cat.createTag("db", "t", "old-release")
    // no property set → the tag pins its snapshot forever
    cat.append("db", "t", Seq((2L, 2.0)).toDF("id", "v"))
    cat.expireSnapshots("db", "t", keepLast = 1)
    assert(cat.describe("db", "t").refs.contains("old-release"))
    // opt in with a 150 ms window; age the tag's head past it, then
    // land a FRESH branch whose head is seconds young
    cat.updateProperties("db", "t",
      Map(SnapshotCatalog.MaxRefAgeProp -> "150"))
    Thread.sleep(250)
    cat.append("db", "t", Seq((3L, 3.0)).toDF("id", "v"))
    cat.createBranch("db", "t", "young")
    cat.expireSnapshots("db", "t", keepLast = 1)
    val m = cat.describe("db", "t")
    assert(!m.refs.contains("old-release"),
      "an aged-out tag must drop during expiry")
    assert(!m.tagNames.contains("old-release"))
    assert(m.refs.contains("young"),
      "a fresh ref must survive the same expiry")
    // with the pin gone, the old snapshot obeyed keep_last
    assert(m.snapshots.map(_.snapshotId).min ==
      m.currentSnapshotId.get - 1 || m.snapshots.size <= 2)
    assert(cat.read("db", "t").count() == 3)
  }
}
