package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog.SnapshotCatalog

/** Copy-on-write row-level ops: MERGE/upsert and range delete. */
class MergeSpec extends SparkTestBase {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", DoubleType)))

  private def freshTable(): SnapshotCatalog = {
    val cat = new SnapshotCatalog(spark, tmpDir("graft-merge"))
    cat.createTable("db", "t", schema)
    cat
  }

  private def batch(ids: Range, v: Double) =
    ids.map(i => (i.toLong, v)).toDF("id", "v").repartition(1)

  test("upsert replaces matched keys, inserts new ones, keeps time travel") {
    val cat = freshTable()
    cat.append("db", "t", batch(1 to 10, 1.0))
    cat.upsert("db", "t", batch(5 to 6, 2.0).union(batch(11 to 11, 2.0)), "id")

    val now = cat.read("db", "t")
    assert(now.count() == 11)
    assert(now.filter(col("v") === 2.0).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(5L, 6L, 11L))
    // the pre-upsert snapshot still reads the original rows
    assert(cat.read("db", "t", snapshotId = Some(1L))
      .filter(col("v") === 2.0).count() == 0)
  }

  test("upsert rewrites only files whose key range intersects the batch") {
    val cat = freshTable()
    cat.append("db", "t", batch(1 to 100, 1.0))
    cat.append("db", "t", batch(101 to 200, 1.0))
    val before = cat.describe("db", "t").currentSnapshot.get.files
    cat.upsert("db", "t", batch(1 to 50, 9.0), "id")
    val after = cat.describe("db", "t").currentSnapshot.get.files
    // the 101-200 file is carried by path identity; the 1-100 file is not
    val carried = before.toSet.intersect(after.toSet)
    assert(carried.size == 1)
    assert(cat.read("db", "t").filter(col("v") === 9.0).count() == 50)
    assert(cat.read("db", "t").count() == 200)
  }

  test("deleteWhere drops fully-covered files metadata-only, rewrites straddlers") {
    val cat = freshTable()
    cat.append("db", "t", batch(0 to 99, 1.0))
    cat.append("db", "t", batch(100 to 199, 1.0))
    cat.append("db", "t", batch(200 to 299, 1.0))
    val before = cat.describe("db", "t").currentSnapshot.get.files

    // exactly covers the middle file: no data IO, manifest-only
    cat.deleteWhere("db", "t", "id", 100, 199)
    val snap1 = cat.describe("db", "t").currentSnapshot.get
    assert(snap1.files.toSet.subsetOf(before.toSet)) // nothing rewritten
    assert(snap1.files.size == 2)
    assert(cat.read("db", "t").count() == 200)

    // straddles both remaining files: both rewritten, bounds survive
    cat.deleteWhere("db", "t", "id", 50, 249)
    assert(cat.read("db", "t").count() == 100)
    assert(cat.read("db", "t").agg(min("id"), max("id")).head().toSeq ==
      Seq(0L, 299L).map(identity))
    // rows 50-99 and 200-249 are gone
    assert(cat.read("db", "t").filter(col("id").between(50, 249)).count() == 0)
  }

  test("upsert into an empty table behaves as append") {
    val cat = freshTable()
    cat.upsert("db", "t", batch(1 to 3, 1.0), "id")
    assert(cat.read("db", "t").count() == 3)
  }
}
