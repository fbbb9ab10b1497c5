package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog.SnapshotCatalog
import graft.functions.ZOrder

class ZOrderSpec extends SparkTestBase {

  import spark.implicits._

  test("interleave matches the scalar reference implementation") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (255L, 255L),
      (170L, 85L), (123L, 200L)).toDF("x", "y")
    val got = rows
      .withColumn("z", ZOrder.interleave(Seq(col("x"), col("y")), 8))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) =>
      assert(z == ZOrder.interleaveRef(x, y, 8), s"($x,$y)")
    }
  }

  test("interleave rejects widths that overflow a long") {
    intercept[IllegalArgumentException](
      ZOrder.interleave(Seq(col("x"), col("y")), 32))
  }

  test("z-ordered compaction prunes on BOTH dimensions; linear sort does not") {
    // 128x128 grid of independent keys: after z-ordered compaction each
    // file should cover a small (x, y) rectangle; after an x-sorted
    // rewrite a y-predicate cannot prune anything.
    val n = 128
    val grid = spark.range(n.toLong * n).select(
      (col("id") % n).as("x"),
      (col("id") / n).cast("long").as("y"),
      col("id").as("payload"))
    val schema = StructType(Seq(
      StructField("x", LongType), StructField("y", LongType),
      StructField("payload", LongType)))

    def keptFor(cat: SnapshotCatalog): (Int, Int, Int) = {
      val snap = cat.describe("db", "t").currentSnapshot.get
      val onX = cat.prunedFiles(snap, "x", 0, 15)
      val onY = cat.prunedFiles(snap, "y", 0, 15)
      val both = onX.toSet.intersect(onY.toSet)
      (onX.size, onY.size, both.size)
    }

    val zCat = new SnapshotCatalog(spark, tmpDir("graft-z"))
    zCat.createTable("db", "t", schema)
    zCat.append("db", "t", grid)
    zCat.compact("db", "t", numFiles = 16, clusterBy = Seq("x", "y"))
    val (zx, zy, zBoth) = keptFor(zCat)

    val xCat = new SnapshotCatalog(spark, tmpDir("graft-x"))
    xCat.createTable("db", "t", schema)
    // x-sorted rewrite == z-order on a single dimension
    xCat.append("db", "t", grid)
    xCat.compact("db", "t", numFiles = 16, clusterBy = Seq("x"))
    val (lx, ly, _) = keptFor(xCat)

    // sanity: single-dim sort prunes its own column perfectly, the
    // other not at all
    assert(lx <= 4, s"x-sorted files kept for x-predicate: $lx")
    assert(ly == 16, s"x-sorted files kept for y-predicate: $ly")
    // z-order prunes meaningfully on each dimension individually...
    assert(zx <= 8, s"z-ordered files kept for x-predicate: $zx")
    assert(zy <= 8, s"z-ordered files kept for y-predicate: $zy")
    // ...and the 2-D box keeps only a corner of the curve
    assert(zBoth <= 4, s"z-ordered files kept for 2-D box: $zBoth")
    // correctness: the clustered rewrite loses no rows
    assert(zCat.read("db", "t").count() == n.toLong * n)
    val boxCount = zCat.read("db", "t")
      .filter(col("x") <= 15 && col("y") <= 15).count()
    assert(boxCount == 256L)
  }
}
