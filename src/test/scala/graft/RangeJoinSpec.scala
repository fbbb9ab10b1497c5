package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkTestBase {

  import spark.implicits._

  // Overlapping, irregular intervals; spans straddle bucket borders at
  // every width used below.
  private lazy val intervals = Seq(
    (10L, 0L, 5L), (11L, 3L, 20L), (12L, 19L, 21L), (13L, 40L, 40L)
  ).toDF("iv_id", "start_v", "end_v")

  private lazy val points = Seq(
    (100L, 0L), (101L, 4L), (102L, 5L), (103L, 6L),
    (104L, 20L), (105L, 21L), (106L, 39L), (107L, 40L)
  ).toDF("pt_id", "v")

  private def naivePairs = points
    .join(intervals, col("v").between(col("start_v"), col("end_v")))
    .select("pt_id", "iv_id").orderBy("pt_id", "iv_id")
    .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("pointInInterval matches the naive BETWEEN join at several bucket widths") {
    for (w <- Seq(1L, 3L, 16L, 100L)) {
      val got = RangeJoin.pointInInterval(points, "v", intervals,
          "start_v", "end_v", bucketWidth = w)
        .select("pt_id", "iv_id").orderBy("pt_id", "iv_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == naivePairs, s"bucketWidth=$w")
    }
  }

  test("pointInInterval emits each matching pair exactly once") {
    val got = RangeJoin.pointInInterval(points, "v", intervals,
        "start_v", "end_v", bucketWidth = 2L)
      .groupBy("pt_id", "iv_id").count()
      .filter(col("count") > 1).count()
    assert(got == 0L)
  }

  test("pointInInterval plans an equi-join, not a nested loop") {
    val plan = RangeJoin.pointInInterval(points, "v", intervals,
        "start_v", "end_v", bucketWidth = 16L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("intervalOverlap matches the naive overlap join, deduplicated") {
    val left = Seq((1L, 0L, 10L), (2L, 5L, 35L), (3L, 36L, 36L))
      .toDF("a_id", "a_s", "a_e")
    val right = Seq((7L, 8L, 12L), (8L, 30L, 40L), (9L, 50L, 60L))
      .toDF("b_id", "b_s", "b_e")
    val naive = left
      .join(right, col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .select("a_id", "b_id").orderBy("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    for (w <- Seq(4L, 16L)) {
      val got = RangeJoin.intervalOverlap(left, "a_s", "a_e",
          right, "b_s", "b_e", bucketWidth = w)
        .select("a_id", "b_id").orderBy("a_id", "b_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == naive, s"bucketWidth=$w")
    }
    // auto-width overload: same answer, width derived from both sides
    val auto = RangeJoin.intervalOverlap(left, "a_s", "a_e",
        right, "b_s", "b_e")
      .select("a_id", "b_id").orderBy("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(auto == naive, "auto-width overlap diverged")
  }
}
