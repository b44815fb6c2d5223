package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val points = Seq(
    (1L, "2024-01-01 10:00:00"),
    (2L, "2024-01-01 13:30:00"),   // inside a long interval's later tile
    (3L, "2024-01-01 23:59:59"),
    (4L, "2024-01-02 00:00:00"))   // exactly on an interval start (inclusive)
    .toDF("p_id", "t").select($"p_id", $"t".cast("timestamp").as("t"))

  private val intervals = Seq(
    (10L, "2024-01-01 09:30:00", "2024-01-01 10:00:00"),  // end == point 1 ts
    (11L, "2024-01-01 12:00:00", "2024-01-01 18:00:00"),  // spans 7 tiles
    (12L, "2024-01-02 00:00:00", "2024-01-02 01:00:00"),
    (13L, "2024-01-01 15:00:00", "2024-01-01 14:00:00"),  // end < start: dead
    (14L, null, "2024-01-01 10:30:00"))                   // null bound: dead
    .toDF("iv_id", "s", "e")
    .select($"iv_id", $"s".cast("timestamp").as("s"), $"e".cast("timestamp").as("e"))

  test("bucketized containment equals the naive theta-join, inclusive ends") {
    val out = RangeJoin.pointInInterval(points, intervals, "t", "s", "e")
      .select("p_id", "iv_id").as[(Long, Long)].collect().toSet
    val naive = points.join(intervals, $"t" >= $"s" && $"t" <= $"e")
      .select("p_id", "iv_id").as[(Long, Long)].collect().toSet
    assert(out == naive)
    assert(out == Set((1L, 10L), (2L, 11L), (4L, 12L)))
  }

  test("a point meets a multi-tile interval exactly once (no dedup needed)") {
    // narrow tiles force interval 11 into many tiles; pair (2,11) must
    // still appear exactly once
    val rows = RangeJoin.pointInInterval(points, intervals, "t", "s", "e",
      bucketWidthSec = 60L).select("p_id", "iv_id").as[(Long, Long)].collect()
    assert(rows.length == rows.distinct.length)
    assert(rows.count(_ == (2L, 11L)) == 1)
  }

  test("randomized: equals the theta-join for arbitrary data across widths") {
    val rnd = new scala.util.Random(42)  // seeded: deterministic fixture
    val base = ts("2024-01-01 00:00:00").getTime
    def t(offsetMin: Long) = new java.sql.Timestamp(base + offsetMin * 60000L)
    val ps = (1L to 120L).map(i => (i, t(rnd.nextInt(7 * 24 * 60).toLong)))
      .toDF("p_id", "t")
    val ivs = (1L to 60L).map { i =>
      val s = rnd.nextInt(7 * 24 * 60).toLong
      (i, t(s), t(s + rnd.nextInt(36 * 60).toLong))
    }.toDF("iv_id", "s", "e")
    val naive = ps.join(ivs, $"t" >= $"s" && $"t" <= $"e")
      .select("p_id", "iv_id").as[(Long, Long)].collect().toSet
    for (width <- Seq(60L, 3600L, 86400L)) {
      val out = RangeJoin.pointInInterval(ps, ivs, "t", "s", "e", width)
        .select("p_id", "iv_id").as[(Long, Long)].collect()
      assert(out.length == out.distinct.length, s"dup pairs at width=$width")
      assert(out.toSet == naive, s"mismatch at width=$width")
    }
    assert(naive.nonEmpty)
  }

  test("plans as an equi-join on the tile, not a nested-loop product") {
    val plan = RangeJoin.pointInInterval(points, intervals, "t", "s", "e")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(800))
  }
}
