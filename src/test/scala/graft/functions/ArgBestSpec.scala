package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins `graft_argmax`/`graft_argmin` (r15: the hash-aggregable flat-buffer
  * replacement for `max(struct(score, −id))`, which planned as a
  * SortAggregate over the whole candidate stream) bit-equal to the struct
  * spelling it replaced — ties, NaN ordering, null skipping, empty groups —
  * and verifies the plan actually hash-aggregates. */
class ArgBestSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Long, Double, Long)*) =
    rows.toDF("g", "score", "id")

  private def both(rows: (Long, Double, Long)*): (Map[Long, Any], Map[Long, Any]) = {
    val d = df(rows: _*)
    val fast = d.groupBy(col("g"))
      .agg(expr("graft_argmax(score, id)").as("best"))
      .collect().map(r => r.getLong(0) -> r.get(1)).toMap
    val ref = d.groupBy(col("g"))
      .agg(max(struct(col("score"), (-col("id")).as("nid"))).as("mx"))
      .select(col("g"), (-col("mx.nid")).as("best"))
      .collect().map(r => r.getLong(0) -> r.get(1)).toMap
    (fast, ref)
  }

  test("argmax matches max(struct) on plain, tied, and NaN scores") {
    val (fast, ref) = both(
      (1L, 0.5, 10L), (1L, 0.9, 11L), (1L, 0.9, 7L),   // tie -> lowest id 7
      (2L, -1.0, 3L), (2L, -0.5, 4L),
      (3L, Double.NaN, 9L), (3L, 5.0, 8L),             // NaN beats 5.0
      (4L, Double.NaN, 6L), (4L, Double.NaN, 2L))      // all-NaN -> lowest id
    assert(fast == ref, s"argmax diverged: $fast vs $ref")
    assert(fast(1L) == 7L && fast(3L) == 9L && fast(4L) == 2L)
  }

  test("argmin matches min(struct) including ties") {
    val d = df((1L, 3.0, 5L), (1L, 1.0, 9L), (1L, 1.0, 4L), (2L, 0.0, 1L))
    val fast = d.groupBy(col("g"))
      .agg(expr("graft_argmin(score, id)").as("best"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = d.groupBy(col("g"))
      .agg(min(struct(col("score"), col("id"))).as("mn"))
      .select(col("g"), col("mn.id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == ref && fast(1L) == 4L)
  }

  test("null scores are skipped; all-null group evaluates to null") {
    val d = Seq[(Long, java.lang.Double, Long)](
      (1L, null, 5L), (1L, 2.0, 6L), (2L, null, 7L))
      .toDF("g", "score", "id")
    val out = d.groupBy(col("g"))
      .agg(expr("graft_argmax(score, id)").as("best"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).contains(6L))
    assert(out(2L).isEmpty, "all-null group must yield null")
  }

  test("the plan hash-aggregates (no SortAggregate) where max(struct) sorts") {
    val d = df((1L, 0.5, 10L), (2L, 0.9, 11L))
    val fastPlan = d.groupBy(col("g"))
      .agg(expr("graft_argmax(score, id)").as("best"))
      .queryExecution.executedPlan.toString
    assert(fastPlan.contains("HashAggregate"),
      s"graft_argmax must plan as HashAggregate:\n$fastPlan")
    assert(!fastPlan.contains("SortAggregate"),
      s"graft_argmax must not demote to SortAggregate:\n$fastPlan")
    val refPlan = d.groupBy(col("g"))
      .agg(max(struct(col("score"), (-col("id")).as("nid"))).as("mx"))
      .queryExecution.executedPlan.toString
    assert(refPlan.contains("SortAggregate"),
      "the struct spelling was expected to SortAggregate — if Spark now " +
        "hash-aggregates struct buffers this spec (and the r15 rationale) " +
        "should be revisited")
  }
}
