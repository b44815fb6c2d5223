package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private val events = Seq(
    // u1 completes the funnel in order
    (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
    // u2 clicks BEFORE viewing: click must not count (strictly after t1)
    (2L, "click", 5L), (2L, "view", 10L), (2L, "purchase", 40L),
    // u3 views only
    (3L, "view", 10L),
    // u4 purchases with no view at all: not in the funnel
    (4L, "purchase", 10L),
    // u5: click same instant as view -> strict 'after' excludes it
    (5L, "view", 10L), (5L, "click", 10L)
  ).map { case (u, t, s) => (u, t, ts(s)) }.toDF("user_id", "event_type", "ts")

  test("steps: strictly-ordered stage entry, dropouts stay counted upstream") {
    val out = Funnel.steps(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .as[(Int, String, Long)].collect().toSet
    // view: u1,u2,u3,u5; click after view: u1 only (u2 clicked early, u5 tied);
    // purchase after that click: u1
    assert(out == Set((1, "view", 4L), (2, "click", 1L), (3, "purchase", 1L)))
  }

  test("userStages: a user whose stage events all precede t_prev stays with null") {
    val st = Funnel.userStages(events, "user_id", "event_type", "ts",
        Seq("view", "click"))
      .select("user_id", "t2").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(st.keySet == Set(1L, 2L, 3L, 5L))
    assert(st(1L).isDefined && st(2L).isEmpty && st(3L).isEmpty && st(5L).isEmpty)
  }

  test("steps: counts are weakly decreasing for any stage sequence") {
    val out = Funnel.steps(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .as[(Int, String, Long)].collect().sortBy(_._1).map(_._3)
    assert(out.zip(out.tail).forall { case (a, b) => b <= a })
  }

  test("steps on an empty frame reports zero users per stage") {
    val out = Funnel.steps(events.filter($"user_id" < 0), "user_id",
        "event_type", "ts", Seq("view", "click"))
      .as[(Int, String, Long)].collect().toSet
    assert(out == Set((1, "view", 0L), (2, "click", 0L)))
  }
}
