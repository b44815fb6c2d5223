package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand fixtures for the matomo-style rollups ([[RefWorkload.retentionCohorts]]
  * / [[RefWorkload.dauWau]]) — written against a temp parquet dir so the
  * (spark, dir) query surface itself is exercised. */
class AnalyticsRollupSpec extends SparkSpec {
  import spark.implicits._

  private def withEvents[A](rows: Seq[(Long, String, Long)])(f: String => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft-rollup").toString
    try {
      rows.toDF("event_id", "ts_s", "user_id")
        .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
          col("user_id"), lit("view").as("event_type"),
          lit(1.0).as("value"), lit("{}").as("props"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      f(dir)
    } finally {
      graft.Caching.releaseAll()
      def rm(p: java.io.File): Unit = {
        Option(p.listFiles).foreach(_.foreach(rm)); p.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }

  test("retentionCohorts: week-truncated cohorts, offsets, shares") {
    // 2024-01-01 is a Monday. u1 active wk0 and wk1; u2 active wk0 only;
    // u3 first appears wk1 -> its own cohort.
    val rows = Seq(
      (1L, "2024-01-01 10:00:00", 1L), (2L, "2024-01-03 10:00:00", 2L),
      (3L, "2024-01-09 10:00:00", 1L), (4L, "2024-01-10 10:00:00", 3L))
    withEvents(rows) { dir =>
      val got = RefWorkload.retentionCohorts(spark, dir).collect()
        .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).toSet
      assert(got === Set(
        ("2024-01-01", 0, 2L, 2L, 1.0),
        ("2024-01-01", 1, 1L, 2L, 0.5),
        ("2024-01-08", 0, 1L, 1L, 1.0)))
    }
  }

  test("bounceRate: one-event sessions per start day, 30-min boundary splits") {
    // u1: two events 29:59 apart -> ONE 2-event session (no bounce);
    // then a third event exactly 30:00 after the second -> a NEW 1-event
    // session (bounce) on the same day. u2: single event -> bounce.
    val rows = Seq(
      (1L, "2024-01-01 08:00:00", 1L), (2L, "2024-01-01 08:29:59", 1L),
      (3L, "2024-01-01 08:59:59", 1L), (4L, "2024-01-01 12:00:00", 2L))
    withEvents(rows) { dir =>
      val got = RefWorkload.bounceRate(spark, dir).collect()
        .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(got === Set(("2024-01-01", 3L, 2L, 2.0 / 3.0)))
    }
  }

  test("dauWau: trailing-7-day actives and stickiness") {
    // u1 on day 1 and day 5; u2 on day 1. Day 1: dau 2, wau 2.
    // Day 5: dau 1 (u1), wau 2 (u1 fresh + u2 within trailing week).
    val rows = Seq(
      (1L, "2024-01-01 08:00:00", 1L), (2L, "2024-01-01 09:00:00", 2L),
      (3L, "2024-01-05 08:00:00", 1L))
    withEvents(rows) { dir =>
      val got = RefWorkload.dauWau(spark, dir).collect()
        .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(got === Set(
        ("2024-01-01", 2L, 2L, 1.0),
        ("2024-01-05", 1L, 2L, 0.5)))
    }
  }
}
