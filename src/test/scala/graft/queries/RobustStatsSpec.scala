package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand fixtures for the robust-stats analytics entries
  * ([[RefWorkload.eventsAnomalyMad]] / [[RefWorkload.eventsRfmSegments]]) —
  * written against a temp parquet dir so the (spark, dir) query surface is
  * exercised end-to-end. */
class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  private def withEvents[A](rows: Seq[(Long, String, Long, String, Double)])(
      f: String => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft-robust").toString
    try {
      rows.toDF("event_id", "ts_s", "user_id", "event_type", "value")
        .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
          col("user_id"), col("event_type"), col("value"),
          lit("{}").as("props"))
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

  test("eventsAnomalyMad: exact median/MAD on a hand corpus; the extreme " +
      "value cannot inflate the threshold that should flag it") {
    // values 1..20 plus one 10000: median = 11.00, |x-med| sorted has
    // median 5.00, so the 3-MAD fence sits at 15 — only the extreme trips
    // it, while its own presence moved the fence not at all (a 2-sigma
    // z-score fence would have been dragged to ~4360 by the same point).
    val rows = (1 to 20).map(i =>
      (i.toLong, f"2024-01-01 10:${i}%02d:00", i.toLong, "click", i.toDouble)) :+
      (21L, "2024-01-01 11:00:00", 21L, "click", 10000.0)
    withEvents(rows) { dir =>
      val r = RefWorkload.eventsAnomalyMad(spark, dir)
        .select($"event_type", $"n", $"median_c", $"mad_c", $"n_outliers")
        .as[(String, Long, Double, Double, Long)].head()
      assert(r == (("click", 21L, 1100.0, 500.0, 1L)), s"got $r")
    }
  }

  test("eventsEwmaDaily: constant traffic smooths to itself exactly; a " +
      "spike turns the rising flag on exactly once") {
    // 10 days at 4 events/day, then day 11 spikes to 8
    val rows = (1 to 10).flatMap(d => (1 to 4).map(k =>
      ((d * 10 + k).toLong, f"2024-03-$d%02d 12:0$k:00", k.toLong, "view", 1.0))) ++
      (1 to 8).map(k => ((110 + k).toLong, s"2024-03-11 12:0$k:00", k.toLong, "view", 1.0))
    withEvents(rows) { dir =>
      val out = RefWorkload.eventsEwmaDaily(spark, dir)
        .select($"d".cast("string"), $"y", $"ewma", $"rising")
        .as[(String, Long, Double, Boolean)].collect().sortBy(_._1)
      out.take(10).foreach { case (d, y, e, r) =>
        assert(y == 4L && e == 4.0 && !r, s"flat prefix must smooth to itself: $d $y $e $r")
      }
      val (_, y11, e11, r11) = out.last
      assert(y11 == 8L && e11 > 4.0 && e11 < 8.0 && r11,
        s"spike day must sit above its own smoothing: $y11 $e11 $r11")
    }
  }

  test("eventsRfmSegments: segments partition the users and conserve the " +
      "purchase revenue") {
    val rows = (1 to 40).flatMap { u =>
      (1 to (u % 5) + 1).map { k =>
        ((u * 10 + k).toLong, f"2024-01-${(u % 27) + 1}%02d 09:00:00",
          u.toLong, if (k == 1) "purchase" else "view", u.toDouble)
      }
    }
    withEvents(rows) { dir =>
      val out = RefWorkload.eventsRfmSegments(spark, dir)
        .select($"segment", $"n_users", $"monetary_c")
        .as[(String, Long, Long)].collect()
      assert(out.map(_._2).sum == 40L, "segments must partition the users")
      // every user makes exactly one purchase of u.00 -> sum u*100
      assert(out.map(_._3).sum == (1 to 40).map(_ * 100L).sum)
      assert(out.map(_._1).toSet.subsetOf(Set(
        "champions", "loyal", "at_risk", "hibernating", "regular")))
    }
  }
}
