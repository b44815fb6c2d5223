package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsofSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofJoin attaches the greatest right time <= left time per key") {
    val left = Seq(
      (1L, "u1", "2024-01-01 10:00:00"),
      (2L, "u1", "2024-01-01 12:00:00"),
      (3L, "u1", "2024-01-01 09:00:00"),  // before any right row -> null
      (4L, "u2", "2024-01-01 10:00:00"))  // key with no right rows -> null
      .toDF("id", "user", "ts")
      .select(col("id"), col("user"), col("ts").cast("timestamp").as("ts"))
    val right = Seq(
      ("u1", "2024-01-01 09:30:00", 100L),
      ("u1", "2024-01-01 12:00:00", 200L)) // equal time matches (<= semantics)
      .toDF("user", "rts", "rid")
      .select(col("user"), col("rts").cast("timestamp").as("rts"), col("rid"))

    val out = Asof.asofJoin(left, right, Seq("user"), "ts", "rts", Seq("rid", "rts"))
      .select("id", "rid").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(out == Map(
      1L -> Some(100L),   // 09:30 is the latest <= 10:00
      2L -> Some(200L),   // exact-time match counts
      3L -> None,
      4L -> None))
  }

  test("asofJoin plans one shuffle on the key, no range cross product") {
    val left = Seq((1L, "u1", t("2024-01-01 10:00:00"))).toDF("id", "user", "ts")
    val right = Seq(("u1", t("2024-01-01 09:00:00"), 7L)).toDF("user", "rts", "rid")
    val plan = Asof.asofJoin(left, right, Seq("user"), "ts", "rts", Seq("rid"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan.take(500))
  }
}
