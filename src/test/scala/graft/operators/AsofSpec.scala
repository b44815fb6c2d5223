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

  test("native asof exec matches the edge semantics of the composed form") {
    val left = Seq(
      (1L, "u1", "2024-01-01 10:00:00"),
      (2L, "u1", "2024-01-01 12:00:00"),
      (3L, "u1", "2024-01-01 09:00:00"),
      (4L, "u2", "2024-01-01 10:00:00"))
      .toDF("id", "user", "ts")
      .select(col("id"), col("user"), col("ts").cast("timestamp").as("ts"))
    val right = Seq(
      ("u1", "2024-01-01 09:30:00", 100L),
      ("u1", "2024-01-01 12:00:00", 200L))
      .toDF("user", "rts", "rid")
      .select(col("user"), col("rts").cast("timestamp").as("rts"), col("rid"))
    val out = Asof.asofJoinNative(left, right, Seq("user"), "ts", "rts", Seq("rid"))
      .select("id", "rid").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(out == Map(1L -> Some(100L), 2L -> Some(200L), 3L -> None, 4L -> None))
  }

  test("native asof plans AsofJoinExec (no window, no union) and matches composed on random data") {
    val rnd = new scala.util.Random(11)
    val base = t("2024-01-01 00:00:00").getTime
    val left = Seq.tabulate(800) { i =>
      (i.toLong, s"u${rnd.nextInt(20)}",
        new java.sql.Timestamp(base + rnd.nextInt(1000000) * 1000L))
    }.toDF("id", "user", "ts")
    val right = {
      // unique per (key, time) as the ASOF contract requires
      val seen = scala.collection.mutable.Set.empty[(String, Long)]
      Seq.fill(300) {
        (s"u${rnd.nextInt(25)}",
          new java.sql.Timestamp(base + rnd.nextInt(1000000) * 1000L),
          rnd.nextInt(10000).toLong)
      }.filter(r => seen.add((r._1, r._2.getTime)))
    }.toDF("user", "rts", "rid")

    val native = Asof.asofJoinNative(
      left.repartition(7), right.repartition(3), Seq("user"), "ts", "rts", Seq("rid"))
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan.take(800))
    assert(!plan.contains("Window") && !plan.contains("Union"), plan.take(800))

    val n = native.select("id", "rid").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val c = Asof.asofJoin(left, right, Seq("user"), "ts", "rts", Seq("rid"))
      .select("id", "rid").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(n == c)
  }

  test("native asof generalizes: composite (string, long) key and long time column") {
    val rnd = new scala.util.Random(23)
    val left = Seq.tabulate(400) { i =>
      (i.toLong, s"r${rnd.nextInt(5)}", rnd.nextInt(4).toLong,
        rnd.nextInt(100000).toLong)
    }.toDF("id", "region", "shard", "t")
    val right = {
      val seen = scala.collection.mutable.Set.empty[(String, Long, Long)]
      Seq.fill(200) {
        (s"r${rnd.nextInt(6)}", rnd.nextInt(5).toLong,
          rnd.nextInt(100000).toLong, rnd.nextInt(999).toLong)
      }.filter(r => seen.add((r._1, r._2, r._3)))
    }.toDF("region", "shard", "rt", "v")
    val n = Asof.asofJoinNative(left.repartition(5), right.repartition(4),
        Seq("region", "shard"), "t", "rt", Seq("v"))
      .select("id", "v").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val c = Asof.asofJoin(left, right, Seq("region", "shard"), "t", "rt", Seq("v"))
      .select("id", "v").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(n == c)
  }
}
