package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class StreamAggsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("watermarked windowed counts: windows finalize once the watermark passes (A5/ST6)") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String)]
    val counts = StreamAggs.windowedCounts(
      ms.toDF().toDF("ts", "event_type"), "ts", "event_type",
      windowDuration = "1 hour", watermarkDelay = "10 minutes")
    val q = counts.writeStream.format("memory").queryName("wc")
      .outputMode(OutputMode.Append()).start()
    try {
      ms.addData((ts("2024-01-01 10:05:00"), "click"),
        (ts("2024-01-01 10:20:00"), "click"),
        (ts("2024-01-01 10:40:00"), "view"))
      q.processAllAvailable()
      // nothing finalized yet: watermark still inside the 10:00 window
      assert(spark.table("wc").count() == 0)

      // an event far ahead pushes the watermark past 11:00 -> 10:00 window emits
      ms.addData((ts("2024-01-01 12:00:00"), "click"))
      q.processAllAvailable()
      val out = spark.table("wc")
        .select("window_start", "event_type", "cnt")
        .as[(Timestamp, String, Long)].collect().toSet
      assert(out == Set(
        (ts("2024-01-01 10:00:00"), "click", 2L),
        (ts("2024-01-01 10:00:00"), "view", 1L)))

      // a late row behind the watermark is dropped, closed window not re-emitted
      ms.addData((ts("2024-01-01 10:50:00"), "click"))
      q.processAllAvailable()
      assert(spark.table("wc").count() == 2)
    } finally q.stop()
  }

  test("session windows merge events within the gap and finalize on watermark") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String)]
    val sessions = StreamAggs.sessionCounts(
      ms.toDF().toDF("ts", "user"), "ts", "user",
      gapDuration = "10 minutes", watermarkDelay = "5 minutes")
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append()).start()
    try {
      // two events 5 min apart merge into one session; a third 30 min later opens another
      ms.addData((ts("2024-01-01 10:00:00"), "u1"),
        (ts("2024-01-01 10:05:00"), "u1"),
        (ts("2024-01-01 10:40:00"), "u1"))
      q.processAllAvailable()
      ms.addData((ts("2024-01-01 12:00:00"), "u1")) // watermark far forward
      q.processAllAvailable()
      val out = spark.table("sess")
        .select("session_start", "session_end", "cnt")
        .as[(Timestamp, Timestamp, Long)].collect().toSet
      assert(out == Set(
        (ts("2024-01-01 10:00:00"), ts("2024-01-01 10:15:00"), 2L),
        (ts("2024-01-01 10:40:00"), ts("2024-01-01 10:50:00"), 1L)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits a visit summary only when the session times out") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String)]
    val summaries = StreamAggs.visitSummaries(
      ms.toDF().toDF("ts", "user"), "ts", "user",
      gap = java.time.Duration.ofMinutes(10), watermarkDelay = "5 minutes")
    val q = summaries.writeStream.format("memory").queryName("vs")
      .outputMode(OutputMode.Append()).start()
    try {
      ms.addData((ts("2024-01-01 10:00:00"), "u1"),
        (ts("2024-01-01 10:04:00"), "u1"))
      q.processAllAvailable()
      // session still open: watermark has not passed lastTs + gap
      assert(spark.table("vs").count() == 0)

      // far-future event for another user advances the watermark past the
      // timeout -> u1's visit closes and emits exactly one summary
      ms.addData((ts("2024-01-01 11:00:00"), "u2"))
      q.processAllAvailable()
      val out = spark.table("vs")
        .as[StreamAggs.VisitSummary].collect()
      assert(out.length == 1)
      assert(out.head.user == "u1" && out.head.events == 2L)
      assert(out.head.firstTs == ts("2024-01-01 10:00:00"))
      assert(out.head.lastTs == ts("2024-01-01 10:04:00"))
    } finally q.stop()
  }

  test("mapGroupsWithState running counters accumulate across micro-batches (A6)") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, String, Long, Int)] // table, log_file, log_pos, row_index
    val env = ms.toDF().toDF("table", "log_file", "log_pos", "row_index")
    val counters = StreamAggs.runningCounters(env)
    val q = counters.writeStream.format("memory").queryName("rc")
      .outputMode(OutputMode.Update()).start()
    try {
      ms.addData(("site", "mysql-bin.000001", 100L, 0),
        ("site", "mysql-bin.000001", 200L, 0),
        ("visit", "mysql-bin.000001", 300L, 0))
      q.processAllAvailable()
      ms.addData(("site", "mysql-bin.000002", 10L, 0))
      q.processAllAvailable()
      // update mode appends one refreshed row per key per batch: latest wins
      val last = spark.table("rc").groupBy("table")
        .agg(max(struct(col("rows"), col("maxVersion"))).as("s"))
        .select(col("table"), col("s.rows"), col("s.maxVersion"))
        .as[(String, Long, Long)].collect()
        .map { case (k, r, v) => k -> ((r, v)) }.toMap
      assert(last("site") == ((3L,
        graft.cdc.Cdc.versionOf("mysql-bin.000002", 10L, 0))))
      assert(last("visit") == ((1L,
        graft.cdc.Cdc.versionOf("mysql-bin.000001", 300L, 0))))
    } finally q.stop()
  }

  test("streaming dedup emits first arrivals only; state evicts past the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String)]
    val out = StreamAggs.dedupWithinWatermark(
      ms.toDF().toDF("ts", "k"), "ts", Seq("k"), watermarkDelay = "10 minutes")
    val q = out.writeStream.format("memory").queryName("dd")
      .outputMode(OutputMode.Append()).start()
    try {
      ms.addData((ts("2024-01-01 10:00:00"), "a"),
        (ts("2024-01-01 10:01:00"), "a"),
        (ts("2024-01-01 10:02:00"), "b"))
      q.processAllAvailable()
      assert(spark.table("dd").select("k").as[String].collect().sorted
        .toSeq == Seq("a", "b"))

      // duplicate inside the horizon: still dropped
      ms.addData((ts("2024-01-01 10:05:00"), "a"))
      q.processAllAvailable()
      assert(spark.table("dd").count() == 2)

      // advance the watermark far past a's last arrival, then send a again:
      // its state has been evicted, so it re-emits (the horizon IS the scope)
      ms.addData((ts("2024-01-01 12:00:00"), "w"))
      q.processAllAvailable()
      ms.addData((ts("2024-01-01 11:58:00"), "a"))
      q.processAllAvailable()
      val ks = spark.table("dd").select("k").as[String].collect().sorted.toSeq
      assert(ks == Seq("a", "a", "b", "w"))
    } finally q.stop()
  }

  test("stream-static enrichment joins the broadcast dim per micro-batch, keeps unknown keys") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "shop"), (2L, "blog")).toDF("idsite", "site_kind")
    val ms = MemoryStream[(Timestamp, Long)]
    val out = StreamAggs.enrichedWindowedCounts(
      ms.toDF().toDF("ts", "idsite"), dim, "ts", "idsite", "site_kind",
      windowDuration = "1 hour", watermarkDelay = "10 minutes")
    val q = out.writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append()).start()
    try {
      ms.addData((ts("2024-01-01 10:05:00"), 1L), (ts("2024-01-01 10:10:00"), 1L),
        (ts("2024-01-01 10:20:00"), 2L), (ts("2024-01-01 10:30:00"), 99L))
      q.processAllAvailable()
      ms.addData((ts("2024-01-01 12:00:00"), 1L))   // advance watermark
      q.processAllAvailable()
      val rows = spark.table("enriched")
        .select("site_kind", "cnt").collect()
        .map(r => Option(r.getString(0)) -> r.getLong(1)).toSet
      assert(rows == Set(Some("shop") -> 2L, Some("blog") -> 1L, None -> 1L))
    } finally q.stop()
  }

  test("stream-stream interval join pairs within the window; leftOuter emits non-converts") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Timestamp, String)]
    val clicks = MemoryStream[(Timestamp, String)]
    val joined = StreamAggs.intervalJoin(
      imps.toDF().toDF("its", "ad"), clicks.toDF().toDF("cts", "ad"),
      keyCol = "ad", leftTs = "its", rightTs = "cts",
      maxDelay = "15 minutes", watermarkDelay = "5 minutes",
      joinType = "leftOuter")
    val q = joined.writeStream.format("memory").queryName("attr")
      .outputMode(OutputMode.Append()).start()
    try {
      imps.addData((ts("2024-01-01 10:00:00"), "a1"),
        (ts("2024-01-01 10:00:00"), "a2"))
      clicks.addData((ts("2024-01-01 10:05:00"), "a1"),  // inside 15 min
        (ts("2024-01-01 10:40:00"), "a2"))               // outside
      q.processAllAvailable()
      // advance BOTH watermarks far enough to close a2's match window
      imps.addData((ts("2024-01-01 12:00:00"), "zz"))
      clicks.addData((ts("2024-01-01 12:00:00"), "zz"))
      q.processAllAvailable()
      val got = spark.table("attr")
        .filter(col("ad") =!= "zz")
        .select("ad", "cts_r").collect()
        .map(r => r.getString(0) -> Option(r.getTimestamp(1))).toSet
      assert(got == Set(
        "a1" -> Some(ts("2024-01-01 10:05:00")),  // converted inside window
        "a2" -> None))                            // never converted: one null row
    } finally q.stop()
  }
}
