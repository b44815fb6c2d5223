package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Caching

/**
 * The reference's relational workload (SURVEY.md §2.3-§2.8), re-expressed as
 * native Spark operators over the driver testdata. Per FIXTURES.md §B, the
 * `events` table plays the versioned CDC log: `user_id` ≈ business key,
 * `event_id` ≈ dateid version, `ts` ≈ event time.
 *
 * Scale notes (100 TB design): every query here shuffles at most once on its
 * grouping key; scalar anchors (e.g. max(ts)) are computed as a 1-row
 * aggregate cross-joined via broadcast — never collected into driver loops;
 * window dedups partition by the business key, which is the natural
 * high-cardinality partitioning at scale.
 */
object RefWorkload {

  /** Broadcast 1-row frame with the data's max timestamp — the deterministic
    * "now" anchor (never wall clock, so results are reproducible). */
  private def tsAnchor(events: DataFrame): DataFrame =
    events.agg(max(col("ts")).as("__max_ts"))

  /**
   * J1/A1 — latest-record-wins view: the newest version of each key
   * (reference: script_create_clickhouse_table.sql:484-494). Window
   * formulation: one shuffle on user_id; at scale this is the minimal plan
   * (the GROUP-BY-max + self-join oracle form shuffles twice and joins).
   */
  def j1LatestRecord(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").desc)
    e.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"), col("value"))
  }

  /**
   * J2/A2 — duplicate finder: keys with more than one version inside the
   * trailing 14-day window (reference: _settings.py:237-256,
   * doc_old_duplicates.md:32-70).
   */
  def j2DupCount(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    e.crossJoin(broadcast(tsAnchor(e)))
      .filter(col("ts") >= col("__max_ts") - expr("INTERVAL 14 DAYS"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("versions"), max(col("event_id")).as("max_event_id"))
      .filter(col("versions") > 1)
  }

  /**
   * J3/ST8 — dedup purge: the table after deleting every stale version
   * inside the trailing 14-day window, keeping exactly the max-version row
   * per key; rows outside the window untouched (reference:
   * _settings.py:230-287 — the ALTER DELETE ... IN (stale) mutation,
   * re-expressed functionally as window-filter + anti-join).
   */
  def j3DedupPurge(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val inWindow = e.crossJoin(broadcast(tsAnchor(e)))
      .filter(col("ts") >= col("__max_ts") - expr("INTERVAL 14 DAYS"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").desc)
    val stale = inWindow.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") > 1).select(col("event_id"))
    e.join(stale, Seq("event_id"), "left_anti")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
  }

  /** Per-group z-score outlier detection over `value` — the data-quality
    * gate of an ingest pipeline, engine-portable WITHOUT integer-unit
    * output tricks: values quantize to exact centi-unit integers whose
    * count/sum/sum-of-squares stay below 2^53, so every float the mean/
    * std/threshold computation touches is derived from exactly-converted
    * integers by identical IEEE operations on both engines. One aggregation
    * pass plus one broadcast join of the (tiny) per-group stats. */
  def eventsOutliers(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
      .select(col("event_type"), floor(col("value") * lit(100.0)).cast("long").as("xc"))
    val stats = e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("xc")).as("s"), sum(col("xc") * col("xc")).as("sq"))
      .withColumn("mean_c", col("s").cast("double") / col("n").cast("double"))
      .withColumn("std_c", sqrt(col("sq").cast("double") / col("n").cast("double")
        - col("mean_c") * col("mean_c")))
    e.join(broadcast(stats), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(first(col("n")).as("n"),
        first(col("mean_c")).as("mean_c"), first(col("std_c")).as("std_c"),
        sum(when(abs(col("xc").cast("double") - col("mean_c")) >
          lit(2.0) * col("std_c"), 1L).otherwise(0L)).as("n_outliers"))
  }

  /** Exact per-group median of `value` — the quantile operator, portable
    * by construction: rank over centi-unit integers, pick the middle one
    * (odd n) or the exact two-int average (even n) — no float interpolation
    * whose arithmetic could differ between engines. One window shuffle on
    * the group; at 100 TB the same semantics come from approx_percentile
    * with this entry as the exactness target. */
  def eventsMedian(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
      .select(col("event_type"), floor(col("value") * lit(100.0)).cast("long").as("xc"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("xc").asc)
    e.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .filter(col("rn") === expr("(n + 1) div 2") || col("rn") === expr("n div 2 + 1"))
      .groupBy(col("event_type"))
      .agg(first(col("n")).as("n"),
        (sum(col("xc")).cast("double") / count(lit(1)).cast("double")).as("median_c"))
  }

  /** Robust per-group anomaly detection: median absolute deviation (MAD)
    * outliers — the robust twin of [[eventsOutliers]]' z-score (a handful
    * of extreme values inflate a stddev until they hide themselves; the
    * MAD threshold is immune). Everything stays EXACT integer arithmetic
    * via the [[eventsMedian]] two-middle-values discipline, doubled to
    * dodge halving: msum = the two middle cents values summed (2·median),
    * dev = |2·x − msum| (2·|x − median|), dsum = the two middle devs
    * summed (4·MAD), and the flag `2·dev > 3·dsum` is exactly
    * |x − median| > 3·MAD cross-multiplied — no float ever compared.
    *
    * Scale: ONE event_type hash shuffle establishes the partitioning; both
    * rank windows and the final rollup reuse it (the second window re-sorts
    * within partitions, no new exchange), and the two per-group stat
    * frames join back broadcast. At 100 TB the same semantics come from
    * approx quantiles with this entry as the exactness target. */
  def eventsAnomalyMad(spark: SparkSession, dir: String): DataFrame = {
    val e = Caching.scoped(Tables(spark, dir, "events")
      .select(col("event_type"), floor(col("value") * lit(100.0)).cast("long").as("xc")))
    val byType = Window.partitionBy(col("event_type"))
    def twoMiddleSum(df: DataFrame, v: String, out: String) = {
      val w = Window.partitionBy(col("event_type")).orderBy(col(v).asc)
      df.withColumn("__rn", row_number().over(w))
        .withColumn("__n", count(lit(1)).over(byType))
        .filter(col("__rn") === expr("(__n + 1) div 2") ||
          col("__rn") === expr("__n div 2 + 1"))
        .groupBy(col("event_type"))
        .agg(first(col("__n")).as("n"),
          // one middle row (odd n): 2·med; two rows (even n): m1+m2 —
          // either way exactly twice the median, in integers
          expr(s"(sum($v) * 2) div count(1)").as(out))
    }
    val med = twoMiddleSum(e, "xc", "msum")
    val dev = Caching.scoped(e.join(broadcast(med), Seq("event_type"))
      .select(col("event_type"), col("msum"),
        abs(col("xc") * lit(2L) - col("msum")).as("dv")))
    val mad = twoMiddleSum(dev, "dv", "dsum").drop("n")
    dev.join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        (first(col("msum")).cast("double") / lit(2.0)).as("median_c"),
        (first(col("dsum")).cast("double") / lit(4.0)).as("mad_c"),
        sum(when(col("dv") * lit(2L) > col("dsum") * lit(3L), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /** RFM customer segmentation — the recency/frequency/monetary quintile
    * chart every analytics product ships (the reference's Matomo schema
    * models exactly these visitor/conversion rollups). Per user: recency =
    * last active day, frequency = event count, monetary = purchase cents;
    * each metric is quintile-ranked (1–5, 5 best) and users land in the
    * classic named segments (champions / loyal / at-risk / hibernating /
    * regular). Quintile cuts come from broadcast
    * [[graft.operators.ExactQuantile]] boundary rows replicating ntile(5)
    * exactly — never an unpartitioned window.
    *
    * Scale: one user_id shuffle builds the per-user RFM table (rows =
    * |users|, already corpus-reduced); the three quantile probes run on
    * that reduced table; the final rollup groups ≤125 quintile cells. */
  def eventsRfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val rfm = Caching.scoped(Tables(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .groupBy(col("user_id"))
      .agg(max(datediff(to_date(col("ts")), lit("1970-01-01"))).cast("long")
          .as("last_day"),
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase",
          floor(col("value") * lit(100.0)).cast("long")).otherwise(0L))
          .as("monetary_c")))
    val n = rfm.count()
    def quintile(valueCol: String): Column = {
      val bounds = graft.operators.ExactQuantile.rankRows(
        rfm, valueCol, "user_id",
        graft.operators.ExactQuantile.ntileBoundaryRanks(n, 5))
      val v = col(valueCol).cast("double")
      bounds.foldLeft(lit(1)) { case (acc, (bv, bt)) =>
        acc + when(v > bv || (v === bv && col("user_id") > bt), 1).otherwise(0)
      }
    }
    val seg = when(col("r_q") >= 4 && col("f_q") >= 4 && col("m_q") >= 4, "champions")
      .when(col("f_q") >= 4 && col("m_q") >= 3, "loyal")
      .when(col("r_q") <= 2 && col("f_q") >= 3, "at_risk")
      .when(col("r_q") <= 2 && col("f_q") <= 2, "hibernating")
      .otherwise("regular")
    rfm.withColumn("r_q", quintile("last_day"))
      .withColumn("f_q", quintile("n_events"))
      .withColumn("m_q", quintile("monetary_c"))
      .withColumn("segment", seg)
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_users"), sum(col("monetary_c")).as("monetary_c"),
        min(col("r_q") * lit(100) + col("f_q") * lit(10) + col("m_q"))
          .cast("long").as("min_rfm_cell"))
  }

  /** Per-group fixed-width histogram of `value` (50-unit bins, capped at
    * bin 9) — pure integer bucketing, one aggregation. */
  def eventsHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(col("event_type"),
        least(floor(col("value") / lit(50.0)).cast("long"), lit(9L)).as("bin"))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("cnt"))

  /** Ordered funnel over the event stream: users reaching view → click →
    * purchase, each stage strictly after the previous one's first entry
    * ([[graft.operators.Funnel]]). Pure min aggregates and integer counts —
    * exactly replayable. */
  def funnelSteps(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.steps(Tables(spark, dir, "events"),
      "user_id", "event_type", "ts", Seq("view", "click", "purchase"))

  /** Histogram-sketch quantiles per event type — the scale path for
    * percentiles (exact median is [[eventsMedian]]'s job): bucket `value`
    * into centi-unit-exact 5-unit bins, then read p50/p90/p99 as the first
    * bin whose cumulative count crosses the rank threshold. The crossing
    * test is pure integer arithmetic (2·cum ≥ n, 10·cum ≥ 9n, 100·cum ≥
    * 99n) — no float ranks, so the sketch replays bit-identically in any
    * engine while shuffling only (type, bin) pairs, never rows. */
  def eventsQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val binned = Tables(spark, dir, "events")
      .select(col("event_type"),
        floor(floor(col("value") * lit(100.0)).cast("long") / lit(500L))
          .cast("long").as("bin"))
      .groupBy(col("event_type"), col("bin")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("bin").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col("event_type"))
    val cum = binned.withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(tot))
    cum.groupBy(col("event_type"))
      .agg(first(col("n")).as("n"),
        min(when(col("cum") * 2 >= col("n"), col("bin"))).as("p50_bin"),
        min(when(col("cum") * 10 >= col("n") * 9, col("bin"))).as("p90_bin"),
        min(when(col("cum") * 100 >= col("n") * 99, col("bin"))).as("p99_bin"))
  }

  /** Training-sequence builder: each user's events in (ts, event_id) order
    * reduced to a bounded event-type sequence + portable content hash — the
    * "visit history → model input" step of a behavioral pipeline. One
    * groupBy; the in-group order is recovered by sorting the collected
    * structs (total order: event_id is unique), never by assuming shuffle
    * order. */
  def eventSequences(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("ts"), col("event_id"),
        col("event_type")))).as("evs"))
      .select(col("user_id"),
        size(col("evs")).cast("long").as("n_events"),
        expr("transform(slice(evs, 1, 32), e -> e.event_type)").as("__seq"))
      .select(col("user_id"), col("n_events"),
        size(col("__seq")).cast("long").as("seq_len"),
        md5(concat_ws("|", col("__seq"))).as("seq_hash"))

  /** A5 — per-day histogram (reference: _settings.py:146-162). */
  def a5DayHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))

  /** A4+SRT2 — checkpoint-head lookup: the max-version row (reference:
    * matomo2clickhouse.py:786-812). */
  def a4CheckpointHead(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val head = e.agg(max(col("event_id")).as("event_id"))
    e.join(broadcast(head), Seq("event_id"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
  }

  /**
   * SRT1/A7 — bounded retention watermark: the largest id among the oldest
   * ≤10001 rows that is older than 21 days before the data head (reference:
   * _settings.py:177-188 — the LIMIT-10001-guarded watermark probe).
   * Spark plans the sort+limit as TakeOrderedAndProject (top-k, no full sort).
   */
  def srt1RetentionWatermark(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val oldest = e.select(col("event_id"), col("ts"))
      .orderBy(col("event_id").asc).limit(10001)
    oldest.crossJoin(broadcast(tsAnchor(e)))
      .filter(col("ts") < col("__max_ts") - expr("INTERVAL 21 DAYS"))
      .agg(max(col("event_id")).as("id_max"))
  }

  /** SET1+A7 — union of per-table min/max probes (reference: _settings.py:165-169). */
  def set1UnionProbe(spark: SparkSession, dir: String): DataFrame = {
    def probe(name: String, tcol: String): DataFrame =
      Tables(spark, dir, name)
        .agg(min(col(tcol)).as("min_ts"), max(col(tcol)).as("max_ts"))
        .select(lit(name).as("tbl"), col("min_ts"), col("max_ts"))
    probe("events", "ts")
      .unionByName(probe("orders", "o_orderdate"))
      .unionByName(probe("lineitem", "l_shipdate"))
  }

  /**
   * F7 — old-DELETE suppression over the event log: drop "delete" events
   * (played by event_type='error') whose row date is >14 days older than the
   * data head (reference: matomo2clickhouse.py:583-606; threshold
   * parametrized — the reference ships 31 days).
   */
  def f7DeleteSuppression(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    e.crossJoin(broadcast(tsAnchor(e)))
      .filter(!(col("event_type") === "error" &&
        datediff(to_date(col("__max_ts")), to_date(col("ts"))) > 14))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
  }

  /**
   * Q1-Q11 — scalar-function surface in one projection (reference:
   * SURVEY.md §2.8): date truncation (Q2), toYYYYMM partition key (Q3),
   * hex (Q6), regex replace (Q9), timestamp format (Q10), day diff (Q11),
   * JSON prop extraction (events.props, per SURVEY.md §2.8 extended note).
   */
  def qScalarFuncs(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    e.select(
      col("event_id"),
      to_date(col("ts")).as("day"),
      date_format(col("ts"), "yyyyMM").as("yyyymm"),
      hex(col("event_id")).as("id_hex"),
      regexp_replace(col("props"), "[0-9]+", "#").as("props_masked"),
      get_json_object(col("props"), "$.k").as("prop_k"),
      datediff(to_date(col("ts")), lit("2024-01-01").cast("date")).cast("long").as("days_since_epoch"),
      upper(col("event_type")).as("type_upper"),
      concat_ws("-", col("event_type"), col("user_id")).as("type_user"),
      // Q7 set→CSV (reference: binlog2sql_util.py:182-183 ','.join(set))
      array_join(array(col("event_type"), col("user_id").cast("string")), ",").as("set_csv"),
      // Q10 timestamp parse round-trip (reference: strptime/strftime,
      // matomo2clickhouse.py:241-253)
      to_timestamp(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"), "yyyy-MM-dd HH:mm:ss")
        .cast("timestamp_ntz").as("parsed_ts"))
  }

  /** A5 as a tumbling event-time window (the batch twin of
    * StreamAggs.windowedCounts — same expression, no watermark needed). */
  def tumblingWindowCounts(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("event_type"), col("cnt"))

  /** Gap-based session windows in batch (twin of StreamAggs.sessionCounts);
    * the oracle is the classic gaps-and-islands SQL formulation — a genuine
    * cross-check of session semantics, not a restatement. */
  /**
   * Cohort-retention matrix — the classic web-analytics rollup of the
   * reference's domain (it replicates matomo's per-visit log_visit table,
   * reference: _settings.py:95-99, and documents exactly this per-day
   * visit-count rollup shape over visit_first_action_time,
   * _settings.py:146-150): users cohorted by first-activity week, then for
   * every (cohort, week-offset) the distinct users still active, with the
   * retention share against the cohort size.
   *
   * Scale: one shuffle on user_id (first-week aggregation), a co-partitioned
   * join back (same key — no second corpus shuffle under AQE), then the
   * distinct + rollup on (cohort, offset), whose cardinality is
   * weeks² — tiny. The retention double is the same two-cast division in
   * both engines. Offsets are exact: both weeks are week-truncated dates,
   * so the day difference is always a multiple of 7. */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("wk"))
    val firsts = Caching.scoped(ev.groupBy(col("user_id"))
      .agg(min(col("wk")).as("cohort")))
    val sizes = firsts.groupBy(col("cohort"))
      .agg(count(lit(1)).as("cohort_size"))
    ev.join(firsts, Seq("user_id"))
      .select(col("cohort"),
        (datediff(col("wk"), col("cohort")) / 7).cast("int").as("week_offset"),
        col("user_id"))
      .distinct()
      .groupBy(col("cohort"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .join(sizes, Seq("cohort"))
      .withColumn("retention",
        col("n_users").cast("double") / col("cohort_size").cast("double"))
  }

  /**
   * DAU/WAU report — daily active users and the trailing-7-day active
   * users per day, the other staple rollup over the reference's replicated
   * visit log (reference: _settings.py:95-99,146-150), plus the
   * stickiness share dau/wau.
   *
   * Scale: the trailing-week distinct is NOT a range join (which would
   * nested-loop) — each (day, user) activity row is exploded to the seven
   * target days it supports, then deduped and counted: linear ×7 row
   * amplification, all equi-keyed shuffles. Output covers days with
   * activity (the dau join filters padding targets past the data's edge).
   */
  def dauWau(spark: SparkSession, dir: String): DataFrame = {
    val du = Caching.scoped(Tables(spark, dir, "events")
      .select(to_date(col("ts")).as("d"), col("user_id")).distinct())
    val dau = du.groupBy(col("d")).agg(count(lit(1)).as("dau"))
    val wau = du
      .select(explode(expr("sequence(d, d + INTERVAL 6 DAYS)")).as("d"),
        col("user_id"))
      .distinct()
      .groupBy(col("d")).agg(count(lit(1)).as("wau"))
    dau.join(wau, Seq("d"))
      .withColumn("stickiness",
        col("dau").cast("double") / col("wau").cast("double"))
  }

  /**
   * Exponentially-weighted daily trend — the smoothed activity curve every
   * analytics dashboard draws over the raw daily counts (and the
   * forecasting baseline: tomorrow ≈ today's EWMA). α = 1/2 spelled in
   * EXACT integers via the closed form: the smoothed numerator at day t is
   * Σ_k y_{t−k}·2^(30−k) over the last 30 days and the denominator is the
   * same sum with y ≡ 1 over the days that exist — halving weights are
   * powers of two, so both sums are exact BIGINTs and `ewma` is one IEEE
   * division. `rising` compares today's count against yesterday-anchored
   * smoothing exactly (cross-multiplied, never a float threshold).
   *
   * Scale: the [[dauWau]] explode discipline — each day's 1-row count
   * explodes to its ≤30 target days (30 rows per DAY, not per event) and
   * one equi-shuffle on the target day aggregates; never a range join,
   * never a window over the event log. */
  def eventsEwmaDaily(spark: SparkSession, dir: String): DataFrame = {
    val daily = Caching.scoped(Tables(spark, dir, "events")
      .select(to_date(col("ts")).as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("y")))
    val sm = daily
      .select(col("d").as("src"), col("y"),
        explode(expr("sequence(0, 29)")).as("k"))
      .select(expr("date_add(src, k)").as("d"),
        (col("y") * expr("shiftleft(CAST(1 AS BIGINT), 30 - k)")).as("wy"),
        expr("shiftleft(CAST(1 AS BIGINT), 30 - k)").as("w"))
      .groupBy(col("d"))
      .agg(sum(col("wy")).as("num"), sum(col("w")).as("den"))
    daily.join(sm, Seq("d"))
      .select(col("d"), col("y"),
        (col("num").cast("double") / col("den").cast("double")).as("ewma"),
        (col("y") * col("den") > col("num")).as("rising"))
  }

  /**
   * Per-day bounce rate over 30-minute inactivity sessions — the staple
   * engagement metric over the reference's replicated action log
   * (log_link_visit_action, one row per visitor action, reference:
   * _settings.py:97,111-113): a session is a bounce when it contains
   * exactly one event; the day is the session's start day.
   *
   * Scale: gaps-and-islands sessionization is one window shuffle on
   * user_id (lag + running sum), then a (user, sid) rollup and a tiny
   * per-day aggregate. The rate double is the same two-cast division in
   * both engines. */
  def bounceRate(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events").select(col("user_id"), col("ts"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc)
    val sessions = e
      .withColumn("__new", when(lag(col("ts"), 1).over(w).isNull ||
        col("ts") >= lag(col("ts"), 1).over(w) + expr("INTERVAL 30 MINUTES"),
        1L).otherwise(0L))
      .withColumn("__sid", sum(col("__new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("__sid"))
      .agg(to_date(min(col("ts"))).as("d"), count(lit(1)).as("n_events"))
    sessions.groupBy(col("d"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounces"))
      .withColumn("bounce_rate",
        col("n_bounces").cast("double") / col("n_sessions").cast("double"))
  }

  /**
   * Event-type transition matrix — the Markov "users flow" report
   * (Matomo's visitor-flow face): for each (from, to) pair of consecutive
   * event types within a user's timeline, the transition count and the
   * row-normalized probability. One lead() window keyed on user_id (a
   * single shuffle); the per-from normalization runs over the tiny
   * (|types|²-row) count table, never the event log. Integer counts, one
   * final double division — engine-portable.
   */
  def markovTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val trans = Tables(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val wf = Window.partitionBy(col("from_type"))
    trans.withColumn("p",
      col("n").cast("double") / sum(col("n")).over(wf).cast("double"))
  }

  /**
   * Multi-touch revenue attribution — the Matomo/GA conversion-attribution
   * report (the reference's analytics DB models exactly these visit-action
   * conversions; reference: matomo2clickhouse.py's matomo_log_conversion
   * mirroring): every purchase's revenue credited to the toucher that
   * "caused" it under the two classic models at once — FIRST touch (the
   * earliest preceding view/click anywhere in the user's history) and LAST
   * touch (the latest preceding one). A purchase with no preceding touch
   * is credited to the 'direct' channel. One row per (model, channel) with
   * purchase counts and revenue in exact integer cents (the established
   * floor(value·100) spelling — no float sum ordering anywhere).
   *
   * Scale: ONE user_id-keyed window shuffle over the event log computes
   * both touch channels per purchase (first/last with ignoreNulls over the
   * strictly-preceding frame); the model unpivot is a 2-element array
   * explode on already-tiny purchase rows; the final rollup groups a
   * handful of (model, channel) keys. Never a self-join of the event log,
   * never an unpartitioned window.
   */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type").isin("view", "click"), col("event_type"))
    Tables(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        col("value"))
      .withColumn("first_ch", first(touch, ignoreNulls = true).over(w))
      .withColumn("last_ch", last(touch, ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(
        floor(col("value") * lit(100.0)).cast("long").as("cents"),
        explode(array(
          struct(lit("first_touch").as("model"),
            coalesce(col("first_ch"), lit("direct")).as("channel")),
          struct(lit("last_touch").as("model"),
            coalesce(col("last_ch"), lit("direct")).as("channel")))).as("mc"))
      .groupBy(col("mc.model").as("model"), col("mc.channel").as("channel"))
      .agg(count(lit(1)).as("purchases"), sum(col("cents")).as("revenue_cents"))
  }

  /**
   * WINDOW-BOUNDED funnel conversion — the funnel variant every analytics
   * product actually reports (Matomo/GA-style): a step only converts if
   * it happens within the conversion window after the previous step's
   * first entry (here: first click within 7 days of the first view, first
   * purchase within 7 days of that click). One row with per-step user
   * counts and conversion shares. Distinct from [[funnelSteps]], the
   * unbounded ordered funnel: the deadline changes who converts, not just
   * the report's shape.
   *
   * Scale: three aggregations all keyed on user_id — the first groupBy
   * establishes the hash partitioning and the two step joins + their
   * rollups reuse it (co-partitioned, no re-shuffle); the final count is
   * a 1-row two-phase aggregate. Never a corpus-sized window function,
   * never a range join. The shares are the same two-cast division in
   * both engines.
   */
  def funnelConversion(spark: SparkSession, dir: String): DataFrame = {
    val ev = Caching.scoped(Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts")))
    def firstWithin(step: String, prev: DataFrame, prevTs: String, out: String) =
      ev.filter(col("event_type") === step)
        .join(prev, Seq("user_id"))
        .filter(col("ts") > col(prevTs) &&
          col("ts") <= col(prevTs) + expr("INTERVAL 7 DAYS"))
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as(out))
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = firstWithin("click", s1, "t1", "t2")
    val s3 = firstWithin("purchase", s2.select(col("user_id"), col("t2")), "t2", "t3")
    s1.join(s2, Seq("user_id"), "left_outer")
      .join(s3, Seq("user_id"), "left_outer")
      .agg(count(col("t1")).as("n_view"),
        count(col("t2")).as("n_view_click"),
        count(col("t3")).as("n_view_click_purchase"))
      .withColumn("click_rate",
        col("n_view_click").cast("double") / col("n_view").cast("double"))
      .withColumn("purchase_rate",
        col("n_view_click_purchase").cast("double") / col("n_view").cast("double"))
  }

  def sessionWindowCounts(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("user_id"), col("cnt"))

  /** As-of join: every event annotated with the user's most recent purchase
    * at or before the event's time (graft.operators.Asof; oracle is DuckDB's
    * native ASOF JOIN — a fully independent implementation of the
    * semantics). */
  def asofLastPurchase(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val purchases = Tables(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts").as("purchase_ts"))
      .agg(max(col("event_id")).as("purchase_id"))
      .select(col("user_id"), col("purchase_ts"), col("purchase_id"))
    graft.operators.Asof.asofJoin(e, purchases, Seq("user_id"),
      leftTime = "ts", rightTime = "purchase_ts",
      payloadCols = Seq("purchase_id", "purchase_ts"))
  }

  /** The same as-of semantics through the NATIVE plan node
    * ([[graft.plans.AsofJoin]] → AsofJoinExec, injected by GraftExtensions):
    * per-partition two-pointer merge instead of union + running window.
    * Shares `asof_last_purchase`'s oracle — DuckDB's ASOF JOIN pins both
    * formulations to the same rows. */
  def asofLastPurchaseNative(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val purchases = Tables(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts").as("purchase_ts"))
      .agg(max(col("event_id")).as("purchase_id"))
      .select(col("user_id"), col("purchase_ts"), col("purchase_id"))
    graft.operators.Asof.asofJoinNative(e, purchases, Seq("user_id"),
      leftTime = "ts", rightTime = "purchase_ts",
      payloadCols = Seq("purchase_id", "purchase_ts"))
  }

  /** Range join: probe events (1/97 sample) matched into ALL users'
    * gap-based session intervals by timestamp containment, counted per
    * probe (graft.operators.RangeJoin — bucketized equi-join; the oracle is
    * DuckDB's plain inequality join over the gaps-and-islands sessions, a
    * fully independent formulation). */
  def rangeJoinSessions(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val sessions = e
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(min(col("ts")).as("s_start"), max(col("ts")).as("s_end"))
      .select(col("user_id").as("s_user"), col("s_start"), col("s_end"))
    val probes = e.filter(pmod(col("event_id"), lit(97)) === 0)
      .select(col("event_id"), col("ts"))
    graft.operators.RangeJoin.pointInInterval(probes, sessions,
        tsCol = "ts", startCol = "s_start", endCol = "s_end")
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_sessions"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_outliers" -> eventsOutliers,
    "events_anomaly_mad" -> eventsAnomalyMad,
    "events_rfm_segments" -> eventsRfmSegments,
    "events_median" -> eventsMedian,
    "events_histogram" -> eventsHistogram,
    "events_quantiles" -> eventsQuantiles,
    "funnel_steps" -> funnelSteps,
    "event_sequences" -> eventSequences,
    "asof_last_purchase" -> asofLastPurchase,
    "asof_last_purchase_native" -> asofLastPurchaseNative,
    "range_join_sessions" -> rangeJoinSessions,
    "a5_tumbling_window" -> tumblingWindowCounts,
    "session_windows" -> sessionWindowCounts,
    "events_retention_cohorts" -> retentionCohorts,
    "events_funnel_conversion" -> funnelConversion,
    "events_dau_wau" -> dauWau,
    "events_ewma_daily" -> eventsEwmaDaily,
    "events_bounce_rate" -> bounceRate,
    "events_markov_transitions" -> markovTransitions,
    "events_attribution" -> attribution,
    "j1_latest_record" -> j1LatestRecord,
    "j2_dup_count" -> j2DupCount,
    "j3_dedup_purge" -> j3DedupPurge,
    "a5_day_histogram" -> a5DayHistogram,
    "a4_checkpoint_head" -> a4CheckpointHead,
    "srt1_retention_watermark" -> srt1RetentionWatermark,
    "set1_union_probe" -> set1UnionProbe,
    "f7_delete_suppression" -> f7DeleteSuppression,
    "q_scalar_funcs" -> qScalarFuncs
  )

  /** DuckDB oracles. Where the reference authored a GROUP-BY-max + self-join
    * (J1/J2), the oracle keeps that original formulation as the cross-check
    * against our window formulation. */
  val oracles: Map[String, String] = Map(
    "asof_last_purchase" ->
      """WITH p AS (
        |  SELECT user_id, ts AS purchase_ts, max(event_id) AS purchase_id
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
        |SELECT e.event_id, e.user_id, e.ts, e.event_type, p.purchase_id, p.purchase_ts
        |FROM events e ASOF LEFT JOIN p
        |  ON e.user_id = p.user_id AND e.ts >= p.purchase_ts""".stripMargin,
    "asof_last_purchase_native" ->
      """WITH p AS (
        |  SELECT user_id, ts AS purchase_ts, max(event_id) AS purchase_id
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
        |SELECT e.event_id, e.user_id, e.ts, e.event_type, p.purchase_id, p.purchase_ts
        |FROM events e ASOF LEFT JOIN p
        |  ON e.user_id = p.user_id AND e.ts >= p.purchase_ts""".stripMargin,
    "a5_tumbling_window" ->
      """SELECT time_bucket(INTERVAL 1 DAY, ts) AS window_start, event_type, count(*) AS cnt
        |FROM events GROUP BY 1, 2""".stripMargin,
    // each step's first-occurrence chain replayed as correlated MIN
    // subqueries; counts are exact integers, shares one division each
    "events_funnel_conversion" ->
      """WITH s1 AS (
        |  SELECT user_id, MIN(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, MIN(e.ts) AS t2
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1
        |    AND e.ts <= s1.t1 + INTERVAL 7 DAY GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, MIN(e.ts) AS t3
        |  FROM events e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        |    AND e.ts <= s2.t2 + INTERVAL 7 DAY GROUP BY 1),
        |c AS (
        |  SELECT CAST(COUNT(s1.t1) AS BIGINT) AS n_view,
        |    CAST(COUNT(s2.t2) AS BIGINT) AS n_view_click,
        |    CAST(COUNT(s3.t3) AS BIGINT) AS n_view_click_purchase
        |  FROM s1
        |  LEFT OUTER JOIN s2 ON s1.user_id = s2.user_id
        |  LEFT OUTER JOIN s3 ON s1.user_id = s3.user_id)
        |SELECT n_view, n_view_click, n_view_click_purchase,
        |  CAST(n_view_click AS DOUBLE) / CAST(n_view AS DOUBLE) AS click_rate,
        |  CAST(n_view_click_purchase AS DOUBLE) / CAST(n_view AS DOUBLE)
        |    AS purchase_rate
        |FROM c""".stripMargin,
    "events_markov_transitions" ->
      """WITH t AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts ASC, event_id ASC) AS to_type
        |  FROM events),
        |c AS (
        |  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  CAST(n AS DOUBLE)
        |    / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
        |FROM c""".stripMargin,
    // EWMA replay: same 30-lag power-of-two weights via the same
    // explode-to-target-days shape, same single division, same
    // cross-multiplied rising flag
    "events_ewma_daily" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |sm AS (
        |  SELECT daily.d + CAST(k AS INTEGER) AS d,
        |    CAST(sum(y * (CAST(1 AS BIGINT) << (30 - k))) AS BIGINT) AS num,
        |    CAST(sum(CAST(1 AS BIGINT) << (30 - k)) AS BIGINT) AS den
        |  FROM daily, UNNEST(range(0, 30)) AS t(k) GROUP BY 1)
        |SELECT daily.d, y,
        |  CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS ewma,
        |  y * den > num AS rising
        |FROM daily JOIN sm ON daily.d = sm.d""".stripMargin,
    // attribution replay: the same strictly-preceding ignore-nulls frame,
    // the same floor-cents revenue, the same 2-row model unpivot
    "events_attribution" ->
      """WITH t AS (
        |  SELECT event_type, value,
        |    first_value(CASE WHEN event_type IN ('view','click')
        |                  THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_ch,
        |    last_value(CASE WHEN event_type IN ('view','click')
        |                 THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_ch
        |  FROM events),
        |p AS (
        |  SELECT CAST(floor(value * 100.0) AS BIGINT) AS cents,
        |    coalesce(first_ch, 'direct') AS fc, coalesce(last_ch, 'direct') AS lc
        |  FROM t WHERE event_type = 'purchase'),
        |u AS (
        |  SELECT 'first_touch' AS model, fc AS channel, cents FROM p
        |  UNION ALL
        |  SELECT 'last_touch' AS model, lc AS channel, cents FROM p)
        |SELECT model, channel, count(*) AS purchases,
        |  CAST(sum(cents) AS BIGINT) AS revenue_cents
        |FROM u GROUP BY 1, 2""".stripMargin,
    // the session CTE mirrors session_windows' gaps-and-islands oracle;
    // a bounce is a 1-event session, attributed to its start day
    "events_bounce_rate" ->
      """WITH o AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |                        ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o),
        |g AS (
        |  SELECT user_id, sid, CAST(MIN(ts) AS DATE) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM s GROUP BY 1, 2)
        |SELECT d, CAST(COUNT(*) AS BIGINT) AS n_sessions,
        |  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
        |  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS bounce_rate
        |FROM g GROUP BY d""".stripMargin,
    // trailing-week actives via the same explode-to-target-days shape —
    // generate_series is end-inclusive like Spark's sequence
    "events_dau_wau" ->
      """WITH du AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
        |dau AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY 1),
        |wau AS (
        |  SELECT d, CAST(COUNT(*) AS BIGINT) AS wau FROM (
        |    SELECT DISTINCT CAST(unnest(generate_series(d, d + INTERVAL 6 DAY,
        |             INTERVAL 1 DAY)) AS DATE) AS d, user_id
        |    FROM du) GROUP BY 1)
        |SELECT dau.d AS d, dau.dau, wau.wau,
        |  CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE) AS stickiness
        |FROM dau JOIN wau ON dau.d = wau.d""".stripMargin,
    // week-truncation parity: both engines' date_trunc('week') starts
    // Monday; offsets divide exactly (both dates week-truncated)
    "events_retention_cohorts" ->
      """WITH e AS (
        |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
        |f AS (SELECT user_id, MIN(wk) AS cohort FROM e GROUP BY 1),
        |j AS (SELECT DISTINCT f.cohort,
        |        CAST(datediff('day', f.cohort, e.wk) / 7 AS INTEGER) AS week_offset,
        |        e.user_id
        |      FROM e JOIN f USING (user_id)),
        |s AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS cohort_size FROM f GROUP BY 1),
        |r AS (SELECT cohort, week_offset, CAST(COUNT(*) AS BIGINT) AS n_users
        |      FROM j GROUP BY 1, 2)
        |SELECT r.cohort, r.week_offset, r.n_users, s.cohort_size,
        |  CAST(r.n_users AS DOUBLE) / CAST(s.cohort_size AS DOUBLE) AS retention
        |FROM r JOIN s USING (cohort)""".stripMargin,
    "session_windows" ->
      """WITH o AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |                        ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o)
        |SELECT min(ts) AS session_start, max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  user_id, count(*) AS cnt
        |FROM s GROUP BY user_id, sid""".stripMargin,
    // plain inequality join over gaps-and-islands sessions — independent of
    // the repo's bucketized formulation
    "range_join_sessions" ->
      """WITH o AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |                        ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o),
        |iv AS (SELECT user_id, min(ts) AS s_start, max(ts) AS s_end
        |       FROM s GROUP BY user_id, sid),
        |p AS (SELECT event_id, ts FROM events WHERE event_id % 97 = 0)
        |SELECT p.event_id, count(*) AS n_sessions
        |FROM p JOIN iv ON p.ts >= iv.s_start AND p.ts <= iv.s_end
        |GROUP BY p.event_id""".stripMargin,
    // outlier replay: exact centi-unit integer moments (< 2^53, so every
    // int->double conversion is exact), identical IEEE mean/std/threshold
    "events_outliers" ->
      """WITH e AS (SELECT event_type,
        |    CAST(floor(value * CAST(100 AS DOUBLE)) AS BIGINT) AS xc FROM events),
        |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(xc) AS BIGINT) AS s, CAST(sum(xc * xc) AS BIGINT) AS sq
        |  FROM e GROUP BY 1),
        |m AS (SELECT event_type, n,
        |    CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_c,
        |    sqrt(CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)
        |      - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))) AS std_c
        |  FROM st)
        |SELECT e.event_type, m.n, m.mean_c, m.std_c,
        |  CAST(sum(CASE WHEN abs(CAST(e.xc AS DOUBLE) - m.mean_c)
        |    > CAST(2 AS DOUBLE) * m.std_c THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM e JOIN m USING (event_type)
        |GROUP BY 1, 2, 3, 4""".stripMargin,
    // median replay: same centi-unit ranks, same middle positions; the
    // value at a sorted position is tie-order independent
    // MAD replay: the same doubled two-middle-values integer discipline at
    // both median stages, the same cross-multiplied 3-MAD flag
    "events_anomaly_mad" ->
      """WITH e AS (SELECT event_type,
        |    CAST(floor(value * CAST(100 AS DOUBLE)) AS BIGINT) AS xc FROM events),
        |r1 AS (SELECT event_type, xc,
        |    row_number() OVER (PARTITION BY event_type ORDER BY xc ASC) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM e),
        |med AS (SELECT event_type, (sum(xc) * 2) // count(*) AS msum
        |  FROM r1 WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1 GROUP BY 1),
        |dev AS (SELECT e.event_type, med.msum, abs(e.xc * 2 - med.msum) AS dv
        |  FROM e JOIN med USING (event_type)),
        |r2 AS (SELECT event_type, dv,
        |    row_number() OVER (PARTITION BY event_type ORDER BY dv ASC) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM dev),
        |mad AS (SELECT event_type, (sum(dv) * 2) // count(*) AS dsum
        |  FROM r2 WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1 GROUP BY 1)
        |SELECT dev.event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(min(dev.msum) AS DOUBLE) / CAST(2 AS DOUBLE) AS median_c,
        |  CAST(min(mad.dsum) AS DOUBLE) / CAST(4 AS DOUBLE) AS mad_c,
        |  CAST(sum(CASE WHEN dev.dv * 2 > mad.dsum * 3 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers
        |FROM dev JOIN mad USING (event_type) GROUP BY 1""".stripMargin,
    // RFM replay: same per-user rollup, ntile(5) per metric tie-broken on
    // user_id (the Spark side replicates ntile exactly via ExactQuantile
    // boundary rows), same segment CASE in the same order
    "events_rfm_segments" ->
      """WITH u AS (SELECT user_id,
        |    CAST(max(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)))
        |      AS BIGINT) AS last_day,
        |    count(*) AS n_events,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * CAST(100 AS DOUBLE)) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS monetary_c
        |  FROM events GROUP BY 1),
        |q AS (SELECT user_id, monetary_c,
        |    ntile(5) OVER (ORDER BY last_day ASC, user_id ASC) AS r_q,
        |    ntile(5) OVER (ORDER BY n_events ASC, user_id ASC) AS f_q,
        |    ntile(5) OVER (ORDER BY monetary_c ASC, user_id ASC) AS m_q
        |  FROM u),
        |s AS (SELECT *, CASE
        |    WHEN r_q >= 4 AND f_q >= 4 AND m_q >= 4 THEN 'champions'
        |    WHEN f_q >= 4 AND m_q >= 3 THEN 'loyal'
        |    WHEN r_q <= 2 AND f_q >= 3 THEN 'at_risk'
        |    WHEN r_q <= 2 AND f_q <= 2 THEN 'hibernating'
        |    ELSE 'regular' END AS segment
        |  FROM q)
        |SELECT segment, CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(monetary_c) AS BIGINT) AS monetary_c,
        |  CAST(min(r_q * 100 + f_q * 10 + m_q) AS BIGINT) AS min_rfm_cell
        |FROM s GROUP BY 1""".stripMargin,
    "events_median" ->
      """WITH e AS (SELECT event_type,
        |    CAST(floor(value * CAST(100 AS DOUBLE)) AS BIGINT) AS xc FROM events),
        |r AS (SELECT event_type, xc,
        |    row_number() OVER (PARTITION BY event_type ORDER BY xc ASC) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM e)
        |SELECT event_type, CAST(min(n) AS BIGINT) AS n,
        |  CAST(sum(xc) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS median_c
        |FROM r WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
        |GROUP BY 1""".stripMargin,
    // sequence replay: same (ts, event_id) total order, same 32-cap, same
    // '|'-joined md5
    "event_sequences" ->
      """WITH s AS (
        |  SELECT user_id, list(event_type ORDER BY ts, event_id) AS seq
        |  FROM events GROUP BY user_id)
        |SELECT user_id, CAST(len(seq) AS BIGINT) AS n_events,
        |  CAST(len(seq[1:32]) AS BIGINT) AS seq_len,
        |  md5(array_to_string(seq[1:32], '|')) AS seq_hash
        |FROM s""".stripMargin,
    "events_histogram" ->
      """SELECT event_type,
        |  least(CAST(floor(value / CAST(50 AS DOUBLE)) AS BIGINT), 9) AS bin,
        |  count(*) AS cnt
        |FROM events GROUP BY 1, 2""".stripMargin,
    // histogram-quantile replay: same centi-unit 5-unit bins, same integer
    // rank-crossing tests
    "events_quantiles" ->
      """WITH e AS (SELECT event_type,
        |    CAST(floor(CAST(floor(value * CAST(100 AS DOUBLE)) AS BIGINT)
        |      / CAST(500 AS DOUBLE)) AS BIGINT) AS bin FROM events),
        |b AS (SELECT event_type, bin, count(*) AS cnt FROM e GROUP BY 1, 2),
        |c AS (SELECT event_type, bin, cnt,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY bin ASC
        |                   ROWS UNBOUNDED PRECEDING) AS cum,
        |    sum(cnt) OVER (PARTITION BY event_type) AS n
        |  FROM b)
        |SELECT event_type, CAST(min(n) AS BIGINT) AS n,
        |  min(CASE WHEN cum * 2 >= n THEN bin END) AS p50_bin,
        |  min(CASE WHEN cum * 10 >= n * 9 THEN bin END) AS p90_bin,
        |  min(CASE WHEN cum * 100 >= n * 99 THEN bin END) AS p99_bin
        |FROM c GROUP BY 1""".stripMargin,
    // funnel replay: per-user earliest-entry chain with strict-after joins
    "funnel_steps" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |            WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT s1.user_id, s1.t1, min(e.ts) AS t2
        |       FROM s1 LEFT JOIN events e
        |         ON e.user_id = s1.user_id AND e.event_type = 'click' AND e.ts > s1.t1
        |       GROUP BY s1.user_id, s1.t1),
        |s3 AS (SELECT s2.user_id, min(e.ts) AS t3
        |       FROM s2 LEFT JOIN events e
        |         ON e.user_id = s2.user_id AND e.event_type = 'purchase' AND e.ts > s2.t2
        |       GROUP BY s2.user_id)
        |SELECT 1 AS step, 'view' AS stage,
        |  (SELECT count(t1) FROM s1) AS n_users
        |UNION ALL SELECT 2, 'click', (SELECT count(t2) FROM s2)
        |UNION ALL SELECT 3, 'purchase', (SELECT count(t3) FROM s3)""".stripMargin,
    "j1_latest_record" ->
      """SELECT e.user_id, e.event_id, e.ts, e.event_type, e.value
        |FROM events e
        |JOIN (SELECT user_id, max(event_id) AS event_id FROM events GROUP BY user_id) m
        |  ON e.user_id = m.user_id AND e.event_id = m.event_id""".stripMargin,
    "j2_dup_count" ->
      """SELECT user_id, count(*) AS versions, max(event_id) AS max_event_id
        |FROM events
        |WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 14 DAY
        |GROUP BY user_id HAVING count(*) > 1""".stripMargin,
    "j3_dedup_purge" ->
      """WITH win AS (
        |  SELECT event_id, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 14 DAY)
        |SELECT e.event_id, e.user_id, e.ts, e.event_type FROM events e
        |WHERE e.event_id NOT IN (SELECT event_id FROM win WHERE rn > 1)""".stripMargin,
    "a5_day_histogram" ->
      "SELECT CAST(ts AS DATE) AS day, count(*) AS cnt FROM events GROUP BY 1",
    "a4_checkpoint_head" ->
      """SELECT event_id, user_id, ts, event_type FROM events
        |WHERE event_id = (SELECT max(event_id) FROM events)""".stripMargin,
    "srt1_retention_watermark" ->
      """SELECT max(event_id) AS id_max FROM (
        |  SELECT event_id, ts FROM events ORDER BY event_id ASC LIMIT 10001) t
        |WHERE ts < (SELECT max(ts) FROM events) - INTERVAL 21 DAY""".stripMargin,
    "set1_union_probe" ->
      """SELECT 'events' AS tbl, min(ts) AS min_ts, max(ts) AS max_ts FROM events
        |UNION ALL
        |SELECT 'orders', min(o_orderdate), max(o_orderdate) FROM orders
        |UNION ALL
        |SELECT 'lineitem', min(l_shipdate), max(l_shipdate) FROM lineitem""".stripMargin,
    "f7_delete_suppression" ->
      """SELECT event_id, user_id, ts, event_type FROM events
        |WHERE NOT (event_type = 'error' AND
        |  datediff('day', CAST(ts AS DATE), CAST((SELECT max(ts) FROM events) AS DATE)) > 14)""".stripMargin,
    "q_scalar_funcs" ->
      """SELECT event_id,
        |  CAST(ts AS DATE) AS day,
        |  strftime(ts, '%Y%m') AS yyyymm,
        |  to_hex(event_id) AS id_hex,
        |  regexp_replace(props, '[0-9]+', '#', 'g') AS props_masked,
        |  json_extract_string(props, '$.k') AS prop_k,
        |  datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS days_since_epoch,
        |  upper(event_type) AS type_upper,
        |  concat_ws('-', event_type, user_id) AS type_user,
        |  array_to_string([event_type, CAST(user_id AS VARCHAR)], ',') AS set_csv,
        |  strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS parsed_ts
        |FROM events""".stripMargin
  )
}
