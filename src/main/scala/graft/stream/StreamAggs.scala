package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.cdc.Cdc

/**
 * Event-time streaming aggregations and custom keyed state — the Structured
 * Streaming surface beyond the micro-batch apply (design points from the
 * build brief: watermarks + windowed aggs; mapGroupsWithState for custom
 * state). The reference's only windowed shape is the per-day histogram run
 * as a batch query (reference: _settings.py:146-162) and its running
 * counters live in driver variables (reference: matomo2clickhouse.py:616,
 * 598-601); both become first-class incremental operators here.
 *
 * Scale notes: windowed counts shuffle once on (window, key) with partial
 * aggregation map-side; the watermark bounds state size (windows older than
 * the watermark are finalized and evicted). The keyed counters hold O(keys)
 * state in the state store, not O(events).
 */
object StreamAggs {

  /** A5 as an incremental operator: watermarked tumbling-window counts per
    * key. In append mode a window is emitted exactly once, when the
    * watermark passes its end — late rows beyond `watermarkDelay` are
    * dropped (ST6 late-data policy as event-time semantics). */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
      windowDuration: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration), col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col(keyCol), col("cnt"))

  /** Stream–static enrichment: join the unbounded stream against a bounded
    * dimension (the reference enriches visits with site metadata the same
    * way — site registry joined to the visit stream), then windowed counts
    * per dimension attribute. The static side is broadcast: every
    * micro-batch probes the in-memory dim table, no stream-side shuffle for
    * the join and no state beyond the windowed aggregation. Rows with no
    * dimension match are kept with a null attribute (left join) — an
    * unknown key must surface, not silently drop. The dimension must be
    * UNIQUE per key (standard join contract): a history-keeping dim (SCD
    * rows) fans events out and inflates counts — reduce it to current rows
    * (e.g. `Cdc.latestWins`) before passing it here. */
  def enrichedWindowedCounts(events: DataFrame, dim: DataFrame,
      tsCol: String, keyCol: String, attrCol: String,
      windowDuration: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .join(broadcast(dim.select(col(keyCol), col(attrCol))), Seq(keyCol), "left")
      .groupBy(window(col(tsCol), windowDuration), col(attrCol))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col(attrCol), col("cnt"))

  /** Sessionization: gap-based session windows per key (the visit-session
    * shape of the reference's data model, as an event-time operator).
    * Sessions close when no event arrives within `gapDuration`; the
    * watermark finalizes and evicts them. */
  def sessionCounts(events: DataFrame, tsCol: String, keyCol: String,
      gapDuration: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gapDuration), col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col(keyCol), col("cnt"))

  /** Streaming exact dedup — the incremental member of the dedup family
    * (batch twin: `TextOps.exactDedup`): emit only the FIRST arrival of each
    * dedup key, with state bounded by the watermark. State evicts as event
    * time advances, so the store holds O(keys inside the watermark horizon),
    * not O(stream) — the property that makes streaming dedup viable at all
    * on an unbounded feed. A key re-appearing after the horizon is emitted
    * again (by contract: the horizon IS the dedup scope). */
  def dedupWithinWatermark(events: DataFrame, tsCol: String,
      keyCols: Seq[String], watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream–stream interval join — the attribution shape (impression ⋈
    * click within an event-time window): each left event pairs with right
    * events of the same key whose timestamp lies in
    * [left.ts, left.ts + maxDelay]. Both sides carry watermarks and the
    * join condition bounds event time in BOTH directions, so Spark can
    * evict join state as the watermarks advance — state is
    * O(rate · (watermarkDelay + maxDelay)), never unbounded. With
    * `joinType = "leftOuter"` an unmatched left event is emitted exactly
    * once, null-extended, after the watermark passes its match window —
    * the "impression that never converted" row a funnel needs.
    *
    * Right-side columns come back suffixed `_r` (the right key column is
    * dropped — it equals the left's). */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, maxDelay: String,
      watermarkDelay: String, joinType: String = "inner"): DataFrame = {
    val renamed = right.columns.foldLeft(right)(
      (d, c) => d.withColumnRenamed(c, c + "_r"))
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = renamed.withWatermark(rightTs + "_r", watermarkDelay)
    l.join(r,
      col(keyCol) === col(keyCol + "_r") &&
        col(rightTs + "_r") >= col(leftTs) &&
        col(rightTs + "_r") <= col(leftTs) + expr(s"INTERVAL $maxDelay"),
      joinType)
      .drop(keyCol + "_r")
  }

  /** A closed visit: emitted once, when the key's session times out. */
  final case class VisitSummary(user: String, events: Long,
      firstTs: java.sql.Timestamp, lastTs: java.sql.Timestamp)

  /** Internal keyed state of [[visitSummaries]] (public: encoders need an
    * accessible constructor for codegen). */
  final case class VisitState(events: Long, firstMs: Long, lastMs: Long)

  /**
   * flatMapGroupsWithState with an EVENT-TIME TIMEOUT: accumulate per-user
   * visit state and emit a single closed-visit summary when the watermark
   * passes lastEvent + gap — the "visit ended" semantics the reference
   * derives offline from visit_last_action_time, as a live operator. Output
   * appears ONLY at expiry (append mode), state is evicted on emit, so the
   * state store holds O(active visits).
   */
  def visitSummaries(events: DataFrame, tsCol: String, keyCol: String,
      gap: java.time.Duration, watermarkDelay: String)(
      implicit spark: SparkSession): Dataset[VisitSummary] = {
    import spark.implicits._
    val gapMs = gap.toMillis
    events
      .withWatermark(tsCol, watermarkDelay)
      .select(col(keyCol).cast("string"), col(tsCol))
      .as[(String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[VisitState, VisitSummary](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user, rows, state) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(VisitSummary(user, s.events,
              new java.sql.Timestamp(s.firstMs), new java.sql.Timestamp(s.lastMs)))
          } else {
            val ts = rows.map(_._2.getTime).toSeq
            val prev = state.getOption.getOrElse(VisitState(0L, Long.MaxValue, Long.MinValue))
            val next = VisitState(prev.events + ts.size,
              math.min(prev.firstMs, ts.min), math.max(prev.lastMs, ts.max))
            state.update(next)
            state.setTimeoutTimestamp(next.lastMs + gapMs)
            Iterator.empty
          }
      }
  }

  /** Per-table running totals (A6) carried in keyed state. */
  final case class TableCounters(table: String, rows: Long, maxVersion: Long)

  /** A6 via mapGroupsWithState: per-table applied-row counters + high-water
    * version, accumulated across micro-batches in the state store (the
    * reference keeps these in single-process driver variables). Update-mode
    * output: one refreshed counter row per table per batch. */
  def runningCounters(events: DataFrame)(
      implicit spark: SparkSession): Dataset[TableCounters] = {
    import spark.implicits._
    val keyed = events
      .select(col("table"), Cdc.versionExpr.as("v"))
      .as[(String, Long)]
      .groupByKey(_._1)
    keyed.mapGroupsWithState[TableCounters, TableCounters] {
      (table: String, rows: Iterator[(String, Long)], state: GroupState[TableCounters]) =>
        val prev = state.getOption.getOrElse(TableCounters(table, 0L, Long.MinValue))
        var n = prev.rows
        var maxV = prev.maxVersion
        rows.foreach { case (_, v) => n += 1; if (v > maxV) maxV = v }
        val next = TableCounters(table, n, maxV)
        state.update(next)
        next
    }
  }
}
