package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.Cdc
import graft.model.Schemas

/**
 * CORRECTNESS entries for the CDC apply core itself — the port of the
 * reference's "compiler" (reference: binlog2sql_util.py:261-351) and apply
 * loop (reference: matomo2clickhouse.py:648-653).
 *
 * A deterministic change log is derived from the `events` table: op from
 * `event_id % 10` (0-5 INSERT, 6-8 UPDATE, 9 DELETE), version = event_id,
 * business key = user_id. The DuckDB oracle replays the same log with pure
 * SQL over the same derivation, so the whole apply path — op routing (F4),
 * version-aware deletes, batch-insert materialization, latest-wins (J1) —
 * is pinned end-to-end by rows+schema+hash.
 *
 * Scale notes: the apply is one shuffle on the key (window reduction) plus
 * one shuffled join against state/history — no collect, no cartesian; at
 * 100 TB the state side is partition-pruned (see graft.cdc.PartitionedState).
 */
object CdcWorkload {

  /** The derived change log: op, dateid(=event_id), before, after. */
  private def changeLog(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val op = when(pmod(col("event_id"), lit(10)) <= 5, "INSERT")
      .when(pmod(col("event_id"), lit(10)) <= 8, "UPDATE")
      .otherwise("DELETE")
    e.select(op.as("op"), col("event_id").as(Schemas.VersionCol),
      col("ts"), col("user_id"), col("value"), col("event_type"))
      .select(col("op"), col(Schemas.VersionCol),
        when(col("op") =!= "INSERT", struct(
          col("user_id"), col("ts"),
          (col("value") - lit(1.0)).as("value"),   // value always changes in UPDATEs
          col("event_type"))).as("before"),        // event_type never changes
        when(col("op") =!= "DELETE", struct(
          col("user_id"), col("ts"), col("value"), col("event_type"))).as("after"))
  }

  private val changeLogSql =
    """log AS (
      |  SELECT event_id, user_id, ts, value, event_type,
      |    CASE WHEN event_id % 10 <= 5 THEN 'INSERT'
      |         WHEN event_id % 10 <= 8 THEN 'UPDATE'
      |         ELSE 'DELETE' END AS op
      |  FROM events)""".stripMargin

  /**
   * S6/J4/J5/ST7 — applyVersioned over an empty history: appends survive a
   * key's max same-batch DELETE only if their version is greater (the
   * INS-UPD rewrite + sequential-delete contract).
   */
  def cdcApplyVersioned(spark: SparkSession, dir: String): DataFrame = {
    val ch = changeLog(spark, dir)
    val emptyHistory = ch.filter(lit(false))
      .select(col("after.*"), col(Schemas.VersionCol))
    Cdc.applyVersioned(emptyHistory, ch, Seq("user_id"))
  }

  /** J1 over the versioned apply — the reference's own latest-record view
    * (reference: script_create_clickhouse_table.sql:484-494). */
  def cdcLatestWins(spark: SparkSession, dir: String): DataFrame =
    Cdc.latestWins(cdcApplyVersioned(spark, dir), Seq("user_id"))

  /**
   * J5/F8/F13 — applyMutable against a synthetic initial state (every third
   * user pre-seeded): last-event-wins routing with batch-INSERT
   * materialization and changed-column elision.
   */
  def cdcApplyMutable(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val state0 = e.select(col("user_id")).distinct()
      .filter(pmod(col("user_id"), lit(3)) === 0)
      .select(col("user_id"),
        (lit(1000.0) + col("user_id")).as("value"),
        lit("init").as("event_type"))
    val ch = changeLog(spark, dir)
      // mutable payload has no ts column: project the images down
      .select(col("op"), col(Schemas.VersionCol),
        when(col("before").isNotNull, struct(
          col("before.user_id"), col("before.value"), col("before.event_type"))).as("before"),
        when(col("after").isNotNull, struct(
          col("after.user_id"), col("after.value"), col("after.event_type"))).as("after"))
    Cdc.applyMutable(state0, ch, Seq("user_id"))
  }

  /** S8/A4 — the checkpoint-ledger row for a batch (deterministic columns;
    * created_at is wall clock and excluded). Envelope coordinates derived
    * from event_id; the oracle recomputes the composite version arithmetic. */
  def cdcLedgerEntry(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val env = e.select(
      lit("INSERT").as("op"), lit("db").as("schema"), lit("events").as("table"),
      col("ts"),
      concat(lit("mysql-bin.00000"), (pmod(col("event_id"), lit(3)) + 1)).as("log_file"),
      col("event_id").as("log_pos"),
      lit(0).as("row_index"),
      lit(null).cast("string").as("before"), lit(null).cast("string").as("after"))
    Cdc.ledgerEntry(env).drop("created_at")
  }

  /**
   * The registry path end-to-end: an envelope whose payloads are JSON strings
   * shaped like the reference's hot table `matomo_log_visit`
   * (reference: script_create_clickhouse_table.sql:16-97) is parsed against
   * the schema registry (`Cdc.typedChanges`, F9), applied versioned (key
   * `idvisit`, version `dateid` from binlog coordinates) and reduced by the
   * reference's own latest-record view shape
   * (reference: script_create_clickhouse_table.sql:484-494). The oracle
   * replays the identical log in pure SQL, so the JSON-parse → typed apply →
   * view chain that production tables take is pinned rows+schema+hash.
   */
  def cdcApplyRegistry(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val op = when(pmod(col("event_id"), lit(10)) <= 5, "INSERT")
      .when(pmod(col("event_id"), lit(10)) <= 8, "UPDATE")
      .otherwise("DELETE")
    val afterJson = to_json(struct(
      col("user_id").as("idvisit"),
      pmod(col("event_id"), lit(5)).as("idsite"),
      concat(lit("v"), col("user_id")).as("idvisitor"),
      when(pmod(col("user_id"), lit(7)) =!= 0, concat(lit("u"), col("user_id")))
        .as("user_id"),
      pmod(col("event_id"), lit(100)).as("visit_total_actions"),
      pmod(col("event_id"), lit(1000)).as("visit_total_time")))
    val beforeJson = to_json(struct(col("user_id").as("idvisit")))
    val env = e.select(
      op.as("op"), lit("matomo").as("schema"), lit("matomo_log_visit").as("table"),
      col("ts"), lit("mysql-bin.000001").as("log_file"),
      col("event_id").as("log_pos"), lit(0).as("row_index"),
      when(op =!= "INSERT", beforeJson).as("before"),
      when(op =!= "DELETE", afterJson).as("after"))
    val typed = Cdc.typedChanges(env, "matomo_log_visit")
    val emptyHistory = typed.filter(lit(false))
      .select(col("after.*"), col(Schemas.VersionCol))
    Cdc.latestWins(Cdc.applyVersioned(emptyHistory, typed, Seq("idvisit")),
        Seq("idvisit"))
      .select(col("idvisit"), col("idsite"), col("idvisitor"), col("user_id"),
        col("visit_total_actions"), col("visit_total_time"), col(Schemas.VersionCol))
  }

  /**
   * The registry path on its SECOND hot table, `matomo_log_link_visit_action`
   * (reference: script_create_clickhouse_table.sql:99-154) — same
   * JSON-envelope → `Cdc.typedChanges` → versioned apply → latest-wins chain
   * as [[cdcApplyRegistry]], but against a different registry schema (key
   * `idlink_va`, nullable action/search columns, a required DateTime) so the
   * registry's per-table fan-out — schema lookup, typed projection, null
   * passthrough for absent JSON fields — is pinned on more than one shape.
   * `server_time` is second-truncated on both engines: the JSON envelope
   * round-trips millisecond precision, the parquet source carries
   * nanoseconds.
   */
  def cdcApplyRegistryAction(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val op = when(pmod(col("event_id"), lit(10)) <= 5, "INSERT")
      .when(pmod(col("event_id"), lit(10)) <= 8, "UPDATE")
      .otherwise("DELETE")
    val afterJson = to_json(struct(
      col("user_id").as("idlink_va"),
      pmod(col("event_id"), lit(5)).as("idsite"),
      concat(lit("v"), col("user_id")).as("idvisitor"),
      pmod(col("event_id"), lit(997)).as("idvisit"),
      when(pmod(col("user_id"), lit(5)) =!= 0, pmod(col("event_id"), lit(4096)))
        .as("idaction_url"),
      date_trunc("second", col("ts")).as("server_time"),
      when(pmod(col("user_id"), lit(3)) === 0,
        concat(lit("cat"), pmod(col("event_id"), lit(7)))).as("search_cat"),
      pmod(col("event_id"), lit(300)).as("time_spent")))
    val beforeJson = to_json(struct(col("user_id").as("idlink_va")))
    val env = e.select(
      op.as("op"), lit("matomo").as("schema"),
      lit("matomo_log_link_visit_action").as("table"),
      col("ts"), lit("mysql-bin.000001").as("log_file"),
      col("event_id").as("log_pos"), lit(0).as("row_index"),
      when(op =!= "INSERT", beforeJson).as("before"),
      when(op =!= "DELETE", afterJson).as("after"))
    val typed = Cdc.typedChanges(env, "matomo_log_link_visit_action")
    val emptyHistory = typed.filter(lit(false))
      .select(col("after.*"), col(Schemas.VersionCol))
    Cdc.latestWins(Cdc.applyVersioned(emptyHistory, typed, Seq("idlink_va")),
        Seq("idlink_va"))
      .select(col("idlink_va"), col("idsite"), col("idvisitor"), col("idvisit"),
        col("idaction_url"), col("server_time"), col("search_cat"),
        col("time_spent"), col(Schemas.VersionCol))
  }

  /**
   * The registry path through the MUTABLE apply branch: `matomo_goal`
   * (reference: script_create_clickhouse_table.sql:252-266) is a
   * NON-versioned registry table — update-in-place semantics, composite key
   * (idsite, idgoal) — so this entry pins the registry fan-out
   * (JSON parse → typed projection → [[Cdc.applyMutable]]) on the apply
   * branch [[cdcApplyRegistry]]/[[cdcApplyRegistryAction]] never touch.
   * The key is a bijection of user_id (idsite = user_id % 5,
   * idgoal = user_id / 5), state0 pre-seeds every third user, and each
   * UPDATE's before-image differs from its after-image ONLY in `name` — so
   * pure-update chains exercise changed-column elision (name moves, every
   * other column keeps the state's value) while INSERT-containing chains
   * materialize the last full after-image.
   *
   * The log is the deterministic quarter `event_id % 4 == 0` of the events
   * derivation: this entry pins the registry FAN-OUT on the mutable branch
   * (schema lookup, typed projection, elision through JSON images), while
   * full-volume mutable-apply throughput is already benched by
   * [[cdcApplyMutable]] — the two full to_json images per event would
   * otherwise make this the most expensive registry entry for no added
   * coverage.
   */
  def cdcApplyRegistryMutable(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
      .filter(pmod(col("event_id"), lit(4)) === 0)
    val op = when(pmod(col("event_id"), lit(10)) <= 5, "INSERT")
      .when(pmod(col("event_id"), lit(10)) <= 8, "UPDATE")
      .otherwise("DELETE")
    val idsite = pmod(col("user_id"), lit(5)).cast("int")
    val idgoal = (col("user_id") / lit(5)).cast("int")
    def image(name: org.apache.spark.sql.Column) = to_json(struct(
      idsite.as("idsite"), idgoal.as("idgoal"), name.as("name"),
      concat(lit("d"), col("user_id")).as("description"),
      lit("url").as("match_attribute"),
      concat(lit("p"), pmod(col("event_id"), lit(7))).as("pattern"),
      lit("contains").as("pattern_type"),
      pmod(col("event_id"), lit(2)).cast("tinyint").as("case_sensitive"),
      pmod(col("user_id"), lit(2)).cast("tinyint").as("allow_multiple"),
      pmod(col("event_id"), lit(100)).cast("string").as("revenue"),
      lit(0).cast("tinyint").as("deleted"),
      pmod(col("user_id"), lit(2)).cast("tinyint").as("event_value_as_revenue")))
    val env = e.select(
      op.as("op"), lit("matomo").as("schema"), lit("matomo_goal").as("table"),
      col("ts"), lit("mysql-bin.000001").as("log_file"),
      col("event_id").as("log_pos"), lit(0).as("row_index"),
      when(op =!= "INSERT", image(lit("old"))).as("before"),
      when(op =!= "DELETE", image(concat(lit("g"), col("event_id")))).as("after"))
    val typed = Cdc.typedChanges(env, "matomo_goal")
    val state0 = e.select(col("user_id")).distinct()
      .filter(pmod(col("user_id"), lit(3)) === 0)
      .select(idsite.as("idsite"), idgoal.as("idgoal"),
        lit("init").as("name"),
        concat(lit("d0u"), col("user_id")).as("description"),
        lit("event").as("match_attribute"), lit("initp").as("pattern"),
        lit("exact").as("pattern_type"),
        lit(0).cast("tinyint").as("case_sensitive"),
        lit(1).cast("tinyint").as("allow_multiple"),
        lit("1").as("revenue"), lit(0).cast("tinyint").as("deleted"),
        lit(1).cast("tinyint").as("event_value_as_revenue"))
    Cdc.applyMutable(state0, typed, Seq("idsite", "idgoal"))
  }

  /** Materialized-view maintenance: the per-event_type (count, Σvalue)
    * aggregate maintained purely from change deltas — never recomputed from
    * the table. Sums in exact integer micro-units so batching cannot drift. */
  def cdcIncrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    val empty = Tables(spark, dir, "events")
      .select(col("event_type")).filter(lit(false))
      .select(col("event_type"), lit(0L).as("cnt"), lit(0L).as("sum_micro"))
    Cdc.incrementalAgg(empty, changeLog(spark, dir), "event_type", "value")
  }

  /** S11 — the bounded retention delete as a whole-table operator: the
    * surviving rows after the SRT1-watermark purge
    * (reference: matomo2clickhouse.py:401-443). */
  def s11RetentionDelete(spark: SparkSession, dir: String): DataFrame =
    graft.maintain.Maintain.retentionDelete(
      Tables(spark, dir, "events"), "event_id", "ts", minAgeDays = 21)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))

  /** Replication-lag monitoring ([[Cdc.lagReport]]): pending ops beyond the
    * sink's applied head — here the head is pinned deterministically at 70%
    * of the log's max version, standing in for the ledger's 1-row lookup. */
  def cdcLagReport(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val op = when(pmod(col("event_id"), lit(10)) <= 5, "INSERT")
      .when(pmod(col("event_id"), lit(10)) <= 8, "UPDATE")
      .otherwise("DELETE")
    val log = e.select(op.as("op"), col("event_id").as(Schemas.VersionCol))
    // the applied head is ledger-sized metadata: a 1-row lookup, same shape
    // as the stream resume head (Cdc.resumeHead)
    val head = log.agg(max(col(Schemas.VersionCol))).head.getLong(0)
    Cdc.lagReport(log, head * 7 / 10)
  }

  /** Consistent cross-table cut ([[Cdc.consistentCut]]/[[Cdc.cutView]]):
    * two per-table logs (event_id parity) with different applied heads
    * (90% / 70% of the global max); the watermark is the min head, and each
    * table's view is latest-wins over versions ≤ watermark — the
    * transactionally consistent read the reference's single-threaded loop
    * provides implicitly at run boundaries. */
  def cdcConsistentCut(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val head = e.agg(max(col("event_id"))).head.getLong(0)
    val wm = Cdc.consistentCut(Map("evens" -> head * 9 / 10, "odds" -> head * 7 / 10))
    def cut(parity: Int, name: String) = Cdc.cutView(
        e.filter(pmod(col("event_id"), lit(2)) === parity)
          .select(col("user_id"), col("event_id").as(Schemas.VersionCol),
            col("event_type")),
        Seq("user_id"), wm)
      .agg(count(lit(1)).as("n_rows"),
        max(col(Schemas.VersionCol)).as("max_version"))
      .select(lit(name).as("tbl"), col("n_rows"), col("max_version"),
        lit(wm).as("watermark"))
    cut(0, "evens").unionByName(cut(1, "odds"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_consistent_cut" -> cdcConsistentCut,
    "cdc_lag_report" -> cdcLagReport,
    "cdc_apply_versioned" -> cdcApplyVersioned,
    "cdc_latest_wins" -> cdcLatestWins,
    "cdc_apply_mutable" -> cdcApplyMutable,
    "cdc_ledger_entry" -> cdcLedgerEntry,
    "cdc_apply_registry" -> cdcApplyRegistry,
    "cdc_apply_registry_action" -> cdcApplyRegistryAction,
    "cdc_apply_registry_mutable" -> cdcApplyRegistryMutable,
    "cdc_incremental_agg" -> cdcIncrementalAgg,
    "s11_retention_delete" -> s11RetentionDelete
  )

  val oracles: Map[String, String] = Map(
    // consistent-cut replay: watermark = min(90%, 70%) of the head; per
    // parity table, latest-wins over versions <= watermark reduces to one
    // row per user, so n_rows = distinct users and max_version = max id
    "cdc_consistent_cut" ->
      """WITH h AS (SELECT max(event_id) AS m FROM events),
        |wm AS (SELECT least(m * 9 // 10, m * 7 // 10) AS w FROM h),
        |a AS (SELECT count(DISTINCT user_id) AS n_rows, max(event_id) AS max_version
        |      FROM events, wm WHERE event_id % 2 = 0 AND event_id <= w),
        |b AS (SELECT count(DISTINCT user_id) AS n_rows, max(event_id) AS max_version
        |      FROM events, wm WHERE event_id % 2 = 1 AND event_id <= w)
        |SELECT 'evens' AS tbl, a.n_rows, a.max_version, wm.w AS watermark FROM a, wm
        |UNION ALL
        |SELECT 'odds', b.n_rows, b.max_version, wm.w FROM b, wm""".stripMargin,
    // lag replay: same op derivation, same integer 70%-of-head applied mark
    "cdc_lag_report" ->
      s"""WITH $changeLogSql,
        |a AS (SELECT max(event_id) * 7 // 10 AS applied FROM log)
        |SELECT op, count(*) AS n_pending,
        |  min(event_id) AS min_pending, max(event_id) AS max_pending,
        |  a.applied AS applied_head
        |FROM log, a WHERE event_id > a.applied
        |GROUP BY op, a.applied""".stripMargin,
    // a DELETE removes every version before it; appends after it survive
    "cdc_apply_versioned" ->
      s"""WITH $changeLogSql,
        |dels AS (SELECT user_id, max(event_id) AS del_v FROM log
        |         WHERE op = 'DELETE' GROUP BY user_id)
        |SELECT l.user_id, l.ts, l.value, l.event_type, l.event_id AS dateid
        |FROM log l LEFT JOIN dels d ON l.user_id = d.user_id
        |WHERE l.op <> 'DELETE' AND (d.del_v IS NULL OR l.event_id > d.del_v)""".stripMargin,
    // the reference's GROUP-BY-max + self-join latest-record formulation
    "cdc_latest_wins" ->
      s"""WITH $changeLogSql,
        |dels AS (SELECT user_id, max(event_id) AS del_v FROM log
        |         WHERE op = 'DELETE' GROUP BY user_id),
        |hist AS (
        |  SELECT l.user_id, l.ts, l.value, l.event_type, l.event_id AS dateid
        |  FROM log l LEFT JOIN dels d ON l.user_id = d.user_id
        |  WHERE l.op <> 'DELETE' AND (d.del_v IS NULL OR l.event_id > d.del_v))
        |SELECT h.user_id, h.ts, h.value, h.event_type, h.dateid
        |FROM hist h
        |JOIN (SELECT user_id, max(dateid) AS dateid FROM hist GROUP BY user_id) m
        |  ON h.user_id = m.user_id AND h.dateid = m.dateid""".stripMargin,
    // sequential per-key replay: last event decides; batch INSERT materializes;
    // updates move only columns an update changed (value yes, event_type no)
    "cdc_apply_mutable" ->
      s"""WITH $changeLogSql,
        |state0 AS (
        |  SELECT user_id, CAST(1000 AS DOUBLE) + user_id AS value, 'init' AS event_type
        |  FROM (SELECT DISTINCT user_id FROM events) u WHERE user_id % 3 = 0),
        |agg AS (
        |  SELECT user_id, max(event_id) AS last_v, bool_or(op = 'INSERT') AS had_insert
        |  FROM log GROUP BY user_id),
        |last AS (
        |  SELECT l.user_id, l.op, l.value, l.event_type, a.had_insert
        |  FROM log l JOIN agg a ON l.user_id = a.user_id AND l.event_id = a.last_v)
        |SELECT s.user_id, s.value, s.event_type
        |FROM state0 s LEFT JOIN last c ON s.user_id = c.user_id WHERE c.user_id IS NULL
        |UNION ALL
        |SELECT c.user_id, c.value, c.event_type FROM last c
        |WHERE c.op = 'INSERT' OR (c.op = 'UPDATE' AND c.had_insert)
        |UNION ALL
        |SELECT c.user_id, c.value, s.event_type
        |FROM last c JOIN state0 s ON c.user_id = s.user_id
        |WHERE c.op = 'UPDATE' AND NOT c.had_insert""".stripMargin,
    // composite version arithmetic: fileIdx*2^46 + log_pos*2^14 + row_index
    "cdc_ledger_entry" ->
      """WITH env AS (
        |  SELECT event_id AS log_pos, ts, (event_id % 3) + 1 AS fidx,
        |    'mysql-bin.00000' || CAST((event_id % 3) + 1 AS VARCHAR) AS log_file
        |  FROM events),
        |v AS (SELECT *, fidx * 70368744177664 + log_pos * 16384 AS version FROM env)
        |SELECT max(version) AS dateid, 'BATCH' AS sql_type, max(ts) AS log_time,
        |  arg_max(log_file, version) AS log_file,
        |  min(log_pos) AS log_pos_start, max(log_pos) AS log_pos_end,
        |  count(*) AS rows_applied
        |FROM v""".stripMargin,
    // same replay as cdc_latest_wins but with the matomo_log_visit column
    // reconstruction and the binlog-coordinate version arithmetic
    // (fileIdx=1: 2^46 + log_pos*2^14)
    "cdc_apply_registry" ->
      """WITH log AS (
        |  SELECT event_id, user_id,
        |    CASE WHEN event_id % 10 <= 5 THEN 'INSERT'
        |         WHEN event_id % 10 <= 8 THEN 'UPDATE'
        |         ELSE 'DELETE' END AS op,
        |    CAST(70368744177664 + CAST(event_id AS BIGINT) * 16384 AS BIGINT) AS dateid
        |  FROM events),
        |dels AS (SELECT user_id, max(dateid) AS del_v FROM log
        |         WHERE op = 'DELETE' GROUP BY user_id),
        |hist AS (
        |  SELECT l.user_id, l.event_id, l.dateid
        |  FROM log l LEFT JOIN dels d ON l.user_id = d.user_id
        |  WHERE l.op <> 'DELETE' AND (d.del_v IS NULL OR l.dateid > d.del_v))
        |SELECT CAST(h.user_id AS BIGINT) AS idvisit,
        |  CAST(h.event_id % 5 AS BIGINT) AS idsite,
        |  'v' || CAST(h.user_id AS VARCHAR) AS idvisitor,
        |  CASE WHEN h.user_id % 7 <> 0 THEN 'u' || CAST(h.user_id AS VARCHAR) END AS user_id,
        |  CAST(h.event_id % 100 AS BIGINT) AS visit_total_actions,
        |  CAST(h.event_id % 1000 AS BIGINT) AS visit_total_time,
        |  h.dateid AS dateid
        |FROM hist h
        |JOIN (SELECT user_id, max(dateid) AS m FROM hist GROUP BY user_id) t
        |  ON h.user_id = t.user_id AND h.dateid = t.m""".stripMargin,
    // the action-table replay: same dateid arithmetic and latest-wins-after-
    // delete shape as cdc_apply_registry, with the link_visit_action column
    // reconstruction (nullable idaction_url/search_cat, second-truncated
    // server_time matching the JSON envelope's millisecond round-trip)
    "cdc_apply_registry_action" ->
      """WITH log AS (
        |  SELECT event_id, user_id, ts,
        |    CASE WHEN event_id % 10 <= 5 THEN 'INSERT'
        |         WHEN event_id % 10 <= 8 THEN 'UPDATE'
        |         ELSE 'DELETE' END AS op,
        |    CAST(70368744177664 + CAST(event_id AS BIGINT) * 16384 AS BIGINT) AS dateid
        |  FROM events),
        |dels AS (SELECT user_id, max(dateid) AS del_v FROM log
        |         WHERE op = 'DELETE' GROUP BY user_id),
        |hist AS (
        |  SELECT l.user_id, l.event_id, l.ts, l.dateid
        |  FROM log l LEFT JOIN dels d ON l.user_id = d.user_id
        |  WHERE l.op <> 'DELETE' AND (d.del_v IS NULL OR l.dateid > d.del_v))
        |SELECT CAST(h.user_id AS BIGINT) AS idlink_va,
        |  CAST(h.event_id % 5 AS BIGINT) AS idsite,
        |  'v' || CAST(h.user_id AS VARCHAR) AS idvisitor,
        |  CAST(h.event_id % 997 AS BIGINT) AS idvisit,
        |  CASE WHEN h.user_id % 5 <> 0 THEN CAST(h.event_id % 4096 AS BIGINT) END
        |    AS idaction_url,
        |  date_trunc('second', h.ts) AS server_time,
        |  CASE WHEN h.user_id % 3 = 0 THEN 'cat' || CAST(h.event_id % 7 AS VARCHAR) END
        |    AS search_cat,
        |  CAST(h.event_id % 300 AS BIGINT) AS time_spent,
        |  h.dateid AS dateid
        |FROM hist h
        |JOIN (SELECT user_id, max(dateid) AS m FROM hist GROUP BY user_id) t
        |  ON h.user_id = t.user_id AND h.dateid = t.m""".stripMargin,
    // mutable registry replay (matomo_goal): per-user last event decides;
    // INSERT-containing chains materialize the last full after-image;
    // pure-update chains move ONLY `name` (the one column whose before and
    // after images differ) over the seeded state; DELETE removes the key
    "cdc_apply_registry_mutable" ->
      """WITH log AS (
        |  SELECT event_id, user_id,
        |    CASE WHEN event_id % 10 <= 5 THEN 'INSERT'
        |         WHEN event_id % 10 <= 8 THEN 'UPDATE'
        |         ELSE 'DELETE' END AS op
        |  FROM events WHERE event_id % 4 = 0),
        |agg AS (
        |  SELECT user_id, max(event_id) AS last_v,
        |    bool_or(op = 'INSERT') AS had_insert
        |  FROM log GROUP BY user_id),
        |last AS (
        |  SELECT l.user_id, l.event_id, l.op, a.had_insert
        |  FROM log l JOIN agg a ON l.user_id = a.user_id AND l.event_id = a.last_v),
        |seeded AS (SELECT DISTINCT user_id FROM events
        |           WHERE event_id % 4 = 0 AND user_id % 3 = 0)
        |SELECT CAST(s.user_id % 5 AS INTEGER) AS idsite,
        |  CAST(s.user_id // 5 AS INTEGER) AS idgoal,
        |  'init' AS name, 'd0u' || CAST(s.user_id AS VARCHAR) AS description,
        |  'event' AS match_attribute, 'initp' AS pattern, 'exact' AS pattern_type,
        |  CAST(0 AS TINYINT) AS case_sensitive, CAST(1 AS TINYINT) AS allow_multiple,
        |  '1' AS revenue, CAST(0 AS TINYINT) AS deleted,
        |  CAST(1 AS TINYINT) AS event_value_as_revenue
        |FROM seeded s LEFT JOIN last c ON s.user_id = c.user_id
        |WHERE c.user_id IS NULL
        |UNION ALL
        |SELECT CAST(c.user_id % 5 AS INTEGER), CAST(c.user_id // 5 AS INTEGER),
        |  'g' || CAST(c.event_id AS VARCHAR), 'd' || CAST(c.user_id AS VARCHAR),
        |  'url', 'p' || CAST(c.event_id % 7 AS VARCHAR), 'contains',
        |  CAST(c.event_id % 2 AS TINYINT), CAST(c.user_id % 2 AS TINYINT),
        |  CAST(c.event_id % 100 AS VARCHAR), CAST(0 AS TINYINT),
        |  CAST(c.user_id % 2 AS TINYINT)
        |FROM last c
        |WHERE c.op = 'INSERT' OR (c.op = 'UPDATE' AND c.had_insert)
        |UNION ALL
        |SELECT CAST(c.user_id % 5 AS INTEGER), CAST(c.user_id // 5 AS INTEGER),
        |  'g' || CAST(c.event_id AS VARCHAR), 'd0u' || CAST(c.user_id AS VARCHAR),
        |  'event', 'initp', 'exact',
        |  CAST(0 AS TINYINT), CAST(1 AS TINYINT), '1', CAST(0 AS TINYINT),
        |  CAST(1 AS TINYINT)
        |FROM last c JOIN seeded s ON c.user_id = s.user_id
        |WHERE c.op = 'UPDATE' AND NOT c.had_insert""".stripMargin,
    // delta replay: INSERT +after, DELETE -before, UPDATE -before +after,
    // exact integer micro-unit sums (before.value = value - 1 per the log)
    "cdc_incremental_agg" ->
      s"""WITH $changeLogSql,
        |minus AS (SELECT event_type AS g, -1 AS dc,
        |    -CAST(floor((value - CAST(1 AS DOUBLE)) * CAST(1000000 AS DOUBLE)) AS BIGINT) AS dv
        |  FROM log WHERE op IN ('DELETE', 'UPDATE')),
        |plus AS (SELECT event_type AS g, 1 AS dc,
        |    CAST(floor(value * CAST(1000000 AS DOUBLE)) AS BIGINT) AS dv
        |  FROM log WHERE op IN ('INSERT', 'UPDATE'))
        |SELECT g AS event_type, CAST(sum(dc) AS BIGINT) AS cnt,
        |  CAST(sum(dv) AS BIGINT) AS sum_micro
        |FROM (SELECT * FROM minus UNION ALL SELECT * FROM plus) GROUP BY 1""".stripMargin,
    "s11_retention_delete" ->
      """WITH wm AS (
        |  SELECT max(event_id) AS w FROM (
        |    SELECT event_id, ts FROM events ORDER BY event_id ASC LIMIT 10001) t
        |  WHERE ts < (SELECT max(ts) FROM events) - INTERVAL 21 DAY)
        |SELECT event_id, user_id, ts, event_type FROM events
        |WHERE (SELECT w FROM wm) IS NULL OR event_id > (SELECT w FROM wm)""".stripMargin
  )
}
