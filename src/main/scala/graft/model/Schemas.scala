package graft.model

import org.apache.spark.sql.types._

/**
 * Schema registry for the CDC engine.
 *
 * Transcribed from the reference's target DDL
 * (reference: script_create_clickhouse_table.sql:1-398) per the type map in
 * SURVEY.md §1.2: unsigned ClickHouse integers widen to the next signed Spark
 * type; `Nullable(T)` becomes `nullable = true`.
 *
 * The reference is schema-oblivious in flight (binlog row dicts,
 * binlog2sql_util.py:277-284) and schema-strict at the sink; we make the
 * registry explicit so analysis-time errors reproduce its fail-fast behavior
 * (reference: README.md:196-206).
 */
object Schemas {

  /**
   * The change-event envelope — one row of a MySQL row-binlog event
   * (reference: matomo2clickhouse.py:508-576, binlog2sql_util.py:196-258).
   * `before`/`after` payloads are carried as JSON strings at the envelope
   * level so one stream can carry heterogeneous tables; the per-table typed
   * frame is recovered with `from_json(payload, registry(table))`.
   */
  val changeEventSchema: StructType = StructType(Seq(
    StructField("op", StringType, nullable = false),         // INSERT | UPDATE | DELETE
    StructField("schema", StringType, nullable = false),     // source database
    StructField("table", StringType, nullable = false),
    StructField("ts", TimestampType, nullable = false),      // event timestamp
    StructField("log_file", StringType, nullable = false),   // e.g. mysql-bin.000042
    StructField("log_pos", LongType, nullable = false),      // event end position
    StructField("row_index", IntegerType, nullable = false), // index within multi-row event
    StructField("before", StringType, nullable = true),      // JSON before-image (null for INSERT)
    StructField("after", StringType, nullable = true)        // JSON after-image (null for DELETE)
  ))

  /** Engine-injected version column for append-only tables
    * (reference: binlog2sql_util.py:52-62, script_create_clickhouse_table.sql:17). */
  val VersionCol = "dateid"

  /**
   * Per-table CDC metadata:
   * @param keyCols      business key (ClickHouse ORDER BY key)
   * @param versioned    member of `tables_not_updated` — UPDATEs rewritten to
   *                     INSERTs with a fresh version (reference: _settings.py:125-130,
   *                     binlog2sql_util.py:305-327)
   * @param deleteDateCol column used by the old-DELETE suppression guard, if the
   *                     table is in CONST_TBL_NOT_DELETE_OLD
   *                     (reference: _settings.py:132-138, matomo2clickhouse.py:583-606)
   * @param partitionCol monthly write-partition source column
   *                     (reference: PARTITION BY toYYYYMM, script_create_clickhouse_table.sql:97)
   */
  final case class TableMeta(
      keyCols: Seq[String],
      versioned: Boolean = false,
      deleteDateCol: Option[String] = None,
      partitionCol: Option[String] = None)

  /** Subset of the 16-table data model sufficient for the test fixtures
    * (FIXTURES.md §A2); schemas for the remaining tables follow the same
    * transcription rules. */
  val logVisit: StructType = StructType(Seq(
    StructField(VersionCol, LongType, nullable = false),
    StructField("idvisit", LongType, nullable = false),
    StructField("idsite", LongType, nullable = false),
    StructField("idvisitor", StringType, nullable = false),
    StructField("visit_first_action_time", TimestampType, nullable = false),
    StructField("visit_last_action_time", TimestampType, nullable = false),
    StructField("user_id", StringType, nullable = true),
    StructField("visitor_count_visits", LongType, nullable = false),
    StructField("referer_name", StringType, nullable = true),
    StructField("location_country", StringType, nullable = true),
    StructField("visit_total_time", LongType, nullable = false)
  ))

  val logLinkVisitAction: StructType = StructType(Seq(
    StructField(VersionCol, LongType, nullable = false),
    StructField("idlink_va", LongType, nullable = false),
    StructField("idvisit", LongType, nullable = false),
    StructField("idsite", LongType, nullable = false),
    StructField("server_time", TimestampType, nullable = false),
    StructField("idaction_url", LongType, nullable = true),
    StructField("time_spent", LongType, nullable = true),
    StructField("bandwidth", LongType, nullable = true)
  ))

  val site: StructType = StructType(Seq(
    StructField("idsite", LongType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("main_url", StringType, nullable = false),
    StructField("ts_created", TimestampType, nullable = false),
    StructField("timezone", StringType, nullable = false),
    StructField("currency", StringType, nullable = false),
    StructField("ecommerce", ByteType, nullable = true)
  ))

  val siteUrl: StructType = StructType(Seq(
    StructField("idsite", LongType, nullable = false),
    StructField("url", StringType, nullable = false)
  ))

  val goal: StructType = StructType(Seq(
    StructField("idsite", IntegerType, nullable = false),
    StructField("idgoal", IntegerType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("revenue", StringType, nullable = false),
    StructField("deleted", ByteType, nullable = false)
  ))

  /** Checkpoint ledger (reference: script_create_clickhouse_table.sql:5-14). */
  val logReplication: StructType = StructType(Seq(
    StructField(VersionCol, LongType, nullable = false),
    StructField("created_at", TimestampType, nullable = false),
    StructField("sql_type", StringType, nullable = false),
    StructField("log_time", TimestampType, nullable = false),
    StructField("log_file", StringType, nullable = false),
    StructField("log_pos_start", LongType, nullable = false),
    StructField("log_pos_end", LongType, nullable = false)
  ))

  /** Registry: table name → payload schema. */
  val tableSchemas: Map[String, StructType] = Map(
    "matomo_log_visit" -> logVisit,
    "matomo_log_link_visit_action" -> logLinkVisitAction,
    "matomo_site" -> site,
    "matomo_site_url" -> siteUrl,
    "matomo_goal" -> goal,
    "log_replication" -> logReplication
  )

  /** Registry: table name → CDC metadata (reference: _settings.py:105-138). */
  val tableMeta: Map[String, TableMeta] = Map(
    "matomo_log_visit" -> TableMeta(
      keyCols = Seq("idvisit"), versioned = true,
      deleteDateCol = Some("visit_first_action_time"),
      partitionCol = Some("visit_first_action_time")),
    "matomo_log_link_visit_action" -> TableMeta(
      keyCols = Seq("idlink_va"), versioned = true,
      deleteDateCol = Some("server_time"),
      partitionCol = Some("server_time")),
    "matomo_site" -> TableMeta(keyCols = Seq("idsite")),
    "matomo_site_url" -> TableMeta(keyCols = Seq("idsite", "url")),
    "matomo_goal" -> TableMeta(keyCols = Seq("idsite", "idgoal"))
  )
}
