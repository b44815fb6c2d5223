package graft.model

import org.apache.spark.sql.types._

/**
 * Schema registry for the CDC engine — the COMPLETE 17-table data model
 * transcribed from the reference's target DDL
 * (reference: script_create_clickhouse_table.sql:1-398) per the type map in
 * SURVEY.md §1.2: unsigned ClickHouse integers widen to the next signed Spark
 * type (UInt8→Short, UInt16→Int, UInt32→Long, UInt64→Long — the reference's
 * ids fit signed 64-bit, see SURVEY.md §1.2), `Nullable(T)` becomes
 * `nullable = true`.
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

  private def f(name: String, t: DataType, nullable: Boolean = false) =
    StructField(name, t, nullable)

  /**
   * Per-table CDC metadata:
   * @param keyCols      business key (ClickHouse ORDER BY key, minus the
   *                     engine version column)
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

  /** Checkpoint ledger (reference: script_create_clickhouse_table.sql:5-14). */
  val logReplication: StructType = StructType(Seq(
    f(VersionCol, LongType), f("created_at", TimestampType), f("sql_type", StringType),
    f("log_time", TimestampType), f("log_file", StringType),
    f("log_pos_start", LongType), f("log_pos_end", LongType)))

  /** reference: script_create_clickhouse_table.sql:16-97 (79 cols). */
  val logVisit: StructType = StructType(Seq(
    f(VersionCol, LongType),
    f("idvisit", LongType), f("idsite", LongType), f("idvisitor", StringType),
    f("visit_last_action_time", TimestampType), f("config_id", StringType),
    f("location_ip", StringType), f("profilable", ByteType, nullable = true),
    f("user_id", StringType, nullable = true), f("visit_first_action_time", TimestampType),
    f("visit_goal_buyer", ByteType, nullable = true),
    f("visit_goal_converted", ByteType, nullable = true),
    f("visitor_returning", ByteType, nullable = true),
    f("visitor_seconds_since_first", LongType, nullable = true),
    f("visitor_seconds_since_order", LongType, nullable = true),
    f("visitor_count_visits", LongType),
    f("visit_entry_idaction_name", LongType, nullable = true),
    f("visit_entry_idaction_url", LongType, nullable = true),
    f("visit_exit_idaction_name", LongType, nullable = true),
    f("visit_exit_idaction_url", LongType, nullable = true),
    f("visit_total_actions", LongType, nullable = true),
    f("visit_total_interactions", LongType, nullable = true),
    f("visit_total_searches", IntegerType, nullable = true),
    f("referer_keyword", StringType, nullable = true),
    f("referer_name", StringType, nullable = true),
    f("referer_type", ShortType, nullable = true),
    f("referer_url", StringType, nullable = true),
    f("location_browser_lang", StringType, nullable = true),
    f("config_browser_engine", StringType, nullable = true),
    f("config_browser_name", StringType, nullable = true),
    f("config_browser_version", StringType, nullable = true),
    f("config_client_type", ByteType, nullable = true),
    f("config_device_brand", StringType, nullable = true),
    f("config_device_model", StringType, nullable = true),
    f("config_device_type", ByteType, nullable = true),
    f("config_os", StringType, nullable = true),
    f("config_os_version", StringType, nullable = true),
    f("visit_total_events", LongType, nullable = true),
    f("visitor_localtime", StringType, nullable = true),
    f("visitor_seconds_since_last", LongType, nullable = true),
    f("config_resolution", StringType, nullable = true),
    f("config_cookie", ByteType, nullable = true),
    f("config_flash", ByteType, nullable = true),
    f("config_java", ByteType, nullable = true),
    f("config_pdf", ByteType, nullable = true),
    f("config_quicktime", ByteType, nullable = true),
    f("config_realplayer", ByteType, nullable = true),
    f("config_silverlight", ByteType, nullable = true),
    f("config_windowsmedia", ByteType, nullable = true),
    f("visit_total_time", LongType),
    f("location_city", StringType, nullable = true),
    f("location_country", StringType, nullable = true),
    f("location_latitude", StringType, nullable = true),
    f("location_longitude", StringType, nullable = true),
    f("location_region", StringType, nullable = true),
    f("last_idlink_va", LongType, nullable = true)) ++
    customDimensions ++ campaignCols ++ customVars)

  /** reference: script_create_clickhouse_table.sql:99-154 (53 cols). */
  val logLinkVisitAction: StructType = StructType(Seq(
    f(VersionCol, LongType),
    f("idlink_va", LongType), f("idsite", LongType), f("idvisitor", StringType),
    f("idvisit", LongType),
    f("idaction_url_ref", LongType, nullable = true),
    f("idaction_name_ref", LongType, nullable = true),
    f("custom_float", StringType, nullable = true),
    f("pageview_position", LongType, nullable = true),
    f("server_time", TimestampType),
    f("idpageview", StringType, nullable = true),
    f("idaction_name", LongType, nullable = true),
    f("idaction_url", LongType, nullable = true),
    f("search_cat", StringType, nullable = true),
    f("search_count", LongType, nullable = true),
    f("time_spent_ref_action", LongType, nullable = true),
    f("idaction_product_cat", LongType, nullable = true),
    f("idaction_product_cat2", LongType, nullable = true),
    f("idaction_product_cat3", LongType, nullable = true),
    f("idaction_product_cat4", LongType, nullable = true),
    f("idaction_product_cat5", LongType, nullable = true),
    f("idaction_product_name", LongType, nullable = true),
    f("product_price", StringType, nullable = true),
    f("idaction_product_sku", LongType, nullable = true),
    f("idaction_event_action", LongType, nullable = true),
    f("idaction_event_category", LongType, nullable = true),
    f("idaction_content_interaction", LongType, nullable = true),
    f("idaction_content_name", LongType, nullable = true),
    f("idaction_content_piece", LongType, nullable = true),
    f("idaction_content_target", LongType, nullable = true),
    f("time_dom_completion", LongType, nullable = true),
    f("time_dom_processing", LongType, nullable = true),
    f("time_network", LongType, nullable = true),
    f("time_on_load", LongType, nullable = true),
    f("time_server", LongType, nullable = true),
    f("time_transfer", LongType, nullable = true),
    f("time_spent", LongType, nullable = true)) ++
    customDimensions ++ Seq(f("bandwidth", LongType, nullable = true)) ++ customVars)

  /** reference: script_create_clickhouse_table.sql:156-173 (15 cols). */
  val logConversionItem: StructType = StructType(Seq(
    f("idsite", LongType), f("idvisitor", StringType), f("server_time", TimestampType),
    f("idvisit", LongType), f("idorder", StringType),
    f("idaction_sku", LongType), f("idaction_name", LongType),
    f("idaction_category", LongType), f("idaction_category2", LongType),
    f("idaction_category3", LongType), f("idaction_category4", LongType),
    f("idaction_category5", LongType),
    f("price", StringType), f("quantity", LongType), f("deleted", ShortType)))

  /** reference: script_create_clickhouse_table.sql:175-233 (56 cols). */
  val logConversion: StructType = StructType(Seq(
    f("idvisit", LongType), f("idsite", LongType), f("idvisitor", StringType),
    f("server_time", TimestampType),
    f("idaction_url", LongType, nullable = true),
    f("idlink_va", LongType, nullable = true),
    f("idgoal", IntegerType), f("buster", LongType),
    f("idorder", StringType, nullable = true),
    f("items", IntegerType, nullable = true),
    f("url", StringType),
    f("revenue", StringType, nullable = true),
    f("revenue_shipping", StringType, nullable = true),
    f("revenue_subtotal", StringType, nullable = true),
    f("revenue_tax", StringType, nullable = true),
    f("revenue_discount", StringType, nullable = true),
    f("visitor_returning", ByteType, nullable = true),
    f("visitor_seconds_since_first", LongType, nullable = true),
    f("visitor_seconds_since_order", LongType, nullable = true),
    f("visitor_count_visits", LongType),
    f("referer_keyword", StringType, nullable = true),
    f("referer_name", StringType, nullable = true),
    f("referer_type", ShortType, nullable = true),
    f("config_browser_name", StringType, nullable = true),
    f("config_client_type", ByteType, nullable = true),
    f("config_device_brand", StringType, nullable = true),
    f("config_device_model", StringType, nullable = true),
    f("config_device_type", ByteType, nullable = true),
    f("location_city", StringType, nullable = true),
    f("location_country", StringType, nullable = true),
    f("location_latitude", StringType, nullable = true),
    f("location_longitude", StringType, nullable = true),
    f("location_region", StringType, nullable = true)) ++
    customDimensions ++ campaignCols ++ customVars)

  /** reference: script_create_clickhouse_table.sql:235-241. */
  val logProfiling: StructType = StructType(Seq(
    f("query", StringType), f("count", LongType, nullable = true),
    f("sum_time_ms", StringType, nullable = true), f("idprofiling", LongType)))

  /** reference: script_create_clickhouse_table.sql:243-250. */
  val logAction: StructType = StructType(Seq(
    f("idaction", LongType), f("name", StringType, nullable = true),
    f("hash", LongType), f("type", ShortType),
    f("url_prefix", ByteType, nullable = true)))

  /** reference: script_create_clickhouse_table.sql:252-266. */
  val goal: StructType = StructType(Seq(
    f("idsite", IntegerType), f("idgoal", IntegerType), f("name", StringType),
    f("description", StringType), f("match_attribute", StringType),
    f("pattern", StringType), f("pattern_type", StringType),
    f("case_sensitive", ByteType), f("allow_multiple", ByteType),
    f("revenue", StringType), f("deleted", ByteType),
    f("event_value_as_revenue", ByteType)))

  /** reference: script_create_clickhouse_table.sql:268-288. */
  val site: StructType = StructType(Seq(
    f("idsite", LongType), f("name", StringType), f("main_url", StringType),
    f("ts_created", TimestampType),
    f("ecommerce", ByteType, nullable = true),
    f("sitesearch", ByteType, nullable = true),
    f("sitesearch_keyword_parameters", StringType),
    f("sitesearch_category_parameters", StringType),
    f("timezone", StringType), f("currency", StringType),
    f("exclude_unknown_urls", ByteType, nullable = true),
    f("excluded_ips", StringType), f("excluded_parameters", StringType),
    f("excluded_user_agents", StringType), f("group", StringType),
    f("type", StringType), f("keep_url_fragment", ByteType),
    f("creator_login", StringType, nullable = true)))

  /** reference: script_create_clickhouse_table.sql:290-294. */
  val siteUrl: StructType = StructType(Seq(
    f("idsite", LongType), f("url", StringType)))

  /** reference: script_create_clickhouse_table.sql:296-315. */
  val tagmanagerTag: StructType = StructType(Seq(
    f("idtag", LongType), f("idcontainerversion", LongType), f("idsite", LongType),
    f("type", StringType), f("name", StringType), f("status", StringType),
    f("parameters", StringType), f("fire_trigger_ids", StringType),
    f("block_trigger_ids", StringType), f("fire_limit", StringType),
    f("priority", IntegerType), f("fire_delay", LongType),
    f("start_date", TimestampType),
    f("end_date", TimestampType, nullable = true),
    f("created_date", TimestampType), f("updated_date", TimestampType),
    f("deleted_date", TimestampType, nullable = true)))

  /** reference: script_create_clickhouse_table.sql:317-331. */
  val tagmanagerVariable: StructType = StructType(Seq(
    f("idvariable", LongType), f("idcontainerversion", LongType), f("idsite", LongType),
    f("type", StringType), f("name", StringType), f("status", StringType),
    f("parameters", StringType), f("lookup_table", StringType),
    f("default_value", StringType, nullable = true),
    f("created_date", TimestampType), f("updated_date", TimestampType),
    f("deleted_date", TimestampType, nullable = true)))

  /** reference: script_create_clickhouse_table.sql:333-345. */
  val tagmanagerContainerVersion: StructType = StructType(Seq(
    f("idcontainerversion", LongType), f("idcontainer", StringType), f("idsite", LongType),
    f("status", StringType), f("revision", LongType), f("name", StringType),
    f("description", StringType),
    f("created_date", TimestampType), f("updated_date", TimestampType),
    f("deleted_date", TimestampType, nullable = true)))

  /** reference: script_create_clickhouse_table.sql:347-358. */
  val tagmanagerContainerRelease: StructType = StructType(Seq(
    f("idcontainerrelease", LongType), f("idcontainer", StringType),
    f("idcontainerversion", LongType), f("idsite", LongType),
    f("status", StringType), f("environment", StringType),
    f("release_login", StringType), f("release_date", TimestampType),
    f("deleted_date", TimestampType, nullable = true)))

  /** reference: script_create_clickhouse_table.sql:360-371. */
  val tagmanagerContainer: StructType = StructType(Seq(
    f("idcontainer", StringType), f("idsite", LongType), f("context", StringType),
    f("name", StringType), f("description", StringType), f("status", StringType),
    f("created_date", TimestampType), f("updated_date", TimestampType),
    f("deleted_date", TimestampType, nullable = true)))

  /** reference: script_create_clickhouse_table.sql:373-386. */
  val tagmanagerTrigger: StructType = StructType(Seq(
    f("idtrigger", LongType), f("idcontainerversion", LongType), f("idsite", LongType),
    f("type", StringType), f("name", StringType), f("status", StringType),
    f("parameters", StringType), f("conditions", StringType),
    f("created_date", TimestampType), f("updated_date", TimestampType),
    f("deleted_date", TimestampType, nullable = true)))

  /** reference: script_create_clickhouse_table.sql:388-398. */
  val customDimensionsTable: StructType = StructType(Seq(
    f("idcustomdimension", LongType), f("idsite", LongType), f("name", StringType),
    f("index", IntegerType), f("scope", StringType), f("active", ShortType),
    f("extractions", StringType), f("case_sensitive", ShortType)))

  /** The 5 custom_dimension_N columns shared by visit/action/conversion. */
  private lazy val customDimensions: Seq[StructField] =
    (1 to 5).map(i => f(s"custom_dimension_$i", StringType, nullable = true))

  /** The 8 campaign_* columns shared by visit/conversion. */
  private lazy val campaignCols: Seq[StructField] =
    Seq("content", "group", "id", "keyword", "medium", "name", "placement", "source")
      .map(s => f(s"campaign_$s", StringType, nullable = true))

  /** The 5 custom_var_{k,v}N column pairs. */
  private lazy val customVars: Seq[StructField] =
    (1 to 5).flatMap(i => Seq(
      f(s"custom_var_k$i", StringType, nullable = true),
      f(s"custom_var_v$i", StringType, nullable = true)))

  /** Registry: table name → payload schema (all 16 reference tables + ledger). */
  val tableSchemas: Map[String, StructType] = Map(
    "log_replication" -> logReplication,
    "matomo_log_visit" -> logVisit,
    "matomo_log_link_visit_action" -> logLinkVisitAction,
    "matomo_log_conversion_item" -> logConversionItem,
    "matomo_log_conversion" -> logConversion,
    "matomo_log_profiling" -> logProfiling,
    "matomo_log_action" -> logAction,
    "matomo_goal" -> goal,
    "matomo_site" -> site,
    "matomo_site_url" -> siteUrl,
    "matomo_tagmanager_tag" -> tagmanagerTag,
    "matomo_tagmanager_variable" -> tagmanagerVariable,
    "matomo_tagmanager_container_version" -> tagmanagerContainerVersion,
    "matomo_tagmanager_container_release" -> tagmanagerContainerRelease,
    "matomo_tagmanager_container" -> tagmanagerContainer,
    "matomo_tagmanager_trigger" -> tagmanagerTrigger,
    "matomo_custom_dimensions" -> customDimensionsTable
  )

  /** Registry: table name → CDC metadata. Keys are the ClickHouse ORDER BY
    * minus the version column; versioned flag per `tables_not_updated`
    * (reference: _settings.py:125-130); deleteDateCol per
    * CONST_TBL_NOT_DELETE_OLD (reference: _settings.py:132-138);
    * partitionCol per the DDL's PARTITION BY toYYYYMM. */
  val tableMeta: Map[String, TableMeta] = Map(
    "matomo_log_visit" -> TableMeta(
      keyCols = Seq("idvisit"), versioned = true,
      deleteDateCol = Some("visit_first_action_time"),
      partitionCol = Some("visit_first_action_time")),
    "matomo_log_link_visit_action" -> TableMeta(
      keyCols = Seq("idlink_va"), versioned = true,
      deleteDateCol = Some("server_time"),
      partitionCol = Some("server_time")),
    "matomo_log_conversion_item" -> TableMeta(
      keyCols = Seq("idvisit", "idorder", "idaction_sku"),
      partitionCol = Some("server_time")),
    "matomo_log_conversion" -> TableMeta(
      keyCols = Seq("idvisit", "idsite", "idgoal", "buster"),
      // in CONST_TBL_NOT_DELETE_OLD (reference: _settings.py:132-138) even
      // though it takes the plain-UPDATE path: old DELETEs are suppressed
      deleteDateCol = Some("server_time"),
      partitionCol = Some("server_time")),
    "matomo_log_profiling" -> TableMeta(keyCols = Seq("idprofiling")),
    "matomo_log_action" -> TableMeta(keyCols = Seq("idaction")),
    "matomo_goal" -> TableMeta(keyCols = Seq("idsite", "idgoal")),
    "matomo_site" -> TableMeta(keyCols = Seq("idsite")),
    "matomo_site_url" -> TableMeta(keyCols = Seq("idsite", "url")),
    "matomo_tagmanager_tag" -> TableMeta(
      keyCols = Seq("idtag", "idsite"), partitionCol = Some("start_date")),
    "matomo_tagmanager_variable" -> TableMeta(
      keyCols = Seq("idvariable", "idsite"), partitionCol = Some("created_date")),
    "matomo_tagmanager_container_version" -> TableMeta(
      keyCols = Seq("idcontainerversion", "idcontainer", "idsite"),
      partitionCol = Some("created_date")),
    "matomo_tagmanager_container_release" -> TableMeta(
      keyCols = Seq("idcontainerrelease", "idsite"),
      partitionCol = Some("release_date")),
    "matomo_tagmanager_container" -> TableMeta(
      keyCols = Seq("idcontainer", "idsite"), partitionCol = Some("created_date")),
    "matomo_tagmanager_trigger" -> TableMeta(
      keyCols = Seq("idtrigger", "idsite"), partitionCol = Some("created_date")),
    "matomo_custom_dimensions" -> TableMeta(
      keyCols = Seq("idcustomdimension", "idsite"))
  )
}
