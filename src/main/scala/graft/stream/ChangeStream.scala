package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.cdc.Cdc
import graft.model.Schemas

/**
 * The incremental, resumable CDC pipeline — the Spark-native re-expression of
 * the reference's event loop + checkpoint/resume machinery
 * (reference: matomo2clickhouse.py:490-533 loop, 632-720 checkpoint/flush,
 * 786-812 resume):
 *
 *  - S1: `readStream` over a change-log directory of parquet files (the
 *    offline stand-in for a binlog/Debezium feed);
 *  - S3/O11: `maxFilesPerTrigger` bounds each micro-batch exactly like the
 *    reference's 20-binlog-files-per-run clamp (reference: _settings.py:79-80);
 *  - S4: with no checkpoint, the file source starts from the earliest file —
 *    the reference's default-start behavior (matomo2clickhouse.py:310-319);
 *  - ST1: `Trigger.AvailableNow` = "process everything present, then stop" —
 *    the reference's run-until-EOF-then-exit cron contract;
 *  - ST2: `checkpointLocation` holds the source offsets — the engine-level
 *    equivalent of resuming from max(dateid) in `log_replication`; the ledger
 *    table is still appended per batch (S8) as the auditable replica of that
 *    checkpoint, exactly like the reference keeps both;
 *  - ST3: the apply functions are idempotent on replay (latest-wins), so
 *    at-least-once delivery after a crash converges — property-tested in
 *    CdcPropertySpec and exercised end-to-end in ChangeStreamSpec;
 *  - ST7: ordering inside a batch is recovered per key by the version
 *    reduction in applyMutable/applyVersioned;
 *  - S9: `dryRun` logs per-table counts instead of writing — the reference's
 *    EXECUTE_CLICKHOUSE=False inspection mode (reference: _settings.py:53-55).
 */
object ChangeStream {

  final case class StreamConfig(
      changeLogDir: String,
      checkpointDir: String,
      stateDir: String,
      ledgerDir: String,
      maxFilesPerTrigger: Int = 20,
      onlyTables: Seq[String] = Nil,
      onlySchemas: Seq[String] = Nil,
      deleteMaxAgeDays: Int = 31,
      /** Deterministic "now" for the delete-age guard (tests); wall clock if None. */
      nowOverride: Option[java.sql.Timestamp] = None,
      dryRun: Boolean = false,
      /** When set, VERSIONED tables apply to this JDBC target (batched
        * INSERTs + version-qualified DELETE mutations — the reference's
        * ClickHouse write path, S6) and the ledger is mirrored there;
        * mutable tables and the parquet ledger keep their normal paths. */
      jdbcSink: Option[JdbcState.SinkConfig] = None,
      /** Streaming materialized views: per-group (count, Σvalue-micro)
        * aggregates maintained from each micro-batch's change deltas
        * (`Cdc.incrementalAgg`) — a view refresh costs the batch, never a
        * state scan. State lives at `<stateDir>/__agg_<table>__<group>`. */
      maintainedAggs: Seq[MaintainedAgg] = Nil,
      /** [[IngestLock]] staleness window for the state-root single-writer
        * lock every applying batch holds (one heartbeat per table write). */
      lockStaleMs: Long = IngestLock.DefaultStaleMs)

  /** One maintained view: per-`groupCol` count + micro-unit sum of
    * `valueCol` over the logical rows of `table`. Assumes a CONSISTENT
    * change log (the binlog contract: INSERT only for new keys, UPDATE/
    * DELETE before-images match the current row) — the delta model cannot
    * see a collision-INSERT replacing an existing row, so degenerate logs
    * that `applyMutable` absorbs defensively would drift the view. */
  final case class MaintainedAgg(table: String, groupCol: String, valueCol: String) {
    def dir(stateDir: String): String =
      s"$stateDir/__agg_${table}__${groupCol}__$valueCol"
  }

  /** History schema of a versioned table / state schema of a mutable one. */
  def stateSchema(table: String): StructType = {
    val payload = StructType(Schemas.tableSchemas(table).fields
      .filterNot(_.name == Schemas.VersionCol))
    if (Schemas.tableMeta(table).versioned)
      StructType(payload.fields :+ StructField(Schemas.VersionCol, LongType, nullable = false))
    else payload
  }

  /** The lock owner of an applying batch is its STABLE identity (checkpoint
    * + batch id, the [[CorpusIngest.batchLockOwner]] discipline): a crashed
    * batch's replay by the same stream is the reentrant-refresh case, never
    * a foreign holder stalled behind its own dead incarnation. */
  def batchLockOwner(cfg: StreamConfig, batchId: Long): String =
    s"cdc-batch-$batchId@${cfg.checkpointDir}"

  /** Apply one micro-batch: filter → per-table typed apply → ledger append.
    *
    * Holds the [[IngestLock]] on the STATE ROOT for the batch's duration
    * (heartbeating before each table's state write), the same single-writer
    * discipline the reference enforces over its whole run
    * (matomo2clickhouse.py:851-868) and [[CorpusIngest.ingestBatch]] enforces
    * on the corpus root — so [[graft.maintain.Maintain.compactState]] /
    * [[graft.maintain.Maintain.purgeChangeLog]] racing a live stream REFUSE
    * instead of interleaving with the per-table state rewrites. Dry-run mode
    * mutates nothing and takes no lock, so it can inspect alongside a live
    * run. */
  def applyBatch(spark: SparkSession, cfg: StreamConfig)(
      batch: DataFrame, batchId: Long): Unit =
    if (cfg.dryRun) applyBatchBody(spark, cfg, None)(batch, batchId)
    else IngestLock.withLock(spark, cfg.stateDir,
        batchLockOwner(cfg, batchId), cfg.lockStaleMs) { h =>
      applyBatchBody(spark, cfg, Some(h))(batch, batchId)
    }

  private def applyBatchBody(spark: SparkSession, cfg: StreamConfig,
      lock: Option[IngestLock.Handle])(batch: DataFrame, batchId: Long): Unit = {
    val filtered = Cdc.filterEvents(batch,
      onlyTables = cfg.onlyTables, onlySchemas = cfg.onlySchemas)
      .persist()
    try {
      val present = filtered.select(col("table")).distinct()
        .collect().map(_.getString(0)).sorted
      // schema drift is a hard error, exactly like the reference
      // (reference: README.md:196-206) — a silently skipped table would also
      // poison the ledger, which must record only applied events
      val unknown = present.filterNot(Schemas.tableMeta.contains)
      require(unknown.isEmpty,
        s"change events for unregistered tables: ${unknown.mkString(", ")}")
      present.foreach { table =>
        val meta = Schemas.tableMeta(table)
        val now = cfg.nowOverride.map(lit(_)).getOrElse(current_timestamp())
        // F7 applies to every table in CONST_TBL_NOT_DELETE_OLD regardless of
        // path (reference: matomo2clickhouse.py:583-606); applyVersioned
        // guards internally, the mutable path guards here
        // strict: corrupt payloads fail the batch loudly, like unregistered
        // tables — a nulled payload would read as data loss downstream
        val typedRaw = Cdc.typedChanges(filtered, table, strict = true)
        val typed = meta.deleteDateCol match {
          case Some(dc) if !meta.versioned =>
            Cdc.suppressOldDeletes(typedRaw, dc, now, cfg.deleteMaxAgeDays)
          case _ => typedRaw
        }
        val dir = s"${cfg.stateDir}/$table"
        // a long per-table apply must not outlive the staleness window:
        // refresh (and fail loudly on a stolen lock) BEFORE each state write
        lock.foreach(IngestLock.heartbeat(spark, _))
        if (cfg.dryRun) {
          // S9: inspect, don't apply — counts force the plan like the real write
          val state = readState(spark, cfg, table)
          val next =
            if (meta.versioned)
              Cdc.applyVersioned(state, typed, meta.keyCols, meta.deleteDateCol,
                now, cfg.deleteMaxAgeDays)
            else Cdc.applyMutable(state, typed, meta.keyCols)
          System.err.println(s"[dry-run] batch=$batchId table=$table " +
            s"changes=${typed.count()} next_state_rows=${next.count()}")
        } else if (cfg.jdbcSink.isDefined && meta.versioned) {
          // sink mode: versioned tables write to the JDBC target. F7 applies
          // here (applyVersioned's internal guard is bypassed by the sink)
          val guarded = meta.deleteDateCol match {
            case Some(dc) =>
              Cdc.suppressOldDeletes(typedRaw, dc, now, cfg.deleteMaxAgeDays)
            case None => typedRaw
          }
          JdbcState.applyVersioned(guarded, cfg.jdbcSink.get, table, meta.keyCols)
        } else if (cfg.jdbcSink.isDefined) {
          // sink mode, mutable table: update-in-place against the target —
          // the reference applies EVERY table to its target, not just the
          // versioned list. `typed` already carries the mutable F7 guard.
          JdbcState.applyMutable(typed, cfg.jdbcSink.get, table, meta.keyCols)
        } else meta.partitionCol match {
          // scale path: tables with a monthly partition column apply
          // partition-pruned — only touched months are read and rewritten
          case Some(pc) if meta.versioned =>
            PartitionedState.applyVersioned(spark, dir, stateSchema(table), typed,
              meta.keyCols, pc, meta.deleteDateCol, now, cfg.deleteMaxAgeDays)
          case Some(pc) =>
            PartitionedState.applyMutable(spark, dir, stateSchema(table), typed,
              meta.keyCols, pc)
          case None =>
            val state = readState(spark, cfg, table)
            val next =
              if (meta.versioned)
                Cdc.applyVersioned(state, typed, meta.keyCols, meta.deleteDateCol,
                  now, cfg.deleteMaxAgeDays)
              else Cdc.applyMutable(state, typed, meta.keyCols)
            StateStore.replace(next, dir)
        }
        // maintained views see the same F7-guarded deltas as the table apply
        if (!cfg.dryRun) cfg.maintainedAggs.filter(_.table == table).foreach { ma =>
          val aggTyped =
            if (meta.versioned) meta.deleteDateCol match {
              case Some(dc) =>
                Cdc.suppressOldDeletes(typedRaw, dc, now, cfg.deleteMaxAgeDays)
              case None => typedRaw
            } else typed
          val gField = Schemas.tableSchemas(table)(ma.groupCol)
          val aggSchema = StructType(Seq(
            gField.copy(name = ma.groupCol),
            StructField("cnt", LongType, nullable = false),
            StructField("sum_micro", LongType, nullable = false),
            StructField("__batch_id", LongType, nullable = false)))
          val aggDir = ma.dir(cfg.stateDir)
          val state = StateStore.read(spark, aggDir, aggSchema)
          // replay guard: foreachBatch is at-least-once — a crash between
          // this replace and the checkpoint commit replays the batch, and
          // deltas (unlike the idempotent table applies) would double-apply.
          // The state records the last applied batch id; a replayed batch is
          // a no-op. batchIds are monotone per checkpoint, so one max row
          // decides (tiny state: one row per group)
          val applied = state.agg(max(col("__batch_id"))).collect().head
          val alreadyApplied = !applied.isNullAt(0) && applied.getLong(0) >= batchId
          if (!alreadyApplied) StateStore.replace(
            Cdc.incrementalAgg(state.drop("__batch_id"), aggTyped,
                ma.groupCol, ma.valueCol)
              .withColumn("__batch_id", lit(batchId)),
            aggDir)
        }
      }
      if (!cfg.dryRun && !filtered.isEmpty) {
        val ledger = Cdc.ledgerEntry(filtered)
          .withColumn("batch_id", lit(batchId))
          .persist()
        try {
          ledger.write.mode("append").parquet(cfg.ledgerDir)
          cfg.jdbcSink.foreach(JdbcState.appendLedger(ledger, _))
        } finally ledger.unpersist()
      }
    } finally filtered.unpersist()
  }

  /** Start one bounded run (AvailableNow): processes all files currently in
    * the change-log dir in micro-batches of `maxFilesPerTrigger`, then stops.
    * Re-invoking with the same checkpoint resumes where the last run ended. */
  def run(spark: SparkSession, cfg: StreamConfig): StreamingQuery =
    spark.readStream
      .schema(Schemas.changeEventSchema)
      .option("maxFilesPerTrigger", cfg.maxFilesPerTrigger)
      .parquet(cfg.changeLogDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch((b: DataFrame, id: Long) => applyBatch(spark, cfg)(b, id))
      .start()

  /** Read a table's current state regardless of layout (flat StateStore dir
    * for unpartitioned tables, month-partitioned parquet otherwise). */
  def readState(spark: SparkSession, cfg: StreamConfig, table: String): DataFrame = {
    val dir = s"${cfg.stateDir}/$table"
    if (Schemas.tableMeta(table).partitionCol.isEmpty)
      StateStore.read(spark, dir, stateSchema(table))
    else {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p))
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], stateSchema(table))
      else spark.read.parquet(dir).drop(PartitionedState.PartCol)
    }
  }

  /** S2 — resume coordinates from the audit ledger (the reference's
    * get_ch_param_for_next, matomo2clickhouse.py:786-812). */
  def resumeFromLedger(spark: SparkSession, cfg: StreamConfig): Option[(String, Long)] = {
    val p = new org.apache.hadoop.fs.Path(cfg.ledgerDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else Cdc.resumePosition(spark.read.parquet(cfg.ledgerDir))
  }
}
