package graft.stream

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects}

import graft.cdc.Cdc
import graft.model.Schemas
import graft.sources.Jdbc

/**
 * JDBC target for the versioned apply — the sink-side twin of
 * `Cdc.applyVersioned`, shaped like the reference's ClickHouse write path
 * (reference: matomo2clickhouse.py:648-653 batched INSERTs;
 * _settings.py:230-287 ALTER TABLE ... DELETE mutations):
 *
 *  - INSERT/UPDATE events append their after-images with the engine version
 *    through the batched JDBC sink (S6, `batchsize` rows per statement);
 *  - fresh DELETEs execute as version-qualified parameterized DELETE batches
 *    (`key = ? AND dateid <= frontier`) — the row-store equivalent of the
 *    reference's mutation. The version qualification makes delete-vs-append
 *    order within a batch irrelevant: a DELETE removes exactly the versions
 *    at or before it, and the surviving appends (version > frontier, already
 *    filtered by `Cdc.survivingAppends`) are untouched either way.
 *
 * At-least-once replay converges on the RAW history too, not just the
 * latest-wins view: before appending, the batch scrubs its own version span
 * per key (engine versions are deterministic functions of binlog coordinates,
 * so a replayed batch carries the same versions a crashed attempt wrote —
 * and no other batch's versions can fall in the span). A crash between the
 * append and the checkpoint commit therefore cannot leave duplicate
 * (key, version) rows behind: the retry deletes-then-reinserts them.
 *
 * Identifier quoting comes from the `JdbcDialect` registered for the target
 * URL, matching how Spark's own JDBC writer quotes the columns it creates
 * (double quotes on Derby/Postgres, backticks on MySQL).
 *
 * Scale notes: appends go through Spark's distributed JDBC writer (one
 * connection per partition); deletes run `foreachPartition` with batched
 * PreparedStatements — the scrub span and delete frontier are one row per
 * touched key per batch, orders of magnitude smaller than the append stream.
 * Key columns are primary keys in the reference schema (non-null by
 * construction); a null key would not match the `= ?` predicate, exactly
 * like the reference's SQL.
 */
object JdbcState {

  final case class SinkConfig(
      url: String,
      driver: Option[String] = None,
      batchSize: Int = Jdbc.DefaultBatchSize,
      /** Target tables are `<tablePrefix><source table>`; the audit ledger
        * lands in `<tablePrefix>log_replication` (the reference writes its
        * ledger into the target database too). */
      tablePrefix: String = "state_")

  /** Apply one typed change batch (op, ts, dateid, before, after) of a
    * VERSIONED table to the JDBC target. Old-DELETE suppression (F7) must be
    * applied upstream, exactly as `ChangeStream.applyBatch` does. */
  def applyVersioned(typed: DataFrame, cfg: SinkConfig, table: String,
      keyCols: Seq[String]): Unit = {
    val target = cfg.tablePrefix + table
    val dialect = JdbcDialects.get(cfg.url)
    val frontier = Cdc.deleteFrontier(typed, keyCols)
    val survivors = Cdc.survivingAppends(typed, keyCols, frontier)
    // schema-only append first: Spark's JDBC append creates the table on
    // first contact, so the mutations below always have a target to run on
    Jdbc.append(survivors.limit(0), cfg.url, target, cfg.driver, cfg.batchSize)
    // idempotency scrub: delete this batch's own (key, version-span) rows —
    // a no-op on the first attempt, removes a crashed attempt's partial
    // append on replay (versions replay identically; no other batch's
    // versions can land inside the span)
    deleteVersionSpan(appendSpan(typed, keyCols), cfg, target, keyCols, dialect)
    Jdbc.append(survivors, cfg.url, target, cfg.driver, cfg.batchSize)
    deleteAtOrBelow(frontier, cfg, target, keyCols, dialect)
  }

  /**
   * Apply one typed change batch of a MUTABLE (update-in-place) table to the
   * JDBC target — the sink-side twin of `Cdc.applyMutable`, completing the
   * reference's apply-everything-to-the-target contract for the tables its
   * `tables_not_updated` list does NOT cover. Same per-key resolution
   * ([[Cdc.mutableLast]]): the last event decides, any batch INSERT
   * materializes the key, and pure-update chains move ONLY the chain's
   * changed columns:
   *
   *  - last DELETE → batched keyed DELETE;
   *  - last INSERT (or UPDATE after a batch INSERT) → delete-then-insert the
   *    final after-image: an idempotent REPLACE that also absorbs
   *    collision-INSERTs over an existing row;
   *  - pure-update chain → `UPDATE ... SET <changed cols> = ? WHERE key` —
   *    rows grouped by their changed-column mask, one PreparedStatement per
   *    mask (the row-store spelling of F8 elision: unchanged columns keep
   *    the TARGET's value without ever reading it); an update to an absent
   *    key matches zero rows — the same drop semantics as the batch apply.
   *
   * At-least-once replay converges: DELETE and REPLACE are idempotent, and
   * re-running an UPDATE rebinds the same values. No statement reads the
   * target, so cost is one round of batched writes per category — never a
   * target scan.
   */
  def applyMutable(typed: DataFrame, cfg: SinkConfig, table: String,
      keyCols: Seq[String]): Unit = {
    val target = cfg.tablePrefix + table
    val dialect = JdbcDialects.get(cfg.url)
    val dataCols = Schemas.tableSchemas(table).fields.map(_.name)
      .filterNot(_ == Schemas.VersionCol).toSeq
    val last = Cdc.mutableLast(typed, keyCols, dataCols).persist()
    try {
      val afterCols = dataCols.map(c => col("after").getField(c).as(c))
      val keyFromKd = keyCols.map(k => col(s"__key_$k").as(k))
      // schema-only append first: Spark's JDBC append creates the table on
      // first contact, so the statements below always have a target
      Jdbc.append(typed.filter(lit(false)).select(afterCols: _*),
        cfg.url, target, cfg.driver, cfg.batchSize)
      val delSql = s"DELETE FROM $target WHERE " +
        keyCols.map(k => s"${dialect.quoteIdentifier(k)} = ?").mkString(" AND ")
      batchedDelete(last.filter(col("op") === "DELETE").select(keyFromKd: _*),
        cfg, delSql, nKeys = keyCols.size, nVersions = 0)
      val repl = last.filter(col("op") === "INSERT" ||
        (col("op") === "UPDATE" && col("__had_insert")))
      batchedDelete(repl.select(keyFromKd: _*), cfg, delSql, keyCols.size, 0)
      Jdbc.append(repl.select(afterCols: _*), cfg.url, target, cfg.driver,
        cfg.batchSize)
      val updRows = last.filter(col("op") === "UPDATE" && !col("__had_insert"))
        .select(dataCols.map(c => col("after").getField(c).as(c)) ++
          dataCols.map(c => col(s"__chg_$c").as(s"__chg_$c")) ++ keyFromKd: _*)
      batchedUpdate(updRows, cfg, target, dialect, dataCols.size, keyCols.size)
    } finally last.unpersist(blocking = false)
  }

  /** Per-mask batched UPDATEs: row layout is [n after-values][n changed
    * flags][k keys]; each distinct changed-column mask gets one cached
    * PreparedStatement per partition. All-unchanged rows are no-ops and
    * skipped. */
  private def batchedUpdate(frame: DataFrame, cfg: SinkConfig, target: String,
      dialect: JdbcDialect, nData: Int, nKeys: Int): Unit = {
    val (url, driver, batch) = (cfg.url, cfg.driver, cfg.batchSize)
    val setFrags = frame.columns.take(nData)
      .map(c => s"${dialect.quoteIdentifier(c)} = ?")
    val whereFrag = frame.columns.takeRight(nKeys)
      .map(k => s"${dialect.quoteIdentifier(k)} = ?").mkString(" AND ")
    val perPartition: Iterator[Row] => Unit = { rows =>
      if (rows.hasNext) {
        driver.foreach(Class.forName(_))
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          val stmts = scala.collection.mutable.Map
            .empty[String, java.sql.PreparedStatement]
          val counts = scala.collection.mutable.Map.empty[String, Int]
          try {
            rows.foreach { r =>
              val changed = (0 until nData).filter(i => r.getBoolean(nData + i))
              if (changed.nonEmpty) {
                val mask = changed.mkString(",")
                val st = stmts.getOrElseUpdate(mask, conn.prepareStatement(
                  s"UPDATE $target SET " + changed.map(setFrags).mkString(", ") +
                    s" WHERE $whereFrag"))
                var p = 1
                changed.foreach { i => bindValue(st, p, r, i); p += 1 }
                (0 until nKeys).foreach { j =>
                  st.setObject(p, r.get(2 * nData + j)); p += 1 }
                st.addBatch()
                val c = counts.getOrElse(mask, 0) + 1
                counts(mask) = c
                if (c % batch == 0) st.executeBatch()
              }
            }
            stmts.values.foreach(_.executeBatch())
          } finally stmts.values.foreach(_.close())
        } finally conn.close()
      }
    }
    frame.foreachPartition(perPartition)
  }

  /** Null-safe bind: nulls go through setNull with the statement's own
    * parameter type (portable across drivers that reject untyped nulls);
    * Byte widens to Short (several targets, Derby included, have no
    * TINYINT). */
  private def bindValue(st: java.sql.PreparedStatement, p: Int, r: Row,
      i: Int): Unit =
    if (r.isNullAt(i)) st.setNull(p, st.getParameterMetaData.getParameterType(p))
    else r.get(i) match {
      case b: java.lang.Byte => st.setShort(p, b.shortValue())
      case v => st.setObject(p, v)
    }

  /** Ledger append into the target database (S8 target-side audit). */
  def appendLedger(ledgerRow: DataFrame, cfg: SinkConfig): Unit =
    Jdbc.append(ledgerRow, cfg.url, cfg.tablePrefix + "log_replication",
      cfg.driver, cfg.batchSize)

  /** Per-key [min, max] engine-version span of the batch's appends
    * (a superset of the surviving appends — safe to scrub, since only this
    * batch's rows can carry versions inside its own span). */
  private def appendSpan(changes: DataFrame, keyCols: Seq[String]): DataFrame =
    changes.filter(col("op") =!= "DELETE")
      .select(keyCols.map(k => col("after").getField(k).as(k)) :+
        col(Schemas.VersionCol).as("__v"): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(min(col("__v")).as("__v_lo"), max(col("__v")).as("__v_hi"))

  /** Version-qualified batched DELETE mutations (key = ? AND v <= ?), one
    * connection per partition of the frontier frame. */
  private def deleteAtOrBelow(frontier: DataFrame, cfg: SinkConfig,
      target: String, keyCols: Seq[String], dialect: JdbcDialect): Unit = {
    val sql = s"DELETE FROM $target WHERE " +
      keyCols.map(k => s"${dialect.quoteIdentifier(k)} = ?").mkString(" AND ") +
      s" AND ${dialect.quoteIdentifier(Schemas.VersionCol)} <= ?"
    batchedDelete(frontier.select(keyCols.map(col) :+ col("__del_v"): _*),
      cfg, sql, nKeys = keyCols.size, nVersions = 1)
  }

  /** Replay scrub: `key = ? AND v BETWEEN ? AND ?` batched deletes. */
  private def deleteVersionSpan(span: DataFrame, cfg: SinkConfig,
      target: String, keyCols: Seq[String], dialect: JdbcDialect): Unit = {
    val v = dialect.quoteIdentifier(Schemas.VersionCol)
    val sql = s"DELETE FROM $target WHERE " +
      keyCols.map(k => s"${dialect.quoteIdentifier(k)} = ?").mkString(" AND ") +
      s" AND $v >= ? AND $v <= ?"
    batchedDelete(span.select(keyCols.map(col) :+ col("__v_lo") :+ col("__v_hi"): _*),
      cfg, sql, nKeys = keyCols.size, nVersions = 2)
  }

  /** Executes a keyed DELETE statement per row of `frame`: the first `nKeys`
    * columns bind as objects, the trailing `nVersions` columns as longs. */
  private def batchedDelete(frame: DataFrame, cfg: SinkConfig, sql: String,
      nKeys: Int, nVersions: Int): Unit = {
    val (url, driver, batch) = (cfg.url, cfg.driver, cfg.batchSize)
    val perPartition: Iterator[Row] => Unit = { rows =>
      if (rows.hasNext) {
        driver.foreach(Class.forName(_))
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          val st = conn.prepareStatement(sql)
          try {
            var n = 0
            rows.foreach { r =>
              (0 until nKeys).foreach(i => st.setObject(i + 1, r.get(i)))
              (0 until nVersions).foreach(i =>
                st.setLong(nKeys + i + 1, r.getLong(nKeys + i)))
              st.addBatch()
              n += 1
              if (n % batch == 0) st.executeBatch()
            }
            st.executeBatch()
          } finally st.close()
        } finally conn.close()
      }
    }
    frame.foreachPartition(perPartition)
  }
}
