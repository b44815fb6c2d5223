package graft.stream

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

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
 *    filtered by `Cdc.survivingAppends`) are untouched either way. The
 *    result is the same state `Cdc.applyVersioned` computes, so at-least-once
 *    replay converges identically.
 *
 * Scale notes: appends go through Spark's distributed JDBC writer (one
 * connection per partition); deletes run `foreachPartition` with batched
 * PreparedStatements — the delete frontier is one row per deleted key per
 * batch, orders of magnitude smaller than the append stream. Key columns are
 * primary keys in the reference schema (non-null by construction); a null
 * key would not match the `= ?` predicate, exactly like the reference's SQL.
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
    // append first: Spark's JDBC append creates the table on first contact,
    // so the delete mutation below always has a target to run against
    Jdbc.append(Cdc.survivingAppends(typed, keyCols), cfg.url, target,
      cfg.driver, cfg.batchSize)
    deleteAtOrBelow(Cdc.deleteFrontier(typed, keyCols), cfg, target, keyCols)
  }

  /** Ledger append into the target database (S8 target-side audit). */
  def appendLedger(ledgerRow: DataFrame, cfg: SinkConfig): Unit =
    Jdbc.append(ledgerRow, cfg.url, cfg.tablePrefix + "log_replication",
      cfg.driver, cfg.batchSize)

  /** Version-qualified batched DELETE mutations, one connection per
    * partition of the frontier frame. */
  private def deleteAtOrBelow(frontier: DataFrame, cfg: SinkConfig,
      target: String, keyCols: Seq[String]): Unit = {
    val sql = s"DELETE FROM $target WHERE " +
      keyCols.map(k => s""""$k" = ?""").mkString(" AND ") +
      s""" AND "${Schemas.VersionCol}" <= ?"""
    val (url, driver, batch) = (cfg.url, cfg.driver, cfg.batchSize)
    val nKeys = keyCols.size
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
                st.setLong(nKeys + 1, r.getLong(nKeys))
                st.addBatch()
                n += 1
                if (n % batch == 0) st.executeBatch()
              }
              st.executeBatch()
            } finally st.close()
          } finally conn.close()
        }
      }
    frontier.select(keyCols.map(col) :+ col("__del_v"): _*)
      .foreachPartition(perPartition)
  }
}
