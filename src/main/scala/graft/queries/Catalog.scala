package graft.queries

import org.apache.spark.sql.SparkSession

/**
 * DDL/metadata surface (SURVEY.md §2.11): the testdata tables as temp views
 * plus the reference's two latest-record views, so the whole workload is
 * reachable through `spark.sql` exactly as the reference's users reach it
 * through ClickHouse SQL (reference: script_create_clickhouse_table.sql:
 * 402-563 — `v_matomo_log_visit` / `v_matomo_log_link_visit_action`).
 */
object Catalog {

  val TableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every testdata table as a temp view, plus the latest-wins view
    * over the CDC log stand-in (the reference's GROUP-BY-max + self-join
    * formulation, verbatim shape: script_create_clickhouse_table.sql:484-494). */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    TableNames.foreach(t => Tables(spark, dir, t).createOrReplaceTempView(t))
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW v_events_latest AS
        |SELECT e.user_id, e.event_id, e.ts, e.event_type, e.value
        |FROM events e
        |JOIN (SELECT user_id, max(event_id) AS event_id
        |      FROM events GROUP BY user_id) m
        |  ON e.user_id = m.user_id AND e.event_id = m.event_id""".stripMargin)
  }
}
