package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every implemented operator from SURVEY.md §2 is registered here with a
  * DuckDB oracle (or a rows-only check where the operator is not
  * SQL-expressible). */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * J1 latest-record-wins — the single most load-bearing operator of the
    * reference (SURVEY.md §2.4 dedup note). */
  def entry(spark: SparkSession): DataFrame =
    RefWorkload.j1LatestRecord(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RefWorkload.queries ++ TpchWorkload.queries ++ CdcWorkload.queries ++
      LlmWorkload.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RefWorkload.oracles ++ TpchWorkload.oracles ++ CdcWorkload.oracles ++
      LlmWorkload.oracles
}
