package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * JDBC source/sink — the engine's stand-in for the reference's MySQL reads
 * and batched ClickHouse INSERT sink (S5/S6,
 * reference: matomo2clickhouse.py:401-472).
 *
 * Scale notes: reads support predicate/aggregate pushdown (probes execute on
 * the database, only the result crosses the wire) and partitioned parallel
 * reads via (partitionColumn, numPartitions) so a 1000-executor cluster
 * fans the table scan out; the sink batches `batchsize` rows per INSERT —
 * the reference found ~2,000 rows/statement optimal against its columnar
 * target (reference: _settings.py:75-77, README.md:398 ~12× speedup claim).
 */
object Jdbc {

  /** The reference's optimal rows-per-INSERT (reference: _settings.py:75-77). */
  val DefaultBatchSize = 2000

  private def props(driver: Option[String]): Properties = {
    val p = new Properties()
    driver.foreach(p.setProperty("driver", _))
    p
  }

  /** Full-table read; pass partitioning options for parallel scans at scale. */
  def readTable(spark: SparkSession, url: String, table: String,
      driver: Option[String] = None,
      partitionColumn: Option[(String, Long, Long, Int)] = None): DataFrame =
    partitionColumn match {
      case Some((col, lower, upper, n)) =>
        spark.read.jdbc(url, table, col, lower, upper, n, props(driver))
      case None => spark.read.jdbc(url, table, props(driver))
    }

  /** Point lookup / probe via a pushed-down query — the whole probe runs on
    * the source database (S5: sql_get_max_id / sql_count shapes,
    * reference: _settings.py:174-223). */
  def readQuery(spark: SparkSession, url: String, query: String,
      driver: Option[String] = None): DataFrame = {
    var r = spark.read.format("jdbc")
      .option("url", url)
      .option("query", query)
    driver.foreach(d => r = r.option("driver", d))
    r.load()
  }

  /** S5 — the max-id watermark probe, executed database-side. The column is
    * ANSI-quoted: Spark's JDBC writer creates case-preserved (quoted)
    * columns, which case-folding databases (Derby) would otherwise miss. */
  def maxId(spark: SparkSession, url: String, table: String, idCol: String,
      driver: Option[String] = None): Option[Long] = {
    val row = readQuery(spark, url,
      s"""SELECT MAX("$idCol") AS id_max FROM $table""", driver)
      .collect().headOption
    // MAX() comes back as whatever the dialect maps the column to — BIGINT
    // UNSIGNED is DecimalType(20,0), INT is IntegerType. Convert exactly:
    // a value above Long.MaxValue must fail loudly, not wrap negative into
    // a corrupt watermark
    row.flatMap(r => if (r.isNullAt(0)) None
      else Some(r.get(0) match {
        case d: java.math.BigDecimal => d.longValueExact()
        case d: scala.math.BigDecimal => d.bigDecimal.longValueExact()
        case n: Number => n.longValue()
      }))
  }

  /** S6 — batched append sink (multi-row INSERTs of `batchSize` rows). */
  def append(df: DataFrame, url: String, table: String,
      driver: Option[String] = None, batchSize: Int = DefaultBatchSize): Unit = {
    var w = df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize.toString)
      .mode("append")
    driver.foreach(d => w = w.option("driver", d))
    w.save()
  }
}
