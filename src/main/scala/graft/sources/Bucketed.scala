package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bucketed-table helpers: co-located fact⋈fact joins without a shuffle.
 *
 * At 100 TB the orders⋈lineitem class of join is the dominant shuffle; if
 * both sides are written bucketed by the join key into the warehouse
 * catalog, Spark's scan reports the bucket hash-partitioning and the
 * SortMergeJoin consumes both sides with NO Exchange — the single biggest
 * plan improvement available to a recurring join (SURVEY.md §4 / build
 * brief: "co-locate joins via bucketing"). The reference delegates this to
 * ClickHouse's ORDER BY-keyed storage; this is the Spark-native analogue.
 */
object Bucketed {

  /** Persist `df` as a bucketed catalog table (sorted within buckets so the
    * merge join needs no per-task sort either). */
  def save(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — plans shuffle-free when
    * both were bucketed with the same bucket count. */
  def join(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(left)
    val r = spark.table(right)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
