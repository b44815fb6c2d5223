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

  /** Join two bucketed tables on their bucket key. The co-location contract
    * is VALIDATED, not assumed: mismatched bucket counts (or an unbucketed
    * table) would silently re-introduce the shuffle this helper exists to
    * eliminate, so they fail loudly here instead. */
  def join(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame = {
    def spec(name: String) = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(name))
      .bucketSpec
    (spec(left), spec(right)) match {
      case (Some(ls), Some(rs)) =>
        require(ls.numBuckets == rs.numBuckets,
          s"bucket counts differ: $left=${ls.numBuckets} vs $right=${rs.numBuckets}")
        require(ls.bucketColumnNames == Seq(leftKey) &&
          rs.bucketColumnNames == Seq(rightKey),
          s"join keys must be the bucket columns: $left=${ls.bucketColumnNames} " +
            s"$right=${rs.bucketColumnNames}")
      case _ => throw new IllegalArgumentException(
        s"both tables must be bucketed: $left=${spec(left)} $right=${spec(right)}")
    }
    val l = spark.table(left)
    val r = spark.table(right)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
