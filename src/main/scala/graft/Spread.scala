package graft

import org.apache.spark.sql.{Column, DataFrame}

/** Pre-blowup rebalancing. A row-multiplying operator (shingle/gram explode,
  * centroid cross join) inherits the parallelism of its INPUT partitioning —
  * a small corpus read is often one parquet file, one scan partition, so the
  * expensive exploded work would run on a single core. Repartitioning the
  * cheap pre-explode side fixes that, but it must pin an EXPLICIT partition
  * count: an expression-only `repartition(col)` is AQE-coalescible, and a
  * kilobyte-sized pre-explode frame gets merged straight back to one
  * partition — silently undoing the spread. */
object Spread {
  /** Hash-repartition on `key` with the session's default parallelism. */
  def byKey(df: DataFrame, key: Column): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, key)
}
