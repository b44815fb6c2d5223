package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Corpus write layout — the sink-side half of the 100 TB story. A dataset
 * written as one directory of arbitrarily-sized files makes every
 * downstream scan pay: no partition pruning, stragglers from oversized
 * files, "too many parts" pressure from undersized ones (the reference's
 * ClickHouse sink documents exactly that failure mode,
 * reference: README.md:189-194).
 *
 * `writePartitioned` lays a frame out hive-partitioned with bounded file
 * sizes:
 *  - rows shuffle on (partition columns, deterministic spread bucket) so
 *    each partition's data is split across tasks — a hot partition value
 *    does not serialize through one writer;
 *  - `maxRecordsPerFile` hard-caps rows per file, so file count scales
 *    with data volume, not task count;
 *  - the returned report (per partition value: files, rows) is read back
 *    from the WRITTEN files — it audits what landed, not what was planned.
 *
 * Downstream, a filter on the partition columns prunes directories before
 * any IO (PartitionFilters in the scan), which is what makes the layout
 * worth the write-side shuffle.
 */
object Layout {

  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      maxRowsPerFile: Long, spreadBuckets: Int = 64): DataFrame = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    val spread = pmod(xxhash64(df.columns.map(col): _*), lit(spreadBuckets.toLong))
    df.withColumn("__spread", spread)
      .repartition((partitionCols.map(col) :+ col("__spread")): _*)
      .drop("__spread")
      .write
      .partitionBy(partitionCols: _*)
      .option("maxRecordsPerFile", maxRowsPerFile)
      .mode("overwrite")
      .parquet(path)
    df.sparkSession.read.parquet(path)
      .select(partitionCols.map(col) :+ input_file_name().as("__f"): _*)
      .groupBy(partitionCols.map(col): _*)
      .agg(countDistinct(col("__f")).as("n_files"), count(lit(1)).as("n_rows"))
  }
}
