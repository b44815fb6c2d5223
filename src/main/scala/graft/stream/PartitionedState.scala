package graft.stream

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.cdc.Cdc
import graft.model.Schemas

/**
 * Month-partitioned table state with partition-pruned apply — the 100 TB
 * answer to "full-outer-join the entire state with every micro-batch".
 *
 * The reference's own DDL points the way: every hot table is
 * `PARTITION BY toYYYYMM(<time col>)` (reference:
 * script_create_clickhouse_table.sql:97, 154, 173) and its purge/delete
 * queries carry date-range predicates so ClickHouse touches only the
 * partitions involved (reference: _settings.py:234-236). Here:
 *
 *  - state lives as parquet partitioned by `yyyymm` derived from the table's
 *    partition column (Schemas.tableMeta.partitionCol);
 *  - a change batch first yields its TOUCHED month set (from the row images —
 *    the union of before- and after-image months, so a row migrating across
 *    months invalidates both sides);
 *  - only those partitions are read (Catalyst prunes the scan: the month
 *    filter is a partition predicate, so untouched months cost zero I/O);
 *  - the applied result is written back with dynamic partition overwrite —
 *    untouched month directories are never rewritten.
 *
 * At a 1000-executor / 100 TB scale this turns per-batch cost from
 * O(total state) into O(state of months with changes) — for CDC traffic that
 * is concentrated in the current month, effectively O(one partition).
 *
 * Crash semantics: partition overwrites are NOT atomic across months — a
 * crash mid-write leaves some touched months new and some old. That is safe
 * by the same contract the reference leans on (ReplacingMergeTree +
 * at-least-once, reference: README.md:358-362): the streaming checkpoint
 * has not committed the batch, so the whole batch re-applies on restart,
 * and the apply is convergent — INSERT/UPDATE land absolute after-images
 * (idempotent on the mutable path; duplicate same-version physical rows on
 * the versioned path, which latest-wins ignores and ST8 compaction removes),
 * DELETEs are naturally idempotent. Pinned by the replay test in
 * PartitionedStateSpec.
 */
object PartitionedState {

  val PartCol = "yyyymm"

  private def monthOf(c: org.apache.spark.sql.Column) = date_format(c, "yyyyMM")

  /** Initialize (or fully rewrite) partitioned state from a frame. */
  def init(df: DataFrame, dir: String, dateCol: String): Unit =
    df.withColumn(PartCol, monthOf(col(dateCol)))
      .write.partitionBy(PartCol).mode("overwrite").parquet(dir)

  /** Read only the given months of state (partition-pruned scan). */
  def readMonths(spark: SparkSession, dir: String, schema: StructType,
      months: Seq[String]): DataFrame = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      spark.read.schema(StructType(schema.fields :+
          org.apache.spark.sql.types.StructField(PartCol, org.apache.spark.sql.types.StringType)))
        .parquet(dir)
        .filter(col(PartCol).isin(months: _*))
        .drop(PartCol)
  }

  /** The months a change batch touches: the UNION of before- and after-image
    * months — an UPDATE that moves a row's partition column must invalidate
    * both the partition it leaves and the one it enters. */
  def touchedMonths(changes: DataFrame, dateCol: String): Seq[String] =
    changes.select(explode(array(
        monthOf(col("after").getField(dateCol)),
        monthOf(col("before").getField(dateCol)))).as(PartCol))
      .where(col(PartCol).isNotNull)
      .distinct().collect().map(_.getString(0)).toSeq.sorted

  /**
   * Partition-pruned versioned apply: read only touched months, apply the
   * batch, rewrite only those months (dynamic partition overwrite).
   * Returns the touched month list (for observability/tests).
   */
  def applyVersioned(spark: SparkSession, dir: String, schema: StructType,
      changes: DataFrame, keyCols: Seq[String], dateCol: String,
      deleteDateCol: Option[String] = None,
      now: org.apache.spark.sql.Column = current_timestamp(),
      maxAgeDays: Int = 31): Seq[String] = {
    val months = touchedMonths(changes, dateCol)
    if (months.isEmpty) return months
    val state = readMonths(spark, dir, schema, months)
    val next = Cdc.applyVersioned(state, changes, keyCols, deleteDateCol, now, maxAgeDays)
      // sever lineage from the directory being rewritten (cannot overwrite a
      // path while a lazy plan still reads it)
      .localCheckpoint(true)
    writeTouched(spark, next, dir, dateCol, months)
    months
  }

  /** Same discipline for the mutable apply path. */
  def applyMutable(spark: SparkSession, dir: String, schema: StructType,
      changes: DataFrame, keyCols: Seq[String], dateCol: String): Seq[String] = {
    val months = touchedMonths(changes, dateCol)
    if (months.isEmpty) return months
    val state = readMonths(spark, dir, schema, months)
    val next = Cdc.applyMutable(state, changes, keyCols).localCheckpoint(true)
    writeTouched(spark, next, dir, dateCol, months)
    months
  }

  /** Dynamic-overwrite the partitions `next` lands in; a touched month that
    * ends up with ZERO rows is not in `next` at all, so its stale partition
    * directory is deleted explicitly. */
  private def writeTouched(spark: SparkSession, next: DataFrame, dir: String,
      dateCol: String, touched: Seq[String]): Unit = {
    val withPart = next.withColumn(PartCol, monthOf(col(dateCol)))
    val remaining = withPart.select(col(PartCol)).distinct()
      .collect().map(_.getString(0)).toSet
    // per-write dynamic overwrite (the option beats the session conf,
    // SPARK-20236) — a session-conf toggle is not safe under concurrent
    // writers sharing the session (ADVICE round 9)
    withPart.write.partitionBy(PartCol).mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").parquet(dir)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    touched.filterNot(remaining).foreach { m =>
      fs.delete(new Path(s"$dir/$PartCol=$m"), true)
    }
  }

}
