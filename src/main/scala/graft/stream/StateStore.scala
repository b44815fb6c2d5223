package graft.stream

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * Parquet-backed table state with atomic replace.
 *
 * A micro-batch apply reads the current state and writes the next one; Spark
 * cannot overwrite a path that the plan is still lazily reading, so the next
 * state is written to a sibling temp dir and swapped in with two renames —
 * the same read-new/swap discipline a 100 TB deployment would use (there per
 * partition, see [[PartitionedState]]), and crash-safe in the sense that the
 * previous state dir is intact until the new one is fully written.
 */
object StateStore {

  /** Read the state at `dir`, or an empty frame of `schema` if absent.
    * Crash recovery: if a previous replace() died between its two renames,
    * the data sits intact at `dir.__old` — roll it back rather than silently
    * reporting empty state (which the next apply would persist as truth). */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new Path(dir + ".__old")
    if (!fs.exists(path) && fs.exists(old)) {
      // Hadoop rename reports failure by RETURNING false — falling through
      // would re-introduce the silent-empty-state bug the rollback prevents
      require(fs.rename(old, path), s"state rollback failed: $old -> $path")
    }
    if (fs.exists(path)) spark.read.schema(schema).parquet(dir)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Replace the state at `dir` with `df` (write-new-then-swap). */
  def replace(df: DataFrame, dir: String): Unit = {
    val spark = df.sparkSession
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir + ".__next")
    val old = new Path(dir + ".__old")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    df.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(path)) require(fs.rename(path, old), s"swap-out failed: $path -> $old")
    require(fs.rename(tmp, path), s"swap-in failed: $tmp -> $path")
    fs.delete(old, true)
  }
}
