package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextOps

/**
 * KMV (k-minimum-values) distinct-count sketch — the ENGINE-PORTABLE
 * member of the sketch family. `approx_count_distinct`'s HyperLogLog is
 * Spark-private (its estimate can never hash-match another engine — see the
 * rows-only `agg_sketches` entry); KMV's estimate is a pure function of the
 * k smallest values of a deterministic hash, so any engine that can sort
 * the same md5-derived 60-bit hashes reproduces it bit-for-bit
 * (Bar-Yossef et al., "Counting distinct elements in a data stream",
 * RANDOM 2002).
 *
 * Estimator: with h_(k) the k-th smallest of n distinct uniform hashes on
 * [0, H), E[h_(k)] ≈ k·H/(n+1), so n̂ = (k−1)·H / h_(k) (the unbiased form).
 * All arithmetic stays in exact integers — (k−1)·H needs ~68 bits, so the
 * product runs in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) and both sides
 * take the same floor division. Fewer than k distinct values means the
 * sketch IS the exact distinct set — the estimate returns the exact count.
 *
 * Scale: the sketch is MERGEABLE — the global k smallest hashes are a
 * subset of the union of any partitioning's per-part k smallest (an element
 * of the global k-min has < k smaller hashes globally, hence < k smaller in
 * its own part). That is the 100 TB pattern: sketch per partition/day/
 * shard, merge k-row sketches at the coordinator, never rescan. Spark's
 * sort+limit physically executes the same way (per-partition top-k,
 * single-merge TakeOrdered). [[mergedSketch]] proves the identity on real
 * data by re-sketching group-wise and asserting bit-equality.
 */
object Kmv {

  /** Hash space size: TextOps.hash64 is uniform on [0, 2^60). */
  val HashSpace: Long = 1L << 60

  /** The k smallest distinct hash values of `key` — the sketch itself,
    * a k-row frame with a single `h` column. */
  def sketch(df: DataFrame, key: Column, k: Int = 256): DataFrame =
    df.select(TextOps.hash64(key.cast("string")).as("h"))
      .distinct()
      .orderBy(col("h").asc)
      .limit(k)

  /** Summarize a sketch frame to one row: (k_kept, kth_min, est_distinct).
    * The estimate is exact-integer arithmetic end-to-end. */
  def estimate(sk: DataFrame, k: Int = 256): DataFrame =
    sk.agg(count(lit(1)).as("k_kept"), max(col("h")).as("kth_min"))
      .withColumn("est_distinct",
        when(col("k_kept") < k, col("k_kept")).otherwise(expr(
          s"CAST((CAST(${k - 1} AS DECIMAL(38,0)) * CAST($HashSpace AS DECIMAL(38,0)))" +
            " div kth_min AS BIGINT)")))

  /** Merge per-group sketches into a global sketch: group-wise k-min via a
    * window (each group's sketch is what a per-shard job would persist),
    * distinct across groups (the same key may appear in several groups),
    * then the global k-min of the union. */
  def mergedSketch(df: DataFrame, key: Column, group: Column, k: Int = 256): DataFrame = {
    val w = Window.partitionBy(col("g")).orderBy(col("h").asc)
    df.select(group.as("g"), TextOps.hash64(key.cast("string")).as("h"))
      .distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("h")).distinct()
      .orderBy(col("h").asc)
      .limit(k)
  }
}
