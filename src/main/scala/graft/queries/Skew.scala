package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew mitigation for extreme hot keys: salt the skewed (large) side with a
 * random-but-deterministic salt derived from a row id, replicate the build
 * (small-to-medium) side once per salt value, and join on (key, salt) — the
 * hot key's rows spread over `salts` reducers instead of one.
 *
 * AQE's skew-join split (enabled in graft.Sessions) handles most skew at
 * runtime; this utility is for the pathological case AQE cannot split — a
 * single key too hot for any one partition even after splitting, on a join
 * AQE planned as sort-merge. Equivalence with the plain join is pinned by
 * SkewSpec.
 */
object Skew {

  /**
   * Inner equi-join `left ⋈ right` on `key`, salted over `salts` buckets.
   * `left` is the skewed probe side (salt from a deterministic hash of its
   * row content via monotonically-stable xxhash of the key + a disambiguator
   * column); `right` is replicated `salts` times.
   */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int, leftDisambig: String): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(col(key), col(leftDisambig)), lit(salts)))
    val replicated = right.crossJoin(
      broadcast(spark_range_df(right, salts)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  private def spark_range_df(ref: DataFrame, salts: Int): DataFrame =
    ref.sparkSession.range(salts).select(col("id").cast("long").as("__salt"))
}
