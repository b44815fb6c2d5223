package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Caching

/**
 * Exact order statistics at scale — sort the sliver, not the column.
 *
 * `percentile(col, q)` buffers every value in the aggregation (a 100 TB
 * column cannot be buffered); a full `orderBy` + rank walk sorts the world
 * for two numbers. This operator gets the EXACT rank-k value in three
 * bounded passes:
 *
 *  1. one scan: row count n + a `percentile_approx` BRACKET around each
 *     requested quantile (q ± 4/accuracy — the sketch's documented rank
 *     error is n/accuracy, so the true rank-⌈q·n⌉ value provably lies
 *     inside the bracket);
 *  2. one scan: `count(v < bracket_lo)` for every quantile (conditional
 *     sums, all quantiles in the same pass);
 *  3. per quantile: sort ONLY the in-bracket rows (≈ 8n/accuracy of them)
 *     and take element (k − below) — `limit` + `max`, never a global sort.
 *
 * The handful of driver-collected numbers (n, brackets, below-counts) are
 * sketch-sized metadata, the same budget as a KMV summary row. Quantile
 * definition: type-1 (value at rank ⌈q·n⌉ of the ascending order, 1-based)
 * — exact, merge-friendly, no float interpolation.
 */
object ExactQuantile {

  /** Exact type-1 quantile values for `qs` (each in (0, 1]). Returns one
    * value per q, in input order. Null values are excluded; empty input
    * throws. */
  def values(df: DataFrame, valueCol: String, qs: Seq[Double],
      accuracy: Int = 10000): Seq[Double] = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0), s"bad qs: $qs")
    val v = Caching.scoped(
      df.select(col(valueCol).cast("double").as("v")).filter(col("v").isNotNull))
    val slack = 4.0 / accuracy
    val loHiQs = qs.flatMap(q =>
      Seq(math.max(slack / 4, q - slack), math.min(1.0, q + slack)))
    val stats = v.agg(count(lit(1)).as("n"),
      percentile_approx(col("v"), typedlit(loHiQs), lit(accuracy)).as("b"))
      .head()
    val n = stats.getAs[Long]("n")
    require(n > 0, s"exact quantile of an empty column: $valueCol")
    val brackets = stats.getAs[scala.collection.Seq[Double]]("b")
    val ks = qs.map(q => math.ceil(q * n).toLong)

    val belowAggs = qs.indices.map(i =>
      sum(when(col("v") < brackets(2 * i), 1L).otherwise(0L)).as(s"below_$i"))
    val below = v.agg(belowAggs.head, belowAggs.tail: _*).head()

    qs.indices.map { i =>
      val (lo, hi) = (brackets(2 * i), brackets(2 * i + 1))
      val take = ks(i) - below.getAs[Long](s"below_$i")
      require(take > 0, s"bracket below rank for q=${qs(i)}")
      require(take <= Int.MaxValue,
        s"bracket sliver too large (raise accuracy so n/accuracy fits a node)")
      v.filter(col("v") >= lo && col("v") <= hi)
        .orderBy(col("v").asc).limit(take.toInt)
        .agg(max(col("v"))).head().getDouble(0)
    }
  }
}
