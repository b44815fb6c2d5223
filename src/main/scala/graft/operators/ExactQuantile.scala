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

    // all quantile slivers resolve in ONE action (see rankRows): a union of
    // per-quantile filter→sort→limit→max branches
    val branches = qs.indices.map { i =>
      val (lo, hi) = (brackets(2 * i), brackets(2 * i + 1))
      val take = ks(i) - below.getAs[Long](s"below_$i")
      require(take > 0, s"bracket below rank for q=${qs(i)}")
      require(take <= Int.MaxValue,
        s"bracket sliver too large (raise accuracy so n/accuracy fits a node)")
      v.filter(col("v") >= lo && col("v") <= hi)
        .orderBy(col("v").asc).limit(take.toInt)
        .agg(max(col("v")).as("b"))
        .select(lit(i).as("i"), col("b"))
    }
    val byIdx = branches.reduce(_.union(_)).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    qs.indices.map(byIdx)
  }

  /** The exact (value, tie) row at each requested 1-based rank of the
    * ascending (value, tie) lexicographic total order — the ntile-boundary
    * primitive. An unpartitioned `ntile(k)` window moves the whole table
    * through one task; the same exact buckets fall out of the k−1 boundary
    * rows at the cumulative bucket-size ranks ([[ntileBoundaryRanks]]),
    * assigned by comparison — so the only per-row work is a codegen'd
    * predicate chain and a hash aggregate, never a global sort.
    *
    * Same three bounded passes as [[values]]; because sorting by
    * (value, tie) refines sorting by value alone, the value-bracket from
    * pass 1 still provably contains the rank-k row of the refined order,
    * and only the ≈8n/accuracy in-bracket sliver is ever sorted. Both
    * columns must be non-null; `tieCol` must be unique for the boundaries
    * to define the exact ntile buckets. */
  def rankRows(df: DataFrame, valueCol: String, tieCol: String,
      ranks: Seq[Long], accuracy: Int = 10000): Seq[(Double, Long)] = {
    require(ranks.nonEmpty && ranks.forall(_ >= 1), s"bad ranks: $ranks")
    val v = Caching.scoped(df.select(
      col(valueCol).cast("double").as("v"), col(tieCol).cast("long").as("t")))
    val n = v.count()
    require(ranks.forall(_ <= n), s"rank beyond row count $n: $ranks")
    val slack = 4.0 / accuracy
    val loHiQs = ranks.flatMap { k =>
      val q = k.toDouble / n
      Seq(math.max(slack / 4, q - slack), math.min(1.0, q + slack))
    }
    val brackets = v
      .agg(percentile_approx(col("v"), typedlit(loHiQs), lit(accuracy)).as("b"))
      .head().getAs[scala.collection.Seq[Double]]("b")
    val belowAggs = ranks.indices.map(i =>
      sum(when(col("v") < brackets(2 * i), 1L).otherwise(0L)).as(s"below_$i"))
    val below = v.agg(belowAggs.head, belowAggs.tail: _*).head()
    // all boundary slivers resolve in ONE action: each rank's
    // filter→sort→limit→max pipeline is a union branch (identical per-rank
    // semantics and TakeOrdered memory bounds), so a 15-boundary ntile
    // costs one scheduled job instead of fifteen driver round trips
    val branches = ranks.indices.map { i =>
      val (lo, hi) = (brackets(2 * i), brackets(2 * i + 1))
      val take = ranks(i) - below.getAs[Long](s"below_$i")
      require(take > 0, s"bracket below rank ${ranks(i)}")
      require(take <= Int.MaxValue,
        s"bracket sliver too large (raise accuracy so n/accuracy fits a node)")
      v.filter(col("v") >= lo && col("v") <= hi)
        .orderBy(col("v").asc, col("t").asc).limit(take.toInt)
        .agg(max(struct(col("v"), col("t"))).as("b"))
        .select(lit(i).as("i"), col("b"))
    }
    val byIdx = branches.reduce(_.union(_)).collect()
      .map(r => r.getInt(0) -> r.getStruct(1)).toMap
    ranks.indices.map { i =>
      val r = byIdx(i)
      // an empty bracket means the sketch broke its documented error bound
      // (the filter matched nothing and max(struct) returned null) — name
      // the rank and bracket instead of an opaque NPE downstream
      require(r != null,
        s"empty bracket [${brackets(2 * i)}, ${brackets(2 * i + 1)}] for rank " +
          s"${ranks(i)}: percentile sketch exceeded its error bound " +
          s"(accuracy=$accuracy, n=$n)")
      (r.getDouble(0), r.getLong(1))
    }
  }

  /** Cumulative bucket-end ranks of `ntile(buckets)` over `n` rows: the
    * first `n % buckets` buckets carry one extra row (SQL-standard ntile,
    * identical in Spark and DuckDB). Returns `buckets − 1` boundary ranks —
    * rows at rank ≤ ranks(i−1) belong to buckets ≤ i. */
  def ntileBoundaryRanks(n: Long, buckets: Int): Seq[Long] = {
    require(n > 0 && buckets > 1, s"ntile over n=$n buckets=$buckets")
    val base = n / buckets
    val rem = n % buckets
    (1 until buckets).map(i => base * i + math.min(i.toLong, rem))
  }
}
