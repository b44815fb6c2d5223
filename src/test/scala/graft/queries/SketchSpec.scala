package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Tolerance gate for the sketch aggregates: `agg_sketches` has no DuckDB
 * oracle (sketch algorithms differ across engines), so correctness is pinned
 * here against exact twins computed over the same table, using each sketch's
 * documented error bound:
 *  - `approx_count_distinct` default rsd = 5%: assert within 3σ = 15%
 *    relative error of the exact distinct count;
 *  - `percentile_approx(accuracy = 1000)` guarantees rank error ≤
 *    1/accuracy: assert the approx value is bracketed by the exact
 *    percentiles at q ± 4/accuracy (4× slack on the documented bound).
 * The twins live here rather than in the benched entry: mixing countDistinct
 * and exact percentile into the sketch aggregation forces an expand + value-
 * buffering sort aggregate (~3× slower at bench scale).
 */
class SketchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("sketch aggregates stay inside their documented error bounds") {
    val row = TpchWorkload.sketchAggs(spark, dir).collect().head
    val approxOrders = row.getAs[Long]("approx_orders").toDouble
    val exactOrders = Tables(spark, dir, "lineitem")
      .agg(countDistinct(col("l_orderkey"))).collect().head.getLong(0).toDouble
    assert(math.abs(approxOrders - exactOrders) / exactOrders <= 0.15,
      s"HLL outside 3σ: approx=$approxOrders exact=$exactOrders")

    val brackets = Tables(spark, dir, "lineitem").agg(
      expr("percentile(l_extendedprice, 0.496)").as("p50_lo"),
      expr("percentile(l_extendedprice, 0.504)").as("p50_hi"),
      expr("percentile(l_extendedprice, 0.986)").as("p99_lo"),
      expr("percentile(l_extendedprice, 0.994)").as("p99_hi")).collect().head
    val p50 = row.getAs[Double]("p50_price")
    val p99 = row.getAs[Double]("p99_price")
    assert(p50 >= brackets.getAs[Double]("p50_lo") &&
      p50 <= brackets.getAs[Double]("p50_hi"),
      s"p50 approx $p50 outside rank-error bracket")
    assert(p99 >= brackets.getAs[Double]("p99_lo") &&
      p99 <= brackets.getAs[Double]("p99_hi"),
      s"p99 approx $p99 outside rank-error bracket")
  }

  test("KMV sketch: estimate near exact, merge bit-identical, small-n exact") {
    val row = TpchWorkload.kmvSketch(spark, dir).collect().head
    assert(row.getAs[Boolean]("merge_exact"),
      "per-group sketch merge must reproduce the direct global sketch")
    val exact = Tables(spark, dir, "lineitem")
      .agg(countDistinct(col("l_orderkey"))).collect().head.getLong(0).toDouble
    val est = row.getAs[Long]("est_distinct").toDouble
    // k=256 → stderr ≈ 1/√(k−2) ≈ 6.3%; assert within 3σ = 19%
    assert(math.abs(est - exact) / exact <= 0.19,
      s"KMV estimate $est outside 3σ of exact $exact")

    // fewer distinct values than k: the sketch is the exact set
    import spark.implicits._
    val tiny = Seq.tabulate(40)(i => i % 10).toDF("v")
    val one = graft.operators.Kmv.estimate(
      graft.operators.Kmv.sketch(tiny, col("v"), k = 256), k = 256).collect().head
    assert(one.getAs[Long]("k_kept") == 10L &&
      one.getAs[Long]("est_distinct") == 10L)
  }
}
