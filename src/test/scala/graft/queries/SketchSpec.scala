package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Tolerance gate for the sketch aggregates. `agg_sketches` emits the exact
 * distinct twin plus per-sketch within-tolerance booleans (which the DuckDB
 * oracle pins at TRUE); this spec independently re-derives the exact twin
 * and asserts the query's verdicts, so a regression in either the sketch or
 * the comparison logic fails here before it fails the oracle gate:
 *  - `approx_count_distinct(rsd = 0.02)`: flagged within 10% (5σ) of exact;
 *  - `percentile_approx(accuracy = 1000)` guarantees rank error ≤
 *    1/accuracy — far tighter than the 5% value tolerance flagged.
 */
class SketchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("sketch aggregates report exact twin + in-tolerance verdicts") {
    val row = TpchWorkload.sketchAggs(spark, dir).collect().head
    val exactOrders = Tables(spark, dir, "lineitem")
      .agg(countDistinct(col("l_orderkey"))).collect().head.getLong(0)
    assert(row.getAs[Long]("exact_orders") == exactOrders)
    assert(row.getAs[Boolean]("cd_within_10pct"), "HLL outside 10% of exact")
    assert(row.getAs[Boolean]("p50_within_5pct"), "p50 approx outside 5%")
    assert(row.getAs[Boolean]("p99_within_5pct"), "p99 approx outside 5%")
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
