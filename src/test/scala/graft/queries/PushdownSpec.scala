package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Positive plan-quality guard — the inverse of PlanGuardSpec: instead of
 * banning bad operators, it asserts the properties a 100 TB plan MUST have
 * (filters reaching the parquet scan, column pruning, broadcast dimension
 * joins, two-phase aggregation, whole-stage codegen). A regression that
 * silently turns a pushed filter into a post-scan filter fails `sbt test`.
 */
class PushdownSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("filter pushdown and column pruning reach the parquet scan") {
    val df = Tables(spark, dir, "lineitem")
      .filter(col("l_quantity") > 30)
      .select("l_orderkey", "l_quantity")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("GreaterThan(l_quantity"), plan)
    assert(!plan.contains("l_comment"),
      "scan must not read columns the query never touches")
  }

  test("partition-style min/max skipping: IsNotNull also pushed") {
    val plan = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") === "1995-01-01")
      .select("o_orderkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("EqualTo(o_orderdate"), plan)
  }

  test("the revenue join broadcasts the dimension side") {
    val plan = TpchWorkload.joinRevenueByNation(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("aggregations are two-phase (map-side partial before the exchange)") {
    val plan = RefWorkload.a5DayHistogram(spark, dir)
      .queryExecution.executedPlan.toString
    // partial + final HashAggregate around a single shuffle
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("q3: both date filters push into their fact scans; top-k plans as TakeOrdered") {
    val plan = TpchWorkload.q3ShippingPriority(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThan(l_shipdate"), plan)
    assert(plan.contains("LessThan(o_orderdate"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("hot-path expressions run inside whole-stage codegen") {
    // the pre-explode spread gives the plan an exchange, so AQE wraps it and
    // the codegen "*(n)" markers only appear in the FINAL adaptive plan —
    // execute first, then read the plan
    val df = LlmWorkload.textStats(spark, dir)
    df.collect() // a write would plan its own QueryExecution; collect finalizes THIS one
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), plan)
    assert(plan.contains("*("), plan)
  }
}
