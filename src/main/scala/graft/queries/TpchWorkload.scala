package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Join / aggregation / sort / set-operation coverage (SURVEY.md §2.3, §2.4,
 * §2.6, §2.7) exercised over the TPC-H-ish star schema.
 *
 * Determinism contract with the DuckDB oracle: double-typed measures are cast
 * to DECIMAL before aggregation (exact arithmetic in both engines, immune to
 * floating-point summation order across Spark partitions), then the final
 * result is cast back to DOUBLE so both sides emit the identical value and
 * schema.
 *
 * Scale notes: dimension tables (region/nation, and supplier/customer/part at
 * any realistic dim:fact ratio) are broadcast — no shuffle of the fact table
 * for dim joins; fact-fact joins (orders⋈lineitem) shuffle once on the join
 * key and AQE handles skew. Top-k uses sort+limit, which Spark plans as
 * TakeOrderedAndProject (per-partition heap, no global sort).
 */
object TpchWorkload {

  private def dec(c: String, p: Int = 18, s: Int = 2) = col(c).cast(s"decimal($p,$s)")

  /** A1/A2-family — grouped aggregation with multiple measures (pricing
    * summary; the dup-count A2 shape groupBy+count+HAVING at fact scale). */
  def aggPricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
        sum((dec("l_extendedprice") * (lit(1) - dec("l_discount", 4, 2)))).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))

  /** J-family — multi-way equi-join with broadcast dims: revenue by nation.
    * nation (25 rows) broadcasts; customer⋈orders and orders⋈lineitem
    * shuffle on their keys. */
  def joinRevenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables(spark, dir, "customer")
    val orders = Tables(spark, dir, "orders")
    val lineitem = Tables(spark, dir, "lineitem")
    val nation = Tables(spark, dir, "nation")
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec("l_extendedprice") * (lit(1) - dec("l_discount", 4, 2)))
        .cast("double").as("revenue"))
  }

  /** The classic shipping-priority shape (TPC-H Q3): segment-filtered
    * customers ⋈ open orders ⋈ late shipments, revenue per order, top 10.
    * The date filters push into both fact scans; the two fact joins shuffle
    * on the order key; top-k plans as TakeOrderedAndProject. */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = to_timestamp(lit("1998-06-01"))
    val cust = Tables(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val ord = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") < cutoff)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_orderpriority"))
    val li = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") > cutoff)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec("l_extendedprice") * (lit(1) - dec("l_discount", 4, 2)))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** The promotion-share shape (TPC-H Q14): ratio of PROMO-part revenue to
    * total revenue in one month — two conditional DECIMAL sums (exact under
    * any partitioning), one final IEEE division. part broadcasts. */
  def q14PromoShare(spark: SparkSession, dir: String): DataFrame = {
    val lo = to_timestamp(lit("1997-01-01")); val hi = to_timestamp(lit("1997-04-01"))
    val li = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
    val part = Tables(spark, dir, "part").select(col("p_partkey"), col("p_type"))
    val disc = dec("l_extendedprice") * (lit(1) - dec("l_discount", 4, 2))
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", disc).otherwise(lit(0).cast("decimal(18,2)")))
          .cast("double").as("promo_revenue"),
        sum(disc).cast("double").as("total_revenue"))
      .withColumn("promo_share", col("promo_revenue") / col("total_revenue"))
  }

  /** The local-supplier-volume snowflake (TPC-H Q5): region-filtered
    * nation/customer/supplier dims around two fact joins. The region filter
    * prunes through two broadcast dim joins BEFORE any fact shuffles; the
    * c_nationkey = s_nationkey locality predicate rides the order-key join.
    * Exercises every remaining dim table, region included. */
  def q5LocalSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val lo = to_timestamp(lit("1997-01-01")); val hi = to_timestamp(lit("1998-01-01"))
    val asiaNations = Tables(spark, dir, "nation")
      .join(broadcast(Tables(spark, dir, "region")
        .filter(col("r_name") === "ASIA")), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = Tables(spark, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
    val supp = Tables(spark, dir, "supplier")
      .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    val ord = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(cust, col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec("l_extendedprice") * (lit(1) - dec("l_discount", 4, 2)))
        .cast("double").as("revenue"))
  }

  /** Fuzzy entity matching over the part-name catalog: distinct normalized
    * names within 2 edits, via two linear sorted-neighborhood passes
    * (forward + reversed key) and exact Levenshtein verify
    * ([[graft.text.FuzzyMatch.nearNames]]). */
  def fuzzyNamePairs(spark: SparkSession, dir: String): DataFrame =
    graft.text.FuzzyMatch.nearNames(Tables(spark, dir, "part"), "p_name")

  /** The large-volume-customer shape (TPC-H Q18): a HAVING-filtered fact
    * aggregate reused as the driving side of a dimension join. The quantity
    * rollup shuffles once on the order key; only the (rare) qualifying
    * orders join onward, so the customer join's build side is tiny. */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(dec("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 250)
    Tables(spark, dir, "orders")
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"),
        col("sum_qty").cast("double").as("sum_qty"))
  }

  /** The top-supplier shape (TPC-H Q15): a quarter's per-supplier revenue
    * compared against its own global max — the classic aggregate-vs-scalar
    * self-comparison. DECIMAL revenue keeps the max-equality exact under
    * any partitioning; the 1-row max broadcasts. */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val lo = to_timestamp(lit("1997-01-01")); val hi = to_timestamp(lit("1997-04-01"))
    val rev = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .groupBy(col("l_suppkey"))
      .agg(sum(dec("l_extendedprice") * (lit(1) - dec("l_discount", 4, 2)))
        .as("rev"))
    val top = rev.agg(max(col("rev")).as("max_rev"))
    rev.join(broadcast(top), col("rev") === col("max_rev"))
      .join(Tables(spark, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("rev").cast("double").as("total_revenue"))
  }

  /** SRT3-family — top-k by aggregate (sort+limit → TakeOrderedAndProject). */
  def topCustomers(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer")
      .join(Tables(spark, dir, "orders"), col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(sum(dec("o_totalprice")).cast("double").as("total"))
      .orderBy(col("total").desc, col("c_custkey").asc)
      .limit(10)

  /** SRT3 per group — top-3 customers by order revenue WITHIN each nation:
    * one shuffle on the group key, rank inside the partition, never a global
    * sort (the global-top-k twin is `topk_customers`). */
  def topkPerNation(spark: SparkSession, dir: String): DataFrame = {
    val revenue = Tables(spark, dir, "customer")
      .join(Tables(spark, dir, "orders"), col("c_custkey") === col("o_custkey"))
      .join(broadcast(Tables(spark, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("c_custkey"))
      .agg(sum(dec("o_totalprice")).cast("double").as("total"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("n_name"))
      .orderBy(col("total").desc, col("c_custkey").asc)
    revenue.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("n_name"), col("c_custkey"), col("total"), col("rnk"))
  }

  /** The same per-nation top-3 as [[topkPerNation]], computed with the
    * native bounded aggregate ([[graft.functions.TopK]]) instead of a
    * window: map-side partial aggregation ships at most k pairs per
    * (nation × partition), so the exchange never carries the full customer
    * roll-up — the scale-safe spelling of `row_number() <= k`. Same rows,
    * same oracle. */
  def topkPerNationAgg(spark: SparkSession, dir: String): DataFrame = {
    val revenue = Tables(spark, dir, "customer")
      .join(Tables(spark, dir, "orders"), col("c_custkey") === col("o_custkey"))
      .join(broadcast(Tables(spark, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("c_custkey"))
      .agg(sum(dec("o_totalprice")).cast("double").as("total"))
    revenue.groupBy(col("n_name"))
      .agg(expr("graft_topk(total, c_custkey, 3)").as("top"))
      .select(col("n_name"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("n_name"), col("e.tie").as("c_custkey"),
        col("e.value").as("total"), (col("pos") + 1).cast("int").as("rnk"))
  }

  /** Pivot — event-type counts spread to columns per user: Spark's
    * `groupBy.pivot` with an EXPLICIT value list (no extra distinct pass,
    * deterministic column order). The oracle restates it as conditional
    * aggregation, which is exactly what the pivot lowers to. */
  def pivotEventTypes(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)

  /** J3-surface — LEFT SEMI: customers with at least one urgent order
    * (the purge IN-subquery shape, reference: _settings.py:233-257). */
  def semiJoinUrgentCustomers(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Tables(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("c_custkey"))
    Tables(spark, dir, "customer")
      .join(urgent, Seq("c_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
  }

  /** J4-surface — LEFT ANTI: customers with no orders (the CDC DELETE
    * anti-join shape, reference: binlog2sql_util.py:294-304). */
  def antiJoinNoOrders(spark: SparkSession, dir: String): DataFrame = {
    val orderCust = Tables(spark, dir, "orders").select(col("o_custkey").as("c_custkey"))
    Tables(spark, dir, "customer")
      .join(orderCust, Seq("c_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
  }

  /** SET-family — INTERSECT: customers who placed both a finished and an
    * open order (SURVEY.md §2.7; built-ins beyond the reference's UNION). */
  def setIntersectCustkeys(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey"))
      .intersect(o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("custkey")))
  }

  /** SET-family — EXCEPT: custkeys with finished orders but no open ones. */
  def setExceptCustkeys(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey"))
      .except(o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("custkey")))
  }

  /** A5/Q3-family — monthly order histogram with avg measure (the
    * toYYYYMM partition-key shape, reference: script_create_clickhouse_table.sql:97). */
  def monthlyOrders(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .groupBy(date_format(col("o_orderdate"), "yyyyMM").as("yyyymm"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec("o_totalprice")).cast("double").as("sum_price"))

  /** Grouping-sets surface (SURVEY.md §2.4 "built-ins exist" row): rollup
    * over (returnflag, linestatus) with exact decimal sums. */
  def rollupPricing(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(dec("l_quantity")).cast("double").as("sum_qty"),
        count(lit(1)).as("cnt"))

  /** CUBE — the full grouping-sets lattice over the same keys. */
  def cubePricing(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(dec("l_quantity")).cast("double").as("sum_qty"),
        count(lit(1)).as("cnt"))

  /** Analytic window surface beyond row_number (SURVEY.md §2.5 extended):
    * lag/lead, rank/dense_rank, and a bounded running-sum frame — per
    * customer over order time. One shuffle on the partition key. */
  def windowFuncs(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val wSum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir, "orders").select(
      col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
      lag(col("o_orderkey"), 1).over(w).as("prev_order"),
      lead(col("o_orderkey"), 1).over(w).as("next_order"),
      rank().over(w).as("rnk"),
      dense_rank().over(w).as("drnk"),
      sum(dec("o_totalprice")).over(wSum).cast("double").as("running_total"))
  }

  /** Distinct aggregation (SURVEY.md §2.4 extended row). */
  def distinctCounts(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .agg(countDistinct(col("o_custkey")).as("n_custs"),
        count(lit(1)).as("n_orders"))

  /** Sketch aggregates — HLL cardinality + t-digest-style quantiles —
    * pinned by an oracle-comparable tolerance check: the engine-private
    * approximations never leave the query; what's emitted is the EXACT
    * distinct count plus one boolean per sketch asserting the approx landed
    * within its documented error budget of the exact twin computed in the
    * same entry. DuckDB replays the exact count and pins every boolean at
    * TRUE, so the entry is rows+schema+hash comparable even though the
    * sketch algorithms differ across engines. The aggregations stay three
    * separate 1-row plans (crossJoined) so the HLL keeps its partial-agg
    * shape instead of the expand a mixed distinct+value aggregate forces;
    * `SketchSpec` still pins the numeric error bounds directly. */
  def sketchAggs(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    // exact quantile twins via bracket-then-sort-the-sliver (never buffers
    // the column the way `percentile()` would — see graft.operators
    // .ExactQuantile); type-1 ranks, well inside the 5% tolerance
    val Seq(p50, p99) = graft.operators.ExactQuantile.values(
      li, "l_extendedprice", Seq(0.5, 0.99))
    val approx = li.agg(
      approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("ap50"),
      percentile_approx(col("l_extendedprice"), lit(0.99), lit(1000)).as("ap99"))
    val exactCd = li.select(col("l_orderkey")).distinct()
      .agg(count(lit(1)).as("exact_orders"))
    approx.crossJoin(exactCd)
      .select(col("exact_orders"),
        (abs(col("approx_orders") - col("exact_orders"))
          <= col("exact_orders") * lit(0.10)).as("cd_within_10pct"),
        (abs(col("ap50") - lit(p50)) <= lit(math.abs(p50) * 0.05))
          .as("p50_within_5pct"),
        (abs(col("ap99") - lit(p99)) <= lit(math.abs(p99) * 0.05))
          .as("p99_within_5pct"))
  }

  /** Exact order statistics via bracket-then-sliver
    * (graft.operators.ExactQuantile — never a whole-column buffer, never a
    * global sort). Type-1 ranks are DuckDB's quantile_disc, and the values
    * are untouched source doubles, so the oracle matches bit-for-bit. */
  def exactQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val qs = Seq(0.5, 0.9, 0.99)
    val vs = graft.operators.ExactQuantile.values(
      Tables(spark, dir, "lineitem"), "l_extendedprice", qs)
    import spark.implicits._
    qs.zip(vs).toDF("q", "value")
  }

  /** KMV distinct-count sketch over the fact key, with the mergeability
    * identity proven on-data: the direct global sketch and the merge of
    * per-returnflag sketches are bit-identical (graft.operators.Kmv). The
    * portable counterpart to `agg_sketches`' engine-private HLL — this one
    * the oracle replays exactly.
    *
    * Cost model (measured, round 7): two scans, each one md5 fold +
    * distinct — caching a shared (group, hash) projection to merge them was
    * MEASURED SLOWER (isolated sf0.1: 2.11→2.58 s; the cache barrier beats
    * the page-cached rescan), so the two sketch shapes deliberately scan
    * independently. */
  def kmvSketch(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val k = 256
    val direct = graft.operators.Kmv.estimate(
      graft.operators.Kmv.sketch(li, col("l_orderkey"), k), k)
    val merged = graft.operators.Kmv.estimate(
      graft.operators.Kmv.mergedSketch(li, col("l_orderkey"), col("l_returnflag"), k), k)
      .select(col("k_kept").as("m_kept"), col("kth_min").as("merged_kth"))
    direct.crossJoin(merged)
      .select(col("k_kept"), col("kth_min"), col("est_distinct"), col("merged_kth"),
        (col("kth_min") === col("merged_kth") && col("k_kept") === col("m_kept"))
          .as("merge_exact"))
  }

  /** The order-priority shape (TPC-H Q4, adapted to this schema's dates:
    * "late" = a lineitem shipped more than 30 days after the order date):
    * an EXISTS semi-join from orders into the fact table, then a tiny
    * priority histogram. The semi-join shuffles once on the order key and
    * carries the non-equi lateness predicate inside the join. */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val lo = to_timestamp(lit("1997-01-01")); val hi = to_timestamp(lit("1997-07-01"))
    val ord = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"))
    ord.join(li,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > expr("o_orderdate + INTERVAL 30 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  /** The shipping-mode rollup shape (TPC-H Q12, this schema's flags): late
    * shipments (≥ 60 days after order date) joined back to their orders,
    * rolled up per return flag with the classic two-priority CASE sums.
    * One shuffle on the order key; the CASE sums are integer-exact. */
  def q12PriorityByFlag(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_returnflag"), col("l_shipdate"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") >= expr("o_orderdate + INTERVAL 60 DAYS"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
  }

  /** The disjunctive-predicate shape (TPC-H Q19): revenue under an OR of
    * three (brand, size-range, quantity-range) conjunctions over
    * lineitem ⋈ part. The disjunction references both sides, so it
    * evaluates post-join; each branch's single-side conjuncts still prune
    * the scans via Catalyst's OR-factoring (brand/size reach the part
    * scan, quantity bounds the fact scan). part broadcasts. */
  def q19DisjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val part = Tables(spark, dir, "part")
    def branch(brand: String, sizeHi: Int, qLo: Int, qHi: Int) =
      col("p_brand") === brand &&
        col("p_size").between(1, sizeHi) &&
        col("l_quantity").between(qLo, qHi)
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .filter(branch("Brand#1", 15, 1, 20) || branch("Brand#2", 25, 10, 30) ||
        branch("Brand#3", 35, 20, 40))
      .agg(sum(dec("l_extendedprice") * (lit(1) - dec("l_discount", 4, 2)))
        .cast("double").as("revenue"))
  }

  /** The waiting-suppliers shape (TPC-H Q21, adapted: the lineitem that
    * shipped LAST in a finished multi-supplier order): per supplier, the
    * count of its lineitems in status-F orders where another supplier
    * participated (EXISTS) but none shipped strictly later (NOT EXISTS) —
    * the classic semi + anti SELF-join pair on the fact table, both
    * equi-keyed on the order key with the supplier/date predicates carried
    * inside the joins (never a cartesian). Top 10 by count. */
  def q21WaitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val l1 = li.select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val fOrders = Tables(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
    val l2 = li.select(col("l_orderkey").as("lo2"), col("l_suppkey").as("ls2"))
    val l3 = li.select(col("l_orderkey").as("lo3"), col("l_suppkey").as("ls3"),
      col("l_shipdate").as("ld3"))
    l1.join(fOrders, col("l_orderkey") === col("o_orderkey"))
      .join(l2, col("lo2") === col("l_orderkey") && col("ls2") =!= col("l_suppkey"),
        "left_semi")
      .join(l3, col("lo3") === col("l_orderkey") && col("ls3") =!= col("l_suppkey")
        && col("ld3") > col("l_shipdate"), "left_anti")
      .join(broadcast(Tables(spark, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(10)
  }

  /** The returned-item revenue shape (TPC-H Q10): revenue lost to
    * returns per customer over one quarter — lineitem (R-flagged) joined
    * through its order to the customer and nation dims, top 20 by
    * revenue. The fact-side join is one shuffle on the order key; the
    * customer and nation dims broadcast (15k / 25 rows at sf0.1 — far
    * under the 10 MB threshold, and at 100 TB the customer dim is still
    * the small side a broadcast or bucketed join handles). Revenue sums
    * in DECIMAL and casts to double once — engine-portable. */
  def q10ReturnedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val lo = to_timestamp(lit("1997-01-01"))
    val hi = to_timestamp(lit("1997-04-01"))
    val ord = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables(spark, dir, "customer")
      .join(broadcast(Tables(spark, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
    Tables(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(dec("l_extendedprice") * (lit(1) - dec("l_discount", 4, 2)))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  /** The order-count distribution shape (TPC-H Q13): how many customers
    * placed exactly k orders, zero included — the canonical LEFT OUTER
    * JOIN + double aggregation (the zero bucket only exists because the
    * outer join keeps orderless customers). Urgent orders are excluded so
    * the outer join filters the RIGHT side pre-join (the classic
    * not-like-comment stand-in on this schema). Two shuffles: custkey,
    * then the count histogram. */
  def q13OrderDistribution(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables(spark, dir, "orders")
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_custkey"))
    Tables(spark, dir, "customer").select(col("c_custkey"))
      .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_custkey")).as("c_count")) // non-null = matched orders
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** The parts-supplier-count shape (TPC-H Q16): per (brand, type, size)
    * — restricted sizes, one brand and one type excluded — how many
    * DISTINCT suppliers ship the part, suppliers on the low-balance list
    * excluded by anti-join (the complaints-subquery stand-in; lineitem's
    * (partkey, suppkey) pairs stand in for partsupp). The anti-join
    * broadcasts the tiny exclusion list; the distinct count is one
    * two-phase aggregate on the (brand, type, size) key. */
  def q16PartSupplierCounts(spark: SparkSession, dir: String): DataFrame = {
    val badSupp = Tables(spark, dir, "supplier")
      .filter(dec("s_acctbal") < 1000).select(col("s_suppkey"))
    val ps = Tables(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
    Tables(spark, dir, "part")
      .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
      .join(ps, col("p_partkey") === col("l_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand").asc,
        col("p_type").asc, col("p_size").asc)
  }

  /** The idle-balances shape (TPC-H Q22): per nation, customers holding
    * an above-average positive balance who never ordered — the scalar
    * aggregate subquery + NOT EXISTS pair. The above-average test runs as
    * the EXACT cross-multiplied decimal comparison `bal · n > Σbal`
    * (dividing first would make the cut double-rounding-dependent and
    * engine-divergent); the one-row stats frame broadcasts; the
    * no-recent-orders test is a broadcast anti-join at this scale and a
    * shuffle anti-join at 100 TB — both equi-keyed. (On this synthetic
    * schema every customer has SOME order, so the classic never-ordered
    * test would be vacuously empty — "inactive since 1999" keeps the
    * exact Q22 plan shape with live rows.) */
  def q22IdleBalances(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"), dec("c_acctbal").as("bal"))
    val stats = cust.filter(col("bal") > 0)
      .agg(sum(col("bal")).as("s"), count(lit(1)).as("n"))
    cust.filter(col("bal") > 0)
      .crossJoin(broadcast(stats))
      .filter(col("bal") * col("n") > col("s"))
      .join(Tables(spark, dir, "orders")
          .filter(col("o_orderdate") >= to_timestamp(lit("1999-01-01")))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
        sum(col("bal")).cast("double").as("totacctbal"))
      .orderBy(col("c_nationkey").asc)
  }

  /** The forecast-revenue shape (TPC-H Q6): the pure single-scan filter
    * aggregate — every predicate (ship year, discount band, quantity cap)
    * pushes into the parquet scan, and the plan is one partial+final
    * DECIMAL sum with no join and no wide shuffle. The simplest query in
    * the family, kept as the scan-throughput yardstick. */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame = {
    val lo = to_timestamp(lit("1997-01-01")); val hi = to_timestamp(lit("1998-01-01"))
    Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum(dec("l_extendedprice") * dec("l_discount", 4, 2))
        .cast("double").as("revenue"))
  }

  /** The volume-shipping shape (TPC-H Q7): bilateral trade between two
    * nations — supplier nation on one side, customer nation on the other,
    * both directions, revenue per (supp_nation, cust_nation, ship year).
    * Both nation lookups ride broadcast dim joins (supplier and the
    * nation-tagged customer are dims at any realistic dim:fact ratio); the
    * two-nation filter prunes each dim BEFORE the fact joins, so the fact
    * shuffle only carries rows that can still qualify. */
  def q7VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val lo = to_timestamp(lit("1996-01-01")); val hi = to_timestamp(lit("1998-01-01"))
    val nations = Seq("NATION_1", "NATION_2")
    val supp = Tables(spark, dir, "supplier")
      .join(broadcast(Tables(spark, dir, "nation")
        .filter(col("n_name").isin(nations: _*))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables(spark, dir, "customer")
      .join(broadcast(Tables(spark, dir, "nation")
        .filter(col("n_name").isin(nations: _*))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(Tables(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(dec("l_extendedprice") * (lit(1) - dec("l_discount", 4, 2)))
        .cast("double").as("revenue"))
  }

  /** The market-share shape (TPC-H Q8): within one region's customers and
    * one part type, the share of each order-year's revenue delivered by
    * suppliers of one target nation. Both the numerator and denominator
    * are conditional DECIMAL sums inside ONE aggregation (the q14
    * discipline — exact under any partitioning, one IEEE division at the
    * end), so the share never needs a second pass or a self-join. */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val lo = to_timestamp(lit("1996-01-01")); val hi = to_timestamp(lit("1998-01-01"))
    val suppNation = Tables(spark, dir, "supplier")
      .join(broadcast(Tables(spark, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val regionCust = Tables(spark, dir, "customer")
      .join(broadcast(Tables(spark, dir, "nation")
          .join(broadcast(Tables(spark, dir, "region")
            .filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val vol = dec("l_extendedprice") * (lit(1) - dec("l_discount", 4, 2))
    Tables(spark, dir, "lineitem")
      .join(broadcast(Tables(spark, dir, "part")
          .filter(col("p_type") === "STANDARD").select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .join(Tables(spark, dir, "orders")
          .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(regionCust, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_3", vol)
          .otherwise(lit(0).cast("decimal(18,2)"))).cast("double").as("nation_revenue"),
        sum(vol).cast("double").as("total_revenue"))
      .withColumn("mkt_share", col("nation_revenue") / col("total_revenue"))
  }

  /** The product-type-profit shape (TPC-H Q9, adapted: no partsupp table,
    * so unit cost is the part's list price at a fixed 50% margin): profit
    * per (supplier nation, order year) over one part-name family. Revenue
    * and cost accumulate as two separate DECIMAL sums and subtract once at
    * the end (sum(a−b) = sum(a)−sum(b) exactly in decimal, and the two
    * narrower accumulators keep every intermediate inside DECIMAL(38)).
    * part and supplier broadcast; the one fact-fact join shuffles on the
    * order key. */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val redParts = Tables(spark, dir, "part")
      .filter(col("p_name").like("%red%"))
      .select(col("p_partkey"), dec("p_retailprice", 12, 2).as("unit_price"))
    val suppNation = Tables(spark, dir, "supplier")
      .join(broadcast(Tables(spark, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    Tables(spark, dir, "lineitem")
      .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .join(Tables(spark, dir, "orders").select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).as("o_year"))
      .agg((sum(dec("l_extendedprice") * (lit(1) - dec("l_discount", 4, 2))) -
        sum(col("unit_price") * dec("l_quantity", 4, 1) *
          lit("0.50").cast("decimal(3,2)")))
        .cast("double").as("profit"))
  }

  /** The important-stock shape (TPC-H Q11, adapted: no partsupp, so a
    * part's "stock value" held by one nation's suppliers is the DECIMAL
    * revenue its lineitems shipped through them): parts whose value
    * exceeds 0.1% of the nation's total. The global total is a 1-row
    * anchor (broadcast; PlanGuard-whitelisted) and the cut is the EXACT
    * cross-multiplied comparison `value · 1000 > total` — never a divided
    * double. One shuffle on the part key; the supplier set broadcasts. */
  def q11ImportantStock(spark: SparkSession, dir: String): DataFrame = {
    val natSupp = Tables(spark, dir, "supplier")
      .join(broadcast(Tables(spark, dir, "nation")
        .filter(col("n_name") === "NATION_5")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val value = Tables(spark, dir, "lineitem")
      .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"))
      .agg(sum(dec("l_extendedprice")).as("value"))
    val total = value.agg(sum(col("value")).as("total"))
    value.crossJoin(broadcast(total))
      .filter(col("value") * lit(1000) > col("total"))
      .select(col("l_partkey"), col("value").cast("double").as("value"))
      .orderBy(col("value").desc, col("l_partkey").asc)
  }

  /** The small-quantity-revenue shape (TPC-H Q17): average yearly revenue
    * lost if small orders (under 20% of the part's average quantity) went
    * unfilled, over one brand+type family. The correlated per-part average
    * is an equi-join against a per-part (count, Σqty) rollup over the SAME
    * brand-filtered scan, and the 20%-of-average cut is the exact
    * cross-multiplied DECIMAL comparison `qty · 5 · n < Σqty`. The part
    * filter broadcasts into both fact scans; everything else is one
    * part-key shuffle. */
  def q17SmallQuantityRevenue(spark: SparkSession, dir: String): DataFrame = {
    val pf = Tables(spark, dir, "part")
      .filter(col("p_brand") === "Brand#1" && col("p_type") === "SMALL")
      .select(col("p_partkey"))
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val st = li.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n"), sum(dec("l_quantity", 4, 1)).as("sq"))
    li.join(st, Seq("l_partkey"))
      .filter(dec("l_quantity", 4, 1) * lit(5) * col("n") < col("sq"))
      .agg((sum(dec("l_extendedprice")).cast("double") / lit(7.0))
        .as("avg_yearly"))
  }

  /** The promotable-suppliers shape (TPC-H Q20, adapted: no partsupp
    * availqty, so a supplier is "promotable" when it shipped MORE THAN
    * HALF of a part's total 1997 volume — the dominant-supplier cut):
    * suppliers of one nation dominating any part in one name family.
    * Per-(part, supplier) and per-part quantity rollups share one
    * name-filtered scan; the half cut is the exact cross-multiplied
    * `pair_qty · 2 > part_qty`; the survivor set semi-joins into the
    * supplier dim. One part-key shuffle, dims broadcast. */
  def q20PromotableSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val lo = to_timestamp(lit("1997-01-01")); val hi = to_timestamp(lit("1998-01-01"))
    val pf = Tables(spark, dir, "part")
      .filter(col("p_name").like("small%")).select(col("p_partkey"))
    val pairQty = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(dec("l_quantity", 4, 1)).as("q"))
    val partQty = pairQty.groupBy(col("l_partkey")).agg(sum(col("q")).as("tq"))
    val dominant = pairQty.join(partQty, Seq("l_partkey"))
      .filter(col("q") * lit(2) > col("tq"))
      .select(col("l_suppkey"))
    Tables(spark, dir, "supplier")
      .join(broadcast(Tables(spark, dir, "nation")
        .filter(col("n_name") === "NATION_7")),
        col("s_nationkey") === col("n_nationkey"))
      .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"),
        col("s_acctbal").cast("double").as("s_acctbal"))
      .orderBy(col("s_name").asc)
  }

  /** The min-cost-supplier shape (TPC-H Q2, adapted: no partsupp
    * supplycost, so a (part, supplier) pair's "cost" is the DECIMAL sum
    * of extended price the pair actually shipped — exact, so the
    * min-equality join is deterministic): for one part family, the
    * region's cheapest supplier(s) per part, richest account first. The
    * correlated MIN is an equi-join against a per-part min over the SAME
    * region-restricted pair rollup; supplier and part dims broadcast; the
    * pair rollup is the one fact shuffle. */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val regionSupp = Tables(spark, dir, "supplier")
      .join(broadcast(Tables(spark, dir, "nation")
          .join(broadcast(Tables(spark, dir, "region")
            .filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    // the region's supplier set prunes the FACT SCAN (broadcast semi-join)
    // before the pair rollup shuffles — at one-region selectivity that is
    // ~5x less exchange volume than rolling up the whole fact table and
    // filtering the groups afterwards
    val pairCost = Tables(spark, dir, "lineitem")
      .join(broadcast(regionSupp.select(col("s_suppkey"))),
        col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(dec("l_extendedprice")).as("cost"))
      .join(broadcast(regionSupp), col("l_suppkey") === col("s_suppkey"))
    val minCost = pairCost.groupBy(col("l_partkey").as("mp"))
      .agg(min(col("cost")).as("mc"))
    pairCost.join(minCost, col("l_partkey") === col("mp") && col("cost") === col("mc"))
      .join(broadcast(Tables(spark, dir, "part")
          .filter(col("p_size") === 10 && col("p_type") === "LARGE")
          .select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("s_acctbal").cast("double").as("s_acctbal"), col("s_name"),
        col("n_name"), col("p_partkey"), col("cost").cast("double").as("cost"))
      .orderBy(col("s_acctbal").desc, col("n_name").asc, col("s_name").asc,
        col("p_partkey").asc)
      .limit(100)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_min_cost_supplier" -> q2MinCostSupplier,
    "q6_forecast_revenue" -> q6ForecastRevenue,
    "q7_volume_shipping" -> q7VolumeShipping,
    "q8_market_share" -> q8MarketShare,
    "q9_product_profit" -> q9ProductProfit,
    "q11_important_stock" -> q11ImportantStock,
    "q17_small_quantity_revenue" -> q17SmallQuantityRevenue,
    "q20_promotable_suppliers" -> q20PromotableSuppliers,
    "q4_order_priority" -> q4OrderPriority,
    "q10_returned_revenue" -> q10ReturnedRevenue,
    "q13_order_distribution" -> q13OrderDistribution,
    "q16_part_supplier_counts" -> q16PartSupplierCounts,
    "q22_idle_balances" -> q22IdleBalances,
    "q12_priority_by_flag" -> q12PriorityByFlag,
    "q19_disjunctive_revenue" -> q19DisjunctiveRevenue,
    "q21_waiting_suppliers" -> q21WaitingSuppliers,
    "agg_distinct_count" -> distinctCounts,
    "agg_sketches" -> sketchAggs,
    "agg_exact_quantiles" -> exactQuantiles,
    "agg_kmv_sketch" -> kmvSketch,
    "agg_pricing_summary" -> aggPricingSummary,
    "join_revenue_by_nation" -> joinRevenueByNation,
    "q3_shipping_priority" -> q3ShippingPriority,
    "q14_promo_share" -> q14PromoShare,
    "q18_large_orders" -> q18LargeOrders,
    "q15_top_supplier" -> q15TopSupplier,
    "q5_local_supplier_volume" -> q5LocalSupplierVolume,
    "fuzzy_name_pairs" -> fuzzyNamePairs,
    "topk_customers" -> topCustomers,
    "topk_per_nation" -> topkPerNation,
    "topk_per_nation_agg" -> topkPerNationAgg,
    "pivot_event_types" -> pivotEventTypes,
    "semi_join_urgent" -> semiJoinUrgentCustomers,
    "anti_join_no_orders" -> antiJoinNoOrders,
    "set_intersect_custkeys" -> setIntersectCustkeys,
    "set_except_custkeys" -> setExceptCustkeys,
    "monthly_orders" -> monthlyOrders,
    "rollup_pricing" -> rollupPricing,
    "cube_pricing" -> cubePricing,
    "window_funcs" -> windowFuncs
  )

  /** Shared replay for both top-k-per-nation spellings (window and bounded
    * aggregate) — they must agree row-for-row. */
  private lazy val topkPerNationOracle: String =
    """WITH rev AS (
      |  SELECT n_name, c_custkey,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |  FROM customer
      |  JOIN orders ON c_custkey = o_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY n_name, c_custkey)
      |SELECT n_name, c_custkey, total, rnk FROM (
      |  SELECT n_name, c_custkey, total,
      |    CAST(row_number() OVER (PARTITION BY n_name
      |      ORDER BY total DESC, c_custkey ASC) AS INT) AS rnk
      |  FROM rev)
      |WHERE rnk <= 3""".stripMargin

  val oracles: Map[String, String] = Map(
    "q6_forecast_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q7_volume_shipping" ->
      """SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INT) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |       * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ns ON s_nationkey = ns.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation nc ON c_nationkey = nc.n_nationkey
        |WHERE ns.n_name IN ('NATION_1', 'NATION_2')
        |  AND nc.n_name IN ('NATION_1', 'NATION_2')
        |  AND ns.n_name <> nc.n_name
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3""".stripMargin,
    "q8_market_share" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(SUM(CASE WHEN ns.n_name = 'NATION_3'
        |    THEN CAST(l_extendedprice AS DECIMAL(18,2))
        |         * (1 - CAST(l_discount AS DECIMAL(4,2)))
        |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS nation_revenue,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |       * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_revenue,
        |  CAST(SUM(CASE WHEN ns.n_name = 'NATION_3'
        |    THEN CAST(l_extendedprice AS DECIMAL(18,2))
        |         * (1 - CAST(l_discount AS DECIMAL(4,2)))
        |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |       * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ns ON s_nationkey = ns.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_type = 'STANDARD'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND EXISTS (SELECT 1 FROM customer
        |              JOIN nation nc ON c_nationkey = nc.n_nationkey
        |              JOIN region ON nc.n_regionkey = r_regionkey
        |              WHERE c_custkey = o_custkey AND r_name = 'ASIA')
        |GROUP BY 1""".stripMargin,
    "q9_product_profit" ->
      """SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |         * (1 - CAST(l_discount AS DECIMAL(4,2))))
        |     - SUM(CAST(p_retailprice AS DECIMAL(12,2))
        |         * CAST(l_quantity AS DECIMAL(4,1))
        |         * CAST('0.50' AS DECIMAL(3,2))) AS DOUBLE) AS profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2""".stripMargin,
    "q11_important_stock" ->
      """WITH v AS (
        |  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS value
        |  FROM lineitem
        |  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
        |                      JOIN nation ON s_nationkey = n_nationkey
        |                      WHERE n_name = 'NATION_5')
        |  GROUP BY 1),
        |t AS (SELECT SUM(value) AS total FROM v)
        |SELECT l_partkey, CAST(value AS DOUBLE) AS value
        |FROM v, t
        |WHERE value * 1000 > total
        |ORDER BY value DESC, l_partkey ASC""".stripMargin,
    "q17_small_quantity_revenue" ->
      """WITH li AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#1' AND p_type = 'SMALL'),
        |st AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n,
        |         SUM(CAST(l_quantity AS DECIMAL(4,1))) AS sq
        |       FROM li GROUP BY 1)
        |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
        |  AS avg_yearly
        |FROM li JOIN st USING (l_partkey)
        |WHERE CAST(l_quantity AS DECIMAL(4,1)) * 5 * n < sq""".stripMargin,
    "q20_promotable_suppliers" ->
      """WITH pq AS (
        |  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(4,1))) AS q
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'small%'
        |    AND l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'
        |  GROUP BY 1, 2),
        |pt AS (SELECT l_partkey, SUM(q) AS tq FROM pq GROUP BY 1)
        |SELECT s_suppkey, s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_7'
        |  AND s_suppkey IN (SELECT l_suppkey FROM pq JOIN pt USING (l_partkey)
        |                    WHERE q * 2 > tq)
        |ORDER BY s_name ASC""".stripMargin,
    "q2_min_cost_supplier" ->
      """WITH rs AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |pc AS (
        |  SELECT l_partkey, s_name, s_acctbal, n_name,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
        |  FROM lineitem JOIN rs ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2, 3, 4),
        |mn AS (SELECT l_partkey, MIN(cost) AS mc FROM pc GROUP BY 1)
        |SELECT CAST(s_acctbal AS DOUBLE) AS s_acctbal, s_name, n_name,
        |  l_partkey AS p_partkey, CAST(cost AS DOUBLE) AS cost
        |FROM pc JOIN mn USING (l_partkey)
        |JOIN part ON p_partkey = l_partkey
        |WHERE cost = mc AND p_size = 10 AND p_type = 'LARGE'
        |ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
        |LIMIT 100""".stripMargin,
    "q10_returned_revenue" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |       * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-04-01'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey ASC
        |LIMIT 20""".stripMargin,
    "q13_order_distribution" ->
      """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
        |  SELECT c_custkey, CAST(COUNT(o_custkey) AS BIGINT) AS c_count
        |  FROM customer
        |  LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |    AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q16_part_supplier_counts" ->
      """SELECT p_brand, p_type, p_size,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM part
        |JOIN (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |  ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE CAST(s_acctbal AS DECIMAL(18,2)) < 1000)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC""".stripMargin,
    "q22_idle_balances" ->
      """WITH pos AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(c_acctbal AS DECIMAL(18,2)) AS bal
        |  FROM customer WHERE CAST(c_acctbal AS DECIMAL(18,2)) > 0),
        |st AS (SELECT SUM(bal) AS s, CAST(COUNT(*) AS BIGINT) AS n FROM pos)
        |SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
        |  CAST(SUM(bal) AS DOUBLE) AS totacctbal
        |FROM pos, st
        |WHERE bal * n > s
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey ASC""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority""".stripMargin,
    "q12_priority_by_flag" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
        |GROUP BY l_returnflag""".stripMargin,
    "q19_disjunctive_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |        AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
        |        AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
        |        AND l_quantity BETWEEN 20 AND 40)""".stripMargin,
    "q21_waiting_suppliers" ->
      """SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM lineitem l1
        |JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
        |JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > l1.l_shipdate)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name ASC
        |LIMIT 10""".stripMargin,
    "agg_distinct_count" ->
      "SELECT count(DISTINCT o_custkey) AS n_custs, count(*) AS n_orders FROM orders",
    // sketch replay: only the exact twin and the TRUE tolerance verdicts are
    // comparable — the approx values themselves are engine-private
    "agg_sketches" ->
      """SELECT count(DISTINCT l_orderkey) AS exact_orders,
        |  TRUE AS cd_within_10pct, TRUE AS p50_within_5pct, TRUE AS p99_within_5pct
        |FROM lineitem""".stripMargin,
    "agg_exact_quantiles" ->
      """SELECT CAST(0.5 AS DOUBLE) AS q, quantile_disc(l_extendedprice, 0.5) AS value FROM lineitem
        |UNION ALL
        |SELECT CAST(0.9 AS DOUBLE), quantile_disc(l_extendedprice, 0.9) FROM lineitem
        |UNION ALL
        |SELECT CAST(0.99 AS DOUBLE), quantile_disc(l_extendedprice, 0.99) FROM lineitem""".stripMargin,
    "agg_kmv_sketch" ->
      """WITH h AS (SELECT DISTINCT
        |    CAST(CONCAT('0x', substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |  FROM lineitem),
        |mk AS (SELECT h FROM h ORDER BY h LIMIT 256),
        |direct AS (SELECT CAST(count(*) AS BIGINT) AS k_kept, max(h) AS kth_min FROM mk),
        |gh AS (SELECT DISTINCT l_returnflag AS g,
        |    CAST(CONCAT('0x', substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |  FROM lineitem),
        |gk AS (SELECT h FROM (
        |    SELECT h, row_number() OVER (PARTITION BY g ORDER BY h ASC) AS rn FROM gh)
        |  WHERE rn <= 256),
        |mk2 AS (SELECT h FROM (SELECT DISTINCT h FROM gk) ORDER BY h LIMIT 256),
        |merged AS (SELECT CAST(count(*) AS BIGINT) AS m_kept, max(h) AS merged_kth FROM mk2)
        |SELECT d.k_kept, d.kth_min,
        |  CAST(CASE WHEN d.k_kept < 256 THEN d.k_kept
        |       ELSE CAST(255 AS HUGEINT) * 1152921504606846976 // d.kth_min END AS BIGINT)
        |    AS est_distinct,
        |  m.merged_kth,
        |  (d.kth_min = m.merged_kth AND d.k_kept = m.m_kept) AS merge_exact
        |FROM direct d, merged m""".stripMargin,
    "agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "join_revenue_by_nation" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,
    "q14_promo_share" ->
      """WITH l AS (
        |  SELECT p_type,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS disc
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'),
        |s AS (
        |  SELECT
        |    CAST(sum(CASE WHEN p_type = 'PROMO' THEN disc ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
        |    CAST(sum(disc) AS DOUBLE) AS total_revenue
        |  FROM l)
        |SELECT promo_revenue, total_revenue,
        |  promo_revenue / total_revenue AS promo_share
        |FROM s""".stripMargin,
    "q5_local_supplier_volume" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name""".stripMargin,
    // fuzzy matching replay: same normalization, same two sorted-neighborhood
    // passes (forward / reversed key, prefix-4 blocks, 5 leads), same exact
    // Levenshtein verify — candidate sets and distances must agree exactly
    "fuzzy_name_pairs" -> {
      val norm = """lower(trim(regexp_replace(p_name, '\s+', ' ', 'g')))"""
      def passSql(from: String): String = (1 to 5).map { i =>
        s"""SELECT least(name, cand) AS name_a, greatest(name, cand) AS name_b FROM (
           |  SELECT name, lead(name, $i) OVER (
           |    PARTITION BY substr(key, 1, 4) ORDER BY key, name) AS cand
           |  FROM $from) WHERE cand IS NOT NULL""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH n AS (SELECT DISTINCT $norm AS name FROM part),
         |k1 AS (SELECT name, name AS key FROM n),
         |k2 AS (SELECT name, reverse(name) AS key FROM n),
         |cand AS (
         |${passSql("k1")}
         |UNION ALL
         |${passSql("k2")})
         |SELECT DISTINCT name_a, name_b,
         |  CAST(levenshtein(name_a, name_b) AS INT) AS dist
         |FROM cand WHERE levenshtein(name_a, name_b) <= 2""".stripMargin
    },
    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 250)
        |SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(sum_qty AS DOUBLE) AS sum_qty
        |FROM big JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(rev AS DOUBLE) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev = (SELECT max(rev) FROM rev)""".stripMargin,
    "topk_customers" ->
      """SELECT c_custkey, c_name, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY total DESC, c_custkey ASC LIMIT 10""".stripMargin,
    "topk_per_nation" -> topkPerNationOracle,
    // the bounded-aggregate spelling must produce the identical rows —
    // one oracle pins both the window and the partial-agg top-k paths
    "topk_per_nation_agg" -> topkPerNationOracle,
    "pivot_event_types" ->
      """SELECT user_id,
        |  count(*) FILTER (event_type = 'click') AS "click",
        |  count(*) FILTER (event_type = 'view') AS "view",
        |  count(*) FILTER (event_type = 'purchase') AS "purchase",
        |  count(*) FILTER (event_type = 'signup') AS "signup",
        |  count(*) FILTER (event_type = 'error') AS "error"
        |FROM events GROUP BY user_id""".stripMargin,
    "semi_join_urgent" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""".stripMargin,
    "anti_join_no_orders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "set_intersect_custkeys" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'""".stripMargin,
    "set_except_custkeys" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'""".stripMargin,
    "monthly_orders" ->
      """SELECT strftime(o_orderdate, '%Y%m') AS yyyymm, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1""".stripMargin,
    "rollup_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "cube_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "window_funcs" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  lag(o_orderkey, 1) OVER w AS prev_order,
        |  lead(o_orderkey, 1) OVER w AS next_order,
        |  rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)""".stripMargin
  )
}
