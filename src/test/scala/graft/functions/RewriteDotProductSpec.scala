package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RewriteDotProductSpec extends SparkSpec {
  import spark.implicits._

  private val hof =
    "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"

  // non-foldable inputs so ConvertToLocalRelation/ConstantFolding cannot
  // collapse the projection before the rewrite is observable
  private def frame = spark.range(3).select(
    array($"id".cast("double"), lit(2.0)).as("a"),
    array(lit(3.0), ($"id" + 1L).cast("double")).as("b"))

  test("the HOF dot-product spelling is rewritten to the native expression") {
    val df = frame.select(expr(hof).as("d"))
    assert(df.queryExecution.optimizedPlan.toString.contains("graft_dot"),
      df.queryExecution.optimizedPlan.toString)
    // id=2: [2,2]·[3,3] = 12
    assert(df.as[Double].collect().sorted.toSeq == Seq(2.0, 7.0, 12.0))
  }

  test("rewrite preserves the strict left-fold IEEE result bit-for-bit") {
    // values chosen so summation order matters in floating point
    val a = Seq(1e16, 1.0, -1e16, 3.5)
    val b = Seq(1.0, 1.0, 1.0, 1.0)
    val df = Seq((a, b)).toDF("a", "b")
    val viaRule = df.select(expr(hof)).as[Double].head()
    val viaNative = df.select(expr("graft_dot(a, b)")).as[Double].head()
    // reference: strict left-to-right fold in plain Scala
    val expected = a.zip(b).map { case (x, y) => x * y }.foldLeft(0.0)(_ + _)
    assert(viaRule == expected && viaNative == expected)
  }

  test("unequal-length arrays yield null on both the HOF and the native path") {
    val df = spark.range(1).select(
      array($"id".cast("double")).as("a"),
      array($"id".cast("double"), lit(2.0)).as("b"))
    // zip_with pads the short side with null, poisoning the HOF sum to null;
    // the native expression must agree or the rewrite changes results
    assert(df.select(expr(hof)).collect().head.isNullAt(0))
    assert(df.select(expr("graft_dot(a, b)")).collect().head.isNullAt(0))
  }

  test("other fold shapes are left untouched") {
    // reversed merge operands (x + acc): NOT the strict left-fold shape
    val other = "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> x + acc)"
    val df = frame.select(expr(other).as("d"))
    assert(!df.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    assert(df.as[Double].collect().sorted.toSeq == Seq(2.0, 7.0, 12.0))
    // non-double arrays: untouched (aggregate over bigint stays a HOF)
    val ints = spark.range(3)
      .select(array($"id", lit(2L)).as("a"), array(lit(3L), $"id").as("b"))
      .select(expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, x) -> acc + x)").as("d"))
    assert(!ints.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    assert(ints.as[Long].collect().sorted.toSeq == Seq(0L, 5L, 10L))
  }
}
