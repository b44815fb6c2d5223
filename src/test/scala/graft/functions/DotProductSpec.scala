package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot is registered via GraftExtensions and evaluates correctly") {
    assert(spark.catalog.functionExists("graft_dot"))
    val out = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
      .select(expr("graft_dot(a, b)")).as[Double].head()
    assert(out == 32.0)
  }

  test("bit-identical to the composable aggregate/zip_with fold (oracle contract)") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map(_ =>
      (Seq.fill(64)(rnd.nextDouble() * 2 - 1), Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val both = df.select(
      expr("graft_dot(a, b)").as("fast"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)").as("ref"))
      .as[(Double, Double)].collect()
    both.foreach { case (fast, ref) =>
      assert(java.lang.Double.doubleToLongBits(fast) ==
        java.lang.Double.doubleToLongBits(ref))
    }
  }

  test("null input arrays yield null") {
    val out = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]])).toDF("a", "b")
      .select(expr("graft_dot(a, b)")).collect().head
    assert(out.isNullAt(0))
  }

  test("participates in whole-stage codegen") {
    // non-foldable source (a literal local relation constant-folds away)
    val df = spark.range(4)
      .select(expr("transform(sequence(1, 3), i -> cast(i + id as double))").as("a"),
        expr("transform(sequence(1, 3), i -> cast(i as double))").as("b"))
      .select(expr("graft_dot(a, b)").as("d"), col("a"), col("b"))
    // the `*(n)` prefix marks operators inside a WholeStageCodegen stage;
    // the graft_dot Project must carry it (note: the neighboring `transform`
    // HOF Project does NOT — exactly the gap this expression closes)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("graft_dot") && l.trim.startsWith("*")),
      plan.take(400))
    // id=0: a=[1,2,3], b=[1,2,3] -> 14
    assert(df.select("d").as[Double].collect().min == 14.0)
  }
}
