package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IntersectCountSpec extends SparkSpec {
  import spark.implicits._

  test("graft_intersect_count is registered and counts sorted-set overlap") {
    assert(spark.catalog.functionExists("graft_intersect_count"))
    val out = Seq((Seq("a", "b", "d", "x"), Seq("b", "c", "d", "e")))
      .toDF("a", "b").select(expr("graft_intersect_count(a, b)")).as[Long].head()
    assert(out == 2L)
  }

  test("equals size(array_intersect) on random sorted distinct arrays") {
    val rnd = new scala.util.Random(11)
    def set() = Seq.fill(40)(s"w${rnd.nextInt(60)}").distinct.sorted
    val rows = (1 to 200).map(_ => (set(), set()))
    val both = rows.toDF("a", "b").select(
      expr("graft_intersect_count(a, b)").as("fast"),
      size(array_intersect($"a", $"b")).cast("long").as("ref"))
      .as[(Long, Long)].collect()
    both.foreach { case (fast, ref) => assert(fast == ref) }
  }

  test("null input arrays yield null; disjoint and empty sets count zero") {
    val r = Seq((Some(Seq("a")), Option.empty[Seq[String]]))
      .toDF("a", "b").select(expr("graft_intersect_count(a, b)")).collect().head
    assert(r.isNullAt(0))
    val z = Seq((Seq("a", "b"), Seq("c", "d")), (Seq.empty[String], Seq("a")))
      .toDF("a", "b").select(expr("graft_intersect_count(a, b)")).as[Long].collect()
    assert(z.toSeq == Seq(0L, 0L))
  }
}
