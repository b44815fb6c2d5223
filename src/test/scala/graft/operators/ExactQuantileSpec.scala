package graft.operators

import graft.SparkSpec

class ExactQuantileSpec extends SparkSpec {

  import spark.implicits._

  private def bruteRank(xs: Seq[Double], q: Double): Double =
    xs.sorted.apply((math.ceil(q * xs.size) - 1).toInt)

  test("values match the brute-force rank-⌈q·n⌉ order statistic") {
    val xs = (1 to 1000).map(_.toDouble)
    val got = ExactQuantile.values(xs.toDF("x"), "x", Seq(0.5, 0.99, 1.0))
    assert(got == Seq(500.0, 990.0, 1000.0))
    graft.Caching.releaseAll()
  }

  test("duplicates and skew: the rank arithmetic stays exact") {
    // heavy ties around the median plus a long tail
    val xs = Seq.fill(400)(7.0) ++ (1 to 300).map(_ * 0.01) ++
      (1 to 300).map(i => 100.0 + i)
    for (q <- Seq(0.25, 0.5, 0.9, 0.99)) {
      val got = ExactQuantile.values(xs.toDF("x").repartition(7), "x", Seq(q))
      assert(got.head == bruteRank(xs, q), s"q=$q")
      graft.Caching.releaseAll()
    }
  }

  test("random data across partitionings matches brute force") {
    val rnd = new scala.util.Random(42)
    val xs = Seq.fill(5000)(rnd.nextDouble() * 1000.0)
    val got = ExactQuantile.values(
      xs.toDF("x").repartition(13), "x", Seq(0.1, 0.5, 0.95))
    assert(got == Seq(0.1, 0.5, 0.95).map(bruteRank(xs, _)))
    graft.Caching.releaseAll()
  }
}
