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

  test("rankRows returns the exact (value, tie) row under heavy ties") {
    // many ties on v — the tie column decides the order inside each run
    val rnd = new scala.util.Random(7)
    val rows = (1L to 4000L).map(t => (rnd.nextInt(20).toDouble, t))
    val sorted = rows.sorted
    val ranks = Seq(1L, 137L, 2000L, 3999L, 4000L)
    val got = ExactQuantile.rankRows(
      rows.toDF("v", "t").repartition(11), "v", "t", ranks)
    assert(got == ranks.map(k => sorted((k - 1).toInt)))
    graft.Caching.releaseAll()
  }

  test("ntileBoundaryRanks reproduces SQL ntile bucket sizes") {
    // n = 47, k = 10: first 7 buckets get 5 rows, last 3 get 4
    assert(ExactQuantile.ntileBoundaryRanks(47, 10) ==
      Seq(5L, 10L, 15L, 20L, 25L, 30L, 35L, 39L, 43L))
    // even split
    assert(ExactQuantile.ntileBoundaryRanks(40, 4) == Seq(10L, 20L, 30L))
    // n < k: one row per leading bucket
    assert(ExactQuantile.ntileBoundaryRanks(3, 5) == Seq(1L, 2L, 3L, 3L))
  }
}
