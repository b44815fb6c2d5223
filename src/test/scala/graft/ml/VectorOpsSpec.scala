package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Double])*) =
    rows.toDF("vec_id", "embedding")

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val df = emb((0L, Seq(1.0, 0.0))).select(
      VectorOps.cosine("embedding", "embedding").as("self"))
    assert(df.as[Double].head() == 1.0)
    val two = Seq((Seq(1.0, 0.0), Seq(0.0, 2.0))).toDF("a", "b")
    assert(two.select(VectorOps.cosine("a", "b")).as[Double].head() == 0.0)
  }

  test("annBruteForce ranks by cosine desc with id tiebreak, excludes self") {
    // probe = id 0 (0 % 100 == 0); neighbors along decreasing angle
    val df = emb(
      (0L, Seq(1.0, 0.0)),
      (1L, Seq(1.0, 0.1)),   // closest
      (2L, Seq(1.0, 1.0)),
      (3L, Seq(0.0, 1.0)),   // orthogonal
      (4L, Seq(1.0, 0.1)))   // tie with 1 -> ranked after by id
    val out = VectorOps.annBruteForce(df, probeMod = 100, k = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(out == Set((0L, 1L, 1), (0L, 4L, 2), (0L, 2L, 3)))
  }

  test("annIvf searches only nprobe buckets and never returns the probe itself") {
    // centroids: ids 0, 25; two clusters around x-axis and y-axis
    val rows = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.9, 0.1)), (2L, Seq(0.95, 0.05)),
      (25L, Seq(0.0, 1.0)), (26L, Seq(0.1, 0.9)), (27L, Seq(0.05, 0.95)))
    val out = VectorOps.annIvf(emb(rows: _*), centroidMod = 25, probeMod = 100,
      nprobe = 1, k = 10).as[(Long, Long, Int)].collect()
    val neighbors = out.map(_._2).toSet
    assert(out.forall(_._1 == 0L))
    assert(!neighbors.contains(0L))
    // nprobe=1: only the x-cluster bucket is searched
    assert(neighbors.subsetOf(Set(1L, 2L)))
  }

  test("ivf with nprobe=2 reaches both buckets") {
    val rows = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.9, 0.1)),
      (25L, Seq(0.0, 1.0)), (26L, Seq(0.1, 0.9)))
    val out = VectorOps.annIvf(emb(rows: _*), centroidMod = 25, probeMod = 100,
      nprobe = 2, k = 10).as[(Long, Long, Int)].collect()
    assert(out.map(_._2).toSet == Set(1L, 25L, 26L))
  }

  test("brute-force plan broadcasts the probe side (no shuffled product)") {
    val df = emb((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
    val plan = VectorOps.annBruteForce(df).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(500))
    assert(!plan.contains("CartesianProduct"))
  }
}
