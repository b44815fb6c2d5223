package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[VectorOps.pcaProject]] — the all-integer dominant-direction PCA.
  * Cross-engine exactness is pinned by the gate entry; these tests pin the
  * algebra: the projection follows the dominant axis, centering makes the
  * projections sum to EXACTLY zero, and the result is invariant to row
  * order. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("projection is monotone along the dominant-variance axis, with the " +
      "canonical (first-component-positive) orientation") {
    // variance lives overwhelmingly on coordinate 1; coords 2-4 are noise
    val d = emb(
      (1L, Seq(-1.0f, 0.01f, -0.02f, 0.0f)),
      (2L, Seq(-0.5f, -0.01f, 0.01f, 0.02f)),
      (3L, Seq(0.0f, 0.02f, 0.0f, -0.01f)),
      (4L, Seq(0.5f, 0.0f, -0.01f, 0.01f)),
      (5L, Seq(1.0f, -0.02f, 0.02f, 0.0f)))
    val p = VectorOps.pcaProject(d).as[(Long, Long)].collect().toMap
    assert((1L to 4L).forall(i => p(i) < p(i + 1)),
      s"projections must increase along coord 1: $p")
  }

  test("centered projections sum to exactly zero (integer identity, not a " +
      "float approximation)") {
    val d = emb((1 to 40).map(i =>
      (i.toLong, Seq(math.sin(i * 1.7).toFloat, math.cos(i * 0.9).toFloat,
        (i % 7 / 7.0).toFloat, math.sin(i * 0.3).toFloat))): _*)
    val s = VectorOps.pcaProject(d).agg(sum($"pc1")).as[Long].head()
    assert(s == 0L)
  }

  test("pcaExplained: a strongly anisotropic corpus shows the dominant " +
      "axis carrying most of the trace; isotropic noise does not") {
    val aniso = emb((1 to 60).map(i =>
      (i.toLong, Seq((math.sin(i * 2.39) * 1.0).toFloat, 0.02f * (i % 3 - 1),
        0.02f * (i % 5 - 2) / 2, 0.01f * (i % 2)))): _*)
    val a = VectorOps.pcaExplained(aniso)
      .select($"share_ppm", $"d", $"n_vecs").as[(Long, Long, Long)].head()
    assert(a._2 == 4L && a._3 == 60L)
    assert(a._1 > 500000L, s"dominant axis must carry >50%: ${a._1} ppm")
    val iso = emb((1 to 60).map(i =>
      (i.toLong, Seq(math.sin(i * 2.39).toFloat, math.cos(i * 3.31).toFloat,
        math.sin(i * 5.17).toFloat, math.cos(i * 7.03).toFloat))): _*)
    val b = VectorOps.pcaExplained(iso).select($"share_ppm").as[Long].head()
    assert(b < 600000L, s"isotropic corpus must not concentrate: $b ppm")
    assert(a._1 > b)
  }

  test("row order cannot change the result (integer aggregation commutes)") {
    val rows = (1 to 30).map(i =>
      (i.toLong, Seq((i * 0.1).toFloat, math.cos(i * 2.1).toFloat,
        ((i % 5) * 0.2).toFloat, 0.05f * (i % 3))))
    val a = VectorOps.pcaProject(emb(rows: _*))
      .as[(Long, Long)].collect().toMap
    val b = VectorOps.pcaProject(emb(rows.reverse: _*))
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }
}
