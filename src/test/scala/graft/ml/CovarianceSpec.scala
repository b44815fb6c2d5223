package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[VectorOps.covarianceReport]] — the exact-arithmetic covariance face.
  * Hand fixture first (population covariance of a 2×2 case), then contract
  * checks on the real corpus: triangle shape, non-negative diagonal, and
  * agreement with a directly-computed double covariance (tolerance-level —
  * the gate pins bit-exactness against DuckDB; this pins the MATH). */
class CovarianceSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed 2x2 fixture: population variance and covariance") {
    val emb = Seq(Seq(1.0f, 2.0f), Seq(3.0f, 6.0f)).toDF("embedding")
    val got = VectorOps.covarianceReport(emb).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(2), r.getDouble(6))))
      .toMap
    assert(got.keySet === Set((1, 1), (1, 2), (2, 2)))
    // var({1,3}) = 1, cov = E[xy]-E[x]E[y] = 10-8 = 2, var({2,6}) = 4
    assert(got((1, 1)) === ((2L, 1.0)))
    assert(got((1, 2)) === ((2L, 2.0)))
    assert(got((2, 2)) === ((2L, 4.0)))
  }

  test("real corpus: triangle shape, n = corpus, diagonal non-negative") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val rows = VectorOps.covarianceReport(emb).collect()
    val d = 64
    assert(rows.length === d * (d + 1) / 2)
    val n = emb.count()
    assert(rows.forall(_.getLong(2) == n))
    assert(rows.filter(r => r.getInt(0) == r.getInt(1))
      .forall(_.getDouble(6) >= 0.0))
  }

  test("embeddingOutliers: hand fixture scores and deterministic order") {
    // three 1-dim vectors {0, 1, 8}: mean 3, n=2... population terms
    // (n·x − Σx)²/(n·Σx² − Σx²) with n=3, Σx=9·2^20, Σx²=65·2^40:
    // denominator 3·65−81 = 114 (·2^40); scores: x=0 → 81/114,
    // x=1 → 36/114, x=8 → 225/114 — outlier order 8, 0, 1
    val emb = Seq((1L, Seq(0.0f)), (2L, Seq(1.0f)), (3L, Seq(8.0f)))
      .toDF("vec_id", "embedding")
    val got = VectorOps.embeddingOutliers(emb, topK = 3).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.map(_._1).toSeq === Seq(3L, 1L, 2L))
    assert(got(0)._2 === 225.0 / 114.0)
    assert(got(1)._2 === 81.0 / 114.0)
    assert(got(2)._2 === 36.0 / 114.0)
  }

  test("embeddingOutliers: scores agree with a direct double computation") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val vecs = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    val n = vecs.size.toDouble
    val d = vecs.values.head.length
    val mean = Array.tabulate(d)(i => vecs.values.map(_(i)).sum / n)
    val vari = Array.tabulate(d)(i =>
      vecs.values.map(v => (v(i) - mean(i)) * (v(i) - mean(i))).sum / n)
    def direct(v: Array[Double]): Double =
      (0 until d).map(i => (v(i) - mean(i)) * (v(i) - mean(i)) / vari(i)).sum
    val got = VectorOps.embeddingOutliers(emb, topK = 10).collect()
    got.foreach { r =>
      assert(math.abs(r.getDouble(1) - direct(vecs(r.getLong(0)))) < 1e-3,
        s"vec ${r.getLong(0)}")
    }
  }

  test("wideSums: DECIMAL(38,0) accumulators bit-equal to the long path") {
    // the 100 TB accumulator (VERDICT r14 item 7): above
    // covarianceLongSafeRows the sums widen to DECIMAL(38,0) — same plan
    // shape, and on a corpus where BOTH are exact they must agree exactly:
    // integer sums value-equal, the cov double bit-equal (a decimal→double
    // cast of an integer rounds identically to long→double)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def keyed(wide: Boolean) = VectorOps.covarianceReport(emb, wideSums = wide)
      .collect().map { r =>
        val sums = // (sxy, sx, sy) at 3..5; n (long on both paths) at 2
          if (wide) (3 to 5).map(k => BigDecimal(r.getDecimal(k)))
          else (3 to 5).map(k => BigDecimal(r.getLong(k)))
        (r.getInt(0), r.getInt(1)) ->
          ((sums, r.getLong(2), java.lang.Double.doubleToLongBits(r.getDouble(6))))
      }.toMap
    val narrow = keyed(wide = false)
    val wide = keyed(wide = true)
    assert(narrow.keySet === wide.keySet)
    narrow.foreach { case (k, v) => assert(wide(k) === v, s"pair $k") }
    assert(VectorOps.covarianceLongSafeRows(20) === (1L << 20))
  }

  test("embeddingOutliers: a zero-variance coordinate contributes 0") {
    // constant coordinate 2 (ADVICE r14): its denominator n·Σx²−(Σx)² is
    // exactly 0 — the guard defines the term as 0 instead of Spark's
    // non-ANSI NaN, so the scores equal the 1-dim fixture's exactly
    val emb = Seq((1L, Seq(0.0f, 5.0f)), (2L, Seq(1.0f, 5.0f)),
        (3L, Seq(8.0f, 5.0f)))
      .toDF("vec_id", "embedding")
    val got = VectorOps.embeddingOutliers(emb, topK = 3).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.map(_._1).toSeq === Seq(3L, 1L, 2L))
    assert(got.forall(g => !g._2.isNaN && !g._2.isInfinite))
    assert(got(0)._2 === 225.0 / 114.0)
    assert(got(1)._2 === 81.0 / 114.0)
    assert(got(2)._2 === 36.0 / 114.0)
  }

  test("matches a directly-computed double covariance to quantization error") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val vecs = emb.select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = vecs.length.toDouble
    def direct(i: Int, j: Int): Double = {
      val sxy = vecs.map(v => v(i - 1) * v(j - 1)).sum
      val sx = vecs.map(_(i - 1)).sum
      val sy = vecs.map(_(j - 1)).sum
      (sxy - sx * sy / n) / n
    }
    val got = VectorOps.covarianceReport(emb).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(6))).toMap
    // quantization error per coordinate is <= 2^-21; covariance error is
    // bounded well under 1e-5 at unit-scale inputs
    Seq((1, 1), (1, 64), (7, 23), (64, 64)).foreach { case (i, j) =>
      assert(math.abs(got((i, j)) - direct(i, j)) < 1e-5, s"($i,$j)")
    }
  }
}
