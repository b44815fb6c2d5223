package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the LONG fixed-point accumulator of the recluster retrain's Lloyd
  * refine (r15 optimization: the DECIMAL(38,18) sum was ~2.4 s of each ~3 s
  * refine pass at the 100×-root fixture — BigDecimal addition per cell —
  * while the retrained codebook is gauged only by recall floors, never
  * replayed bit-exactly by an oracle):
  *
  *  1. the arithmetic is EXACTLY sum(round(x·2^38))/2^38/count — integer
  *     sums commute, so the refined centroid is deterministic across
  *     partitionings (the property the decimal sum was bought for);
  *  2. the fixed-point mean sits within 2^-38 per coordinate of the true
  *     mean — quantization far below the k-means noise floor.
  */
class LloydFixedPointSpec extends SparkSpec {
  import spark.implicits._

  private val scale = math.pow(2.0, 38)

  /** Spark round() semantics: HALF_UP via BigDecimal (Math.round differs on
    * negative halves). */
  private def fxRound(x: Double): Long =
    BigDecimal(x * scale).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private def fxMean(xs: Seq[Double]): Double =
    xs.map(fxRound).sum.toDouble / scale / xs.length

  test("kmeansCentroids refines to the exact fixed-point bucket means") {
    // two tight, well-separated clusters: the assignment is stable across
    // both Lloyd iterations, so the final centroid IS the bucket's mean —
    // hand-computable with the same fixed-point arithmetic
    val rows = (0L until 40L).map { i =>
      if (i % 2 == 0) i -> Seq(1.0, 0.017 * (i % 7), -0.003 * (i % 5), 0.0)
      else i -> Seq(0.013 * (i % 7), 1.0, 0.0, 0.009 * (i % 3))
    }
    val v = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("n", sqrt(VectorOps.dot("e", "e")))
    val got = VectorOps.kmeansCentroids(v, centroidMod = 25)
      .select(col("centroid_id"), col("ce"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(got.keySet == Set(0L, 25L), s"unexpected centroids: ${got.keySet}")
    val even = rows.filter(_._1 % 2 == 0).map(_._2)
    val odd = rows.filter(_._1 % 2 == 1).map(_._2)
    def expected(cluster: Seq[Seq[Double]]): Seq[Double] =
      cluster.transpose.map(fxMean)
    assert(got(0L) == expected(even),
      s"even-cluster centroid diverged from the exact fixed-point mean:\n" +
        s"got ${got(0L)}\nexp ${expected(even)}")
    assert(got(25L) == expected(odd),
      s"odd-cluster centroid diverged from the exact fixed-point mean:\n" +
        s"got ${got(25L)}\nexp ${expected(odd)}")
    // closeness to the unquantized mean: within 2^-38 + double rounding
    val trueMean = even.transpose.map(c => c.sum / c.length)
    got(0L).zip(trueMean).foreach { case (g, t) =>
      assert(math.abs(g - t) < 1e-9, s"fixed-point mean too far: $g vs $t")
    }
    graft.Caching.releaseAll()
  }
}
