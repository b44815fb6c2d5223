package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/**
 * Radius-search contracts the oracle alone can't falsify off-fixture:
 * the IVF range path must return a SUBSET of the exact in-radius set
 * (its candidates pass the same exact cosine filter — a bucket bug that
 * admitted a non-neighbor would corrupt downstream dedup silently), the
 * brute path must BE that set, and recall at the shipped operating point
 * (nprobe=2, tau=0.3) must clear a pinned floor so a parameter
 * regression fails the build, not a bench round.
 */
class RangeSearchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("probe_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("ivf range results are a subset of brute-force truth, recall above floor") {
    val emb = Tables(spark, dir, "embeddings")
    val truth = pairs(VectorOps.annRange(emb))
    val found = pairs(VectorOps.annRangeIvf(emb))
    assert(truth.nonEmpty, "fixture yields no in-radius pairs; threshold dead")
    assert(found.subsetOf(truth),
      s"ivf emitted ${found.diff(truth)} outside the exact radius set")
    val recall = found.size.toDouble / truth.size
    info(s"range recall at nprobe=2 tau=0.3: $recall (${found.size}/${truth.size})")
    assert(recall >= 0.8, s"range recall $recall fell below floor 0.8")
    graft.Caching.releaseAll()
  }

  test("every emitted cosine actually clears tau, and self-pairs are excluded") {
    val emb = Tables(spark, dir, "embeddings")
    val rows = VectorOps.annRange(emb).collect()
    assert(rows.forall(_.getAs[Double]("cos") >= 0.3))
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
    graft.Caching.releaseAll()
  }
}
