package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.{LlmWorkload, Tables}

/**
 * Recall floors for the approximate-ANN variants: `ann_recall` MEASURES
 * ivf/pq/ivfpq recall against brute-force truth, but a green oracle row
 * proves only that the measurement replays — an index-parameter regression
 * (nprobe, m, centroidMod) would sail through with a silently worse index.
 * These floors pin the operating point: drop nprobe to 1, coarsen the
 * codebooks, or break the candidate join, and this spec goes red before a
 * bench/judge round notices.
 */
class AnnRecallFloorSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def recalls(): Map[String, Double] =
    LlmWorkload.annRecall(spark, dir).collect()
      .map(r => r.getAs[String]("method") -> r.getAs[Double]("recall")).toMap

  private def recallOf(approx: DataFrame): Double = {
    val emb = Tables(spark, dir, "embeddings")
    val bf = VectorOps.annBruteForce(emb)
      .select(col("probe_id"), col("neighbor_id"))
    val total = bf.count()
    val matched = approx.select(col("probe_id"), col("neighbor_id"))
      .join(bf, Seq("probe_id", "neighbor_id")).count()
    matched.toDouble / total
  }

  test("ivf/pq/ivfpq recall stays above the pinned floors at current defaults") {
    val r = recalls()
    info(s"measured recalls: $r")
    // floors sit between the defaults' measured recall on this fixture
    // (deterministic: mod-sampled codebooks, tie-broken argmins; pq/ivfpq
    // serve through the exact re-rank stage since round 8) and what a
    // degraded parameter produces (ivf at nprobe=1, pq/ivfpq with re-rank
    // disabled — see the sensitivity tests)
    assert(r("ivf") >= 0.80, s"ivf recall ${r("ivf")} fell below floor 0.80")
    assert(r("pq") >= 0.80, s"pq recall ${r("pq")} fell below floor 0.80")
    assert(r("ivfpq") >= 0.80, s"ivfpq recall ${r("ivfpq")} fell below floor 0.80")
    // hier's floor sits higher: the two-level router at defaults measures
    // 0.94 on this fixture while the degraded metaProbe=1/nprobe=1 point
    // measures 0.86 — 0.80 would not separate them (deterministic fixture,
    // 0.04 margin each side)
    assert(r("hier") >= 0.90, s"hier recall ${r("hier")} fell below floor 0.90")
    graft.Caching.releaseAll()
  }

  test("the hier floor is sensitive: metaProbe = 1 falls below it") {
    // the two-level quantizer's recall risk is the META routing level:
    // a probe whose true neighbors live under a different meta never sees
    // their buckets. metaProbe = 2 is the standard compensation; this case
    // pins that the floor actually guards it
    val emb = Tables(spark, dir, "embeddings")
    val degraded = recallOf(VectorOps.annIvfHier(emb, metaProbe = 1, nprobe = 1))
    info(s"metaProbe=1/nprobe=1 hier recall: $degraded")
    assert(degraded < 0.90,
      s"metaProbe=1 recall $degraded did not fall below the 0.90 hier floor — " +
        "the floor no longer guards the meta fan-out")
    graft.Caching.releaseAll()
  }

  test("the ivf floor is sensitive: nprobe = 1 falls below it") {
    val emb = Tables(spark, dir, "embeddings")
    val degraded = recallOf(VectorOps.annIvf(emb, nprobe = 1))
    info(s"nprobe=1 ivf recall: $degraded")
    assert(degraded < 0.80,
      s"nprobe=1 recall $degraded did not fall below the 0.80 ivf floor — " +
        "the floor no longer guards the parameter")
    graft.Caching.releaseAll()
  }

  test("the pq/ivfpq floors are sensitive: disabling the re-rank falls below") {
    val emb = Tables(spark, dir, "embeddings")
    val rawPq = recallOf(VectorOps.annPq(emb, rerank = 0))
    val rawIvfPq = recallOf(VectorOps.annIvfPq(emb, rerank = 0))
    info(s"raw-ADC recalls: pq=$rawPq ivfpq=$rawIvfPq")
    assert(rawPq < 0.80,
      s"raw-ADC pq recall $rawPq did not fall below the 0.80 floor — " +
        "the floor no longer guards the re-rank stage")
    assert(rawIvfPq < 0.80,
      s"raw-ADC ivfpq recall $rawIvfPq did not fall below the 0.80 floor — " +
        "the floor no longer guards the re-rank stage")
    graft.Caching.releaseAll()
  }
}
