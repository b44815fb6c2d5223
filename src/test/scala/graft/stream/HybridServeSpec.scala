package graft.stream

import graft.SparkSpec

/**
 * The serving capstone: hybrid (RRF) retrieval running ENTIRELY off the
 * persisted, incrementally-maintained indexes — [[CorpusIngest.search]]
 * (lexical BM25 postings) fused with [[EmbeddingIngest.search]] (frozen-
 * codebook IVF) by [[Retrieval.rrfFuse]]. Each search face is pinned
 * against its monolithic twin by its own spec; what THIS spec pins is the
 * composition: the two served lists carry compatible shapes, the fusion
 * runs read-only (no lock, no state change), and the fused scores replay
 * bit-for-bit from an independent Scala fold of the two collected lists —
 * the same 1/(k+rank) IEEE arithmetic in the same fixed order.
 */
class HybridServeSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-hybrid").toString

  test("hybrid RRF served from the persisted lexical + vector indexes replays exactly") {
    // --- corpus side: 6 mutually-unrelated docs, graded stopword density;
    // doc 3 and doc 6 hold NO query term (lexical-absent, possibly
    // semantic-present — the asymmetry RRF exists to fuse)
    val texts = Seq(
      1L -> "the quick brown fox jumps over the lazy dog of the north the end",
      2L -> "of mice and men of the dust bowl era of hardship and of toil",
      3L -> "silent hills echo when winter arrives early each year anyway",
      4L -> "captains log the voyage started smoothly despite warnings",
      5L -> "recipes call for butter sugar flour and a pinch of salt",
      6L -> "binary trees rotate left right during rebalancing operations")
    val lexRoot = tmpDir()
    val lexCfg = CorpusIngest.IngestConfig("unused", lexRoot, "unused")
    assert(CorpusIngest.ingestBatch(spark, lexCfg,
      texts.take(3).toDF("doc_id", "text"), 0L) == 3L)
    assert(CorpusIngest.ingestBatch(spark, lexCfg,
      texts.drop(3).toDF("doc_id", "text"), 1L) == 3L)

    // --- vector side: ids 1..6 are orthogonal basis directions (cos 0 —
    // nothing dedups); the probe's components grade the cosines so the
    // semantic ranking is exactly 1,2,3,4 at k = 4
    def basis(i: Int): Seq[Float] = Seq.tabulate(8)(j => if (j == i - 1) 1f else 0f)
    val vecRoot = tmpDir()
    val vecCfg = EmbeddingIngest.IngestConfig("unused", vecRoot, "ckpt-H",
      centroidMod = 3) // id 3 is in batch 0: codebook freezes immediately
    assert(EmbeddingIngest.ingestBatch(spark, vecCfg,
      (1L to 3L).map(i => i -> basis(i.toInt)).toDF("vec_id", "embedding"), 0L) == 3L)
    assert(EmbeddingIngest.ingestBatch(spark, vecCfg,
      (4L to 6L).map(i => i -> basis(i.toInt)).toDF("vec_id", "embedding"), 1L) == 3L)
    val probe = Seq(100L -> Seq(0.9f, 0.8f, 0.7f, 0.6f, 0.5f, 0.4f, 0f, 0f))
      .toDF("vec_id", "embedding")

    // --- the served lists
    val terms = Seq("the", "of")
    val lex = CorpusIngest.search(spark, lexCfg, terms, topK = 20)
      .select("doc_id", "rank").as[(Long, Int)].collect().toSeq
    val sem = EmbeddingIngest.search(spark, vecCfg, probe, k = 4)
      .select("probe_id", "neighbor_id", "rank").as[(Long, Long, Int)]
      .collect().toSeq
    // doc 3 holds no query term; docs 5 and 6 are outside the semantic top-4
    assert(!lex.map(_._1).contains(3L) && lex.map(_._1).toSet == Set(1L, 2L, 4L, 5L))
    assert(sem.map(_._2) == Seq(1L, 2L, 3L, 4L))

    // --- the fused serving path, through the one-call API
    val fused = HybridServe.search(spark, lexCfg, vecCfg, terms, probe,
        kLex = 20, kSem = 4)
      .select("probe_id", "doc_id", "rrf", "rank")
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4).toSeq

    // --- independent replay: the same 1/(60+rank) + 1/(60+rank) fold over
    // the two collected lists, same IEEE ops in the same order
    val lexM = lex.toMap
    val semM = sem.map { case (_, d, r) => d -> r }.toMap
    val expected = (lexM.keySet ++ semM.keySet).toSeq
      .map { d =>
        val s = semM.get(d).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
          lexM.get(d).map(r => 1.0 / (60 + r)).getOrElse(0.0)
        (d, s)
      }
      .sortBy { case (d, s) => (-s, d) }
      .zipWithIndex.map { case ((d, s), i) => (100L, d, s, i + 1) }
    assert(fused == expected)

    // --- the ACL-filtered serve: disallow docs 1 and 4 — neither may
    // surface through EITHER modality, and both lists REFILL from the
    // allowed corpus (doc 5 enters the semantic top-4 in 4's place;
    // the lexical list re-ranks over {2, 5})
    val allowed = Seq(2L, 3L, 5L, 6L).toDF("doc_id")
    val filtered = HybridServe.search(spark, lexCfg, vecCfg, terms, probe,
        kLex = 20, kSem = 4, allowed = Some(allowed))
      .select("doc_id", "rank").as[(Long, Int)].collect().toSeq
    assert(!filtered.map(_._1).exists(Set(1L, 4L)),
      s"a disallowed doc surfaced through the filtered hybrid: $filtered")
    val semF = EmbeddingIngest.search(spark, vecCfg, probe, k = 4,
        allowed = Some(allowed))
      .select("neighbor_id").as[Long].collect().toSeq
    assert(semF == Seq(2L, 3L, 5L, 6L),
      s"the semantic list must refill from the allowed corpus: $semF")

    // serving took no lock and mutated nothing: both roots are immediately
    // writable and the ledgers are untouched
    assert(CorpusIngest.ingestBatch(spark, lexCfg,
      Seq(7L -> "completely novel words appear here tonight").toDF("doc_id", "text"),
      2L) == 1L)
    assert(EmbeddingIngest.ingestBatch(spark, vecCfg,
      Seq(7L -> Seq(0f, 0f, 0f, 0f, 0f, 0f, 1f, 0f)).toDF("vec_id", "embedding"),
      2L) == 1L)
    graft.Caching.releaseAll()
  }
}
