package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("topKRanks ranks by score desc with id tiebreak, bounded by k") {
    val scored = Seq((1L, 0.5), (2L, 0.9), (3L, 0.9), (4L, 0.1), (5L, 0.7))
      .toDF("doc_id", "score")
    val ranked = Retrieval.topKRanks(scored, "doc_id", "score", k = 3, "r")
      .as[(Long, Int)].collect().toMap
    // 0.9@2 before 0.9@3 (id tiebreak), then 0.7@5; k=3 drops the rest
    assert(ranked == Map(2L -> 1, 3L -> 2, 5L -> 3))
  }

  test("rrfFuse unions both candidate lists and sums reciprocal ranks") {
    // probe 10: semantic list (100 r1, 101 r2); lexical list (101 r1, 102 r2)
    val sem = Seq((10L, 100L, 1), (10L, 101L, 2)).toDF("probe_id", "doc_id", "srank")
    val lex = Seq((101L, 1), (102L, 2)).toDF("doc_id", "lrank")
    val out = Retrieval.rrfFuse(sem, lex, kRrf = 60, topK = 10)
      .select("doc_id", "rrf", "rank")
      .as[(Long, Double, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // doc 101 is in BOTH lists: 1/(60+2) + 1/(60+1) — ranks fuse, top spot
    assert(out(101L)._1 == 1.0 / 62 + 1.0 / 61)
    assert(out(101L)._2 == 1)
    // single-list docs carry one term each; 100 (sem r1) beats 102 (lex r2)
    assert(out(100L) == ((1.0 / 61, 2)))
    assert(out(102L) == ((1.0 / 62, 3)))
    graft.Caching.releaseAll()
  }

  test("fusion candidates stay bounded per probe (no corpus-sized lists)") {
    val sem = (0 until 3).flatMap(p => (1 to 10).map(r =>
      (p.toLong, (100 * p + r).toLong, r))).toDF("probe_id", "doc_id", "srank")
    val lex = (1 to 20).map(r => (1000L + r, r)).toDF("doc_id", "lrank")
    val out = Retrieval.rrfFuse(sem, lex, topK = 1000)
    // ≤ k_sem + k_lex candidates per probe, every probe present
    val perProbe = out.groupBy("probe_id").count().as[(Long, Long)].collect().toMap
    assert(perProbe.keySet == Set(0L, 1L, 2L) && perProbe.values.forall(_ <= 30))
    graft.Caching.releaseAll()
  }

  test("retrievalMrr: one row per probe; rr is exactly 1/found_rank, 0 when fused out") {
    val out = graft.queries.LlmWorkload.retrievalMrr(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Double)].collect()
    val nProbes = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(pmod($"vec_id", lit(100)) === 0).count()
    assert(out.length == nProbes && nProbes > 0)
    out.foreach { case (_, _, fr, rr) =>
      if (fr == 0L) assert(rr == 0.0)
      else { assert(fr >= 1 && fr <= 10); assert(rr == 1.0 / fr) }
    }
    graft.Caching.releaseAll()
  }
}
