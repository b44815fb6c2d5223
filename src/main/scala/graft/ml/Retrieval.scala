package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Hybrid retrieval — fusing a keyword ranking (BM25) with a vector ranking
 * (ANN cosine) by reciprocal-rank fusion (RRF; Cormack, Clarke &
 * Buettcher, SIGIR 2009): score(d) = Σ_lists 1/(k + rank_list(d)). The
 * production RAG retrieval shape: lexical recall catches exact terms the
 * embedding misses, semantic recall catches paraphrases the terms miss,
 * and rank fusion needs no score calibration between the two (ranks are
 * scale-free, which is why RRF beats score averaging across heterogeneous
 * retrievers).
 *
 * Scale: both inputs are TOP-K LISTS, not corpora — the fusion join is
 * bounded by k_sem·|probes| + k_lex·|probes| rows regardless of corpus
 * size. The lexical list is global (built once, broadcast per probe); the
 * full-outer join on (probe, doc) unions the candidate sets; one
 * probe-partitioned window ranks the fused scores. Determinism: ranks are
 * exact integers, each RRF term is one IEEE division, and the two-term sum
 * has a fixed order — the DuckDB oracle replays scores bit-for-bit.
 */
object Retrieval {

  /** Global ranks of a bounded score list WITHOUT a partition-less window
    * (build-gated by PlanGuardSpec): sort+limit plans as TakeOrdered, the
    * ≤ k survivors collapse to ONE sorted array row (order pinned by the
    * unique (−score, id) struct), and posexplode emits rank = position+1.
    * Scale-safe because k bounds every step after the TakeOrdered. */
  def topKRanks(scored: DataFrame, idCol: String, scoreCol: String,
      k: Int, rankName: String): DataFrame = {
    val top = scored.orderBy(col(scoreCol).desc, col(idCol).asc).limit(k)
    top
      .agg(sort_array(collect_list(struct(
        negate(col(scoreCol)).as("ns"), col(idCol).as("id")))).as("a"))
      .select(posexplode(col("a")).as(Seq("pos", "s")))
      .select(col("s.id").as(idCol), (col("pos") + 1).cast("int").as(rankName))
  }

  /** Fuse a per-probe semantic ranking `sem` (probe_id, doc_id, srank) with
    * a global lexical ranking `lex` (doc_id, lrank): RRF over the union of
    * both candidate lists, top `topK` per probe. Output:
    * (probe_id, doc_id, rrf, rank). */
  def rrfFuse(sem: DataFrame, lex: DataFrame, kRrf: Int = 60,
      topK: Int = 10): DataFrame = {
    // the semantic list is probes×k rows — tiny; caching it keeps the probe
    // enumeration from re-running the ANN scoring pipeline
    val s = graft.Caching.scoped(sem)
    val probes = s.select(col("probe_id")).distinct()
    // the global lexical top-k replicated per probe: k_lex rows broadcast —
    // a bounded nested-loop by construction
    val lexPer = probes.crossJoin(broadcast(lex))
    val fused = s.join(lexPer, Seq("probe_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(kRrf) + col("srank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf) + col("lrank")), lit(0.0)))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("probe_id"), col("doc_id"), col("rrf"), col("rank"))
  }
}
