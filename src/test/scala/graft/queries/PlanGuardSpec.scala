package graft.queries

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.window.WindowExec

import graft.SparkSpec
import graft.SparkEntry

/**
 * Plan-regression guard: a future edit that turns any registered query into
 * an accidental cartesian (or an unjustified nested-loop broadcast) fails
 * `sbt test` instead of waiting for a bench/judge round to notice.
 *
 * `CartesianProduct` is never acceptable. `BroadcastNestedLoopJoin` is
 * acceptable only on the audited whitelist: queries whose plans broadcast a
 * ONE-ROW scalar anchor (watermark/threshold probes) or the intentionally
 * broadcast ANN probe/centroid sets — each verified individually in the
 * round-2 plan audit (PLANS.md / VERDICT r2).
 *
 * A partition-less `WindowExec` ("Moving all data to a single partition")
 * is the third guarded anti-pattern: every registered window must carry a
 * partitionSpec, because an unpartitioned window funnels the whole input
 * through one task at any scale. The former offenders (quality_deciles,
 * prep_zorder) now derive exact ntile buckets from broadcast
 * ExactQuantile boundary rows, so the whitelist is empty.
 */
class PlanGuardSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private val dir = "/root/testdata/sf0.001"

  private val bnljAllowed = Set(
    "ann_topk_bruteforce",    // probe set broadcast against the corpus
    "ann_knn_classify",       // same brute-force probe broadcast, label-voted
    "ann_topk_filtered",      // probe set broadcast against the FILTERED corpus
    "ann_topk_ivf",           // centroid set broadcast (bucketing)
    "ann_topk_ivf_indexed",   // frozen centroid set broadcast (seed-trained)
    "ann_topk_ivf_served",    // same frozen centroid broadcast, persisted root
    "ann_topk_ivf_hier",      // meta + per-meta child codebook broadcasts
    "ann_topk_ivf_hier_served", // same meta-set broadcast, persisted routing table
    "ann_topk_ivfpq",         // centroid set broadcast (bucketing) + code tables
    "ann_topk_ivfpq_served",  // same broadcasts, persisted bucket-clustered codes
    "dedup_embedding_pairs",  // centroid set broadcast (bucketing)
    "dedup_embedding_srp_pairs", // hyperplane set + 1-row dim anchor broadcast
    "dedup_embedding_incremental", // same SRP hyperplane/dim broadcasts, both halves
    "registry_embedding_probe", // same SRP hyperplane/dim broadcasts, probe face
    "registry_embedding_probe_pairs", // same broadcasts, pair-evidence stage alone
    "srp_band_health",        // same hyperplane/dim broadcasts + 1-row n_vecs anchor
    "reband_probe",           // same SRP hyperplane/dim broadcasts, rebanded root
    "dedup_embedding_clusters",  // CC over the same SRP pair pipeline
    "f7_delete_suppression",  // 1-row max(ts) "now" anchor
    "j2_dup_count",           // 1-row time-window anchor
    "j3_dedup_purge",         // 1-row time-window anchor
    "s11_retention_delete",   // 1-row retention-watermark anchor
    "srt1_retention_watermark", // 1-row watermark probe
    "text_bm25",              // 1-row corpus-statistics (N, Σdl, df) anchor
    "text_bm25_indexed",      // 1-row summed-stats (N, Σdl) anchor
    "ann_recall",             // probe-set broadcasts + 1-row total anchor
    "ann_matryoshka_recall",  // same brute-force probe broadcasts over the
                              // dim prefixes + 1-row total anchor
    "text_tfidf_top",         // 1-row corpus-count anchor
    "embedding_outliers",     // 1-row coordinate-stats array anchor (64
                              // structs broadcast back for the scoring fold)
    "kmeans_clusters",        // k-row centroid set broadcast (argmax assign)
    "kmeans_label_purity",    // same k-means centroid broadcasts, label-voted
    "agg_kmv_sketch",         // 1-row direct × 1-row merged sketch summary
    "prep_mixture_sample",    // 1-row mixture-scale (K) anchor
    "agg_sketches",           // 1-row approx × exact-twin summaries crossJoined
    "dedup_semantic",         // k-row centroid set broadcast (argmax assign)
    "text_heavy_hitters",     // 1-row total-count anchor
    "registry_cluster_stats", // four 1-row delta-adjustment anchors
    "registry_embedding_cluster_stats", // same summary+delta anchors
    "retrieval_hybrid_rrf",   // probe-set + bounded (k=20) lexical-list broadcasts
    "retrieval_hybrid_served", // same bounded lexical-list broadcast, persisted legs
    "retrieval_hybrid_filtered_served", // same broadcasts, ACL-filtered legs
    "retrieval_mrr",          // same retrieval broadcasts, truth-joined
    "text_pmi_bigrams",       // 1-row corpus-totals (n_uni, n_bi) anchor
    "ann_ivf_drift",          // centroid broadcast + 1-row (total, k) anchor
    "text_vocab_shift",       // 1-row per-half totals anchor
    "q22_idle_balances",      // 1-row (Σbal, n) scalar-subquery anchor
    "q11_important_stock",    // 1-row Σvalue total anchor (cross-multiplied cut)
    "ann_range_bruteforce",   // probe set broadcast against the corpus (radius)
    "ann_range_ivf",          // centroid set broadcast (bucketing), radius filter
    "ann_range_served",       // same frozen centroid broadcast, persisted root
    "ann_range_recall")       // same broadcasts + two 1-row count anchors

  test("no registered query plans a cartesian, unjustified nested-loop join, " +
      "or partition-less window") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val exec = fn(spark, dir).queryExecution.executedPlan
        val plan = exec.toString
        val cart = plan.contains("CartesianProduct")
        val bnlj = plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed(name)
        // collect() from AdaptiveSparkPlanHelper descends through AQE nodes
        val globalWindow = collect(exec) {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        }.nonEmpty
        if (cart || bnlj || globalWindow)
          Some(s"$name: cartesian=$cart unjustifiedBnlj=$bnlj " +
            s"globalWindow=$globalWindow")
        else None
    }
    // building quality_deciles/prep_zorder runs real jobs (cutpoint
    // collects) whose Caching.scoped frames belong to no enclosing scope
    // here — release them so this plan-only loop doesn't carry cached
    // state into later suites
    graft.Caching.releaseAll()
    assert(offenders.isEmpty,
      s"plan regressions:\n${offenders.mkString("\n")}")
  }
}
