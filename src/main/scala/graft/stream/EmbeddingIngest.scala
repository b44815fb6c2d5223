package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.Caching
import graft.ml.VectorOps
import graft.text.TextOps

/**
 * Continuous EMBEDDING ingestion with streaming near-duplicate rejection —
 * the embedding twin of [[CorpusIngest]]: vectors arrive as parquet files,
 * each micro-batch is deduplicated against the PERSISTED SRP signature index
 * of everything accepted so far (plus a within-batch component resolution),
 * and the survivors are appended to the corpus and its index. This closes
 * the asymmetry where the streaming story deduped text incrementally but
 * rebuilt every embedding-side structure per query.
 *
 * Scale + exactly-once design (all inherited from [[CorpusIngest]]):
 *  - the index is APPEND-ONLY: an accepted batch appends its own rows to
 *    the vecs/bands tables under `ingest_batch=<batchId>` partitions —
 *    per-batch cost is O(batch + candidate joins), never an O(corpus)
 *    rewrite; SRP hyperplanes are pure functions of (bit, dim)
 *    ([[VectorOps.srpIndex]]), so band codes persisted months apart
 *    collide correctly;
 *  - at-least-once replay is idempotent: every write is a dynamic-partition
 *    OVERWRITE of the batch's own partition, decisions are deterministic,
 *    and a replayed batch's prior output is excluded from the index it
 *    probes;
 *  - probing joins the BATCH's bands against the index bands on
 *    (band, band-code) — cost follows the batch, the corpus is never
 *    rescanned; the stored per-vector norm keeps the verify to one cross
 *    dot product per candidate;
 *  - every mutating operation holds the corpus [[IngestLock]] (stable
 *    checkpoint+batchId owner, heartbeat before state writes), so
 *    batch-vs-compact serializes or refuses loudly.
 */
object EmbeddingIngest {

  final case class IngestConfig(
      /** Streaming source dir of incoming vectors (parquet: vec_id, embedding). */
      vecsDir: String,
      /** Root of the ingested corpus: vecs/, bands/, ledger/. */
      corpusRoot: String,
      checkpointDir: String,
      /** Cosine at or above this rejects the newcomer as a near-duplicate. */
      threshold: Double = 0.4,
      bits: Int = 16,
      bandBits: Int = 4,
      maxFilesPerTrigger: Int = 20,
      lockStaleMs: Long = IngestLock.DefaultStaleMs,
      /** IVF codebook pick (vec_id % centroidMod == 0 at freeze time). */
      centroidMod: Int = 25,
      /** Buckets searched per probe by [[search]]. */
      nprobe: Int = 2,
      /** PQ subspaces (frozen per-subspace codebooks; [[searchPq]]). */
      pqM: Int = 4,
      /** PQ codeword pick (vec_id % pqCodebookMod == 0 at freeze time). */
      pqCodebookMod: Int = 25,
      /** Meta-codebook pick for the two-level (hierarchical) router:
        * metas are the centroids with `centroid_id % metaMod == 0`
        * ([[VectorOps.ivfAssignHier]]). Only consulted when the router is
        * active (see [[hierNlist]]). */
      metaMod: Int = 100,
      /** Activate the persisted two-level router when the frozen codebook
        * holds MORE than this many centroids: assignment routes meta-first
        * (corpus × O(√nlist) instead of corpus × nlist), bucket selection
        * probes [[metaProbe]] metas then nprobe children, and nothing
        * larger than the meta set is broadcast — the nlist-beyond-broadcast
        * scale path. Default MaxValue = always flat; [[HierAuto]] (-1)
        * derives the mode from the frozen codebook size against the
        * measured crossover ([[AutoHierCrossover]]) — the guard against a
        * deployment running flat routing at nlist 10⁶ (broadcast ceiling
        * plus the measured 6× assignment cost, VERDICT r11 item 4).
        * Activity is a pure
        * function of (this threshold, the frozen codebook), so it can only
        * flip at freeze/recluster time, never between appends; serve and
        * ingest must share the cfg, like every other field here. */
      hierNlist: Long = Long.MaxValue,
      /** Metas probed per query when the hierarchical router is active
        * (the recall compensation for cross-meta neighbors). Default 3 —
        * the decided operating point (VERDICT r12 item 7): at the 100×
        * serve scale the r12 recall gauge measured 0.813 at metaProbe 2
        * (1.6% above the 0.80 floor) vs 0.875 at 3, and the third meta
        * costs ≈ +50% candidate buckets on a leg that is itself ~7×
        * cheaper than flat assignment at that nlist — the margin is worth
        * the spend (the `serve_ivf_hier_100x_mp2/_mp3` bench entries keep
        * the delta measured). */
      metaProbe: Int = 3)

  def vecsPath(cfg: IngestConfig): String = s"${cfg.corpusRoot}/vecs"
  private def bandsPath(cfg: IngestConfig) = s"${cfg.corpusRoot}/bands"
  /** The persisted signature-width marker ([[reband]]'s commit point):
    * 1 row (bits, band_bits), swap-written whole. Present ⇒ the serving
    * bands live in the width-suffixed directory; absent ⇒ the legacy
    * `bands/` at the cfg's creation width. */
  def bandWidthPath(cfg: IngestConfig): String = s"${cfg.corpusRoot}/bandwidth"

  /** Resolve (bands directory, bits, bandBits) for every SRP face: the
    * width is ROOT STATE, not configuration — a batch signed at a width
    * other than the index's joins garbage (band values live in different
    * ranges), so ingest appends, probes, and compaction folds all read
    * the marker first. The suffixed-directory scheme makes the marker
    * swap the ATOMIC commit: data is tied to its width by the directory
    * name, so no marker/bands tear can pair new-width signatures with an
    * old-width index (the recluster epoch problem, solved structurally
    * instead of with a stamp check). */
  private[stream] def resolvedBands(spark: SparkSession,
      cfg: IngestConfig): (String, Int, Int) =
    CorpusIngest.resolvedSrpBands(spark, cfg.corpusRoot, bandsPath(cfg),
      cfg.bits, cfg.bandBits)
  def ledgerPath(cfg: IngestConfig): String = s"${cfg.corpusRoot}/ledger"
  /** Append-only IVF assignment rows (vec_id, centroid_id, ingest_batch). */
  def ivfPath(cfg: IngestConfig): String = s"${cfg.corpusRoot}/ivf"
  /** The frozen IVF codebook (centroid_id, ce, cn, frozen_batch). */
  def centroidsPath(cfg: IngestConfig): String = s"${cfg.corpusRoot}/centroids"
  /** Append-only PQ code rows (vec_id, j, code_id, ingest_batch). */
  def pqPath(cfg: IngestConfig): String = s"${cfg.corpusRoot}/pq"
  /** The frozen per-subspace PQ codebooks (j, code_id, ce, frozen_batch). */
  def pqCodebooksPath(cfg: IngestConfig): String = s"${cfg.corpusRoot}/pqcb"
  /** The SERVING inverted lists ([[compact]]/[[recluster]]-built): vector +
    * norm stored NEXT TO the bucket id, hash-partitioned on
    * `bucket_p = centroid_id % [[ListsBuckets]]` and range-sorted by
    * centroid_id within each partition — the layout [[search]]'s pushed
    * centroid IN predicate prunes to directories + row groups instead of
    * scanning the corpus-sized vec store per query. */
  def ivfListsPath(cfg: IngestConfig): String = s"${cfg.corpusRoot}/ivflists"
  /** The PERSISTED child→meta routing table of the two-level router
    * (centroid_id, meta_id, frozen_batch): derived once per codebook
    * generation (the codebook-quadratic step), epoch-stamped like the
    * codebook, swap-written whole. Two ints per centroid — a sliver even
    * at nlist millions. */
  def metaRoutePath(cfg: IngestConfig): String = s"${cfg.corpusRoot}/metaroute"

  private val centDdl =
    "centroid_id BIGINT, ce ARRAY<DOUBLE>, cn DOUBLE, frozen_batch BIGINT"
  private val ivfDdl =
    "vec_id BIGINT, centroid_id BIGINT, epoch BIGINT, ingest_batch BIGINT"
  private val pqcbDdl =
    "j INT, code_id BIGINT, ce ARRAY<DOUBLE>, frozen_batch BIGINT"
  /** PQ code rows carry their coarse BUCKET too (`centroid_id` + the
    * `ivf_epoch` it was computed against): [[searchPq]] pre-filters the
    * code scan with the probes' pushed centroid IN list — the code table
    * is the one corpus-sized scan of the PQ serve, and bucket-clustered
    * codes prune it to the probed buckets. A stale annotation (the IVF
    * codebook reclustered but these rows' bucket column predates it) is
    * detected by the epoch stamp and merely disables the pruning — the
    * (vec_id, j, code_id) payload stays valid against the PQ codebooks. */
  private val pqDdl =
    "vec_id BIGINT, j INT, code_id BIGINT, epoch BIGINT, " +
      "centroid_id BIGINT, ivf_epoch BIGINT, ingest_batch BIGINT"
  private val vecsDdl =
    "vec_id BIGINT, embedding ARRAY<FLOAT>, n DOUBLE, ingest_batch BIGINT"
  private val listsDdl =
    "vec_id BIGINT, embedding ARRAY<FLOAT>, n DOUBLE, centroid_id BIGINT, " +
      "epoch BIGINT, upto_batch BIGINT, bucket_p INT"

  /** Hash-partition fan of the inverted-lists layout: `bucket_p =
    * centroid_id % ListsBuckets` is the PARTITION DIRECTORY key, so a
    * pushed `bucket_p IN (...)` prunes whole directories before any footer
    * is read; the range sort on centroid_id within each directory then
    * prunes row groups by min/max stats. At 100 TB raise this with nlist
    * (it bounds directory count, not correctness). */
  private[graft] val ListsBuckets = 32

  /** Cap on the probe-centroid-id list pushed into the assignment and
    * inverted-lists scans as an IN predicate — the
    * [[graft.text.UnionFind.MaxLabelFetchIds]] discipline at the serve
    * face. The list is |probes| × nprobe distinct ids (driver-safe,
    * query-bounded metadata); above the cap the serve falls back to the
    * join-only scan rather than ship an unbounded literal list (and past
    * the session's parquet push threshold the IN degrades to a min/max
    * range anyway — useless for scattered centroid ids). */
  private[graft] val MaxCentroidPushIds = 1000

  /** Stable lock identity — see [[CorpusIngest.batchLockOwner]]. */
  def batchLockOwner(cfg: IngestConfig, batchId: Long): String =
    s"embed-batch-$batchId@${cfg.checkpointDir}"

  /** Fail loudly unless every assignment row's `epoch` equals the
    * codebook's `frozen_batch` — the coherence gate between [[recluster]]'s
    * two atomic swaps. Centroids and assignments are published as two
    * tables; a lock-free reader (or a post-crash ingest) that sees a new
    * codebook with old assignments would silently lose candidates (the old
    * rows reference centroid_ids that mostly no longer exist), so mismatch
    * throws instead. Cost: a scan of the `epoch` column only — parquet
    * row-group min/max stats prune a healthy table to footer reads. */
  private def requireEpochCoherent(cbEpoch: Long, assignEpochs: DataFrame,
      who: String): Unit = {
    // NULL epochs count as stale: rows persisted by a pre-epoch version of
    // this code (read back as typed nulls via the readOrEmpty schema shim)
    // must not silently score against a codebook they may not match
    if (!assignEpochs.filter(col("epoch").isNull || col("epoch") =!= cbEpoch)
        .isEmpty)
      throw new IllegalStateException(
        s"IVF index torn ($who): codebook epoch $cbEpoch but stale- or " +
          "missing-epoch rows exist — a recluster is in flight, died " +
          "between its two swaps, or the rows predate epoch stamping; " +
          "retry after it completes (or run recluster() to rebuild)")
  }

  /** Centroids + epoch-checked assignments for the read faces ([[search]],
    * [[searchPq]], [[driftReport]]): lock-free, reads through stranded
    * compactions, fails loudly on an epoch tear instead of returning
    * silently-empty candidates. */
  private def loadCoherentIvf(spark: SparkSession,
      cfg: IngestConfig): (DataFrame, DataFrame, Option[Long]) = {
    val cents = CorpusIngest.readOrEmptyRO(spark, centroidsPath(cfg), centDdl)
    val assigns = CorpusIngest.readOrEmptyRO(spark, ivfPath(cfg), ivfDdl)
    // the codebook is swapped whole with one lit stamp — ≤1 distinct epoch
    val epochs = cents.select(col("frozen_batch")).distinct()
      .collect().map(_.getLong(0))
    require(epochs.length <= 1,
      s"corrupt IVF codebook: multiple frozen_batch stamps ${epochs.toSeq}")
    epochs.foreach(requireEpochCoherent(_, assigns.select(col("epoch")), "read"))
    (cents.select(col("centroid_id"), col("ce"), col("cn")), assigns,
      epochs.headOption)
  }

  private val routeDdl = "centroid_id BIGINT, meta_id BIGINT, frozen_batch BIGINT"

  /** [[IngestConfig.hierNlist]] sentinel: pick the routing mode
    * automatically from the frozen codebook size. */
  val HierAuto: Long = -1L

  /** The auto-mode threshold: hier routing past this many centroids.
    * Anchored to the r11 head-to-head (`assign_flat_nlist{200,5000}` vs
    * `assign_hier_nlist5000` on a 50k corpus): flat ≈ 0.66 s @ nlist 200
    * and 6.8 s @ 5000 (slope ≈ 1.3 ms/centroid) crosses the router's
    * ≈1.1 s near nlist ~550; 1024 sits past the crossover with margin for
    * the router's two extra joins on small corpora, and any error at this
    * magnitude costs fractions of a second either way — the failure the
    * auto mode exists to prevent (flat routing at nlist 10⁵⁻⁶, where the
    * codebook outgrows a broadcast) is orders of magnitude away. */
  val AutoHierCrossover: Long = 1024L

  private def hierThreshold(cfg: IngestConfig): Long =
    if (cfg.hierNlist == HierAuto) AutoHierCrossover else cfg.hierNlist

  /** Is the two-level router active for this codebook generation? A pure
    * function of (cfg.hierNlist, the frozen codebook): nlist only changes
    * at freeze/recluster, so appends and serves agree on the mode for as
    * long as the generation lives — [[HierAuto]] keeps that purity, it
    * just supplies the threshold. Short-circuits without a count in the
    * default (always-flat) configuration. */
  private def hierActive(cfg: IngestConfig, cents: DataFrame): Boolean = {
    val t = hierThreshold(cfg)
    // limit-bounded count (r15): the decision only needs "more than t
    // rows?", so cap the scan at t+1 instead of counting a potentially
    // nlist-sized codebook per ingest/serve call
    t != Long.MaxValue && cents.limit(
      math.min(t + 1, Int.MaxValue.toLong).toInt).count() > t
  }

  /** The (metas, children) routing frames for an ACTIVE two-level router:
    * served from the persisted epoch-stamped routing table when it matches
    * this codebook generation (two broadcast-sized joins), re-derived from
    * the codebook otherwise (a root written before the routing existed, or
    * a crash between the codebook and routing swaps — the derivation is a
    * pure function of (codebook, metaMod), so the fallback is
    * bit-identical, just codebook-quadratic; [[compact]] re-persists it). */
  private def hierRouting(spark: SparkSession, cfg: IngestConfig,
      cents: DataFrame, cbEpoch: Option[Long]): (DataFrame, DataFrame) = {
    val route = CorpusIngest.readOrEmptyRO(spark, metaRoutePath(cfg), routeDdl)
    val stamp = route.select(col("frozen_batch")).limit(1).collect()
    // swap-written whole with one lit stamp — one row IS the table's epoch
    if (stamp.nonEmpty && cbEpoch.contains(stamp.head.getLong(0)))
      VectorOps.hierFromRoute(cents, route)
    else VectorOps.ivfHierRouting(cents, cfg.metaMod)
  }

  /** Persist the routing table for one codebook generation — called wherever
    * the codebook itself is (re)written (ingest freeze, [[recluster]]) and
    * by [[compact]] as the healing point for stale/absent tables. */
  private def writeMetaRoute(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, cfg: IngestConfig,
      codebook: DataFrame, epoch: Long): Unit = {
    CorpusIngest.rollbackIfStranded(fs, metaRoutePath(cfg))
    val (_, children) = VectorOps.ivfHierRouting(codebook, cfg.metaMod)
    CorpusIngest.swapWrite(fs, metaRoutePath(cfg),
      children.select(col("centroid_id"), col("meta_id"),
        lit(epoch).as("frozen_batch")))
  }

  /** Ingest one batch; returns the accepted-vector count. Public so batch
    * callers (backfills, tests) can drive it without a streaming query. */
  def ingestBatch(spark: SparkSession, cfg: IngestConfig, batch: DataFrame,
      batchId: Long): Long = IngestLock.withLock(spark, cfg.corpusRoot,
      batchLockOwner(cfg, batchId), cfg.lockStaleMs) { lock =>
    val rootFs = new org.apache.hadoop.fs.Path(cfg.corpusRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(vecsPath(cfg), bandWidthPath(cfg), ledgerPath(cfg), ivfPath(cfg),
        centroidsPath(cfg), pqPath(cfg), pqCodebooksPath(cfg),
        metaRoutePath(cfg))
      .foreach(CorpusIngest.rollbackIfStranded(rootFs, _))
    val (bandsDir, wBits, wBb) = resolvedBands(spark, cfg)
    CorpusIngest.rollbackIfStranded(rootFs, bandsDir)
    CorpusIngest.requireAboveCompactionHwm(rootFs, cfg.corpusRoot, batchId)
    Caching.scope {
      // a replayed batch must not probe the rows IT wrote before crashing
      def idx(path: String, ddl: String) =
        CorpusIngest.readOrEmpty(spark, path, ddl)
          .filter(col("ingest_batch") =!= batchId)

      // ONE signature build for the whole batch: the index probe, the
      // within-batch dedup, and the accepted-index append all read these
      // two cached frames. Signed at the ROOT's width (reband marker),
      // never the cfg's — see resolvedBands.
      val (bb, bv) = VectorOps.srpIndex(batch, "vec_id", "embedding",
        wBits, wBb)
      val batchBands = Caching.scoped(bb)
      val batchVecs = Caching.scoped(bv)
      val indexBands = idx(bandsDir,
        "vec_id BIGINT, band INT, bv BIGINT, ingest_batch BIGINT")
      // the stored norm keeps the verify to one cross dot per candidate —
      // no corpus-side norm folds at probe time
      val indexVecs = idx(vecsPath(cfg),
        "vec_id BIGINT, embedding ARRAY<FLOAT>, n DOUBLE, ingest_batch BIGINT")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"),
          col("n"))
      // probe the persisted index FIRST — same batch-boundary-independence
      // argument as CorpusIngest.ingestBatch: a vector already
      // near-duplicated in the corpus must not act as a within-batch winner
      val probeHits = VectorOps.srpProbeIndexed(
        indexBands, indexVecs, batchBands, batchVecs, cfg.threshold,
        pushIdLimit = CorpusIngest.MaxProbePushIds)
      // CACHED like CorpusIngest's corpusNovelIds (VERDICT r13 item 4):
      // the probe subtree is the one stage whose cost tracks the ROOT
      // (index bands + vecs scans); uncached it would recompute inside
      // both ofNovel legs and the accepted frame — 3-4 root-sized scans
      // per batch instead of one
      val novelIds = Caching.scoped(batchVecs.select(col("vec_id"))
        .join(probeHits.select(col("batch_id").as("vec_id")).distinct(),
          Seq("vec_id"), "left_anti"))
      def ofNovel(f: DataFrame) = f.join(novelIds, Seq("vec_id"), "left_semi")
      // within-batch near-dups among the corpus-novel vectors: connected
      // components over the verified pair graph, keep each component's
      // canonical (min id) — the cluster-canonical policy of the batch
      // dedup family (a pairwise rule would make the kept set a pair-order
      // artifact on chains)
      val inBatchPairs = VectorOps.srpNearDupsIndexed(
        ofNovel(batchBands), ofNovel(batchVecs), cfg.threshold)
      val inBatchDrops = TextOps.connectedComponents(
        inBatchPairs, aCol = "vec_a", bCol = "vec_b")
        .filter(col("id") =!= col("component"))
        .select(col("id").as("vec_id"))
      val accepted = Caching.scoped(
        ofNovel(batchVecs).join(inBatchDrops, Seq("vec_id"), "left_anti"))

      // refresh the heartbeat (and fail loudly on a stolen lock) BEFORE the
      // first state write — the dedup above may outlive the stale window
      IngestLock.heartbeat(spark, lock)
      val stamp = lit(batchId).as("ingest_batch")
      val priorCents = CorpusIngest.readOrEmpty(spark, centroidsPath(cfg), centDdl)
        .filter(col("frozen_batch") =!= batchId)
      val priorPqCb = CorpusIngest.readOrEmpty(spark, pqCodebooksPath(cfg), pqcbDdl)
        .filter(col("frozen_batch") =!= batchId)
      // the two ledger counts, the two-layer codebook-epoch lookup, and the
      // two index appends are mutually independent (the lookup reads
      // centroids/pqcb — disjoint from the appended directories; the counts
      // read caches the probe stage already materialized) — overlap all
      // five on the bounded pool instead of paying five sequential job
      // latencies (the ingest path is fixed-overhead-bound, r15/r16).
      // The epoch lookup is ONE action for BOTH layers (r15 fused the
      // isEmpty+agg pair per layer; this fuses the layers too): a layer
      // with no rows produces no group, and an all-null stamp (schema
      // shim) reads as absent — matching the old isNullAt semantics.
      var epochRows: Array[org.apache.spark.sql.Row] = Array.empty
      var nIn = 0L
      var nAccepted = 0L
      // persist the ORIGINAL float embedding (storage stays float-sized)
      // plus the double-fold norm used by every later verify; the two
      // appends are independent directories — overlap their commits
      CorpusIngest.parallelUnits(Seq(
        () => nIn = batchVecs.count(),
        () => nAccepted = accepted.count(),
        () => epochRows = priorCents
          .select(lit(0).as("l"), col("frozen_batch"))
          .unionByName(priorPqCb.select(lit(1).as("l"), col("frozen_batch")))
          .filter(col("frozen_batch").isNotNull)
          .groupBy(col("l")).agg(max(col("frozen_batch")).as("m")).collect(),
        () => accepted
          .join(batch.select(col("vec_id"), col("embedding")), Seq("vec_id"))
          .select(col("vec_id"), col("embedding"), col("n"), stamp)
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("ingest_batch").parquet(vecsPath(cfg)),
        () => batchBands
          .join(accepted.select(col("vec_id")), Seq("vec_id"), "left_semi")
          .select(col("vec_id"), col("band"), col("bv"), stamp)
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("ingest_batch").parquet(bandsDir)))
      def layerEpoch(layer: Int): Option[Long] =
        epochRows.find(_.getInt(0) == layer).map(_.getLong(1))

      // ---- IVF search-index layer: frozen codebook, append-only lists ----
      // The codebook freezes ONCE — at the first batch where any
      // centroid-eligible vector exists — and that freeze batch backfills
      // assignments for every vector persisted before it, so pre-freeze
      // batches are searchable too. Later batches only append their own
      // assignment rows; an eligible id arriving after the freeze joins a
      // bucket as a member, never as a centroid (re-training per batch
      // would re-bucket the whole corpus). A replayed freeze batch excludes
      // its own frozen_batch rows below, so a crash anywhere between the
      // centroid swap and the assignment write replays as the freeze case
      // and rewrites both — deterministically, hence byte-identically.
      val acceptedVecs = accepted.select(col("vec_id"), col("e"), col("n"))
      val priorCentsEpoch = layerEpoch(0)
      val freezing = priorCentsEpoch.isEmpty
      val (codebook, targets) =
        if (freezing) {
          val allVecs = indexVecs.unionByName(acceptedVecs)
          (allVecs.filter(pmod(col("vec_id"), lit(cfg.centroidMod)) === 0)
            .select(col("vec_id").as("centroid_id"),
              col("e").as("ce"), col("n").as("cn")),
           allVecs)
        } else
          (priorCents.select(col("centroid_id"), col("ce"), col("cn")),
           acceptedVecs)
      if (freezing && !codebook.isEmpty) {
        IngestLock.heartbeat(spark, lock)
        // atomic swap: the codebook plan reads vecs/ and the batch, never
        // centroids/, so the swap cannot delete its own input
        CorpusIngest.swapWrite(rootFs, centroidsPath(cfg),
          codebook.withColumn("frozen_batch", lit(batchId)))
      }
      // the shared recluster EPOCH: every assignment row carries the
      // frozen_batch of the codebook it was computed against, and the read
      // faces require all-stamps-match (see [[requireEpochCoherent]]) — a
      // reader racing (or following a crash between) [[recluster]]'s two
      // swaps fails loudly instead of silently joining a new codebook
      // against assignments whose centroid_ids no longer exist
      val cbEpoch = priorCentsEpoch.getOrElse(batchId)
      // the PQ layer's epoch resolves the same way (its freeze/append
      // branch is taken below) — resolving it HERE lets one fused action
      // answer both layers' coherence gates
      val pqEpochOpt = layerEpoch(1)
      val pqFreezing = pqEpochOpt.isEmpty
      val pqEpoch = pqEpochOpt.getOrElse(batchId)
      // an append against a TORN index (centroids swapped, assignments not —
      // a recluster died mid-swap and its lock went stale) must refuse, not
      // compound the tear: re-running recluster is the repair. ONE action
      // scans BOTH layers' epoch columns (footer-pruned on healthy tables;
      // the per-layer scans were two driver round-trips per batch, r15
      // "Not yet optimized"): the first stale row's tag names the torn
      // layer, and both checks see exactly the rows the per-layer checks
      // saw, so the refusal semantics are unchanged.
      locally {
        def staleOf(df: DataFrame, e: Long, who: String) =
          df.filter(col("epoch").isNull || col("epoch") =!= e)
            .select(lit(who).as("who"))
        val torn = staleOf(idx(ivfPath(cfg), ivfDdl).select(col("epoch")),
            cbEpoch, "ingest")
          .unionByName(staleOf(idx(pqPath(cfg), pqDdl).select(col("epoch")),
            pqEpoch, "ingest-pq"))
          .limit(1).collect()
        torn.headOption.foreach { r =>
          throw new IllegalStateException(
            s"IVF index torn (${r.getString(0)}): codebook epoch " +
              s"${if (r.getString(0) == "ingest") cbEpoch else pqEpoch} but " +
              "stale- or missing-epoch rows exist — a recluster is in " +
              "flight, died between its two swaps, or the rows predate " +
              "epoch stamping; retry after it completes (or run " +
              "recluster() to rebuild)")
        }
      }
      // two-level router, decided ONCE per codebook generation (hierActive
      // is a pure function of the frozen codebook, so appends and serves
      // agree): the freeze batch persists the routing table next to the
      // codebook; append batches read it back (or re-derive, bit-identical)
      val hierFrames =
        if (!hierActive(cfg, codebook)) None
        else {
          if (freezing) {
            IngestLock.heartbeat(spark, lock)
            writeMetaRoute(spark, rootFs, cfg, codebook, batchId)
          }
          val (m, ch) = hierRouting(spark, cfg, codebook, Some(cbEpoch))
          Some((Caching.scoped(m), Caching.scoped(ch)))
        }
      // assignment mode shared by the IVF rows and the PQ bucket
      // annotation below — they MUST agree or searchPq's pruned code scan
      // diverges from the assignment table
      def assignTo(t: DataFrame) = hierFrames match {
        case Some((m, ch)) => VectorOps.ivfAssignHierRouted(m, ch, t)
        case None => VectorOps.ivfAssign(codebook, t)
          .select(col("vec_id"), col("centroid_id"))
      }
      IngestLock.heartbeat(spark, lock)
      // sorted by centroid_id WITHIN the batch partition: the serve faces
      // push the probes' bucket ids as an IN predicate, and the sort makes
      // parquet row-group min/max stats prune even not-yet-compacted
      // appends (the ClusterRegistry label-append discipline). Scoped
      // cache: the PQ write below re-derives the same assignment for its
      // own targets, and in the common same-freeze case the plans are
      // equal so one materialization serves both.
      val assignedIvf = Caching.scoped(assignTo(targets))
      // materialize the shared assignment ONCE, then overlap the ivf write
      // with the PQ encode+write below (r15: the two land in disjoint
      // directories and both read this warm cache — sequential writes
      // serialized ~1 s of independent work per batch); the ledger stays
      // last and sequential per its fencing contract
      assignedIvf.count(): Unit
      def writeIvfRows(): Unit = assignedIvf
        .select(col("vec_id"), col("centroid_id"),
          lit(cbEpoch).as("epoch"), stamp)
        .sortWithinPartitions(col("centroid_id"))
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest_batch").parquet(ivfPath(cfg))

      // ---- PQ code layer: frozen per-subspace codebooks, append-only
      // codes — the same freeze/backfill/append discipline as the IVF
      // layer above (frozen at the first batch with an eligible vector,
      // that batch backfills codes for every earlier vector, later
      // batches append only their own m-ints-per-vector rows). The codes
      // are what [[searchPq]] scans instead of float vectors.
      val (pqCb, pqTargets) =
        if (pqFreezing) {
          val allVecs = indexVecs.unionByName(acceptedVecs)
          (VectorOps.pqCodebooks(
            allVecs.select(col("vec_id"), col("e").as("embedding")),
            m = cfg.pqM, codebookMod = cfg.pqCodebookMod), allVecs)
        } else
          (priorPqCb.select(col("j"), col("code_id"), col("ce")), acceptedVecs)
      if (pqFreezing && !pqCb.isEmpty) {
        IngestLock.heartbeat(spark, lock)
        CorpusIngest.swapWrite(rootFs, pqCodebooksPath(cfg),
          pqCb.withColumn("frozen_batch", lit(batchId)))
      }
      // the PQ layer carries the same per-generation epoch discipline as
      // the IVF layer: every code row is stamped with the codebook
      // generation it was encoded against, and appends against a torn
      // state (codebooks swapped by a died recluster, codes not) refuse —
      // checked in the fused two-layer coherence gate above
      IngestLock.heartbeat(spark, lock)
      // bucket annotation for the searchPq code-scan pruning: assignment
      // against the same frozen codebook (a pure function, so the column
      // agrees with the ivf table rows whatever batch wrote them); the
      // common case re-reads assignedIvf's cache. Pre-IVF-freeze batches
      // annotate null under a then-meaningless ivf_epoch — searchPq's
      // coherence check sees the mismatch after the freeze and falls back
      // to the unpruned scan until compact() re-annotates.
      val pqAssigns = assignTo(pqTargets)
      def writePqRows(): Unit = VectorOps.pqEncodeWith(pqCb,
          pqTargets.select(col("vec_id"), col("e")), cfg.pqM)
        .join(pqAssigns, Seq("vec_id"), "left")
        .select(col("vec_id"), col("j"), col("code_id"),
          lit(pqEpoch).as("epoch"), col("centroid_id"),
          lit(cbEpoch).as("ivf_epoch"), stamp)
        .sortWithinPartitions(col("centroid_id"))
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest_batch").parquet(pqPath(cfg))
      // disjoint directories, both inputs warm — overlap the commits (the
      // parallelAppends discipline); crash anywhere simply replays the
      // batch, whose partition overwrites are byte-identical idempotent
      CorpusIngest.parallelUnits(Seq(() => writeIvfRows(), () => writePqRows()))

      spark.createDataFrame(Seq((batchId, nIn, nAccepted)))
        .toDF("ingest_batch", "n_in", "n_accepted")
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest_batch").parquet(ledgerPath(cfg))
      nAccepted
    }
  }

  /** Probe a batch against the ingested corpus WITHOUT ingesting — the
    * read-only serving face of the persisted SRP index (the embedding twin
    * of [[CorpusIngest.probe]]): (vec_id, corpus_id, cos) for every batch
    * vector within `cfg.threshold` of an accepted one. Takes no lock and
    * writes nothing; cost follows the batch. */
  def probe(spark: SparkSession, cfg: IngestConfig, batch: DataFrame): DataFrame = {
    val (bandsDir, wBits, wBb) = resolvedBands(spark, cfg)
    val (bb, bv) = VectorOps.srpIndex(batch, "vec_id", "embedding",
      wBits, wBb)
    val indexBands = CorpusIngest.readOrEmptyRO(spark, bandsDir,
      "vec_id BIGINT, band INT, bv BIGINT, ingest_batch BIGINT")
    val indexVecs = CorpusIngest.readOrEmptyRO(spark, vecsPath(cfg),
      "vec_id BIGINT, embedding ARRAY<FLOAT>, n DOUBLE, ingest_batch BIGINT")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"),
        col("n"))
    VectorOps.srpProbeIndexed(indexBands, indexVecs,
        graft.Caching.scoped(bb), graft.Caching.scoped(bv), cfg.threshold,
        pushIdLimit = CorpusIngest.MaxProbePushIds)
      .select(col("batch_id").as("vec_id"), col("corpus_id"), col("cos"))
  }

  /** Query-time bucket selection in the generation's routing mode — the
    * stage [[search]] and [[searchPq]] share: flat (one codebook broadcast,
    * probe-count window) below the [[IngestConfig.hierNlist]] threshold,
    * meta-first above it (√nlist-sized meta broadcast, then an equi-join on
    * meta_id — nothing codebook-sized ever broadcasts). Output shape is
    * identical either way: (probe_id, pe, pn, centroid_id), deterministic,
    * so the pushed-IN prune and the candidate joins downstream are
    * mode-blind. */
  private def serveBuckets(spark: SparkSession, cfg: IngestConfig,
      cents: DataFrame, cbEpoch: Option[Long], probes: DataFrame): DataFrame =
    if (hierActive(cfg, cents)) {
      val (m, ch) = hierRouting(spark, cfg, cents, cbEpoch)
      VectorOps.probeBucketsHierRouted(m, ch,
        VectorOps.prepareProbes(probes), cfg.metaProbe, cfg.nprobe)
    } else
      VectorOps.probeBuckets(cents, VectorOps.prepareProbes(probes), cfg.nprobe)

  /** Read-only ANN top-k served from the persisted IVF layer — the search
    * face of the streaming index (the SRP layer answers "is this a
    * near-dup?", this answers "what are the k nearest?"). Takes no lock and
    * writes nothing: reads go THROUGH a compaction-stranded `.__old` like
    * [[probe]], and cost follows the probe set — candidates come from the
    * probes' nprobe buckets, never a corpus scan. Probes arrive raw
    * (vec_id, embedding). */
  def search(spark: SparkSession, cfg: IngestConfig, probes: DataFrame,
      k: Int = 10, allowed: Option[DataFrame] = None): DataFrame =
    VectorOps.topKByCos(searchCandidateRows(spark, cfg, probes, allowed), k)

  /** Read-only RADIUS search served from the same persisted IVF layer as
    * [[search]] — every indexed vector within cosine >= tau of each probe,
    * the coverage-guaranteed serving face (all near-dups / all in-threshold
    * retrievals, not a top-k quota). Identical candidate pipeline (bucket
    * routing, pushed-IN pruning, lists + delta split, stranded-compaction
    * reads, optional ACL semi-join); only the final stage differs: a plain
    * cosine filter instead of the per-probe rank window. Takes no lock,
    * writes nothing; cost follows nprobe x bucket, never the corpus. */
  def searchRadius(spark: SparkSession, cfg: IngestConfig, probes: DataFrame,
      tau: Double = 0.3, allowed: Option[DataFrame] = None): DataFrame =
    VectorOps.radiusByCos(searchCandidateRows(spark, cfg, probes, allowed), tau)

  /** The candidate assembly [[search]] and [[searchRadius]] share: probe
    * bucket selection (flat or meta-routed), the pushed centroid IN prune,
    * the epoch-coherent serving lists as BASE plus the post-lists DELTA
    * batches, and the optional allowed-id semi-join — emitted as
    * (probe_id, pe, pn, vec_id, e, n) rows for the final scoring stage. */
  private def searchCandidateRows(spark: SparkSession, cfg: IngestConfig,
      probes: DataFrame, allowed: Option[DataFrame]): DataFrame = {
    val (cents, rawAssigns, cbEpoch) = loadCoherentIvf(spark, cfg)
    // metadata-FILTERED serving: the allowed-id set semi-joins the
    // CANDIDATE rows (assignments / lists), so a selective predicate prunes
    // the candidate set before any vector fetch or distance arithmetic (the
    // serving twin of VectorOps.annFiltered) — and top-k refills from the
    // allowed corpus instead of under-filling a post-filtered top-k
    def allowedOnly(df: DataFrame) = allowed.foldLeft(df) { (a, ids) =>
      a.join(ids.select(col(ids.columns.head).as("vec_id")),
        Seq("vec_id"), "left_semi")
    }
    // bucket selection is probe-sized and DETERMINISTIC (in either routing
    // mode), so the chosen centroid ids are driver-safe metadata: collect
    // them once (localCheckpoint: the tiny frame is read by the collect and
    // both candidate joins) and push them as an IN predicate — partition
    // dirs (lists' bucket_p) and row-group min/max stats (centroid-sorted
    // appends + lists) then prune the scans to the probed buckets instead
    // of reading the corpus per query
    val pb = serveBuckets(spark, cfg, cents, cbEpoch, probes).localCheckpoint()
    val pushIds = pb.select(col("centroid_id")).distinct()
      .limit(MaxCentroidPushIds + 1).collect().map(_.getLong(0)).toSeq
    val canPush = pushIds.length <= MaxCentroidPushIds
    def pushed(df: DataFrame) =
      if (canPush) df.filter(col("centroid_id").isInCollection(pushIds)) else df

    // the serving lists are usable iff built against THIS codebook
    // generation — a recluster that died after swapping the codebook
    // leaves stale-epoch lists, which must be IGNORED (fall back to the
    // coherent split layout), never silently served. One row IS the whole
    // table's stamp: the lists are swap-written whole with one lit
    // (epoch, upto_batch) pair and published by atomic rename, so a
    // mixed-stamp table cannot be exposed — and a limit(1) keeps the
    // check O(1), not an O(corpus) stamp scan per query
    val lists = CorpusIngest.readOrEmptyRO(spark, ivfListsPath(cfg), listsDdl)
    val stampRow = lists.select(col("epoch"), col("upto_batch"))
      .limit(1).collect()
    val listsUsable = stampRow.nonEmpty &&
      cbEpoch.contains(stampRow.head.getLong(0))
    val upto = if (listsUsable) stampRow.head.getLong(1) else Long.MinValue

    // BASE: one equi-join of the probe buckets against the pruned lists —
    // vector and norm arrive WITH the candidate row, no second fetch join
    val baseRows =
      if (!listsUsable) None
      else {
        val pruned =
          if (canPush)
            // floorMod, not Scala's signed % (ADVICE r10): writeIvfLists
            // partitions with Spark pmod, which is non-negative; for a
            // negative centroid_id (vec_id is an unconstrained BIGINT) the
            // signed remainder picks a bucket_p that doesn't exist and the
            // prune silently drops the rows that are actually there
            lists.filter(col("bucket_p").isInCollection(
                pushIds.map(i => java.lang.Math.floorMod(i,
                  ListsBuckets.toLong).toInt)) &&
              col("centroid_id").isInCollection(pushIds))
          else lists
        Some(pb.join(allowedOnly(pruned).select(col("vec_id"),
            col("embedding").cast("array<double>").as("e"), col("n"),
            col("centroid_id")), Seq("centroid_id"))
          .select(col("probe_id"), col("pe"), col("pn"),
            col("vec_id"), col("e"), col("n")))
      }
    // DELTA: batches appended after the lists were built — partition-pruned
    // by `ingest_batch > upto_batch` on BOTH tables (post-compaction batch
    // ids are strictly above the hwm the lists record, and the folded
    // partition is -1), served through the split layout
    val deltaAssigns = allowedOnly(pushed(
      rawAssigns.filter(col("ingest_batch").cast("long") > lit(upto))))
    val deltaVecs = CorpusIngest.readOrEmptyRO(spark, vecsPath(cfg), vecsDdl)
      .filter(col("ingest_batch").cast("long") > lit(upto))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"),
        col("n"))
    val deltaRows = pb
      .join(deltaAssigns.select(col("vec_id"), col("centroid_id")),
        Seq("centroid_id"))
      .join(deltaVecs, Seq("vec_id"))
      .select(col("probe_id"), col("pe"), col("pn"),
        col("vec_id"), col("e"), col("n"))
    baseRows.fold(deltaRows)(_.unionByName(deltaRows))
  }

  /** Read-only IVF-PQ top-k served ENTIRELY from the persisted tables —
    * what a disk-resident production index runs: coarse centroids pick the
    * probes' buckets, the assignment table prunes to candidates, the PQ
    * code table (m ints per vector — the only corpus-sized scan) scores
    * them by integer ADC against the probes' broadcast distance tables,
    * and the shortlist re-ranks by exact cosine from the vector store.
    * [[search]] is the IVF-flat twin (exact cosine over bucket
    * candidates — full vectors move for every candidate); this trades
    * that movement for code scans + a `rerank`-bounded float fetch. Takes
    * no lock, writes nothing, reads through stranded compactions. */
  def searchPq(spark: SparkSession, cfg: IngestConfig, probes: DataFrame,
      k: Int = 10, rerank: Int = 150): DataFrame = {
    val (cents, rawAssigns, cbEpoch) = loadCoherentIvf(spark, cfg)
    val (cbs, codes) = loadCoherentPq(spark, cfg)
    // the same bounded centroid IN push as [[search]]: bucket selection is
    // deterministic (in either routing mode), so pre-filtering the
    // assignment scan to the probes' buckets preserves the candidate set
    // exactly while centroid-sorted appends/folds prune to the touched row
    // groups. ONE bucket-selection pass serves both the pushed-id collect
    // and the candidate join (localCheckpoint; threaded into
    // ivfPqSearchIndexed as preBuckets)
    val pb = serveBuckets(spark, cfg, cents, cbEpoch, probes).localCheckpoint()
    val pushIds = pb
      .select(col("centroid_id")).distinct()
      .limit(MaxCentroidPushIds + 1).collect().map(_.getLong(0)).toSeq
    val canPush = pushIds.length <= MaxCentroidPushIds
    val assigns =
      if (canPush) rawAssigns.filter(col("centroid_id").isInCollection(pushIds))
      else rawAssigns
    // the code table is the PQ serve's one corpus-sized scan: when every
    // row's bucket annotation was computed against THIS coarse codebook
    // generation, the same pushed IN list prunes it to the probed buckets
    // (bucket-clustered layout → row-group skipping). A stale annotation
    // (codebook reclustered since; pre-freeze null rows) merely disables
    // the pruning — the (vec_id, j, code_id) payload stays valid, so the
    // fallback is the unpruned join, never a refusal. Healthy tables
    // answer the check from footer stats alone.
    val bucketsCoherent = cbEpoch.exists { e =>
      codes.filter(col("ivf_epoch").isNull || col("ivf_epoch") =!= e).isEmpty
    }
    val candCodes =
      if (bucketsCoherent && canPush)
        codes.filter(col("centroid_id").isInCollection(pushIds))
      else codes
    val vecs = CorpusIngest.readOrEmptyRO(spark, vecsPath(cfg), vecsDdl)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"),
        col("n"))
    VectorOps.ivfPqSearchIndexed(cents, assigns,
      candCodes.select(col("vec_id"), col("j"), col("code_id")),
      cbs.select(col("j"), col("code_id"), col("ce")), vecs, probes,
      nprobe = cfg.nprobe, m = cfg.pqM, k = k, rerank = rerank,
      preBuckets = Some(pb.select(col("probe_id"), col("centroid_id"))))
  }

  /** Codebooks + epoch-checked codes for the PQ read faces ([[searchPq]],
    * [[pqDriftReport]]) — the PQ twin of [[loadCoherentIvf]]: lock-free,
    * reads through stranded compactions, refuses an epoch tear (a
    * recluster died between the codebook and code swaps) loudly instead of
    * ADC-scoring codes against codewords that no longer exist. */
  private def loadCoherentPq(spark: SparkSession,
      cfg: IngestConfig): (DataFrame, DataFrame) = {
    val cbs = CorpusIngest.readOrEmptyRO(spark, pqCodebooksPath(cfg), pqcbDdl)
    val codes = CorpusIngest.readOrEmptyRO(spark, pqPath(cfg), pqDdl)
    val epochs = cbs.select(col("frozen_batch")).distinct()
      .collect().map(_.getLong(0))
    require(epochs.length <= 1,
      s"corrupt PQ codebooks: multiple frozen_batch stamps ${epochs.toSeq}")
    epochs.foreach(requireEpochCoherent(_, codes.select(col("epoch")), "read-pq"))
    (cbs, codes)
  }

  /** PQ reconstruction-error drift gauge over the persisted code tables
    * ([[VectorOps.pqReconstructionError]]) — the quantization twin of
    * [[driftReport]]: per subspace, how far the ingested corpus sits from
    * its frozen codewords. Rising mean_d2 says the seed-frozen codebooks
    * no longer describe the corpus and ADC shortlists are silently
    * degrading (the exact re-rank hides it until true neighbors miss the
    * shortlist entirely) — [[recluster]] retrains the codebooks and
    * backfills the codes. Takes no lock, writes nothing. */
  def pqDriftReport(spark: SparkSession, cfg: IngestConfig): DataFrame = {
    val (cbs, codes) = loadCoherentPq(spark, cfg)
    val vecs = CorpusIngest.readOrEmptyRO(spark, vecsPath(cfg),
      "vec_id BIGINT, embedding ARRAY<FLOAT>, n DOUBLE, ingest_batch BIGINT")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    VectorOps.pqReconstructionError(
      cbs.select(col("j"), col("code_id"), col("ce")),
      codes.select(col("vec_id"), col("j"), col("code_id")),
      vecs, m = cfg.pqM)
  }

  /** The `frozen_batch` stamp of the FIRST reclustered codebook. Negative so
    * it can never equal a streaming batch id — a replayed freeze batch's
    * `frozen_batch =!= batchId` exclusion must not discard it. Each further
    * recluster decrements (−2, −3, …) so every codebook generation has a
    * DISTINCT epoch: a reader racing the second recluster's swap window must
    * not see old assignments whose stamp happens to match the new codebook. */
  val ReclusterStamp: Long = -2L

  /** Read-only IVF bucket-health report over the persisted index
    * ([[VectorOps.ivfBucketHealth]] on the centroids/ivf/vecs tables):
    * per-bucket size, corpus share, skew, and mean assignment cosine. The
    * drift gauge for the frozen codebook — skew grows when ingestion piles
    * into few buckets, mean_cos falls when newcomers sit far from every
    * seed centroid; either says [[recluster]] is due. Takes no lock, writes
    * nothing (reads through a stranded `.__old` like [[probe]]). */
  def driftReport(spark: SparkSession, cfg: IngestConfig): DataFrame = {
    val (cents, rawAssigns, _) = loadCoherentIvf(spark, cfg)
    val assigns = rawAssigns.select(col("vec_id"), col("centroid_id"))
    val vecs = CorpusIngest.readOrEmptyRO(spark, vecsPath(cfg),
      "vec_id BIGINT, embedding ARRAY<FLOAT>, n DOUBLE, ingest_batch BIGINT")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"),
        col("n"))
    VectorOps.ivfBucketHealth(cents, assigns.join(vecs, Seq("vec_id")))
  }

  /**
   * Recluster the quantization layers: retrain the IVF codebook AND the PQ
   * sub-codebooks on the CURRENT corpus and rebuild every assignment/code —
   * the locked compaction that answers a drifted [[driftReport]] /
   * [[pqDriftReport]]. The coarse retrain seeds deterministically
   * (`vec_id % centroidMod == 0`, so post-drift vectors are
   * centroid-eligible) and refines by Lloyd passes
   * ([[VectorOps.kmeansCentroids]]) so buckets re-center on where the
   * corpus actually lives; the PQ codewords re-pick from the current
   * corpus and every vector re-encodes.
   *
   * Discipline matches [[compact]]: corpus [[IngestLock]] held throughout
   * (a concurrent ingest refuses instead of appending against a codebook
   * mid-swap); both writes are `.__next`/`.__old` atomic swaps with
   * [[CorpusIngest.rollbackIfStranded]] recovery; inputs are
   * `localCheckpoint`ed before the swap deletes what the plans read. A
   * crash between the two swaps leaves new centroids with old assignments —
   * an EPOCH TEAR that every read face and ingest append now detects and
   * refuses loudly ([[requireEpochCoherent]]: centroids and assignments
   * carry a shared per-generation epoch stamp); re-running recluster (the
   * caller's replay contract, as with any died maintenance pass) rewrites
   * both deterministically and restores coherence. Assignments land as one
   * `ingest_batch = -1` partition (compacted form); like [[compact]], run
   * this at post-batch maintenance points, not between a batch's replays.
   */
  def recluster(spark: SparkSession, cfg: IngestConfig): Unit =
    IngestLock.withLock(spark, cfg.corpusRoot,
        s"recluster-${java.util.UUID.randomUUID()}", cfg.lockStaleMs) { lock =>
      val fs = new org.apache.hadoop.fs.Path(cfg.corpusRoot)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      Seq(vecsPath(cfg), ivfPath(cfg), centroidsPath(cfg), pqPath(cfg),
          pqCodebooksPath(cfg))
        .foreach(CorpusIngest.rollbackIfStranded(fs, _))
      val vecs = MaintStages("recluster", "read_checkpoint_vecs") {
        CorpusIngest.readOrEmpty(spark, vecsPath(cfg),
          "vec_id BIGINT, embedding ARRAY<FLOAT>, n DOUBLE, ingest_batch BIGINT")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("e"),
            col("n"))
          .localCheckpoint()
      }
      // ONE count over the materialized checkpoint answers the emptiness
      // guard AND the Lloyd train-sample stride (r16: the separate isEmpty
      // job plus kmeansTrainSample's own corpus count were two driver
      // round-trips for one number — the recluster path is
      // driver-sequencing-bound, 8c/32c ratio ≈ 1.2)
      val nVecs = vecs.count()
      if (nVecs > 0L) {
        // recluster SUBSUMES every ledger batch into the -1 assignment/code
        // partitions exactly like a fold, so it must raise the compaction
        // high-water mark too (ADVICE r10): without the fence an
        // at-least-once replay of a pre-recluster batch id appends fresh
        // ivf/pq partitions duplicating the -1 copies — topKByCos then
        // serves the same neighbor at two ranks, and searchPq's duplicated
        // code rows inflate that candidate's summed ADC distance, pushing
        // true neighbors out of the rerank shortlist. Marked BEFORE the
        // swaps (the markCompactionHwm contract): a crash in between merely
        // refuses replays whose per-batch partitions are still intact.
        // the ledger max is read ONCE and serves both the hwm fence and the
        // serving lists' upto stamp below — the lock is held throughout, so
        // no batch can land in between and the two reads were always equal
        val ledgerMax = CorpusIngest.ledgerMaxBatch(spark, ledgerPath(cfg))
        CorpusIngest.markCompactionHwm(fs, cfg.corpusRoot, ledgerMax)
        // a fresh epoch per codebook generation, strictly below every prior
        // stamp (first recluster = ReclusterStamp, then −3, −4, …) — BOTH
        // quantization layers' prior stamps resolved in one action over the
        // two codebook slivers (was one agg job per layer)
        val priorRows = CorpusIngest.readOrEmpty(spark, centroidsPath(cfg),
            centDdl).select(lit(0).as("l"), col("frozen_batch"))
          .unionByName(CorpusIngest.readOrEmpty(spark, pqCodebooksPath(cfg),
            pqcbDdl).select(lit(1).as("l"), col("frozen_batch")))
          .filter(col("frozen_batch").isNotNull)
          .groupBy(col("l")).agg(min(col("frozen_batch")).as("m")).collect()
        def priorMin(l: Int): Option[Long] =
          priorRows.find(_.getInt(0) == l).map(_.getLong(1))
        val epoch =
          priorMin(0).fold(ReclusterStamp)(p => math.min(ReclusterStamp, p - 1))
        val pqEpoch =
          priorMin(1).fold(ReclusterStamp)(p => math.min(ReclusterStamp, p - 1))
        // RETRAIN, not re-pick: mod-sampled seeds refined by Lloyd passes
        // over the current corpus — the post-drift corpus pulls each
        // centroid to where its bucket actually lives, instead of hoping
        // a modulus landed a vector there (VERDICT r9 item 4). Centroid
        // ids stay the seed ids. Past the hierNlist threshold the Lloyd
        // assign passes route meta-first too (kmeansCentroidsHier —
        // corpus × O(√nlist) per iteration, nothing codebook-sized
        // broadcast): the retrain mode needs no coherence with the serve
        // mode — it shapes the codebook VALUES, the serve routes whatever
        // codebook exists — so deciding on the deterministic seed count
        // is safe even when emptied buckets shrink the result below the
        // threshold.
        val seeds = vecs.filter(pmod(col("vec_id"), lit(cfg.centroidMod)) === 0)
        val codebook = MaintStages("recluster", "kmeans_retrain") {
          (if (hierActive(cfg, seeds))
              VectorOps.kmeansCentroidsHier(vecs, cfg.centroidMod, cfg.metaMod,
                vCount = nVecs)
            else VectorOps.kmeansCentroids(vecs, cfg.centroidMod,
              vCount = nVecs))
            .localCheckpoint()
        }
        IngestLock.heartbeat(spark, lock)
        MaintStages("recluster", "swap_centroids") {
          CorpusIngest.swapWrite(fs, centroidsPath(cfg),
            codebook.withColumn("frozen_batch", lit(epoch)))
        }
        // retrained-generation routing, persisted right after the codebook
        // it routes (same epoch stamp); assignment then runs in the
        // generation's mode — meta-first above the threshold, flat below.
        // A crash between the codebook swap and this write leaves a
        // stale-stamped routing table, which hierRouting detects and
        // re-derives bit-identically; re-running recluster re-persists it.
        val hierFrames =
          if (!hierActive(cfg, codebook)) None
          else {
            IngestLock.heartbeat(spark, lock)
            MaintStages("recluster", "meta_route") {
              // derive the routing ONCE and both persist and return it
              // (r16: writeMetaRoute re-derived internally — two eager
              // emptiness guards and two routing aggregations per
              // recluster for one table)
              val frames = VectorOps.ivfHierRouting(codebook, cfg.metaMod)
              CorpusIngest.rollbackIfStranded(fs, metaRoutePath(cfg))
              CorpusIngest.swapWrite(fs, metaRoutePath(cfg),
                frames._2.select(col("centroid_id"), col("meta_id"),
                  lit(epoch).as("frozen_batch")))
              Some(frames)
            }
          }
        val assigns = MaintStages("recluster", "assign_sweep") {
          (hierFrames match {
              case Some((m, ch)) => VectorOps.ivfAssignHierRouted(m, ch, vecs)
              case None => VectorOps.ivfAssign(codebook, vecs)
                .select(col("vec_id"), col("centroid_id"))
            })
            .withColumn("epoch", lit(epoch))
            .withColumn("ingest_batch", lit(-1L))
            .localCheckpoint()
        }
        // the assignment swap, the serving-lists rebuild, and the whole PQ
        // half are mutually independent once `assigns` is materialized:
        // they write disjoint directories (ivf / ivflists / pqcb+pq) and
        // read only localCheckpointed frames plus the vecs dir, which none
        // of them writes — overlap them on the bounded pool (guide §2.6;
        // the r15 profile showed the recluster entry is driver-sequencing-
        // bound). One heartbeat fronts the group (the compact-folds
        // discipline — concurrent same-owner lock rewrites would race).
        // Crash contract unchanged: every piece is an idempotent atomic
        // swap, every torn combination is already detected by the epoch
        // stamps (readers refuse or fall back), and re-running recluster
        // rewrites everything deterministically.
        IngestLock.heartbeat(spark, lock)
        CorpusIngest.parallelUnits(Seq(
          () => MaintStages("recluster", "swap_ivf") {
            CorpusIngest.swapWrite(fs, ivfPath(cfg), assigns,
              partitionCols = Seq("ingest_batch"))
          },
          // rebuild the serving lists against the NEW codebook generation —
          // until this write lands, readers see stale-epoch lists and fall
          // back to the (coherent) split layout; a crash here leaves
          // exactly that state, and re-running recluster is the repair
          () => MaintStages("recluster", "serving_lists_rewrite") {
            writeIvfLists(spark, fs, cfg,
              CorpusIngest.readOrEmpty(spark, vecsPath(cfg), vecsDdl),
              assigns, epoch, ledgerMax)
          },
          // ---- PQ half of the drift repair (VERDICT r9 item 4): retrain
          // the per-subspace codebooks on the CURRENT corpus and backfill
          // every code, under the same two-swap + epoch discipline.
          () => {
            val pqCb = MaintStages("recluster", "pq_codebook_retrain") {
              VectorOps.pqCodebooks(
                  vecs.select(col("vec_id"), col("e").as("embedding")),
                  m = cfg.pqM, codebookMod = cfg.pqCodebookMod)
                .localCheckpoint()
            }
            MaintStages("recluster", "swap_pqcb") {
              CorpusIngest.swapWrite(fs, pqCodebooksPath(cfg),
                pqCb.withColumn("frozen_batch", lit(pqEpoch)))
            }
            // materialize the UNSORTED codes once, BEFORE the range
            // layout: repartitionByRange's sampling pass re-executes its
            // child, so the 25M-pair ADC encode otherwise runs twice (the
            // r15 shape checkpointed AFTER the range shuffle and paid the
            // double execution too). The checkpointed rows are narrow
            // (ints per vector), and the range+sort+write below reads them
            // from memory for both the sample and the shuffle.
            val codes0 = MaintStages("recluster", "pq_encode") {
              VectorOps.pqEncodeWith(pqCb,
                vecs.select(col("vec_id"), col("e")), cfg.pqM)
              .select(col("vec_id"), col("j"), col("code_id"))
              .withColumn("epoch", lit(pqEpoch))
              // bucket annotation against the RECLUSTERED coarse codebook
              // (the assigns frame), clustered so the searchPq pruned scan
              // skips to the probed buckets
              .join(assigns.select(col("vec_id"), col("centroid_id")),
                Seq("vec_id"), "left")
              .withColumn("ivf_epoch", lit(epoch))
              .withColumn("ingest_batch", lit(-1L))
              .localCheckpoint()
            }
            val codes = codes0
              .repartitionByRange(col("centroid_id"))
              .sortWithinPartitions(col("centroid_id"))
            MaintStages("recluster", "swap_pq") {
              CorpusIngest.swapWrite(fs, pqPath(cfg), codes,
                partitionCols = Seq("ingest_batch"))
            }
          }))
      }
    }

  /** Re-sign the SRP near-dup index at a new signature width — the
    * maintenance op the band-occupancy gauge calls for
    * ([[VectorOps.srpBandHealth]]): with bandBits fixed every band has
    * 2^bandBits buckets, so occupancy — and with it the verify set of
    * every future probe and ingest increment — grows linearly with the
    * corpus (the r12 maintenance curve measured a 4.3× ingest cost at
    * 100× corpus under constant 4-bit bands; the occupancy-constant
    * discipline is to widen bands as the corpus grows). Rebuilds the
    * bands table from the persisted vectors at (bits, bandBits) into a
    * width-suffixed directory, then swaps the 1-row width marker — the
    * atomic commit point: ingest appends, probes, and compaction folds
    * all resolve both the directory and the batch-signature width
    * through the marker ([[resolvedBands]]), so a new-width batch always
    * joins a new-width index.
    *
    * Crash contract (the recluster pattern, minus the epoch stamp — the
    * directory NAME ties rows to their width, so no crash can pair a
    * batch signed at one width with an index at another):
    *  - died after the hwm mark: replays at or below the mark refuse
    *    (the rebanded table subsumes them); re-running reband completes;
    *  - died after the new-directory swap, before the marker: readers
    *    still resolve the complete old directory; the stray new dir is
    *    overwritten by the re-run;
    *  - died after the marker swap: committed — the superseded directory
    *    is dead weight until the NEXT reband sweeps it
    *    ([[sweepSupersededBands]], deferred one maintenance cadence so a
    *    lock-free reader that resolved the pre-swap marker never loses
    *    its directory mid-scan: an absent bands dir reads as an EMPTY
    *    index, the one silently-wrong answer a tombstone cannot excuse
    *    here).
    */
  def reband(spark: SparkSession, cfg: IngestConfig, bits: Int,
      bandBits: Int): Unit = IngestLock.withLock(spark, cfg.corpusRoot,
      s"reband-${java.util.UUID.randomUUID()}", cfg.lockStaleMs) { lock =>
    val fs = new org.apache.hadoop.fs.Path(cfg.corpusRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(vecsPath(cfg), bandWidthPath(cfg), ledgerPath(cfg))
      .foreach(CorpusIngest.rollbackIfStranded(fs, _))
    val (curDir, curBits, curBb) = resolvedBands(spark, cfg)
    CorpusIngest.sweepSupersededSrpBands(spark, fs, cfg.corpusRoot, curDir)
    // no-op at the already-committed width (ADVICE r12): "re-running
    // reband completes" must NOT swapWrite the LIVE serving directory —
    // between its swap-out and swap-in renames a lock-free probe that
    // resolved the marker would read an absent dir as an EMPTY index.
    // The marker already points at (bits, bandBits); the only remaining
    // work — sweeping dirs a prior reband superseded — just ran above.
    if (curBits != bits || curBb != bandBits) {
      CorpusIngest.markCompactionHwm(fs, cfg.corpusRoot,
        CorpusIngest.ledgerMaxBatch(spark, ledgerPath(cfg)))
      val vecs = CorpusIngest.readOrEmpty(spark, vecsPath(cfg), vecsDdl)
        .select(col("vec_id"), col("embedding"))
      val (nb, _) = VectorOps.srpIndex(vecs, bits = bits, bandBits = bandBits)
      IngestLock.heartbeat(spark, lock)
      CorpusIngest.swapWrite(fs, s"${cfg.corpusRoot}/bands_w${bits}x$bandBits",
        nb.select(col("vec_id"), col("band"), col("bv"),
          lit(-1L).as("ingest_batch")),
        partitionCols = Seq("ingest_batch"))
      IngestLock.heartbeat(spark, lock)
      // the commit point: from here every face signs and reads at the
      // new width
      CorpusIngest.swapWrite(fs, bandWidthPath(cfg),
        spark.createDataFrame(Seq((bits, bandBits))).toDF("bits", "band_bits"))
    }
  }

  /** The wired reband policy (VERDICT r12 item 4): gauge the serving
    * bands ([[VectorOps.srpBandHealth]]), derive the width the occupancy
    * constant calls for ([[VectorOps.srpRebandPlan]] — fires at 4× the
    * 64-rows-per-band operating point, well below the measured
    * 4.3×-ingest-cost failure regime), and run [[reband]] when it fires.
    * Safe on every maintenance cadence: a healthy index returns None and
    * nothing runs; the same-width no-op in reband makes double-fires
    * harmless. Returns the width rebanded to, None when healthy. */
  def rebandIfNeeded(spark: SparkSession, cfg: IngestConfig): Option[(Int, Int)] = {
    val fs = new org.apache.hadoop.fs.Path(cfg.corpusRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    CorpusIngest.rollbackIfStranded(fs, bandWidthPath(cfg))
    val (dir, bits, bb) = resolvedBands(spark, cfg)
    CorpusIngest.rollbackIfStranded(fs, dir)
    val plan = VectorOps.srpRebandPlan(
      VectorOps.srpBandHealth(CorpusIngest.readOrEmpty(spark, dir,
        "vec_id BIGINT, band INT, bv BIGINT, ingest_batch BIGINT")),
      bits, bb)
    plan.foreach { case (nb, nbb) => reband(spark, cfg, nb, nbb) }
    plan
  }

  /** Remove the serving lists without exposing a partial table to the
    * lock-free [[search]]: one atomic rename to a `.__gone` tombstone
    * (readers from then on see an absent dir → coherent split-layout
    * fallback), then delete the tombstone at leisure. A tombstone left by
    * a prior crash is cleared first — its contents were already
    * logically deleted. */
  private def deleteListsAtomic(fs: org.apache.hadoop.fs.FileSystem,
      cfg: IngestConfig): Unit = {
    val lists = new org.apache.hadoop.fs.Path(ivfListsPath(cfg))
    val gone = new org.apache.hadoop.fs.Path(ivfListsPath(cfg) + ".__gone")
    fs.delete(gone, true)
    if (fs.exists(lists)) {
      require(fs.rename(lists, gone),
        s"serving-lists tombstone rename failed: $lists -> $gone")
      fs.delete(gone, true): Unit
    }
  }

  /** Build (or rebuild) the serving inverted lists from the CURRENT
    * vecs + assignment tables: vector and norm stored next to the bucket
    * id, hash-partitioned on `bucket_p` and range-sorted by centroid_id —
    * what [[search]]'s pushed IN predicate prunes. `epoch` stamps the
    * codebook generation the lists serve (a mismatch at read time means a
    * recluster superseded them — ignored, split-layout fallback);
    * `upto` is the highest ingest batch the lists subsume (later appends
    * are served as the partition-pruned delta). Atomic-swap write; the
    * input frames must not read the lists dir. */
  private[graft] def writeIvfLists(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, cfg: IngestConfig,
      vecs: DataFrame, assigns: DataFrame, epoch: Long, upto: Long): Unit = {
    CorpusIngest.rollbackIfStranded(fs, ivfListsPath(cfg))
    val rows = vecs.select(col("vec_id"), col("embedding"), col("n"))
      .join(assigns.select(col("vec_id"), col("centroid_id")), Seq("vec_id"))
      .select(col("vec_id"), col("embedding"), col("n"), col("centroid_id"),
        lit(epoch).as("epoch"), lit(upto).as("upto_batch"),
        pmod(col("centroid_id"), lit(ListsBuckets.toLong)).cast("int")
          .as("bucket_p"))
      .repartition(col("bucket_p"))
      .sortWithinPartitions(col("bucket_p"), col("centroid_id"))
    CorpusIngest.swapWrite(fs, ivfListsPath(cfg), rows,
      partitionCols = Seq("bucket_p"))
  }

  /** Fold the accumulated per-batch partitions into a single
    * `ingest_batch = -1` partition — same contract, locking, and
    * atomic-swap discipline as [[CorpusIngest.compact]] (the ledger keeps
    * its per-batch audit rows) — then rebuild the serving inverted lists
    * over the folded state ([[writeIvfLists]]): compaction is exactly the
    * maintenance point where the O(corpus) re-layout is paid, so the serve
    * path's pruned base covers everything up to the fold's high-water
    * mark and the per-query delta stays one compaction cadence deep. */
  def compact(spark: SparkSession, cfg: IngestConfig): Unit =
    IngestLock.withLock(spark, cfg.corpusRoot,
        s"compact-${java.util.UUID.randomUUID()}", cfg.lockStaleMs) { lock =>
      val fs = new org.apache.hadoop.fs.Path(cfg.corpusRoot)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      // a reband that died inside the marker swapWrite window leaves the
      // width marker stranded at `.__old` — roll it back BEFORE the first
      // resolvedBands call, or this fold resolves (and folds) the
      // superseded pre-reband directory while the live rebanded one goes
      // unfolded (ADVICE r12); same ordering as ingestBatch/reband
      CorpusIngest.rollbackIfStranded(fs, bandWidthPath(cfg))
      CorpusIngest.rollbackIfStranded(fs, resolvedBands(spark, cfg)._1)
      // high-water mark before the fold (see CorpusIngest.markCompactionHwm)
      val hwm = CorpusIngest.ledgerMaxBatch(spark, ledgerPath(cfg))
      CorpusIngest.markCompactionHwm(fs, cfg.corpusRoot, hwm)
      // invalidate the serving lists BEFORE the folds: once a batch's
      // partition folds into -1 the old lists' `upto_batch` delta predicate
      // can no longer see it, so a crash between fold and rebuild would
      // leave lists that silently under-serve — absent lists merely fall
      // back to the (coherent) split layout, and re-running compact is the
      // repair, the standing contract of every died maintenance pass
      CorpusIngest.rollbackIfStranded(fs, ivfListsPath(cfg))
      // ATOMIC removal (ADVICE r10): rename the lists dir to a tombstone in
      // one fs.rename, then delete the tombstone. search() is lock-free —
      // a plain recursive delete has a window where a concurrent reader
      // lists the directory mid-delete and sees a SURVIVING SUBSET of the
      // lists whose rows still carry a valid (epoch, upto_batch) stamp, so
      // listsUsable passes and the base candidate set is silently
      // incomplete. After the rename, readers see either the complete old
      // table or an absent dir (split-layout fallback), never a partial one.
      deleteListsAtomic(fs, cfg)
      IngestLock.heartbeat(spark, lock)
      // vecs, bands, and the centroid-sorted ivf fold rewrite disjoint
      // directories — overlap them; the pq re-annotation below reads the
      // FOLDED ivf table, so it stays sequential after the group
      CorpusIngest.parallelUnits(Seq(
        // vec_id-sorted: the SRP probe's candidate-id IN pushdown prunes
        // the wide embedding column to the touched row groups
        () => CorpusIngest.foldBatchPartitions(spark, fs, vecsPath(cfg),
          _.repartitionByRange(col("vec_id"))
            .sortWithinPartitions(col("vec_id"))),
        () => CorpusIngest.foldBatchPartitions(spark, fs,
          resolvedBands(spark, cfg)._1),
        () => CorpusIngest.foldBatchPartitions(spark, fs, ivfPath(cfg),
          _.repartitionByRange(col("centroid_id"))
            .sortWithinPartitions(col("centroid_id")))))
      val cents = CorpusIngest.readOrEmpty(spark, centroidsPath(cfg), centDdl)
      val cbEpoch = cents.agg(max(col("frozen_batch"))).first
      // fold the PQ codes RE-ANNOTATED against the post-fold assignments
      // and bucket-clustered — the maintenance point that repairs any
      // stale/null bucket columns (pre-freeze appends) so searchPq's
      // pruned scan is coherent again
      IngestLock.heartbeat(spark, lock)
      CorpusIngest.foldBatchPartitions(spark, fs, pqPath(cfg), { df =>
        if (cbEpoch.isNullAt(0)) df
        else df.drop("centroid_id", "ivf_epoch")
          .join(CorpusIngest.readOrEmpty(spark, ivfPath(cfg), ivfDdl)
            .select(col("vec_id"), col("centroid_id")), Seq("vec_id"), "left")
          .withColumn("ivf_epoch", lit(cbEpoch.getLong(0)))
          .repartitionByRange(col("centroid_id"))
          .sortWithinPartitions(col("centroid_id"))
      })
      if (!cbEpoch.isNullAt(0)) {
        val assigns = CorpusIngest.readOrEmpty(spark, ivfPath(cfg), ivfDdl)
        requireEpochCoherent(cbEpoch.getLong(0),
          assigns.select(col("epoch")), "compact-lists")
        // heal the two-level routing table at the maintenance point (a
        // root written before the router existed, or a crash that left a
        // stale stamp after a codebook swap): re-derive + swap only when
        // it is absent/stale for this generation — the derivation is a
        // pure function of (codebook, metaMod), so healing never changes
        // what hierRouting's fallback was already serving
        val centsOnly = cents.select(col("centroid_id"), col("ce"), col("cn"))
        if (hierActive(cfg, centsOnly)) {
          val stamp = CorpusIngest.readOrEmpty(spark, metaRoutePath(cfg),
            routeDdl).select(col("frozen_batch")).limit(1).collect()
          if (!(stamp.nonEmpty && stamp.head.getLong(0) == cbEpoch.getLong(0))) {
            IngestLock.heartbeat(spark, lock)
            writeMetaRoute(spark, fs, cfg, centsOnly, cbEpoch.getLong(0))
          }
        }
        IngestLock.heartbeat(spark, lock)
        writeIvfLists(spark, fs, cfg,
          CorpusIngest.readOrEmpty(spark, vecsPath(cfg), vecsDdl),
          assigns, cbEpoch.getLong(0), hwm)
      }
    }

  /** Start the continuous ingest (AvailableNow: drain pending files, stop). */
  def start(spark: SparkSession, cfg: IngestConfig): StreamingQuery =
    spark.readStream
      .schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
      .option("maxFilesPerTrigger", cfg.maxFilesPerTrigger)
      .parquet(cfg.vecsDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(spark, cfg, batch, batchId): Unit
      }
      .start()
}
