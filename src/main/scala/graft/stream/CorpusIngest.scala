package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.Caching
import graft.text.TextOps

/**
 * Continuous corpus ingestion with streaming deduplication — the streaming
 * face of the dedup family: documents arrive as parquet files, each
 * micro-batch is deduplicated (exact hash, within-batch near-dup, then a
 * MinHash probe against the PERSISTED index of everything accepted so far)
 * and the survivors are appended to the corpus plus its signature index.
 * The reference's streaming loop does the same continuous-apply job for CDC
 * rows (matomo2clickhouse.py:660-726); this transplants the discipline to
 * corpus building.
 *
 * Scale + exactly-once design:
 *  - the index is APPEND-ONLY: an accepted batch appends its own rows to
 *    the hash/band/set tables under `ingest_batch=<batchId>` partitions —
 *    per-batch cost is O(batch + candidate joins), never an O(corpus)
 *    state rewrite;
 *  - at-least-once replay is idempotent: every write is a dynamic
 *    partition OVERWRITE of that batch's own `ingest_batch` partition, so
 *    a crashed-and-replayed batch rewrites the identical rows (dedup
 *    decisions are deterministic, and the replayed batch's own prior
 *    output is excluded from the index it probes);
 *  - probing joins the BATCH's bands against the index bands — cost
 *    follows the batch, the corpus is never rescanned.
 */
object CorpusIngest {

  final case class IngestConfig(
      /** Streaming source dir of incoming docs (parquet: doc_id, text). */
      docsDir: String,
      /** Root of the ingested corpus: docs/, hashes/, bands/, sets/, ledger/. */
      corpusRoot: String,
      checkpointDir: String,
      threshold: Double = 0.8,
      maxFilesPerTrigger: Int = 20,
      /** [[IngestLock]] staleness window: a holder whose heartbeat (one per
        * micro-batch) is older than this is presumed dead and its lock
        * broken — the reference's `replication_max_minutes * 2` rule. */
      lockStaleMs: Long = 30 * 60 * 1000L,
      /** Misra–Gries capacity of the per-batch vocabulary summaries:
        * [[frequentTerms]] guarantees every word above an n/(mgK+1) share
        * of all corpus words is reported. */
      mgK: Int = 64,
      /** Ingest quality gate: docs scoring below this
        * ([[graft.text.TextOps.qualityScoreExpr]] — the same arithmetic as
        * the `text_stats` quality score) are dropped BEFORE dedup and
        * indexing. 0.0 (the default) admits everything. A row-local
        * filter: no join, no shuffle, prunes the batch before the
        * signature build pays for it. */
      minQuality: Double = 0.0)

  def docsPath(cfg: IngestConfig): String = s"${cfg.corpusRoot}/docs"
  private def hashesPath(cfg: IngestConfig) = s"${cfg.corpusRoot}/hashes"
  private def bandsPath(cfg: IngestConfig) = s"${cfg.corpusRoot}/bands"
  private def setsPath(cfg: IngestConfig) = s"${cfg.corpusRoot}/sets"
  private def postingsPath(cfg: IngestConfig) = s"${cfg.corpusRoot}/postings"
  private def docstatsPath(cfg: IngestConfig) = s"${cfg.corpusRoot}/docstats"
  private def mgPath(cfg: IngestConfig) = s"${cfg.corpusRoot}/mg"
  private def phashPath(cfg: IngestConfig) = s"${cfg.corpusRoot}/phash"
  def ledgerPath(cfg: IngestConfig): String = s"${cfg.corpusRoot}/ledger"

  private val phashDdl =
    "doc_id BIGINT, phash BIGINT, band INT, v BIGINT, ingest_batch BIGINT"

  /** Cap on driver-collected ids/hashes pushed into an index scan as an
    * IN filter (the [[UnionFind]] MaxLabelFetchIds pattern) — at or below
    * [[graft.Sessions]]'s parquet IN-pushdown threshold, above which the
    * push degrades to a min/max range that prunes nothing for scattered
    * keys. Over the cap the probes fall back to the full join — correct
    * either way, the pushdown only prunes IO. */
  private[stream] val MaxProbePushIds = 1000

  /** Append independent per-layer partitions CONCURRENTLY (bounded pool):
    * each job writes a DIFFERENT directory and reads only frames the
    * caller has already materialized, so the fixed per-commit latency
    * (task scheduling, footer writes, directory renames) overlaps instead
    * of serializing — on an 8-layer ingest batch the commits are the
    * dominant wall-clock. `invokeAll` BLOCKS until every write settles
    * (success or failure) before rethrowing the first failure: a straggler
    * writer must never outlive the batch's ingest lock, and a failed batch
    * replays with every layer rewritten idempotently (per-partition
    * dynamic overwrite), so partial completion in any order is safe. */
  private[stream] def parallelAppends(jobs: Seq[(String, DataFrame)]): Unit =
    parallelUnits(jobs.map { case (path, df) =>
      () => df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest_batch").parquet(path)
    })

  /** The bounded-pool runner behind [[parallelAppends]] (and the
    * compaction folds): every unit must touch a DIFFERENT directory.
    * `invokeAll` blocks until every unit settles before the first failure
    * rethrows — no straggler outlives the caller's lock. */
  private[stream] def parallelUnits(jobs: Seq[() => Unit]): Unit = {
    if (jobs.sizeIs <= 1) jobs.foreach(_())
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(jobs.size, 8))
      try {
        import scala.jdk.CollectionConverters._
        val tasks: Seq[java.util.concurrent.Callable[Option[Throwable]]] =
          jobs.map { job =>
            () => try { job(); None }
                  catch { case e: Throwable => Some(e) }
          }
        val failures = pool.invokeAll(tasks.asJava).asScala.flatMap(_.get())
        failures.headOption.foreach { e =>
          // keep the co-failures: three writers dying of three causes must
          // not collapse to one arbitrary stack trace
          failures.drop(1).foreach(e.addSuppressed)
          throw e
        }
      } finally pool.shutdown()
    }
  }

  /** Forward-compat shim for table layouts that GAIN columns across
    * versions (e.g. the PQ code table's epoch/bucket annotations): a root
    * persisted before the column existed reads back with the new columns
    * as typed NULLs instead of crashing every downstream select with an
    * AnalysisException the operator can't act on. Null semantics are the
    * per-column contract (stale annotation → pruning disabled; missing
    * epoch stamp → coherence gate refuses with the repair named). Only
    * ADDS columns — extra on-disk columns and type conflicts still
    * surface. */
  private def conformToDdl(df: DataFrame, ddl: String): DataFrame = {
    val have = df.columns.toSet
    val missing = org.apache.spark.sql.types.StructType.fromDDL(ddl)
      .fields.filter(f => !have.contains(f.name))
    missing.foldLeft(df)((d, f) =>
      d.withColumn(f.name, lit(null).cast(f.dataType)))
  }

  private[stream] def readOrEmpty(spark: SparkSession, path: String,
      ddl: String): DataFrame = {
    def empty = graft.Frames.empty(spark, ddl)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    rollbackIfStranded(fs, path)
    if (!fs.exists(p)) empty
    // an all-rejected batch leaves the dir present but partition-less
    // (_SUCCESS only); ONLY that schema-inference failure means empty — any
    // other analysis error (corrupt footer, conflicting schema) must
    // surface, not silently disable deduplication
    else try conformToDdl(spark.read.parquet(path), ddl)
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") => empty
    }
  }

  /** Read-only twin of [[readOrEmpty]] for the lock-less [[probe]] paths:
    * NEVER mutates. A table stranded at `<dir>.__old` by a crashed
    * compaction is READ from there instead of being rolled back — rollback
    * belongs to the locked mutators; a probe racing a live compact's
    * two-rename swap window must not rename directories out from under it
    * (the rollback would make the compact's swap-in fail). */
  /** Resolve (bands dir, bits, bandBits) from an SRP root's width marker —
    * shared by the SRP-indexed roots ([[EmbeddingIngest]],
    * [[EmbeddingClusterRegistry]]): reband re-signs the bands into a
    * width-suffixed directory and swaps the 1-row marker as the atomic
    * commit, so the directory NAME ties rows to their width and every
    * face (appends, probes, folds) agrees on both through this resolver.
    * See [[EmbeddingIngest.reband]] for the full crash contract. */
  private[stream] def resolvedSrpBands(spark: SparkSession, root: String,
      legacyDir: String, defBits: Int, defBandBits: Int): (String, Int, Int) =
    readOrEmptyRO(spark, s"$root/bandwidth", "bits INT, band_bits INT")
      .limit(1).collect().headOption match {
      case Some(r) =>
        val (b, bb) = (r.getInt(0), r.getInt(1))
        (s"$root/bands_w${b}x$bb", b, bb)
      case None => (legacyDir, defBits, defBandBits)
    }

  /** Delete band directories a prior reband superseded — called at the
    * start of the NEXT reband, one maintenance cadence later, so a
    * lock-free reader that resolved the pre-swap marker never loses its
    * directory mid-scan (an absent bands dir reads as an EMPTY index —
    * silently wrong). Matches exact band-directory names only. */
  private[stream] def sweepSupersededSrpBands(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, root: String,
      keepDir: String): Unit = {
    val keep = new org.apache.hadoop.fs.Path(keepDir).getName
    val rootPath = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(rootPath)) return
    fs.listStatus(rootPath).foreach { st =>
      val name = st.getPath.getName
      if (name != keep && name.matches("bands(_w\\d+x\\d+)?"))
        fs.delete(st.getPath, true): Unit
    }
  }

  private[stream] def readOrEmptyRO(spark: SparkSession, path: String,
      ddl: String): DataFrame = {
    def empty = graft.Frames.empty(spark, ddl)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(path, path + ".__old")
      .find(d => fs.exists(new org.apache.hadoop.fs.Path(d))) match {
      case None => empty
      case Some(dir) =>
        try conformToDdl(spark.read.parquet(dir), ddl)
        catch {
          case e: org.apache.spark.sql.AnalysisException
              if e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") => empty
        }
    }
  }

  // Every partitioned state overwrite sets partitionOverwriteMode=dynamic
  // PER WRITE via DataFrameWriter.option (which takes precedence over the
  // session conf, SPARK-20236). The prior session-conf toggle was not
  // reentrant: with four ingest paths sharing one SparkSession, one path's
  // finally-restore could flip the mode back to `static` while another
  // path's partitioned overwrite was being planned — silently truncating
  // the whole table instead of its own partition (ADVICE round 9).

  /** A compact() that died between its two renames leaves a table
    * stranded at `<dir>.__old` — roll it back (the StateStore.read
    * discipline); proceeding as if empty would silently reset the dedup
    * index and orphan the accepted corpus. */
  private[stream] def rollbackIfStranded(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val old = new org.apache.hadoop.fs.Path(dir + ".__old")
    if (!fs.exists(p) && fs.exists(old))
      require(fs.rename(old, p), s"state rollback failed: $old -> $p")
  }

  // ---- compaction high-water mark (ADVICE round 9) --------------------
  // After a compaction folds per-batch partitions into `-1`, an
  // at-least-once replay of a PRE-compaction batch id (a stream restarted
  // from an older checkpoint) would re-append rows that already live in
  // the folded partition — silent duplication that double-counts every
  // downstream aggregate. The fold records the highest batch id it
  // subsumes as an empty marker file `_compact_hwm/<id>` (create-only and
  // monotone: no rename/delete window can lose the mark), and every
  // ingest refuses batch ids at or below it.

  private def hwmDir(root: String) =
    new org.apache.hadoop.fs.Path(s"$root/_compact_hwm")

  /** Highest batch id any compaction of `root` has folded;
    * Long.MinValue when none ran. */
  private[stream] def compactionHwm(fs: org.apache.hadoop.fs.FileSystem,
      root: String): Long = {
    val d = hwmDir(root)
    if (!fs.exists(d)) Long.MinValue
    else fs.listStatus(d).map(_.getPath.getName)
      .flatMap(n => scala.util.Try(n.toLong).toOption)
      .foldLeft(Long.MinValue)(math.max)
  }

  /** Record the mark BEFORE folding (callers pass the ledger's max batch
    * id): a crash between marker and fold merely refuses replays of
    * batches whose partitions are still intact — safe, their rows are
    * present either way. The reverse order would leave a fold-then-crash
    * window where the silent re-append is back. */
  private[stream] def markCompactionHwm(fs: org.apache.hadoop.fs.FileSystem,
      root: String, hwm: Long): Unit =
    if (hwm > compactionHwm(fs, root)) {
      val d = hwmDir(root)
      if (!fs.exists(d)) fs.mkdirs(d)
      fs.create(new org.apache.hadoop.fs.Path(d, hwm.toString), true).close()
    }

  /** Max batch id the ledger has recorded — what a compaction is about to
    * subsume. The ledgers stay per-batch through every fold, so this is
    * the root's full ingest history. */
  private[stream] def ledgerMaxBatch(spark: SparkSession,
      ledgerPath: String): Long = {
    // cast: partition-column type inference reads small batch ids as INT
    val r = readOrEmpty(spark, ledgerPath, "ingest_batch BIGINT")
      .agg(max(col("ingest_batch").cast("long"))).first
    if (r.isNullAt(0)) Long.MinValue else r.getLong(0)
  }

  /** The loud refusal: a batch at or below the high-water mark must not
    * re-ingest (its own partition was deleted by the fold; a dynamic
    * overwrite would duplicate its rows next to the compacted copy).
    * The repair is advancing the stream checkpoint past the mark. */
  private[stream] def requireAboveCompactionHwm(
      fs: org.apache.hadoop.fs.FileSystem, root: String, batchId: Long): Unit = {
    val hwm = compactionHwm(fs, root)
    require(batchId > hwm,
      s"batch $batchId is at or below the compaction high-water mark $hwm " +
        "— its rows were folded into the compacted state and a replay " +
        "would duplicate them; advance the stream checkpoint past the mark")
  }

  /** The lock owner of a batch is its STABLE identity — checkpoint dir +
    * batch id, not a per-invocation UUID. A batch that crashed after
    * acquiring the lock is replayed BY THE SAME STREAM under the same
    * checkpoint and batch id; with a stable owner that restart is the
    * reentrant-refresh case and proceeds immediately, instead of stalling
    * behind its own dead incarnation's non-stale lock for up to
    * `lockStaleMs`. Two processes can only share this owner by running the
    * same checkpoint's same batch — whose writes are byte-identical
    * idempotent partition overwrites by construction. */
  def batchLockOwner(cfg: IngestConfig, batchId: Long): String =
    s"ingest-batch-$batchId@${cfg.checkpointDir}"

  /** Ingest one batch; returns the accepted-doc count. Public so batch
    * callers (backfills, tests) can drive it without a streaming query.
    * Takes the corpus [[IngestLock]] for its duration — a concurrent
    * [[compact]] (or a second ingest run against the same root) refuses
    * instead of interleaving with the multi-table partition writes. */
  def ingestBatch(spark: SparkSession, cfg: IngestConfig, batch: DataFrame,
      batchId: Long): Long = MaintStages("ingest_text", "total") {
    IngestLock.withLock(spark, cfg.corpusRoot,
      batchLockOwner(cfg, batchId), cfg.lockStaleMs) { lock =>
    // recover every table a crashed compaction may have stranded — not
    // just the index tables the dedup reads, but docs and ledger too
    val rootFs = new org.apache.hadoop.fs.Path(cfg.corpusRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    MaintStages("ingest_text", "setup_fs") {
      Seq(docsPath(cfg), hashesPath(cfg), bandsPath(cfg), setsPath(cfg),
        postingsPath(cfg), docstatsPath(cfg), mgPath(cfg), phashPath(cfg),
        ledgerPath(cfg))
        .foreach(rollbackIfStranded(rootFs, _))
      requireAboveCompactionHwm(rootFs, cfg.corpusRoot, batchId)
    }
    // Caching.scope: the batch's cached intermediates are released when the
    // batch ends — and ONLY them, never a concurrent pipeline's caches (a
    // blanket releaseAll here would silently uncache an enclosing job's
    // scoped frames mid-flight)
    Caching.scope { MaintStages("ingest_text", "scope_body") {
      // a replayed batch must not probe the rows IT wrote before crashing —
      // its decisions would then flip from accept to reject
      def idx(path: String, ddl: String) =
        readOrEmpty(spark, path, ddl).filter(col("ingest_batch") =!= batchId)

      val norm = Caching.scoped(batch
        .select(col("doc_id"), col("text"),
          md5(TextOps.normalizeText(col("text"))).as("text_hash")))
      // the quality gate runs FIRST: a below-threshold doc must not reach
      // the dedup stages (where, as an exact-dup "winner" or a near-dup
      // canonical, it could oust a higher-quality copy and then be the
      // only surviving version of that content)
      val gated =
        if (cfg.minQuality <= 0.0) norm
        else norm.filter(TextOps.qualityScoreExpr(col("text"),
          TextOps.wordsOf(col("text"))) >= cfg.minQuality)
      // within-batch exact dedup: the canonical (min doc_id) copy survives
      val w = Window.partitionBy(col("text_hash"))
      val firstOfHash = gated
        .withColumn("__min", min(col("doc_id")).over(w))
        .filter(col("doc_id") === col("__min")).drop("__min")
      // cross-corpus exact dedup against the accepted hash index. The
      // batch's own hashes (batch-sized, driver-bounded by the cap) push
      // into the index scan as an IN filter: the anti-join's answer only
      // depends on index rows whose hash the batch holds, so the filter
      // is exact — and over the sorted compacted layout the parquet
      // min/max stats prune the corpus-sized hash table to the touched
      // row groups instead of scanning it per batch (the 100 TB shape;
      // VERDICT r13 item 4's O(root) floor, removed)
      val hashIdx0 = MaintStages("ingest_text", "read_hash_idx") {
        idx(hashesPath(cfg), "text_hash STRING, ingest_batch BIGINT")
          .select(col("text_hash"))
      }
      val batchHashes = MaintStages("ingest_text", "hash_collect") {
        firstOfHash.select(col("text_hash")).distinct()
          .limit(MaxProbePushIds + 1).collect().map(_.getString(0))
      }
      val hashIdx =
        if (batchHashes.length > MaxProbePushIds) hashIdx0
        else hashIdx0.filter(col("text_hash").isin(batchHashes.toSeq: _*))
      val (fresh, freshBands, freshSets) = MaintStages("ingest_text", "sig_plan") {
        val fresh = Caching.scoped(firstOfHash.join(hashIdx,
          Seq("text_hash"), "left_anti"))
        // ONE signature build for the whole batch: the index probe, the
        // within-batch dedup, and the accepted-index append all derive from
        // these two cached frames — the shingle→md5 scan (the batch's
        // dominant CPU) runs once, not three times
        val (fb, fsets) = TextOps.minhashIndex(fresh, "doc_id", "text")
        (fresh, Caching.scoped(fb), Caching.scoped(fsets))
      }
      // probe the persisted index FIRST: a doc already near-duplicated in
      // the corpus must not also act as a within-batch "winner" — dropping
      // its batch near-dups in its favor and then rejecting it would lose
      // content that has no accepted near-duplicate at all, and would make
      // the accepted set depend on batch boundaries
      val probeHits = MaintStages("ingest_text", "probe_build") {
        TextOps.minhashProbeIndexed(
          idx(bandsPath(cfg), "doc_id BIGINT, band INT, sig STRING, ingest_batch BIGINT"),
          idx(setsPath(cfg), "doc_id BIGINT, s ARRAY<BIGINT>, n BIGINT, ingest_batch BIGINT"),
          freshBands, freshSets, cfg.threshold, pushIdLimit = MaxProbePushIds)
      }
      // CACHED: the probe subtree above is the only stage that READS the
      // accumulated index (bands + sets scans — cost tracks the ROOT, not
      // the batch), and without the cache every downstream consumer
      // (both within-batch ofNovel legs and the accepted frame) would
      // recompute it — measured as the whole text-ingest 100×-root slope
      // (VERDICT r13 item 4: ratio 2.97 → the root-sized subtree ran 3-4
      // times per batch; cached it runs once, and what remains is one
      // index scan per ingest, the documented O(root-scan) floor of a
      // probe whose candidate ids are runtime-computed)
      val corpusNovelIds = MaintStages("ingest_text", "novel_plan") {
        Caching.scoped(fresh.join(
          probeHits.select(col("batch_id").as("doc_id")).distinct(),
          Seq("doc_id"), "left_anti").select(col("doc_id")))
      }
      def ofNovel(f: DataFrame) = f.join(corpusNovelIds, Seq("doc_id"), "left_semi")
      // within-batch near-dup among the corpus-novel docs: connected
      // components over the verified pair graph, keep each component's
      // canonical (min id) — the same transitive cluster-canonical policy
      // as the batch dedup family (dedup_clusters / dedup_keep_best). A
      // pairwise drop-the-greater rule would, on a chain A~B~C with A≁C,
      // drop BOTH B and C (C's content then survives nowhere while its
      // only near-dup B is also gone); component resolution makes the
      // kept set a deliberate one-per-cluster, not a pair-order artifact.
      val inBatchPairs = MaintStages("ingest_text", "pairs_plan") {
        TextOps.minhashNearDupsIndexed(
          ofNovel(freshBands), ofNovel(freshSets), cfg.threshold)
      }
      val inBatchDrops = MaintStages("ingest_text", "cc") {
        TextOps.connectedComponents(inBatchPairs)
          .filter(col("id") =!= col("component"))
          .select(col("id").as("doc_id"))
      }
      val accepted = MaintStages("ingest_text", "accepted_plan") {
        Caching.scoped(
          ofNovel(fresh).join(inBatchDrops, Seq("doc_id"), "left_anti"))
      }

      // the dedup computation above may outlive the staleness window on a
      // huge batch; refresh the heartbeat (and fail loudly on a stolen
      // lock) BEFORE the first state write, not after
      IngestLock.heartbeat(spark, lock)
      val stamp = lit(batchId).as("ingest_batch")
      // materialize the cached inputs (and the ledger counts) BEFORE the
      // write group: every layer below reads these warm blocks, so the
      // concurrent writers don't race to compute the same partitions
      // (norm is a pure select over the batch — same cardinality)
      // the two ledger counts are independent jobs over disjoint cache
      // subtrees (norm is already materialized by the hash collect;
      // accepted's chain materializes here) — overlap them on the bounded
      // pool instead of paying two sequential job latencies
      val (nIn, nAccepted) = MaintStages("ingest_text", "counts") {
        var (a, b) = (0L, 0L)
        parallelUnits(Seq(() => a = norm.count(), () => b = accepted.count()))
        (a, b)
      }
      def ofAccepted(f: DataFrame) =
        f.join(accepted.select(col("doc_id")), Seq("doc_id"), "left_semi")
      // the probe-key tables append RANGE-LAID-OUT by their probe key
      // (cheap at batch scale — one extra batch-sized shuffle): files
      // then carry disjoint key ranges and tight min/max stats, so the
      // cap-bounded IN pushdowns above prune row groups in the
      // NOT-yet-compacted partitions too, not only after the sorted fold
      def ranged(df: DataFrame, c: String) =
        df.repartitionByRange(col(c)).sortWithinPartitions(col(c))
      MaintStages("ingest_text", "appends") { parallelAppends(Seq(
        docsPath(cfg) -> accepted.select(col("doc_id"), col("text"), stamp),
        hashesPath(cfg) -> ranged(
          accepted.select(col("text_hash"), stamp), "text_hash"),
        bandsPath(cfg) -> ranged(ofAccepted(freshBands)
          .select(col("doc_id"), col("band"), col("sig"), stamp), "sig"),
        setsPath(cfg) -> ranged(ofAccepted(freshSets)
          .select(col("doc_id"), col("s"), col("n"), stamp), "doc_id"),
        // the lexical index layer: postings of the accepted docs plus the
        // batch's 1-row additive corpus statistics — together exactly what
        // [[search]] needs, and additive across batches (postings of
        // disjoint batches union to the monolithic index; stat rows sum to
        // the monolithic N/Σdl), so the incremental build IS the rebuild
        postingsPath(cfg) -> TextOps.invertedIndex(accepted, "doc_id", "text")
          .select(col("word"), col("doc_id"), col("tf"), col("dl"), stamp),
        docstatsPath(cfg) -> TextOps.corpusStats(accepted, "doc_id", "text")
          .select(col("n_docs"), col("dl_sum"), stamp),
        // the vocabulary-frequency layer: one mergeable Misra–Gries summary
        // of the batch's accepted words — summaries of disjoint batches sum
        // to a whole-corpus summary with the same n/(k+1) bound, so
        // [[frequentTerms]] serves by plain integer addition
        mgPath(cfg) -> graft.text.HeavyHitters.mgSummary(
            accepted.select(explode(TextOps.wordsOf(col("text"))).as("word")),
            "word", cfg.mgK)
          .select(col("token").as("word"), col("cnt"), stamp),
        // the multimodal near-dup layer: banded perceptual-hash signatures
        // of the accepted payloads (here the docs' UTF-8 bytes — real media
        // rows would land their binary column in the same table),
        // append-only like every other signature index; [[probePhash]]
        // serves it. Derived from `accepted` alone (no probe feeds the
        // decision), so a replayed batch rewrites identical rows.
        // Sub-`samples` payloads produce no row by
        // [[graft.ml.Multimodal.phash]]'s length guard.
        phashPath(cfg) -> graft.ml.Multimodal.phashBands(
            graft.ml.Multimodal.withPayload(accepted, "doc_id", "text"))
          .select(col("doc_id"), col("phash"), col("band"), col("v"), stamp))) }
      // the ledger row stays LAST and sequential: compaction takes the
      // ledger max as the high-water mark it fences replays with, so the
      // row must never land before every data layer it vouches for
      MaintStages("ingest_text", "ledger") {
        spark.createDataFrame(Seq((batchId, nIn, nAccepted)))
          .toDF("ingest_batch", "n_in", "n_accepted")
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("ingest_batch").parquet(ledgerPath(cfg))
      }
      nAccepted
    } }
  } }

  /**
   * Probe a batch against the ingested corpus WITHOUT ingesting — the
   * read-only serving face of the persisted index ("would these docs be
   * rejected?"): exact hits against the hash table, near-dup hits against
   * the banded MinHash index, one row per (batch doc, reason). Takes no
   * lock and writes nothing; cost follows the batch exactly like
   * [[ingestBatch]]'s probe stage. Output: (doc_id, kind
   * 'quality'|'exact'|'near' — staged in ingest order, one reason per doc,
   * corpus_id — the matched accepted doc for near hits, null otherwise
   * (the hash table stores content hashes, not ids), jaccard — null except
   * near). Scoped intermediates follow the query-function contract: the
   * caller releases after its terminal action (Caching.releaseAll, or an
   * enclosing Caching.scope).
   */
  def probe(spark: SparkSession, cfg: IngestConfig, batch: DataFrame): DataFrame = {
    val all = Caching.scoped(batch
      .select(col("doc_id"), col("text"),
        md5(TextOps.normalizeText(col("text"))).as("text_hash")))
    // the gate stages FIRST, exactly like ingestBatch: a below-threshold
    // doc reports 'quality' and never reaches the dup probes (one reason
    // per doc, and the reason ingest would actually act on)
    val gatePass = TextOps.qualityScoreExpr(col("text"),
      TextOps.wordsOf(col("text"))) >= cfg.minQuality
    val quality =
      if (cfg.minQuality <= 0.0) all.limit(0)
      else all.filter(!gatePass)
    val norm = if (cfg.minQuality <= 0.0) all else all.filter(gatePass)
    val hashIdx0 = readOrEmptyRO(spark, hashesPath(cfg),
      "text_hash STRING, ingest_batch BIGINT").select(col("text_hash"))
    // the same cap-bounded batch-hash pushdown as ingestBatch: both the
    // semi and the anti join only depend on index rows whose hash the
    // batch holds
    val batchHashes = norm.select(col("text_hash")).distinct()
      .limit(MaxProbePushIds + 1).collect().map(_.getString(0))
    val hashIdx =
      if (batchHashes.length > MaxProbePushIds) hashIdx0
      else hashIdx0.filter(col("text_hash").isin(batchHashes.toSeq: _*))
    val exact = norm.join(hashIdx, Seq("text_hash"), "left_semi")
      .select(col("doc_id"), lit("exact").as("kind"),
        lit(null).cast("bigint").as("corpus_id"),
        lit(null).cast("double").as("jaccard"))
    // near hits only for docs that are NOT exact hits — the same staging as
    // ingestBatch, where exact dups never reach the minhash probe (an exact
    // dup is trivially also a near dup; one reason per doc suffices)
    val fresh = norm.join(hashIdx, Seq("text_hash"), "left_anti")
    val near = TextOps.minhashProbeIndexed(
      readOrEmptyRO(spark, bandsPath(cfg),
        "doc_id BIGINT, band INT, sig STRING, ingest_batch BIGINT"),
      readOrEmptyRO(spark, setsPath(cfg),
        "doc_id BIGINT, s ARRAY<BIGINT>, n BIGINT, ingest_batch BIGINT"),
      fresh, "doc_id", "text", n = 3, k = 12, r = 3,
      threshold = cfg.threshold, pushIdLimit = MaxProbePushIds)
      .select(col("batch_id").as("doc_id"), lit("near").as("kind"),
        col("corpus_id"), col("jaccard"))
    quality
      .select(col("doc_id"), lit("quality").as("kind"),
        lit(null).cast("bigint").as("corpus_id"),
        lit(null).cast("double").as("jaccard"))
      .unionByName(exact).unionByName(near)
  }

  /**
   * Probe a batch of payloads against the PERSISTED perceptual-hash index —
   * the multimodal face of [[probe]] ("does this payload near-duplicate an
   * accepted one?"): band the batch's phash signatures, equi-join the index
   * bands on (band, v), verify by exact hamming. Read-only and lock-free
   * like every serving face (reads through stranded compactions); cost
   * follows the batch's bucket fanout, the corpus is never rescanned. The
   * batch arrives as (doc_id, text) — its payload is the UTF-8 bytes, the
   * same stand-in [[ingestBatch]] indexes; a real media pipeline would feed
   * its binary column through the identical banding. Output:
   * (doc_id, corpus_id, hamming) within `maxDist`.
   */
  def probePhash(spark: SparkSession, cfg: IngestConfig, batch: DataFrame,
      maxDist: Int = 3): DataFrame = {
    val idx = readOrEmptyRO(spark, phashPath(cfg), phashDdl)
    val probeBands = graft.ml.Multimodal.phashBands(
      graft.ml.Multimodal.withPayload(batch, "doc_id", "text"))
    graft.ml.Multimodal.phashProbeIndexed(idx, probeBands, maxDist)
      .select(col("batch_id").as("doc_id"), col("corpus_id"), col("hamming"))
  }

  /**
   * BM25 top-k over the PERSISTED lexical index — the serving face of the
   * postings/docstats layer [[ingestBatch]] maintains: score every accepted
   * doc holding at least one query term, return the `topK` best. Read-only
   * and lock-free like [[probe]] (reads through stranded compactions via
   * [[readOrEmptyRO]]); never touches document text — the postings scan
   * prunes to the query terms at the parquet filter, the stat rows sum to
   * one broadcast row, so query cost follows df(terms), not the corpus.
   * Output: (doc_id, dl, bm25, rank), rank 1-based by (bm25 desc, doc_id).
   */
  def search(spark: SparkSession, cfg: IngestConfig, terms: Seq[String],
      topK: Int = 10, k1: Double = 1.2, b: Double = 0.75,
      allowed: Option[DataFrame] = None): DataFrame = {
    val postings = readOrEmptyRO(spark, postingsPath(cfg),
      "word STRING, doc_id BIGINT, tf BIGINT, dl BIGINT, ingest_batch BIGINT")
    val stats = readOrEmptyRO(spark, docstatsPath(cfg),
      "n_docs BIGINT, dl_sum BIGINT, ingest_batch BIGINT")
    // metadata-FILTERED serving (the EmbeddingIngest.search `allowed`
    // twin): the allowed-id set semi-joins the scored docs BEFORE the
    // top-k, so the ranking refills from the allowed corpus instead of
    // under-filling a post-filtered list. Deliberately applied to the
    // RESULT list only — the BM25 statistics (N, Σdl, df) stay
    // corpus-wide, because an access filter must not change what the
    // corpus statistically IS, only who sees which documents.
    val scored = allowed.foldLeft(
        TextOps.bm25Indexed(postings, stats, terms, k1, b)) { (s, ids) =>
      s.join(ids.select(col(ids.columns.head).as("doc_id")),
        Seq("doc_id"), "left_semi")
    }
    // rank WITHOUT a partition-less window (the Retrieval.topKRanks shape):
    // sort+limit plans as TakeOrdered, the ≤ topK survivors collapse to one
    // sorted array row (order pinned by the unique (−score, id) struct
    // prefix), and posexplode emits rank = position + 1
    scored.orderBy(col("bm25").desc, col("doc_id").asc).limit(topK)
      .agg(sort_array(collect_list(struct(
        negate(col("bm25")).as("ns"), col("doc_id").as("id"),
        col("dl").as("dl")))).as("a"))
      .select(posexplode(col("a")).as(Seq("pos", "s")))
      .select(col("s.id").as("doc_id"), col("s.dl").as("dl"),
        negate(col("s.ns")).as("bm25"), (col("pos") + 1).cast("int").as("rank"))
  }

  /**
   * Frequent corpus vocabulary from the PERSISTED per-batch Misra–Gries
   * summaries — the streaming twin of
   * [[graft.text.HeavyHitters.heavyHitters]]: summaries of disjoint
   * batches sum by plain integer addition to a whole-corpus summary with
   * the additive bound cnt ∈ [f − n/(mgK+1), f], so every word holding
   * more than an n/(mgK+1) share of all accepted words is guaranteed
   * reported, with its count never over-estimated. Read-only and
   * lock-free like [[search]]/[[probe]]. Output: (word, approx_count,
   * share_lb — approx_count/n, a LOWER bound on the true share), words
   * whose merged counter cleared `minShare` of the corpus total.
   *
   * Scale: the serve reads summary rows (≤ batches·partitions·mgK before
   * compaction, ≤ vocab after), never the corpus; n comes from the 1-row
   * docstats sum.
   */
  def frequentTerms(spark: SparkSession, cfg: IngestConfig,
      minShare: Double = 0.01): DataFrame = {
    val mg = readOrEmptyRO(spark, mgPath(cfg),
      "word STRING, cnt BIGINT, ingest_batch BIGINT")
    val total = readOrEmptyRO(spark, docstatsPath(cfg),
      "n_docs BIGINT, dl_sum BIGINT, ingest_batch BIGINT")
      .agg(coalesce(sum(col("dl_sum")), lit(0L)).as("n_words"))
    mg.groupBy(col("word")).agg(sum(col("cnt")).as("approx_count"))
      .crossJoin(broadcast(total))
      .withColumn("share_lb",
        col("approx_count").cast("double") / col("n_words").cast("double"))
      .filter(col("share_lb") >= minShare)
      .select(col("word"), col("approx_count"), col("share_lb"))
  }

  /**
   * Vocabulary drift report from the persisted per-batch MG summaries —
   * the text twin of [[EmbeddingIngest.driftReport]]: how far the RECENT
   * batches' word distribution has moved from the corpus history. A
   * domain shift in the ingest feed (spam bursts, a new source's jargon,
   * a language flip) shows up here as words whose recent share dwarfs
   * their historical share — before it degrades downstream quality gates
   * trained on the old distribution.
   *
   * Split: batches with `ingest_batch >= sinceBatch` are "recent", the
   * rest — including the compacted `-1` partition — are history (so the
   * report stays well-defined after [[compact]]: compacted rows ARE
   * history). Shares are MG lower bounds (cnt ∈ [f − n/(mgK+1), f]; an
   * absent word's true share is ≤ 1/(mgK+1)) — exact enough for a drift
   * gauge whose job is flagging order-of-magnitude moves. Output per word
   * clearing `minShare` on either side: (word, recent_share, hist_share,
   * shift = recent − hist), all single IEEE divisions over exact integer
   * sums.
   *
   * Scale: reads summary rows and the 1-row docstats sums only — the
   * corpus itself is never touched. Read-only and lock-free.
   */
  def vocabDriftReport(spark: SparkSession, cfg: IngestConfig,
      sinceBatch: Long, minShare: Double = 0.001): DataFrame = {
    val mg = readOrEmptyRO(spark, mgPath(cfg),
      "word STRING, cnt BIGINT, ingest_batch BIGINT")
    val st = readOrEmptyRO(spark, docstatsPath(cfg),
      "n_docs BIGINT, dl_sum BIGINT, ingest_batch BIGINT")
    def words(side: DataFrame => DataFrame, cntName: String) =
      side(mg).groupBy(col("word")).agg(sum(col("cnt")).as(cntName))
    def total(side: DataFrame => DataFrame, nName: String) =
      side(st).agg(coalesce(sum(col("dl_sum")), lit(0L)).as(nName))
    val recent = words(_.filter(col("ingest_batch") >= sinceBatch), "rcnt")
    val hist = words(_.filter(col("ingest_batch") < sinceBatch), "hcnt")
    def share(cnt: String, n: String) =
      when(col(n) > 0L,
        coalesce(col(cnt), lit(0L)).cast("double") / col(n).cast("double"))
        .otherwise(lit(0.0))
    recent.join(hist, Seq("word"), "full_outer")
      .crossJoin(broadcast(total(_.filter(col("ingest_batch") >= sinceBatch), "rn")))
      .crossJoin(broadcast(total(_.filter(col("ingest_batch") < sinceBatch), "hn")))
      .withColumn("recent_share", share("rcnt", "rn"))
      .withColumn("hist_share", share("hcnt", "hn"))
      .filter(greatest(col("recent_share"), col("hist_share")) >= minShare)
      .select(col("word"), col("recent_share"), col("hist_share"),
        (col("recent_share") - col("hist_share")).as("shift"))
  }

  /**
   * Fold the accumulated per-batch partitions of every corpus table into a
   * single `ingest_batch = -1` partition — the maintenance job that keeps
   * the append-only design viable long-term (thousands of tiny partitions
   * otherwise grow listing cost and band-join file counts without bound;
   * the reference runs the same end-of-run compaction discipline,
   * ST8: matomo2clickhouse.py:756).
   *
   * Contract: run BETWEEN ingest runs (stream stopped, all batches
   * committed) — the same quiesced-maintenance contract as
   * [[graft.maintain.Maintain]], now ENFORCED by [[IngestLock]]: a
   * compaction attempted while an ingest batch holds the corpus lock (or
   * vice versa) throws [[IngestLock.LockHeldException]] instead of
   * interleaving with the multi-table writes. A batch replayed AFTER its
   * rows were compacted converges (its docs reject as exact dups of the
   * compacted index; the checkpoint guarantees committed batches never
   * replay), which is exactly why the contract requires commit-quiescence
   * only for in-flight writes, not history. Each table swaps atomically
   * (write-new-then-rename, the [[StateStore]] discipline), so a crash
   * mid-compaction leaves every table either fully old or fully new,
   * never doubled.
   */
  def compact(spark: SparkSession, cfg: IngestConfig): Unit =
    IngestLock.withLock(spark, cfg.corpusRoot,
        s"compact-${java.util.UUID.randomUUID()}", cfg.lockStaleMs) { lock =>
    val fs = new org.apache.hadoop.fs.Path(cfg.corpusRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // mark the high-water batch id FIRST (see [[markCompactionHwm]]) so a
    // pre-compaction replay can never silently duplicate folded rows
    markCompactionHwm(fs, cfg.corpusRoot,
      ledgerMaxBatch(spark, ledgerPath(cfg)))
    // the ledger stays per-batch: its ingest_batch is the AUDIT key, not
    // provenance, and one row per batch never needs compaction. Every
    // fold rewrites a DIFFERENT table, so they run on the bounded pool —
    // one heartbeat fronts the group (the folds now finish well inside
    // the staleness window precisely because they overlap). The additive
    // stat tables fold FURTHER than a partition concat: their rows are
    // provenance-free and only ever SUMMED by the read faces, so the
    // compacted form is the aggregate itself — docstats to its one summed
    // row, the MG vocabulary summaries to one summed counter per word
    // (sound: the n/(k+1) bound is additive, see
    // [[graft.text.HeavyHitters.mgSummary]]) — state stays O(1)/O(vocab)
    // forever instead of growing a row set per historical batch
    IngestLock.heartbeat(spark, lock)
    // probe-key-sorted fold layouts (the buildRegistryState labels
    // precedent): the ingest probes push cap-bounded IN filters into the
    // hashes (by text_hash) and sets (by doc_id) scans, and [[search]]
    // pushes the query terms into postings (by word) — range-sorting each
    // fold by its probe key gives every file tight min/max stats, so the
    // pushed filters prune row groups instead of merely post-filtering a
    // corpus-sized scan. Correctness is untouched: a fold reorders rows,
    // never changes them.
    def sortedBy(c: String): DataFrame => DataFrame =
      df => df.repartitionByRange(col(c)).sortWithinPartitions(col(c))
    // MaintStages wraps run INSIDE each unit body, so a unit's line times
    // its own fold, not its wait in the pool queue; the folds overlap, so
    // the lines name the heaviest STAGE, not a wall-clock decomposition
    parallelUnits(
      Seq(docsPath(cfg) -> identity[DataFrame] _,
        hashesPath(cfg) -> sortedBy("text_hash"),
        bandsPath(cfg) -> sortedBy("sig"),
        setsPath(cfg) -> sortedBy("doc_id"),
        postingsPath(cfg) -> sortedBy("word"),
        phashPath(cfg) -> sortedBy("v"))
        .map { case (dir, layout) =>
          () => MaintStages("compact_text",
            s"fold_${dir.split('/').last}") {
            foldBatchPartitions(spark, fs, dir, layout)
          } } ++ Seq(
        () => MaintStages("compact_text", "fold_docstats") {
          foldAggregated(spark, fs, docstatsPath(cfg)) { df =>
            df.agg(coalesce(sum(col("n_docs")), lit(0L)).as("n_docs"),
              coalesce(sum(col("dl_sum")), lit(0L)).as("dl_sum"))
          }
        },
        () => MaintStages("compact_text", "fold_mg") {
          foldAggregated(spark, fs, mgPath(cfg)) { df =>
            df.groupBy(col("word")).agg(sum(col("cnt")).as("cnt"))
          }
        }))
  }

  /** Fold a per-batch ADDITIVE table into its aggregate under
    * `ingest_batch = -1`, same atomic-swap + rollback discipline as
    * [[foldBatchPartitions]]. `agg` must not read `ingest_batch` (the
    * fold re-stamps it). */
  private[stream] def foldAggregated(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, dir: String)(
      agg: DataFrame => DataFrame): Unit = {
    rollbackIfStranded(fs, dir)
    val path = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(path)) return
    val readable =
      try { spark.read.parquet(dir).schema; true }
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") => false
      }
    if (readable) {
      val folded = agg(spark.read.parquet(dir))
        .withColumn("ingest_batch", lit(-1L))
        .localCheckpoint() // sever lineage: the swap deletes what it reads
      val tmp = new org.apache.hadoop.fs.Path(dir + ".__next")
      val old = new org.apache.hadoop.fs.Path(dir + ".__old")
      if (fs.exists(tmp)) fs.delete(tmp, true)
      folded.write.partitionBy("ingest_batch").parquet(tmp.toString)
      if (fs.exists(old)) fs.delete(old, true)
      require(fs.rename(path, old), s"fold swap-out failed: $dir")
      require(fs.rename(tmp, path), s"fold swap-in failed: $dir")
      fs.delete(old, true)
    }
  }

  /** Fold one table's per-batch partitions into `ingest_batch = -1` with an
    * atomic write-new-then-rename swap — the per-dir step of [[compact]]
    * and [[EmbeddingIngest.compact]]. A crash mid-swap leaves the table
    * either fully old (recovered by [[rollbackIfStranded]]) or fully new,
    * never doubled. */
  /** Atomically replace `dir` with `df` via the same .__next/.__old swap
    * discipline as [[foldBatchPartitions]] (and the same
    * [[rollbackIfStranded]] recovery). The caller guarantees `df` does not
    * READ `dir` — here the swap deletes what the plan would re-scan. */
  private[stream] def swapWrite(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, df: org.apache.spark.sql.DataFrame,
      partitionCols: Seq[String] = Nil): Unit = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val tmp = new org.apache.hadoop.fs.Path(dir + ".__next")
    val old = new org.apache.hadoop.fs.Path(dir + ".__old")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    val w = df.write
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(tmp.toString)
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(path))
      require(fs.rename(path, old), s"swap-out failed: $dir")
    require(fs.rename(tmp, path), s"swap-in failed: $dir")
    fs.delete(old, true)
  }

  private[stream] def foldBatchPartitions(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, dir: String,
      layout: DataFrame => DataFrame = identity): Unit = {
    rollbackIfStranded(fs, dir) // a prior compaction may have died mid-swap
    val path = new org.apache.hadoop.fs.Path(dir)
    // a table that never wrote (a root created before its layer existed)
    // has nothing to fold — and reading a missing path would throw a
    // PATH_NOT_FOUND the schema-inference catch below does not cover
    if (!fs.exists(path)) return
    // an empty-batch run can leave a partition-less dir: nothing to fold.
    // ONLY the schema-inference failure of a partition-less dir means
    // "skip" (mirroring readOrEmpty) — any other analysis error (corrupt
    // footer, conflicting schema) must fail the compaction, not silently
    // no-op it
    val readable =
      try { spark.read.parquet(dir).schema; true }
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") => false
      }
    if (fs.exists(path) && readable) {
      // `layout` lets a caller impose a physical order on the folded rows
      // (e.g. range-sort assignment tables by centroid_id so the serve
      // faces' pushed IN predicates skip row groups)
      val compacted = layout(spark.read.parquet(dir))
        .withColumn("ingest_batch", lit(-1L))
        .localCheckpoint() // sever lineage: the swap deletes what it reads
      val tmp = new org.apache.hadoop.fs.Path(dir + ".__next")
      val old = new org.apache.hadoop.fs.Path(dir + ".__old")
      if (fs.exists(tmp)) fs.delete(tmp, true)
      compacted.write.partitionBy("ingest_batch").parquet(tmp.toString)
      if (fs.exists(old)) fs.delete(old, true)
      require(fs.rename(path, old), s"compact swap-out failed: $dir")
      require(fs.rename(tmp, path), s"compact swap-in failed: $dir")
      fs.delete(old, true)
      // no unpersist: localCheckpoint blocks live outside the
      // CacheManager (Dataset.unpersist would be a no-op on them) and
      // are reclaimed by the ContextCleaner once unreferenced
    }
  }

  /** Start the continuous ingest (AvailableNow: drain pending files, stop —
    * the reference's budgeted-run cadence, ST1). */
  def start(spark: SparkSession, cfg: IngestConfig): StreamingQuery =
    spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", cfg.maxFilesPerTrigger)
      .parquet(cfg.docsDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(spark, cfg, batch, batchId): Unit
      }
      .start()
}
