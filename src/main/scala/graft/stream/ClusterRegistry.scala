package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.Caching
import graft.text.{TextOps, UnionFind}

/**
 * Streaming near-dup CLUSTER LABELING — the keep-everything sibling of
 * [[CorpusIngest]]: where the ingest pipeline REJECTS near-duplicates,
 * this registry admits every document and maintains its cluster label
 * incrementally, so downstream consumers can make their own per-cluster
 * decisions (keep-best by quality, dedup-aware sampling weights,
 * contamination tracing) without ever recomputing connected components
 * over the full corpus. The reference keeps the same duality: rows are
 * never dropped at apply time — the J1/J2 latest-record and duplicate
 * views interpret the full appended history (doc_old_duplicates.md,
 * script_create_clickhouse_table.sql's versioned table).
 *
 * State tables under `root`, all partitioned by `ingest_batch` and only
 * ever appended (same at-least-once dynamic-partition-overwrite replay
 * discipline as [[CorpusIngest.ingestBatch]]):
 *
 *  - `bands/`, `sets/` — the corpus MinHash signature index (identical
 *    schema to [[CorpusIngest]]'s), probed by each arriving batch;
 *  - `labels/` — (doc_id, label): the label assigned when the doc's batch
 *    arrived — never rewritten by later batches;
 *  - `merges/` — (child, parent): the union-find log; appended when a
 *    batch bridges existing clusters ([[graft.text.UnionFind]]);
 *  - `ledger/` — (ingest_batch, n_in, n_pairs, n_merges) audit rows.
 *
 * Per-batch cost is O(batch + candidate join + touched clusters); the
 * corpus-sized tables are appended to, never re-shuffled — the property
 * that makes cluster maintenance viable at 100 TB, where the batch
 * alternative ([[TextOps.connectedComponents]] over all pairs) re-runs a
 * multi-round all-corpus shuffle per refresh. Serving
 * ([[resolvedLabels]], [[sameCluster]]) is read-only and lock-free.
 */
object ClusterRegistry {

  final case class RegistryConfig(
      /** Streaming source dir of incoming docs (parquet: doc_id, text). */
      docsDir: String,
      /** Root of the registry: bands/, sets/, labels/, merges/, ledger/. */
      root: String,
      checkpointDir: String,
      threshold: Double = 0.8,
      maxFilesPerTrigger: Int = 20,
      /** [[IngestLock]] staleness window (see [[CorpusIngest]]). */
      lockStaleMs: Long = 30 * 60 * 1000L)

  private def bandsPath(cfg: RegistryConfig) = s"${cfg.root}/bands"
  private def setsPath(cfg: RegistryConfig) = s"${cfg.root}/sets"
  private def labelsPath(cfg: RegistryConfig) = s"${cfg.root}/labels"
  private def mergesPath(cfg: RegistryConfig) = s"${cfg.root}/merges"
  def ledgerPath(cfg: RegistryConfig): String = s"${cfg.root}/ledger"

  private val bandsDdl = "doc_id BIGINT, band INT, sig STRING, ingest_batch BIGINT"
  private val setsDdl = "doc_id BIGINT, s ARRAY<BIGINT>, n BIGINT, ingest_batch BIGINT"
  private val labelsDdl = "doc_id BIGINT, label BIGINT, ingest_batch BIGINT"
  private val mergesDdl = "child BIGINT, parent BIGINT, ingest_batch BIGINT"

  /** Stable lock owner per batch — replay-stable like
    * [[CorpusIngest.batchLockOwner]]. */
  def batchLockOwner(cfg: RegistryConfig, batchId: Long): String =
    s"cluster-batch-$batchId@${cfg.checkpointDir}"

  /**
   * Label one batch; returns the number of docs labeled. The increment:
   * build the batch's signatures ONCE, probe the persisted index for
   * batch↔corpus pairs, self-join the batch bands for within-batch pairs,
   * then [[UnionFind.increment]] turns the pair evidence into appended
   * label rows and merge-log rows. All reads exclude the batch's own
   * partitions, so an at-least-once replay recomputes — and dynamically
   * overwrites — identical rows.
   */
  def ingestBatch(spark: SparkSession, cfg: RegistryConfig, batch: DataFrame,
      batchId: Long): Long = IngestLock.withLock(spark, cfg.root,
      batchLockOwner(cfg, batchId), cfg.lockStaleMs) { lock =>
    val fs = new org.apache.hadoop.fs.Path(cfg.root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(bandsPath(cfg), setsPath(cfg), labelsPath(cfg), mergesPath(cfg),
      ledgerPath(cfg)).foreach(CorpusIngest.rollbackIfStranded(fs, _))
    // dynamic overwrite on every session whose conf the writes may consult
    // (the batch frame may belong to foreachBatch's cloned session)
    val sessions = Set(spark, batch.sparkSession)
    val prevConf = sessions.map(s =>
      s -> s.conf.get("spark.sql.sources.partitionOverwriteMode", "static")).toMap
    sessions.foreach(_.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic"))
    try Caching.scope {
      def idx(path: String, ddl: String) =
        CorpusIngest.readOrEmpty(spark, path, ddl)
          .filter(col("ingest_batch") =!= batchId)

      val docs = Caching.scoped(batch.select(col("doc_id"), col("text")))
      // ONE signature build: the index probe, the within-batch pair join,
      // and the index append all read these two cached frames
      val (bb, bs) = TextOps.minhashIndex(docs, "doc_id", "text")
      val batchBands = Caching.scoped(bb)
      val batchSets = Caching.scoped(bs)
      val crossPairs = TextOps.minhashProbeIndexed(
        idx(bandsPath(cfg), bandsDdl), idx(setsPath(cfg), setsDdl),
        batchBands, batchSets, cfg.threshold)
      val batchPairs = TextOps.minhashNearDupsIndexed(batchBands, batchSets,
        cfg.threshold)
      val (newLabels, newMerges) = UnionFind.increment(
        idx(labelsPath(cfg), labelsDdl), idx(mergesPath(cfg), mergesDdl),
        docs.select(col("doc_id")), batchPairs, crossPairs)
      // the pair computation may outlive the staleness window on a huge
      // batch; refresh BEFORE the first state write
      IngestLock.heartbeat(spark, lock)
      val stamp = lit(batchId).as("ingest_batch")
      batchBands.select(col("doc_id"), col("band"), col("sig"), stamp)
        .write.mode("overwrite").partitionBy("ingest_batch").parquet(bandsPath(cfg))
      batchSets.select(col("doc_id"), col("s"), col("n"), stamp)
        .write.mode("overwrite").partitionBy("ingest_batch").parquet(setsPath(cfg))
      newLabels.select(col("doc_id"), col("label"), stamp)
        .write.mode("overwrite").partitionBy("ingest_batch").parquet(labelsPath(cfg))
      val mergesOut = Caching.scoped(newMerges)
      mergesOut.select(col("child"), col("parent"), stamp)
        .write.mode("overwrite").partitionBy("ingest_batch").parquet(mergesPath(cfg))
      val nIn = docs.count()
      val nPairs = crossPairs.count() + batchPairs.count()
      val nMerges = mergesOut.count()
      spark.createDataFrame(Seq((batchId, nIn, nPairs, nMerges)))
        .toDF("ingest_batch", "n_in", "n_pairs", "n_merges")
        .write.mode("overwrite").partitionBy("ingest_batch").parquet(ledgerPath(cfg))
      nIn
    } finally {
      prevConf.foreach { case (s, v) =>
        s.conf.set("spark.sql.sources.partitionOverwriteMode", v) }
    }
  }

  /** Current cluster label of every registered doc — the read-only serving
    * face: `labels` joined once against the root-resolved merge log
    * ([[UnionFind.resolveLabels]]). Lock-free; reads through stranded
    * compactions via [[CorpusIngest.readOrEmptyRO]]. */
  def resolvedLabels(spark: SparkSession, cfg: RegistryConfig): DataFrame =
    UnionFind.resolveLabels(
      CorpusIngest.readOrEmptyRO(spark, labelsPath(cfg), labelsDdl),
      CorpusIngest.readOrEmptyRO(spark, mergesPath(cfg), mergesDdl))

  /** Pairwise same-cluster check for a list of (a, b) doc-id probes — the
    * lookup face a sampling or eval pipeline asks per pair. Two joins of
    * the (small) probe frame against the resolved labels. */
  def sameCluster(spark: SparkSession, cfg: RegistryConfig,
      probes: DataFrame): DataFrame = {
    val lab = Caching.scoped(resolvedLabels(spark, cfg))
    probes.select(col("a"), col("b"))
      .join(lab.select(col("doc_id").as("a"), col("label").as("la")), Seq("a"), "left")
      .join(lab.select(col("doc_id").as("b"), col("label").as("lb")), Seq("b"), "left")
      .select(col("a"), col("b"),
        (col("la").isNotNull && col("la") === col("lb")).as("same_cluster"))
  }

  /**
   * Fold the registry: signature tables concatenate into the `-1`
   * partition ([[CorpusIngest.foldBatchPartitions]]); `labels` folds to
   * its RESOLVED form and `merges` then truncates to empty — union-find
   * path compression as a maintenance job, resetting the resolution chain
   * depth to zero. Ordering is crash-safe: resolved labels + a stale
   * merge log still resolve correctly (a resolved label is a root, and a
   * root never appears as a merge child — re-applying the log is a
   * no-op), so a crash between the two swaps loses nothing and re-running
   * [[compact]] completes the truncation. Same quiesced-maintenance
   * contract as [[CorpusIngest.compact]], enforced by the same lock.
   */
  def compact(spark: SparkSession, cfg: RegistryConfig): Unit =
    IngestLock.withLock(spark, cfg.root,
        s"cluster-compact-${java.util.UUID.randomUUID()}", cfg.lockStaleMs) { lock =>
      val fs = new org.apache.hadoop.fs.Path(cfg.root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      Seq(bandsPath(cfg), setsPath(cfg)).foreach { dir =>
        IngestLock.heartbeat(spark, lock)
        CorpusIngest.foldBatchPartitions(spark, fs, dir)
      }
      IngestLock.heartbeat(spark, lock)
      CorpusIngest.rollbackIfStranded(fs, labelsPath(cfg))
      CorpusIngest.rollbackIfStranded(fs, mergesPath(cfg))
      val resolved = resolvedLabels(spark, cfg)
        .withColumn("ingest_batch", lit(-1L))
        .localCheckpoint() // sever lineage: the swap deletes what it reads
      CorpusIngest.swapWrite(fs, labelsPath(cfg), resolved, Seq("ingest_batch"))
      IngestLock.heartbeat(spark, lock)
      val emptyMerges = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(mergesDdl))
      CorpusIngest.swapWrite(fs, mergesPath(cfg), emptyMerges, Seq("ingest_batch"))
    }

  /** Start the continuous labeling stream (AvailableNow — the reference's
    * budgeted-run cadence, ST1; same wiring as [[CorpusIngest.start]]). */
  def start(spark: SparkSession, cfg: RegistryConfig): StreamingQuery =
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
