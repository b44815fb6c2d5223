package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class EmbeddingIngestSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-embed-ingest").toString

  // cos(base, nearBase) ≈ 0.99995 — far above the 0.4 threshold and close
  // enough that the deterministic SRP signatures collide in every band;
  // cos(base, orth) = 0 — below threshold even when bands collide
  private val base = Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)
  private val nearBase = Seq(1f, 0.01f, 0f, 0f, 0f, 0f, 0f, 0f)
  private val orth = Seq(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f)
  private val other = Seq(0f, 0f, 1f, 1f, 0f, 0f, 0f, 0f)

  private def vecs(rows: (Long, Seq[Float])*): DataFrame =
    rows.toDF("vec_id", "embedding")

  private def writeVecs(dir: String, name: String, rows: (Long, Seq[Float])*): Unit = {
    val staging = tmpDir()
    vecs(rows: _*).coalesce(1).write.mode("overwrite").parquet(staging)
    val part = new java.io.File(staging).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(dir, name))
  }

  private def acceptedIds(cfg: EmbeddingIngest.IngestConfig): Set[Long] =
    spark.read.parquet(EmbeddingIngest.vecsPath(cfg))
      .select("vec_id").as[Long].collect().toSet

  test("e2e: within-batch and cross-batch near-dup vectors are rejected; resume works") {
    val src = tmpDir(); val root = tmpDir(); val ckpt = tmpDir()
    val cfg = EmbeddingIngest.IngestConfig(src, root, ckpt)
    // batch 1: v1 base, v2 near-dup of v1 (within-batch reject, min id
    // canonical), v3 orthogonal (accept even if bands collide: cos 0 < 0.4)
    writeVecs(src, "f1.parquet", 1L -> base, 2L -> nearBase, 3L -> orth)
    EmbeddingIngest.start(spark, cfg).awaitTermination()
    assert(acceptedIds(cfg) == Set(1L, 3L))

    // batch 2 (resumed checkpoint): v4 = near-dup of the ALREADY-INGESTED v1
    // (must be caught by the PERSISTED index probe), v5 fresh
    writeVecs(src, "f2.parquet", 4L -> nearBase, 5L -> other)
    EmbeddingIngest.start(spark, cfg).awaitTermination()
    assert(acceptedIds(cfg) == Set(1L, 3L, 5L))

    // ledger: one row per batch with observed counts
    val ledger = spark.read.parquet(EmbeddingIngest.ledgerPath(cfg))
      .select("ingest_batch", "n_in", "n_accepted")
      .as[(Long, Long, Long)].collect().map { case (b, n, a) => b -> ((n, a)) }.toMap
    assert(ledger(0L) == ((3L, 2L)) && ledger(1L) == ((2L, 1L)))
  }

  test("replaying a batch converges: identical accepted set, no duplicate rows") {
    val root = tmpDir()
    val cfg = EmbeddingIngest.IngestConfig("unused", root, "ckpt-E")
    val b0 = vecs(1L -> base, 2L -> nearBase, 3L -> orth)
    assert(EmbeddingIngest.ingestBatch(spark, cfg, b0, 0L) == 2L)
    // crash-replay of batch 0: its own prior output is excluded from the
    // index it probes, so decisions repeat and the partition rewrite is
    // byte-identical — never a self-collision that rejects everything
    assert(EmbeddingIngest.ingestBatch(spark, cfg, b0, 0L) == 2L)
    assert(acceptedIds(cfg) == Set(1L, 3L))
    assert(spark.read.parquet(EmbeddingIngest.vecsPath(cfg)).count() == 2L)
    // a LATER batch still probes batch 0's index
    assert(EmbeddingIngest.ingestBatch(spark, cfg, vecs(10L -> base), 1L) == 0L)
  }

  test("compact folds index partitions; dedup against compacted history still works") {
    val root = tmpDir()
    val cfg = EmbeddingIngest.IngestConfig("unused", root, "ckpt-C")
    EmbeddingIngest.ingestBatch(spark, cfg, vecs(1L -> base), 0L)
    EmbeddingIngest.ingestBatch(spark, cfg, vecs(2L -> other), 1L)
    EmbeddingIngest.compact(spark, cfg)
    val stored = spark.read.parquet(EmbeddingIngest.vecsPath(cfg))
    assert(stored.select("ingest_batch").distinct().as[Long].collect().toSeq == Seq(-1L))
    assert(stored.select("vec_id").as[Long].collect().toSet == Set(1L, 2L))
    // post-compaction: near-dup of v1 rejected by the folded index, fresh accepted
    assert(EmbeddingIngest.ingestBatch(spark, cfg,
      vecs(10L -> nearBase, 11L -> orth), 2L) == 1L)
    assert(acceptedIds(cfg) == Set(1L, 2L, 11L))
  }

  test("IVF layer: codebook freezes at first eligible batch with backfill; " +
      "later eligible ids never re-train; search serves the persisted index") {
    val dirE = Seq(0f, 0f, 0f, 0f, 1f, 0f, 0f, 0f) // orthogonal to all fixtures
    val root = tmpDir()
    val cfg = EmbeddingIngest.IngestConfig("unused", root, "ckpt-IVF",
      centroidMod = 5)
    // batch 0: no id % 5 == 0 — no codebook yet; search is empty, not a crash
    EmbeddingIngest.ingestBatch(spark, cfg, vecs(1L -> base, 3L -> orth), 0L)
    assert(!new java.io.File(root, "centroids").exists())
    assert(EmbeddingIngest.search(spark, cfg, vecs(100L -> nearBase)).count() == 0L)
    // batch 1: id 5 is eligible — freeze NOW and backfill batches 0's vecs
    EmbeddingIngest.ingestBatch(spark, cfg, vecs(5L -> other), 1L)
    assert(spark.read.parquet(EmbeddingIngest.centroidsPath(cfg))
      .select("centroid_id").as[Long].collect().toSet == Set(5L))
    assert(spark.read.parquet(EmbeddingIngest.ivfPath(cfg))
      .select("vec_id").as[Long].collect().toSet == Set(1L, 3L, 5L))
    // batch 2: id 10 is eligible but arrives POST-freeze — bucket member,
    // never a centroid
    EmbeddingIngest.ingestBatch(spark, cfg, vecs(10L -> dirE), 2L)
    assert(spark.read.parquet(EmbeddingIngest.centroidsPath(cfg))
      .select("centroid_id").as[Long].collect().toSet == Set(5L))
    assert(spark.read.parquet(EmbeddingIngest.ivfPath(cfg))
      .select("vec_id").as[Long].collect().toSet == Set(1L, 3L, 5L, 10L))
    // read-only search: nearest to a base-direction probe is vec 1
    val top = EmbeddingIngest.search(spark, cfg, vecs(100L -> nearBase), k = 2)
      .as[(Long, Long, Int)].collect().sortBy(_._3)
    assert(top.head == ((100L, 1L, 1)))
    // compact folds the assignment partitions; search still serves
    EmbeddingIngest.compact(spark, cfg)
    assert(spark.read.parquet(EmbeddingIngest.ivfPath(cfg))
      .select("ingest_batch").distinct().as[Long].collect().toSeq == Seq(-1L))
    val topAfter = EmbeddingIngest.search(spark, cfg, vecs(100L -> nearBase), k = 2)
      .as[(Long, Long, Int)].collect().sortBy(_._3)
    assert(topAfter.toSeq == top.toSeq)
  }

  test("IVF layer: a replayed freeze batch rewrites codebook and assignments identically") {
    val root = tmpDir()
    val cfg = EmbeddingIngest.IngestConfig("unused", root, "ckpt-IVF-R",
      centroidMod = 5)
    EmbeddingIngest.ingestBatch(spark, cfg, vecs(5L -> base, 7L -> orth), 0L)
    def state() = (
      spark.read.parquet(EmbeddingIngest.centroidsPath(cfg))
        .select("centroid_id", "frozen_batch").as[(Long, Long)].collect().toSeq.sorted,
      spark.read.parquet(EmbeddingIngest.ivfPath(cfg))
        .select("vec_id", "centroid_id").as[(Long, Long)].collect().toSeq.sorted)
    val before = state()
    // crash-replay of the freeze batch: its own frozen rows are excluded
    // from the codebook it reads, so the freeze re-runs deterministically
    EmbeddingIngest.ingestBatch(spark, cfg, vecs(5L -> base, 7L -> orth), 0L)
    assert(state() == before)
    assert(before._1 == Seq((5L, 0L)) && before._2 == Seq((5L, 5L), (7L, 5L)))
  }

  test("filtered search: the allowed-id set prunes candidates and top-k refills from it") {
    val root = tmpDir()
    // threshold > 1: these fixture vectors cluster, so disable dedup
    val cfg = EmbeddingIngest.IngestConfig("unused", root, "ckpt-F",
      centroidMod = 5, threshold = 2.0)
    // one bucket (centroid 5); vectors 1, 2, 5 near base, 3 orthogonal
    val near2 = Seq(1f, 0.02f, 0f, 0f, 0f, 0f, 0f, 0f)
    EmbeddingIngest.ingestBatch(spark, cfg,
      vecs(1L -> base, 2L -> near2, 3L -> orth, 5L -> nearBase), 0L)
    val probes = vecs(100L -> base)
    val unrestricted = EmbeddingIngest.search(spark, cfg, probes, k = 2)
      .select("neighbor_id").as[Long].collect().toSet
    assert(unrestricted == Set(1L, 5L), s"got $unrestricted")
    // restrict to {2, 3}: the former top hits are pruned BEFORE scoring and
    // k refills from the allowed set — a post-filter of `unrestricted`
    // would return nothing allowed at all
    val allowed = Seq(2L, 3L).toDF("vec_id")
    val filtered = EmbeddingIngest.search(spark, cfg, probes, k = 2,
        allowed = Some(allowed))
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toMap
    assert(filtered == Map(2L -> 1, 3L -> 2), s"got $filtered")
    graft.Caching.releaseAll()
  }

  test("probe reports near-dups read-only: no state change, no lock") {
    val root = tmpDir()
    val cfg = EmbeddingIngest.IngestConfig("unused", root, "ckpt-P")
    EmbeddingIngest.ingestBatch(spark, cfg, vecs(1L -> base), 0L)
    val hits = EmbeddingIngest.probe(spark, cfg,
      vecs(10L -> nearBase, 11L -> orth))
      .select("vec_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(hits == Set((10L, 1L)))
    assert(acceptedIds(cfg) == Set(1L))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "__ingest.lock")))
    graft.Caching.releaseAll()
  }

  test("an empty first batch leaves readable state for the next batch") {
    val root = tmpDir()
    val cfg = EmbeddingIngest.IngestConfig("unused", root, "ckpt-0")
    // batch 0 carries no rows: writes create bare dirs — the next batch
    // must still read them as empty index state, not crash
    val emptyBatch = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(EmbeddingIngest.ingestBatch(spark, cfg, emptyBatch, 0L) == 0L)
    assert(EmbeddingIngest.ingestBatch(spark, cfg, vecs(1L -> base), 1L) == 1L)
    assert(acceptedIds(cfg) == Set(1L))
  }

  test("ingest and compact serialize on the corpus lock; same-batch restart is reentrant") {
    val root = tmpDir()
    val cfg = EmbeddingIngest.IngestConfig("unused", root, "ckpt-L")
    EmbeddingIngest.ingestBatch(spark, cfg, vecs(1L -> base), 0L)
    // an in-flight foreign holder: both mutators refuse
    val held = IngestLock.acquire(spark, root, "in-flight", cfg.lockStaleMs)
    intercept[IngestLock.LockHeldException] { EmbeddingIngest.compact(spark, cfg) }
    intercept[IngestLock.LockHeldException] {
      EmbeddingIngest.ingestBatch(spark, cfg, vecs(2L -> other), 1L)
    }
    IngestLock.release(spark, held)
    // a crashed incarnation of batch 1's OWN lock does not block its restart
    IngestLock.acquire(spark, root,
      EmbeddingIngest.batchLockOwner(cfg, 1L), cfg.lockStaleMs)
    assert(EmbeddingIngest.ingestBatch(spark, cfg, vecs(2L -> other), 1L) == 1L)
    assert(acceptedIds(cfg) == Set(1L, 2L))
  }
}
