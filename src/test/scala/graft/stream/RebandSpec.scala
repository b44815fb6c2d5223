package graft.stream

import graft.SparkSpec
import graft.ml.VectorOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * [[EmbeddingIngest.reband]] — re-signing the SRP near-dup index at a new
 * width (the occupancy-constant discipline's maintenance op). The standing
 * contract under test: the signature width is ROOT STATE carried by the
 * width marker, so every face — index rows, batch signatures, probes,
 * compaction folds — agrees on it at all times, across crashes.
 *
 * The oracle for every pin: the persisted vectors re-signed IN SESSION at
 * the expected width ([[VectorOps.srpProbe]]) — a rebanded root must serve
 * exactly what a direct computation over its accepted vectors serves.
 */
class RebandSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-reband").toString

  private def fsOf(root: String) = new org.apache.hadoop.fs.Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Deterministic dim-8 vectors; every `dupEvery`-th id an exact copy of
    * (id − dupBack) — cos 1.0, a certain near-dup at any width. */
  private def vecs(from: Long, n: Long, dupEvery: Int = 0,
      dupBack: Long = 0L): DataFrame =
    spark.range(from, from + n).select(col("id").as("vec_id"),
      (if (dupEvery > 0)
        when(pmod(col("id"), lit(dupEvery)) === 0, col("id") - dupBack)
          .otherwise(col("id"))
      else col("id")).as("seed"))
      .withColumn("embedding", expr(
        """transform(sequence(0, 7),
          |  j -> cast((pmod(hash(seed * 8 + j), 2001) - 1000) / 1000.0
          |            as float))""".stripMargin))
      .drop("seed")

  private def corpusVecs(cfg: EmbeddingIngest.IngestConfig): DataFrame =
    spark.read.parquet(EmbeddingIngest.vecsPath(cfg))
      .select(col("vec_id"), col("embedding"))

  /** In-session truth at a given width: the persisted vectors re-signed
    * directly, probed by the same batch. */
  private def twinProbe(cfg: EmbeddingIngest.IngestConfig, batch: DataFrame,
      bits: Int, bandBits: Int): Seq[(Long, Long)] = {
    val got = VectorOps.srpProbe(corpusVecs(cfg), batch,
        bits = bits, bandBits = bandBits, threshold = cfg.threshold)
      .select(col("batch_id"), col("corpus_id"))
      .as[(Long, Long)].collect().toSeq.sorted
    graft.Caching.releaseAll()
    got
  }

  private def servedProbe(cfg: EmbeddingIngest.IngestConfig,
      batch: DataFrame): Seq[(Long, Long)] = {
    val got = EmbeddingIngest.probe(spark, cfg, batch)
      .select(col("vec_id"), col("corpus_id"))
      .as[(Long, Long)].collect().toSeq.sorted
    graft.Caching.releaseAll()
    got
  }

  private def bandsDirs(root: String): Seq[String] = {
    val fs = fsOf(root)
    fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.getName).filter(_.matches("bands(_w\\d+x\\d+)?")).toSeq.sorted
  }

  test("reband re-signs the index; probes, post-reband ingest, replays, " +
      "compact folds, and the sweep all honor the marker width") {
    val root = tmpDir()
    val cfg = EmbeddingIngest.IngestConfig("unused", root, "ck-reband1",
      centroidMod = 5)
    EmbeddingIngest.ingestBatch(spark, cfg, vecs(0L, 60L), 0L)
    EmbeddingIngest.ingestBatch(spark, cfg, vecs(60L, 60L, 10, 60L), 1L)
    val batch = vecs(200L, 30L, 5, 200L - 7L) // some exact copies of corpus ids
    assert(servedProbe(cfg, batch) == twinProbe(cfg, batch, 16, 4),
      "pre-reband probe diverged from the in-session 16/4 twin")

    EmbeddingIngest.reband(spark, cfg, bits = 32, bandBits = 8)
    val after = servedProbe(cfg, batch)
    assert(after == twinProbe(cfg, batch, 32, 8),
      "rebanded probe diverged from the in-session 32/8 twin")
    assert(after.nonEmpty, "the exact-copy probes must still hit at 32/8")

    // pre-hwm replay refuses: the rebanded table subsumed those batches
    intercept[IllegalArgumentException] {
      EmbeddingIngest.ingestBatch(spark, cfg, vecs(0L, 60L), 0L)
    }
    // a post-reband batch signs at the MARKER width: its exact copies of
    // accepted corpus content must be rejected (a width mismatch would
    // miss every candidate and silently accept them)
    val before = corpusVecs(cfg).count()
    val accepted = EmbeddingIngest.ingestBatch(spark, cfg,
      vecs(300L, 30L, 3, 300L - 13L), 2L)
    assert(accepted < 30L,
      "planted exact copies were accepted — the batch was signed at a " +
        "width other than the index's")
    assert(corpusVecs(cfg).count() == before + accepted)
    assert(servedProbe(cfg, batch) == twinProbe(cfg, batch, 32, 8),
      "post-reband ingest broke the width agreement")

    // compact folds the REBANDED directory and the serve is unchanged
    EmbeddingIngest.compact(spark, cfg)
    assert(servedProbe(cfg, batch) == twinProbe(cfg, batch, 32, 8),
      "compact over a rebanded root changed the probe answer")
    val folded = spark.read.parquet(s"$root/bands_w32x8")
      .select(col("ingest_batch")).distinct().as[Long].collect().toSeq
    assert(folded == Seq(-1L), s"rebanded bands not folded: $folded")

    // sweep is deferred ONE cadence (see the reband crash contract): the
    // second reband sweeps what the FIRST superseded (the legacy bands/),
    // while its own predecessor survives until the next pass
    EmbeddingIngest.reband(spark, cfg, bits = 48, bandBits = 12)
    assert(bandsDirs(root) == Seq("bands_w32x8", "bands_w48x12"),
      s"sweep cadence broken: ${bandsDirs(root)}")
    assert(servedProbe(cfg, batch) == twinProbe(cfg, batch, 48, 12))
    EmbeddingIngest.reband(spark, cfg, bits = 32, bandBits = 8)
    assert(bandsDirs(root) == Seq("bands_w32x8", "bands_w48x12"),
      s"sweep cadence broken after the third pass: ${bandsDirs(root)}")
    assert(servedProbe(cfg, batch) == twinProbe(cfg, batch, 32, 8))
    graft.Caching.releaseAll()
  }

  test("crash states: a stranded marker swap serves through .__old; a " +
      "die-before-marker run leaves the old width serving; re-running " +
      "reband is the repair") {
    val root = tmpDir()
    val cfg = EmbeddingIngest.IngestConfig("unused", root, "ck-reband2",
      centroidMod = 5)
    EmbeddingIngest.ingestBatch(spark, cfg, vecs(0L, 80L), 0L)
    val batch = vecs(500L, 20L, 4, 500L - 3L)
    EmbeddingIngest.reband(spark, cfg, bits = 32, bandBits = 8)

    // stranded marker swap (died between the marker's two renames):
    // readOrEmptyRO reads through .__old — still the committed new width
    val fs = fsOf(root)
    val mp = new org.apache.hadoop.fs.Path(EmbeddingIngest.bandWidthPath(cfg))
    assert(fs.rename(mp, new org.apache.hadoop.fs.Path(mp.toString + ".__old")))
    assert(servedProbe(cfg, batch) == twinProbe(cfg, batch, 32, 8),
      "a stranded marker swap broke the probe")
    // the next ingest rolls the marker back and stays coherent
    EmbeddingIngest.ingestBatch(spark, cfg, vecs(600L, 20L), 1L)
    assert(servedProbe(cfg, batch) == twinProbe(cfg, batch, 32, 8))

    // die-before-marker: a new-width directory exists but the marker was
    // never swapped — faces must keep serving the complete COMMITTED dir
    val stray = VectorOps.srpIndex(corpusVecs(cfg), bits = 48, bandBits = 12)
      ._1.select(col("vec_id"), col("band"), col("bv"),
        lit(-1L).as("ingest_batch"))
    stray.write.partitionBy("ingest_batch").parquet(s"$root/bands_w48x12")
    assert(servedProbe(cfg, batch) == twinProbe(cfg, batch, 32, 8),
      "an uncommitted reband directory leaked into the serve")
    // re-running reband is the repair: it commits 48/12 (overwriting the
    // stray uncommitted dir) and sweeps what the FIRST reband superseded
    EmbeddingIngest.reband(spark, cfg, bits = 48, bandBits = 12)
    assert(servedProbe(cfg, batch) == twinProbe(cfg, batch, 48, 12))
    assert(bandsDirs(root) == Seq("bands_w32x8", "bands_w48x12"),
      s"unexpected band dirs: ${bandsDirs(root)}")
    graft.Caching.releaseAll()
  }

  test("registry reband: labels are untouched, future evidence signs at " +
      "the marker width, pre-hwm replays refuse") {
    val root = tmpDir()
    val cfg = EmbeddingClusterRegistry.RegistryConfig("unused", root,
      "ck-regreband")
    EmbeddingClusterRegistry.ingestBatch(spark, cfg, vecs(0L, 60L), 0L)
    EmbeddingClusterRegistry.ingestBatch(spark, cfg,
      vecs(60L, 60L, 10, 60L), 1L)
    def labels(): Map[Long, Long] = {
      val got = EmbeddingClusterRegistry.resolvedLabels(spark, cfg)
        .as[(Long, Long)].collect().toMap
      graft.Caching.releaseAll()
      got
    }
    val lab0 = labels()
    EmbeddingClusterRegistry.reband(spark, cfg, bits = 32, bandBits = 8)
    assert(labels() == lab0,
      "reband changed resolved labels — it must only re-sign the index")
    // pair-evidence face signs at the marker width: ≡ the persisted
    // vectors re-signed in session at 32/8, parity-split like the gate
    val batch = vecs(500L, 30L, 5, 500L - 13L)
    val served = EmbeddingClusterRegistry.probePairs(spark, cfg, batch)
      .select(col("vec_a"), col("vec_b")).as[(Long, Long)]
      .collect().toSeq.sorted
    val corpus = spark.read.parquet(s"$root/vecs")
      .select(col("vec_id"), col("e").as("embedding"))
    val twin = (VectorOps.srpProbe(corpus, batch, bits = 32, bandBits = 8,
        threshold = cfg.threshold)
        .select(least(col("batch_id"), col("corpus_id")),
          greatest(col("batch_id"), col("corpus_id")))
        .as[(Long, Long)].collect().toSeq ++
      VectorOps.srpNearDupPairs(batch, bits = 32, bandBits = 8,
        threshold = cfg.threshold)
        .select(col("vec_a"), col("vec_b")).as[(Long, Long)]
        .collect().toSeq).sorted
    graft.Caching.releaseAll()
    assert(served == twin,
      "rebanded registry probePairs diverged from the in-session 32/8 twin")
    // a post-reband batch labels through new-width evidence: an exact
    // copy must land in its original's cluster
    intercept[IllegalArgumentException] {
      EmbeddingClusterRegistry.ingestBatch(spark, cfg, vecs(0L, 60L), 0L)
    }
    EmbeddingClusterRegistry.ingestBatch(spark, cfg,
      vecs(700L, 10L, 10, 700L - 5L), 2L) // id 700 copies id 5
    val lab2 = labels()
    assert(lab2(700L) == lab2(5L),
      "a post-reband exact copy failed to join its original's cluster — " +
        "the batch was signed at a width other than the index's")
    graft.Caching.releaseAll()
  }

  test("re-running reband at the committed width is a no-op on the live " +
      "directory (ADVICE r12) but still sweeps superseded dirs") {
    val root = tmpDir()
    val cfg = EmbeddingIngest.IngestConfig("unused", root, "ck-reband5",
      centroidMod = 5)
    EmbeddingIngest.ingestBatch(spark, cfg, vecs(0L, 60L), 0L)
    val batch = vecs(500L, 20L, 4, 500L - 3L)
    EmbeddingIngest.reband(spark, cfg, bits = 32, bandBits = 8)
    // legacy bands/ superseded but not yet swept (one-cadence rule)
    assert(bandsDirs(root) == Seq("bands", "bands_w32x8"))
    val fs = fsOf(root)
    def listing() = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$root/bands_w32x8/ingest_batch=-1"))
      .map(st => (st.getPath.toString, st.getModificationTime)).toSeq.sorted
    val before = listing()
    // the hazard: a same-width re-run that swapWrites would tear the LIVE
    // serving directory under lock-free probes — it must not touch it
    EmbeddingIngest.reband(spark, cfg, bits = 32, bandBits = 8)
    assert(listing() == before,
      "same-width reband rewrote the live serving directory")
    assert(bandsDirs(root) == Seq("bands_w32x8"),
      "the no-op path must still sweep superseded directories")
    assert(servedProbe(cfg, batch) == twinProbe(cfg, batch, 32, 8))
    // registry twin of the same contract
    val rroot = tmpDir()
    val rcfg = EmbeddingClusterRegistry.RegistryConfig("unused", rroot,
      "ck-reband5r")
    EmbeddingClusterRegistry.ingestBatch(spark, rcfg, vecs(0L, 60L), 0L)
    EmbeddingClusterRegistry.reband(spark, rcfg, bits = 32, bandBits = 8)
    val rfs = fsOf(rroot)
    def rlisting() = rfs.listStatus(
        new org.apache.hadoop.fs.Path(s"$rroot/bands_w32x8/ingest_batch=-1"))
      .map(st => (st.getPath.toString, st.getModificationTime)).toSeq.sorted
    val rbefore = rlisting()
    EmbeddingClusterRegistry.reband(spark, rcfg, bits = 32, bandBits = 8)
    assert(rlisting() == rbefore,
      "same-width registry reband rewrote the live serving directory")
    assert(bandsDirs(rroot) == Seq("bands_w32x8"))
    graft.Caching.releaseAll()
  }

  test("compact under a stranded width marker folds the LIVE rebanded " +
      "directory, not the superseded one (ADVICE r12)") {
    val root = tmpDir()
    val cfg = EmbeddingIngest.IngestConfig("unused", root, "ck-reband6",
      centroidMod = 5)
    EmbeddingIngest.ingestBatch(spark, cfg, vecs(0L, 60L), 0L)
    val batch = vecs(500L, 20L, 4, 500L - 3L)
    EmbeddingIngest.reband(spark, cfg, bits = 32, bandBits = 8)
    val fs = fsOf(root)
    // strand the marker mid-swap: absent dir, .__old present — without
    // the rollback, compact resolves (and folds) the LEGACY bands/ while
    // the live rebanded directory goes unfolded
    val mp = new org.apache.hadoop.fs.Path(EmbeddingIngest.bandWidthPath(cfg))
    assert(fs.rename(mp, new org.apache.hadoop.fs.Path(mp.toString + ".__old")))
    EmbeddingIngest.compact(spark, cfg)
    val folded = spark.read.parquet(s"$root/bands_w32x8")
      .select(col("ingest_batch")).distinct().as[Long].collect().toSeq
    assert(folded == Seq(-1L),
      s"compact folded the wrong bands directory: live dir partitions $folded")
    assert(servedProbe(cfg, batch) == twinProbe(cfg, batch, 32, 8),
      "post-compact probe diverged after a stranded-marker compact")
    // registry twin
    val rroot = tmpDir()
    val rcfg = EmbeddingClusterRegistry.RegistryConfig("unused", rroot,
      "ck-reband6r")
    EmbeddingClusterRegistry.ingestBatch(spark, rcfg, vecs(0L, 60L), 0L)
    EmbeddingClusterRegistry.ingestBatch(spark, rcfg,
      vecs(60L, 60L, 10, 60L), 1L)
    EmbeddingClusterRegistry.reband(spark, rcfg, bits = 32, bandBits = 8)
    val lab0 = EmbeddingClusterRegistry.resolvedLabels(spark, rcfg)
      .as[(Long, Long)].collect().toMap
    graft.Caching.releaseAll()
    val rfs = fsOf(rroot)
    val rmp = new org.apache.hadoop.fs.Path(
      EmbeddingClusterRegistry.bandWidthPath(rcfg))
    assert(rfs.rename(rmp,
      new org.apache.hadoop.fs.Path(rmp.toString + ".__old")))
    EmbeddingClusterRegistry.compact(spark, rcfg)
    val rfolded = spark.read.parquet(s"$rroot/bands_w32x8")
      .select(col("ingest_batch")).distinct().as[Long].collect().toSeq
    assert(rfolded == Seq(-1L),
      s"registry compact folded the wrong bands directory: $rfolded")
    assert(EmbeddingClusterRegistry.resolvedLabels(spark, rcfg)
      .as[(Long, Long)].collect().toMap == lab0)
    graft.Caching.releaseAll()
  }

  test("rebandIfNeeded: an overloaded index fires the policy and rebands; " +
      "the rebanded (and any healthy) index returns None") {
    val root = tmpDir()
    // threshold 0.98 so random dim-8 vectors pass the dedup gate; 5000
    // vecs over 16-bucket 4-bit bands is ≈312 expected rows/band — above
    // the 4×64 fire line by construction, below it after any widening
    val cfg = EmbeddingIngest.IngestConfig("unused", root, "ck-reband7",
      threshold = 0.98, centroidMod = 50)
    EmbeddingIngest.ingestBatch(spark, cfg, vecs(0L, 5000L), 0L)
    val fired = EmbeddingIngest.rebandIfNeeded(spark, cfg)
    assert(fired.nonEmpty, "a 312-rows-per-band index must fire the policy")
    val (nb, nbb) = fired.get
    assert(nbb > 4 && nb == (16 / 4) * nbb,
      s"the plan must widen bands and keep the band count: $fired")
    // the reband actually committed: marker resolves the new width and
    // the probe serves the in-session twin at it
    val batch = vecs(9000L, 20L, 4, 9000L - 3L)
    assert(servedProbe(cfg, batch) == twinProbe(cfg, batch, nb, nbb),
      "rebandIfNeeded fired but the served width is not the plan's")
    assert(EmbeddingIngest.rebandIfNeeded(spark, cfg).isEmpty,
      "the just-rebanded index must gauge healthy")
    // registry twin
    val rroot = tmpDir()
    val rcfg = EmbeddingClusterRegistry.RegistryConfig("unused", rroot,
      "ck-reband7r")
    EmbeddingClusterRegistry.ingestBatch(spark, rcfg, vecs(0L, 5000L), 0L)
    val rfired = EmbeddingClusterRegistry.rebandIfNeeded(spark, rcfg)
    assert(rfired.nonEmpty, "the overloaded registry index must fire")
    assert(EmbeddingClusterRegistry.rebandIfNeeded(spark, rcfg).isEmpty)
    graft.Caching.releaseAll()
  }

  test("widening restores occupancy: the band-health gauge drops " +
      "cand_rows_per_vec after reband") {
    val root = tmpDir()
    // threshold 0.98: dim-8 random cosines clear 0.4 so often that a
    // 400-vec batch would dedup to a handful of survivors — the health
    // gauge needs the corpus actually IN the index
    val cfg = EmbeddingIngest.IngestConfig("unused", root, "ck-reband3",
      threshold = 0.98, centroidMod = 50)
    EmbeddingIngest.ingestBatch(spark, cfg, vecs(0L, 400L), 0L)
    def health(dir: String): (Long, Double) = {
      val r = VectorOps.srpBandHealth(spark.read.parquet(dir)).collect().head
      graft.Caching.releaseAll()
      (r.getAs[Long]("n_buckets"), r.getAs[Double]("cand_rows_per_vec"))
    }
    val (b16, c16) = health(s"$root/bands")
    EmbeddingIngest.reband(spark, cfg, bits = 32, bandBits = 8)
    val (b32, c32) = health(s"$root/bands_w32x8")
    assert(b32 > b16, s"wider bands must spread over more buckets: $b16 -> $b32")
    assert(c32 < c16,
      s"widening must cut the expected verify set: $c16 -> $c32")
    graft.Caching.releaseAll()
  }
}
