package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ml.VectorOps

/**
 * The persisted PQ layer of [[EmbeddingIngest]]: frozen per-subspace
 * codebooks (seed batch), append-only code rows, and [[EmbeddingIngest
 * .searchPq]] — IVF-PQ serving entirely from the on-disk tables. Pinned
 * two ways: the disk round-trip serves BIT-IDENTICAL results to the same
 * frozen index built in memory ([[VectorOps.ivfPqSearchIndexed]] over
 * frames the test constructs directly), and recall against driver-side
 * exact truth clears the 0.80 floor the batch ANN family pins.
 */
class PqServeSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-pq-serve").toString

  private val dim = 8

  /** Clusterable but noisy vectors: a dominant group axis (i % 3) plus
    * deterministic pseudo-noise in every dimension — enough structure for
    * IVF buckets to mean something, enough noise that PQ quantization is
    * lossy and the exact re-rank has work to do. */
  private def mkVec(i: Int): Seq[Float] =
    (0 until dim).map { d =>
      val noise = ((i * 37 + d * 13) % 11) / 11.0 - 0.5
      (if (d == i % 3) 10.0 + noise else noise).toFloat
    }

  private val seedRows = (0 until 60).map(i => i.toLong -> mkVec(i))
  private val lateRows = (100 until 160).map(i => i.toLong -> mkVec(i))

  private def df(rows: Seq[(Long, Seq[Float])]): DataFrame =
    rows.toDF("vec_id", "embedding")

  private def truthTop10(corpus: Seq[(Long, Seq[Float])],
      probeIds: Seq[Long]): Map[Long, Set[Long]] = {
    def dot(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    def cos(a: Seq[Double], b: Seq[Double]) =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val d = corpus.map { case (id, e) => id -> e.map(_.toDouble) }
    probeIds.map { p =>
      val pe = d.find(_._1 == p).get._2
      p -> d.filter(_._1 != p)
        .map { case (id, e) => (id, cos(pe, e)) }
        .sortBy { case (id, c) => (-c, id) }
        .take(10).map(_._1).toSet
    }.toMap
  }

  test("searchPq serves bit-identically to the in-memory frozen index; codes append per batch") {
    val root = tmpDir()
    val cfg = EmbeddingIngest.IngestConfig("unused", root, "ckpt-PQ",
      threshold = 2.0)
    assert(EmbeddingIngest.ingestBatch(spark, cfg, df(seedRows), 0L) == 60L)
    assert(EmbeddingIngest.ingestBatch(spark, cfg, df(lateRows), 1L) == 60L)

    // code table shape: m rows per vector, per-batch partitions
    val codes = spark.read.parquet(EmbeddingIngest.pqPath(cfg))
    assert(codes.count() == 120L * cfg.pqM)
    assert(codes.select($"ingest_batch").distinct().as[Long].collect().toSet
      == Set(0L, 1L))

    val probes = df(lateRows.filter(_._1 % 10 == 3))
    val served = EmbeddingIngest.searchPq(spark, cfg, probes)
      .select($"probe_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet

    // the same frozen index built directly in memory: codebooks from the
    // SEED half only (the freeze pool), everything bucketed/encoded
    // against them — the disk round-trip must not perturb a single rank
    val all = df(seedRows ++ lateRows)
    val cents = VectorOps.ivfCentroids(df(seedRows))
    val buckets = VectorOps.ivfBuckets(cents, all)
    val pqcb = VectorOps.pqCodebooks(df(seedRows),
      m = cfg.pqM, codebookMod = cfg.pqCodebookMod)
    val codesMem = VectorOps.pqEncodeWith(pqcb,
      buckets.select($"vec_id", $"e"), cfg.pqM)
    val expected = VectorOps.ivfPqSearchIndexed(cents,
        buckets.select($"vec_id", $"centroid_id"), codesMem, pqcb,
        buckets.select($"vec_id", $"e", $"n"), probes,
        nprobe = cfg.nprobe, m = cfg.pqM)
      .select($"probe_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(served == expected,
      s"disk-served PQ search diverged from the in-memory frozen index")
    graft.Caching.releaseAll()

    // replayed batch converges: no duplicate codes, identical serving
    assert(EmbeddingIngest.ingestBatch(spark, cfg, df(lateRows), 1L) == 60L)
    assert(spark.read.parquet(EmbeddingIngest.pqPath(cfg)).count() == 120L * cfg.pqM)
    val again = EmbeddingIngest.searchPq(spark, cfg, probes)
      .select($"probe_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(again == served)
    graft.Caching.releaseAll()
  }

  test("searchPq recall clears the 0.80 floor; compaction does not change results") {
    val root = tmpDir()
    val cfg = EmbeddingIngest.IngestConfig("unused", root, "ckpt-PQ2",
      threshold = 2.0)
    assert(EmbeddingIngest.ingestBatch(spark, cfg, df(seedRows), 0L) == 60L)
    assert(EmbeddingIngest.ingestBatch(spark, cfg, df(lateRows), 1L) == 60L)

    val probeIds = (seedRows ++ lateRows).map(_._1).filter(_ % 20 == 3)
    val probes = df((seedRows ++ lateRows).filter(r => probeIds.contains(r._1)))
    val truth = truthTop10(seedRows ++ lateRows, probeIds)

    def recall(results: DataFrame): Double = {
      val got = results.select($"probe_id", $"neighbor_id")
        .as[(Long, Long)].collect()
        .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).toSet }
      truth.map { case (p, t) => (t intersect got.getOrElse(p, Set.empty)).size }
        .sum.toDouble / truth.values.map(_.size).sum
    }
    val r = recall(EmbeddingIngest.searchPq(spark, cfg, probes))
    info(s"searchPq recall: $r")
    assert(r >= 0.8, s"persisted PQ serving fell below the 0.80 floor: $r")
    graft.Caching.releaseAll()

    val before = EmbeddingIngest.searchPq(spark, cfg, probes)
      .as[(Long, Long, Int)].collect().toSet
    EmbeddingIngest.compact(spark, cfg)
    val after = EmbeddingIngest.searchPq(spark, cfg, probes)
      .as[(Long, Long, Int)].collect().toSet
    assert(after == before, "compaction must not change served results")
    graft.Caching.releaseAll()

    // a STALE bucket annotation (the coarse codebook superseded since
    // these code rows were written) disables the pruned code scan but must
    // not change results — the (vec_id, j, code_id) payload is still valid
    // against the PQ codebooks, so the fallback is the unpruned join
    val pqDir = EmbeddingIngest.pqPath(cfg)
    val mangled = spark.read.parquet(pqDir)
      .withColumn("ivf_epoch", lit(999L))
      .localCheckpoint()
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(pqDir), true)
    mangled.write.partitionBy("ingest_batch").parquet(pqDir)
    val stale = EmbeddingIngest.searchPq(spark, cfg, probes)
      .as[(Long, Long, Int)].collect().toSet
    assert(stale == before,
      "a stale bucket annotation changed searchPq results instead of " +
        "falling back to the unpruned code scan")
    graft.Caching.releaseAll()
  }

  test("a legacy pq table (pre-epoch schema) reads as typed nulls, refuses " +
      "to serve with the repair named, and recluster() repairs it") {
    val root = tmpDir()
    val cfg = EmbeddingIngest.IngestConfig("unused", root, "ckpt-PQ-legacy",
      threshold = 2.0)
    assert(EmbeddingIngest.ingestBatch(spark, cfg, df(seedRows), 0L) == 60L)
    val probeIds = seedRows.map(_._1).filter(_ % 20 == 3)
    val probes = df(seedRows.filter(r => probeIds.contains(r._1)))

    // strip the epoch/bucket annotations — the exact layout a pre-epoch
    // version of this code persisted. The schema shim must read it back
    // with the new columns as typed nulls (NOT crash with an
    // AnalysisException about a missing `epoch` column), and the
    // coherence gate must then refuse to ADC-score those codes against a
    // stamped codebook, naming recluster() as the repair
    val pqDir = EmbeddingIngest.pqPath(cfg)
    val legacy = spark.read.parquet(pqDir)
      .select($"vec_id", $"j", $"code_id", $"ingest_batch")
      .as[(Long, Int, Long, Long)].collect().toSeq
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(pqDir), true)
    legacy.toDF("vec_id", "j", "code_id", "ingest_batch")
      .write.partitionBy("ingest_batch").parquet(pqDir)

    val serveErr = intercept[IllegalStateException] {
      EmbeddingIngest.searchPq(spark, cfg, probes).collect()
    }
    assert(serveErr.getMessage.contains("recluster"),
      s"legacy-root refusal does not name the repair: ${serveErr.getMessage}")
    val ingestErr = intercept[IllegalStateException] {
      EmbeddingIngest.ingestBatch(spark, cfg, df(lateRows), 1L)
    }
    assert(ingestErr.getMessage.contains("recluster"),
      s"legacy-root ingest refusal does not name the repair: " +
        ingestErr.getMessage)
    graft.Caching.releaseAll()

    // the named repair works unconditionally: recluster retrains both
    // codebook levels from the vec store and rewrites every code under
    // fresh epoch stamps — then the refused batch REPLAYS cleanly (its
    // partial pre-refusal appends are the at-least-once model's normal
    // state; replay overwrites them idempotently) and the root serves at
    // full quality over the whole corpus
    EmbeddingIngest.recluster(spark, cfg)
    assert(EmbeddingIngest.ingestBatch(spark, cfg, df(lateRows), 1L) == 60L)
    val truth = truthTop10(seedRows ++ lateRows, probeIds)
    val got = EmbeddingIngest.searchPq(spark, cfg, probes)
      .select($"probe_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).toSet }
    val r = truth.map { case (p, t) =>
      (t intersect got.getOrElse(p, Set.empty)).size }
      .sum.toDouble / truth.values.map(_.size).sum
    info(s"post-recluster legacy-root recall: $r")
    assert(r >= 0.8, s"repaired legacy root fell below the 0.80 floor: $r")
    graft.Caching.releaseAll()
  }
}
