package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The perceptual-hash layer of [[CorpusIngest]] (VERDICT r8 item 5): every
  * other near-dup family (MinHash, SRP, BM25, IVF, PQ) had a persisted
  * append-only index; this pins the multimodal one to the same contract —
  * band rows appended per accepted batch under the lock, a read-only probe
  * face, idempotent replay, and compaction folding. */
class PhashIngestSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-phash").toString

  // 20 words, 110 bytes: long enough for a phash signature (>= 49 sample
  // bytes) AND for a one-word change to stay above the J=0.8 minhash
  // threshold (19/21 ≈ 0.905) — the near-dup-rejection fixture
  private val base = (1 to 20).map(i => s"tok$i").mkString(" ")
  private val nearVariant = (1 to 19).map(i => s"tok$i").mkString(" ") + " changed"
  // byte 0 is sample j=0 of the phash (position (0·n) div 49 = 0), and
  // sample 0 participates in bit 0 only — flipping it moves the signature
  // by hamming <= 1, a deterministic near-hit
  private val byteFlip = "X" + base.drop(1)
  private val short = "tiny doc" // < 49 bytes: no signature by the length guard
  private val unrelated =
    "zzzzzzzz yyyyyyyy xxxxxxxx wwwwwwww vvvvvvvv uuuu" // 49 bytes, far hash

  private def phashRows(root: String) =
    spark.read.parquet(s"$root/phash")

  test("accepted batches append band rows; sub-sample payloads and rejected docs do not") {
    val root = tmpDir()
    val cfg = CorpusIngest.IngestConfig("unused", root, "unused")
    assert(CorpusIngest.ingestBatch(spark, cfg,
      Seq(1L -> base, 2L -> short, 3L -> unrelated).toDF("doc_id", "text"), 0L) == 3L)
    // 4 bands per signature-bearing doc; the short doc is accepted into the
    // corpus but contributes no signature (resampling its few bytes would
    // alias unrelated tiny payloads into one bucket — the ADVICE r8 guard)
    val byDoc = phashRows(root).groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    assert(byDoc == Map(1L -> 4L, 3L -> 4L), byDoc.toString)
    // a doc REJECTED by the minhash near-dup stage reaches no index layer —
    // the phash table indexes the accepted corpus only
    assert(CorpusIngest.ingestBatch(spark, cfg,
      Seq(20L -> nearVariant).toDF("doc_id", "text"), 1L) == 0L)
    assert(phashRows(root).filter(col("doc_id") === 20L).count() == 0L)
  }

  test("probePhash hits a byte-flip variant read-only; replay and compact leave it stable") {
    val root = tmpDir()
    val cfg = CorpusIngest.IngestConfig("unused", root, "unused")
    val b0 = Seq(1L -> base, 3L -> unrelated).toDF("doc_id", "text")
    assert(CorpusIngest.ingestBatch(spark, cfg, b0, 0L) == 2L)

    def probeHits(): Set[(Long, Long)] = {
      val got = CorpusIngest.probePhash(spark, cfg,
        Seq(10L -> byteFlip, 11L -> ((1 to 20).map(i => s"fresh$i").mkString(" ")),
          12L -> short).toDF("doc_id", "text"))
        .select("doc_id", "corpus_id", "hamming")
        .as[(Long, Long, Int)].collect()
      got.foreach { case (_, _, h) => assert(h <= 3, s"hamming $h over maxDist") }
      graft.Caching.releaseAll()
      got.map(t => (t._1, t._2)).toSet
    }
    // the flipped payload matches its original within hamming 1; the fresh
    // doc and the sub-sample payload report nothing
    assert(probeHits() == Set((10L, 1L)))
    // read-only: no lock file, no state change
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "__ingest.lock")))

    // crash-replay of batch 0 rewrites the identical partition — no
    // duplicate band rows, identical probe result
    assert(CorpusIngest.ingestBatch(spark, cfg, b0, 0L) == 2L)
    assert(phashRows(root).count() == 8L)
    assert(probeHits() == Set((10L, 1L)))

    // compaction folds the per-batch partitions; the probe serves unchanged
    CorpusIngest.compact(spark, cfg)
    assert(phashRows(root).select("ingest_batch").distinct()
      .as[Long].collect().toSeq == Seq(-1L))
    assert(probeHits() == Set((10L, 1L)))
  }
}
