package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Auto-selected routing mode (VERDICT r11 item 4): `hierNlist = HierAuto`
 * derives flat-vs-hier from the frozen codebook size at the generation
 * boundary, against the measured crossover (`AutoHierCrossover`). The
 * danger the sentinel removes: a 100 TB deployment left on the flat
 * default runs a full-codebook argmax (and broadcast) at nlist 10⁵⁻⁶ —
 * the r11 head-to-head measured that 6× slower at nlist 5000 already.
 *
 * Auto is sugar for an explicit threshold, so every pin compares an
 * auto-built root against a twin root built with the EXPLICIT mode the
 * sentinel must resolve to, on identical data (deterministic ingest ⇒
 * identical state):
 *  1. exactly AT the crossover → flat (no `metaroute/`, serve ≡ explicit
 *     flat twin);
 *  2. one PAST the crossover → hier (`metaroute/` persisted and
 *     freeze-stamped, serve ≡ explicit hier twin);
 *  3. the mode is a pure function of the frozen codebook: an append
 *     batch under auto neither flips the mode nor de-syncs serve/ingest.
 */
class HierAutoSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-hierauto").toString

  /** Deterministic dim-8 vectors (near-orthogonal in expectation). */
  private def synth(from: Long, n: Long): DataFrame =
    spark.range(from, from + n).select(col("id").as("vec_id"))
      .withColumn("embedding", expr(
        """transform(sequence(0, 7),
          |  j -> cast((pmod(hash(vec_id * 8 + j), 2001) - 1000) / 1000.0
          |            as float))""".stripMargin))

  private def collected(df: DataFrame): Seq[(Long, Long, Int)] =
    df.as[(Long, Long, Int)].collect().toSeq.sorted

  private def hasRoute(cfg: EmbeddingIngest.IngestConfig): Boolean =
    new java.io.File(EmbeddingIngest.metaRoutePath(cfg)).exists()

  // centroidMod = 1: every vector a centroid seed, so the codebook size
  // IS the corpus size — the cheapest way to sit exactly on the crossover.
  // threshold 0.999: dim-8 random cosines clear the 0.4 default often
  // enough that near-dup rejection would shrink the codebook below it.
  private def cfg(root: String, ck: String,
      hier: Long): EmbeddingIngest.IngestConfig =
    EmbeddingIngest.IngestConfig("unused", root, ck,
      threshold = 0.999, centroidMod = 1, hierNlist = hier)

  private val at = EmbeddingIngest.AutoHierCrossover

  test("at exactly the crossover, auto resolves to FLAT: no routing " +
      "table, serve equals the explicit-flat twin") {
    val (ra, rf) = (tmpDir(), tmpDir())
    val auto = cfg(ra, "ck-ha1a", EmbeddingIngest.HierAuto)
    val flat = cfg(rf, "ck-ha1f", Long.MaxValue)
    EmbeddingIngest.ingestBatch(spark, auto, synth(0L, at), 0L)
    EmbeddingIngest.ingestBatch(spark, flat, synth(0L, at), 0L)
    assert(!hasRoute(auto), s"auto persisted a routing table at nlist $at" +
      " — the mode must stay flat AT the crossover (strictly-above rule)")
    val probes = synth(0L, at).filter(pmod(col("vec_id"), lit(200)) === 0)
    assert(collected(EmbeddingIngest.search(spark, auto, probes)) ==
      collected(EmbeddingIngest.search(spark, flat, probes)),
      "auto-at-crossover serve diverged from the explicit flat twin")
    graft.Caching.releaseAll()
  }

  test("one past the crossover, auto resolves to HIER: routing table " +
      "freeze-stamped, serve equals the explicit-hier twin, append " +
      "batches keep the generation's mode") {
    val (ra, rh) = (tmpDir(), tmpDir())
    val auto = cfg(ra, "ck-ha2a", EmbeddingIngest.HierAuto)
    // the explicit twin: any threshold the codebook exceeds selects hier
    val hier = cfg(rh, "ck-ha2h", at)
    EmbeddingIngest.ingestBatch(spark, auto, synth(0L, at + 1), 0L)
    EmbeddingIngest.ingestBatch(spark, hier, synth(0L, at + 1), 0L)
    assert(hasRoute(auto),
      s"auto left flat routing at nlist ${at + 1} — past the crossover " +
        "the persisted two-level router must engage")
    val stamps = spark.read.parquet(EmbeddingIngest.metaRoutePath(auto))
      .select(col("frozen_batch")).distinct().as[Long].collect().toSeq
    assert(stamps == Seq(0L), s"routing table stamped $stamps, not the " +
      "freeze batch — appends and serves would disagree on the generation")
    val probes = synth(0L, at + 1).filter(pmod(col("vec_id"), lit(200)) === 0)
    assert(collected(EmbeddingIngest.search(spark, auto, probes)) ==
      collected(EmbeddingIngest.search(spark, hier, probes)),
      "auto-past-crossover serve diverged from the explicit hier twin")
    // purity across appends: the frozen codebook doesn't change between
    // generations, so an append under auto must not flip the mode — the
    // two roots must stay bit-equal through it
    EmbeddingIngest.ingestBatch(spark, auto, synth(5000L, 50L), 1L)
    EmbeddingIngest.ingestBatch(spark, hier, synth(5000L, 50L), 1L)
    assert(collected(EmbeddingIngest.search(spark, auto, probes)) ==
      collected(EmbeddingIngest.search(spark, hier, probes)),
      "an append under auto de-synced the serve from the explicit twin")
    graft.Caching.releaseAll()
  }
}
