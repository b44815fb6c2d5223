package graft.stream

import graft.SparkSpec
import graft.ml.VectorOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The two-level (hierarchical) router wired into the PERSISTED index path
 * (VERDICT r10 item 1): above `IngestConfig.hierNlist` centroids,
 * [[EmbeddingIngest]] assignment routes meta-first
 * ([[VectorOps.ivfAssignHier]] — corpus × O(√nlist), nothing larger than
 * the meta set broadcast), the freeze/recluster passes persist the
 * epoch-stamped child→meta routing table (`metaroute/`), and
 * [[EmbeddingIngest.search]]/[[EmbeddingIngest.searchPq]] select buckets
 * through [[VectorOps.probeBucketsHierRouted]].
 *
 * Pins, in order:
 *  1. hier-served ≡ flat-served on IDENTICAL state when the hierarchy is
 *     degenerate (metaMod = 1: every centroid is its own meta) — for both
 *     the split layout and the compacted lists, and for searchPq: the
 *     routing mode is an implementation detail the results may not leak;
 *  2. a hier-built root's assignments equal the in-session
 *     [[VectorOps.ivfAssignHier]] against the frozen codebook, the routing
 *     table lands epoch-stamped with the codebook generation, and the
 *     serve matches the in-session [[VectorOps.ivfSearchHier]] — before
 *     AND after compact (lists path), with recluster re-stamping the
 *     routing to its own generation;
 *  3. [[EmbeddingIngest.compact]] heals an absent routing table for an
 *     active-hier generation without changing what the derive-fallback
 *     serve was already answering.
 */
class IvfHierServeSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-ivfhier").toString

  /** Deterministic dim-8 vectors from the id hash (near-orthogonal in
    * expectation — nothing rejected at the 0.4 threshold). */
  private def synth(from: Long, n: Long): DataFrame =
    spark.range(from, from + n).select(col("id").as("vec_id"))
      .withColumn("embedding", expr(
        """transform(sequence(0, 7),
          |  j -> cast((pmod(hash(vec_id * 8 + j), 2001) - 1000) / 1000.0
          |            as float))""".stripMargin))

  /** The asDouble preparation (same strict-fold norm arithmetic). */
  private def prep(df: DataFrame): DataFrame = df
    .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    .withColumn("n", expr("sqrt(aggregate(e, 0D, (a, x) -> a + x * x))"))

  private def collected(df: DataFrame): Seq[(Long, Long, Int)] =
    df.as[(Long, Long, Int)].collect().toSeq.sorted

  private def routeStamps(cfg: EmbeddingIngest.IngestConfig): Seq[Long] =
    spark.read.parquet(EmbeddingIngest.metaRoutePath(cfg))
      .select(col("frozen_batch")).distinct().as[Long].collect().toSeq

  test("degenerate hier serve (every centroid its own meta) equals the " +
      "flat serve on the same root — split, lists, and PQ paths") {
    val root = tmpDir()
    val flat = EmbeddingIngest.IngestConfig("unused", root, "ck-hier1",
      centroidMod = 5)
    val hier = flat.copy(hierNlist = 0L, metaMod = 1)
    EmbeddingIngest.ingestBatch(spark, flat, synth(0L, 60L), 0L)
    EmbeddingIngest.ingestBatch(spark, flat, synth(60L, 60L), 1L)
    val probes = synth(0L, 120L).filter(pmod(col("vec_id"), lit(40)) === 0)
    assert(collected(EmbeddingIngest.search(spark, hier, probes)) ==
      collected(EmbeddingIngest.search(spark, flat, probes)),
      "degenerate hier split-serve diverged from the flat serve")
    assert(collected(EmbeddingIngest.searchPq(spark, hier, probes)) ==
      collected(EmbeddingIngest.searchPq(spark, flat, probes)),
      "degenerate hier searchPq diverged from the flat searchPq")
    EmbeddingIngest.compact(spark, flat)
    assert(collected(EmbeddingIngest.search(spark, hier, probes)) ==
      collected(EmbeddingIngest.search(spark, flat, probes)),
      "degenerate hier lists-serve diverged from the flat lists-serve")
    graft.Caching.releaseAll()
  }

  test("hier-built root: meta-first assignments, epoch-stamped routing " +
      "table, serve matches the in-session two-level operator through " +
      "compact and recluster") {
    val root = tmpDir()
    val cfg = EmbeddingIngest.IngestConfig("unused", root, "ck-hier2",
      threshold = 1.01, bits = 64, bandBits = 16, centroidMod = 5,
      hierNlist = 0L, metaMod = 20)
    EmbeddingIngest.ingestBatch(spark, cfg, synth(0L, 60L), 0L)
    EmbeddingIngest.ingestBatch(spark, cfg, synth(60L, 60L), 1L)

    // the routing table is persisted and stamped with the (freeze-batch)
    // codebook generation
    assert(routeStamps(cfg) == Seq(0L),
      s"routing table not stamped with the freeze generation: ${routeStamps(cfg)}")

    // assignments equal the in-session hier assignment against the frozen
    // (batch-0-seeded) codebook
    val cents = VectorOps.ivfCentroids(synth(0L, 60L), centroidMod = 5)
      .localCheckpoint()
    val all = prep(synth(0L, 120L)).localCheckpoint()
    val expAssign = VectorOps.ivfAssignHier(cents, all, metaMod = 20)
    assert(spark.read.parquet(EmbeddingIngest.ivfPath(cfg))
        .select(col("vec_id"), col("centroid_id"))
        .as[(Long, Long)].collect().toSeq.sorted ==
      expAssign.as[(Long, Long)].collect().toSeq.sorted,
      "persisted assignments diverged from the in-session hier assignment")

    // the serve routes meta-first and matches the in-session operator —
    // split layout first, then the compacted inverted lists
    val probes = synth(0L, 120L).filter(pmod(col("vec_id"), lit(40)) === 0)
    val exp = collected(VectorOps.ivfSearchHier(cents, expAssign, all,
      probes, metaMod = 20))
    assert(collected(EmbeddingIngest.search(spark, cfg, probes)) == exp,
      "hier split-serve diverged from the in-session ivfSearchHier")
    EmbeddingIngest.compact(spark, cfg)
    assert(routeStamps(cfg) == Seq(0L))
    assert(collected(EmbeddingIngest.search(spark, cfg, probes)) == exp,
      "hier lists-serve diverged from the in-session ivfSearchHier")

    // recluster re-stamps the routing table to its own generation and the
    // serve keeps answering (meta-first against the retrained codebook)
    EmbeddingIngest.recluster(spark, cfg)
    val cbStamp = spark.read.parquet(EmbeddingIngest.centroidsPath(cfg))
      .select(col("frozen_batch")).distinct().as[Long].collect().toSeq
    assert(routeStamps(cfg) == cbStamp && cbStamp == Seq(-2L),
      s"recluster left routing at ${routeStamps(cfg)} vs codebook $cbStamp")
    assert(collected(EmbeddingIngest.search(spark, cfg, probes)).nonEmpty,
      "post-recluster hier serve returned nothing")
    graft.Caching.releaseAll()
  }

  test("compact heals an absent routing table without changing the serve") {
    val root = tmpDir()
    val flat = EmbeddingIngest.IngestConfig("unused", root, "ck-hier3",
      centroidMod = 5)
    val hier = flat.copy(hierNlist = 0L, metaMod = 20)
    EmbeddingIngest.ingestBatch(spark, flat, synth(0L, 80L), 0L)
    val probes = synth(0L, 80L).filter(pmod(col("vec_id"), lit(40)) === 0)
    // no routing table yet: the hier serve derives it on the fly
    assert(!new java.io.File(root, "metaroute").exists())
    val derived = collected(EmbeddingIngest.search(spark, hier, probes))
    // the maintenance pass persists it for the active generation...
    EmbeddingIngest.compact(spark, hier)
    assert(routeStamps(hier) == Seq(0L),
      s"compact did not heal the routing table: ${routeStamps(hier)}")
    // ...and the persisted-routing serve answers exactly what the
    // derive-fallback already did
    assert(collected(EmbeddingIngest.search(spark, hier, probes)) == derived,
      "healed routing table changed the serve results")
    graft.Caching.releaseAll()
  }
}
