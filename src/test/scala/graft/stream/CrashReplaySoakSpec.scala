package graft.stream

import graft.SparkSpec
import graft.text.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * End-to-end crash-replay SOAK across the three stateful roots (VERDICT
 * r10 item 7): the hwm fences, stranded-swap rollbacks, epoch tears, and
 * at-least-once replays are each spec-pinned in isolation elsewhere —
 * this spec interleaves them against a text cluster registry, an
 * embedding cluster registry, and an embedding ingest root in a
 * seed-randomized order and asserts the standing contract at every step:
 * EVERY read face either serves the oracle answer (the batch-recompute
 * truth for text labels, pre-perturbation stability elsewhere) or
 * refuses loudly — never a silently wrong result.
 *
 * Crash states are manufactured exactly as the real failures leave them:
 * a swap that died between its renames strands `<dir>.__old`; a compact
 * that died after its marker leaves the hwm with unfolded partitions; a
 * recluster that died between its two swaps leaves a new-epoch codebook
 * over old-epoch assignments. Repairs are the documented contracts:
 * re-run the maintenance pass, or advance the checkpoint past the mark.
 */
class CrashReplaySoakSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-soak").toString

  private def fsOf(root: String) = new org.apache.hadoop.fs.Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Manufacture a swap stranded between its two renames. */
  private def strand(root: String, dir: String): Unit = {
    val fs = fsOf(root)
    val p = new org.apache.hadoop.fs.Path(dir)
    if (fs.exists(p))
      assert(fs.rename(p, new org.apache.hadoop.fs.Path(dir + ".__old")))
  }

  /** Deterministic 40-word docs; every `dupEvery`-th doc re-uses the text
    * seed of (id − dupBack) plus one extra word — J ≈ 40/41, a near-dup
    * of the batch-0 original. */
  private def docs(from: Long, n: Long, dupEvery: Int, dupBack: Long): DataFrame = {
    val seeded = spark.range(from, from + n).select(col("id").as("doc_id"),
      (if (dupEvery > 0)
        when(pmod(col("id"), lit(dupEvery)) === 0, col("id") - dupBack)
          .otherwise(col("id"))
      else col("id")).as("seed"))
    seeded.select(col("doc_id"), concat(
      expr("""array_join(transform(sequence(0, 39),
             |  i -> concat('w', pmod(hash(seed * 40 + i), 5000))), ' ')""".stripMargin),
      if (dupEvery > 0)
        when(pmod(col("doc_id"), lit(dupEvery)) === 0, lit(" extrachg"))
          .otherwise(lit(""))
      else lit("")).as("text"))
  }

  /** The merge-exercising trio (the ClusterRegistrySpec bridge family):
    * A and B are not pairs of each other, C pairs with both — C's arrival
    * must MERGE the clusters rooted at A and B. */
  private def bridgeDoc(changed: Int): String =
    (1 to 100).map(i => if (i <= changed) s"u$i" else s"bt$i").mkString(" ")

  /** Deterministic dim-8 vectors; every `dupEvery`-th id is an exact copy
    * of (id − dupBack) — cos 1.0, a certain SRP near-dup. */
  private def vecs(from: Long, n: Long, dupEvery: Int, dupBack: Long): DataFrame =
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

  private def textBatch(b: Int): DataFrame =
    docs(b * 40L, 40L, if (b == 0) 0 else 10, b * 40L)
      .unionByName(Seq(
        (1000L + b) -> bridgeDoc(Seq(0, 16, 8)(math.min(b, 2)))
      ).toDF("doc_id", "text"))

  private def vecBatch(b: Int): DataFrame =
    vecs(b * 60L, 60L, if (b == 0) 0 else 10, b * 60L)

  /** Batch-recompute truth for the text registry over `upTo` batches. */
  private def textTruth(upTo: Int): Map[Long, Long] = {
    val all = (0 until upTo).map(textBatch).reduce(_ unionByName _)
    val cc = TextOps.connectedComponents(
      TextOps.minhashNearDups(all, "doc_id", "text"))
      .as[(Long, Long)].collect().toMap
    val ids = all.select("doc_id").as[Long].collect()
    graft.Caching.releaseAll()
    ids.map(id => id -> cc.getOrElse(id, id)).toMap
  }

  private def resolvedT(cfg: ClusterRegistry.RegistryConfig): Map[Long, Long] = {
    val got = ClusterRegistry.resolvedLabels(spark, cfg)
      .as[(Long, Long)].collect().toMap
    graft.Caching.releaseAll()
    got
  }

  private def resolvedE(cfg: EmbeddingClusterRegistry.RegistryConfig): Map[Long, Long] = {
    val got = EmbeddingClusterRegistry.resolvedLabels(spark, cfg)
      .as[(Long, Long)].collect().toMap
    graft.Caching.releaseAll()
    got
  }

  /** (n_clusters, n_docs, max_cluster, n_dups) from a label map — the
    * independent truth the stats-delta serve must match at every step. */
  private def statsOf(m: Map[Long, Long]): Seq[Long] = {
    val sz = m.groupBy(_._2).map(_._2.size.toLong).toSeq
    Seq(sz.size.toLong, sz.sum, sz.max, sz.map(_ - 1L).sum)
  }

  private def statsT(cfg: ClusterRegistry.RegistryConfig): Seq[Long] = {
    val r = ClusterRegistry.clusterStats(spark, cfg).collect().head
    graft.Caching.releaseAll()
    (0 until 4).map(r.getLong)
  }

  private def statsE(cfg: EmbeddingClusterRegistry.RegistryConfig): Seq[Long] = {
    val r = EmbeddingClusterRegistry.clusterStats(spark, cfg).collect().head
    graft.Caching.releaseAll()
    (0 until 4).map(r.getLong)
  }

  for (seed <- Seq(11, 42, 77))
    test("interleaved crashes, replays, and repairs keep every face " +
        s"oracle-true or loudly refusing (seed $seed)") {
      val rnd = new scala.util.Random(seed)
      val cfgT = ClusterRegistry.RegistryConfig("unused", tmpDir(), "unused")
      val cfgE = EmbeddingClusterRegistry.RegistryConfig("unused", tmpDir(), "unused")
      val cfgV = EmbeddingIngest.IngestConfig("unused", tmpDir(),
        s"soak-$seed", centroidMod = 5)
      // the lexical root of the ACL-filtered hybrid face (r11 item 7):
      // perturbed alongside the other three, served at every step
      val cfgB = CorpusIngest.IngestConfig("unused", tmpDir(), s"soakb-$seed")
      val probes = vecs(0L, 180L, 0, 0L)
        .filter(pmod(col("vec_id"), lit(45)) === 0)
      def search(): Seq[(Long, Long, Int)] = {
        val got = EmbeddingIngest.search(spark, cfgV, probes)
          .as[(Long, Long, Int)].collect().toSeq.sorted
        graft.Caching.releaseAll()
        got
      }
      // ACL-filtered hybrid over BOTH persisted roots: ids ≡ 0 (mod 3)
      // allowed; the invariant asserted on every serve — a disallowed doc
      // never surfaces through either leg, whatever the crash state
      val allowed = spark.range(0L, 2000L)
        .filter(pmod(col("id"), lit(3)) === 0).select(col("id").as("doc_id"))
        .localCheckpoint()
      def hybrid(): Seq[(Long, Long)] = {
        val got = HybridServe.search(spark, cfgB, cfgV,
            Seq("w1", "w7", "w42"), probes, allowed = Some(allowed))
          .select(col("probe_id"), col("doc_id"))
          .as[(Long, Long)].collect().toSeq.sorted
        graft.Caching.releaseAll()
        assert(got.forall(_._2 % 3 == 0),
          "a disallowed doc surfaced through the filtered hybrid serve")
        got
      }

      // --- 3 interleaved batches into the four roots, order shuffled ---
      (0 until 3).foreach { b =>
        rnd.shuffle(Seq[() => Unit](
          () => { ClusterRegistry.ingestBatch(spark, cfgT, textBatch(b), b.toLong): Unit },
          () => { EmbeddingClusterRegistry.ingestBatch(spark, cfgE, vecBatch(b), b.toLong): Unit },
          () => { EmbeddingIngest.ingestBatch(spark, cfgV, vecBatch(b), b.toLong): Unit },
          () => { CorpusIngest.ingestBatch(spark, cfgB, textBatch(b), b.toLong): Unit }
        )).foreach(_())
      }
      val truth3 = textTruth(3)
      assert(resolvedT(cfgT) == truth3, "text labels diverged from batch CC")
      // the bridge family must have produced a real merge row
      assert(spark.read.parquet(s"${cfgT.root}/merges").count() >= 1L)
      // stats-delta face, pre-compact (no summary yet: full-recompute
      // path) — must equal the independent truth
      assert(statsT(cfgT) == statsOf(truth3),
        "pre-compact text cluster stats diverged from the batch truth")
      val labE0 = resolvedE(cfgE)
      assert(statsE(cfgE) == statsOf(labE0),
        "pre-compact embedding cluster stats diverged from the labels")
      val s0 = search()
      assert(s0.nonEmpty)
      val h0 = hybrid()
      assert(h0.nonEmpty, "the filtered hybrid serve returned nothing")

      // --- stranded swaps (a compact died between its renames): faces ---
      // read THROUGH the tombstone, the next maintenance pass rolls back
      val strandable = rnd.shuffle(Seq(
        cfgT.root -> UnionFindTables.labelsPath(cfgT.root),
        cfgT.root -> UnionFindTables.mergesPath(cfgT.root),
        cfgE.root -> UnionFindTables.labelsPath(cfgE.root),
        cfgB.corpusRoot -> s"${cfgB.corpusRoot}/postings"))
      strandable.take(1 + rnd.nextInt(strandable.size))
        .foreach { case (r, d) => strand(r, d) }
      assert(resolvedT(cfgT) == truth3, "stranded swap broke the text serve")
      assert(resolvedE(cfgE) == labE0, "stranded swap broke the embedding-registry serve")
      assert(statsT(cfgT) == statsOf(truth3),
        "stranded swap broke the text stats serve")
      assert(statsE(cfgE) == statsOf(labE0),
        "stranded swap broke the embedding stats serve")
      assert(hybrid() == h0, "stranded swap changed the filtered hybrid serve")
      // cfgB's stranded postings stay stranded here on purpose: the
      // hybrid must serve THROUGH the tombstone until the later
      // killed-compact step repairs the root
      ClusterRegistry.compact(spark, cfgT)
      EmbeddingClusterRegistry.compact(spark, cfgE)
      assert(resolvedT(cfgT) == truth3, "compact-after-strand changed the labels")
      assert(resolvedE(cfgE) == labE0)
      // post-compact: the stats face now serves the materialized summary
      // (empty delta) — same numbers, different plan
      assert(statsT(cfgT) == statsOf(truth3),
        "the post-compact summary stats diverged from the batch truth")
      assert(statsE(cfgE) == statsOf(labE0),
        "the post-compact embedding summary stats diverged")
      assert(hybrid() == h0, "compact changed the filtered hybrid serve")

      // --- killed compact on the embedding ingest root: the hwm marker ---
      // landed, the fold did not. Pre-hwm replays refuse loudly; the rows
      // are intact either way; re-running compact is the repair.
      CorpusIngest.markCompactionHwm(fsOf(cfgV.corpusRoot), cfgV.corpusRoot, 2L)
      val staleId = rnd.nextInt(3).toLong
      intercept[IllegalArgumentException] {
        EmbeddingIngest.ingestBatch(spark, cfgV, vecBatch(staleId.toInt), staleId)
      }
      assert(search() == s0, "killed compact changed the serve answer")
      assert(hybrid() == h0, "killed compact changed the filtered hybrid")
      EmbeddingIngest.compact(spark, cfgV)
      assert(search() == s0, "compact repair changed the serve answer")
      // killed compact on the LEXICAL root: hwm landed, fold did not —
      // pre-hwm replays refuse, the filtered hybrid keeps serving truth
      CorpusIngest.markCompactionHwm(fsOf(cfgB.corpusRoot), cfgB.corpusRoot, 2L)
      intercept[IllegalArgumentException] {
        CorpusIngest.ingestBatch(spark, cfgB, textBatch(staleId.toInt), staleId)
      }
      assert(hybrid() == h0, "a killed lexical compact changed the hybrid")
      CorpusIngest.compact(spark, cfgB)
      assert(hybrid() == h0, "the lexical compact repair changed the hybrid")

      // --- stream restart from an older checkpoint: a pre-hwm text batch
      // refuses; an above-hwm batch replays byte-identically
      intercept[IllegalArgumentException] {
        ClusterRegistry.ingestBatch(spark, cfgT, textBatch(2), 2L)
      }
      ClusterRegistry.ingestBatch(spark, cfgT, textBatch(3), 3L)
      ClusterRegistry.ingestBatch(spark, cfgT, textBatch(3), 3L) // replay
      val truth4 = textTruth(4)
      assert(resolvedT(cfgT) == truth4,
        "an at-least-once text replay diverged from the batch CC")
      // THE delta case (r11 item 7): summary persisted at the compact,
      // batch 3 (and its replay) is post-fold delta — the stats serve
      // adjusts the materialized row and must land on the batch truth
      assert(statsT(cfgT) == statsOf(truth4),
        "the summary+delta stats serve diverged from the batch truth")
      EmbeddingClusterRegistry.ingestBatch(spark, cfgE, vecBatch(3), 3L)
      EmbeddingClusterRegistry.ingestBatch(spark, cfgE, vecBatch(3), 3L) // replay
      val labE1 = resolvedE(cfgE)
      assert(statsE(cfgE) == statsOf(labE1),
        "the embedding summary+delta stats serve diverged")
      // stranded summary swap (a compact died mid-rename of sizes/stats):
      // the stats face reads through the tombstone, never stale numbers
      strand(cfgT.root, s"${cfgT.root}/sizes")
      strand(cfgT.root, s"${cfgT.root}/stats")
      assert(statsT(cfgT) == statsOf(truth4),
        "a stranded summary swap broke the stats serve")
      ClusterRegistry.compact(spark, cfgT)
      assert(statsT(cfgT) == statsOf(truth4),
        "the summary-swap repair changed the stats")
      EmbeddingIngest.ingestBatch(spark, cfgV, vecBatch(3), 3L)
      CorpusIngest.ingestBatch(spark, cfgB, textBatch(3), 3L)
      val s1 = search()
      val h1 = hybrid()
      EmbeddingIngest.ingestBatch(spark, cfgV, vecBatch(3), 3L) // replay
      CorpusIngest.ingestBatch(spark, cfgB, textBatch(3), 3L) // replay
      assert(search() == s1, "an at-least-once embedding replay changed the serve")
      assert(hybrid() == h1, "an at-least-once replay changed the hybrid serve")

      // --- killed recluster: codebook swapped under a new epoch, the ---
      // assignments not — every face must refuse (never serve silently-
      // empty candidates), and re-running recluster is the repair
      val fsV = fsOf(cfgV.corpusRoot)
      val torn = spark.read.parquet(EmbeddingIngest.centroidsPath(cfgV))
        .select(col("centroid_id"), col("ce"), col("cn"),
          lit(-5L).as("frozen_batch"))
        .localCheckpoint()
      CorpusIngest.swapWrite(fsV, EmbeddingIngest.centroidsPath(cfgV), torn)
      intercept[IllegalStateException] { search() }
      // the filtered hybrid rides the torn semantic leg: it must REFUSE,
      // never silently serve lexical-only results as if they were fused
      intercept[IllegalStateException] { hybrid() }
      intercept[IllegalStateException] {
        EmbeddingIngest.ingestBatch(spark, cfgV, vecBatch(4), 4L)
      }
      EmbeddingIngest.recluster(spark, cfgV)
      val s2 = search()
      assert(s2.nonEmpty, "post-recluster serve returned nothing")
      val h2 = hybrid()
      assert(h2.nonEmpty, "post-recluster hybrid returned nothing")
      // the rebuilt lists must agree with the split layout on the same state
      fsV.delete(new org.apache.hadoop.fs.Path(
        EmbeddingIngest.ivfListsPath(cfgV)), true)
      assert(search() == s2, "post-repair lists diverged from the split layout")
      assert(hybrid() == h2, "post-repair hybrid diverged from the split layout")
      // and the pipeline continues past the repair
      EmbeddingIngest.ingestBatch(spark, cfgV, vecBatch(4), 4L)
      assert(search().nonEmpty)
      assert(hybrid().nonEmpty)
      graft.Caching.releaseAll()
    }
}
