package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusIngestSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-ingest").toString

  // 20 words — long enough that a one-word change stays above J=0.8
  private val base = (1 to 20).map(i => s"tok$i").mkString(" ")
  private val nearVariant = (1 to 19).map(i => s"tok$i").mkString(" ") + " changed"
  private val unrelated = (1 to 20).map(i => s"other$i").mkString(" ")

  private def writeDocs(dir: String, name: String, rows: (Long, String)*): Unit = {
    val staging = tmpDir()
    rows.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(staging)
    val part = new java.io.File(staging).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(dir, name))
  }

  private def acceptedIds(cfg: CorpusIngest.IngestConfig): Set[Long] =
    spark.read.parquet(CorpusIngest.docsPath(cfg))
      .select("doc_id").as[Long].collect().toSet

  test("e2e: exact dup, within-batch near-dup, and cross-batch near-dup are all dropped; resume works") {
    val src = tmpDir(); val root = tmpDir(); val ckpt = tmpDir()
    val cfg = CorpusIngest.IngestConfig(src, root, ckpt)
    // batch 1: doc 1 (base), doc 2 = exact dup of 1 (case/whitespace), doc 3 =
    // near-dup of 1 (one word changed), doc 4 unrelated
    writeDocs(src, "f1.parquet",
      1L -> base, 2L -> ("  " + base.toUpperCase + "  "), 3L -> nearVariant,
      4L -> unrelated)
    CorpusIngest.start(spark, cfg).awaitTermination()
    assert(acceptedIds(cfg) == Set(1L, 4L))

    // batch 2 (new file, resumed checkpoint): doc 5 = exact dup of the
    // ALREADY-INGESTED doc 1, doc 6 = near-dup of ingested doc 1 (must be
    // caught by the PERSISTED index probe), doc 7 fresh
    writeDocs(src, "f2.parquet",
      5L -> base, 6L -> nearVariant, 7L -> (1 to 20).map(i => s"fresh$i").mkString(" "))
    CorpusIngest.start(spark, cfg).awaitTermination()
    assert(acceptedIds(cfg) == Set(1L, 4L, 7L))

    // ledger: one row per batch, accepted counts as observed
    val ledger = spark.read.parquet(CorpusIngest.ledgerPath(cfg))
      .select("ingest_batch", "n_in", "n_accepted")
      .as[(Long, Long, Long)].collect().map { case (b, n, a) => b -> ((n, a)) }.toMap
    assert(ledger(0L) == ((4L, 2L)) && ledger(1L) == ((3L, 1L)))
  }

  test("compact folds index partitions; dedup against compacted history still works") {
    val root = tmpDir()
    val cfg = CorpusIngest.IngestConfig("unused", root, "unused")
    CorpusIngest.ingestBatch(spark, cfg, Seq(1L -> base).toDF("doc_id", "text"), 0L)
    CorpusIngest.ingestBatch(spark, cfg, Seq(2L -> unrelated).toDF("doc_id", "text"), 1L)
    CorpusIngest.compact(spark, cfg)
    // everything folded into the single compacted partition, rows intact
    val docs = spark.read.parquet(CorpusIngest.docsPath(cfg))
    assert(docs.select("ingest_batch").distinct().as[Long].collect().toSeq == Seq(-1L))
    assert(docs.select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
    // the ledger keeps its per-batch audit rows
    assert(spark.read.parquet(CorpusIngest.ledgerPath(cfg))
      .select("ingest_batch").as[Long].collect().toSet == Set(0L, 1L))
    // a post-compaction batch still sees the compacted index: exact dup of
    // doc 1 and near-dup of doc 1 both rejected, fresh doc accepted
    val b2 = Seq(10L -> base, 11L -> nearVariant,
      12L -> (1 to 20).map(i => s"novel$i").mkString(" ")).toDF("doc_id", "text")
    assert(CorpusIngest.ingestBatch(spark, cfg, b2, 2L) == 1L)
    assert(acceptedIds(cfg) == Set(1L, 2L, 12L))
  }

  test("a pre-compaction batch id refuses to replay (high-water mark); fresh ids proceed") {
    val root = tmpDir()
    val cfg = CorpusIngest.IngestConfig("unused", root, "unused")
    CorpusIngest.ingestBatch(spark, cfg, Seq(1L -> base).toDF("doc_id", "text"), 0L)
    CorpusIngest.ingestBatch(spark, cfg, Seq(2L -> unrelated).toDF("doc_id", "text"), 1L)
    CorpusIngest.compact(spark, cfg)
    // the fold deleted batch 0's own partition; a replay (stream restarted
    // from an older checkpoint) would re-append rows next to the compacted
    // copy — refuse loudly instead of silently duplicating
    val e = intercept[IllegalArgumentException] {
      CorpusIngest.ingestBatch(spark, cfg,
        Seq(1L -> base).toDF("doc_id", "text"), 0L)
    }
    assert(e.getMessage.contains("high-water mark"), e.getMessage)
    // rows unchanged by the refused replay; ids above the mark still ingest
    assert(acceptedIds(cfg) == Set(1L, 2L))
    assert(CorpusIngest.ingestBatch(spark, cfg,
      Seq(3L -> (1 to 20).map(i => s"fresh$i").mkString(" "))
        .toDF("doc_id", "text"), 2L) == 1L)
  }

  test("a doc rejected by the corpus cannot drag its batch near-dups down with it") {
    // Z accepted; next batch holds Y (near-dup of Z) and X (near-dup of Y
    // but NOT of Z). Y must be rejected by the index probe BEFORE the
    // within-batch stage, so X — whose content has no accepted
    // near-duplicate — is ingested. Deciding within-batch first would drop
    // X in favor of Y and then reject Y: unique content silently lost, and
    // the accepted set would depend on batch boundaries.
    val ws = (1 to 20).map(i => s"w$i")
    val z = ws.mkString(" ")
    val y = (ws.dropRight(1) :+ "endchg").mkString(" ")           // J(Y,Z)=17/19
    val x = (("startchg" +: ws.drop(1).dropRight(1)) :+ "endchg") // J(X,Y)=17/19
      .mkString(" ")                                              // J(X,Z)=16/20 < 0.85
    val root = tmpDir()
    val cfg = CorpusIngest.IngestConfig("unused", root, "unused", threshold = 0.85)
    assert(CorpusIngest.ingestBatch(spark, cfg,
      Seq(1L -> z).toDF("doc_id", "text"), 0L) == 1L)
    assert(CorpusIngest.ingestBatch(spark, cfg,
      Seq(2L -> y, 3L -> x).toDF("doc_id", "text"), 1L) == 1L)
    assert(acceptedIds(cfg) == Set(1L, 3L))
  }

  test("probe reports would-be rejections read-only: no state change, no lock") {
    val root = tmpDir()
    val cfg = CorpusIngest.IngestConfig("unused", root, "unused")
    CorpusIngest.ingestBatch(spark, cfg,
      Seq(1L -> base, 4L -> unrelated).toDF("doc_id", "text"), 0L)
    // 5 = exact dup of accepted 1 (case/whitespace), 6 = near-dup of 1,
    // 7 = fresh — probe must flag 5 and 6, stay silent on 7
    val hits = CorpusIngest.probe(spark, cfg,
      Seq(5L -> ("  " + base.toUpperCase + "  "), 6L -> nearVariant,
        7L -> (1 to 20).map(i => s"probe$i").mkString(" ")).toDF("doc_id", "text"))
      .select("doc_id", "kind", "corpus_id")
      .as[(Long, String, Option[Long])].collect().toSet
    assert(hits == Set((5L, "exact", None), (6L, "near", Some(1L))))
    // read-only: accepted set unchanged, no lock file left behind
    assert(acceptedIds(cfg) == Set(1L, 4L))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "__ingest.lock")))
    graft.Caching.releaseAll()
  }

  test("probe reads THROUGH a stranded compaction without rolling it back") {
    val root = tmpDir()
    val cfg = CorpusIngest.IngestConfig("unused", root, "unused")
    CorpusIngest.ingestBatch(spark, cfg, Seq(1L -> base).toDF("doc_id", "text"), 0L)
    // compact died after swap-out: tables stranded at .__old. A lock-less
    // probe must still see the index (read .__old) but must NOT rename —
    // rollback belongs to the locked mutators; renaming here would yank the
    // dir out from under a compact that is mid-swap rather than dead
    for (sub <- Seq("docs", "hashes", "bands", "sets")) {
      val d = java.nio.file.Paths.get(root, sub)
      java.nio.file.Files.move(d, java.nio.file.Paths.get(root, sub + ".__old"))
    }
    val hits = CorpusIngest.probe(spark, cfg,
      Seq(2L -> base).toDF("doc_id", "text"))
      .select("doc_id", "kind").as[(Long, String)].collect().toSet
    assert(hits == Set((2L, "exact")))
    for (sub <- Seq("docs", "hashes", "bands", "sets")) {
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(root, sub + ".__old")), s"$sub rolled back")
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(root, sub)))
    }
    graft.Caching.releaseAll()
  }

  test("a compaction crash between renames rolls back instead of resetting the index") {
    val root = tmpDir()
    val cfg = CorpusIngest.IngestConfig("unused", root, "unused")
    CorpusIngest.ingestBatch(spark, cfg, Seq(1L -> base).toDF("doc_id", "text"), 0L)
    // simulate compact() dying after swap-out: the live dir is gone, data
    // stranded at .__old — the next batch must roll it back, not see empty
    for (sub <- Seq("docs", "hashes", "bands", "sets")) {
      val d = java.nio.file.Paths.get(root, sub)
      java.nio.file.Files.move(d, java.nio.file.Paths.get(root, sub + ".__old"))
    }
    // an exact dup of doc 1 must still be rejected (the rolled-back index)
    assert(CorpusIngest.ingestBatch(spark, cfg,
      Seq(2L -> base).toDF("doc_id", "text"), 1L) == 0L)
    assert(acceptedIds(cfg) == Set(1L))
  }

  test("an empty first batch leaves readable state for the next batch") {
    val root = tmpDir()
    val cfg = CorpusIngest.IngestConfig("unused", root, "unused")
    // batch 0 carries no rows (an empty source file): writes create bare
    // dirs — the next batch must still read them as empty, not crash
    val emptyBatch = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(CorpusIngest.ingestBatch(spark, cfg, emptyBatch, 0L) == 0L)
    assert(CorpusIngest.ingestBatch(spark, cfg,
      Seq(1L -> base).toDF("doc_id", "text"), 1L) == 1L)
    assert(acceptedIds(cfg) == Set(1L))
  }

  test("within-batch near-dup chains resolve to one canonical per component") {
    // a ~ c and b ~ c but a !~ b: a chain through c. Component resolution
    // keeps only the component's min id (the batch dedup family's
    // cluster-canonical policy); the old pairwise drop-the-greater rule
    // would have kept b as well, making the accepted set a pair-order
    // artifact instead of one-doc-per-cluster.
    val ws = (1 to 20).map(i => s"c$i")
    val a = ws.mkString(" ")                                    // c1..c20
    val cTxt = (ws.dropRight(1) :+ "tailchg").mkString(" ")     // J(a,c)=17/19
    val b = (Seq("headchg1", "headchg2") ++ ws.drop(2).dropRight(1) :+ "tailchg")
      .mkString(" ")                        // J(b,c)=16/20=0.8, J(a,b)=15/21
    val root = tmpDir()
    val cfg = CorpusIngest.IngestConfig("unused", root, "unused")
    assert(CorpusIngest.ingestBatch(spark, cfg,
      Seq(1L -> a, 2L -> b, 3L -> cTxt).toDF("doc_id", "text"), 0L) == 1L)
    assert(acceptedIds(cfg) == Set(1L))
  }

  test("compact and ingest serialize on the corpus lock; stale locks break") {
    val root = tmpDir()
    val cfg = CorpusIngest.IngestConfig("unused", root, "unused")
    CorpusIngest.ingestBatch(spark, cfg, Seq(1L -> base).toDF("doc_id", "text"), 0L)
    // simulate an in-flight ingest batch holding the single-writer lock:
    // a concurrent compaction (and a second ingest) must refuse, not
    // interleave with the multi-table partition writes
    val h = IngestLock.acquire(spark, root, "in-flight-batch", cfg.lockStaleMs)
    intercept[IngestLock.LockHeldException] { CorpusIngest.compact(spark, cfg) }
    intercept[IngestLock.LockHeldException] {
      CorpusIngest.ingestBatch(spark, cfg,
        Seq(2L -> unrelated).toDF("doc_id", "text"), 1L)
    }
    // reentrant refresh for the SAME owner is allowed (heartbeat path)
    IngestLock.acquire(spark, root, "in-flight-batch", cfg.lockStaleMs)
    IngestLock.release(spark, h)
    // released: the same operations now serialize cleanly
    CorpusIngest.compact(spark, cfg)
    assert(spark.read.parquet(CorpusIngest.docsPath(cfg))
      .select("ingest_batch").distinct().as[Long].collect().toSeq == Seq(-1L))
    // a dead holder's lock (heartbeat older than staleMs) is broken and
    // taken over — the reference's stale-lock rule
    IngestLock.acquire(spark, root, "dead-run", 60000L)
    Thread.sleep(20)
    val staleCfg = cfg.copy(lockStaleMs = 1L)
    assert(CorpusIngest.ingestBatch(spark, staleCfg,
      Seq(3L -> (1 to 20).map(i => s"post$i").mkString(" "))
        .toDF("doc_id", "text"), 1L) == 1L)
  }

  test("a malformed lock file is debris only once its mtime goes stale") {
    val root = tmpDir()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    val lockFile = java.nio.file.Paths.get(root, "__ingest.lock")
    // a torn/garbage lock file with a FRESH modification time may be a live
    // holder's heartbeat caught mid-rewrite — acquisition must refuse, not
    // delete a live holder's lock and take over
    java.nio.file.Files.writeString(lockFile, "garbage-no-newline")
    intercept[IngestLock.LockHeldException] {
      IngestLock.acquire(spark, root, "recoverer", 60000L)
    }
    assert(java.nio.file.Files.exists(lockFile),
      "a fresh unreadable lock must be left in place")
    // once the mtime is older than the stale window it is a crashed
    // writer's debris; acquisition must take over rather than refuse
    // forever on unparseable content
    java.nio.file.Files.setLastModifiedTime(lockFile,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 120000L))
    val h = IngestLock.acquire(spark, root, "recoverer", 60000L)
    IngestLock.release(spark, h)
    assert(!java.nio.file.Files.exists(lockFile))
  }

  test("a crashed batch's own lock does not block that batch's restart") {
    val root = tmpDir()
    val cfg = CorpusIngest.IngestConfig("unused", root, "ckpt-A")
    // crash simulation: a prior incarnation of batch 0 (same checkpoint)
    // died holding a fresh lock. The restart is the SAME logical batch —
    // stable owner identity makes it the reentrant-refresh case instead of
    // a foreign holder stalling the stream for lockStaleMs
    IngestLock.acquire(spark, root,
      CorpusIngest.batchLockOwner(cfg, 0L), cfg.lockStaleMs)
    assert(CorpusIngest.ingestBatch(spark, cfg,
      Seq(1L -> base).toDF("doc_id", "text"), 0L) == 1L)
    // a DIFFERENT batch id (or checkpoint) is a foreign holder and refuses
    IngestLock.acquire(spark, root,
      CorpusIngest.batchLockOwner(cfg, 0L), cfg.lockStaleMs)
    intercept[IngestLock.LockHeldException] {
      CorpusIngest.ingestBatch(spark, cfg,
        Seq(2L -> unrelated).toDF("doc_id", "text"), 1L)
    }
    intercept[IngestLock.LockHeldException] {
      CorpusIngest.ingestBatch(spark, cfg.copy(checkpointDir = "ckpt-B"),
        Seq(2L -> unrelated).toDF("doc_id", "text"), 0L)
    }
  }

  test("soak: 50 batches never release a foreign cache and leave state consistent") {
    val root = tmpDir()
    val cfg = CorpusIngest.IngestConfig("unused", root, "unused")
    // a concurrently cached frame OUTSIDE the ingest's cache scope: the
    // round-5 advisory regression was ingestBatch releasing every scoped
    // frame process-wide, yanking caches from under concurrent pipelines
    val sentinel = Seq((1L, "sentinel")).toDF("k", "v").persist()
    sentinel.count()
    try {
      for (b <- 0 until 50) {
        val txt = (1 to 20).map(i => s"b${b}w$i").mkString(" ")
        assert(CorpusIngest.ingestBatch(spark, cfg,
          Seq((100L + b) -> txt).toDF("doc_id", "text"), b.toLong) == 1L)
        assert(sentinel.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
          s"batch $b unpersisted a cache it does not own")
      }
    } finally sentinel.unpersist(blocking = true)
    assert(acceptedIds(cfg) == (0 until 50).map(b => 100L + b).toSet)
    assert(spark.read.parquet(CorpusIngest.ledgerPath(cfg)).count() == 50L)
  }

  test("replaying a batch converges: identical accepted set, no duplicate rows") {
    val root = tmpDir()
    val cfg = CorpusIngest.IngestConfig("unused", root, "unused")
    val b0 = Seq(1L -> base, 2L -> nearVariant, 3L -> unrelated).toDF("doc_id", "text")
    assert(CorpusIngest.ingestBatch(spark, cfg, b0, 0L) == 2L)
    // crash-replay of batch 0: the batch's own prior output is excluded from
    // the index it probes, so decisions repeat and the partition rewrite is
    // byte-identical — never a self-collision that rejects everything
    assert(CorpusIngest.ingestBatch(spark, cfg, b0, 0L) == 2L)
    assert(acceptedIds(cfg) == Set(1L, 3L))
    val n = spark.read.parquet(CorpusIngest.docsPath(cfg)).count()
    assert(n == 2L, s"expected no duplicated state rows, got $n")
    // and a LATER batch still probes batch 0's index
    val b1 = Seq(10L -> base).toDF("doc_id", "text")
    assert(CorpusIngest.ingestBatch(spark, cfg, b1, 1L) == 0L)
  }

  test("search serves BM25 from the persisted lexical index: batch-built ≡ monolithic, stable across replay and compact") {
    val root = tmpDir()
    val cfg = CorpusIngest.IngestConfig("unused", root, "unused")
    // four clearly-unrelated docs (no near-dup rejections); doc 4 holds no
    // query term and must be absent from the index-pruned result
    val b0 = Seq(
      1L -> "the cat sat on the mat near the door",
      2L -> "a dog chased the ball out of the yard").toDF("doc_id", "text")
    val b1 = Seq(
      3L -> "ships of the line fired volleys of iron",
      4L -> "zebra quagga xylophone marimba").toDF("doc_id", "text")
    assert(CorpusIngest.ingestBatch(spark, cfg, b0, 0L) == 2L)
    assert(CorpusIngest.ingestBatch(spark, cfg, b1, 1L) == 2L)

    val terms = Seq("the", "of")
    def got(): Seq[(Long, Long, Double, Int)] =
      CorpusIngest.search(spark, cfg, terms, topK = 10)
        .select("doc_id", "dl", "bm25", "rank")
        .as[(Long, Long, Double, Int)].collect().sortBy(_._4).toSeq
    // the monolithic expectation: TextOps.bm25 over the accepted corpus,
    // docs holding at least one term, ranked by (score desc, id) — the
    // serving layer's scores must be BIT-identical (same arithmetic), so
    // exact Double comparison is deliberate
    val accepted = spark.read.parquet(CorpusIngest.docsPath(cfg))
      .select("doc_id", "text")
    val exp = graft.text.TextOps.bm25(accepted, "doc_id", "text", terms)
      .filter(col("tf0") + col("tf1") > 0)
      .select("doc_id", "dl", "bm25").as[(Long, Long, Double)]
      .collect().sortBy { case (id, _, s) => (-s, id) }
      .zipWithIndex.map { case ((id, dl, s), i) => (id, dl, s, i + 1) }.toSeq
    assert(exp.map(_._1).toSet == Set(1L, 2L, 3L), "fixture must exclude doc 4")
    assert(got() == exp)

    // a crash-replayed batch rewrites identical postings/stat partitions
    assert(CorpusIngest.ingestBatch(spark, cfg, b1, 1L) == 2L)
    assert(got() == exp)
    // compaction folds the postings partitions without changing the scores
    CorpusIngest.compact(spark, cfg)
    assert(spark.read.parquet(s"$root/postings")
      .select("ingest_batch").distinct().as[Long].collect().toSeq == Seq(-1L))
    // docstats folds further: ONE summed row, not a per-batch concat
    assert(spark.read.parquet(s"$root/docstats")
      .select("n_docs", "dl_sum", "ingest_batch")
      .as[(Long, Long, Long)].collect().toSeq == Seq((4L, 30L, -1L)))
    assert(got() == exp)
    // the scale contract: the postings scan prunes to the query terms AT
    // the parquet source (a pushed In filter), so serving cost follows
    // df(terms) — a post-scan Filter over the whole index would not
    val plan = CorpusIngest.search(spark, cfg, terms, topK = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(word"),
      s"term filter not pushed to the postings scan:\n${plan.take(2000)}")
    graft.Caching.releaseAll()
  }

  test("ingest quality gate drops low-quality docs before dedup and indexing") {
    val root = tmpDir()
    val cfg = CorpusIngest.IngestConfig("unused", root, "unused", minQuality = 0.3)
    val good = "the cat sat on the mat near the old door tonight"
    val junk = "12345 67890 11111 22222" // digit-heavy, stopword-free
    assert(CorpusIngest.ingestBatch(spark, cfg,
      Seq(1L -> good, 2L -> junk).toDF("doc_id", "text"), 0L) == 1L)
    assert(acceptedIds(cfg) == Set(1L))
    // the gated doc reached NO index layer
    assert(spark.read.parquet(s"$root/postings")
      .filter(col("doc_id") === 2L).count() == 0L)
    // n_in audits arrivals BEFORE the gate
    assert(spark.read.parquet(CorpusIngest.ledgerPath(cfg))
      .select("n_in", "n_accepted").as[(Long, Long)].collect().toSeq ==
      Seq((2L, 1L)))
    // probe mirrors the gate: junk reports 'quality' (and nothing else),
    // an exact dup of the accepted doc still reports 'exact'
    val report = CorpusIngest.probe(spark, cfg,
        Seq(10L -> junk, 11L -> good).toDF("doc_id", "text"))
      .select("doc_id", "kind").as[(Long, String)].collect().toSet
    assert(report == Set((10L, "quality"), (11L, "exact")))
    // gate off (the default config): the same doc is admitted — the gate
    // alone rejected it, not a dedup or schema side effect
    val root2 = tmpDir()
    val cfg2 = CorpusIngest.IngestConfig("unused", root2, "unused")
    assert(CorpusIngest.ingestBatch(spark, cfg2,
      Seq(2L -> junk).toDF("doc_id", "text"), 0L) == 1L)
    graft.Caching.releaseAll()
  }

  test("frequentTerms serves the merged Misra–Gries vocabulary within its additive bound") {
    val root = tmpDir()
    val cfg = CorpusIngest.IngestConfig("unused", root, "unused", mgK = 4)
    // 'alpha' dominates across two batches; the other words are distinct
    // singletons so no doc near-dups another. n = 12 + 8 + 10 = 30 words,
    // ε = n/(mgK+1) = 6: alpha (f = 15) is guaranteed reported with
    // 9 ≤ approx ≤ 15; nothing may ever be over-counted.
    val b0 = Seq(
      1L -> Seq.fill(12)("alpha").mkString(" "),
      2L -> "beta gamma delta epsilon zeta eta theta iota").toDF("doc_id", "text")
    val b1 = Seq(
      3L -> "alpha kappa lambda mu alpha nu xi alpha omicron pi").toDF("doc_id", "text")
    assert(CorpusIngest.ingestBatch(spark, cfg, b0, 0L) == 2L)
    assert(CorpusIngest.ingestBatch(spark, cfg, b1, 1L) == 1L)

    def served(): Map[String, (Long, Double)] =
      CorpusIngest.frequentTerms(spark, cfg, minShare = 0.1)
        .select("word", "approx_count", "share_lb")
        .as[(String, Long, Double)].collect()
        .map { case (w, c, s) => w -> ((c, s)) }.toMap
    // independent truth: exact counts over the accepted corpus
    val truth = spark.read.parquet(CorpusIngest.docsPath(cfg))
      .select(explode(graft.text.TextOps.wordsOf(col("text"))).as("w"))
      .groupBy("w").count().as[(String, Long)].collect().toMap
    assert(truth("alpha") == 15L && truth.values.sum == 30L)

    val first = served()
    val (alphaCnt, alphaShare) = first("alpha")
    assert(alphaCnt >= 9L && alphaCnt <= 15L, s"alpha approx $alphaCnt")
    assert(alphaShare == alphaCnt.toDouble / 30.0)
    // no word is ever over-counted, and none below minShare·n survives
    first.foreach { case (w, (c, _)) =>
      assert(c <= truth(w), s"$w over-counted: $c > ${truth(w)}")
      assert(c.toDouble / 30.0 >= 0.1) }

    // replay of batch 1 rewrites its summary partition identically
    assert(CorpusIngest.ingestBatch(spark, cfg, b1, 1L) == 1L)
    assert(served() == first)
    // compaction folds the summaries to one summed counter per word —
    // plain addition, so the served result is untouched
    CorpusIngest.compact(spark, cfg)
    val mgRows = spark.read.parquet(s"$root/mg")
    assert(mgRows.select("ingest_batch").distinct()
      .as[Long].collect().toSeq == Seq(-1L))
    assert(mgRows.groupBy("word").count()
      .filter(col("count") > 1).count() == 0L, "fold left duplicate counters")
    assert(served() == first)
    graft.Caching.releaseAll()
  }

  test("vocabDriftReport flags a domain-shifted batch against corpus history") {
    val root = tmpDir()
    val cfg = CorpusIngest.IngestConfig("unused", root, "unused", mgK = 16)
    // history: two batches of a stable vocabulary; then a shifted batch
    // whose docs are dominated by a word the history never saw
    val hist0 = Seq(
      1L -> Seq.fill(10)("stable").mkString(" "),
      2L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa")
      .toDF("doc_id", "text")
    val hist1 = Seq(
      3L -> (Seq.fill(8)("stable") ++ Seq("lambda", "mu")).mkString(" "))
      .toDF("doc_id", "text")
    val shifted = Seq(
      4L -> (Seq.fill(9)("blockchain") ++ Seq("stable")).mkString(" "))
      .toDF("doc_id", "text")
    assert(CorpusIngest.ingestBatch(spark, cfg, hist0, 0L) == 2L)
    assert(CorpusIngest.ingestBatch(spark, cfg, hist1, 1L) == 1L)
    assert(CorpusIngest.ingestBatch(spark, cfg, shifted, 2L) == 1L)

    val report = CorpusIngest.vocabDriftReport(spark, cfg, sinceBatch = 2L,
        minShare = 0.05)
      .select("word", "recent_share", "hist_share", "shift")
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // the planted newcomer: 9/10 of the recent batch, absent from history
    val (bRecent, bHist, bShift) = report("blockchain")
    assert(bRecent == 0.9 && bHist == 0.0 && bShift == 0.9, report.toString)
    // the historically dominant word collapsed in the recent batch
    val (sRecent, sHist, sShift) = report("stable")
    assert(sRecent == 0.1, report.toString)
    assert(sHist == 18.0 / 30.0 && sShift < -0.4, report.toString)
    // read-only: the report took no lock and wrote nothing new
    assert(new java.io.File(s"$root/mg").exists())
    graft.Caching.releaseAll()
  }
}
