package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Double])*) =
    rows.toDF("vec_id", "embedding")

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val df = emb((0L, Seq(1.0, 0.0))).select(
      VectorOps.cosine("embedding", "embedding").as("self"))
    assert(df.as[Double].head() == 1.0)
    val two = Seq((Seq(1.0, 0.0), Seq(0.0, 2.0))).toDF("a", "b")
    assert(two.select(VectorOps.cosine("a", "b")).as[Double].head() == 0.0)
  }

  test("annBruteForce ranks by cosine desc with id tiebreak, excludes self") {
    // probe = id 0 (0 % 100 == 0); neighbors along decreasing angle
    val df = emb(
      (0L, Seq(1.0, 0.0)),
      (1L, Seq(1.0, 0.1)),   // closest
      (2L, Seq(1.0, 1.0)),
      (3L, Seq(0.0, 1.0)),   // orthogonal
      (4L, Seq(1.0, 0.1)))   // tie with 1 -> ranked after by id
    val out = VectorOps.annBruteForce(df, probeMod = 100, k = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(out == Set((0L, 1L, 1), (0L, 4L, 2), (0L, 2L, 3)))
  }

  test("annFiltered restricts candidates but not probes; ranks re-pack within the allowed set") {
    val df = emb(
      (0L, Seq(1.0, 0.0)),   // probe — NOT in the allowed set, still queries
      (1L, Seq(1.0, 0.1)),   // closest overall but filtered OUT
      (2L, Seq(1.0, 1.0)),   // allowed
      (3L, Seq(0.0, 1.0)),   // allowed
      (4L, Seq(1.0, 0.2)))   // allowed — closest among allowed
    val allowed = Seq(2L, 3L, 4L).toDF("doc_id")
    val out = VectorOps.annFiltered(df, allowed, probeMod = 100, k = 3)
      .as[(Long, Long, Int)].collect().toSet
    // rank 1 goes to the best ALLOWED neighbor; the filtered-out id 1 never
    // appears and ranks are dense within the allowed set
    assert(out == Set((0L, 4L, 1), (0L, 2L, 2), (0L, 3L, 3)))
  }

  test("annIvf searches only nprobe buckets and never returns the probe itself") {
    // centroids: ids 0, 25; two clusters around x-axis and y-axis
    val rows = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.9, 0.1)), (2L, Seq(0.95, 0.05)),
      (25L, Seq(0.0, 1.0)), (26L, Seq(0.1, 0.9)), (27L, Seq(0.05, 0.95)))
    val out = VectorOps.annIvf(emb(rows: _*), centroidMod = 25, probeMod = 100,
      nprobe = 1, k = 10).as[(Long, Long, Int)].collect()
    val neighbors = out.map(_._2).toSet
    assert(out.forall(_._1 == 0L))
    assert(!neighbors.contains(0L))
    // nprobe=1: only the x-cluster bucket is searched
    assert(neighbors.subsetOf(Set(1L, 2L)))
  }

  test("frozen-centroid IVF: appended vectors never re-train the codebook; " +
      "split build equals monolithic; parquet round-trip serves identically") {
    // seed = even ids (centroids: ids 0, 50); odd ids appended after freeze.
    // id 75 would be a centroid under per-batch re-training (75 % 25 == 0)
    // but is odd, so it must stay a plain bucket member.
    val all = emb(
      (0L, Seq(1.0, 0.0)), (50L, Seq(0.0, 1.0)),
      (2L, Seq(1.0, 0.1)), (4L, Seq(0.1, 1.0)),
      (75L, Seq(0.0, 0.9)), (3L, Seq(1.0, 0.2)))
    val seed = all.filter(pmod($"vec_id", lit(2)) === 0)
    val late = all.filter(pmod($"vec_id", lit(2)) === 1)
    val cents = VectorOps.ivfCentroids(seed)
    assert(cents.select("centroid_id").as[Long].collect().toSet == Set(0L, 50L))
    val split = VectorOps.ivfBuckets(cents, seed)
      .unionByName(VectorOps.ivfBuckets(cents, late))
    val mono = VectorOps.ivfBuckets(cents, all)
    assert(split.select($"vec_id", $"centroid_id").as[(Long, Long)].collect().toSet
      == mono.select($"vec_id", $"centroid_id").as[(Long, Long)].collect().toSet)
    // the appended 75 joined 50's bucket as a member, not a centroid
    assert(split.filter($"vec_id" === 75L).select("centroid_id")
      .as[Long].head() == 50L)
    val direct = VectorOps.ivfSearchIndexed(cents, split,
      all.filter(pmod($"vec_id", lit(100)) === 0), k = 3)
      .as[(Long, Long, Int)].collect().toSet
    // persisted index: parquet round-trip of codebook + buckets serves the
    // same search result (the on-disk form IS the index)
    val tmp = java.nio.file.Files.createTempDirectory("ivfidx").toString
    cents.write.parquet(s"$tmp/centroids")
    split.write.parquet(s"$tmp/buckets")
    val served = VectorOps.ivfSearchIndexed(
      spark.read.parquet(s"$tmp/centroids"),
      spark.read.parquet(s"$tmp/buckets"),
      all.filter(pmod($"vec_id", lit(100)) === 0), k = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(served == direct && direct.nonEmpty)
  }

  test("ivf with nprobe=2 reaches both buckets") {
    val rows = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.9, 0.1)),
      (25L, Seq(0.0, 1.0)), (26L, Seq(0.1, 0.9)))
    val out = VectorOps.annIvf(emb(rows: _*), centroidMod = 25, probeMod = 100,
      nprobe = 2, k = 10).as[(Long, Long, Int)].collect()
    assert(out.map(_._2).toSet == Set(1L, 25L, 26L))
  }

  test("brute-force plan broadcasts the probe side (no shuffled product)") {
    val df = emb((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
    val plan = VectorOps.annBruteForce(df).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(500))
    assert(!plan.contains("CartesianProduct"))
  }

  test("multi-probe near-dup recalls a pair straddling a centroid boundary") {
    // centroids: 0 -> x-axis, 25 -> y-axis. Planted near-dups 1 and 2 sit on
    // the bisector, each nearest a DIFFERENT centroid — single-probe puts
    // them in different buckets and misses the pair; multi-probe finds it.
    val rows = Seq(
      (0L, Seq(1.0, 0.0)), (25L, Seq(0.0, 1.0)),
      (1L, Seq(0.72, 0.69)), (2L, Seq(0.69, 0.72)),
      (3L, Seq(0.95, 0.05)), (26L, Seq(0.05, 0.95)))
    val df = emb(rows: _*)
    def pairs(np: Int) =
      VectorOps.embeddingNearDupPairs(df, centroidMod = 25, threshold = 0.99,
        nprobe = np).select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    // brute-force ground truth: both within-cluster pairs + the boundary pair
    val v = df.select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val brute = v.select(col("vec_id").as("vec_a"), col("e").as("ea"))
      .join(v.select(col("vec_id").as("vec_b"), col("e").as("eb")),
        col("vec_a") < col("vec_b"))
      .filter(VectorOps.cosine("ea", "eb") >= 0.99)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(brute == Set((0L, 3L), (25L, 26L), (1L, 2L)))
    // single-probe finds the within-bucket pairs but loses the boundary pair
    assert(pairs(1) == brute - ((1L, 2L)))
    assert(pairs(2) == brute)
  }

  test("SRP-LSH finds near-identical pairs and never reports cos below threshold") {
    // near-identical vectors agree on every hyperplane sign -> always share
    // all bands; the orthogonal vector should never pair above threshold
    val rows = Seq(
      (1L, Seq(0.8, 0.6, 0.1, 0.2)),
      (2L, Seq(0.8, 0.6, 0.1, 0.21)),   // cos ~ 0.9999 with 1
      (3L, Seq(-0.6, 0.8, 0.0, 0.0)),   // orthogonal-ish to 1/2
      (4L, Seq(0.81, 0.59, 0.1, 0.2)))  // cos ~ 0.9999 with 1
    val out = VectorOps.srpNearDupPairs(emb(rows: _*), threshold = 0.9)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L), (1L, 4L), (2L, 4L)))
    // deterministic: a second run returns the identical pair set
    val again = VectorOps.srpNearDupPairs(emb(rows: _*), threshold = 0.9)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(again == out)
  }

  test("bucket-size guard bounds pair generation on a clustered corpus") {
    // 60 near-identical vectors, single centroid (only id 0 % 1000 == 0):
    // unguarded, one bucket generates all C(60,2) = 1770 pairs in one task.
    val rows = (0L until 60L).map(i => (i, Seq(1.0, i * 1e-6)))
    val df = emb(rows: _*)
    def n(cap: Int) = VectorOps.embeddingNearDupPairs(df, centroidMod = 1000,
      threshold = 0.5, nprobe = 2, maxBucket = cap).count()
    assert(n(4096) == 1770L)             // cap not reached: full bucket pairing
    val guarded = n(10)                  // 6 hash sub-buckets of ~10
    assert(guarded > 0L && guarded < 600L,
      s"expected bounded sub-bucket pairing, got $guarded")
  }

  test("kmeansAssign separates two obvious clusters and converges members to their centroid") {
    // ids 0 and 25 are the seeds (mod 25): 0 sits in cluster A, 25 in cluster B
    val a = Seq(1.0, 0.0); val b = Seq(0.0, 1.0)
    def jitter(v: Seq[Double], eps: Double) = Seq(v(0) + eps, v(1) - eps)
    val rows = Seq(
      0L -> a, 1L -> jitter(a, 0.01), 2L -> jitter(a, 0.02), 3L -> jitter(a, -0.01),
      25L -> b, 26L -> jitter(b, 0.01), 27L -> jitter(b, -0.02), 28L -> jitter(b, 0.02))
    val out = VectorOps.kmeansAssign(emb(rows: _*), iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(Set(0L, 1L, 2L, 3L).forall(id => out(id) == 0L))
    assert(Set(25L, 26L, 27L, 28L).forall(id => out(id) == 25L))
  }

  test("quantizeInt8: endpoints map to 0/255, midpoint rounds, flat dims quantize to 0") {
    val out = VectorOps.quantizeInt8(emb(
      0L -> Seq(0.0, 5.0),
      1L -> Seq(1.0, 5.0),
      2L -> Seq(0.5, 5.0))).collect()
      .map(r => r.getAs[Long]("vec_id") -> r).toMap
    // dim 0 range [0,1]: 0.0->q0, 1.0->q255, 0.5->round(127.5)=128; dim 1 flat -> 0
    assert(out(0L).getAs[Long]("q_sum") == 0L)
    assert(out(1L).getAs[Long]("q_sum") == 255L)
    assert(out(2L).getAs[Long]("q_sum") == 128L)
    assert(out.values.forall(_.getAs[Long]("dim") == 2L))
    // exact grid points reconstruct exactly: zero scaled error
    assert(out(0L).getAs[Double]("recon_mae_e12") == 0.0)
    assert(out(1L).getAs[Double]("recon_mae_e12") == 0.0)
  }

  test("annPq ranks an exact duplicate of the probe first and never returns the probe") {
    val rows = Seq(
      0L -> Seq(1.0, 0.0, 0.0, 1.0),     // codeword
      1L -> Seq(0.0, 0.9, 0.9, 0.0),
      2L -> Seq(0.0, 1.0, 1.0, 0.0),     // codeword
      3L -> Seq(0.1, 1.0, 1.0, 0.1),
      4L -> Seq(1.0, 0.1, 0.1, 1.0),     // probe (and codeword, mod 2)
      5L -> Seq(1.0, 0.1, 0.1, 1.0))     // exact duplicate of the probe
    val out = VectorOps.annPq(emb(rows: _*), m = 2, codebookMod = 2,
        probeMod = 4, k = 3)
      .as[(Long, Long, Int)].collect()
    assert(!out.exists(r => r._1 == r._2), "probe must never be its own neighbor")
    val probe4 = out.filter(_._1 == 4L).sortBy(_._3)
    assert(probe4.head._2 == 5L, s"duplicate must rank first: ${probe4.toSeq}")
    assert(probe4.map(_._3).toSeq == (1 to probe4.length).toSeq)
    assert(probe4.length <= 3)
  }

  test("annIvfPq prunes to the probe's buckets and scores by integer ADC") {
    val rows = Seq(
      0L -> Seq(1.0, 0.0, 1.0, 0.0),  // centroid, probe (mod 100), codeword
      2L -> Seq(1.0, 0.0, 1.0, 0.0),  // exact dup of probe: codes cw0/cw0, ADC 0
      3L -> Seq(0.4, 0.6, 1.0, 0.0),  // bucket 0, but first sub encodes cw25 → ADC > 0
      25L -> Seq(0.0, 1.0, 0.0, 1.0), // other centroid + codeword (own bucket)
      26L -> Seq(0.1, 0.9, 0.1, 0.9)) // y-bucket: pruned despite PQ scoring it
    val out = VectorOps.annIvfPq(emb(rows: _*), centroidMod = 25, probeMod = 100,
        nprobe = 1, m = 2, codebookMod = 25, k = 10)
      .as[(Long, Long, Int)].collect().toSet
    // nprobe=1: only the probe's own bucket is scored (25/26 never appear);
    // within it the integer ADC orders the same-code duplicate before the
    // vector whose first subspace quantized to the far codeword
    assert(out == Set((0L, 2L, 1), (0L, 3L, 2)))
  }

  private def prepared(rows: (Long, Seq[Double])*) =
    emb(rows: _*).select(col("vec_id"),
        col("embedding").cast("array<double>").as("e"))
      .withColumn("n", sqrt(VectorOps.dot("e", "e")))

  test("hierarchical assignment degenerates to the flat argmax when every " +
      "centroid is a meta") {
    val v = prepared(
      1L -> Seq(1.0, 0.1, 0.0, 0.0),
      2L -> Seq(0.1, 1.0, 0.0, 0.0),
      3L -> Seq(0.0, 0.1, 1.0, 0.0),
      4L -> Seq(0.5, 0.5, 0.1, 0.0))
    val cents = VectorOps.ivfCentroids(emb(
      0L -> Seq(1.0, 0.0, 0.0, 0.0),
      25L -> Seq(0.0, 1.0, 0.0, 0.0),
      50L -> Seq(0.0, 0.0, 1.0, 0.0)), centroidMod = 25)
    val flat = VectorOps.ivfAssign(cents, v)
      .select("vec_id", "centroid_id").as[(Long, Long)].collect().toSet
    // metaMod = 1: metas == centroids, each routes to itself (cos 1 with
    // itself beats every distinct direction), so the two-level argmax must
    // reproduce the flat assignment exactly
    val hier = VectorOps.ivfAssignHier(cents, v, metaMod = 1)
      .as[(Long, Long)].collect().toSet
    assert(hier == flat, s"hier $hier vs flat $flat")
  }

  test("hierarchical search routes through the probe's nearest metas only") {
    // metas: ids 0 (x-axis) and 100 (z-axis); children 25 / 125 route to
    // their nearest meta; vectors 1 and 2 land under different metas
    val cents = emb(
      0L -> Seq(1.0, 0.0, 0.0, 0.0),
      25L -> Seq(0.9, 0.1, 0.0, 0.0),
      100L -> Seq(0.0, 0.0, 1.0, 0.0),
      125L -> Seq(0.0, 0.0, 0.9, 0.1))
      .select(col("vec_id").as("centroid_id"),
        col("embedding").cast("array<double>").as("ce"))
      .withColumn("cn", sqrt(VectorOps.dot("ce", "ce")))
    val v = prepared(
      1L -> Seq(1.0, 0.05, 0.0, 0.0),   // under meta 0's subtree
      2L -> Seq(0.0, 0.0, 1.0, 0.05))   // under meta 100's subtree
    val assigns = VectorOps.ivfAssignHier(cents, v, metaMod = 100)
    val probes = emb(900L -> Seq(0.8, 0.0, 0.6, 0.0))
    // metaProbe = 1: the probe's single nearest meta is the x-axis, so the
    // z-subtree vector is never a candidate despite its 0.6 cosine
    val narrow = VectorOps.ivfSearchHier(cents, assigns, v, probes,
        metaMod = 100, metaProbe = 1, nprobe = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(narrow == Set((900L, 1L, 1)), s"got $narrow")
    // metaProbe = 2, nprobe = 2 STILL excludes the z-subtree: nprobe picks
    // the globally closest children (canonical IVF — probe the nprobe
    // nearest inverted lists), and both x-children outrank every z-child
    val stillNarrow = VectorOps.ivfSearchHier(cents, assigns, v, probes,
        metaMod = 100, metaProbe = 2, nprobe = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(stillNarrow == Set((900L, 1L, 1)), s"got $stillNarrow")
    // widening nprobe past the x-children reaches the z-subtree's bucket
    val wide = VectorOps.ivfSearchHier(cents, assigns, v, probes,
        metaMod = 100, metaProbe = 2, nprobe = 4)
      .as[(Long, Long, Int)].collect().toSet
    assert(wide == Set((900L, 1L, 1), (900L, 2L, 2)), s"got $wide")
  }

  test("hier-routed Lloyd retrain degenerates to the flat retrain at " +
      "metaMod 1 and still separates obvious clusters") {
    // two tight clusters around the x and y axes; seeds (ids 0, 25) start
    // slightly off-center — the refined means must move toward their
    // cluster's true mean in both routing modes, and metaMod = 1 (every
    // centroid its own meta) must reproduce the flat retrain bit-exactly
    val v = prepared((0L until 40L).map { i =>
      if (i % 2 == 0) i -> Seq(1.0, 0.02 * (i % 5), 0.0, 0.0)
      else i -> Seq(0.02 * (i % 5), 1.0, 0.0, 0.0)
    }: _*)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("centroid_id"), col("ce")).as[(Long, Seq[Double])]
        .collect().toMap
    val flat = rows(VectorOps.kmeansCentroids(v, centroidMod = 25))
    val degenerate = rows(VectorOps.kmeansCentroidsHier(v, centroidMod = 25,
      metaMod = 1))
    assert(degenerate == flat,
      s"metaMod=1 hier retrain diverged from the flat retrain")
    // centroid 0 (even seeds -> x cluster) must refine toward x dominance
    val c0 = flat(0L)
    assert(c0.head > 0.9 && c0(1) < 0.2, s"x centroid did not converge: $c0")
  }

  test("srpRebandPlan fires at the documented threshold and not below, " +
      "widens to the occupancy target, and respects the Long-width cap") {
    // exact-occupancy fixture: nBands bands, bv = vec_id % buckets gives
    // n/buckets rows per bucket, so cand_rows_per_vec = nBands·n/buckets
    // and perBand load = n/buckets EXACTLY — no SRP randomness in the pin
    def bandsOf(n: Long, nBands: Int, buckets: Int) =
      spark.range(n).select(col("id").as("vec_id"))
        .crossJoin(spark.range(nBands).select(col("id").cast("int").as("band")))
        .select(col("vec_id"), col("band"), pmod(col("vec_id"), lit(buckets))
          .cast("long").as("bv"))
    def plan(n: Long, buckets: Int, bits: Int = 16, bandBits: Int = 4) =
      VectorOps.srpRebandPlan(
        VectorOps.srpBandHealth(bandsOf(n, bits / bandBits, buckets)),
        bits, bandBits)
    // fire threshold = 4 × 64 = 256 rows/band, strict: AT the threshold
    // stays healthy, one bucket-width above fires
    assert(plan(4096L, 16).isEmpty, "perBand = 256 must NOT fire (strict >)")
    assert(plan(4160L, 16).contains((28, 7)),
      "perBand = 260 must widen by ceil(log2(260/64)) = 3 bits per band")
    // the widened width projects back to <= target: 260 / 2^3 = 32.5
    // deep overload widens further in one step: perBand = 4096 -> +6 bits
    assert(plan(65536L, 16).contains((40, 10)))
    // healthy index, empty index: no plan
    assert(plan(1024L, 16).isEmpty, "perBand = 64 is the operating point")
    assert(VectorOps.srpRebandPlan(VectorOps.srpBandHealth(
      bandsOf(0L, 4, 16)), 16, 4).isEmpty)
    // Long-width cap: 4 bands at 15 bits is the ceiling (4×16 > 63) —
    // an overloaded index that cannot widen reports healthy-by-ceiling
    assert(plan(8192L, 16, bits = 60, bandBits = 15).isEmpty,
      "at the Long-width ceiling the plan must refuse, not overflow")
    graft.Caching.releaseAll()
  }

  test("semanticDedup drops higher-id near-copies, keeps dissimilar vectors") {
    // one centroid (id 0 % 25 == 0) → one cluster; 1 and 2 are near-copies
    // of 0 (dropped: 0 is the lowest id of the similar group); 3 is
    // orthogonal to everything (kept) even though it shares the cluster
    val df = emb(
      (0L, Seq(1.0, 0.0)),
      (1L, Seq(1.0, 0.0)),
      (2L, Seq(0.99, 0.05)),
      (3L, Seq(0.0, 1.0)))
    val out = VectorOps.semanticDedup(df, threshold = 0.4)
      .as[(Long, Long, Boolean)].collect().map { case (id, _, k) => id -> k }.toMap
    assert(out == Map(0L -> true, 1L -> false, 2L -> false, 3L -> true))
    graft.Caching.releaseAll()
  }
}
