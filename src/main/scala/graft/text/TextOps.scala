package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Caching

/**
 * Text-analysis and deduplication operators for large-scale training-data
 * pipelines (the extended surface beyond the reference — builder brief; the
 * reference's own string layer stops at sanitization/regex,
 * reference: binlog2sql_util.py:180-193, matomo2clickhouse.py:108-122).
 *
 * Design for 100 TB:
 *  - near-dup detection NEVER does all-pairs: MinHash/SimHash signatures are
 *    banded and candidate pairs come from equi-joins on band values, so the
 *    shuffle key is the band signature and cost is proportional to bucket
 *    collisions, not n²;
 *  - every hash is deterministic and engine-portable (md5-derived 60-bit
 *    ints), so results are reproducible across runs/engines and the DuckDB
 *    oracle can replay them bit-for-bit;
 *  - all operators are pure column expressions (whole-stage codegen) — no
 *    UDFs, no driver-side loops.
 */
object TextOps {

  /** Portable 60-bit hash: first 15 hex digits of md5, as a positive long.
    * Identical in DuckDB as CAST(CONCAT('0x', substr(md5(s),1,15)) AS BIGINT). */
  def hash64(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Whitespace-collapsed, trimmed, lower-cased canonical text form. */
  def normalizeText(c: Column): Column = lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Word array of the normalized text (no empty tokens by construction). */
  def wordsOf(c: Column): Column = split(normalizeText(c), " ")

  // ---------------------------------------------------------------- shingles

  /** Distinct word n-gram shingles: (doc_id, shingle). Docs shorter than n
    * words produce no shingles (and therefore never pair). */
  def shingles(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    rawShingles(docs, idCol, textCol, n).distinct()

  /** Distinct HASHED shingles (doc_id, h) — the 60-bit portable hash of each
    * distinct word n-gram. The dedup join/verify stages operate on the 8-byte
    * hash instead of the shingle string: the distinct, every equi-join, the
    * collected sets, and the merge-intersections all move/compare primitive
    * longs (~3× smaller shuffle payload than the avg shingle). The oracle
    * replays the identical md5-derived hashes, so set sizes and intersection
    * counts — hash collisions included — match bit-for-bit across engines. */
  def hashedShingles(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame =
    rawShingles(docs, idCol, textCol, n)
      .select(col("doc_id"), hash64(col("shingle")).as("h"))
      .distinct()

  /** Non-distinct word n-gram shingles: (doc_id, shingle) with duplicates
    * kept — for consumers whose aggregation dedups anyway (min, collect_set),
    * saving the distinct's exchange.
    *
    * The doc frame is hash-repartitioned on doc_id BEFORE the explode: a
    * shingle explode is a ~100–300× row blowup, and a small corpus read
    * (one parquet file → one scan partition) would otherwise hash every
    * shingle on a single core. Repartitioning the cheap pre-explode side
    * also pre-satisfies the per-doc distribution every downstream
    * signature/window aggregation requires, so the exploded rows are never
    * themselves shuffled. */
  def rawShingles(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame =
    docs.select(col(idCol).as("doc_id"), wordsOf(col(textCol)).as("w"))
      .filter(size(col("w")) >= n)
      .transform(graft.Spread.byKey(_, col("doc_id")))
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(w) - $n), i -> concat_ws(' ', slice(w, i + 1, $n)))"))
        .as("shingle"))

  // ----------------------------------------------------------------- minhash

  /** Cap for the second hash so `h1 + 11*h2` stays inside a signed 64-bit
    * long (11 · 2^58 + 2^60 < 2^63) — identical arithmetic in the oracle. */
  val MinhashH2Mod: Long = 1L << 58

  /** k minhashes per doc via double hashing (Kirsch–Mitzenmacher):
    * h_j = min over shingles of (h1 + j·h2) with h1 = hash64(shingle),
    * h2 = hash64(shingle#) mod 2^58. Two md5s per shingle instead of k —
    * the hash CPU was the dominant cost of the LSH pipeline — while staying
    * overflow-free, engine-portable, and codegen-friendly. */
  def minhashSignature(shingled: DataFrame, k: Int = 12): DataFrame = {
    val hashed = shingled.select(col("doc_id"),
      hash64(col("shingle")).as("h1"),
      pmod(hash64(concat(col("shingle"), lit("#"))), lit(MinhashH2Mod)).as("h2"))
    val aggs = (0 until k).map(j =>
      min(col("h1") + lit(j.toLong) * col("h2")).as(s"h$j"))
    hashed.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** Banded signature: (doc_id, band, sig) — b = k/r bands of r rows each.
    * Docs sharing any (band, sig) are candidate near-dup pairs. */
  def lshBands(sig: DataFrame, k: Int = 12, r: Int = 3): DataFrame = {
    require(k % r == 0, s"k=$k not divisible by band rows r=$r")
    val bands = (0 until k / r).map { b =>
      struct(lit(b).as("band"),
        concat_ws(",", (0 until r).map(i => col(s"h${b * r + i}")): _*).as("sig"))
    }
    sig.select(col("doc_id"), explode(array(bands: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** Candidate pairs (a < b) from band-bucket collisions — an equi-join on
    * (band, sig), never an all-pairs product. */
  def lshCandidatePairs(bands: DataFrame): DataFrame =
    bands.alias("x").join(bands.alias("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()

  /** Set-intersection size of two SORTED distinct string arrays: the native
    * codegen'd merge counter (graft.functions.IntersectCount) when the
    * session carries GraftExtensions, with `array_intersect` as the
    * composable fallback — same count either way; the native form runs an
    * allocation-free two-pointer loop instead of a per-pair hash set. */
  private def intersectCount(a: String, b: String): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    if (spark.catalog.functionExists("graft_intersect_count"))
      expr(s"graft_intersect_count($a, $b)")
    else size(array_intersect(col(a), col(b))).cast("long")
  }

  /** Exact n-gram Jaccard verification of candidate pairs: keep pairs with
    * similarity >= threshold. Input is the HASHED shingle frame (doc_id, h)
    * of [[hashedShingles]]; the intersect/union counts come from the hash
    * sets collected per doc (bounded by doc length, not corpus); sets are
    * sorted at aggregation time so the native merge counter applies. */
  def verifiedNearDupPairs(hashed: DataFrame, candidates: DataFrame,
      threshold: Double = 0.8): DataFrame = {
    // `sets` feeds two joins (doc_a and doc_b side); cache so the shingle
    // scan + collect_set shuffle evaluates once, not once per side
    val sets = Caching.scoped(hashed.groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("h"))).as("s"), count(lit(1)).as("n")))
    candidates
      .join(sets.select(col("doc_id").as("doc_a"), col("s").as("sa"), col("n").as("na")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("s").as("sb"), col("n").as("nb")), "doc_b")
      .withColumn("i", intersectCount("sa", "sb"))
      .withColumn("jaccard",
        col("i").cast("double") / (col("na") + col("nb") - col("i")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** End-to-end MinHash/LSH near-dup pairs over a document table.
    *
    * Plan shape: ONE codegen'd pass computes the exploded shingles and both
    * md5 hashes, persisted; the signature groupBy and the set-collect groupBy
    * both read from that cache. No `distinct()` — `min` and `collect_set`
    * dedup inside their own aggregation, so the distinct's separate exchange
    * (the largest in the pipeline) is dropped. The band-bucket self-join is
    * the one shuffle the algorithm inherently needs; `banded` is cached so
    * the signature subtree does not evaluate once per join side. At 100 TB
    * the same move is materializing signatures to a table first. A HOF
    * (array-transform) variant was measured 2× SLOWER: lambda bodies are
    * interpreted per element, losing whole-stage codegen over the md5s. */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 12, r: Int = 3, threshold: Double = 0.8): DataFrame = {
    // one implementation for self-join and ingest paths: the index builder
    // caches the shingle scan; the bands additionally cache here because
    // the candidate self-join reads them twice
    val (bands, sets) = minhashIndex(docs, idCol, textCol, n, k, r)
    minhashNearDupsIndexed(Caching.scoped(bands), sets, threshold)
  }

  /**
   * Incremental near-dup probe: a NEW BATCH of documents checked against an
   * EXISTING CORPUS — the shape every production dedup actually runs at
   * 100 TB. The corpus's banded MinHash signatures are the stand-in for a
   * materialized signature index (built once, appended per ingest); the
   * batch computes its own signatures and the candidate join is
   * batch-bands ⋈ index-bands on (band, sig) — cost proportional to the
   * BATCH, never a corpus self-join, never a corpus rescan. Same
   * double-hashed signatures and exact-Jaccard verify as
   * [[minhashNearDups]], so a batch pair surfaces iff the self-join on the
   * concatenated corpus would surface it. Output: (batch_id, corpus_id,
   * jaccard).
   */
  def minhashProbe(corpus: DataFrame, batch: DataFrame, idCol: String,
      textCol: String, n: Int = 3, k: Int = 12, r: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    val (cb, cs) = minhashIndex(corpus, idCol, textCol, n, k, r)
    minhashProbeIndexed(cb, cs, batch, idCol, textCol, n, k, r, threshold,
      pushIdLimit = 0)
  }

  /** The PERSISTED form of a corpus's near-dup index: banded MinHash
    * signatures (doc_id, band, sig) and sorted shingle-hash sets
    * (doc_id, s, n) built from ONE cached shingle scan — exactly what an
    * ingest pipeline appends per accepted batch (see
    * [[graft.stream.CorpusIngest]]) so later batches probe the index
    * instead of rescanning the corpus. */
  def minhashIndex(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 12, r: Int = 3): (DataFrame, DataFrame) = {
    val ex = Caching.scoped(
      rawShingles(docs, idCol, textCol, n)
        .select(col("doc_id"), col("shingle"),
          hash64(col("shingle")).as("h1"),
          pmod(hash64(concat(col("shingle"), lit("#"))), lit(MinhashH2Mod)).as("h2")))
    val aggs = (0 until k).map(j =>
      min(col("h1") + lit(j.toLong) * col("h2")).as(s"h$j"))
    val bands = lshBands(ex.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*), k, r)
    val sets = ex.groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("h1"))).as("s"))
      .select(col("doc_id"), col("s"), size(col("s")).cast("long").as("n"))
    (bands, sets)
  }

  /** Within-corpus near-dup pairs from PREBUILT index frames — the same
    * candidates + exact-Jaccard verify as [[minhashNearDups]], for callers
    * (the ingest loop) that already hold the index and must not pay the
    * shingle scan again. */
  def minhashNearDupsIndexed(bands: DataFrame, sets: DataFrame,
      threshold: Double = 0.8): DataFrame =
    lshCandidatePairs(bands)
      .join(sets.select(col("doc_id").as("doc_a"), col("s").as("sa"), col("n").as("na")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("s").as("sb"), col("n").as("nb")), "doc_b")
      .withColumn("i", intersectCount("sa", "sb"))
      .withColumn("jaccard",
        col("i").cast("double") / (col("na") + col("nb") - col("i")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))

  /** Probe a batch against a persisted index: candidates from the
    * batch-bands ⋈ index-bands equi-join, exact-Jaccard verified against
    * the index's stored shingle sets — cost proportional to the BATCH. */
  // no default args here: its frames-overload sibling carries them and
  // Scala forbids defaults on both alternatives
  def minhashProbeIndexed(indexBands: DataFrame, indexSets: DataFrame,
      batch: DataFrame, idCol: String, textCol: String, n: Int,
      k: Int, r: Int, threshold: Double,
      pushIdLimit: Int): DataFrame = {
    val (bb, bs) = minhashIndex(batch, idCol, textCol, n, k, r)
    // cached when the pushdown is on: the collect below and the verify
    // join must not re-pay the batch's shingle scan
    val (cb, cs) =
      if (pushIdLimit > 0)
        (graft.Caching.scoped(bb), graft.Caching.scoped(bs))
      else (bb, bs)
    minhashProbeIndexed(indexBands, indexSets, cb, cs, threshold, pushIdLimit)
  }

  /** As above, with the batch's index frames PREBUILT by the caller.
    *
    * `pushIdLimit` > 0 enables the cap-bounded candidate pushdown (the
    * [[graft.stream.UnionFind]] MaxLabelFetchIds pattern): the candidate
    * corpus ids — few at steady state, one per near-dup hit — collect to
    * the driver (limit+1 guard) and push into the index-sets read as an
    * IN filter, so the verify join reads the candidates' row groups
    * instead of scanning the corpus-sized shingle-set column; a sorted
    * persisted layout (the compact fold orders sets by doc_id) makes the
    * parquet min/max stats prune to near-zero IO. Over the cap (a burst
    * of near-dups) it falls back to the full verify join — correct
    * either way, the pushdown only prunes. Keep the cap at or below the
    * session's parquet IN-pushdown threshold (1000 in
    * [[graft.Sessions]]); above it Spark degrades the push to a min/max
    * range that prunes nothing for scattered ids. 0 = off (the
    * in-session callers, whose index frames are not parquet scans). */
  def minhashProbeIndexed(indexBands: DataFrame, indexSets: DataFrame,
      batchBands: DataFrame, batchSets: DataFrame,
      threshold: Double, pushIdLimit: Int = 0): DataFrame = {
    val candidates0 = batchBands.alias("b")
      .join(indexBands.alias("c"),
        col("b.band") === col("c.band") && col("b.sig") === col("c.sig") &&
          col("b.doc_id") =!= col("c.doc_id"))
      .select(col("b.doc_id").as("batch_id"), col("c.doc_id").as("corpus_id"))
      .distinct()
    // cached when the pushdown collects it: the candidate frame must not
    // recompute the bands join once for the collect and again for the
    // verify
    val candidates =
      if (pushIdLimit > 0) graft.Caching.scoped(candidates0) else candidates0
    val verifySets =
      if (pushIdLimit <= 0) indexSets
      else {
        val ids = candidates.select(col("corpus_id")).distinct()
          .limit(pushIdLimit + 1).collect().map(_.getLong(0))
        if (ids.length > pushIdLimit) indexSets // burst: full verify join
        else indexSets.filter(col("doc_id").isin(ids.map(Long.box): _*))
      }
    candidates
      .join(batchSets.select(col("doc_id").as("batch_id"),
        col("s").as("sa"), col("n").as("na")), "batch_id")
      .join(verifySets.select(col("doc_id").as("corpus_id"),
        col("s").as("sb"), col("n").as("nb")), "corpus_id")
      .withColumn("i", intersectCount("sa", "sb"))
      .withColumn("jaccard",
        col("i").cast("double") / (col("na") + col("nb") - col("i")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("batch_id"), col("corpus_id"), col("jaccard"))
  }

  /**
   * EXACT n-gram Jaccard near-dup pairs via prefix filtering (the PPJoin
   * family) — the no-false-negative member of the dedup suite, where
   * MinHash/SimHash trade recall for speed:
   *
   *  - shingles are globally ordered by document frequency (rarest first,
   *    lexical tiebreak — a total order both engines reproduce bit-for-bit);
   *  - a doc of n shingles exposes only its first (n - ceil(t·n) + 1)
   *    shingles as join keys: two sets with J ≥ t MUST share one inside
   *    these prefixes (pigeonhole), so the candidate join touches the rare
   *    end of the frequency spectrum instead of every posting;
   *  - the length filter min(na,nb) ≥ t·max(na,nb) prunes before the
   *    verify, since J ≤ min/max;
   *  - surviving candidates get the exact set-intersection Jaccard.
   *
   * Scale: the equi-join key is the prefix shingle — cost follows the
   * document frequency of RARE shingles (bounded bucket sizes), never the
   * full inverted index; everything else is groupBy/window shuffles on
   * doc_id. Exactness costs one df-computation pass more than LSH.
   */
  def jaccardNearDups(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val sh = hashedShingles(docs, idCol, textCol, n)
    val freq = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy(col("doc_id"))
    // ranked is the ONLY materialization of the exploded frame: the prefix
    // filter, the per-doc sizes, and the verify sets all derive from it (a
    // second scan of `sh` would repeat the explode + two shuffles); the
    // rarity order ties on the HASH (df asc, h asc) — portable because the
    // oracle ranks the same hashes
    val ranked0 = sh.join(freq, "h")
      .withColumn("rn", row_number().over(
        wDoc.orderBy(col("df").asc, col("h").asc)))
      .withColumn("n", count(lit(1)).over(wDoc))
    val ranked = Caching.scoped(ranked0)
    val prefix = ranked
      .filter(col("rn") <= col("n") - ceil(lit(threshold) * col("n")) + 1)
      .select(col("h"), col("doc_id"), col("n"))
    val candidates = prefix
      .select(col("h"), col("doc_id").as("doc_a"), col("n").as("na"))
      .join(prefix.select(col("h"), col("doc_id").as("doc_b"), col("n").as("nb")),
        Seq("h"))
      .filter(col("doc_a") < col("doc_b") &&
        least(col("na"), col("nb")) >= lit(threshold) * greatest(col("na"), col("nb")))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    verifiedNearDupPairs(ranked.select(col("doc_id"), col("h")), candidates,
      threshold)
  }

  /**
   * ASYMMETRIC containment pairs: C(a→b) = |A∩B| / |A| ≥ threshold — doc_a
   * is (mostly) INSIDE doc_b. The dedup case Jaccard structurally misses: a
   * paragraph quoted whole inside a much longer document has tiny
   * union-normalized similarity but containment ≈ 1, and training-corpus
   * policy usually wants such subsumed texts dropped too.
   *
   * Candidates come from a shingle equi-join restricted to shingles with
   * document frequency ≤ maxDf (two docs sharing ONLY corpus-hot shingles
   * are boilerplate overlap, not inclusion — and the df cap is what bounds
   * the join fan-out at corpus scale: cost is Σ df² over rare shingles,
   * never n²). Verification is exact set intersection over the FULL hashed
   * shingle sets ([[hashedShingles]] — 8-byte keys everywhere), so the
   * threshold is exact; only candidate GENERATION is df-capped, and the cap
   * is part of the operator contract the oracle replays.
   */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.9, maxDf: Int = 100): DataFrame = {
    // one distinct-hashed-shingle pass feeds the df count, the capped join,
    // and the verify sets — every downstream key/element is an 8-byte long
    val sh = Caching.scoped(hashedShingles(docs, idCol, textCol, n))
    val freq = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val rare = sh.join(freq.filter(col("df") <= maxDf), "h")
      .select(col("doc_id"), col("h"))
    val candidates = rare.alias("a")
      .join(rare.alias("b"),
        col("a.h") === col("b.h") && col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val sets = Caching.scoped(sh.groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("h"))).as("s"), count(lit(1)).as("n")))
    candidates
      .join(sets.select(col("doc_id").as("doc_a"), col("s").as("sa"), col("n").as("na")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("s").as("sb")), "doc_b")
      .withColumn("i", intersectCount("sa", "sb"))
      .withColumn("containment", col("i").cast("double") / col("na").cast("double"))
      .filter(col("containment") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("containment"))
  }

  /**
   * Winnowing fingerprints (Schleimer/Wilkerson/Aiken) — the rolling-hash
   * document fingerprint: hash every char k-gram of the normalized text,
   * slide a w-wide window over the hash sequence, keep each window's
   * minimum; the DISTINCT minima are the document's fingerprint set. The
   * guarantee: any match of length >= w + k − 1 between two documents
   * shares at least one fingerprint, at ~2/(w+1) the storage of all grams.
   * Output: doc_id, n_fingerprints, min_fp, max_fp (the set summarized by
   * order-independent aggregates — engine-portable).
   *
   * Shape: one explode of char positions (codegen'd md5 per gram), one
   * window min per doc ordered by position, one groupBy — the same
   * shuffle topology as the MinHash signature.
   */
  /** The winnowing core: (doc_id, pos, m) — every full w-window's minimum
    * k-gram hash, position-ordered. Shared by the per-doc fingerprint
    * summary and the cross-doc pair detector. */
  def winnowingMinima(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4): DataFrame = {
    val grams = docs
      .select(col(idCol).as("doc_id"), normalizeText(col(textCol)).as("__t"))
      .filter(length(col("__t")) >= k)
      // spread the cheap side before the ~300x char-gram blowup: a one-file
      // corpus read would md5 every gram on one core, and the per-doc
      // distribution is exactly what the sliding window needs, so the
      // exploded rows are never shuffled
      .transform(graft.Spread.byKey(_, col("doc_id")))
      .select(col("doc_id"), col("__t"),
        explode(expr(s"sequence(1, length(__t) - ${k - 1})")).as("pos"))
      .select(col("doc_id"), col("pos"),
        hash64(expr(s"substring(__t, pos, $k)")).as("h"))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(-(w - 1), Window.currentRow)
    grams
      .withColumn("m", min(col("h")).over(win))
      // the first w-1 windows are partial; standard winnowing starts at the
      // first FULL window so short prefixes do not over-fingerprint
      .filter(col("pos") >= w)
      .select(col("doc_id"), col("pos"), col("m"))
  }

  def winnowingFingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4): DataFrame =
    winnowingMinima(docs, idCol, textCol, k, w)
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("m")).as("n_fingerprints"),
        min(col("m")).as("min_fp"), max(col("m")).as("max_fp"))

  /**
   * Cross-document overlap pairs from shared winnowing fingerprints — the
   * plagiarism/clone-detection shape (Schleimer et al. §5): two documents
   * sharing any fingerprint share a substring of length >= w + k − 1; pairs
   * are ranked by how many DISTINCT fingerprints they share.
   *
   * Corpus-frequency guard: fingerprints present in more than `maxDf` docs
   * (ubiquitous phrases — the character-level analogue of stopwords) are
   * dropped BEFORE pairing, the same pigeonhole discipline as the LSH band
   * join: candidate generation stays an equi-join on a bounded-fanout key,
   * never quadratic in the corpus. Output: (doc_a, doc_b, n_shared).
   */
  def winnowingPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4, maxDf: Int = 20, minShared: Int = 3): DataFrame = {
    val fps = Caching.scoped(
      winnowingMinima(docs, idCol, textCol, k, w)
        .select(col("doc_id"), col("m")).distinct())
    val rare = fps.groupBy(col("m"))
      .agg(count(lit(1)).as("__df")).filter(col("__df") <= maxDf)
      .select(col("m"))
    val kept = fps.join(rare, "m")
    kept.select(col("m"), col("doc_id").as("doc_a"))
      .join(kept.select(col("m"), col("doc_id").as("doc_b")), "m")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /**
   * Exact duplicated-passage spans — substring-level deduplication. Whole-doc
   * dedup (exact or MinHash) misses documents that are mostly unique but
   * share verbatim passages (boilerplate headers, license blocks, quoted
   * articles); the training-data fix is to find the maximal token spans that
   * occur verbatim in >= 2 documents so those SPANS can be dropped or masked
   * while the rest of the document survives.
   *
   * Distributed shape, never quadratic:
   *  1. token n-gram windows per doc, hashed — a narrow explode whose
   *     parallelism is pre-spread on doc_id, so the blowup never sits on one
   *     scan partition and the rows arrive already distributed by doc;
   *  2. one groupBy(h) counting DISTINCT docs per window (two-phase partial
   *     agg) — a window is "duplicated" iff its df >= 2; a `maxDf` ceiling
   *     drops ubiquitous boilerplate windows (the token-level stop-gram
   *     guard), bounding the join fanout exactly like the LSH band joins;
   *  3. equi-join the windows back on h (small side is the duplicated-hash
   *     set — AQE broadcasts it when it fits);
   *  4. per-doc gaps-and-islands over a PARTITIONED window: positions p < q
   *     belong to one span iff q <= p + n (overlap or adjacency), so runs of
   *     duplicated windows merge into maximal spans.
   *
   * Output: (doc_id, span_start, span_end, n_windows, max_df) — token
   * offsets, 1-based inclusive; max_df is the widest sharing count among the
   * span's windows. The oracle replays the identical md5 window hashes, so
   * spans match bit-for-bit across engines.
   */
  def duplicatedPassages(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8, maxDf: Int = 64): DataFrame = {
    // wins feeds two consumers (the df agg and the join-back) and is
    // deliberately NOT cached: it is corpus-token-sized, so materializing it
    // buys a page-cached rescan at the price of a memory/disk barrier that
    // cannot fit at scale — and an A/B at sf0.1 measured the cache within
    // noise of the recompute (2.35 vs 2.43 s)
    val wins = docs
      .select(col(idCol).as("doc_id"), wordsOf(col(textCol)).as("__w"))
      .filter(size(col("__w")) >= n)
      .transform(graft.Spread.byKey(_, col("doc_id")))
      .select(col("doc_id"),
        explode(expr(s"sequence(1, size(__w) - ${n - 1})")).as("pos"),
        col("__w"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        hash64(expr(s"array_join(slice(__w, pos, $n), ' ')")).as("h"))
    val dups = wins.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= 2 && col("df") <= maxDf)
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    wins.join(dups, "h")
      .select(col("doc_id"), col("pos"), col("df"))
      // lag default -(n+1) makes the first window of every doc open a span
      .withColumn("__new",
        when(col("pos") > lag(col("pos"), 1, -(n + 1)).over(byDoc) + n, 1)
          .otherwise(0))
      .withColumn("__span", sum(col("__new")).over(byDoc))
      .groupBy(col("doc_id"), col("__span"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (n - 1)).as("span_end"),
        count(lit(1)).as("n_windows"),
        max(col("df")).as("max_df"))
      .drop("__span")
  }

  /**
   * Apply passage-level dedup: rewrite each document with its duplicated
   * spans ([[duplicatedPassages]]) removed — the span, not the document, is
   * the dedup unit, so mostly-unique documents survive with their boilerplate
   * cut out.
   *
   * Scale: no token explode at all on the rewrite side — each doc row keeps
   * its token array, the per-doc span list arrives through one equi-join on
   * doc_id (the span table is a pruned aggregate, orders smaller than the
   * corpus), and the mask is a codegen'd `filter`/`exists` over the two
   * arrays followed by an `array_join`. Docs with no spans pass through on
   * the left join's null branch. Spans are disjoint by construction (islands
   * are maximal), so membership needs no overlap resolution.
   *
   * Output: (doc_id, clean_text, n_kept, n_removed) — clean_text is the
   * normalized token stream minus every in-span token.
   */
  def applyPassageMask(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8, maxDf: Int = 64): DataFrame = {
    val spans = duplicatedPassages(docs, idCol, textCol, n, maxDf)
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("__spans"))
    docs.select(col(idCol).as("doc_id"), wordsOf(col(textCol)).as("__w"))
      .join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"), col("__w"),
        expr("filter(transform(__w, (t, i) -> struct(t AS tok, i + 1 AS pos)), " +
          "s -> __spans IS NULL OR NOT exists(__spans, " +
          "sp -> s.pos BETWEEN sp.span_start AND sp.span_end))").as("__kept"))
      .select(col("doc_id"),
        expr("array_join(transform(__kept, s -> s.tok), ' ')").as("clean_text"),
        size(col("__kept")).cast("long").as("n_kept"),
        (size(col("__w")) - size(col("__kept"))).cast("long").as("n_removed"))
  }

  // ----------------------------------------------------------------- simhash

  /** 48-bit SimHash over distinct word n-gram shingles: bit p is set iff the
    * count of shingles whose hash has bit p set is >= the count where it is
    * clear. Shingle tokens (not unigrams) are essential for discrimination on
    * narrow vocabularies — unigram SimHash collapses when all docs share one
    * word distribution. */
  def simhash(docs: DataFrame, idCol: String, textCol: String,
      bits: Int = 48, n: Int = 3): DataFrame = {
    val tokens = shingles(docs, idCol, textCol, n).withColumnRenamed("shingle", "tok")
      .withColumn("h", hash64(col("tok")))
    // plain bit sums (cheaper than a CASE per bit); bit p is set iff
    // ones >= zeros, i.e. 2*sum_p >= count — identical to the ±1-sum >= 0 form
    val bitAggs = (0 until bits).map(p =>
      sum(shiftright(col("h"), p).bitwiseAND(lit(1L))).as(s"b$p")) :+
      count(lit(1)).as("__n")
    tokens.groupBy(col("doc_id")).agg(bitAggs.head, bitAggs.tail: _*)
      .select(col("doc_id"),
        (0 until bits).map(p =>
          when(col(s"b$p") * 2 >= col("__n"), lit(1L << p)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** Near-dup pairs by SimHash: band the fingerprint into bandBits-sized
    * chunks (pigeonhole: hamming <= bands-1 guarantees a shared band),
    * equi-join on band values, verify with exact hamming distance. */
  def simhashPairs(sims: DataFrame, bits: Int = 48, bandBits: Int = 12,
      maxDist: Int = 3): DataFrame = {
    val bands = (0 until bits / bandBits).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("simhash"), b * bandBits).bitwiseAND(lit((1L << bandBits) - 1)).as("v"))
    }
    // cache before the self-join: the upstream (typically the full shingle →
    // bit-sum aggregation of `simhash`) must not evaluate once per join side
    val banded = Caching.scoped(
      sims.select(col("doc_id"), col("simhash"), explode(array(bands: _*)).as("bs"))
        .select(col("doc_id"), col("simhash"), col("bs.band").as("band"), col("bs.v").as("v")))
    banded.alias("x").join(banded.alias("y"),
        col("x.band") === col("y.band") && col("x.v") === col("y.v") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        expr("bit_count(x.simhash ^ y.simhash)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /**
   * Connected components over near-dup pairs — the step that turns pairwise
   * dedup output into CANONICAL CLUSTERS (every member labeled with the
   * minimum doc id of its component, the id a dedup pass would keep).
   * Min-label propagation to the fixpoint: each iteration every node takes
   * the minimum of its own label and its neighbors' labels; the loop stops
   * when an iteration changes nothing. The fixpoint (min id reachable from
   * each node) is unique, so the result is independent of iteration count,
   * partitioning, and engine — the oracle computes the same closure with a
   * recursive CTE.
   *
   * Scale: each iteration is one equi-join on the node id plus a groupBy —
   * O(E) shuffle per round. Three refinements keep the round count and
   * per-round job count low (measured ~2× on the benched cluster query):
   * the first propagation is folded into the seed (`least(id, min
   * neighbor)` straight off the edge list — one groupBy, no join); every
   * round path-halves with a pointer jump (`component :=
   * labels(component)`, valid because labels only decrease and any label
   * is a member of the same component), which turns the O(diameter) ripple
   * of pure propagation into O(log diameter) rounds; and the convergence
   * check rides the checkpointed frame (the pre-jump label is carried as a
   * `prev` column, so "did anything change" is a scan of materialized
   * blocks, not an extra self-join job). Near-dup components are tiny by
   * construction (a handful of variants of one document), so 1–2 rounds
   * converge after the seed. Each round's labels are eagerly
   * `localCheckpoint`ed: the new label frame references the old one TWICE
   * (propagation join + pointer jump), so without lineage truncation the
   * logical plan doubles per round — exponential analysis cost long before
   * any data is big. On a real cluster, periodic reliable `checkpoint()`
   * replaces localCheckpoint (non-replicated blocks do not survive
   * executor loss); the convergence contract is unchanged.
   */
  def connectedComponents(pairs: DataFrame, aCol: String = "doc_a",
      bCol: String = "doc_b", maxIters: Int = 50): DataFrame =
    connectedComponentsWithRounds(pairs, aCol, bCol, maxIters)._1

  /** Symmetrized-edge-row ceiling under which [[connectedComponents]]
    * collapses the graph driver-side instead of running distributed
    * propagate/jump rounds (≈ cap/2 undirected edges — the batch-bounded
    * mini graphs of the union-find increment and the probe faces).
    *
    * 100k rows of two longs is ~1.6 MB of data — comfortably driver-safe
    * metadata (far below `spark.driver.maxResultSize`), and the r15 stage
    * profile showed why the ceiling must sit well above any per-batch pair
    * graph: a 2 000-vector registry batch produced ~5.5k symmetrized edge
    * rows, fell past the previous 2 000-row cap onto the distributed
    * fixpoint, and paid ~15 s of propagate/jump rounds (6 rounds × join +
    * groupBy + localCheckpoint + convergence count) for a graph the driver
    * collapses in microseconds — the entire `ingest_*_cluster_batch` bench
    * cost. Corpus-sized graphs still take the distributed path. */
  private[graft] val SmallGraphCap = 100000

  /** [[connectedComponents]] plus the number of propagate+jump rounds it ran
    * (excluding the folded-in seed propagation) — the observability hook for
    * the scale contract: path-halving must converge in O(log diameter)
    * rounds, and `CcScaleSpec` pins exactly that on a chain-graph fixture so
    * a fixpoint regression to O(diameter) ripple (quadratic total shuffle)
    * fails a spec instead of surfacing as a silent cluster-scale stall. */
  private[graft] def connectedComponentsWithRounds(pairs: DataFrame,
      aCol: String = "doc_a", bCol: String = "doc_b",
      maxIters: Int = 50,
      // spec hook: CcScaleSpec pins the DISTRIBUTED fixpoint's round/shuffle
      // contract on a graph far below the production cap — it passes 0 here
      smallGraphCap: Int = SmallGraphCap): (DataFrame, Int) = {
    // symmetrize with a single scan: a union of two selects would evaluate
    // the (typically expensive, un-cached) upstream pair plan once per side
    // ids cast to long up front so the driver-side path below (getLong)
    // accepts the same input types the distributed path does (int doc ids)
    val edges = Caching.scoped(
      pairs.select(explode(array(
        struct(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst")),
        struct(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .distinct())
    // batch-bounded mini graphs (the union-find increment's, a probe's)
    // collapse on the driver: collect up to the cap, run path-compressed
    // union-find in memory, emit the same (id, min-component) rows the
    // distributed fixpoint converges to — zero propagate/jump rounds, no
    // per-round localCheckpoint jobs. The cap keeps the collect driver-safe
    // metadata (the MaxLabelFetchIds discipline); one row above it falls
    // through to the distributed path, so corpus-sized graphs never
    // collect. Bit-identical by construction: both paths compute the
    // unique min-label fixpoint over the same edge set.
    val capped = edges.limit(smallGraphCap + 1).collect()
    if (capped.length <= smallGraphCap && smallGraphCap > 0) {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      capped.foreach { row =>
        val (a, b) = (find(row.getLong(0)), find(row.getLong(1)))
        if (a != b) { val (lo, hi) = (math.min(a, b), math.max(a, b))
          parent(hi) = lo; parent.getOrElseUpdate(lo, lo) }
        else parent.getOrElseUpdate(a, a)
      }
      val nodes = capped.iterator.map(_.getLong(0)).toSeq.distinct
      val out = nodes.map(id => (id, find(id)))
      val spark = pairs.sparkSession
      import spark.implicits._
      return (out.toDF("id", "component"), 0)
    }
    // seed = one propagation for free: component = min(id, min neighbor).
    // Every node appears as src (edges are symmetrized), so this covers all.
    var labels = edges.groupBy(col("src"))
      .agg(min(col("dst")).as("nmin"))
      .select(col("src").as("id"), least(col("src"), col("nmin")).as("component"))
      .localCheckpoint()
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      val neighborMin = edges
        .join(labels.select(col("id").as("dst"), col("component").as("nc")), Seq("dst"))
        .groupBy(col("src")).agg(min(col("nc")).as("nc"))
        .select(col("src").as("id"), col("nc"))
      val prop = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("component").as("prev"),
          least(col("component"), coalesce(col("nc"), col("component")))
            .as("component"))
      // pointer jump against last round's (checkpointed) table: labels are
      // monotone decreasing, so a one-round-stale jump target still only
      // improves the label and never leaves the component
      val next = prop.alias("p")
        .join(labels.select(col("id").as("jid"), col("component").as("jc")).alias("j"),
          col("p.component") === col("j.jid"), "left")
        .select(col("p.id").as("id"), col("p.prev").as("prev"),
          least(col("p.component"), coalesce(col("j.jc"), col("p.component")))
            .as("component"))
        .localCheckpoint()
      converged = next.filter(col("component") < col("prev")).limit(1).count() == 0L
      labels.unpersist(blocking = false)
      labels = next
      it += 1
    }
    (labels.select(col("id"), col("component")), it)
  }

  // ------------------------------------------------------------- exact dedup

  /** Exact dedup by normalized-text hash: every doc mapped to the canonical
    * (minimum) doc_id of its content group. `is_dup` marks rows a distributed
    * dedup pass would drop. One shuffle on the content hash. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(col("text_hash"))
    docs.select(col(idCol).as("doc_id"), md5(normalizeText(col(textCol))).as("text_hash"))
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .withColumn("is_dup", col("doc_id") =!= col("canonical_id"))
  }

  // ------------------------------------------------------------ text metrics

  /** Per-doc quality statistics: char/word counts, punctuation/digit ratios,
    * stopword ratio, and a composite quality score — the standard pre-training
    * corpus filters, all as codegen'd column arithmetic. */
  /** The `quality_score` expression of [[textStats]] over a raw text column
    * and its word array — factored out so row-local consumers (the
    * [[graft.stream.CorpusIngest]] ingest quality gate) apply the IDENTICAL
    * arithmetic without a stats join: 0.4·stop_ratio +
    * 0.3·min(n_words/50, 1) + 0.3·(1 − digit_ratio). */
  def qualityScoreExpr(t: Column, w: Column): Column = {
    val nChars = length(t).cast("long")
    val nWords = size(w).cast("long")
    val digit = length(regexp_replace(t, "[^0-9]", "")).cast("double") / nChars.cast("double")
    val stop = size(org.apache.spark.sql.functions.filter(w,
        x => x.isin("the", "and", "of", "to", "in", "a")))
      .cast("double") / nWords.cast("double")
    lit(0.4) * stop + lit(0.3) * least(nWords.cast("double") / lit(50.0), lit(1.0)) +
      lit(0.3) * (lit(1.0) - digit)
  }

  def textStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col("__t")
    val nChars = length(t).cast("long")
    val nWords = size(col("__w")).cast("long")
    val punct = length(regexp_replace(t, "[^.,!?;:]", "")).cast("double") / nChars.cast("double")
    val digit = length(regexp_replace(t, "[^0-9]", "")).cast("double") / nChars.cast("double")
    val stop = expr("size(filter(__w, x -> x IN ('the','and','of','to','in','a')))")
      .cast("double") / nWords.cast("double")
    graft.Spread.byKey(
      docs.select(col(idCol).as("doc_id"), col(textCol).as("__t")), col("doc_id"))
      .withColumn("__w", wordsOf(t))
      .select(col("doc_id"),
        nChars.as("n_chars"), nWords.as("n_words"),
        (length(regexp_replace(normalizeText(t), " ", "")).cast("double") /
          nWords.cast("double")).as("avg_word_len"),
        punct.as("punct_ratio"), digit.as("digit_ratio"), stop.as("stop_ratio"),
        qualityScoreExpr(t, col("__w")).as("quality_score"))
  }

  /** Repetition quality signals (the Gopher-style repetitiousness cues):
    * fraction of duplicate word bigrams and the frequency share of the
    * single most common word. Bigram stats are per-row array ops; the top
    * word share is one exploded groupBy — exact integer counts, so both are
    * engine-portable without float-order concerns (the final ratios are one
    * division each). */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // spread a (possibly one-file) corpus read across the cluster before the
    // per-row array work and the word explode
    val base = graft.Spread.byKey(
      docs.select(col(idCol).as("doc_id"), wordsOf(col(textCol)).as("__w")),
      col("doc_id"))
    val bigrams = when(size(col("__w")) >= 2, expr(
      "transform(sequence(1, size(__w) - 1), i -> concat(element_at(__w, i), ' ', element_at(__w, i + 1)))"))
      .otherwise(expr("CAST(array() AS array<string>)"))
    val withBg = base
      .withColumn("__nb", size(bigrams).cast("long"))
      .withColumn("__db", size(array_distinct(bigrams)).cast("long"))
      .select(col("doc_id"),
        when(col("__nb") > 0,
          lit(1.0) - col("__db").cast("double") / col("__nb").cast("double"))
          .otherwise(lit(0.0)).as("bigram_dup_ratio"))
    val topWord = base
      .select(col("doc_id"), explode(col("__w")).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg((max(col("c")).cast("double") / sum(col("c")).cast("double"))
        .as("top_word_ratio"))
    withBg.join(topWord, Seq("doc_id"))
  }

  /** Token counts: whitespace tokens and a BPE-style pre-tokenizer regex
    * (letter runs | single digits | punctuation runs). */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      size(wordsOf(col(textCol))).cast("long").as("ws_tokens"),
      size(regexp_extract_all(col(textCol),
        lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]+"), lit(0))).cast("long").as("bpe_tokens"))

  // ---------------------------------------------------------------- BPE

  /** The BPE pre-tokenizer: letter runs | single digits | punctuation runs —
    * the same alternation [[tokenCounts]] counts with. Merges never cross a
    * pre-token boundary. */
  val BpePretokenRegex = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]+"

  /** Symbol wrappers of the BPE working representation: every symbol is
    * rendered `U+0001 symbol U+0002` and the renderings concatenate. BOTH
    * markers are load-bearing: a merge's search pattern `L a R L b R`
    * consumes EXACTLY the two wrapped symbols -- nothing shared with a
    * neighboring candidate (so adjacent occurrences all merge in one
    * left-to-right `replace` pass, like the canonical greedy scan) and both
    * symbols are matched EXACTLY (a trailing-delimiter-free pattern would
    * let `b` match a following symbol `bc` that merely STARTS with b -- the
    * false merge [[graft.text.BpeProps]] hunts, and its first draft
    * caught). Wrapper chars are stripped from hostile text up front, so
    * text cannot forge symbol boundaries. */
  val BpeSepL = "\u0001"
  val BpeSepR = "\u0002"

  /** Word-final marker symbol (Sennrich et al. 2016 convention): appended as
    * its own symbol so merges can learn word-final units (`er</w>`). Never
    * the LEFT side of a merge — nothing follows it — which is also what makes
    * the concatenated per-word strings safe: a merge pattern can only span a
    * word boundary through a left-side `</w>`. */
  val BpeEow = "</w>"

  /** A fixed rank-ordered merge table for [[bpeApply]] when no trained table
    * is supplied — hand-chosen over the corpus's letter distribution,
    * exercising plain pairs, chained merges (a+b, l+e, ab+le, able+</w>), and
    * word-final merges. */
  val DefaultBpeMerges: Seq[(String, String)] = Seq(
    ("e", "r"), ("e", BpeEow), ("n", BpeEow), ("er", BpeEow),
    ("o", "w"), ("ow", BpeEow), ("o", "r"), ("s", "t"),
    ("a", "b"), ("l", "e"), ("ab", "le"), ("able", BpeEow),
    ("t", "h"), ("th", "e"), ("the", BpeEow), ("a", "n"),
    ("s", "c"), ("sc", "an"), ("scan", BpeEow), ("v", "a"),
    ("va", "l"), ("val", "u"), ("valu", "e"), ("s", BpeEow))

  /** Wrapped base symbolization of one pre-token: every char becomes a
    * wrapped symbol, plus the word-final marker. */
  private def bpeSymbolizedWord(w: Column): Column =
    concat(regexp_replace(w, "(.)", BpeSepL + "$1" + BpeSepR),
      lit(BpeSepL + BpeEow + BpeSepR))

  /** Hostile-text guard: the wrapper chars are stripped before
    * pre-tokenization, so text cannot forge symbol boundaries. */
  private def bpeClean(c: Column): Column =
    regexp_replace(c, "[" + BpeSepL + BpeSepR + "]", "")

  /** Wrapped base symbolization of a whole document: per-word
    * symbolizations concatenated (word boundaries stay merge-proof — see
    * [[BpeEow]]). */
  private def bpeSymbolized(textCol: Column): Column =
    array_join(transform(
      regexp_extract_all(bpeClean(textCol), lit(BpePretokenRegex), lit(0)),
      bpeSymbolizedWord _), "")

  /** One greedy left-to-right merge pass of `(a, b) -> ab` over the wrapped
    * symbol string, as a single codegen'd `replace`. The pattern consumes
    * exactly the two wrapped symbols (see [[BpeSepL]]), so one replace pass
    * IS the canonical greedy scan: matches align on symbol starts, both
    * symbols match exactly, adjacent occurrences are disjoint substrings,
    * and `replace` never revisits replaced output — pinned against the
    * reference implementation by [[graft.text.BpeProps]]. */
  private def bpeMergeOnce(s: Column, a: String, b: String): Column =
    replace(s, lit(BpeSepL + a + BpeSepR + BpeSepL + b + BpeSepR),
      lit(BpeSepL + a + b + BpeSepR))

  /**
   * BPE tokenization by applying a rank-ordered merge table — the real
   * subword tokenizer behind token-budget accounting (the whitespace and
   * pre-tokenizer counts in [[tokenCounts]] are its cheap upper/lower
   * envelope). Returns per document: `n_tokens` (subword count, word-final
   * markers included — the unit a sequence-length budget meters) and
   * `n_merged` (tokens that are genuine multi-char merge products, a direct
   * gauge of how much of the text the merge table covers).
   *
   * Scale: one scan, pure string kernels inside whole-stage codegen — no
   * shuffle, no UDF, no driver participation; the merge table is folded into
   * the plan as |merges| chained `replace` expressions. 100 TB cost is the
   * scan itself.
   */
  /** Caller-supplied merge tables must preserve the two invariants the
    * single-replace pass rests on: no left side may END with the word-final
    * marker (the two-symbol pattern would then start at a word's last
    * symbol and consume the next word's first — a cross-word merge; a
    * trained table can never produce one because nothing follows `</w>`,
    * but `("er</w>", "t")` from a hostile caller would), and no symbol may
    * contain the wrapper characters (they would forge symbol boundaries
    * inside the pattern itself). */
  private def requireValidMerges(merges: Seq[(String, String)]): Unit = {
    require(merges.forall(!_._1.endsWith(BpeEow)),
      "the word-final marker cannot end the left side of a merge")
    require(merges.forall { case (a, b) =>
      !(a + b).contains(BpeSepL) && !(a + b).contains(BpeSepR) },
      "merge symbols cannot contain the wrapper characters")
  }

  def bpeApply(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)] = DefaultBpeMerges): DataFrame = {
    requireValidMerges(merges)
    val folded = merges.foldLeft(bpeSymbolized(col(textCol))) {
      case (s, (a, b)) => bpeMergeOnce(s, a, b)
    }
    docs.select(col(idCol).as("doc_id"), folded.as("__s"))
      .select(col("doc_id"),
        (length(col("__s")) - length(replace(col("__s"), lit(BpeSepL))))
          .cast("long").as("n_tokens"),
        size(filter(split(replace(col("__s"), lit(BpeSepR)), BpeSepL),
          x => length(x) > 1 && x =!= BpeEow)).cast("long").as("n_merged"))
  }

  /**
   * BPE merge-table training: `k` iterations of count-adjacent-pairs /
   * merge-the-argmax (Sennrich et al. 2016), returning `(rank, a, b,
   * pair_count)` in learned order. Ties break deterministically by
   * (a, b) lexicographic — engine-portable on the ASCII symbol domain.
   *
   * Scale: the corpus is scanned ONCE (pre-token frequency count — the only
   * corpus-sized shuffle); every iteration then runs over the UNIQUE-word
   * table, whose size is vocabulary-bounded and corpus-size-independent (the
   * fastBPE discipline), re-persisted per round so lineage stays one replace
   * deep. The per-iteration argmax is a `limit(1).collect` — one driver row,
   * the cap-bounded pattern. */
  def bpeTrain(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import org.apache.spark.storage.StorageLevel
    val words = docs
      .select(explode(regexp_extract_all(bpeClean(col(textCol)),
        lit(BpePretokenRegex), lit(0))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).cast("long").as("cnt"))
    var syms = words.select(bpeSymbolizedWord(col("word")).as("s"), col("cnt"))
    syms.persist(StorageLevel.MEMORY_AND_DISK)
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    // the parent generation's cache is dropped only AFTER the next argmax
    // job has run — that job is the child cache's first evaluation, so it
    // materializes the child THROUGH the still-cached parent (one replace
    // deep) exactly like the old explicit `next.count()` did, without
    // paying a separate materialization job per rank (r15: 8 extra jobs
    // per train, ~0.5-1 s across the three bpe entries)
    var parent: Option[DataFrame] = None
    try {
      var exhausted = false
      for (rank <- 1 to k if !exhausted) {
        val top = syms
          .select(col("cnt"),
            split(replace(col("s"), lit(BpeSepR)), BpeSepL).as("__t"))
          .select(col("cnt"), when(size(col("__t")) >= lit(3), expr(
            "transform(sequence(2, size(__t) - 1), " +
              "i -> struct(element_at(__t, i) AS a, element_at(__t, i + 1) AS b))"))
            .otherwise(expr("CAST(array() AS array<struct<a:string,b:string>>)"))
            .as("__p"))
          .select(explode(col("__p")).as("p"), col("cnt"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum(col("cnt")).as("pair_count"))
          .orderBy(col("pair_count").desc, col("a").asc, col("b").asc)
          .limit(1) // driver-bounded: one row per iteration
          .collect()
        parent.foreach(_.unpersist()): Unit // child materialized by the job above
        parent = None
        if (top.isEmpty) exhausted = true
        else {
          val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          learned += ((rank, a, b, c))
          val next = syms.select(bpeMergeOnce(col("s"), a, b).as("s"), col("cnt"))
          next.persist(StorageLevel.MEMORY_AND_DISK)
          parent = Some(syms)
          syms = next
        }
      }
    } finally {
      syms.unpersist(): Unit
      parent.foreach(_.unpersist()): Unit
    }
    import spark.implicits._
    learned.toSeq.toDF("rank", "a", "b", "pair_count")
  }

  /**
   * Corpus vocabulary report under a merge table: the top-k subword tokens
   * by corpus frequency — what a tokenizer release ships next to its merges
   * (coverage auditing, UNK-rate estimation, vocab-size tuning).
   *
   * Scale: computed over the UNIQUE-word table weighted by word frequency —
   * the corpus is scanned once for the word count; tokenization and the
   * token rollup run on vocabulary-bounded data. Top-k is a TakeOrdered,
   * never a global sort. Ties break (count DESC, token ASC) — total order,
   * so the k-boundary is engine-portable. */
  def bpeVocab(docs: DataFrame, textCol: String,
      merges: Seq[(String, String)] = DefaultBpeMerges, topK: Int = 25): DataFrame = {
    requireValidMerges(merges)
    val words = docs
      .select(explode(regexp_extract_all(bpeClean(col(textCol)),
        lit(BpePretokenRegex), lit(0))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).cast("long").as("cnt"))
    val folded = merges.foldLeft(bpeSymbolizedWord(col("word"))) {
      case (s, (a, b)) => bpeMergeOnce(s, a, b)
    }
    words.select(folded.as("s"), col("cnt"))
      .select(explode(split(replace(col("s"), lit(BpeSepR)), BpeSepL)).as("token"),
        col("cnt"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token"))
      .agg(sum(col("cnt")).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(topK)
  }

  /** N-gram-lexicon language ID: per-language stopword hit counts over the
    * word array, highest count wins (ties broken en > de > fr). */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    def hits(words: Seq[String]) =
      expr(s"size(filter(__w, x -> x IN (${words.map("'" + _ + "'").mkString(",")})))")
        .cast("long")
    val en = hits(Seq("the", "and", "of", "to", "in", "a"))
    val de = hits(Seq("der", "die", "das", "und", "ist"))
    val fr = hits(Seq("le", "la", "et", "les", "des"))
    docs.select(col(idCol).as("doc_id"), wordsOf(col(textCol)).as("__w"))
      .select(col("doc_id"), en.as("en_hits"), de.as("de_hits"), fr.as("fr_hits"))
      .withColumn("lang_pred",
        when(col("en_hits") >= col("de_hits") && col("en_hits") >= col("fr_hits"), "en")
          .when(col("de_hits") >= col("fr_hits"), "de")
          .otherwise("fr"))
  }

  /**
   * Corpus-frequency language-model scoring — the model-free quality
   * signal behind perplexity filters: score each document by how typical
   * its word n-grams are of the corpus itself. A self-trained count LM:
   * `avg_freq` is the mean corpus occurrence count of the document's n-gram
   * tokens (high = phrasing the corpus repeats; low = noise or novelty) and
   * `hapax_frac` the fraction occurring nowhere else (a strong gibberish
   * detector). Arithmetic stays engine-portable: integer count sums with
   * single final divisions — no logs, whose last ulp differs per libm.
   *
   * Scale: the n-gram explode shuffles once on the shingle (count + join
   * back), once on doc_id — the same topology as TF-IDF; the frequency
   * table is Zipf-small relative to the corpus and AQE broadcasts it when
   * it fits.
   */
  def lmScore(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 2): DataFrame = {
    // count and join on the 60-bit hash of the n-gram, not the string —
    // the two corpus-wide shuffles move 8-byte keys (oracle replays the
    // same hashes, so collision-induced count quirks match bit-for-bit)
    val occ = Caching.scoped(rawShingles(docs, idCol, textCol, n)
      .select(col("doc_id"), hash64(col("shingle")).as("h")))
    val freq = occ.groupBy(col("h")).agg(count(lit(1)).as("__freq"))
    occ.join(freq, "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(col("__freq")).as("freq_sum"),
        sum(when(col("__freq") === 1L, 1L).otherwise(0L)).as("n_hapax"))
      .withColumn("avg_freq",
        col("freq_sum").cast("double") / col("n_ngrams").cast("double"))
      .withColumn("hapax_frac",
        col("n_hapax").cast("double") / col("n_ngrams").cast("double"))
  }

  /** Integer bit length of a positive long — `length(bin(x))` =
    * floor(log2 x) + 1, exact integer string arithmetic in both engines.
    * The engine-portable stand-in for log2 wherever a LM score needs one:
    * a double `log`/`log2` is libm-dependent (JVM vs DuckDB may differ in
    * the last ulp, and a `floor` on top turns that ulp into an off-by-one),
    * while the bin-string length is bit-exact everywhere. */
  def bitLen(c: Column): Column = length(bin(c)).cast("long")

  /**
   * CCNet-style perplexity scoring (Wenzek et al. 2020: score every document
   * under a corpus language model, then split head/middle/tail) — spelled in
   * exact integer "bits" so the DuckDB oracle replays it bit-for-bit.
   *
   * The LM is an add-one-smoothed word-bigram model trained on the corpus
   * itself: p(w_i | w_{i-1}) = (c(w_{i-1} w_i) + 1) / (c(w_{i-1}·) + V),
   * with c(w_{i-1}·) the count of the context word as a bigram LEFT (its
   * occurrences in non-final positions) and V the corpus vocabulary size.
   * Each position's surprisal is approximated in whole bits as
   * bitLen(den) − bitLen(num) (within 1 bit of −log2 p, monotone in the
   * exact value at fixed denominators); a document's score is the bit sum
   * and its mean, low = fluent under the corpus LM.
   *
   * Scale: identical shape to [[lmScore]] — the two corpus-wide shuffles
   * (bigram counts, context counts) move 8-byte hashes; the per-doc rollup
   * reuses the doc_id partitioning; V is one bounded driver count folded
   * into the expression as a literal. No all-pairs stage, no window.
   */
  def surprisalBits(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val occ = Caching.scoped(rawShingles(docs, idCol, textCol, 2)
      .select(col("doc_id"),
        hash64(col("shingle")).as("hb"),
        // the context word = everything before the shingle's single space
        hash64(substring_index(col("shingle"), " ", 1)).as("hc")))
    val bigFreq = occ.groupBy(col("hb")).agg(count(lit(1)).as("__cb"))
    val ctxFreq = occ.groupBy(col("hc")).agg(count(lit(1)).as("__cc"))
    val vocab = docs.select(col(idCol).as("doc_id"), wordsOf(col(textCol)).as("w"))
      .select(explode(col("w")).as("word")).agg(countDistinct(col("word")))
      .head().getLong(0)
    occ.join(bigFreq, "hb").join(ctxFreq, "hc")
      .select(col("doc_id"),
        (bitLen(col("__cc") + lit(vocab)) - bitLen(col("__cb") + lit(1L)))
          .as("__sbits"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__sbits")).as("surprisal_bits"))
      .withColumn("mean_bits",
        col("surprisal_bits").cast("double") / col("n_bigrams").cast("double"))
  }

  /**
   * DSIR importance weights (Xie et al. 2023, *Data Selection for Language
   * Models via Importance Resampling*): score every raw document by how much
   * more likely its hashed n-gram features are under a TARGET distribution
   * than under the RAW distribution — the published recipe for selecting
   * web-scale pretraining data that "looks like" a trusted corpus, spelled
   * in exact integer bits (see [[bitLen]]) so the oracle replays it.
   *
   * Features are word bigrams hashed into `buckets` buckets (the paper's
   * hashed n-gram featurization); both distributions are add-one smoothed
   * categorical MLEs. A document's weight is
   *   Σ_f n_d(f) · [log2 p_target(f) − log2 p_raw(f)]
   * ≈ Σ_f n_d(f) · [bitLen(c_t(f)+1) − bitLen(c_r(f)+1)]
   *   + N_d · [bitLen(R+B) − bitLen(T+B)]
   * with T/R the total target/raw feature mass and B the bucket count; high
   * bits = target-like. The caller supplies the target predicate (e.g. the
   * trusted language/source slice).
   *
   * Scale: one feature-keyed shuffle per distribution (8-byte bucket ids,
   * at most B distinct groups), one left join back (target counts default
   * 0 via coalesce), one doc-keyed rollup reusing the explode's doc_id
   * spread; T and R fold in as two bounded 1-row driver aggregates. Never
   * a doc×doc stage; the bucket table is B rows regardless of corpus size.
   */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
      targetPred: Column, buckets: Int = 8192): DataFrame = {
    val occ = Caching.scoped(
      docs.select(col(idCol).as("doc_id"), targetPred.as("__tgt"),
        wordsOf(col(textCol)).as("w"))
        .filter(size(col("w")) >= 2)
        .transform(graft.Spread.byKey(_, col("doc_id")))
        .select(col("doc_id"), col("__tgt"), explode(expr(
          "transform(sequence(0, size(w) - 2), i -> concat_ws(' ', slice(w, i + 1, 2)))"))
          .as("shingle"))
        .select(col("doc_id"), col("__tgt"),
          pmod(hash64(col("shingle")), lit(buckets.toLong)).as("f")))
    val rawFreq = occ.groupBy(col("f")).agg(count(lit(1)).as("__cr"))
    val tgtFreq = occ.filter(col("__tgt")).groupBy(col("f"))
      .agg(count(lit(1)).as("__ct"))
    val rTot = occ.agg(count(lit(1))).head().getLong(0)
    val tTot = occ.filter(col("__tgt")).agg(count(lit(1))).head().getLong(0)
    val massBits = // bitLen(R+B) − bitLen(T+B), a per-token constant
      java.lang.Long.toBinaryString(rTot + buckets).length.toLong -
        java.lang.Long.toBinaryString(tTot + buckets).length.toLong
    occ.join(rawFreq, "f")
      .join(tgtFreq, Seq("f"), "left")
      .select(col("doc_id"),
        (bitLen(coalesce(col("__ct"), lit(0L)) + lit(1L)) -
          bitLen(col("__cr") + lit(1L))).as("__fbits"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_features"),
        (sum(col("__fbits")) + count(lit(1)) * lit(massBits))
          .as("weight_bits"))
  }

  /**
   * Gopher quality-rule chart (Rae et al. 2021, table A1): the published
   * per-document filter rules every web-scale pipeline applies before
   * training, each emitted as its own flag so downstream reporting can see
   * WHICH rule fired (the all-or-nothing boolean is the conjunction).
   * Thresholds are the paper's: 50 ≤ words ≤ 100 000; mean word length in
   * [3, 10]; ≥ 80 % of words contain an alphabetic character; ≥ 2 stopword
   * occurrences; symbol-to-word ratio (# and ellipsis) ≤ 0.1.
   *
   * Pure per-row column arithmetic over one scan — no shuffle at all; the
   * two ratios are single divisions of exact integers (IEEE division is
   * correctly rounded, so both engines agree bit-for-bit).
   */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = col("__w")
    val nWords = size(w).cast("long")
    val meanLen = (length(regexp_replace(normalizeText(col("__t")), " ", ""))
      .cast("double") / nWords.cast("double"))
    val alphaFrac = expr("size(filter(__w, x -> x rlike '[a-z]'))")
      .cast("double") / nWords.cast("double")
    val stopHits = expr(
      "size(filter(__w, x -> x IN ('the','be','to','of','and','that','have','with')))")
      .cast("long")
    val symbols = (length(col("__t")) -
      length(regexp_replace(col("__t"), "#|\\.\\.\\.", ""))).cast("double")
    graft.Spread.byKey(
      docs.select(col(idCol).as("doc_id"), col(textCol).as("__t")), col("doc_id"))
      .withColumn("__w", wordsOf(col("__t")))
      .select(col("doc_id"), nWords.as("n_words"), meanLen.as("mean_word_len"),
        stopHits.as("stop_hits"),
        (nWords >= 50L && nWords <= 100000L).as("rule_word_count"),
        (meanLen >= 3.0 && meanLen <= 10.0).as("rule_word_len"),
        (alphaFrac >= 0.8).as("rule_alpha_words"),
        (stopHits >= 2L).as("rule_stopwords"),
        (symbols / nWords.cast("double") <= 0.1).as("rule_symbol_ratio"))
      .withColumn("passes_all",
        col("rule_word_count") && col("rule_word_len") &&
          col("rule_alpha_words") && col("rule_stopwords") &&
          col("rule_symbol_ratio"))
  }

  /**
   * Distributed integer PageRank over an undirected pair graph — damped
   * centrality in exact fixed-point arithmetic. Input: (doc_a, doc_b)
   * pairs; output: (id, pr) for every node, scaled so the teleport-only
   * rank is 2^32·0.15 div 100-exact and a rank ≈ 2^32 means "average".
   *
   * Each of the `iters` rounds routes `pr div deg` along every edge
   * (truncating integer division — Spark's `div` and DuckDB's `//` both
   * truncate toward zero) and applies `T + (Σ·85) div 100` with
   * T = (2^32·15) div 100. Integer addition commutes, so aggregation
   * order is free and a SQL replay is bit-exact.
   *
   * Scale: distributed power iteration — per round ONE equi-join of the
   * cached (src, dst, deg) edge list against the current rank frame and
   * ONE groupBy on dst, both shuffle-keyed on node ids; nothing collects
   * to the driver. Sum bound: |V|·2^32·85 < 2^63 holds to ~2^24 nodes;
   * beyond that start ranks lower (the scale is free).
   */
  def pagerankInt(pairs: DataFrame, iters: Int = 12,
      // spec hook (the [[connectedComponentsWithRounds]] pattern):
      // PagerankSpec passes 0 to pin the distributed loop's parity with
      // the driver replay
      smallGraphCap: Int = SmallGraphCap): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val ed = Caching.scoped(edges.join(deg, "src"))
    val base = 1L << 32
    val tele = base * 15L / 100L
    // batch-bounded graphs collapse on the driver (the [[SmallGraphCap]]
    // discipline): the distributed loop below is 12 chained join+groupBy
    // rounds — ~25 exchanges in one plan — which at the sf-scale fixture is
    // pure scheduling/planning overhead (r15 profile: ~10 s for a graph of
    // a few thousand edges whose arithmetic takes microseconds). The loop
    // body is exact integer arithmetic (truncating division, commutative
    // addition), so the in-memory replay below is bit-identical — including
    // the drop-out semantics: a node with no in-edges from ranked sources
    // leaves the rank frame exactly as the groupBy leaves it out.
    val capped = ed.select(col("src").cast("long"), col("dst").cast("long"),
        col("deg").cast("long"))
      .limit(smallGraphCap + 1).collect()
    if (capped.length <= smallGraphCap && smallGraphCap > 0) {
      val es = capped.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      var pr: Map[Long, Long] =
        es.iterator.map(_._1).toSeq.distinct.map(_ -> base).toMap
      for (_ <- 1 to iters) {
        val acc = scala.collection.mutable.Map.empty[Long, Long]
        es.foreach { case (src, dst, d) =>
          pr.get(src).foreach { p =>
            acc.update(dst, acc.getOrElse(dst, 0L) + p / d)
          }
        }
        pr = acc.iterator.map { case (id, s) => id -> (tele + s * 85L / 100L) }
          .toMap
      }
      val spark = pairs.sparkSession
      import spark.implicits._
      return pr.toSeq.toDF("id", "pr")
    }
    var pr = deg.select(col("src").as("id"), lit(base).as("pr"))
    for (_ <- 1 to iters) {
      pr = ed.join(pr, ed("src") === pr("id"))
        .select(col("dst"), expr("pr div deg").as("c"))
        .groupBy(col("dst"))
        .agg((lit(tele) + expr("(sum(c) * 85) div 100")).as("pr"))
        .select(col("dst").as("id"), col("pr"))
    }
    pr
  }

  /** Top-k word n-grams per group (language, source, ...) by occurrence
    * count — the grouped-top-k reporting shape over text. Deterministic
    * ranking: count desc, then shingle asc. One shuffle to count, one
    * window per group to rank. */
  def groupedTopTerms(docs: DataFrame, groupCol: String, textCol: String,
      n: Int = 2, topK: Int = 5): DataFrame = {
    val counted = docs
      .select(col(groupCol).as("grp"), wordsOf(col(textCol)).as("w"))
      .filter(size(col("w")) >= n)
      // spread on the words array (high cardinality), not the group key —
      // a handful of groups would collapse the pre-explode spread to a
      // handful of cores
      .transform(graft.Spread.byKey(_, col("w")))
      .select(col("grp"), explode(expr(
        s"transform(sequence(0, size(w) - $n), i -> concat_ws(' ', slice(w, i + 1, $n)))"))
        .as("term"))
      .groupBy(col("grp"), col("term")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("cnt").desc, col("term").asc)
    counted.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
  }

  /**
   * Train/eval decontamination — the n-gram overlap check every training
   * pipeline runs before a model sees the corpus: for each training document,
   * how many of its distinct n-gram shingles also occur ANYWHERE in the eval
   * set. `is_contaminated` flags any overlap; `overlap_ratio` grades it.
   *
   * Scale: one equi-join of the training shingles against the DISTINCT eval
   * shingle set (shuffle keyed on the shingle — never doc×doc), then one
   * groupBy per side. Eval sets are typically corpus-scale too (every
   * benchmark ever published), so the join stays a shuffle join; Spark
   * broadcasts automatically when the eval side is small.
   */
  def decontamination(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 3): DataFrame = {
    // the semi-join keys on the 60-bit shingle hash, not the string (same
    // hashes in the oracle, so totals/hits match collisions included)
    val trainSh = hashedShingles(train, idCol, textCol, n)
    // no distinct on the eval side: left_semi treats the build side as a set
    val evalSh = rawShingles(eval, idCol, textCol, n)
      .select(hash64(col("shingle")).as("h"))
    val totals = trainSh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    val hits = trainSh.join(evalSh, Seq("h"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_overlap"))
    totals.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .withColumn("overlap_ratio",
        col("n_overlap").cast("double") / col("n_shingles").cast("double"))
      .withColumn("is_contaminated", col("n_overlap") > 0)
  }

  /**
   * Bloom-prefiltered decontamination — byte-identical output to
   * [[decontamination]] (the Bloom filter only PRUNES candidates; the exact
   * semi-join still decides membership, so false positives are re-checked
   * and removed), built for the asymmetric case that dominates practice: a
   * fixed, bounded eval suite against an unbounded training corpus.
   *
   * Scale: the eval shingle set reduces to a driver-built Bloom filter
   * (~1.2 MB per million distinct shingles at fpp=1e-2) shipped to every
   * task as a plan literal; the training side tests membership inside
   * whole-stage codegen (`graft_might_contain` = Spark's native
   * BloomFilterMightContain, the same machinery Catalyst's runtime-filter
   * injection uses) BEFORE any exchange, so the shuffle feeding the verify
   * semi-join carries O(|overlap| + fpp·|train shingles|) rows instead of
   * every shingle in the corpus — on a clean 100 TB corpus that is the
   * difference between shuffling terabytes and shuffling megabytes. The
   * eval side is scanned twice (sizing count + bloom build + verify join
   * share one cached frame); for an eval set too large to bloom cheaply,
   * use [[decontamination]] — the crossover is exactly the point where the
   * filter no longer fits a task comfortably.
   */
  def decontaminationBloom(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 3, fpp: Double = 0.01): DataFrame = {
    val evalSh = Caching.scoped(
      rawShingles(eval, idCol, textCol, n)
        .select(hash64(col("shingle")).as("h")).distinct())
    // sizing the filter needs the true distinct count — an underestimate
    // silently degrades fpp and with it the prefilter's selectivity. An
    // empty eval set short-circuits to a no-bits filter: stat.bloomFilter
    // NPEs on an empty frame (its aggregate returns null bytes)
    val nEval = evalSh.count()
    val bloom =
      if (nEval == 0L) org.apache.spark.util.sketch.BloomFilter.create(1L, fpp)
      else evalSh.stat.bloomFilter("h", nEval, fpp)
    val bloomBytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    val trainSh = hashedShingles(train, idCol, textCol, n)
    val totals = trainSh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    val hits = trainSh.filter(mightContain(bloomBytes, col("h")))
      .join(evalSh, Seq("h"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_overlap"))
    totals.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .withColumn("overlap_ratio",
        col("n_overlap").cast("double") / col("n_shingles").cast("double"))
      .withColumn("is_contaminated", col("n_overlap") > 0)
  }

  /** Codegen'd Bloom membership via the registered `graft_might_contain`
    * (graft.functions.GraftExtensions). The extension is REQUIRED: every
    * session entry point ([[graft.Sessions.builder]]) installs it, so a
    * session without it is misconfigured — a silent per-row UDF fallback
    * here would lose whole-stage codegen on the corpus-sized hot path
    * without any signal. Fail loud instead. */
  private def mightContain(bloomBytes: Array[Byte], h: Column): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    require(spark.catalog.functionExists("graft_might_contain"),
      "graft_might_contain is not registered: build the session with " +
        "graft.Sessions.builder (GraftExtensions) — a non-codegen fallback " +
        "would silently serialize the Bloom filter into a per-row UDF")
    call_function("graft_might_contain", lit(bloomBytes), h)
  }

  /**
   * BM25 relevance of every document for a fixed term set — the ranking
   * function of the keyword-retrieval stage. Uses the RATIONAL idf variant
   * idf(t) = (N − df + 0.5)/(df + 0.5) (the argument of BM25's log, without
   * the log): same ordering, but free of transcendental functions whose last
   * ulp differs across math libraries — every operation is IEEE-defined
   * +/-/×/÷, so scores are engine-portable bit-for-bit. Term contributions
   * sum in the fixed order of `terms`.
   *
   * Scale: corpus statistics (N, Σdl, per-term df) reduce to ONE row —
   * integer-exact aggregates only — broadcast back over the corpus; the
   * per-doc pass is pure codegen'd column arithmetic. No shuffle beyond the
   * 1-row reduction.
   */
  def bm25(docs: DataFrame, idCol: String, textCol: String, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one term")
    // Column-built lambda (not an expr() string interpolation): a term
    // containing a quote is a literal here, never parsed SQL
    def tf(t: String): Column =
      size(org.apache.spark.sql.functions.filter(col("__w"),
        x => x === lit(t))).cast("long")
    val base = docs.select(col(idCol).as("doc_id"), wordsOf(col(textCol)).as("__w"))
      .withColumn("dl", size(col("__w")).cast("long"))
      .select(col("doc_id") +: col("dl") +:
        terms.zipWithIndex.map { case (t, i) => tf(t).as(s"tf$i") }: _*)
    val statAggs = count(lit(1)).as("N") +: sum(col("dl")).as("dl_sum") +:
      terms.indices.map(i => sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val stats = base.agg(statAggs.head, statAggs.tail: _*)
    val withStats = base.crossJoin(broadcast(stats))
      .withColumn("avgdl", col("dl_sum").cast("double") / col("N").cast("double"))
    val score = terms.indices.map { i =>
      val idf = (col("N").cast("double") - col(s"df$i").cast("double") + lit(0.5)) /
        (col(s"df$i").cast("double") + lit(0.5))
      val tfD = col(s"tf$i").cast("double")
      idf * (tfD * lit(k1 + 1.0)) /
        (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl")))
    }.reduce(_ + _)
    withStats.select(col("doc_id") +: col("dl") +:
      terms.indices.map(i => col(s"tf$i")) :+ score.as("bm25"): _*)
  }

  /**
   * Inverted-index postings of a corpus slice: one row per (word, doc) with
   * the term frequency, the doc length denormalized onto every posting row
   * (the classic impact-index layout — 8 bytes per posting buys back the
   * corpus-sized doc-length join at every query). The building block of the
   * PERSISTED lexical index ([[graft.stream.CorpusIngest]] appends one
   * slice per accepted micro-batch): postings are additive across disjoint
   * slices, so `invertedIndex(a) ∪ invertedIndex(b) =
   * invertedIndex(a ∪ b)` — batch-incremental build is exactly the
   * monolithic index.
   *
   * Scale: one explode + one (doc, word) aggregation with map-side partial
   * combine; output is postings-sized (Σ distinct words per doc), the same
   * asymptotic size any inverted index pays.
   */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), wordsOf(col(textCol)).as("__w"))
      .select(col("doc_id"), size(col("__w")).cast("long").as("dl"),
        explode(col("__w")).as("word"))
      .groupBy(col("doc_id"), col("dl"), col("word"))
      .agg(count(lit(1)).as("tf"))
      .select(col("word"), col("doc_id"), col("tf"), col("dl"))

  /** The 1-row additive corpus statistics of a slice — doc count and total
    * doc length. Integer-exact, so per-slice rows SUM to the monolithic
    * statistics (the reason [[bm25Indexed]] can take per-batch stat rows
    * straight from the persisted index). Counts EVERY doc of the slice,
    * including docs contributing no posting for any query term. */
  def corpusStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(wordsOf(col(textCol)).as("__w"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(size(col("__w")).cast("long")), lit(0L)).as("dl_sum"))

  /**
   * BM25 over a PRE-BUILT inverted index — the serving-time face of
   * [[invertedIndex]]/[[corpusStats]]: scores only the documents holding at
   * least one query term, without touching document text. Identical
   * arithmetic to [[bm25]] (rational idf, same operation order), so scores
   * are bit-for-bit the monolithic scores; the fixed-order term sum is
   * preserved by pivoting each term's contribution into its own conditional
   * aggregate (at most ONE non-null element each — (word, doc) is unique in
   * a postings table — so aggregation order cannot perturb the float) and
   * adding the pivoted columns in the fixed order of `terms`.
   *
   * Scale: `postings` prunes to the query terms AT THE SCAN (a pushed
   * equality-set filter — df(terms) rows survive of the whole index); df is
   * a ≤|terms|-row aggregate broadcast back; corpus stats reduce the
   * per-batch stat rows to one broadcast row; the only shuffle is the
   * df(terms)-bounded per-doc pivot. Corpus size appears nowhere.
   */
  def bm25Indexed(postings: DataFrame, stats: DataFrame, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25Indexed needs at least one term")
    val st = stats.agg(sum(col("n_docs")).as("N"), sum(col("dl_sum")).as("dl_sum"))
    val p = postings.filter(col("word").isin(terms: _*))
    val dfF = p.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val contrib = {
      val idf = (col("N").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5))
      val tfD = col("tf").cast("double")
      val avgdl = col("dl_sum").cast("double") / col("N").cast("double")
      idf * (tfD * lit(k1 + 1.0)) /
        (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
    }
    val scored = p.join(broadcast(dfF), Seq("word"))
      .crossJoin(broadcast(st))
      .withColumn("__c", contrib)
    val pivots = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("word") === t, col("__c"))).as(s"c$i") }
    val per = scored.groupBy(col("doc_id"), col("dl"))
      .agg(pivots.head, pivots.tail: _*)
    val score = terms.indices
      .map(i => coalesce(col(s"c$i"), lit(0.0))).reduce(_ + _)
    per.select(col("doc_id"), col("dl"), score.as("bm25"))
  }

  /**
   * TF-IDF top term per document — the inverted-index ranking shape: explode
   * words, per-(doc, word) term frequencies, corpus document frequencies,
   * score tf · (N+1)/(df+1) (the rational idf — monotone with the log form,
   * but free of transcendentals so scores are engine-portable), keep each
   * document's best term (ties: lexicographically first).
   *
   * Scale: the word explode shuffles once on (doc, word) for tf, once on
   * word for df (both with map-side partial aggregation), one broadcast of
   * the 1-row corpus count, one window per doc. The df frame is the actual
   * inverted-index vocabulary — vocabulary-sized, not corpus-sized.
   */
  def tfidfTopTerm(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = graft.Spread.byKey(docs, col(idCol))
      .select(col(idCol).as("doc_id"), explode(wordsOf(col(textCol))).as("word"))
    val tf = words.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val n = docs.select(countDistinct(col(idCol)).as("N"))
    val scored = tf.join(df, Seq("word")).crossJoin(broadcast(n))
      .withColumn("tfidf", col("tf").cast("double") *
        ((col("N").cast("double") + lit(1.0)) / (col("df").cast("double") + lit(1.0))))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("word").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("word").as("top_word"),
        col("tf"), col("df"), col("tfidf"))
  }

  /**
   * Corpus collocations by pointwise mutual information — the bigrams whose
   * adjacency is most surprising given their unigram frequencies (the
   * phrase-mining primitive behind tokenizer merge candidates and
   * stop-phrase lists).
   *
   * The score column is `pmi_ratio` = p(ab) / (p(a)·p(b)) — the EXP of PMI.
   * log is monotone, so the ranking is identical to PMI proper, and the
   * ratio is a fixed-order chain of IEEE multiplies/divides over exact
   * integer counts, which the DuckDB oracle replays bit-for-bit (ln would
   * hostage the comparison to two libm implementations).
   *
   * Scale: one explode + groupBy(a, b) for bigram counts and one explode +
   * groupBy(t) for unigram counts (both two-phase partial aggs over the
   * pre-spread doc frame); corpus totals are 1-row broadcast anchors; the
   * unigram join keys are vocabulary-sized, not corpus-sized; the `minCount`
   * floor prunes the bigram tail BEFORE any join; top-k is a TakeOrdered
   * with a lexicographic tiebreak, never a global sort.
   */
  def pmiBigrams(docs: DataFrame, idCol: String, textCol: String,
      minCount: Int = 5, topK: Int = 20): DataFrame = {
    val words = graft.Spread.byKey(docs, col(idCol))
      .select(col(idCol).as("doc_id"), wordsOf(col(textCol)).as("__w"))
    val uni = words.select(explode(col("__w")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    val bi = words.filter(size(col("__w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(__w) - 1), " +
          "i -> struct(element_at(__w, i) AS a, element_at(__w, i + 1) AS b))"))
        .as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    val totals = words.agg(
      sum(size(col("__w")).cast("long")).as("n_uni"),
      sum(greatest(size(col("__w")) - 1, lit(0)).cast("long")).as("n_bi"))
    bi.join(uni.select(col("t").as("a"), col("c").as("c_a")), Seq("a"))
      .join(uni.select(col("t").as("b"), col("c").as("c_b")), Seq("b"))
      .crossJoin(broadcast(totals))
      // fixed association: ((c_ab * n_uni) * n_uni) / ((n_bi * c_a) * c_b)
      .withColumn("pmi_ratio",
        (col("c_ab").cast("double") * col("n_uni").cast("double") *
          col("n_uni").cast("double")) /
        (col("n_bi").cast("double") * col("c_a").cast("double") *
          col("c_b").cast("double")))
      .select(col("a"), col("b"), col("c_ab"), col("c_a"), col("c_b"),
        col("pmi_ratio"))
      .orderBy(col("pmi_ratio").desc, col("a").asc, col("b").asc)
      .limit(topK)
  }

  /**
   * Feature hashing (the hashing trick) — model-free dense text vectors:
   * every word maps to bucket `hash64(word) mod dim` with a ±1 sign from the
   * hash's next bit (sign-hashing keeps collisions unbiased), and a doc's
   * vector is the per-bucket signed count. No vocabulary, no model, no
   * driver state — the featurizer a 100 TB corpus can run in one pass, and
   * the input [[graft.ml.VectorOps.kmeansAssign]] needs to cluster documents
   * end-to-end. Counts are exact integers, so vectors are engine-portable.
   */
  def hashedFeatures(docs: DataFrame, idCol: String, textCol: String,
      dim: Int = 16): DataFrame = {
    require(dim >= 2, s"dim must be >= 2: $dim")
    val h = hash64(col("word"))
    val signed = graft.Spread.byKey(docs, col(idCol))
      .select(col(idCol).as("doc_id"), explode(wordsOf(col(textCol))).as("word"))
      .select(col("doc_id"), pmod(h, lit(dim.toLong)).as("bucket"),
        when(shiftright(h, 32).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L).as("sgn"))
      .groupBy(col("doc_id"), col("bucket")).agg(sum(col("sgn")).as("v"))
    // densify: absent buckets are zero; sort by bucket to rebuild the array
    signed.groupBy(col("doc_id"))
      .agg(expr("transform(array_sort(collect_list(struct(bucket, v))), s -> s.v)").as("sparse"),
        expr("transform(array_sort(collect_list(struct(bucket, v))), s -> s.bucket)").as("idx"))
      .select(col("doc_id"), expr(
        s"""transform(sequence(0, ${dim - 1}), b ->
           |  coalesce(element_at(map_from_arrays(idx, sparse), bigint(b)), 0L))"""
          .stripMargin).as("feature"))
  }

  /** Email / IPv4 / long-digit-run (card-shaped) patterns — Java-regex and
    * RE2 compatible, so the oracle replays them. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val LongNumRe = "\\b[0-9]{13,19}\\b"

  /**
   * PII scrub — redact emails, IPv4 addresses, and card-shaped digit runs,
   * reporting per-document counts and the scrubbed content hash (F14's
   * regex-masking family, applied corpus-wide). Pure codegen'd regex columns;
   * replacement order is email → ip → longnum so the patterns cannot feed
   * each other (an email's host can contain digits but never 13+ in a row).
   */
  def scrubPii(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val scrubbed =
      regexp_replace(
        regexp_replace(
          regexp_replace(t, EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"),
        LongNumRe, "<NUM>")
    docs.select(col(idCol).as("doc_id"),
      size(regexp_extract_all(t, lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(t, lit(Ipv4Re), lit(0))).cast("long").as("n_ips"),
      size(regexp_extract_all(t, lit(LongNumRe), lit(0))).cast("long").as("n_longnums"),
      md5(scrubbed).as("scrubbed_md5"))
  }

  /** Document fingerprints: whole-content hash plus the minimum shingle hash
    * (a 1-permutation MinHash — the winnowing anchor). */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    // rawShingles: `min` dedups inside its own aggregation, so the distinct's
    // separate exchange would be pure waste
    val sh = rawShingles(docs, idCol, textCol, n)
      .groupBy(col("doc_id")).agg(min(hash64(col("shingle"))).as("min_shingle_hash"))
    docs.select(col(idCol).as("doc_id"), hash64(normalizeText(col(textCol))).as("content_hash"))
      .join(sh, Seq("doc_id"), "left")
  }
}
