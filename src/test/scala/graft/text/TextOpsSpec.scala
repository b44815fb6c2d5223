package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("hash64 matches the DuckDB-portable value (cross-engine pin)") {
    // DuckDB: SELECT CAST(CONCAT('0x', substr(md5('hello'),1,15)) AS BIGINT)
    val v = docs((1L, "x")).select(TextOps.hash64(lit("hello"))).as[Long].head()
    assert(v == 419982666956583591L)
  }

  test("shingles: distinct word 3-grams; short docs produce none") {
    val sh = TextOps.shingles(docs((1L, "a b c d"), (2L, "x y")), "doc_id", "text")
      .as[(Long, String)].collect().toSet
    assert(sh == Set((1L, "a b c"), (1L, "b c d")))
  }

  test("winnowing: deterministic per content, bounded count, short docs skipped") {
    val text = "the quick brown fox jumps over the lazy dog"
    val out = TextOps.winnowingFingerprints(
      docs((1L, text), (2L, text), (3L, "hi")), "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // identical content -> identical fingerprint summary
    assert(out(1L) == out(2L))
    assert(!out.contains(3L))  // shorter than k: no grams, no row
    // k=5, w=4: full windows = len - k + 1 - (w - 1); minima dedup below that,
    // but winnowing guarantees at least one fingerprint per window stretch
    val fullWindows = text.length - 5 + 1 - 3
    val n = out(1L)._1
    assert(n >= fullWindows / 4 && n <= fullWindows, s"n=$n windows=$fullWindows")
  }

  test("jaccardNearDups is exact: equals brute-force Jaccard at the threshold") {
    val d = docs(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i k"),   // 7/9 shingles shared with 1
      (3L, "a b c d x y z w q r"),   // small overlap with 1/2
      (4L, "m n o p q r s t u v"))   // disjoint
    def pairsOf(t: Double) =
      TextOps.jaccardNearDups(d, "doc_id", "text", threshold = t)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // brute-force ground truth over all pairs (no prefix/length pruning)
    val sets = TextOps.shingles(d, "doc_id", "text")
      .groupBy($"doc_id").agg(collect_set($"shingle").as("s"), count(lit(1)).as("n"))
    def bruteOf(t: Double) = sets.select($"doc_id".as("doc_a"), $"s".as("sa"), $"n".as("na"))
      .join(sets.select($"doc_id".as("doc_b"), $"s".as("sb"), $"n".as("nb")),
        $"doc_a" < $"doc_b")
      .withColumn("i", size(array_intersect($"sa", $"sb")).cast("long"))
      .filter($"i".cast("double") / ($"na" + $"nb" - $"i").cast("double") >= t)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(bruteOf(0.5) == Set((1L, 2L)))
    assert(pairsOf(0.5) == bruteOf(0.5))
    // at a permissive threshold the pruned join still finds every true pair
    assert(pairsOf(0.1) == bruteOf(0.1) && bruteOf(0.1).size > 1)
  }

  test("jaccardNearDups randomized: prefix pruning never loses a pair") {
    // random corpora stress the ceil/length-filter boundary arithmetic
    val rnd = new scala.util.Random(1234)
    val vocab = (1 to 40).map(i => s"w$i")
    val d = docs((1L to 60L).map { i =>
      (i, Seq.fill(6 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }: _*)
    val sets = TextOps.shingles(d, "doc_id", "text")
      .groupBy($"doc_id").agg(collect_set($"shingle").as("s"), count(lit(1)).as("n"))
    for (t <- Seq(0.5, 0.7, 0.9)) {
      val brute = sets.select($"doc_id".as("doc_a"), $"s".as("sa"), $"n".as("na"))
        .join(sets.select($"doc_id".as("doc_b"), $"s".as("sb"), $"n".as("nb")),
          $"doc_a" < $"doc_b")
        .withColumn("i", size(array_intersect($"sa", $"sb")).cast("long"))
        .filter($"i".cast("double") / ($"na" + $"nb" - $"i").cast("double") >= t)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      val pruned = TextOps.jaccardNearDups(d, "doc_id", "text", threshold = t)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(pruned == brute, s"threshold=$t: pruned=$pruned brute=$brute")
    }
  }

  test("normalizeText collapses whitespace and lowercases") {
    val n = docs((1L, "  Foo\t BAR \n baz ")).select(TextOps.normalizeText($"text"))
      .as[String].head()
    assert(n == "foo bar baz")
  }

  test("exactDedup maps every doc to the canonical min doc_id of its content group") {
    val out = TextOps.exactDedup(
      docs((1L, "same text"), (2L, "Same   TEXT"), (3L, "other")), "doc_id", "text")
      .select("doc_id", "canonical_id", "is_dup").as[(Long, Long, Boolean)]
      .collect().toSet
    assert(out == Set((1L, 1L, false), (2L, 1L, true), (3L, 3L, false)))
  }

  test("minhashNearDups finds a planted near-dup and not an unrelated doc") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 39).map(i => s"w$i").mkString(" ") + " zz"
    val other = (1 to 40).map(i => s"v$i").mkString(" ")
    val pairs = TextOps.minhashNearDups(
      docs((1L, base), (2L, nearDup), (3L, other)), "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("minhashProbe pairs batch against corpus only, never batch-vs-batch") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 39).map(i => s"w$i").mkString(" ") + " zz"
    val other = (1 to 40).map(i => s"v$i").mkString(" ")
    // corpus: base(10), other(12); batch: nearDup(11) + an exact copy of
    // nearDup(13) — 11↔13 is a batch-internal pair and must NOT surface
    val out = TextOps.minhashProbe(
      docs((10L, base), (12L, other)),
      docs((11L, nearDup), (13L, nearDup)), "doc_id", "text")
      .select("batch_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(out == Set((11L, 10L), (13L, 10L)))
  }

  test("containmentPairs: subsumed doc surfaces one-directionally") {
    val para = (1 to 20).map(i => s"w$i").mkString(" ")
    val big = para + " " + (1 to 60).map(i => s"x$i").mkString(" ")
    val other = (1 to 40).map(i => s"v$i").mkString(" ")
    val out = TextOps.containmentPairs(
      docs((1L, para), (2L, big), (3L, other)), "doc_id", "text")
      .select("doc_a", "doc_b", "containment")
      .as[(Long, Long, Double)].collect()
    // para's 18 shingles all appear in big -> containment 1.0 for 1→2 only;
    // big→para is 18/79 and must stay below threshold
    assert(out.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("minhash jaccard is the exact shingle-set similarity") {
    val a = "a b c d e"   // shingles: abc bcd cde
    val b = "a b c d x"   // shingles: abc bcd cdx -> inter 2, union 4 -> 0.5
    val sh = TextOps.hashedShingles(docs((1L, a), (2L, b)), "doc_id", "text")
    val cand = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val out = TextOps.verifiedNearDupPairs(sh, cand, threshold = 0.0)
      .select("jaccard").as[Double].head()
    assert(out == 0.5)
  }

  test("simhash of identical content is identical; near-dup within small hamming") {
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val tweaked = base.replace("w30", "qq")
    val sims = TextOps.simhash(docs((1L, base), (2L, base), (3L, tweaked)), "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(sims(1L) == sims(2L))
    val hd = java.lang.Long.bitCount(sims(1L) ^ sims(3L))
    assert(hd > 0 && hd <= 12, s"hamming=$hd")
  }

  test("simhashPairs returns exact duplicates at hamming 0") {
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val other = (1 to 60).map(i => s"v$i").mkString(" ")
    val out = TextOps.simhashPairs(
      TextOps.simhash(docs((1L, base), (2L, base), (3L, other)), "doc_id", "text"))
      .as[(Long, Long, Long)].collect().toSet
    assert(out.contains((1L, 2L, 0L)))
    assert(!out.exists(p => p._3 > 3))
  }

  test("textStats: counts and ratios on a crafted doc") {
    val out = TextOps.textStats(docs((1L, "The cat, the hat! 42 in a box.")), "doc_id", "text")
      .collect().head
    assert(out.getAs[Long]("n_chars") == 30L)
    assert(out.getAs[Long]("n_words") == 8L)
    assert(out.getAs[Double]("digit_ratio") == 2.0 / 30.0)
    assert(out.getAs[Double]("punct_ratio") == 3.0 / 30.0)
    // stopwords among [the cat, the hat! 42 in a box.]: the, the(x? "the" twice), in, a
    assert(out.getAs[Double]("stop_ratio") == 4.0 / 8.0)
  }

  test("tokenCounts: whitespace vs BPE-ish tokens") {
    val out = TextOps.tokenCounts(docs((1L, "ab 12 c!")), "doc_id", "text")
      .as[(Long, Long, Long)].collect().head
    // ws: [ab, 12, c!] = 3; bpe: [ab, 1, 2, c, !] = 5
    assert(out == ((1L, 3L, 5L)))
  }

  test("langId picks the language with most stopword hits") {
    val out = TextOps.langId(docs(
      (1L, "the cat and the dog of a to in"),
      (2L, "der hund und die katze ist das"),
      (3L, "le chat et la maison les des")), "doc_id", "text")
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "en", 2L -> "de", 3L -> "fr"))
  }

  test("fingerprints: content hash set for all docs, min shingle null for short docs") {
    val out = TextOps.fingerprints(docs((1L, "a b c d"), (2L, "xy")), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        Option(r.getAs[java.lang.Long]("min_shingle_hash"))).toMap
    assert(out(1L).isDefined && out(2L).isEmpty)
  }

  test("decontamination flags train docs overlapping the eval set") {
    val train = docs((1L, "alpha beta gamma delta"), (2L, "one two three four"))
    val eval_ = docs((10L, "beta gamma delta epsilon"), (11L, "unrelated words entirely here"))
    val out = TextOps.decontamination(train, eval_, "doc_id", "text")
      .select("doc_id", "n_shingles", "n_overlap", "is_contaminated")
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    // train 1: shingles {alpha beta gamma, beta gamma delta}; eval has {beta gamma delta, ...}
    assert(out(1L) == ((1L, 2L, 1L, true)))
    assert(out(2L) == ((2L, 2L, 0L, false)))
  }

  test("decontaminationBloom equals decontamination on randomized corpora") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    def doc(): String = Seq.fill(3 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val train = docs((1L to 60L).map(i => i -> doc()): _*)
    val eval_ = docs((100L to 110L).map(i => i -> doc()): _*)
    val exact = TextOps.decontamination(train, eval_, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    // fpp high enough that false positives certainly occur — the semi-join
    // must still kill every one of them
    val bloomed = TextOps.decontaminationBloom(train, eval_, "doc_id", "text", fpp = 0.3)
      .orderBy("doc_id").collect().toSeq
    assert(bloomed == exact)
    graft.Caching.releaseAll()
  }

  test("decontaminationBloom without graft_might_contain fails loud, not slow") {
    // a session missing GraftExtensions used to fall back to a per-row
    // closure-serialized UDF — correct but silently non-codegen on the
    // corpus-sized hot path. The contract is now: require the registered
    // expression and fail with an actionable message instead.
    val train = docs((1L, "alpha beta gamma delta epsilon"))
    val eval_ = docs((10L, "alpha beta gamma delta epsilon"))
    val reg = spark.sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier("graft_might_contain")
    val info = reg.lookupFunction(id)
      .getOrElse(fail("graft_might_contain not registered by GraftExtensions"))
    val builder = reg.lookupFunctionBuilder(id).getOrElse(fail("no builder"))
    assert(reg.dropFunction(id))
    try {
      val e = intercept[IllegalArgumentException] {
        TextOps.decontaminationBloom(train, eval_, "doc_id", "text", fpp = 0.3)
          .collect()
      }
      assert(e.getMessage.contains("graft_might_contain"))
      assert(e.getMessage.contains("Sessions.builder"))
    } finally {
      reg.registerFunction(id, info, builder)
      graft.Caching.releaseAll()
    }
  }

  test("decontaminationBloom: empty eval set contaminates nothing") {
    val train = docs((1L, "alpha beta gamma delta"))
    val eval_ = docs((10L, "ab")) // too short for a 3-shingle: empty eval shingle set
    val out = TextOps.decontaminationBloom(train, eval_, "doc_id", "text")
      .select("doc_id", "n_overlap", "is_contaminated")
      .as[(Long, Long, Boolean)].collect()
    assert(out.toSeq == Seq((1L, 0L, false)))
    graft.Caching.releaseAll()
  }

  test("bm25: zero for absent terms, higher for denser matches at equal length") {
    val out = TextOps.bm25(docs(
      (1L, "the the the cat sat"),
      (2L, "the cat sat mat hat"),
      (3L, "cat sat mat hat bat")), "doc_id", "text", terms = Seq("the"))
      .select("doc_id", "bm25").as[(Long, Double)].collect().toMap
    assert(out(3L) == 0.0)                       // term absent
    assert(out(1L) > out(2L) && out(2L) > 0.0)   // tf 3 beats tf 1 at equal dl
  }

  test("scrubPii counts and redacts emails, IPs, and long digit runs") {
    val out = TextOps.scrubPii(docs(
      (1L, "mail a.user@test.org or 10.1.2.3 card 4111111111111111 ok"),
      (2L, "nothing here")), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_emails") == 1L)
    assert(out(1L).getAs[Long]("n_ips") == 1L)
    assert(out(1L).getAs[Long]("n_longnums") == 1L)
    assert(out(2L).getAs[Long]("n_emails") == 0L)
    // the scrubbed hash equals md5 of the expected redacted text
    val expected = spark.sql(
      "SELECT md5('mail <EMAIL> or <IP> card <NUM> ok')").as[String].head()
    assert(out(1L).getAs[String]("scrubbed_md5") == expected)
  }

  test("tfidfTopTerm picks the rarest-weighted frequent term, ties by word") {
    val out = TextOps.tfidfTopTerm(docs(
      (1L, "apple apple banana"),       // apple tf2 df1 -> 2*(3+1)/(1+1)=4; banana tf1 df2 -> 1.33
      (2L, "banana cherry cherry"),     // cherry tf2 df1 -> 4
      (3L, "banana zebra zebra zebra")), "doc_id", "text")
      .select("doc_id", "top_word").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "apple", 2L -> "cherry", 3L -> "zebra"))
  }

  test("connectedComponents: chain collapses to one component, pairs stay separate") {
    // chain 5-3-8 (needs >1 propagation round) plus an isolated pair 10-9
    val pairs = Seq((5L, 3L), (3L, 8L), (10L, 9L)).toDF("doc_a", "doc_b")
    val out = TextOps.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(3L -> 3L, 5L -> 3L, 8L -> 3L, 9L -> 9L, 10L -> 9L))
  }

  test("connectedComponents accepts integer ids on the small-graph path") {
    // the driver-side union-find reads getLong; integer doc ids (fine on
    // the distributed path) must not ClassCastException under the cap
    val pairs = Seq((5, 3), (3, 8), (10, 9)).toDF("doc_a", "doc_b")
    val out = TextOps.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(3L -> 3L, 5L -> 3L, 8L -> 3L, 9L -> 9L, 10L -> 9L))
  }

  test("connectedComponents reaches the fixpoint on a long chain") {
    // a path graph 0-1-2-...-9: min label must ripple the full diameter
    val pairs = (0L until 9L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val out = TextOps.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(out.size == 10 && out.values.forall(_ == 0L))
  }

  test("connectedComponents randomized: equals a union-find reference") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 30 + trial * 10
      val edges = Seq.fill(n)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter { case (a, b) => a != b }
      // union-find reference
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val ids = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val expected = ids.map(id => id -> find(id)).toMap
      // min-of-component canonicalization: find() already chains to the min
      // because unions always point the larger root at the smaller
      val got = TextOps.connectedComponents(edges.toDF("doc_a", "doc_b"))
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"trial $trial")
    }
  }

  test("hashedFeatures: exact signed counts, dense dim, clusters compose with kmeans") {
    val out = TextOps.hashedFeatures(docs(
      (1L, "apple apple apple"),
      (2L, "apple apple apple"),
      (3L, "zebra lion tiger bear wolf")), "doc_id", "text", dim = 8)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1)).toMap
    // fixed width, identical content -> identical vector, |sum| bounded by words
    assert(out.values.forall(_.length == 8))
    assert(out(1L) == out(2L))
    assert(out(1L).map(math.abs).sum == 3L)   // one bucket holds +-3
    assert(out(3L) != out(1L))
    // composition: the hashing-trick vectors feed kmeans directly
    implicit val enc = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong)
    val vecs = TextOps.hashedFeatures(docs(
      (0L, "apple apple apple"), (1L, "apple apple"),
      (25L, "zebra lion tiger"), (26L, "zebra lion")), "doc_id", "text", dim = 8)
      .withColumnRenamed("doc_id", "vec_id")
    val clusters = graft.ml.VectorOps.kmeansAssign(vecs, vecCol = "feature",
      centroidMod = 25, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(clusters(1L) == clusters(0L), "apple docs cluster with the apple seed")
    assert(clusters(26L) == clusters(25L), "zebra docs cluster with the zebra seed")
  }

  test("lmScore: repeated phrasing scores high, gibberish is all hapax") {
    val d = docs(
      (1L, "the cat sat"), (2L, "the cat sat"), (3L, "the cat sat"),
      (4L, "qz wv xj kp"),   // bigrams occur nowhere else
      (5L, "x"))             // < n words: no row
    val out = TextOps.lmScore(d, "doc_id", "text")
      .select("doc_id", "n_ngrams", "freq_sum", "n_hapax")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // docs 1-3: bigrams "the cat"/"cat sat" each occur 3x -> freq_sum 6, no hapax
    assert(out(1L) == ((2L, 6L, 0L)) && out(2L) == out(1L) && out(3L) == out(1L))
    // doc 4: 3 bigrams, each corpus-unique
    assert(out(4L) == ((3L, 3L, 3L)))
    assert(!out.contains(5L))
  }

  test("groupedTopTerms ranks by count with deterministic ties") {
    val d = Seq(
      ("en", "a b a b a b"),    // "a b" x3, "b a" x2
      ("en", "c d"),
      ("fr", "x y")).toDF("lang", "text")
    val out = TextOps.groupedTopTerms(d, "lang", "text", n = 2, topK = 2)
      .select("grp", "term", "cnt", "rank")
      .as[(String, String, Long, Int)].collect().toSet
    assert(out == Set(("en", "a b", 3L, 1), ("en", "b a", 2L, 2),
      ("fr", "x y", 1L, 1)))
  }

  test("winnowingPairs: identical docs pair via shared fingerprints; ubiquitous fingerprints are guarded") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val d = docs((1L, text), (2L, text), (3L, "completely different words here xyzzy"))
    val out = TextOps.winnowingPairs(d, "doc_id", "text", minShared = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(out.map(p => (p._1, p._2)) == Set((1L, 2L)))
    // identical docs share their whole fingerprint set
    val nFp = TextOps.winnowingFingerprints(docs((1L, text)), "doc_id", "text")
      .select("n_fingerprints").as[Long].head()
    assert(out.head._3 == nFp)
    // maxDf guard: a fingerprint in every doc generates no pairs at maxDf=1
    val none = TextOps.winnowingPairs(d, "doc_id", "text", maxDf = 1, minShared = 1)
    assert(none.count() == 0)
  }

  test("duplicatedPassages: adjacent duplicated windows merge into maximal spans") {
    val d = docs(
      (1L, "a b c d e f g h"),           // shares a..e with 2, f g h with 4
      (2L, "x x a b c d e y z w"),        // a..e at token offset 3
      (3L, "p q r s t u"),                // unique: no spans
      (4L, "a b c z1 z2 z3 z4 f g h"),    // two separated shared passages
      (5L, "a b"))                        // shorter than n: no windows
    val out = TextOps.duplicatedPassages(d, "doc_id", "text", n = 3)
      .select("doc_id", "span_start", "span_end", "n_windows", "max_df")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // doc 1: dup windows at pos 1,2,3 ([abc][bcd][cde]) and 6 ([fgh]);
    // pos 6 <= 3 + n so the runs chain into ONE maximal span 1..8
    // doc 4: [abc] at pos 1 and [fgh] at pos 8 are > n apart -> two spans
    assert(out == Set(
      (1L, 1L, 8L, 4L, 3L),
      (2L, 3L, 7L, 3L, 3L),
      (4L, 1L, 3L, 1L, 3L),
      (4L, 8L, 10L, 1L, 2L)))
    // maxDf guard: a ceiling below every real df suppresses all spans
    assert(TextOps.duplicatedPassages(d, "doc_id", "text", n = 3, maxDf = 1)
      .count() == 0)
  }

  test("applyPassageMask: in-span tokens are cut; spanless and all-removed docs survive") {
    val d = docs(
      (1L, "a b c d e f g h"),           // one span covering the whole doc
      (2L, "x x a b c d e y z w"),        // span 3..7 -> kept "x x y z w"
      (3L, "p q r s t u"),                // no spans -> unchanged
      (4L, "a b c z1 z2 z3 z4 f g h"),    // two spans -> kept middle
      (5L, "a b"))                        // shorter than n -> unchanged
    val out = TextOps.applyPassageMask(d, "doc_id", "text", n = 3)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == (("", 0L, 8L)))
    assert(out(2L) == (("x x y z w", 5L, 5L)))
    assert(out(3L) == (("p q r s t u", 6L, 0L)))
    assert(out(4L) == (("z1 z2 z3 z4", 4L, 6L)))
    assert(out(5L) == (("a b", 2L, 0L)))
  }

  test("pmiBigrams: exact ratio arithmetic, minCount floor, deterministic tiebreak") {
    val d = docs(
      (1L, "new york new york city"),
      (2L, "san francisco san francisco"),
      (3L, "the the the the"))
    // n_uni = 13, n_bi = 10; counts: new/york/san/francisco 2, city 1, the 4
    val out = TextOps.pmiBigrams(d, "doc_id", "text", minCount = 2, topK = 3)
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(out.map(r => (r._1, r._2, r._3)).toSeq == Seq(
      ("new", "york", 2L), ("san", "francisco", 2L), ("the", "the", 3L)))
    // (2*13*13)/(10*2*2) for both leaders (lex tiebreak picks new<san first)
    assert(out(0)._6 == 338.0 / 40.0 && out(1)._6 == 338.0 / 40.0)
    assert(out(2)._6 == 507.0 / 160.0)  // (3*13*13)/(10*4*4)
    // minCount floor: at 1 every distinct adjacent pair survives
    assert(TextOps.pmiBigrams(d, "doc_id", "text", minCount = 1, topK = 100)
      .count() == 6)
  }
}
