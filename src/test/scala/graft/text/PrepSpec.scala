package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PrepSpec extends SparkSpec {
  import spark.implicits._

  test("hashSplit: stable per-id assignment, every row assigned, weights hold roughly") {
    val small = (1L to 50L).toDF("id")
    val large = (1L to 500L).toDF("id")
    val s = Prep.hashSplit(small, "id").select("id", "split")
      .as[(Long, String)].collect().toMap
    val l = Prep.hashSplit(large, "id").select("id", "split")
      .as[(Long, String)].collect().toMap
    // a doc's split never depends on the rest of the corpus
    assert(s.forall { case (id, sp) => l(id) == sp })
    assert(l.values.forall(Set("train", "val", "test")))
    val train = l.values.count(_ == "train")
    assert(train > 300 && train < 480, s"train=$train of 500")
  }

  test("packShards cuts contiguous shards at the exclusive prefix budget") {
    val df = Seq((1L, 600L), (2L, 600L), (3L, 600L), (4L, 600L), (5L, 600L))
      .toDF("id", "toks")
    val out = Prep.packShards(df, "id", "toks", budget = 1000L)
      .select("id", "shard").as[(Long, Long)].collect().toMap
    // exclusive prefix sums 0,600,1200,1800,2400 -> shards 0,0,1,1,2
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 2L))
  }

  test("packShards with partition cols packs each partition independently") {
    val df = Seq(("a", 1L, 900L), ("a", 2L, 900L), ("b", 3L, 100L), ("b", 4L, 100L))
      .toDF("w", "id", "toks")
    val out = Prep.packShards(df, "id", "toks", budget = 1000L, partitionCols = Seq("w"))
      .select("w", "id", "shard").as[(String, Long, Long)].collect().toSet
    assert(out == Set(("a", 1L, 0L), ("a", 2L, 0L), ("b", 3L, 0L), ("b", 4L, 0L)))
  }

  test("stratifiedSample keeps deterministic per-stratum fractions and drops unknown strata") {
    val rows = (0L until 1000L).map(i => (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "xx"))
    val df = rows.toDF("doc_id", "stratum")
    val kept = Prep.stratifiedSample(df, "doc_id", "stratum",
      Map("en" -> 0.5, "de" -> 0.1))
    val counts = kept.groupBy("stratum").count()
      .as[(String, Long)].collect().toMap
    // deterministic: the same call yields the same rows
    val again = Prep.stratifiedSample(df, "doc_id", "stratum",
      Map("en" -> 0.5, "de" -> 0.1)).select("doc_id").as[Long].collect().toSet
    assert(kept.select("doc_id").as[Long].collect().toSet == again)
    // unknown stratum dropped entirely; rates roughly honored (hash grid)
    assert(!counts.contains("xx"))
    assert(counts("en") > 100 && counts("en") < 234)   // ~167 expected of 334
    assert(counts("de") > 5 && counts("de") < 70)      // ~33 expected of 333
    // rate 1.0 keeps everything, rate 0 would keep nothing
    val full = Prep.stratifiedSample(df, "doc_id", "stratum", Map("xx" -> 1.0))
    assert(full.count() == rows.count(_._2 == "xx"))
  }

  test("upsampleEpochs: floor(w) copies for all, one extra for the hash fraction") {
    val rows = (0L until 600L).map(i =>
      (i, if (i % 3 == 0) "hot" else if (i % 3 == 1) "base" else "cold"))
    val df = rows.toDF("doc_id", "stratum")
    // hot = 2.5 epochs, base = 1.0, cold omitted (dropped)
    val out = Prep.upsampleEpochs(df, "doc_id", "stratum",
      Map("hot" -> 25000, "base" -> 10000))
    val perDoc = out.groupBy("doc_id", "stratum")
      .agg(count(lit(1)).as("n"), max("epoch").as("emax"), min("epoch").as("emin"))
      .as[(Long, String, Long, Long, Long)].collect()
    // every base doc exactly once (epoch 0); every hot doc 2 or 3 times with
    // contiguous 0-based epochs; cold gone entirely
    assert(perDoc.forall { case (_, s, n, emax, emin) =>
      emin == 0L && emax == n - 1 &&
        (if (s == "base") n == 1L else s == "hot" && (n == 2L || n == 3L))
    })
    val hot = perDoc.filter(_._2 == "hot")
    val extra = hot.count(_._3 == 3L)
    // the fractional-epoch share tracks 0.5 (hash grid over 200 hot docs)
    assert(extra > 60 && extra < 140, s"extra=$extra of ${hot.length}")
    // deterministic: same call, same multiset
    val again = Prep.upsampleEpochs(df, "doc_id", "stratum",
      Map("hot" -> 25000, "base" -> 10000))
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(perDoc.map(r => r._1 -> r._3).toMap == again)
    // pure fraction (0.5 epochs): only the hash-selected half, all epoch 0
    val half = Prep.upsampleEpochs(df, "doc_id", "stratum", Map("hot" -> 5000))
    assert(half.select("epoch").distinct().as[Long].collect().toSeq == Seq(0L))
    assert(half.count() < 200)
  }

  test("zorderValue interleaves bits: the 2x2 block maps to 0..3, (3,1) -> 7") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 1L), (65535L, 65535L))
      .toDF("x", "y")
      .select($"x", $"y", Prep.zorderValue($"x", $"y").as("z"))
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(df((0L, 0L)) == 0L && df((1L, 0L)) == 1L && df((0L, 1L)) == 2L && df((1L, 1L)) == 3L)
    assert(df((3L, 1L)) == 7L)
    assert(df((65535L, 65535L)) == (1L << 32) - 1L)   // all 32 low bits set
  }

  test("capPerGroup: at most cap rows per group, hash-stable selection") {
    val df = (1L to 100L).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
    val out = Prep.capPerGroup(df, "id", "grp", cap = 10)
      .select("grp", "id").as[(String, Long)].collect()
    val byGrp = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byGrp.values.forall(_.size == 10))
    // groups under the cap keep everything
    val small = Prep.capPerGroup(df.filter($"id" <= 5), "id", "grp", cap = 10)
    assert(small.count() == 5)
    // selection is a pure function of the id, not of the corpus: the kept
    // set of a group does not change when OTHER groups change
    val out2 = Prep.capPerGroup(df.filter($"grp" === "g1"), "id", "grp", cap = 10)
      .select("id").as[Long].collect().toSet
    assert(out2 == byGrp("g1"))
  }

  test("mixtureSample: kept proportions track the target weights exactly as sized") {
    val df = ((1L to 600L).map(i => (i, "en")) ++ (601L to 900L).map(i => (i, "de")) ++
      (901L to 1000L).map(i => (i, "xx"))).toDF("id", "lang")
    val weights = Map("en" -> 7500, "de" -> 2500)
    val kept = Prep.mixtureSample(df, "id", "lang", weights)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // strata outside the weight map are dropped
    assert(!kept.contains("xx"))
    // binding stratum: en supplies 600 of 75% -> K = 800; de target = 200 of 300
    // hash thinning is exact-in-expectation on the 1/10000 grid; allow slack
    val en = kept.getOrElse("en", 0L); val de = kept.getOrElse("de", 0L)
    assert(en > 480 && en <= 600, s"en=$en")
    assert(de > 120 && de < 280, s"de=$de")
    // deterministic: same corpus -> same kept set
    val again = Prep.mixtureSample(df, "id", "lang", weights)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(again == kept)
  }

  test("chunkWindows: full coverage, correct overlap, truncated tail, short-doc singleton") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 words
      (2L, "a b c")                                   // shorter than one window
    ).toDF("doc_id", "text")
    val out = Prep.chunkWindows(docs, "doc_id", "text", window = 4, stride = 2)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Int, Long, String)].collect().toSeq
    val d1 = out.filter(_._1 == 1L)
    // starts 0,2,4,6 -> 4 chunks; last covers words 7..10 (full window)
    assert(d1.map(_._2) == Seq(0, 1, 2, 3))
    assert(d1.map(_._3) == Seq(4L, 4L, 4L, 4L))
    def h(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(d1.head._4 == h("w1 w2 w3 w4"))
    assert(d1.last._4 == h("w7 w8 w9 w10"))
    // doc 2: one truncated chunk with all 3 words
    assert(out.filter(_._1 == 2L) == Seq((2L, 0, 3L, h("a b c"))))
  }

  test("chunkWindows: a truncated tail window keeps the remainder words") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text") // 5 words, w=4, s=2
    val out = Prep.chunkWindows(docs, "doc_id", "text", window = 4, stride = 2)
      .orderBy("chunk_id").as[(Long, Int, Long, String)].collect().toSeq
    // starts 0 and 2: chunk 1 covers c d e (3 words)
    assert(out.map(c => (c._2, c._3)) == Seq((0, 4L), (1, 3L)))
  }

  test("chunkWindows property: full word coverage, exact chunk count and sizes for random shapes") {
    val rnd = new scala.util.Random(19)
    val cases = Seq.fill(12) {
      val window = 1 + rnd.nextInt(8)
      val stride = 1 + rnd.nextInt(window)
      val nWords = 1 + rnd.nextInt(30)
      (window, stride, nWords)
    }
    for ((window, stride, nWords) <- cases) {
      val text = (1 to nWords).map(i => s"w$i").mkString(" ")
      val out = Prep.chunkWindows(Seq((1L, text)).toDF("doc_id", "text"),
          "doc_id", "text", window, stride)
        .orderBy("chunk_id").as[(Long, Int, Long, String)].collect().toSeq
      val lastStart = ((math.max(nWords - window, 0) + stride - 1) / stride) * stride
      // chunk ids dense from 0; count matches the closed-form
      assert(out.map(_._2) == (0 to lastStart / stride).toList,
        s"w=$window s=$stride n=$nWords")
      // each chunk's token count is exactly min(window, nWords - start)
      out.foreach { case (_, id, nTok, _) =>
        assert(nTok == math.min(window, nWords - id * stride),
          s"w=$window s=$stride n=$nWords chunk=$id")
      }
      // coverage: the union of [start, start+len) is [0, nWords)
      val covered = out.flatMap { case (_, id, nTok, _) =>
        (id * stride) until (id * stride + nTok.toInt) }.toSet
      assert(covered == (0 until nWords).toSet, s"w=$window s=$stride n=$nWords")
    }
  }

  test("zorderValue locality: any aligned 2^k block is a contiguous z-range") {
    // the property file-skipping relies on: the z-values of an aligned
    // (2^k x 2^k) block occupy EXACTLY [z(x0,y0), z(x0,y0) + 4^k - 1]
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 20) {
      val k = 1 + rnd.nextInt(4)
      val side = 1L << k
      val x0 = rnd.nextInt(1 << 10).toLong / side * side
      val y0 = rnd.nextInt(1 << 10).toLong / side * side
      val block = for (dx <- 0L until side; dy <- 0L until side) yield (x0 + dx, y0 + dy)
      val zs = block.toDF("x", "y")
        .select(Prep.zorderValue($"x", $"y").as("z")).as[Long].collect().sorted
      assert(zs.length == side * side)
      assert(zs.last - zs.head == side * side - 1, s"block at ($x0,$y0) size $side")
      assert(zs.zip(zs.tail).forall { case (a, b) => b == a + 1 }, "contiguous")
    }
  }
}
