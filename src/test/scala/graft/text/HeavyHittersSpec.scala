package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {

  import spark.implicits._

  private def expected(tokens: Seq[String], k: Int): Set[(String, Long, Double)] = {
    val n = tokens.size.toLong
    tokens.groupBy(identity).view.mapValues(_.size.toLong).toMap.collect {
      case (t, c) if c * k >= n => (t, c, c.toDouble / n.toDouble)
    }.toSet
  }

  test("exact heavy hitters match a full count under any partitioning") {
    val tokens = Seq.fill(300)("alpha") ++ Seq.fill(150)("beta") ++
      Seq.fill(60)("gamma") ++ (0 until 490).map(i => s"unique_$i")
    val want = expected(tokens, k = 10)
    assert(want.map(_._1) == Set("alpha", "beta"), "test fixture sanity")
    for (p <- Seq(1, 3, 13)) {
      val got = HeavyHitters.heavyHitters(
          tokens.toDF("token").repartition(p), "token", k = 10)
        .as[(String, Long, Double)].collect().toSet
      assert(got == want, s"partitioning p=$p")
      graft.Caching.releaseAll()
    }
  }

  test("a long flat tail cannot evict a true heavy hitter (MG superset)") {
    // 30 hits of the hitter among 170 distinct fillers, capacity 10:
    // constant decrement pressure, but cnt=30 > n/(k+1)=18 must survive
    val tokens = scala.util.Random.shuffle(
      Seq.fill(30)("hot") ++ (0 until 170).map(i => s"cold_$i"))
    val got = HeavyHitters.heavyHitters(
        tokens.toDF("token").repartition(4), "token", k = 10)
      .as[(String, Long, Double)].collect().toSet
    assert(got == expected(tokens, k = 10))
    assert(got.map(_._1) == Set("hot"))
    graft.Caching.releaseAll()
  }

  test("property: random Zipf-ish corpora match brute force for any k/partitioning") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val vocab = 1 + rnd.nextInt(200)
      // Zipf-ish: token t drawn with weight ~ 1/(rank+1)
      val tokens = Seq.fill(500 + rnd.nextInt(1500)) {
        val r = math.min(vocab - 1, (1.0 / (rnd.nextDouble() + 0.005)).toInt % vocab)
        s"t$r"
      }
      val k = 2 + rnd.nextInt(30)
      val p = 1 + rnd.nextInt(16)
      val got = HeavyHitters.heavyHitters(
          tokens.toDF("token").repartition(p), "token", k)
        .as[(String, Long, Double)].collect().toSet
      assert(got == expected(tokens, k), s"trial=$trial k=$k p=$p vocab=$vocab")
      graft.Caching.releaseAll()
    }
  }

  test("property: merged mgSummary respects the additive n/(k+1) bound under any batch split") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      val vocab = 1 + rnd.nextInt(100)
      val tokens = Seq.fill(400 + rnd.nextInt(1200)) {
        val r = math.min(vocab - 1, (1.0 / (rnd.nextDouble() + 0.01)).toInt % vocab)
        s"t$r"
      }
      val k = 2 + rnd.nextInt(20)
      // split the stream into disjoint "batches", summarize each under its
      // own partitioning, merge by plain addition — exactly the persisted
      // per-batch layer's serve path (CorpusIngest.frequentTerms)
      val nb = 1 + rnd.nextInt(4)
      val batches = tokens.grouped(math.max(1, tokens.size / nb + 1)).toSeq
      val merged = batches.map { b =>
        HeavyHitters.mgSummary(
            b.toDF("token").repartition(1 + rnd.nextInt(8)), "token", k)
          .as[(String, Long)].collect().toMap
      }.reduce { (a, b) =>
        (a.keySet ++ b.keySet).iterator
          .map(t => t -> (a.getOrElse(t, 0L) + b.getOrElse(t, 0L))).toMap
      }
      val truth = tokens.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = tokens.size.toDouble
      val eps = n / (k + 1)
      merged.foreach { case (t, c) =>
        assert(c <= truth(t), s"trial=$trial $t over-counted: $c > ${truth(t)}")
        assert(c.toDouble >= truth(t) - eps,
          s"trial=$trial $t under bound: $c < ${truth(t)} - $eps")
      }
      truth.foreach { case (t, f) =>
        if (f.toDouble > eps)
          assert(merged.contains(t), s"trial=$trial heavy $t (f=$f, eps=$eps) missing")
      }
    }
  }

  test("threshold is integer-exact: cnt*k == n is in, one less is out") {
    // n = 40, k = 4: "edge" has exactly 10 = n/k occurrences (in);
    // "below" has 9 (out); fillers make up the rest
    val tokens = Seq.fill(10)("edge") ++ Seq.fill(9)("below") ++
      (0 until 21).map(i => s"f_$i")
    val got = HeavyHitters.heavyHitters(
        tokens.toDF("token").repartition(2), "token", k = 4)
      .as[(String, Long, Double)].collect().toSet
    assert(got.map(_._1) == Set("edge"))
    assert(got == expected(tokens, k = 4))
    graft.Caching.releaseAll()
  }
}
