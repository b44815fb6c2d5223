package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Data-selection operators: CCNet-style surprisal scoring, DSIR importance
  * weights, the Gopher rule chart, and (via RefWorkload) multi-touch
  * attribution. Correctness vs the DuckDB oracle is pinned by the gate
  * entries; these tests pin the SEMANTIC claims the oracle can't express —
  * monotonicity, threshold edges, and conservation invariants. */
class DataSelectionSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("bitLen is floor(log2)+1, exactly, across power-of-two edges") {
    val xs = Seq(1L, 2L, 3L, 4L, 7L, 8L, 1023L, 1024L, 1025L, (1L << 40) - 1, 1L << 40)
    val got = xs.toDF("x").select(TextOps.bitLen(col("x"))).as[Long].collect()
    val want = xs.map(x => 64L - java.lang.Long.numberOfLeadingZeros(x))
    assert(got.toSeq == want)
  }

  test("surprisalBits: a doc of corpus-typical bigrams scores fewer mean bits " +
      "than a doc of bigrams seen nowhere else") {
    val common = (1 to 8).map(i => (i.toLong, "a b a b a b a b a b"))
    val rare = (100L, "q w e r t y u i o p")
    val out = TextOps.surprisalBits(docs(common :+ rare: _*), "doc_id", "text")
      .select($"doc_id", $"mean_bits", $"n_bigrams").as[(Long, Double, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(100L)._2 == 9L) // 10 words -> 9 bigram positions
    assert(out(1L)._2 == 9L)
    // every common doc scores identically, and far below the rare doc
    assert((1 to 8).map(i => out(i.toLong)._1).distinct.size == 1)
    assert(out(1L)._1 < out(100L)._1)
  }

  test("dsirWeights: content matching the target slice outweighs content " +
      "absent from it") {
    val target = (1 to 6).map(i => (i.toLong, "spark scala query plan spark scala"))
    val likeTarget = (50L, "spark scala query plan")
    val unlikeTarget = (60L, "zebra yak xylophone walrus")
    val d = docs(target :+ likeTarget :+ unlikeTarget: _*)
      .withColumn("is_tgt", col("doc_id") <= 6L)
    val w = TextOps.dsirWeights(d, "doc_id", "text", col("is_tgt"))
      .select($"doc_id", $"weight_bits").as[(Long, Long)].collect().toMap
    assert(w(50L) > w(60L),
      s"target-like ${w(50L)} should outweigh unlike ${w(60L)}")
  }

  test("gopherRules: each threshold edge flips exactly its own rule") {
    val w49 = (1 to 49).map(i => s"word$i").mkString(" ")
    val w50 = (1 to 50).map(i => s"word$i").mkString(" ")
    val noStop = (1 to 50).map(_ => "walrus").mkString(" ")
    val longWords = (1 to 50).map(_ => "extraordinarily").mkString(" ")
    val symbols = (1 to 50).map(_ => "the###").mkString(" ") + " with with"
    val out = TextOps.gopherRules(docs(
      (1L, w49 + " the with"),   // 51 words incl. stopwords — passes all
      (2L, w49),                 // 49 words -> word-count rule fails
      (3L, noStop + " x " + w49), // no stopword hits
      (4L, longWords + " the with"), // mean word length > 10
      (5L, symbols)), "doc_id", "text")
      .select($"doc_id", $"rule_word_count", $"rule_word_len",
        $"rule_stopwords", $"rule_symbol_ratio", $"passes_all")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L)._6, "clean doc should pass all rules")
    assert(!out(2L)._2 && !out(2L)._6, "49 words fails word count")
    assert(!out(3L)._4 && !out(3L)._6, "stopword-free doc fails stopwords")
    assert(!out(4L)._3 && !out(4L)._6, "15-char words fail mean length")
    assert(!out(5L)._5 && !out(5L)._6, "symbol-dense doc fails symbol ratio")
  }

  test("attribution conserves purchases and revenue across models, and only " +
      "emits real channels") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.queries.RefWorkload.attribution(spark, dir)
      .select($"model", $"channel", $"purchases", $"revenue_cents")
      .as[(String, String, Long, Long)].collect()
    val models = out.groupBy(_._1)
    assert(models.keySet == Set("first_touch", "last_touch"))
    // both models attribute the SAME purchase set — totals must agree
    val totals = models.map { case (m, rs) =>
      m -> ((rs.map(_._3).sum, rs.map(_._4).sum)) }
    assert(totals("first_touch") == totals("last_touch"))
    assert(out.map(_._2).toSet.subsetOf(Set("view", "click", "direct")))
    // a 'direct' purchase has no preceding touch under EITHER model, so the
    // direct rows must match exactly across models
    val direct = out.filter(_._2 == "direct").map(r => (r._1, r._3, r._4)).toSet
    assert(direct.map(d => (d._2, d._3)).size <= 1)
  }
}
