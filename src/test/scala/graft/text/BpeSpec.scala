package graft.text

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Reference implementation shared by the property object and the Spark
  * fixtures: canonical greedy BPE — one left-to-right scan per merge,
  * merging non-overlapping adjacent (a, b) occurrences (what Sennrich's
  * learn_bpe/apply_bpe and the GPT-2 tokenizer's inner loop do). */
object BpeReference {
  def greedyMerge(syms: List[String], a: String, b: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  def greedyApply(syms: List[String], merges: Seq[(String, String)]): List[String] =
    merges.foldLeft(syms) { case (s, (a, b)) => greedyMerge(s, a, b) }

  /** The production string trick at plain-JVM level: wrapped-symbol form,
    * one `String.replace` per merge (same left-to-right non-overlapping
    * semantics as Spark's StringReplace and DuckDB's replace). */
  def stringApply(syms: List[String], merges: Seq[(String, String)]): List[String] = {
    import TextOps.{BpeSepL => L, BpeSepR => R}
    val s0 = syms.map(x => L + x + R).mkString
    val s = merges.foldLeft(s0) { case (s, (a, b)) =>
      s.replace(L + a + R + L + b + R, L + a + b + R)
    }
    if (s.isEmpty) Nil
    else s.replace(R, "").split(L.charAt(0)).toList.drop(1)
  }

  /** Pre-tokenize + symbolize + greedy-apply + count — the whole
    * [[TextOps.bpeApply]] contract computed independently. */
  def applyCounts(text: String, merges: Seq[(String, String)]): (Long, Long) = {
    val words = ("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]+".r).findAllIn(text).toList
    val toks = words.flatMap { w =>
      greedyApply(w.map(_.toString).toList :+ TextOps.BpeEow, merges)
    }
    (toks.length.toLong,
      toks.count(t => t.length > 1 && t != TextOps.BpeEow).toLong)
  }
}

/** [[TextOps.bpeApply]] / [[TextOps.bpeTrain]] — fixtures hand-computed or
  * cross-checked against [[BpeReference]]; the string-trick ≡ greedy
  * equivalence itself is property-pinned in [[BpeProps]]. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def applyRows(texts: Seq[String],
      merges: Seq[(String, String)] = TextOps.DefaultBpeMerges): Map[Long, (Long, Long)] =
    TextOps.bpeApply(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
        "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("hand-computed tokenization: 'the scanner' under the default merges") {
    // the: e+</w> (rank 2, BEFORE t+h), then t+h -> [th, e</w>] — rank
    // order matters; scanner: e+r, er+</w>, a+n, s+c, sc+an ->
    // [scan, n, er</w>] — 5 tokens, 4 multi-char merges
    assert(applyRows(Seq("the scanner"))(0L) === ((5L, 4L)))
  }

  test("same-symbol runs merge greedily left-to-right, non-overlapping") {
    // aaaa -> (aa)(aa)</w>; aaa -> (aa)a</w>; chained per canonical greedy
    val m = Seq(("a", "a"))
    assert(applyRows(Seq("aaaa", "aaa"), m) ===
      Map(0L -> ((3L, 2L)), 1L -> ((3L, 1L))))
  }

  test("merges never cross a word boundary (the </w> marker intervenes)") {
    // 'gas teal' ends word one in s and starts word two with t, with
    // ('s','t') ranked before ('s','</w>') — token counts must equal the
    // two words tokenized separately
    val Seq(joint, gas, teal) = Seq("gas teal", "gas", "teal")
      .map(t => applyRows(Seq(t))(0L))
    assert(joint._1 === gas._1 + teal._1)
    assert(joint._2 === gas._2 + teal._2)
  }

  test("degenerate documents: empty text, digits, punctuation runs") {
    val texts = Seq("", "1234", "a-b!", "   ")
    val got = applyRows(texts)
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) ===
        BpeReference.applyCounts(t, TextOps.DefaultBpeMerges), s"text=[$t]")
    }
  }

  test("hostile text: wrapper chars are stripped, not boundary-forging") {
    // a document smuggling the wrapper bytes plus a fake wrapped merge
    // pattern must tokenize exactly like the text with those bytes removed
    val hostile = "th\u0001e\u0002 \u0001s\u0002\u0001c\u0002an"
    val clean = "the scan"
    val got = applyRows(Seq(hostile, clean))
    assert(got(0L) === got(1L))
  }

  test("bpeApply matches the reference on the real corpus sample") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(40)
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextOps.bpeApply(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    texts.foreach { case (id, t) =>
      assert(got(id) === BpeReference.applyCounts(t, TextOps.DefaultBpeMerges),
        s"doc $id")
    }
  }

  test("bpeTrain learns the hand-computed merges on the Sennrich corpus") {
    // low x3, lower x2, newest x1: (l,o):5 ties (o,w):5 -> lexicographic a
    // picks (l,o); then (lo,w):5; then (low,</w>):3
    val docs = Seq("low low low", "lower lower", "newest").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = TextOps.bpeTrain(docs, "text", k = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1, "l", "o", 5L), (2, "lo", "w", 5L), (3, "low", "</w>", 3L)))
  }

  test("bpeTrain stops early when no pairs remain and keeps its schema") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = TextOps.bpeTrain(empty, "text", k = 4)
    assert(out.columns.toSeq === Seq("rank", "a", "b", "pair_count"))
    assert(out.count() === 0L)
  }

  test("bpeVocab rolls up weighted token counts with deterministic ties") {
    // Sennrich corpus under its own k=3 merges: low x3 -> [low</w>],
    // lower x2 -> [low,e,r,</w>], newest -> [n,e,w,e,s,t,</w>]
    val docs = Seq("low low low", "lower lower", "newest").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val merges = Seq(("l", "o"), ("lo", "w"), ("low", "</w>"))
    val got = TextOps.bpeVocab(docs, "text", merges, topK = 25).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq("e" -> 4L, "</w>" -> 3L, "low</w>" -> 3L,
      "low" -> 2L, "r" -> 2L, "n" -> 1L, "s" -> 1L, "t" -> 1L, "w" -> 1L))
  }

  test("train -> apply composition: learned merges reduce the token count") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = TextOps.bpeTrain(docs, "text", k = 4).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.length === 4)
    val Row(before: Long) = TextOps
      .bpeApply(docs, "doc_id", "text", Seq.empty)
      .agg(org.apache.spark.sql.functions.sum("n_tokens")).head
    val Row(after: Long) = TextOps.bpeApply(docs, "doc_id", "text", merges)
      .agg(org.apache.spark.sql.functions.sum("n_tokens")).head
    assert(after < before)
  }

  test("merge-table guard refuses boundary-spanning and wrapper-forging merges") {
    // ADVICE r14: a left side that merely ENDS with </w> (constructible as
    // a symbol via a right-side-</w> merge) spans word boundaries when
    // used as a merge's left side — the guard must catch it, not just a
    // bare </w> left side. Wrapper chars in either side forge symbol
    // boundaries inside the pattern.
    val docs = Seq((1L, "er t")).toDF("doc_id", "text")
    def refused(merges: Seq[(String, String)]): Unit = {
      intercept[IllegalArgumentException] {
        TextOps.bpeApply(docs, "doc_id", "text", merges)
      }
      intercept[IllegalArgumentException] {
        TextOps.bpeVocab(docs, "text", merges)
      }
      ()
    }
    refused(Seq(("</w>", "t")))
    refused(Seq(("er</w>", "t")))
    refused(Seq(("e\u0001", "r")))
    refused(Seq(("e", "r\u0002")))
    // word-final merges (RIGHT side </w>) stay legal — the table's norm
    val ok = TextOps.bpeApply(docs, "doc_id", "text",
      Seq(("e", "r"), ("er", "</w>"))).collect()
    assert(ok.length === 1)
  }
}
