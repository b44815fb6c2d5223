package graft.text

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class FuzzyMatchSpec extends SparkSpec {
  import spark.implicits._

  private def names(ns: String*): DataFrame = ns.toDF("name")

  test("nearNames finds prefix-similar and suffix-similar planted pairs") {
    val out = FuzzyMatch.nearNames(names(
      "jonathan smith", "jonathon smith", // d=1, forward pass (shared prefix)
      "cold bolt", "old bolt",            // d=1, needs the REVERSED pass
      "acme corp", "zzz unrelated entity"), "name")
      .select("name_a", "name_b", "dist")
      .as[(String, String, Int)].collect().toSet
    assert(out.contains(("jonathan smith", "jonathon smith", 1)))
    assert(out.contains(("cold bolt", "old bolt", 1)))
    assert(!out.exists(p => p._1.contains("unrelated") || p._2.contains("unrelated")))
  }

  test("nearNames normalizes case/whitespace and dedups exact variants") {
    val out = FuzzyMatch.nearNames(names("Acme  Corp", "acme corp", "acme corpse"), "name")
      .as[(String, String, Int)].collect().toSet
    // the two spellings normalize to ONE name; the pair is (acme corp, acme corpse)
    assert(out == Set(("acme corp", "acme corpse", 2)))
  }

  test("nearNames: every emitted pair is a true near-pair, and window-adjacent true pairs are found") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("red", "blue", "cold", "old", "hot", "new", "bolt", "ring", "rod", "gear")
    val corpus = (1 to 80).map(_ => Seq.fill(2)(vocab(rnd.nextInt(vocab.size))).mkString(" ")).distinct
    val out = FuzzyMatch.nearNames(corpus.toDF("name"), "name", window = 40)
      .as[(String, String, Int)].collect()
    // soundness: every emitted distance is the true Levenshtein and <= 2
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    out.foreach { case (a, b, dist) =>
      assert(a < b && dist == lev(a, b) && dist <= 2, s"bad pair ($a, $b, $dist)")
    }
    // recall at window >= block size: within a shared 4-char block the window
    // spans the whole block, so any true pair sharing a forward OR reversed
    // 4-prefix must be found
    val found = out.map(p => (p._1, p._2)).toSet
    for (a <- corpus; b <- corpus if a < b && lev(a, b) <= 2) {
      val share = a.take(4) == b.take(4) || a.reverse.take(4) == b.reverse.take(4)
      if (share) assert(found.contains((a, b)), s"missed in-block pair ($a, $b)")
    }
  }

  test("nearNames is partitioning-independent") {
    val corpus = names("cold bolt", "old bolt", "old rod", "red rod", "new rod",
      "hot gear", "hot gearz", "alpha beta")
    val one = FuzzyMatch.nearNames(corpus.repartition(1), "name")
      .orderBy("name_a", "name_b").collect().toSeq
    val many = FuzzyMatch.nearNames(corpus.repartition(7), "name")
      .orderBy("name_a", "name_b").collect().toSeq
    assert(one == many && one.nonEmpty)
  }
}
