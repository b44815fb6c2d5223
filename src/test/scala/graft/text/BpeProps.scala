package graft.text

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** The load-bearing equivalence behind [[TextOps.bpeApply]]'s plan shape:
  * one `replace(L a R L b R -> L ab R)` over the wrapped symbol string IS
  * canonical greedy left-to-right BPE merging. Both wrappers matter: a
  * match consumes exactly the two wrapped symbols (adjacent occurrences
  * stay disjoint, unlike a space-delimited encoding whose pattern eats the
  * next candidate's delimiter), and the closing wrapper pins the second
  * symbol exactly (the first draft's open-ended pattern let `b` match a
  * following `bc` — THIS property caught it). Pure-JVM strings here
  * (`String.replace` has the same left-to-right non-overlapping semantics
  * as Spark's StringReplace and DuckDB's replace); the Spark expression is
  * fixture-pinned in [[BpeSpec]]. */
object BpeProps extends Properties("TextOps.bpeMergeOnce") {

  // small alphabet with composite symbols overlapping the atoms — maximal
  // chance of boundary false-positives if the encoding were unsound
  private val sym = Gen.oneOf("a", "b", "c", "ab", "bc", "aa", TextOps.BpeEow)
  private val syms = Gen.choose(0, 12).flatMap(Gen.listOfN(_, sym))
  private val merge = for { a <- sym; b <- sym } yield (a, b)
  private val merges = Gen.choose(1, 4).flatMap(Gen.listOfN(_, merge))

  property("replace-chain == canonical greedy, any symbols, any merges") =
    forAll(syms, merges) { (s, m) =>
      BpeReference.stringApply(s, m) == BpeReference.greedyApply(s, m)
    }

  property("adjacent occurrences all merge in one pass (the run cases)") =
    forAll(Gen.choose(1, 9), Gen.oneOf("a", "ab")) { (n, a) =>
      val s = List.fill(n)(a)
      val merged = BpeReference.stringApply(s, Seq((a, a)))
      merged == List.fill(n / 2)(a + a) ++ (if (n % 2 == 1) List(a) else Nil)
    }
}
