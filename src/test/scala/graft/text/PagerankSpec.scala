package graft.text

import graft.SparkSpec

/** [[TextOps.pagerankInt]] — distributed integer PageRank. Cross-engine
  * exactness is pinned by the `dedup_pagerank` gate entry; these tests pin
  * the graph semantics on hand topologies. */
class PagerankSpec extends SparkSpec {
  import spark.implicits._

  private def pr(pairs: (Long, Long)*): Map[Long, Long] =
    TextOps.pagerankInt(pairs.toDF("doc_a", "doc_b"))
      .as[(Long, Long)].collect().toMap

  test("star center outranks its leaves; leaves rank equally") {
    val m = pr((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L))
    assert((2L to 6L).forall(l => m(1L) > m(l)), s"center must win: $m")
    assert((2L to 6L).map(m).distinct.size == 1, "symmetric leaves must tie")
  }

  test("a clique ranks uniformly at the base scale") {
    val nodes = 1L to 4L
    val m = pr(nodes.combinations(2).map(p => (p(0), p(1))).toSeq: _*)
    // fully symmetric graph: every node holds ~2^32 (exact up to the
    // deterministic truncation dust, identical for all nodes)
    assert(m.values.toSet.size == 1, s"clique must tie: $m")
    assert(math.abs(m(1L) - (1L << 32)) < 16L)
  }

  test("adding an edge raises both endpoints' centrality") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val before = pr(chain: _*)
    val after = pr(chain :+ ((2L, 4L)): _*)
    assert(after(2L) > before(2L) && after(4L) > before(4L))
  }

  test("driver replay and distributed loop produce identical ranks") {
    // asymmetric topology (star + chain + bridge) so ranks are nontrivial;
    // smallGraphCap = 0 forces the distributed loop for the comparison
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (4L, 5L), (5L, 6L),
      (6L, 2L), (7L, 8L)).toDF("doc_a", "doc_b")
    val driver = TextOps.pagerankInt(pairs)
      .as[(Long, Long)].collect().toMap
    val dist = TextOps.pagerankInt(pairs, smallGraphCap = 0)
      .as[(Long, Long)].collect().toMap
    assert(driver == dist,
      s"driver replay diverged from the distributed loop:\n$driver\nvs\n$dist")
    graft.Caching.releaseAll()
  }
}
