package graft.text

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Model-based property pin for [[UnionFind]], independent of any signature
 * scheme: for random graphs and ARBITRARY batch splits (arrival order
 * decoupled from id order, so late small-id arrivals re-root existing
 * clusters — the case a naive scheme breaks on), folding
 * [[UnionFind.increment]] batch-by-batch and resolving through the merge
 * log must equal [[TextOps.connectedComponents]] over the whole edge set.
 * Also pins the merge-log structural invariants the resolution's
 * termination proof rests on: parent < child on every row, and no child
 * ever recorded twice.
 */
class UnionFindPropertySpec extends SparkSpec {
  import spark.implicits._

  private def runFold(nodes: Seq[Long], edges: Seq[(Long, Long)],
      nBatches: Int): (Map[Long, Long], Seq[(Long, Long)]) = {
    // batch of each node = its position in the (shuffled) arrival order
    val batchOf = nodes.zipWithIndex
      .map { case (n, i) => n -> i % nBatches }.toMap
    var labels = graft.Frames.empty(spark, "doc_id BIGINT, label BIGINT")
    var merges = graft.Frames.empty(spark, "child BIGINT, parent BIGINT")
    (0 until nBatches).foreach { b =>
      val batchIds = nodes.filter(batchOf(_) == b)
      // an edge belongs to the batch of its LATER endpoint: same-batch
      // edges are within-pairs, earlier-other-endpoint edges are cross
      // pairs (exactly what an index probe would surface)
      val within = edges.filter { case (x, y) =>
        batchOf(x) == b && batchOf(y) == b }
      val cross = edges.flatMap { case (x, y) =>
        if (batchOf(x) == b && batchOf(y) < b) Some((x, y))
        else if (batchOf(y) == b && batchOf(x) < b) Some((y, x))
        else None
      }
      val (nl, nm) = UnionFind.increment(labels, merges,
        batchIds.toDF("doc_id"),
        if (within.isEmpty)
          graft.Frames.empty(spark, "doc_a BIGINT, doc_b BIGINT")
        else within.toDF("doc_a", "doc_b"),
        if (cross.isEmpty)
          graft.Frames.empty(spark, "batch_id BIGINT, corpus_id BIGINT")
        else cross.toDF("batch_id", "corpus_id"))
      labels = labels.unionByName(nl).localCheckpoint()
      merges = merges.unionByName(nm).localCheckpoint()
      graft.Caching.releaseAll()
    }
    val resolved = UnionFind.resolveLabels(labels, merges)
      .as[(Long, Long)].collect().toMap
    val mergeRows = merges.as[(Long, Long)].collect().toSeq
    graft.Caching.releaseAll()
    (resolved, mergeRows)
  }

  test("random graphs over random batch splits: incremental ≡ batch CC; log invariants hold") {
    (1 to 3).foreach { seed =>
      val rnd = new Random(seed)
      val n = 30 + rnd.nextInt(10)
      val nodes = rnd.shuffle((0L until n.toLong).toVector)
      val nEdges = 20 + rnd.nextInt(20)
      val edges = (1 to nEdges).map { _ =>
        val a = rnd.nextInt(n).toLong
        var bb = rnd.nextInt(n).toLong
        while (bb == a) bb = rnd.nextInt(n).toLong
        (math.min(a, bb), math.max(a, bb))
      }.distinct
      val (resolved, mergeRows) = runFold(nodes, edges, 1 + rnd.nextInt(4))

      val truthCc = TextOps.connectedComponents(edges.toDF("doc_a", "doc_b"))
        .as[(Long, Long)].collect().toMap
      graft.Caching.releaseAll()
      val truth = nodes.map(id => id -> truthCc.getOrElse(id, id)).toMap
      assert(resolved == truth, s"seed $seed: labels diverge from batch CC")

      mergeRows.foreach { case (child, parent) =>
        assert(parent < child, s"seed $seed: merge row $child -> $parent") }
      val children = mergeRows.map(_._1)
      assert(children.distinct.size == children.size,
        s"seed $seed: a root was merged twice: $mergeRows")
    }
  }
}
