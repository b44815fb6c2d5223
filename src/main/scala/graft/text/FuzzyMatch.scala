package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Fuzzy entity matching — edit-distance near-duplicate NAMES (short strings:
 * product titles, user/org names, file paths), the entity-resolution
 * counterpart of the document-level near-dup family. The reference's string
 * layer stops at exact normalization (binlog2sql_util.py:180-193); this is
 * part of the extended training-data surface (catalog/entity dedup before a
 * corpus join).
 *
 * Method: multi-pass sorted-neighborhood (the classic ER blocking that stays
 * LINEAR in corpus size). Each pass sorts the names by a key (pass 1: the
 * name itself; pass 2: its reverse — so prefix-divergent but suffix-similar
 * pairs like "cold bolt"/"old bolt" land adjacent in at least one pass) and
 * compares each name only to its `window` successors inside a prefix block.
 * Candidates from both passes are unioned, deduped, and verified with the
 * exact Levenshtein distance.
 *
 * Scale: per pass, ONE shuffle on the block prefix; inside a block the
 * window emits exactly `window` candidates per row, so total work is
 * O(n · window · passes) comparisons — a hot block (many names sharing a
 * prefix) stays linear, unlike equi-join blocking which goes quadratic in
 * the block. Levenshtein runs only on candidate pairs, never all-pairs.
 * Recall is the standard SNM tradeoff: pairs sorted further than `window`
 * apart in BOTH passes, or split across block boundaries in both, are
 * missed — widen `window`/shrink `blockLen` to trade cost for recall.
 * PARALLELISM follows blocks (each block is one window partition): total
 * work in a hot block stays linear, but it runs on one task — if one
 * prefix dominates the corpus, raise `blockLen` to subdivide it, paying
 * the boundary cost above (pairs whose keys diverge inside the longer
 * prefix now land in different blocks).
 * Output is partitioning-independent: the sort key is a total order derived
 * from the name alone, so neighbor sets are deterministic.
 */
object FuzzyMatch {

  /** Distinct normalized-name pairs within `maxDist` edits, found via
    * two sorted-neighborhood passes (forward + reversed key). Output:
    * (name_a, name_b, dist) with name_a < name_b. */
  def nearNames(names: DataFrame, nameCol: String, blockLen: Int = 4,
      window: Int = 5, maxDist: Int = 2): DataFrame = {
    require(blockLen >= 1 && window >= 1 && maxDist >= 0,
      s"blockLen=$blockLen window=$window maxDist=$maxDist")
    val base = names.select(TextOps.normalizeText(col(nameCol)).as("name")).distinct()
    def pass(key: Column): DataFrame = {
      val keyed = base.select(col("name"), key.as("key"))
        .withColumn("blk", substring(col("key"), 1, blockLen))
      // one window pass computes all `window` leads; order by (key, name)
      // is total (key is a function of name), so neighbors are deterministic
      val w = Window.partitionBy(col("blk")).orderBy(col("key"), col("name"))
      // leads materialize as columns first — Spark rejects window functions
      // inside a generator — then one explode fans them out
      keyed
        .select(col("name") +:
          (1 to window).map(i => lead(col("name"), i).over(w).as(s"l$i")): _*)
        .withColumn("cand",
          explode(array((1 to window).map(i => col(s"l$i")): _*)))
        .filter(col("cand").isNotNull)
        .select(least(col("name"), col("cand")).as("name_a"),
          greatest(col("name"), col("cand")).as("name_b"))
    }
    pass(col("name")).unionByName(pass(reverse(col("name"))))
      .distinct() // a pair can surface in both passes — verify it once
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
  }
}
