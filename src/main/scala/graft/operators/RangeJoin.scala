package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Range (interval-containment) join — each point matched to every interval
 * containing it — the second canonical operator Spark lacks natively (with
 * [[Asof]]): the naive `p.ts BETWEEN i.start AND i.end` theta-join plans a
 * BroadcastNestedLoopJoin, quadratic at scale.
 *
 * Bucketized equi-join instead (composition, preference (a) of the
 * custom-operator ladder): time is tiled into fixed-width buckets; every
 * interval explodes to the tiles it overlaps (cost ∝ length / width), every
 * point maps to exactly ONE tile, and the join is an equi-join on the tile
 * id followed by the exact inclusive containment filter. A (point, interval)
 * pair can only meet in the point's single tile, so the join needs no
 * post-dedup.
 *
 * Scale: the shuffle key is the tile id — work is proportional to
 * |points| + Σ interval tiles, never |points| × |intervals|. `bucketWidth`
 * is the knob: set it near the typical interval length (too narrow explodes
 * long intervals; too wide piles points into few tiles). Hot tiles behave
 * like any skewed equi-join key — AQE skew-join splits them.
 *
 * Inclusive on both ends. Intervals with end < start or null bounds match
 * nothing (filtered up front — also keeps `sequence` from generating a
 * descending tile range). Column names of the two inputs must be disjoint.
 */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
      tsCol: String, startCol: String, endCol: String,
      bucketWidthSec: Long = 3600L): DataFrame = {
    require(bucketWidthSec > 0, s"bucket width must be positive: $bucketWidthSec")
    // the tile id only needs a deterministic monotone epoch — it never
    // crosses the engine boundary (the oracle replays the containment
    // predicate directly)
    def tile(c: String) = floor(unix_timestamp(col(c)) / lit(bucketWidthSec))
    val p = points.withColumn("__tile", tile(tsCol))
    val iv = intervals
      .filter(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(endCol) >= col(startCol))
      .withColumn("__tile",
        explode(sequence(tile(startCol), tile(endCol))))
    p.join(iv, Seq("__tile"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__tile")
  }
}
