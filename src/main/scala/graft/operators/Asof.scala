package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (point-in-time) join — the canonical operator Spark lacks natively,
 * built by composition (preference (a) of the custom-operator ladder:
 * compose existing ops before reaching for a custom plan): for each left
 * row, attach the single right row with the greatest `rightTime <=
 * leftTime` for the same key.
 *
 * Implementation: tag both sides, union on (key, time), and carry the last
 * non-null right payload forward with a running `last(ignoreNulls)` window —
 * ONE shuffle on the key and one sort, never a range cross product (the
 * naive `leftTime >= rightTime` theta-join explodes quadratically; at
 * 100 TB this formulation is the difference between a sort and a cartesian).
 * Right rows order before left rows at equal time, so an exact-time match
 * counts (ASOF `<=` semantics, identical to DuckDB's ASOF JOIN — which the
 * correctness oracle uses as an independent cross-implementation).
 *
 * The right side must be unique per (key, time) — pre-aggregate if not, or
 * the tie-winner is undefined (matching every other engine's ASOF contract).
 */
object Asof {

  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: String, rightTime: String, payloadCols: Seq[String]): DataFrame = {
    val payload = struct(payloadCols.map(col): _*)
    val rTagged = right.select(keyCols.map(col) ++ Seq(
      col(rightTime).as("__t"), lit(0).as("__side"),
      payload.as("__payload"),
      lit(null).cast(structTypeOf(left)).as("__lrow")): _*)
    val lTagged = left.select(keyCols.map(col) ++ Seq(
      col(leftTime).as("__t"), lit(1).as("__side"),
      lit(null).cast(structTypeOf(right, payloadCols)).as("__payload"),
      struct(left.columns.map(col): _*).as("__lrow")): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rTagged.unionByName(lTagged)
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__lrow.*") +: payloadCols.map(c => col(s"__match.$c").as(c)): _*)
  }

  private def structTypeOf(df: DataFrame, cols: Seq[String] = Nil) = {
    val fields = if (cols.isEmpty) df.schema.fields
      else cols.map(c => df.schema(c)).toArray
    org.apache.spark.sql.types.StructType(fields)
  }

  /**
   * The same ASOF semantics through the NATIVE plan node
   * (graft.plans.AsofJoin → AsofJoinExec, preference (c) of the ladder):
   * a per-partition two-pointer merge instead of union + running window —
   * same single exchange and sort, none of the union/window machinery.
   * Requires the session to carry GraftExtensions (graft.Sessions does).
   *
   * Contracts beyond [[asofJoin]]: time columns non-null; the two sides
   * must not share lineage (a self-asof needs a fresh re-read — the node
   * bypasses the analyzer's relation dedup); payload names must not
   * collide with left column names.
   */
  def asofJoinNative(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: String, rightTime: String, payloadCols: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    // pre-prune the right side: the custom node is opaque to column pruning
    val r = right.select((keyCols ++ Seq(rightTime) ++ payloadCols).distinct.map(col): _*)
    val lp = left.queryExecution.analyzed
    val rp = r.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        n: String) = p.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"column $n not found in ${p.output}"))
    org.apache.spark.sql.GraftBridge.ofRows(spark, graft.plans.AsofJoin(
      lp, rp,
      keyCols.map(attr(lp, _)), keyCols.map(attr(rp, _)),
      attr(lp, leftTime), attr(rp, rightTime),
      payloadCols.map(attr(rp, _))))
  }
}
