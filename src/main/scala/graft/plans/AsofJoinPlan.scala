package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/**
 * Native as-of join — the (c) tier of the build brief's custom-operator
 * ladder (custom `LogicalPlan` + `Strategy` + `SparkPlan`, injected via
 * `SparkSessionExtensions`), for the one relational operator Spark has no
 * physical node for. [[graft.operators.Asof.asofJoin]] composes the same
 * semantics from union + running window (preference (a)); this node
 * executes it as what it actually is: a per-partition ordered MERGE.
 *
 * Semantics: for each left row, attach the single right row with the
 * greatest `rightTime <= leftTime` within the same key (ASOF `<=`, exactly
 * DuckDB's ASOF JOIN and the composed operator); no match → null payload.
 * Right rows must be unique per (key, time) — the standard ASOF contract.
 *
 * Physical shape: children hash-cluster on the join keys and sort by
 * (keys, time) — the SAME exchange the window formulation needs — but the
 * probe is a streaming two-pointer merge: no union row-blowup, no window
 * buffer, no `last(ignoreNulls)` state; each partition pair is consumed
 * once, O(|L| + |R|), with O(1) state (the last matching payload). At
 * 100 TB the win over the window form is the removed union materialization
 * and window-frame machinery over |L|+|R| rows.
 */
case class AsofJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoin]] into [[AsofJoinExec]]. Injected by GraftExtensions. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt, payload) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, payload) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  // co-cluster both sides on the join keys (the SortMergeJoin contract) ...
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // ... and sort each partition by (keys, time) so the merge can stream
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lTimeIdx = leftOut.indexWhere(_.exprId == leftTime.exprId)
    val rTimeIdx = rightOut.indexWhere(_.exprId == rightTime.exprId)
    val timeType = leftTime.dataType
    val keyTypes = leftKeys.map(_.dataType)
    val lKeysLocal = leftKeys
    val rKeysLocal = rightKeys
    val payloadLocal = payload
    val outputLocal = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeysLocal, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeysLocal, rightOut)
      val payloadProj = UnsafeProjection.create(payloadLocal, rightOut)
      // bind the payload positions as NULLABLE: a no-match left row joins
      // against the all-null payload row, and a non-nullable BoundReference
      // would skip the null check and read garbage
      val outProj = UnsafeProjection.create(outputLocal,
        leftOut ++ payloadLocal.map(_.withNullability(true)))
      val keyOrd = TypeUtils.getInterpretedOrdering(
        org.apache.spark.sql.types.StructType(
          keyTypes.zipWithIndex.map { case (t, i) =>
            org.apache.spark.sql.types.StructField(s"k$i", t) }))
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
      val joiner = new JoinedRow
      val nullPayload = new GenericInternalRow(payloadLocal.length)

      new Iterator[InternalRow] {
        private var rCur: InternalRow = _            // un-consumed right row
        private var lastKey: InternalRow = _          // key of lastPayload
        private var lastPayload: InternalRow = _
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          val lt = l.get(lTimeIdx, timeType)
          var done = false
          while (!done && (rCur != null || rIter.hasNext)) {
            if (rCur == null) rCur = rIter.next()
            val rk = rKeyProj(rCur)
            val cmp = keyOrd.compare(rk, lk)
            if (cmp < 0) rCur = null                  // right behind: skip
            else if (cmp == 0 &&
                timeOrd.compare(rCur.get(rTimeIdx, timeType), lt) <= 0) {
              lastKey = rk.copy()
              lastPayload = payloadProj(rCur).copy()
              rCur = null
            } else done = true                        // right ahead: stop
          }
          val matched = lastKey != null && keyOrd.compare(
            lastKey, lk) == 0
          outProj(joiner(l, if (matched) lastPayload else nullPayload))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}
