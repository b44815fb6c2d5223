package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * `graft_topk(value, tie, k)` — bounded per-group top-k as a TRUE aggregate
 * function: the top `k` (value DESC, tie ASC) pairs of the group, returned
 * as a sorted `array<struct<value:double, tie:bigint>>`.
 *
 * Why a custom aggregate (tier (b) of the custom-operator ladder): the
 * standard per-group top-k spelling — `row_number() OVER (PARTITION BY g
 * ORDER BY ...) <= k` — shuffles EVERY row of every group and sorts each
 * group in full before discarding all but k rows. This aggregate is
 * partial-aggregable: each map task keeps a size-k heap per group, so the
 * exchange carries at most k pairs per (group × map partition) and the
 * reduce side merges heaps — at 100 TB that is the difference between
 * shuffling the fact table and shuffling k rows per group per task. Spark
 * has no built-in bounded collect (`collect_list` is unbounded).
 *
 * Determinism: elements are kept under the TOTAL order (value DESC,
 * tie ASC), so the surviving multiset is independent of row order,
 * partitioning, and merge order — equal (value, tie) pairs are
 * interchangeable by definition. NaN values order via
 * `java.lang.Double.compare` (NaN sorts above all — callers with NaN
 * measures should filter first).
 *
 * Null semantics: a row with a null VALUE or a null TIE is skipped, the
 * standard SQL-aggregate rule (`max`, `collect_list` etc. ignore nulls).
 * This intentionally differs from the `row_number()` window spelling,
 * which RANKS null-tie rows (nulls first/last per sort order): callers
 * whose tie column is nullable must `coalesce` it to a sentinel first if
 * those rows should compete for the top k.
 */
case class TopK(
    value: Expression,
    tie: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  // the heap dequeues its WORST element (smallest value, then largest tie)
  private val worstFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  private lazy val k: Int = kExpr.eval(null) match {
    case i: Int => i
    case other => throw new IllegalArgumentException(s"k must be int, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("graft_topk: k must be a literal")
    else if (kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk: k must be INT, got ${kExpr.dataType.sql}")
    else if (value.dataType != DoubleType || tie.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk expects (double, bigint, int), got " +
          s"(${value.dataType.sql}, ${tie.dataType.sql}, ${kExpr.dataType.sql})")
    else if (kExpr.eval(null).asInstanceOf[Int] < 1)
      TypeCheckResult.TypeCheckFailure("graft_topk: k must be >= 1")
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = Seq(value, tie, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("value", DoubleType, nullable = false),
      StructField("tie", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

  private def offer(buf: mutable.PriorityQueue[(Double, Long)],
      elem: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(elem)
    else if (worstFirst.compare(elem, buf.head) < 0) { // strictly better than worst
      buf.dequeue()
      buf.enqueue(elem)
    }
  }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val v = value.eval(input)
    val t = tie.eval(input)
    if (v != null && t != null)
      offer(buf, (v.asInstanceOf[Double], t.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // best-first output order: value DESC, tie ASC — ascending under
    // worstFirst (its "least" element is the best one)
    val sorted = buf.toArray.sorted(worstFirst)
    new GenericArrayData(sorted.map { case (v, t) => InternalRow(v, t) })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (v, t) => bb.putDouble(v); bb.putLong(t) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(value = newChildren(0), tie = newChildren(1), kExpr = newChildren(2))
}
