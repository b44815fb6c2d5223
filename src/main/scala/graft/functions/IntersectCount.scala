package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/**
 * `graft_intersect_count(a, b)` — native merge-intersection count of two
 * SORTED, DISTINCT `array<string>` or `array<bigint>` columns (exactly what
 * `sort_array(collect_set(x))` produces) with whole-stage codegen.
 *
 * Why a custom Expression: `size(array_intersect(a, b))` builds a hash set
 * per row and materializes the intersection array it immediately discards —
 * in the dedup verify stage that allocation runs once per candidate pair,
 * millions of times at corpus scale. The sorted-merge form is a tight
 * allocation-free two-pointer loop — over UTF8String binary order for
 * strings (the same order `sort_array` sorts by) or a primitive long
 * compare for the hashed-shingle sets — O(|a| + |b|) per pair.
 *
 * Contract: both inputs sorted ascending with distinct elements of the same
 * type; null inputs yield null; element nulls are not supported (shingle
 * sets are non-null by construction). Unsorted input silently undercounts —
 * callers own the `sort_array`.
 */
case class IntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(StringType, _) => true
      case ArrayType(LongType, _) => true
      case _ => false
    }
    val sameElem = (left.dataType, right.dataType) match {
      case (ArrayType(a, _), ArrayType(b, _)) => a == b
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType) && sameElem)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_intersect_count expects two array<string> or two array<bigint>, " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_intersect_count"

  private lazy val longElems = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0
    var j = 0
    var cnt = 0L
    while (i < x.numElements() && j < y.numElements()) {
      val c =
        if (longElems) java.lang.Long.compare(x.getLong(i), y.getLong(j))
        else x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { cnt += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val cnt = ctx.freshName("cnt")
      val cmp =
        if (longElems) s"java.lang.Long.compare($a.getLong($i), $b.getLong($j))"
        else s"$a.getUTF8String($i).compareTo($b.getUTF8String($j))"
      s"""
         |int $i = 0; int $j = 0; long $cnt = 0L;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  final int $c = $cmp;
         |  if ($c == 0) { $cnt++; $i++; $j++; }
         |  else if ($c < 0) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
