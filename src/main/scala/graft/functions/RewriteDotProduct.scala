package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/**
 * Optimizer rule: rewrite the composable higher-order-function dot product
 *
 * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x) }}}
 *
 * into the native codegen'd [[DotProduct]]. The HOF form is what a user
 * naturally writes (and what [[graft.ml.VectorOps.dot]] falls back to when
 * the extension is absent), but Catalyst evaluates lambda bodies through
 * interpreted paths and materializes the zip_with array per row — measured
 * ~2× slower in the ANN kernels, where the dot product is the inner loop
 * over the whole corpus. With this rule the fallback spelling gets the tight
 * generated loop automatically.
 *
 * The rewrite preserves semantics bit-for-bit: it fires only on the exact
 * strict left-to-right multiply-accumulate shape over `array<double>` inputs
 * — zero literal 0.0, merge `acc + x` in that operand order, identity
 * finish — which is precisely [[DotProduct]]'s evaluation order. Any other
 * shape (different fold order, casts, reversed operands) is left untouched.
 */
object RewriteDotProduct extends Rule[LogicalPlan] {

  /** `array<double>` with NO null elements: zip_with's null-element
    * propagation cannot be reproduced by the tight loop, so types that
    * admit element nulls are left on the HOF path. */
  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, containsNull) => !containsNull
    case _ => false
  }

  /** `(x, y) -> x * y` with the lambda's own variables in operand order. */
  private def isElementwiseProduct(f: Expression): Boolean = f match {
    case LambdaFunction(m: Multiply, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      (m.left, m.right) match {
        case (l: NamedLambdaVariable, r: NamedLambdaVariable) =>
          l.exprId == x.exprId && r.exprId == y.exprId
        case _ => false
      }
    case _ => false
  }

  /** `(acc, x) -> acc + x` — the strict left fold step. */
  private def isLeftFoldSum(f: Expression): Boolean = f match {
    case LambdaFunction(a: Add, Seq(acc: NamedLambdaVariable, x: NamedLambdaVariable), _) =>
      (a.left, a.right) match {
        case (l: NamedLambdaVariable, r: NamedLambdaVariable) =>
          l.exprId == acc.exprId && r.exprId == x.exprId
        case _ => false
      }
    case _ => false
  }

  /** The implicit `acc -> acc` finish of a two-argument `aggregate(...)`. */
  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(b: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      b.exprId == arg.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(ZipWith(a, b, mul), Literal(0.0, DoubleType), merge, finish)
        if isDoubleArray(a) && isDoubleArray(b) &&
          isElementwiseProduct(mul) && isLeftFoldSum(merge) &&
          isIdentityFinish(finish) =>
      DotProduct(a, b)
  }
}
