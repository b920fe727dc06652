package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule: rewrite the naive higher-order-function dot product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)
  *
  * into the codegen'd [[FixedPointDot]] — users writing the idiomatic HOF
  * form (VectorOps.dot is exactly it) silently get the tight primitive
  * loop (measured ~2× on the similarity family) instead of a per-row
  * intermediate array + per-element lambda dispatch.
  *
  * Soundness: FixedPointDot reproduces the HOF form's null semantics
  * (null array → null, ragged lengths → null — zip_with pads with nulls
  * and the sum absorbs them), and the rule only fires when both element
  * types are non-nullable BIGINT, so the `null element → null` case the
  * HOF form has cannot arise. Overflow: the HOF form under ANSI mode
  * would raise where FixedPointDot wraps — irrelevant under the
  * engine-wide quantization contract (|q| ≤ ~2^20, dims ≤ ~2^12 keeps
  * every sum far below 2^63), and exactly why the guard requires LongType
  * (already-quantized) inputs rather than rewriting arbitrary numerics.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case x: NamedLambdaVariable => x.exprId == v.exprId
      case _ => false
    }

  private def nonNullLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, false) => true
    case _ => false
  }

  private def isElemwiseMultiply(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(m: Multiply,
        Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      (sameVar(m.left, x) && sameVar(m.right, y)) ||
        (sameVar(m.left, y) && sameVar(m.right, x))
    case _ => false
  }

  private def isSumMerge(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(a: Add,
        Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
      (sameVar(a.left, acc) && sameVar(a.right, v)) ||
        (sameVar(a.left, v) && sameVar(a.right, acc))
    case _ => false
  }

  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(v: NamedLambdaVariable), _) =>
      sameVar(body, v)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(l, r, zf: LambdaFunction), Literal(0L, LongType),
            merge: LambdaFunction, finish)
          if nonNullLongArray(l) && nonNullLongArray(r) &&
            isElemwiseMultiply(zf) && isSumMerge(merge) &&
            isIdentityFinish(finish) =>
        FixedPointDot(l, r)
    }
}
