package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{
  BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native fixed-point dot product over two ARRAY<BIGINT> columns — the hot
  * inner loop of every similarity query (VectorOps quantizes embeddings to
  * longs; this sums elementwise products exactly).
  *
  * A Catalyst Expression with `doGenCode` instead of the
  * `aggregate(zip_with(...))` higher-order-function chain: the HOF form
  * allocates an intermediate array per row pair and evaluates a lambda per
  * element; this compiles to a tight primitive loop inside whole-stage
  * codegen — the "native Expression beats UDF beats everything else"
  * preference order applied.
  *
  * Null semantics: null input array → null; MISMATCHED lengths → null —
  * exactly what `aggregate(zip_with(a,b,*),0,+)` yields (zip_with pads
  * the shorter side with nulls and the sum absorbs them), which is what
  * lets [[DotProductRewrite]] substitute this expression soundly. Null
  * ELEMENTS are treated as 0 (the rewrite guards on containsNull=false;
  * quantized vectors never contain them).
  */
case class FixedPointDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // Seq[DataType] <: Seq[AbstractDataType] (covariant return; the parent
  // type itself is sql-private)
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = LongType

  // ragged inputs produce null even when both arrays are non-null
  override def nullable: Boolean = true

  override def prettyName: String = "fixedpoint_dot"

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): FixedPointDot = copy(newLeft, newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var acc = 0L
      var i = 0
      while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
      acc
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
}

/** Session extension registering graft's native functions:
  *
  *   spark.sql.extensions=graft.functions.GraftExtensions
  *
  * (the public SparkSessionExtensions mechanism — no private Spark API).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("fixedpoint_dot"),
      new ExpressionInfo(classOf[FixedPointDot].getName, "fixedpoint_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "fixedpoint_dot takes exactly 2 arguments")
        FixedPointDot(args.head, args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("fixedpoint_quantize"),
      new ExpressionInfo(classOf[FixedPointQuantize].getName,
        "fixedpoint_quantize"),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          "fixedpoint_quantize takes exactly 1 argument")
        FixedPointQuantize(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("dhash60"),
      new ExpressionInfo(classOf[Dhash60].getName, "dhash60"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "dhash60 takes exactly 1 argument")
        Dhash60(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("phrase_positions"),
      new ExpressionInfo(classOf[PhrasePositions].getName,
        "phrase_positions"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "phrase_positions takes (text, term_a, term_b)")
        // the phrase terms are compile-time constants (PhraseA/PhraseB
        // literals) — extract them so the expression stays unary
        def lit(e: Expression): String = e match {
          case org.apache.spark.sql.catalyst.expressions
                .Literal(v: UTF8String, StringType) => v.toString
          case other => throw new IllegalArgumentException(
            s"phrase_positions terms must be string literals, got $other")
        }
        PhrasePositions(args.head, lit(args(1)), lit(args(2)))
      }))
    ext.injectFunction((
      new FunctionIdentifier("char_pairs"),
      new ExpressionInfo(classOf[CharPairs].getName, "char_pairs"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "char_pairs takes exactly 1 argument")
        CharPairs(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("char_entropy_packed"),
      new ExpressionInfo(classOf[CharEntropyPacked].getName,
        "char_entropy_packed"),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          "char_entropy_packed takes exactly 1 argument")
        CharEntropyPacked(args.head)
      }))
    // HOF dot product → FixedPointDot (see DotProductRewrite scaladoc)
    ext.injectOptimizerRule(_ => DotProductRewrite)
    // plain INNER equi+range joins → the native interval sweep
    ext.injectOptimizerRule(_ => graft.plans.IntervalJoinRewrite)
    // stock logical.AsOfJoin (the merge_asof surface) → the native
    // as-of merge. Analyzer post-hoc, NOT an optimizer rule: the stock
    // expansion (RewriteAsOfJoin) runs in the optimizer's
    // Finish-Analysis batch, ahead of every injected optimizer rule
    ext.injectPostHocResolutionRule(_ => graft.plans.AsOfJoinRewrite)
    // whole-operator extensions: plans plans.AsOfJoinNode → AsOfJoinExec
    // and plans.IntervalJoinNode → IntervalJoinExec
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.IntervalJoinStrategy)
  }
}
