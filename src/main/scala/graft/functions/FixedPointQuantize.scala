package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType,
  FloatType, LongType}

/** Native fixed-point quantization of an embedding array —
  * `transform(emb, x => round(cast(x as double) * 1000).cast(long))` as a
  * codegen'd Expression. The HOF form's LambdaFunction makes its whole
  * Project CodegenFallback, so every similarity query paid an interpreted
  * projection on its corpus scan (caught by PlanAuditSpec's
  * WholeStageCodegen rule once its traversal stopped at InputAdapter);
  * this expression keeps the scan projection inside the span.
  *
  * Exact parity with the HOF form on the FINITE domain
  * (FixedPointQuantizeSpec pins it): Spark's `round` on a double rounds
  * HALF_UP via BigDecimal; null arrays stay null; null elements stay
  * null. Out-of-domain values (NaN/±Inf, |x·1000| > Long.Max) differ BY
  * DESIGN: under default ANSI mode the HOF form's long cast THROWS
  * CAST_OVERFLOW there, while this expression keeps the non-ANSI
  * truncating semantics (NaN→0, saturate at Long.Min/Max) — an embedding
  * pipeline wants a deterministic value, not a job abort, for a stray
  * NaN coordinate. Both behaviors are spec-pinned.
  */
case class FixedPointQuantize(child: Expression) extends UnaryExpression {

  private def elemType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => null
  }

  override def checkInputDataTypes(): TypeCheckResult = elemType match {
    case FloatType | DoubleType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"fixedpoint_quantize requires ARRAY<FLOAT|DOUBLE>, got ${child.dataType}")
  }

  override def dataType: DataType = ArrayType(LongType,
    child.dataType.asInstanceOf[ArrayType].containsNull)

  override def prettyName: String = "fixedpoint_quantize"

  override protected def withNewChildInternal(newChild: Expression)
      : FixedPointQuantize = copy(newChild)

  override def nullSafeEval(v: Any): Any =
    FixedPointQuantize.compute(v.asInstanceOf[ArrayData],
      elemType == FloatType)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val isFloat = elemType == FloatType
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.FixedPointQuantize$$.MODULE$$" +
        s".compute($a, $isFloat);")
  }
}

object FixedPointQuantize {
  private val Scale = 1000.0

  def compute(a: ArrayData, isFloat: Boolean): ArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val d = (if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)) *
          Scale
        // Spark round(double, 0): NaN/Inf unchanged, else BigDecimal
        // HALF_UP; cast to long truncates (NaN→0, ±Inf→Min/Max)
        val r =
          if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
          else java.math.BigDecimal.valueOf(d)
            .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
        out(i) = r.toLong
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
