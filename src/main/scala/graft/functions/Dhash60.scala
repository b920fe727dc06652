package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit difference hash over a string payload — the hot kernel of
  * the perceptual-dedup family (queries.MultimodalQ.dhash, batch and
  * streaming). Bit i compares the code points of the sampled characters
  * at positions 1 + i·95/60 and 1 + (i+1)·95/60 (1-based, within the
  * first 96 chars).
  *
  * Replaces the 61-term `ascii(substring(payload, p, 1))` Column chain:
  * that form walks the string from its start once PER SAMPLE to find the
  * p-th character (UTF-8 is variable-width — substring can't jump) and
  * allocates a one-char UTF8String each time; this expression walks the
  * payload's bytes ONCE, decoding each sampled character's code point in
  * place — no allocation, one pass, inside whole-stage codegen (the
  * FixedPointDot "native Expression beats the built-in chain" precedent).
  *
  * Exact-parity contract with the Column form (MmDhashSpec/DhashExprSpec
  * pin it): this Spark's `ascii` returns the full CODE POINT of the first
  * character (probe-measured: Ü→220, 🎥→127909 — not the signed UTF-8
  * lead byte of older releases); positions past the end contribute 0; a
  * NULL payload hashes to 0L, never NULL (in the Column form the null
  * comparison falls through every `when` to the `otherwise(0)`).
  */
case class Dhash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dhash60 requires a STRING argument, got ${child.dataType}")

  // never null: a null payload hashes to 0L (Column-form parity)
  override def nullable: Boolean = false

  override def prettyName: String = "dhash60"

  override protected def withNewChildInternal(newChild: Expression): Dhash60 =
    copy(newChild)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else Dhash60.compute(v.asInstanceOf[UTF8String])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        long ${ev.value} = ${c.isNull} ? 0L :
          graft.functions.Dhash60$$.MODULE$$.compute(${c.value});
      """,
      isNull = FalseLiteral)
  }
}

object Dhash60 {
  val Bits = 60
  val Thumb = 96
  // sampled 1-based char positions (61 of them, max = Thumb)
  private val Pos: Array[Int] =
    Array.tabulate(Bits + 1)(i => 1 + i * (Thumb - 1) / Bits)

  /** One byte-walk: cp[c] = code point of char c+1 for the first Thumb
    * chars (0 past the end — `ascii('')` semantics), then the 60 sampled
    * comparisons. Inline UTF-8 decode per char; width comes from the
    * lead byte (`UTF8String.numBytesForFirstByte`).
    */
  private final val Replacement = 0xfffd // U+FFFD, 65533

  def compute(s: UTF8String): Long = {
    val nBytes = s.numBytes()
    val cp = new Array[Int](Thumb) // zero-initialized = past-end default
    var off = 0
    var c = 0
    while (off < nBytes && c < Thumb) {
      val b0 = s.getByte(off)
      val w = UTF8String.numBytesForFirstByte(b0)
      cp(c) =
        if (b0 >= 0) b0.toInt // ASCII fast path
        else if (w == 1 || off + w > nBytes) Replacement // bad lead/truncated
        else {
          // decode + strict validation, matching the Column form's
          // substring→toString path (java.nio strict decode, REPLACE on
          // malformed: bad continuations, overlongs, surrogates, >U+10FFFF)
          var v = w match {
            case 2 => b0 & 0x1f
            case 3 => b0 & 0x0f
            case _ => b0 & 0x07
          }
          var ok = true
          var k = 1
          while (k < w) {
            val bk = s.getByte(off + k)
            if ((bk & 0xc0) != 0x80) ok = false
            v = (v << 6) | (bk & 0x3f)
            k += 1
          }
          val overlong = (w == 2 && v < 0x80) || (w == 3 && v < 0x800) ||
            (w == 4 && v < 0x10000)
          val invalid = (v >= 0xd800 && v <= 0xdfff) || v > 0x10ffff
          if (ok && !overlong && !invalid) v else Replacement
        }
      off += w
      c += 1
    }
    var acc = 0L
    var i = 0
    while (i < Bits) {
      if (cp(Pos(i) - 1) > cp(Pos(i + 1) - 1)) acc |= 1L << i
      i += 1
    }
    acc
  }
}
