package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document character entropy, packed into one long:
  * `(distinct << 26) | ent_micro` — the hot kernel of txt_char_entropy
  * (queries.Text.charEntropy) in one UTF-8 byte walk.
  *
  * Replaces the HOF form (sort_array + a run-length aggregate() fold):
  * higher-order functions evaluate their lambda interpreted per element
  * and the sort is O(n log n) per document with a full char-array
  * allocation; this expression walks the payload's bytes ONCE, counting
  * code points into a 128-slot ASCII table (map fallback for the rest),
  * no sort, no per-element closure, inside whole-stage codegen — the
  * Dhash60 "native Expression beats the built-in chain" precedent.
  *
  * Exact-parity contract with the HOF form (CharEntropyExprSpec pins
  * it): counts key on CODE POINTS, exactly what split-into-chars groups
  * (Java regex split is code-point aware, surrogate pairs stay whole);
  * ent_micro = q(n) − ⌊Σ c·q(c) / n⌋ with q(x) = round(ln(x)·10⁶) — the
  * same micro-quantized-ln-at-source rule as the fold and the DuckDB
  * oracle. Parity covers ALL valid UTF-8 — the entire reachable space of
  * StringType built from JVM strings (String.getBytes(UTF_8) never emits
  * malformed bytes; lone surrogates become '?') and of well-formed
  * parquet. On MALFORMED bytes (reachable only via an unvalidated
  * binary→string cast) the two forms intentionally diverge: this kernel
  * advances by lead-byte width and emits one U+FFFD per lead — the
  * Dhash60 / UTF8String.numChars rule, so the kernel's n is ALWAYS
  * exactly `length(text)` — while the HOF fold inherits java.nio's
  * maximal-subpart resync from split()'s toString. The spec pins both
  * behaviors rather than pretending they coincide.
  *
  * Packing bounds: distinct ≤ 0x110000 < 2²¹ code points and
  * ent_micro ≤ q(2⁶³) ≈ 43.7·10⁶ < 2²⁶, so the pack fits well under
  * 2⁴⁷; unpack with `div`/`%` by 2²⁶ (the packed-integer min/max
  * discipline the dedup ledgers already use). Empty input packs to 0.
  */
case class CharEntropyPacked(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_entropy_packed requires a STRING argument, " +
          s"got ${child.dataType}")

  override def prettyName: String = "char_entropy_packed"

  override protected def withNewChildInternal(
      newChild: Expression): CharEntropyPacked = copy(newChild)

  override protected def nullSafeEval(input: Any): Any =
    CharEntropyPacked.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharEntropyPacked$$.MODULE$$" +
        s".compute($c);")
}

object CharEntropyPacked {
  /** ent_micro occupies the low Shift bits; distinct the bits above. */
  final val Shift = 26
  final val EntMask = (1L << Shift) - 1

  private final val Replacement = 0xfffd

  private def qln(x: Long): Long =
    Math.round(Math.log(x.toDouble) * 1e6)

  def compute(s: UTF8String): Long = {
    val nBytes = s.numBytes()
    val ascii = new Array[Long](128)
    var other: java.util.HashMap[Integer, Array[Long]] = null
    var n = 0L
    var off = 0
    while (off < nBytes) {
      val b0 = s.getByte(off)
      val w = UTF8String.numBytesForFirstByte(b0)
      val v: Int =
        if (b0 >= 0) b0.toInt // ASCII fast path
        else if (w == 1 || off + w > nBytes) Replacement
        else {
          // strict decode, REPLACE on malformed — the Dhash60 kernel's
          // validation, which matches java.nio's (and therefore the HOF
          // split path's) treatment of bad continuations / overlongs /
          // surrogates / >U+10FFFF
          var cp = w match {
            case 2 => b0 & 0x1f
            case 3 => b0 & 0x0f
            case _ => b0 & 0x07
          }
          var ok = true
          var k = 1
          while (k < w) {
            val bk = s.getByte(off + k)
            if ((bk & 0xc0) != 0x80) ok = false
            cp = (cp << 6) | (bk & 0x3f)
            k += 1
          }
          val overlong = (w == 2 && cp < 0x80) || (w == 3 && cp < 0x800) ||
            (w == 4 && cp < 0x10000)
          val invalid = (cp >= 0xd800 && cp <= 0xdfff) || cp > 0x10ffff
          if (ok && !overlong && !invalid) cp else Replacement
        }
      if (v < 128) ascii(v) += 1L
      else {
        if (other == null) other = new java.util.HashMap[Integer, Array[Long]]
        val cell = other.get(v)
        if (cell == null) other.put(v, Array(1L)) else cell(0) += 1L
      }
      n += 1L
      off += (if (off + w > nBytes) nBytes - off else w)
    }
    if (n == 0L) return 0L
    var d = 0L
    var sum = 0L
    var i = 0
    while (i < 128) {
      val c = ascii(i)
      if (c > 0L) { d += 1L; sum += c * qln(c) }
      i += 1
    }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) {
        val c = it.next()(0)
        d += 1L
        sum += c * qln(c)
      }
    }
    (d << Shift) | (qln(n) - Math.floorDiv(sum, n))
  }
}
