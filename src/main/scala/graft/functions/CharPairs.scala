package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native adjacent-character pairs: `"spark"` → `["sp","pa","ar","rk"]`
  * — the BPE pair-count kernel (txt_bpe_merges' hot loop) in one byte
  * walk per token.
  *
  * Replaces the generator chain (`explode(sequence(1, len−1))` →
  * `substr(token, i, 2)`): that form materializes an int-position row
  * per pair with the FULL token string duplicated onto each row before
  * the substr projection — len−1 copies of every token crossing the
  * explode, all allocated just to be cut down to 2 chars. This
  * expression emits the len−1 two-char slices directly, so the explode
  * that follows fans out 2-char strings, not (token, position) pairs —
  * the PhrasePositions/CharEntropyPacked "native Expression beats the
  * built-in chain" precedent.
  *
  * Exact-parity contract with the substr form (CharPairsSpec pins it):
  * pairs are CHARACTER pairs, not byte pairs — the walk advances by
  * UTF-8 code-point boundaries USING SPARK'S OWN BYTE TABLE
  * (`numBytesForFirstByte`, so invalid 0xF5-0xFF leads and stray
  * continuation bytes slice exactly where `substr(i, 2)` does; Spark
  * never validates strings, and binary-cast data reaches expressions
  * verbatim). One deliberate divergence, also pinned: a TRUNCATED
  * multi-byte tail, where `UTF8String.substring`'s own walk steps past
  * the string and copies adjacent row-buffer bytes — undefined,
  * layout-dependent output — while this kernel clamps to the token's
  * final byte. (The BPE queries only ever feed it `[a-z0-9]+` tokens,
  * where chars and bytes coincide.) A 0- or 1-char input yields an
  * empty array; NULL propagates.
  */
case class CharPairs(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_pairs requires a STRING argument, got ${child.dataType}")

  override def prettyName: String = "char_pairs"

  override protected def withNewChildInternal(
      newChild: Expression): CharPairs = copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    CharPairs.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharPairs$$.MODULE$$.compute($c);")
}

object CharPairs {

  /** Bytes a UTF-8 sequence spans given its first byte — SPARK'S OWN
    * table (`UTF8String.numBytesForFirstByte`), not a re-derivation:
    * exact parity with `substr` demands the identical walk on INVALID
    * leads too (0xF5-0xFF are not UTF-8, but Spark never validates —
    * binary payloads cast to string reach expressions verbatim — and a
    * hand-rolled `>= 0xf0 → 4` silently slices differently there).
    * Clamped to ≥1 so the walk always advances and stays total.
    */
  private def charLen(first: Byte): Int =
    math.max(UTF8String.numBytesForFirstByte(first), 1)

  def compute(s: UTF8String): ArrayData = {
    val n = s.numBytes()
    // one pass to find each char's byte offset
    var count = 0
    var i = 0
    while (i < n) { i += charLen(s.getByte(i)); count += 1 }
    if (count < 2) return new GenericArrayData(Array.empty[Any])
    val bytes = s.getBytes // materialize the backing bytes ONCE
    val out = new Array[Any](count - 1)
    var start = 0 // byte offset of the pair's first char
    var mid = charLen(s.getByte(0)) // byte offset of its second char
    var k = 0
    while (k < count - 1) {
      // clamp: a truncated multi-byte tail claims more bytes than remain
      val end = math.min(mid + charLen(s.getByte(mid)), n)
      out(k) = UTF8String.fromBytes(bytes, start, end - start)
      start = mid
      mid = end
      k += 1
    }
    new GenericArrayData(out)
  }
}
