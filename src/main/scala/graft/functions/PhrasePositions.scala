package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native adjacent-phrase match: the 1-based token positions where
  * token i equals `a` and token i+1 equals `b` — txt_phrase_search's
  * hot kernel (queries.Retrieval.phraseHits) in one lowercase + one
  * byte walk.
  *
  * Replaces the HOF form (tokenize → sequence(1, n−1) → transform with
  * two element_at per position → filter): higher-order functions
  * evaluate their lambda interpreted per position and materialize the
  * full token array plus a position array per document; this expression
  * walks the lowercased payload's bytes once, recognizing tokens as
  * maximal `[a-z0-9]` byte runs and comparing spans against the two
  * constant terms — the Dhash60/CharEntropyPacked "native Expression
  * beats the built-in chain" precedent.
  *
  * Exact-parity contract with the HOF form (PhrasePositionsSpec pins
  * it): lowercasing is UTF8String.toLowerCase — the SAME kernel
  * Catalyst's lower() calls — and `[a-z0-9]` runs over the lowercased
  * bytes are exactly regexp_extract_all's `[a-z0-9]+` matches, because
  * every non-ASCII code point's UTF-8 bytes are ≥ 0x80 and can never
  * extend an ASCII alnum run. Token positions are 1-based (the
  * element_at convention the HOF form indexes with). Empty/no-hit
  * input yields an empty array; NULL propagates.
  *
  * The phrase terms ride as case-class fields (compile-time constants,
  * same rule as their `PhraseA`/`PhraseB` source literals), so the
  * generated code closes over pre-encoded byte arrays — no per-row
  * re-encoding, and the expression stays unary for codegen.
  */
case class PhrasePositions(child: Expression, a: String, b: String)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"phrase_positions requires a STRING argument, " +
          s"got ${child.dataType}")

  override def prettyName: String = "phrase_positions"

  override protected def withNewChildInternal(
      newChild: Expression): PhrasePositions = copy(child = newChild)

  @transient private lazy val aBytes =
    a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  @transient private lazy val bBytes =
    b.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override protected def nullSafeEval(input: Any): Any =
    PhrasePositions.compute(input.asInstanceOf[UTF8String], aBytes, bBytes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("phraseA", aBytes, "byte[]")
    val bRef = ctx.addReferenceObj("phraseB", bBytes, "byte[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PhrasePositions$$.MODULE$$" +
        s".compute($c, $aRef, $bRef);")
  }
}

object PhrasePositions {

  private def isAlnum(x: Byte): Boolean =
    (x >= 'a' && x <= 'z') || (x >= '0' && x <= '9')

  private def spanEquals(s: UTF8String, start: Int, len: Int,
      t: Array[Byte]): Boolean = {
    if (len != t.length) return false
    var k = 0
    while (k < len) {
      if (s.getByte(start + k) != t(k)) return false
      k += 1
    }
    true
  }

  def compute(s: UTF8String, a: Array[Byte], b: Array[Byte]): ArrayData = {
    val lc = s.toLowerCase
    val n = lc.numBytes()
    var hits: Array[Long] = null
    var nHits = 0
    var tokIdx = 0L
    var prevWasA = false
    var i = 0
    while (i < n) {
      if (isAlnum(lc.getByte(i))) {
        val start = i
        while (i < n && isAlnum(lc.getByte(i))) i += 1
        tokIdx += 1L
        if (prevWasA && spanEquals(lc, start, i - start, b)) {
          if (hits == null) hits = new Array[Long](4)
          else if (nHits == hits.length)
            hits = java.util.Arrays.copyOf(hits, nHits * 2)
          hits(nHits) = tokIdx - 1L
          nHits += 1
        }
        prevWasA = spanEquals(lc, start, i - start, a)
      } else i += 1
    }
    if (nHits == 0) new GenericArrayData(Array.emptyLongArray)
    else new GenericArrayData(java.util.Arrays.copyOf(hits, nHits))
  }
}
