package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native CharPairs kernel must be VALUE-IDENTICAL to the substr
  * form it replaced (`substr(token, i, 2)` over positions 1..len−1) —
  * txt_bpe_merges' oracle gate was built on that form's semantics.
  * Pinned on ASCII tokens (the only thing the BPE queries feed it),
  * on multi-byte unicode (char slices, not byte slices), and on
  * degenerate/hostile inputs.
  */
class CharPairsSpec extends SparkSpec {
  import spark.implicits._

  private def viaSubstrDf(
      df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] =
    df.select(when(length(col("token")) >= 2,
        transform(sequence(lit(1), length(col("token")) - 1),
          i => col("token").substr(i, lit(2))))
        .otherwise(array().cast("array<string>")).as("pairs"))
      .as[Seq[String]].collect().toSeq

  private def viaNativeDf(
      df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] =
    df.select(call_function("char_pairs", col("token")).as("pairs"))
      .as[Seq[String]].collect().toSeq

  private def viaSubstr(tokens: Seq[String]): Seq[Seq[String]] =
    viaSubstrDf(tokens.toDF("token"))

  private def viaNative(tokens: Seq[String]): Seq[Seq[String]] =
    viaNativeDf(tokens.toDF("token"))

  test("native ≡ substr form on every input class") {
    assume(spark.catalog.functionExists("char_pairs"))
    val inputs = Seq(
      "", "a", "ab", "spark", "aaaa", "a1b2c3",
      "héllo", "日本語テキスト", "αβγ", "éclair", // combining mark
      "mixed日本ascii", "😀ok", // surrogate pair (4-byte char)
      "x" * 300)
    assert(viaNative(inputs) === viaSubstr(inputs))
  }

  test("generated sweep: random unicode never diverges or throws") {
    assume(spark.catalog.functionExists("char_pairs"))
    val rnd = new scala.util.Random(7)
    val pool = "abcz019 éü日本́" + new String(Character.toChars(0x1F600))
    val gen = (1 to 200).map(_ => (1 to rnd.nextInt(12))
      .map(_ => pool(rnd.nextInt(pool.length))).mkString)
    assert(viaNative(gen) === viaSubstr(gen))
  }

  test("INVALID UTF-8 keeps parity: Spark never validates strings, so " +
      "binary-cast tokens with 0xF5-0xFF leads / stray continuations / " +
      "truncated tails must slice exactly where substr does") {
    assume(spark.catalog.functionExists("char_pairs"))
    val payloads = Seq(
      Array[Byte](0xF5.toByte, 'a', 'b'), // invalid lead (not UTF-8)
      Array[Byte](0xFF.toByte, 0xFE.toByte, 'x', 'y'),
      Array[Byte]('a', 0x80.toByte, 0x81.toByte, 'b')) // stray conts
    val df = payloads.toDF("bin")
      .select(col("bin").cast("string").as("token"))
    assert(viaNativeDf(df) === viaSubstrDf(df))
    // TRUNCATED multi-byte tails are where parity with substr is
    // undefined BY SPARK: UTF8String.substring's char walk steps past
    // numBytes on a truncated lead and copies adjacent row-buffer
    // bytes into the slice (layout-dependent garbage), so the kernel
    // pins the SOUND behavior instead — total, and every emitted pair
    // is a slice of the token's own bytes
    val truncated = Seq(
      Array[Byte]('q', 0xC3.toByte), // truncated 2-byte tail
      Array[Byte]('a', 'b', 0xE2.toByte, 0x82.toByte), // trunc 3-byte
      Array[Byte](0xF0.toByte, 0x9F.toByte, 0x98.toByte)) // trunc 4-byte
    truncated.foreach { bytes =>
      val s = org.apache.spark.unsafe.types.UTF8String.fromBytes(bytes)
      val pairs = graft.functions.CharPairs.compute(s)
      (0 until pairs.numElements()).foreach { i =>
        val p = pairs.getUTF8String(i)
        assert(p.numBytes() <= bytes.length,
          s"pair wider than its token: $p")
        assert(s.toString.contains(p.toString) ||
          new String(bytes, "ISO-8859-1").contains(
            new String(p.getBytes, "ISO-8859-1")),
          "pair bytes not a slice of the token")
      }
    }
  }

  test("NULL propagates; non-string input is a typed analysis error") {
    assume(spark.catalog.functionExists("char_pairs"))
    val r = Seq[Option[String]](Some("ab"), None).toDF("token")
      .select(call_function("char_pairs", col("token")).as("p"))
      .collect()
    assert(r(0).getSeq[String](0) === Seq("ab"))
    assert(r(1).isNullAt(0))
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("x")
        .select(call_function("char_pairs", col("x"))).collect()
    }
  }
}
