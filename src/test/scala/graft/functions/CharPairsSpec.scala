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

  private def viaSubstr(tokens: Seq[String]): Seq[Seq[String]] =
    tokens.toDF("token")
      .select(when(length(col("token")) >= 2,
        transform(sequence(lit(1), length(col("token")) - 1),
          i => col("token").substr(i, lit(2))))
        .otherwise(array().cast("array<string>")).as("pairs"))
      .as[Seq[String]].collect().toSeq

  private def viaNative(tokens: Seq[String]): Seq[Seq[String]] =
    tokens.toDF("token")
      .select(call_function("char_pairs", col("token")).as("pairs"))
      .as[Seq[String]].collect().toSeq

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
