package graft.functions

import graft.SparkSpec
import graft.queries.MultimodalQ
import org.apache.spark.sql.functions._

/** The native Dhash60 expression must be BIT-IDENTICAL to the portable
  * Column form on every input class — ASCII, multibyte UTF-8 (where
  * `ascii` returns the signed lead byte), strings shorter/longer than the
  * 96-char thumb, empty, and NULL (both forms hash null to 0L, never
  * null) — because the oracle gate and the streaming index were built on
  * the Column form's semantics.
  */
class DhashExprSpec extends SparkSpec {
  import spark.implicits._

  private val cases: Seq[String] = Seq(
    null,
    "",
    "a",
    "ab",
    "abc" * 64,                      // > thumb
    "z" * 96,                        // exactly thumb, constant
    "the quick brown fox jumps over the lazy dog 0123456789",
    "Ünïcodé — émojis 🎥🎬 and ïñtërnâtiônàl tëxt beyond ascii",
    "é" * 100,                  // 2-byte chars throughout
    "🎥" * 50,             // surrogate pairs (4-byte UTF-8)
    "mixed ascii Ünd 🎥 bytes" + "x" * 80)

  test("native dhash60 ≡ the Column form on every input class") {
    assume(spark.catalog.functionExists("dhash60"),
      "GraftExtensions not registered on this session")
    val df = cases.toDF("payload")
    val both = df.select(
      col("payload"),
      call_function("dhash60", col("payload")).as("native"),
      MultimodalQ.dhashColumnForm(col("payload")).as("portable"))
    both.collect().foreach { r =>
      assert(!r.isNullAt(1) && !r.isNullAt(2),
        s"dhash must never be null (payload=${r.get(0)})")
      assert(r.getLong(1) == r.getLong(2),
        s"native ${r.getLong(1)} != portable ${r.getLong(2)} " +
          s"for payload=${Option(r.getString(0)).map(_.take(40))}")
    }
  }

  test("property sweep: native ≡ portable on 1000 generated strings") {
    assume(spark.catalog.functionExists("dhash60"))
    // ScalaCheck's arbitrary strings lean heavily on exotic code points —
    // exactly the inputs that caught the code-point-vs-lead-byte
    // semantics difference during development
    val gen = org.scalacheck.Gen.listOfN(1000,
      org.scalacheck.Arbitrary.arbitrary[String])
    val samples = Iterator.continually(gen.sample).flatten.next()
    val diff = samples.toDF("payload")
      .select(call_function("dhash60", col("payload")).as("n"),
        MultimodalQ.dhashColumnForm(col("payload")).as("p"))
      .filter(col("n") =!= col("p")).count()
    assert(diff == 0L)
  }

  test("malformed UTF-8 payloads: native ≡ portable (replacement-char rule)") {
    assume(spark.catalog.functionExists("dhash60"))
    // cast(binary as string) reinterprets bytes as UTF-8 WITHOUT
    // validation — the one way malformed payloads reach a StringType
    // column (binary-as-string parquet, corrupt upstream). Lone leads,
    // bad continuations, truncated tails, overlongs, surrogates, >10FFFF.
    val hexes = Seq(
      "C3",           // truncated 2-byte lead
      "80",           // lone continuation byte
      "C341",         // 2-byte lead + non-continuation
      "C080",         // overlong encoding of NUL
      "EDA080",       // UTF-8-encoded surrogate D800
      "F7BFBFBF",     // > U+10FFFF
      "61C3A962",     // valid mixed (a é b) as control
      ("41" * 50) + "C3" + ("42" * 50)) // malformed mid-string
    import spark.implicits._
    val diff = hexes.toDF("hex")
      .select(expr("cast(unhex(hex) as string)").as("payload"))
      .select(call_function("dhash60", col("payload")).as("n"),
        MultimodalQ.dhashColumnForm(col("payload")).as("p"))
      .filter(col("n") =!= col("p")).count()
    assert(diff == 0L)
  }

  test("native form agrees with the Column form on the whole fixture") {
    assume(spark.catalog.functionExists("dhash60"))
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val diff = docs.select(
        call_function("dhash60",
          substring(col("text"), 1, MultimodalQ.DhashThumb)).as("n"),
        MultimodalQ.dhashColumnForm(
          substring(col("text"), 1, MultimodalQ.DhashThumb)).as("p"))
      .filter(col("n") =!= col("p")).count()
    assert(diff == 0L)
  }
}
