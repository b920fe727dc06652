package graft.functions

import graft.SparkSpec
import graft.queries.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The native CharEntropyPacked kernel must be VALUE-IDENTICAL to the
  * portable HOF fold (Text.charEntropyHof) on every valid-UTF-8 input —
  * the entire reachable space of StringType built from JVM strings and
  * well-formed parquet — because the oracle gate was built on the HOF
  * form's semantics. On malformed bytes (reachable only via an
  * unvalidated binary→string cast) the forms intentionally diverge (see
  * the kernel's scaladoc); this spec pins the kernel's documented rule
  * there instead: one U+FFFD per lead byte, n ≡ length(text).
  */
class CharEntropyExprSpec extends SparkSpec {
  import spark.implicits._

  private def native(d: DataFrame): DataFrame = Text.charEntropy(spark, d)

  private def assertParity(d: DataFrame): Unit = {
    val cols = Seq("doc_id", "n_chars_text", "n_distinct", "ent_micro")
    val n = native(d).select(cols.head, cols.tail: _*)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val h = Text.charEntropyHof(d).select(cols.head, cols.tail: _*)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(n.toSeq === h.toSeq)
  }

  test("native ≡ HOF on every input class (incl. multibyte, surrogates)") {
    assume(spark.catalog.functionExists("char_entropy_packed"))
    assertParity(Seq(
      1L -> "",
      2L -> "a",
      3L -> "aaaa",
      4L -> "ab",
      5L -> "aabb",
      6L -> "the quick brown fox jumps over the lazy dog 0123456789",
      7L -> "Ünïcodé — émojis 🎥🎬 and ïñtërnâtiônàl tëxt",
      8L -> ("é" * 100),                 // 2-byte chars throughout
      9L -> ("🎥" * 50),                 // surrogate pairs (4-byte UTF-8)
      10L -> ("🎥a" * 37 + "Ü"),         // mixed widths
      11L -> ("x" * 4096))               // long degenerate
      .toDF("doc_id", "text"))
  }

  test("property sweep: native ≡ HOF on 500 generated strings") {
    assume(spark.catalog.functionExists("char_entropy_packed"))
    // arbitrary[String] leans on exotic code points; through
    // String.getBytes(UTF_8) every row lands as VALID UTF-8 (lone
    // surrogates become '?'), i.e. exactly the reachable input space
    val gen = org.scalacheck.Gen.listOfN(500,
      org.scalacheck.Arbitrary.arbitrary[String])
    val samples = Iterator.continually(gen.sample).flatten.next()
    assertParity(
      samples.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"))
  }

  test("native ≡ HOF on the sf0.001 documents corpus") {
    assume(spark.catalog.functionExists("char_entropy_packed"))
    assertParity(graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text")))
  }

  test("malformed bytes: one U+FFFD per lead, n ≡ length(text)") {
    assume(spark.catalog.functionExists("char_entropy_packed"))
    // cast(binary as string) reinterprets bytes WITHOUT validation —
    // the one path malformed payloads reach StringType
    val cases = Seq(
      (1L, "C3", 1L, 1L, 0L),       // truncated 2-byte lead → 1×FFFD
      (2L, "80", 1L, 1L, 0L),       // lone continuation → 1×FFFD
      (3L, "C341", 1L, 1L, 0L),     // lead swallows the 'A' (width rule)
      (4L, "C080", 2L, 1L, 0L),     // C0 is a width-1 invalid lead → 2×FFFD
      (5L, "61C3A962", 3L, 3L, math.round(math.log(3.0) * 1e6)),
      (6L, "C3C3", 1L, 1L, 0L))     // two truncated leads, width eats both
    val got = native(cases.toDF("doc_id", "hex", "en", "ed", "ee")
        .select(col("doc_id"),
          expr("cast(unhex(hex) as string)").as("text")))
      .select("doc_id", "n_chars_text", "n_distinct", "ent_micro")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === cases.map(c => (c._1, c._3, c._4, c._5)))
    // and n is length(text) by construction, never the nio resync count
    val lens = cases.toDF("doc_id", "hex", "en", "ed", "ee")
      .select(col("doc_id"),
        length(expr("cast(unhex(hex) as string)")).cast("long").as("l"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(lens.map(_._2).toSeq === cases.map(_._3))
  }

  test("pack bounds: unpack roundtrips distinct and ent on extremes") {
    import CharEntropyPacked.{EntMask, Shift}
    // a maximally-distinct doc: 10k distinct code points, each once
    val text = (0x4e00 until 0x4e00 + 10000).map(_.toChar).mkString
    val pk = CharEntropyPacked.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(text))
    assert((pk >> Shift) === 10000L)
    assert((pk & EntMask) === math.round(math.log(10000.0) * 1e6))
    assert(CharEntropyPacked.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("")) === 0L)
  }

  test("txt_char_entropy runs the native kernel, zero exchanges, codegen") {
    assume(spark.catalog.functionExists("char_entropy_packed"))
    // AQE wraps the tree in AdaptiveSparkPlanExec, whose codegen stages
    // only materialize at execution — plan without it (the PlanAuditSpec
    // sibling-test pattern); codegen eligibility is identical either way
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqeWas = spark.conf.get(aqeKey)
    try {
      spark.conf.set(aqeKey, "false")
      val df = graft.SparkEntry.queries("txt_char_entropy")(
        spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.executedPlan
      assert(plan.toString.contains("char_entropy_packed"))
      // the computation itself shuffles NOTHING — the only exchange is
      // Tables.sharded's documented fixture-only spread (REPARTITION_BY_NUM;
      // r18: pk-hash, not round-robin — a real splittable-file lake drops
      // it); no planner-inserted hash/range exchange exists
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.shuffleOrigin != org.apache.spark.sql.execution.exchange
              .REPARTITION_BY_NUM => e
      }
      assert(exchanges.isEmpty, exchanges.mkString(","))
      val wsc = plan.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
      }
      assert(wsc.nonEmpty, "kernel must sit inside whole-stage codegen")
    } finally spark.conf.set(aqeKey, aqeWas)
  }
}
