package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens: lowercases and strips non-alphanumerics") {
    val out = Seq("Hello, World! 42x").toDF("text")
      .select(TextOps.tokens(col("text"))).as[Seq[String]].head()
    assert(out === Seq("hello", "world", "42x"))
  }

  test("shingles: n-grams in order; short docs yield empty, not error") {
    val df = Seq("a b c d", "a b").toDF("text")
      .select(TextOps.shingles(TextOps.tokens(col("text")), 3).as("sh"))
    val out = df.as[Seq[String]].collect()
    assert(out(0) === Seq("a b c", "b c d"))
    assert(out(1) === Seq.empty)
  }

  test("LSH: identical docs always collide; candidates are deterministic") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"), // exact dup
      (3L, "completely different words about spark query engines here now"))
      .toDF("doc_id", "text")
    val a = TextOps.lshCandidates(docs, n = 3, k = 12, rowsPerBand = 3)
      .as[(Long, Long)].collect().toSet
    assert(a.contains((1L, 2L))) // identical signature → all bands collide
    assert(!a.exists(p => p._1 == 3L || p._2 == 3L))
    val b = TextOps.lshCandidates(docs, n = 3, k = 12, rowsPerBand = 3)
      .as[(Long, Long)].collect().toSet
    assert(a === b)
  }

  test("scrubPii replaces emails and urls, counts spans") {
    val df = Seq(
      "write to alice.smith@corp-mail.com or see https://docs.example.org/x",
      "no pii here at all").toDF("text")
      .select(TextOps.scrubPii(col("text")).as("clean"),
        TextOps.piiCount(col("text")).as("n"))
    val rows = df.as[(String, Long)].collect()
    assert(rows(0)._1 === "write to <EMAIL> or see <URL>")
    assert(rows(0)._2 === 2L)
    assert(rows(1) === (("no pii here at all", 0L)))
  }

  test("simhash: 32-bit string, deterministic, equal for equal content") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "delta gamma beta alpha"), // same token set → same simhash
      (3L, "totally other content words")).toDF("doc_id", "text")
    val m = TextOps.simhash(docs).as[(Long, String)].collect().toMap
    assert(m.values.forall(s => s.length == 32 && s.forall("01".contains(_))))
    assert(m(1L) === m(2L))
    assert(m(1L) !== m(3L))
  }
}
