package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** txt_bpe_batch's scale contract: merges accrue M per corpus pass, so
  * the pass count is merges/M — NOT one pass per merge like the
  * txt_bpe_encode kernel validator. At a real tokenizer's 30k merges
  * that is the difference between 30k Spark jobs and 30k/M.
  */
class BpeBatchSpec extends SparkSpec {
  import spark.implicits._

  private def toks(ts: Seq[String]) =
    ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "token")

  test("one round yields MULTIPLE disjoint merges (merges ≫ rounds)") {
    // four leading-char families, each with a dominant pair
    val t = toks(Seq.fill(9)("aa") ++ Seq.fill(8)("bb") ++
      Seq.fill(7)("cc") ++ Seq.fill(6)("dd") ++ Seq.fill(5)("ab"))
    val ws = Text.bpeBatchWinners(t, m = 4)
    // best per leading char, rank order (count desc, pair asc)
    assert(ws === Seq("aa", "bb", "cc", "dd"))
  }

  test("disjointness screen: one winner per leading character") {
    // 'ab' (10) and 'ac' (9) share leading 'a' — only 'ab' survives;
    // 'bc' (8) leads 'b' and survives despite a lower count
    val t = toks(Seq.fill(10)("ab") ++ Seq.fill(9)("ac") ++
      Seq.fill(8)("bc"))
    assert(Text.bpeBatchWinners(t, m = 4) === Seq("ab", "bc"))
  }

  test("rank ties break on pair asc, and m caps the batch") {
    val t = toks(Seq.fill(5)("aa") ++ Seq.fill(5)("bb") ++
      Seq.fill(5)("cc"))
    assert(Text.bpeBatchWinners(t, m = 2) === Seq("aa", "bb"))
  }

  test("round bound: a 12-merge model trains in 3 passes, not 12") {
    // synthetic corpus rich enough that every round fills all 4 slots:
    // 16 leading-char families ensure fresh winners each round
    val fams = "abcdefghijklmnop"
    val body = fams.flatMap(c => Seq.fill(4)(s"$c${c}x$c")).toSeq
    var t = toks(body)
    var merges = 0
    val rounds = 3
    for (r <- 0 until rounds) {
      val ws = Text.bpeBatchWinners(t, m = 4)
      assert(ws.size === 4, s"round $r under-filled: $ws")
      merges += ws.size
      val marks = Text.BpeBatchMarks(r)
      val applied = ws.zip(marks).foldLeft(col("token")) {
        case (c, (p, mk)) => call_function("replace", c, lit(p), lit(mk))
      }
      t = t.select(col("doc_id"), applied.as("token"))
    }
    assert(merges === rounds * 4, "M merges per pass is the whole point")
    assert(merges > rounds) // the scale contract, stated directly
  }
}
