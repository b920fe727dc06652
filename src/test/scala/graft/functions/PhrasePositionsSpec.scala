package graft.functions

import graft.SparkSpec
import graft.queries.Retrieval
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The native PhrasePositions kernel must be VALUE-IDENTICAL to the
  * portable HOF form (Retrieval.phraseHitsHof) on every input — the
  * oracle gate was built on the HOF form's semantics. Token runs over
  * the lowercased bytes are exactly regexp_extract_all's `[a-z0-9]+`
  * matches because non-ASCII UTF-8 bytes are ≥ 0x80 and can never
  * extend an ASCII alnum run — this spec pins that equivalence on the
  * corpus, on adversarial unicode (including case-folding edges like İ,
  * whose lowercase introduces an ASCII 'i'), and on a generated sweep.
  */
class PhrasePositionsSpec extends SparkSpec {
  import spark.implicits._

  private def assertParity(d: DataFrame): Unit = {
    val cols = Seq("doc_id", "n_hits", "first_pos", "positions")
    val n = Retrieval.phraseHits(spark, d).select(cols.head, cols.tail: _*)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    val h = Retrieval.phraseHitsHof(d).select(cols.head, cols.tail: _*)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(n.toSeq === h.toSeq)
  }

  test("native ≡ HOF on every input class") {
    assume(spark.catalog.functionExists("phrase_positions"))
    assertParity(Seq(
      1L -> "",
      2L -> "the",
      3L -> "the table",
      4L -> "THE TABLE",                       // lowercase path
      5L -> "the table the table the table",  // repeats
      6L -> "the the table table",            // near-misses around a hit
      7L -> "on the table, under the-table;the table!",
      8L -> "the  \t\n table",                // multi-separator
      9L -> "theXtable the9table the table2", // runs must break exactly
      10L -> "thé table the tablé the table", // accents ≠ ascii
      11L -> "İ the table",     // İ lowercases to i + combining dot
      12L -> "the 🎥 table the table",        // 4-byte separator
      13L -> ("the table " * 200),            // long, many hits
      14L -> "a1 the table 0the table the 0table")
      .toDF("doc_id", "text"))
  }

  test("property sweep: native ≡ HOF on 400 token soups") {
    assume(spark.catalog.functionExists("phrase_positions"))
    // dense in near-phrase structure: random sequences over a tiny
    // vocabulary that includes the phrase terms and near-collisions
    val vocab = Vector("the", "table", "a", "thet", "able", "tables",
      "THE", "Table", "-", "é", "", "7", "the table")
    val rnd = new scala.util.Random(42)
    val rows = (0 until 400).map { i =>
      val n = rnd.nextInt(30)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
        .mkString(rnd.nextInt(3) match {
          case 0 => " "; case 1 => ", "; case _ => "\n"
        }))
    }
    assertParity(rows.toDF("doc_id", "text"))
  }

  test("native ≡ HOF on the sf0.001 documents corpus") {
    assume(spark.catalog.functionExists("phrase_positions"))
    assertParity(graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text")))
  }

  test("txt_phrase_search runs the native kernel, no data shuffle") {
    assume(spark.catalog.functionExists("phrase_positions"))
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqeWas = spark.conf.get(aqeKey)
    try {
      spark.conf.set(aqeKey, "false")
      val plan = graft.SparkEntry.queries("txt_phrase_search")(
        spark, "/root/testdata/sf0.001").queryExecution.executedPlan
      assert(plan.toString.contains("phrase_positions"))
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.shuffleOrigin != org.apache.spark.sql.execution.exchange
              .REPARTITION_BY_NUM => e
      }
      assert(exchanges.isEmpty, exchanges.mkString(","))
    } finally spark.conf.set(aqeKey, aqeWas)
  }
}
