package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-13 evaluation + governance cards: exact AUC (rank-sum over the
  * milli-score histogram) cross-checked against the O(n²) pairwise
  * definition, the calibration card's internal arithmetic, the
  * zero-exchange phrase search against a naive sliding window, and the
  * referential/PK cards against a planted-violation corpus.
  */
class EvalDqCardsSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sfDir)

  // the per-doc (label, milli-score) pairs the AUC/calibration queries
  // reduce — rebuilt through the SAME lrFeatures/lrTrain/lrScore the
  // queries use, so the cross-checks judge the REDUCTION, not the model
  private lazy val scored: Array[(Long, Long)] = {
    val feats = Text.lrFeatures(graft.Tables(spark, sfDir, "documents"))
    val w = Text.lrTrain(feats)
    feats.select(col("y").cast("long"),
        round(Text.lrScore(w) * 1000).cast("long"))
      .as[(Long, Long)].collect()
  }

  test("txt_classifier_auc equals the O(n²) pairwise AUC definition") {
    val pos = scored.filter(_._1 == 1L).map(_._2)
    val neg = scored.filter(_._1 == 0L).map(_._2)
    var conc = 0L; var ties = 0L
    for (p <- pos; n <- neg) {
      if (p > n) conc += 1 else if (p == n) ties += 1
    }
    val aucMicro = (2L * conc + ties) * 1000000L /
      math.max(2L * pos.length * neg.length, 1L)
    val row = run("txt_classifier_auc").head
    assert(row.getAs[Long]("n_pos") === pos.length.toLong)
    assert(row.getAs[Long]("n_neg") === neg.length.toLong)
    assert(row.getAs[Long]("concordant") === conc)
    assert(row.getAs[Long]("tied") === ties)
    assert(row.getAs[Long]("auc_micro") === aucMicro)
  }

  test("txt_calibration: buckets partition the corpus and bound their scores") {
    val rows = run("txt_calibration")
      .select("bucket", "n", "n_pos", "mean_score_milli", "pos_rate_milli",
        "gap_milli")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._2).sum === scored.length.toLong)
    assert(rows.map(_._3).sum === scored.count(_._1 == 1L).toLong)
    rows.foreach { case (b, n, np, mean, rate, gap) =>
      assert(b >= 0 && b <= 99)
      assert(np <= n)
      // the mean predicted score lies inside the bucket's own milli range
      // (the fold bucket 99 is open above)
      assert(mean >= b * 10 && (b == 99 || mean < (b + 1) * 10))
      assert(rate === np * 1000 / n)
      assert(gap === math.abs(mean - rate))
    }
  }

  test("txt_phrase_search matches a naive sliding-window scan") {
    val naive = graft.Tables(spark, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, text) =>
        val toks = graft.text.TextOps.TokenRegex.r
          .findAllIn(text.toLowerCase).toArray
        val hits = (0 until math.max(toks.length - 1, 0)).collect {
          case i if toks(i) == Retrieval.PhraseA &&
            toks(i + 1) == Retrieval.PhraseB => (i + 1).toLong // 1-based
        }
        id -> hits
      }.filter(_._2.nonEmpty).toMap
    val got = run("txt_phrase_search")
      .select("doc_id", "n_hits", "first_pos", "positions")
      .as[(Long, Long, Long, String)].collect()
    assert(got.map(_._1).toSet === naive.keySet)
    got.foreach { case (id, n, first, pos) =>
      val exp = naive(id)
      assert(n === exp.length.toLong, s"doc $id")
      assert(first === exp.head, s"doc $id")
      assert(pos === exp.mkString(","), s"doc $id")
    }
    assert(got.nonEmpty) // the fixture phrase actually occurs
  }

  test("txt_phrase_search plans ZERO exchanges (map-only at any scale)") {
    val exchanges = run("txt_phrase_search")
      .queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.Exchange => e
      }
    assert(exchanges.isEmpty, exchanges.mkString(","))
  }

  test("phraseHits edge cases: empty, 1-token, and trailing-match docs") {
    val planted = Seq(
      (1L, ""), // no tokens — sequence() guard, not a [1,0] descent
      (2L, "table"), // 1 token — no pair to test
      (3L, "the"), // 1 token, the phrase head alone
      (4L, "x the table"), // interior match at position 2
      (5L, "the table"), // the whole doc IS the phrase (trailing match)
      (6L, "the table the table the")) // two matches + dangling head
      .toDF("doc_id", "text")
    val got = Retrieval.phraseHits(spark, planted)
      .select("doc_id", "n_hits", "first_pos", "positions")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq === Seq(4L, 5L, 6L))
    assert(got.map(_._2).toSeq === Seq(1L, 1L, 2L))
    assert(got.map(_._3).toSeq === Seq(2L, 1L, 1L))
    assert(got.map(_._4).toSeq === Seq("2", "1", "1,3"))
  }

  test("referentialCard counts planted violations exactly") {
    // parents 1..3 (2 duplicated — the dirty-dimension case), children:
    // 1×2 rows, 2×1 row, orphan key 99 ×2 rows, one NULL fk row;
    // parent 3 childless
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(99L), Some(99L),
      None).toDF("fk")
    val parent = Seq(1L, 2L, 2L, 3L).toDF("pk")
    val r = graft.ops.Dq.referentialCard("t.fk->p.pk", child, "fk",
      parent, "pk").head
    assert(r.getAs[String]("relationship") === "t.fk->p.pk")
    assert(r.getAs[Long]("n_child") === 6L)
    assert(r.getAs[Long]("n_parent") === 3L) // dup parent counted ONCE
    assert(r.getAs[Long]("orphan_rows") === 3L) // 99×2 + the NULL fk
    assert(r.getAs[Long]("orphan_keys") === 2L) // {99, NULL}
    assert(r.getAs[Long]("childless_parents") === 1L) // {3}
    assert(r.getAs[Long]("coverage_pm") === 666L) // 2 of 3
  }

  test("dq_referential: the fixture is orphan-free with live coverage signal") {
    val rows = run("dq_referential")
      .select("relationship", "orphan_rows", "orphan_keys",
        "childless_parents")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.length === 4)
    rows.foreach { case (rel, or, ok, _) =>
      assert(or === 0L && ok === 0L, s"$rel has orphans")
    }
    // the TPC-H property: some orders carry no line items at every SF —
    // the coverage direction is a real signal, not a vacuous zero
    assert(rows.find(_._1.startsWith("lineitem.l_orderkey")).get._4 > 0L)
  }

  test("dq_pk_unique: declared keys hold except lineitem's composite (a real fixture property)") {
    val rows = run("dq_pk_unique")
      .select("table_name", "n_rows", "n_keys", "dup_rows")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.length === 10)
    rows.foreach { case (t, n, k, d) =>
      assert(n > 0 && d === n - k, t)
      // the synthetic generator draws (orderkey, linenumber) with
      // replacement, so lineitem's composite key genuinely collides —
      // the card SURFACING that is the point of a PK audit
      if (t != "lineitem") assert(d === 0L, s"$t has dup keys")
      else assert(d > 0L, "expected the lineitem composite-key collisions")
    }
  }
}
