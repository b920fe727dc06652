package graft.streaming

import graft.SparkSpec
import graft.text.TextOps
import org.apache.spark.sql.functions._

/** The online Naive Bayes twin against the batch txt_nb_langid on the
  * sf0.001 fixture: the MODEL is slicing-invariant and exactly the batch
  * counts; rescoring the corpus with the final model reproduces the
  * batch query bit-for-bit (the quantized-ln arithmetic is the same
  * arithmetic); the additive fold is replay-guarded; and the prequential
  * protocol genuinely learns online (a vocabulary seeded in batch 1
  * classifies batch-2 arrivals scored BEFORE their own counts fold in).
  */
class StreamingNbLangidSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def docs = graft.Tables(spark, sfDir, "documents")
    .select(col("doc_id"), col("lang"), col("text"))

  private type Out = (Long, String, Long, Long, Long, Long, Long, String)

  private def collectOut(df: org.apache.spark.sql.DataFrame): Set[Out] =
    df.select(col("doc_id"), col("lang"), col("nb_en_micro"),
      col("nb_de_micro"), col("nb_es_micro"), col("nb_fr_micro"),
      col("nb_zh_micro"), col("pred_lang")).as[Out].collect().toSet

  test("final model ≡ batch counts under any slicing; rescoring ≡ batch query") {
    val batchOut = collectOut(
      graft.SparkEntry.queries("txt_nb_langid")(spark, sfDir))
    val wantCounts = docs
      .select(col("lang"), explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy(col("lang"), col("token")).agg(count(lit(1)).as("c"))
      .as[(String, String, Long)].collect().toSet
    // two different slicings, one shuffled — the model must not care
    val slicings = Seq(
      (0 to 2).map(i => docs.filter(col("doc_id") % 3 === i)),
      (0 to 4).map(i => docs.filter(abs(hash(col("doc_id"))) % 5 === i)))
    slicings.foreach { slices =>
      val st = new StreamingNbLangid.State
      slices.zipWithIndex.foreach { case (s, i) =>
        StreamingNbLangid.ingestBatch(s, i.toLong, st)
      }
      val gotCounts = StreamingNbLangid.modelDf(st, spark)
        .as[(String, String, Long)].collect().toSet
      assert(gotCounts === wantCounts)
      assert(collectOut(StreamingNbLangid.scoreWith(docs, st)) === batchOut)
    }
  }

  test("additive fold is replay-guarded: a committed batch id is a no-op") {
    val st = new StreamingNbLangid.State
    val b0 = docs.filter(col("doc_id") % 2 === 0)
    StreamingNbLangid.ingestBatch(b0, 0L, st)
    val snapshot = st.tokCounts.toMap
    StreamingNbLangid.ingestBatch(b0, 0L, st) // at-least-once re-delivery
    assert(st.tokCounts.toMap === snapshot, "replay double-counted the model")
    StreamingNbLangid.ingestBatch(docs.filter(col("doc_id") % 2 === 1), 1L, st)
    assert(st.tokCounts.toMap !== snapshot) // a NEW batch does fold
  }

  test("prequential test-then-train: seeded vocabulary classifies later arrivals") {
    val seed = Seq(
      (0L, "en", "river stone cloud light river"),
      (1L, "en", "stone river light"),
      (2L, "de", "berg wald fluss himmel"),
      (3L, "de", "wald berg fluss")).toDF("doc_id", "lang", "text")
    val arrivals = Seq(
      (10L, "en", "river cloud stone"),
      (11L, "de", "berg fluss wald wald")).toDF("doc_id", "lang", "text")
    val st = new StreamingNbLangid.State
    // cold start: before ANY training the scorer is honest about knowing
    // nothing — uniform priors, the deterministic chain picks 'en'
    val cold = StreamingNbLangid.scoreWith(arrivals, st)
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(cold === Map(10L -> "en", 11L -> "en"))
    StreamingNbLangid.ingestBatch(seed, 0L, st)
    // test BEFORE train: the arrivals' own counts are not in the model
    val preds = StreamingNbLangid.scoreWith(arrivals, st)
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(preds === Map(10L -> "en", 11L -> "de"))
    StreamingNbLangid.ingestBatch(arrivals, 1L, st)
    assert(st.docCounts("en") === 3L && st.docCounts("de") === 3L)
  }
}
