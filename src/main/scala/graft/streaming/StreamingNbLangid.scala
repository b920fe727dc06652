package graft.streaming

import scala.collection.mutable

import graft.text.TextOps
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType}

/** Online Naive Bayes language ID — the streaming twin of
  * `txt_nb_langid` (queries/Text.scala), run as PREQUENTIAL
  * test-then-train (the textbook online-learning protocol): each
  * arriving document is scored by the model trained on strictly earlier
  * documents, then its counts fold into the model. State is the model
  * itself — (lang, token) counts plus per-lang doc counts, |vocab|×|langs|
  * longs — bounded by vocabulary, never by corpus size (the
  * StreamingCusum serving-sized-state discipline).
  *
  * Counts merge ADDITIVELY, so the fold takes the foreachBatch `batchId`
  * and applies the standard exactly-once guard: a batch id at or below
  * the last applied one is a committed replay and is skipped. Within
  * that contract the MODEL is slicing- and order-invariant (addition
  * commutes) and, once trained on the full corpus, scoring with it
  * reproduces the batch query bit-for-bit — [[scoreWith]] is the same
  * quantized-ln integer arithmetic, with the training constants (per-lang
  * token totals, vocab size, doc priors) emitted as driver literals
  * instead of 1-row broadcast crosses (the state already IS driver-side).
  * PREDICTIONS are not slicing-invariant and cannot be: a prequential
  * score reflects the model at arrival time by design — the spec pins
  * the invariant part (final model + rescoring) exactly and the online
  * part behaviorally (early-seeded vocabulary classifies later arrivals).
  */
object StreamingNbLangid {

  val Langs: Seq[String] = Seq("en", "de", "es", "fr", "zh")

  final class State {
    val tokCounts = mutable.Map.empty[(String, String), Long] // (lang, token) → c
    val docCounts = mutable.Map.empty[String, Long] // lang → docs
    var lastBatch: Long = -1L
  }

  /** Q(x) = round(ln(x)·10⁶) — the batch query's micro-quantized ln,
    * computed driver-side. For positive arguments `math.round`
    * (= floor(x+0.5)) and the engines' HALF_UP round agree.
    */
  private def quant(x: Long): Long =
    math.round(math.log(x.toDouble) * 1e6)

  /** TRAIN step: fold one micro-batch of documents (doc_id, lang, text)
    * into the model; `batchId` must be the foreachBatch-provided id.
    */
  def ingestBatch(batch: DataFrame, batchId: Long, st: State): Unit = {
    if (batchId <= st.lastBatch) return // committed replay: a no-op
    batch.select(col("lang"),
        explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy(col("lang"), col("token")).agg(count(lit(1)).as("c"))
      .collect()
      .foreach { r =>
        val k = (r.getString(0), r.getString(1))
        st.tokCounts(k) = st.tokCounts.getOrElse(k, 0L) + r.getLong(2)
      }
    batch.groupBy(col("lang")).agg(count(lit(1)).as("d"))
      .collect()
      .foreach { r =>
        st.docCounts(r.getString(0)) =
          st.docCounts.getOrElse(r.getString(0), 0L) + r.getLong(1)
      }
    st.lastBatch = batchId
  }

  /** TEST step: score documents with the model AS IT STANDS — the batch
    * query's exact integer log-posterior, one broadcast model join +
    * one per-doc sum. On an empty model every score degenerates to the
    * uniform prior (vocab and totals floored at 1 so no ln(0)), and the
    * deterministic priority chain picks the first language — stated, not
    * hidden: a cold-start classifier knows nothing.
    */
  def scoreWith(docs: DataFrame, st: State): DataFrame = {
    val spark = docs.sparkSession
    val vocab = st.tokCounts.keysIterator.map(_._2).toSet
    val v = math.max(vocab.size.toLong, 1L)
    val tl = Langs.map(l => l ->
      st.tokCounts.iterator.collect { case ((ll, _), c) if ll == l => c }
        .sum).toMap
    val dl = Langs.map(l => l -> st.docCounts.getOrElse(l, 0L)).toMap
    val dAll = dl.values.sum
    // the broadcastable model: one row per token, quantized per-lang
    val modelRows = vocab.toSeq.sorted.map { t =>
      Row.fromSeq(t +: Langs.map(l =>
        quant(st.tokCounts.getOrElse((l, t), 0L) + 1L)))
    }
    val model = spark.createDataFrame(
      spark.sparkContext.parallelize(modelRows, 1),
      StructType(StructField("token", StringType) +:
        Langs.map(l => StructField(s"q_$l", LongType))))
    val dcols = count(lit(1)).as("n_tokens") +:
      Langs.map(l => sum(col(s"q_$l")).as(s"sq_$l"))
    val perDoc = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
      .join(broadcast(model), Seq("token"))
      .groupBy(col("doc_id")).agg(dcols.head, dcols.tail: _*)
    val scoreCols = Langs.map { l =>
      (lit(quant(dl(l) + 1L) - quant(dAll + Langs.size)) +
        col(s"sq_$l") -
        col("n_tokens") * lit(quant(tl(l) + v))).as(s"nb_${l}_micro")
    }
    val Seq(en, de, es, fr, zh) = Langs.map(l => col(s"nb_${l}_micro"))
    docs.select(col("doc_id"), col("lang"))
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L)
      .select(col("doc_id") +: col("lang") +: scoreCols: _*)
      .withColumn("pred_lang",
        when(en >= de && en >= es && en >= fr && en >= zh, "en")
          .when(de >= es && de >= fr && de >= zh, "de")
          .when(es >= fr && es >= zh, "es")
          .when(fr >= zh, "fr")
          .otherwise("zh"))
  }

  /** The model as a (lang, token, c) frame — for state-equality proofs. */
  def modelDf(st: State, spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        st.tokCounts.toSeq.sortBy(identity).map { case ((l, t), c) =>
          Row(l, t, c)
        }, 1),
      StructType(Seq(StructField("lang", StringType),
        StructField("token", StringType), StructField("c", LongType))))
}
