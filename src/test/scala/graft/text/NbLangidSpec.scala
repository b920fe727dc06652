package graft.text

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** txt_nb_langid is a real trained classifier, not just a hash-stable
  * lineage: on a corpus whose languages use disjoint vocabularies the
  * learned model must recover every label, and held-out-ish mixtures
  * must side with the majority vocabulary. Driven through the production
  * Q on a planted documents fixture (the oracle gate checks cross-engine
  * arithmetic; this spec checks the model LEARNS).
  */
class NbLangidSpec extends SparkSpec {
  import spark.implicits._

  private def write(docs: Seq[(Long, String, String)]): String = {
    val dir = Files.createTempDirectory("nb_docs").toString
    docs.map { case (id, lang, text) =>
      (id, text, lang, s"src${id % 3}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  private def predict(dir: String): Map[Long, (String, String)] =
    graft.SparkEntry.queries("txt_nb_langid")(spark, dir)
      .select(col("doc_id"), col("lang"), col("pred_lang"))
      .as[(Long, String, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("disjoint vocabularies: the trained model recovers every label") {
    // four languages, four disjoint vocabularies, varying doc lengths;
    // zh docs carry no latin tokens at all (prior-only scoring path)
    val vocab = Map(
      "en" -> Seq("river", "stone", "cloud", "light"),
      "de" -> Seq("berg", "wald", "fluss", "himmel"),
      "es" -> Seq("playa", "monte", "cielo", "fuego"),
      "fr" -> Seq("fleuve", "foret", "lune", "neige"))
    val docs = (0L until 48L).map { i =>
      val lang = Seq("en", "de", "es", "fr")((i % 4).toInt)
      val ws = vocab(lang)
      val text = (0 to (i % 5).toInt + 2)
        .map(j => ws((i.toInt + j) % ws.size)).mkString(" ")
      (i, lang, text)
    } :+ ((48L, "zh", "漢字唯一")) // tokenizer yields zero latin tokens
    val got = predict(write(docs))
    assert(got.size === 49)
    docs.filter(_._2 != "zh").foreach { case (id, lang, _) =>
      assert(got(id) === (lang, lang), s"doc $id misclassified")
    }
    // the zero-token doc survives the left join and scores prior-only:
    // every per-token term vanishes, so argmax = max prior = the most
    // common language in this corpus (en..fr tie at 12 docs each → the
    // deterministic priority order picks en)
    assert(got(48L)._2 === "en")
  }

  test("majority vocabulary wins a mixed document") {
    val base = (0L until 40L).map { i =>
      val lang = Seq("en", "de")((i % 2).toInt)
      val text = if (lang == "en") "river stone cloud" else "berg wald fluss"
      (i, lang, text)
    }
    // one doc, labeled de, whose tokens are 3 en words + 1 de word: the
    // learned likelihoods must out-vote the label-side prior
    val mixed = (40L, "de", "river stone cloud berg")
    val got = predict(write(base :+ mixed))
    assert(got(40L) === ("de", "en"))
  }
}
