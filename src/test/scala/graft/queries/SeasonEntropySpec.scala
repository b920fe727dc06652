package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** txt_char_entropy (zero-shuffle run-length entropy fold) against an
  * independent Scala histogram + planted edges, and ev_seasonality's
  * 168-cell load profile against a java.time recomputation.
  */
class SeasonEntropySpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sfDir)

  private def qln(x: Long): Long = math.round(math.log(x.toDouble) * 1e6)

  private def refEntropy(text: String): (Long, Long, Long) = {
    val counts = text.toCharArray.groupBy(identity).map(_._2.length.toLong)
    val n = counts.sum
    val s = counts.map(c => c * qln(c)).sum
    (n, counts.size.toLong, qln(n) - Math.floorDiv(s, n))
  }

  test("txt_char_entropy equals an independent per-doc char histogram") {
    val docs = graft.Tables(spark, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val got = run("txt_char_entropy")
      .select("doc_id", "n_chars_text", "n_distinct", "ent_micro")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length === docs.count(_._2.nonEmpty))
    got.foreach { case (id, n, d, e) =>
      val (rn, rd, re) = refEntropy(docs(id))
      assert((n, d, e) === ((rn, rd, re)), s"doc $id")
    }
  }

  test("charEntropy edges: empty, single char, degenerate, two-symbol") {
    val planted = Seq((1L, ""), (2L, "a"), (3L, "aaaa"), (4L, "ab"),
      (5L, "aabb")).toDF("doc_id", "text")
    val got = Text.charEntropy(spark, planted)
      .select("doc_id", "n_chars_text", "n_distinct", "ent_micro")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // the empty doc yields NO row (n = 0 has no defined entropy)
    assert(got.map(_._1).toSeq === Seq(2L, 3L, 4L, 5L))
    // degenerate docs: H = 0 exactly, at any length
    assert(got(0) === ((2L, 1L, 1L, 0L)))
    assert(got(1) === ((3L, 4L, 1L, 0L)))
    // two equiprobable symbols: H = ln 2 = 693147 micro-nats
    assert(got(2) === ((4L, 2L, 2L, 693147L)))
    assert(got(3)._4 === 693147L)
  }

  test("txt_char_entropy plans ZERO data shuffles (intra-row fold)") {
    // AQE's AdaptiveSparkPlanExec is opaque to collect — plan with it
    // OFF so the assertion actually sees the tree (the PlanAuditSpec
    // sibling-test pattern). The only exchange allowed is
    // Tables.sharded's documented fixture-only spread
    // (REPARTITION_BY_NUM — r18: a pk-hash repartition, not round-robin).
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqeWas = spark.conf.get(aqeKey)
    try {
      spark.conf.set(aqeKey, "false")
      val exchanges = run("txt_char_entropy")
        .queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange
                .ShuffleExchangeExec
              if e.shuffleOrigin !=
                org.apache.spark.sql.execution.exchange
                  .REPARTITION_BY_NUM => e
        }
      assert(exchanges.isEmpty, exchanges.mkString(","))
    } finally spark.conf.set(aqeKey, aqeWas)
  }

  test("ev_seasonality_week matches a java.time UTC recomputation") {
    import java.time.{Instant, ZoneOffset}
    val micros = graft.Tables.events(spark, sfDir)
      .select(unix_micros(col("ts"))).as[Long].collect()
    val ref = micros.groupBy { us =>
      val t = Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L)
        .atZone(ZoneOffset.UTC)
      (t.getDayOfWeek.getValue % 7L, t.getHour.toLong) // Sunday → 0
    }.map { case (k, v) => k -> v.length.toLong }
    val total = micros.length.toLong
    val got = run("ev_seasonality_week")
      .select("dow", "hr", "n", "load_pm", "peak", "trough")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.map(r => (r._1, r._2) -> r._3).toMap === ref)
    assert(got.map(_._3).sum === total)
    got.foreach { case (dow, hr, n, pm, peak, trough) =>
      assert(dow >= 0 && dow <= 6 && hr >= 0 && hr <= 23)
      assert(pm === n * 168L * 1000L / total)
      assert(peak === (if (pm >= 1500) 1L else 0L))
      assert(trough === (if (pm <= 500) 1L else 0L))
    }
    assert(got.length <= 168)
  }
}
