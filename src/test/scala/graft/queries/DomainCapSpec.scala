package graft.queries

import graft.SparkSpec
import graft.text.UrlOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Correctness of the skew-safe SALTED two-phase per-domain top-K behind
  * dd_domain_cap, on a corpus shaped like the failure mode it exists for:
  * one heavy-hitter domain holding half the docs next to a long tail of
  * small domains. Asserts that phase-1-prune-then-phase-2-rank returns
  * EXACTLY the naive single-window ranking (the subset-top-K argument:
  * a global top-K element is a top-K element of any subset containing
  * it), including under n_chars ties resolved by the doc_id tie-break,
  * and that the phase-2 input is provably bounded at Cap×Salt rows per
  * host regardless of domain size.
  */
class DomainCapSpec extends SparkSpec {
  import spark.implicits._

  private val Cap = 3
  private val Salt = Dedup.DomainSalt

  /** 10k docs: doc_id < 5000 all on hot.com (with heavy n_chars ties),
    * the rest spread over 500 tail domains.
    */
  private def corpus: DataFrame =
    spark.range(10000).toDF("doc_id")
      .select(col("doc_id"),
        when(col("doc_id") < 5000, lit("hot.com"))
          .otherwise(concat(lit("tail-"), col("doc_id") % 500, lit(".com")))
          .as("host"),
        // ties by construction: only 7 distinct lengths on the hot domain
        (pmod(col("doc_id") * 37, lit(7)) + 10).as("n_chars"))

  private def salted(df: DataFrame): DataFrame = {
    val order = Seq(col("n_chars").desc, col("doc_id").asc)
    val pre = Window.partitionBy(col("host"),
      pmod(col("doc_id"), lit(Salt))).orderBy(order: _*)
    val fin = Window.partitionBy(col("host")).orderBy(order: _*)
    df.withColumn("pre_rk", row_number().over(pre))
      .filter(col("pre_rk") <= Cap)
      .withColumn("rk", row_number().over(fin))
      .filter(col("rk") <= Cap)
      .select(col("host"), col("rk"), col("doc_id"), col("n_chars"))
  }

  private def naive(df: DataFrame): DataFrame = {
    val fin = Window.partitionBy(col("host"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    df.withColumn("rk", row_number().over(fin))
      .filter(col("rk") <= Cap)
      .select(col("host"), col("rk"), col("doc_id"), col("n_chars"))
  }

  test("salted two-phase top-K ≡ naive single-window top-K on a " +
      "heavy-hitter corpus with ties") {
    val s = salted(corpus).orderBy("host", "rk").collect().toSeq
    val n = naive(corpus).orderBy("host", "rk").collect().toSeq
    assert(s.nonEmpty && s === n)
  }

  test("phase-1 prune bounds the phase-2 window input at Cap×Salt rows " +
      "per host") {
    val order = Seq(col("n_chars").desc, col("doc_id").asc)
    val pre = Window.partitionBy(col("host"),
      pmod(col("doc_id"), lit(Salt))).orderBy(order: _*)
    val perHost = corpus
      .withColumn("pre_rk", row_number().over(pre))
      .filter(col("pre_rk") <= Cap)
      .groupBy(col("host")).agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("mx"), min(col("n")).as("mn"))
      .collect()(0)
    // hot.com has 5000 docs but at most Cap×Salt survive phase 1
    assert(perHost.getLong(0) <= Cap.toLong * Salt)
    assert(perHost.getLong(1) >= 1L)
  }

  test("crawl-URL host split groups the synthesized corpus into the 50 " +
      "expected domains") {
    val hosts = spark.range(4000).toDF("doc_id")
      .select(UrlOps.host(Dedup.crawlUrl(col("doc_id"))).as("host"))
      .distinct().as[String].collect().toSeq.sorted
    assert(hosts.size === 50)
    assert(hosts.forall(h => h.startsWith("example-") && h.endsWith(".com")))
  }
}
