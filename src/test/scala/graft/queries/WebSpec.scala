package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The web family's envelope-parsing invariants, beyond the oracle's
  * value hash: the X-Doc header and the target URI are two INDEPENDENT
  * paths to the doc id (one through the HTTP header parse, one through
  * the WARC header) and must agree row-for-row; the status census
  * conserves the corpus; type pushdown keeps warcinfo payloads
  * unallocated through the whole family.
  */
class WebSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sfDir)

  test("web_http_extract: header doc id ≡ uri doc id, bodies non-empty") {
    val rows = run("web_http_extract")
      .select("doc_id", "hdr_doc_id", "body_chars")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (d, h, n) =>
      assert(d === h, "envelope parse and WARC uri must agree")
      assert(n > 0)
    }
    // exactly the non-404 docs survive
    val expect = graft.Tables(spark, sfDir, "documents")
      .filter(col("doc_id") % 10 =!= 3).count()
    assert(rows.length.toLong === expect)
  }

  test("web_http_status: census conserves the corpus, 404 stratum exact") {
    val m = run("web_http_status")
      .select("status", "n").as[(String, Long)].collect().toMap
    val docs = graft.Tables(spark, sfDir, "documents")
    assert(m.values.sum === docs.count())
    assert(m("404") === docs.filter(col("doc_id") % 10 === 3).count())
    assert(m.keySet === Set("200", "404"))
  }

  test("web_host_frontier: conserves URLs, politeness arithmetic holds") {
    val skipped0 = graft.sources.WarcSource.payloadBytesSkipped.get()
    val mat0 = graft.sources.WarcSource.payloadsMaterialized.get()
    val rows = run("web_host_frontier")
      .select("host", "n_urls", "fetch_rounds", "share_pm")
      .as[(String, Long, Long, Long)].collect()
    // pruned scan: the frontier card never touches a payload byte
    assert(graft.sources.WarcSource.payloadsMaterialized.get() === mat0)
    assert(graft.sources.WarcSource.payloadBytesSkipped.get() > skipped0)
    val docs = graft.Tables(spark, sfDir, "documents").count()
    assert(rows.map(_._2).sum === docs)
    assert(rows.length <= Web.Hosts)
    rows.foreach { case (h, n, fr, pm) =>
      assert(h.matches("h[0-6]\\.corpus\\.local"))
      assert(fr === (n + Web.PoliteBatch - 1) / Web.PoliteBatch)
      assert(pm === n * 1000 / docs)
    }
  }

  test("the response scan skips warcinfo payloads unallocated") {
    val skipped0 = graft.sources.WarcSource.payloadBytesSkipped.get()
    run("web_http_status").collect()
    assert(graft.sources.WarcSource.payloadBytesSkipped.get() - skipped0
      === Web.Shards.toLong * Web.WinfoPayload.length,
      "each shard's warcinfo payload skips under the pushed type filter")
  }
}
