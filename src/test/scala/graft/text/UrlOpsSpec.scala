package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url")
      .select(UrlOps.canonicalUrl(col("url")).as("c"))
      .as[String].collect().toSeq

  test("canonicalUrl applies each documented rule") {
    assert(canon(
      "https://www.ex.com/a/b", // clean: scheme+www dropped
      "HTTPS://WWW.EX.COM:443/a/b/", // case, default port, trailing slash
      "http://ex.com:80/a/b#frag", // http:80, fragment
      "https://ex.com/a/b?utm_source=x&gclid=1&fbclid=2", // all-tracking query
      "https://ex.com/a/b?b=2&a=1&utm_campaign=x", // kept params sorted
      "https://ex.com:8080/a/b", // NON-default port kept
      "https://ex.com/", // root path ≡ empty
      "https://ex.com") === Seq(
      "ex.com/a/b",
      "ex.com/a/b",
      "ex.com/a/b",
      "ex.com/a/b",
      "ex.com/a/b?a=1&b=2",
      "ex.com:8080/a/b",
      "ex.com",
      "ex.com"))
  }

  test("canonicalization is idempotent (re-canonicalizing a canonical URL " +
      "re-prefixed with a scheme is the identity)") {
    val canonical = canon(
      "https://www.ex.com/a/b", "https://ex.com/a/b?b=2&a=1&utm_campaign=x",
      "https://ex.com:8080/a/b", "http://ex.com:80/a/b#frag", "https://ex.com/")
    assert(canon(canonical.map("https://" + _): _*) === canonical)
  }

  test("distinct pages stay distinct") {
    assert(canon(
      "https://ex.com/a", "https://ex.com/b", "https://other.com/a",
      "https://ex.com/a?page=2").distinct.size === 4)
  }
}
