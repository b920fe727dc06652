package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus deduplication — the CCNet /
  * RefinedWeb-style "same page, different crawl URL" collapse that runs
  * BEFORE any content hashing, because it is ~free (narrow, codegen'd
  * string ops over a single column) while content dedup costs a shuffle.
  *
  * Canonical form (each rule documented because each is a policy choice):
  *   1. scheme dropped — http/https fetches of one page are one page;
  *   2. host lowercased (DNS is case-insensitive), leading `www.` stripped,
  *      default ports `:80`/`:443` dropped;
  *   3. fragment dropped (never sent to the server);
  *   4. tracking query params dropped (`utm_*`, `fbclid`, `gclid`),
  *      remaining params byte-sorted (param order is not semantic);
  *   5. one trailing `/` stripped from the path (so `/a/` ≡ `/a`, and the
  *      root path `/` ≡ the empty path).
  *
  * Like every hash in this engine the result is deterministic and
  * mirrored 1:1 in DuckDB SQL ([[canonicalUrlSql]]), so the dedup keyed on
  * it is oracle-checkable and recomputation-stable.
  */
object UrlOps {

  private val HostRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
  private val PathRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
  private val QueryRe = "\\?([^#]*)"
  private val TrackingParamRe = "^(utm_[^=]*|fbclid|gclid)="

  /** Canonical host of an absolute URL — rule 2 alone (lowercased, `www.`
    * stripped, default ports dropped): the per-DOMAIN grouping key for
    * domain statistics and domain capping, where the full [[canonicalUrl]]
    * is the per-PAGE key.
    */
  def host(url: Column): Column =
    regexp_replace(
      regexp_replace(lower(regexp_extract(url, HostRe, 1)), "^www\\.", ""),
      ":(80|443)$", "")

  /** DuckDB mirror of [[host]]. */
  private[graft] def hostSql(urlExpr: String): String =
    s"regexp_replace(regexp_replace(lower(regexp_extract(" +
      s"$urlExpr, '$HostRe', 1)), '^www\\.', ''), ':(80|443)$$', '')"

  /** Canonical dedup key for an absolute URL column, per the rules above.
    * Built entirely from codegen'd built-ins (regexp_extract /
    * regexp_replace / split / filter / array_sort / array_join).
    */
  def canonicalUrl(url: Column): Column = {
    val path = regexp_replace(regexp_extract(url, PathRe, 1), "/$", "")
    val query = array_join(
      array_sort(filter(
        split(regexp_extract(url, QueryRe, 1), "&"),
        p => p =!= "" && !p.rlike(TrackingParamRe))),
      "&")
    concat(host(url), path, when(query =!= "", concat(lit("?"), query))
      .otherwise(lit("")))
  }

  /** DuckDB mirror of [[canonicalUrl]] over a URL-typed SQL expression. */
  private[graft] def canonicalUrlSql(urlExpr: String): String = {
    val host = hostSql(urlExpr)
    val path = s"regexp_replace(regexp_extract($urlExpr, '$PathRe', 1), '/$$', '')"
    val query = s"array_to_string(list_sort(list_filter(string_split(" +
      s"regexp_extract($urlExpr, '\\?([^#]*)', 1), '&'), " +
      s"p -> p <> '' AND NOT regexp_matches(p, '$TrackingParamRe'))), '&')"
    s"$host || $path || (CASE WHEN $query <> '' THEN '?' || $query ELSE '' END)"
  }
}
