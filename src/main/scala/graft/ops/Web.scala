package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization — the hygiene pass a web-scale corpus pipeline
  * (Common-Crawl-style) runs before URL-keyed dedup, domain mixing, or
  * per-domain capping. The same page is crawled under dozens of surface
  * forms (case-shifted scheme/host, `www.` prefix, explicit default
  * ports, tracking parameters, fragments, param order); canonicalizing
  * first is what makes URL-exact dedup meaningful.
  *
  * Everything here is built from codegen'd string built-ins
  * (`regexp_extract`/`regexp_replace`/`split`) plus one small-array HOF
  * for the parameter filter+sort — per-URL arrays are a handful of
  * elements, so the interpreted-lambda cost that bit the per-char winnow
  * HOF (BENCH_NOTES round-7) does not apply. No shuffle: the whole pass
  * is scan-side, so at 100 TB it rides the input scan for free.
  *
  * Canonical form (applied rules, in order):
  *   - scheme and host lowercased (path/query case is significant and kept)
  *   - leading `www.` stripped from the host
  *   - scheme-default ports removed (`:80` for http, `:443` for https);
  *     non-default ports kept
  *   - fragment dropped
  *   - query parameters: empties and tracking params (`utm_*`, `fbclid`,
  *     `gclid`, `mc_eid`, `ref`) dropped, the rest sorted bytewise and
  *     re-joined; an emptied query string drops its `?`
  *   - trailing slashes stripped from the path
  */
object Web {

  /** Tracking-parameter pattern: whole-param match (`key` or `key=...`). */
  val trackingParamRe = "^(utm_[^=]*|fbclid|gclid|mc_eid|ref)(=.*)?$"

  // Piecewise URI parsing (RFC 3986 component charsets). One pattern per
  // component — identical patterns run in the DuckDB oracle, and piecewise
  // extraction sidesteps engine differences around non-participating
  // optional groups in a single combined regex.
  private val schemeRe = "^([^:/?#]+)://"
  private val authRe   = "^[^:/?#]+://([^/?#]*)"
  private val pathRe   = "^[^:/?#]+://[^/?#]*([^?#]*)"
  private val queryRe  = "^[^#?]*\\?([^#]*)"

  def urlScheme(url: Column): Column = lower(regexp_extract(url, schemeRe, 1))

  /** Canonical host[:port]: lowercased, `www.`-stripped, default port
    * removed for its scheme. */
  def urlHost(url: Column): Column = {
    val auth = regexp_replace(lower(regexp_extract(url, authRe, 1)), "^www\\.", "")
    when(urlScheme(url) === "http", regexp_replace(auth, ":80$", ""))
      .when(urlScheme(url) === "https", regexp_replace(auth, ":443$", ""))
      .otherwise(auth)
  }

  /** Path with trailing slashes stripped (case preserved — paths are
    * case-significant). */
  def urlPath(url: Column): Column =
    regexp_replace(regexp_extract(url, pathRe, 1), "/+$", "")

  /** Surviving query params, sorted: tracking params and empties out. */
  def urlParams(url: Column): Column =
    array_sort(filter(split(regexp_extract(url, queryRe, 1), "&"),
      p => p =!= "" && !p.rlike(trackingParamRe)))

  /** The full canonical form. */
  def canonicalizeUrl(url: Column): Column = {
    val params = urlParams(url)
    concat(urlScheme(url), lit("://"), urlHost(url), urlPath(url),
      when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
        .otherwise(lit("")))
  }

  /** Adds `url_canon` and `host` alongside the raw column. */
  def canonicalizeUrls(df: DataFrame, urlCol: String = "url"): DataFrame =
    df.withColumn("url_canon", canonicalizeUrl(col(urlCol)))
      .withColumn("host", urlHost(col(urlCol)))
}
