package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Outlink harvesting — the link-graph leg of the crawl front door: raw
  * crawled HTML (sources/Warc.httpResponses bodies) yields `href`
  * targets, each resolved against its page's base URL (RFC 3986
  * reference resolution) and folded to the [[Web]] canonical form, then
  * rolled up to a host graph whose integer-exact PageRank
  * ([[Graph.pageRankFixed]]) is the host-quality prior a URL frontier
  * ranks by and a governance sweep joins on. The reference pipeline has
  * no crawl stage at all (pipeline/app.py consumes a CDC feed); this is
  * the §2.8-style gap-fill a 100 TB web corpus actually needs.
  *
  * Everything scan-side is codegen'd string built-ins: one
  * `regexp_extract_all` per page for the hrefs (bounded by links/page),
  * a CASE chain of prefix tests + concats for resolution, and the
  * [[Web.canonicalizeUrl]] pass. The page BODY never shuffles — the
  * explode carries only (page id, base url, href); the host rollup is
  * ONE map-side-combined groupBy bounded by the host-pair census, and
  * PageRank inherits [[Graph.pageRankFixed]]'s once-materialized edge
  * discipline. At 100 TB the extraction rides the WARC scan for free.
  *
  * Resolution semantics (RFC 3986 §5.2, the crawl-practical subset):
  *   - fragment dropped first (`#...` — a same-document reference);
  *     a fragment-only or empty href resolves to NULL (no edge);
  *   - a scheme-prefixed reference (`[A-Za-z][A-Za-z0-9+.-]*:`) is
  *     already absolute; non-http(s) schemes (mailto:, javascript:,
  *     data:) are dropped AFTER resolution by the scheme filter;
  *   - `//authority/...` (protocol-relative) inherits the base scheme;
  *   - `/path` (root-relative) resolves against the base authority;
  *   - anything else merges with the base path's directory (the
  *     RFC's merge step: base path up to its last `/`);
  *   - dot segments normalize via BOUNDED global-replace passes
  *     ([[dotSegmentPasses]] rounds of `/./` and `/seg/../` removal —
  *     handles any mix up to that nesting depth; deeper chains and
  *     leading-dot segment names (`/.well-known/../`) are out of
  *     contract, documented here because the DuckDB oracle replays the
  *     SAME bounded passes — cross-engine equality is exact, not
  *     approximate).
  */
object LinkGraph {

  /** href attribute matcher: case-insensitive name, single- or
    * double-quoted value (unquoted values are out of contract — real
    * extractors at this tier skip them too, and quoting is what the
    * q251 fixture writes). `>` excluded so an unterminated quote cannot
    * swallow the rest of the tag soup. */
  val hrefRe = "(?i)href\\s*=\\s*[\"']([^\"'>]*)[\"']"

  /** Bounded dot-segment normalization rounds (see class doc). */
  val dotSegmentPasses = 4

  def extractHrefs(html: Column): Column =
    regexp_extract_all(html, lit(hrefRe), lit(1))

  /** Resolve one href against its page's base URL (NULL = no edge).
    * Purely codegen'd: prefix tests + concat + bounded regexp passes. */
  def resolveUrl(base: Column, href: Column): Column = {
    val h = regexp_replace(href, "#.*$", "")
    val scheme = Web.urlScheme(base)
    val root = concat(scheme, lit("://"),
      regexp_extract(base, "^[^:/?#]+://([^/?#]*)", 1))
    val basePath = regexp_extract(base, "^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    val baseDir = when(basePath.contains("/"),
      regexp_extract(basePath, "^(.*/)", 1)).otherwise(lit("/"))
    val abs = when(h === "", lit(null).cast("string"))
      .when(h.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"), h)
      .when(h.startsWith("//"), concat(scheme, lit(":"), h))
      .when(h.startsWith("/"), concat(root, h))
      // ?query-only reference: keep the base PATH, replace the query
      // (RFC 3986 §5.3 — the merge-with-directory rule below would
      // wrongly resolve against the parent directory)
      .when(h.startsWith("?"), concat(root, basePath, h))
      .otherwise(concat(root, baseDir, h))
    // Normalize dot segments in the PATH-AND-AFTER portion only: the
    // authority contains dots (`/b.com/../` would otherwise match and
    // EAT THE HOST when a `../` href resolves against a root-path
    // base). Leading `/../` at the path root collapses to `/` (RFC
    // 3986 §5.2.4's remove-leading-dot-dot rule). A `..` inside a
    // QUERY string is out of contract (the RFC normalizes paths only;
    // the bounded passes here run over path+query for simplicity).
    val pre = regexp_extract(abs, "^([^:/?#]+://[^/?#]*)", 1)
    val rest = regexp_replace(abs, "^[^:/?#]+://[^/?#]*", "")
    val norm = (1 to dotSegmentPasses).foldLeft(rest)((u, _) =>
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        regexp_replace(regexp_replace(u,
          "/\\./", "/"), "/\\.$", "/"),
        "/[^/.][^/]*/\\.\\./", "/"), "/[^/.][^/]*/\\.\\.$", "/"),
        "^/\\.\\./", "/"), "^/\\.\\.$", "/"))
    concat(pre, norm)
  }

  /** Per-link edge rows from crawled pages: (id, src_host, dst_url,
    * dst_host, internal), one row per href OCCURRENCE (a page linking a
    * target three times asserts it three times — the weight the host
    * graph keeps). Only http(s) targets survive; src/dst hosts and the
    * dst URL are the [[Web]] canonical forms. */
  def outlinks(pages: DataFrame, idCol: String = "doc_id",
               urlCol: String = "url", htmlCol: String = "html"): DataFrame = {
    val resolved = pages
      .select(col(idCol), col(urlCol).as("_base"),
        explode(extractHrefs(col(htmlCol))).as("_href"))
      .withColumn("_abs", resolveUrl(col("_base"), col("_href")))
      .where(col("_abs").isNotNull &&
        Web.urlScheme(col("_abs")).isin("http", "https"))
    resolved.select(col(idCol),
        Web.urlHost(col("_base")).as("src_host"),
        Web.canonicalizeUrl(col("_abs")).as("dst_url"),
        Web.urlHost(col("_abs")).as("dst_host"))
      .withColumn("internal", col("src_host") === col("dst_host"))
  }

  /** Host-graph rollup: (src_host, dst_host, n_links, n_pages) — link
    * occurrences and distinct linking pages per host pair. ONE shuffle,
    * map-side combined, output bounded by the host-pair census (tiny
    * next to the corpus — hosts are ~1e7 at web scale vs 1e11 pages). */
  def hostGraph(links: DataFrame, idCol: String = "doc_id"): DataFrame =
    links.groupBy(col("src_host"), col("dst_host"))
      .agg(count(lit(1)).as("n_links"),
        countDistinct(col(idCol)).as("n_pages"))

  /** Host-quality prior: integer-exact PageRank over CROSS-HOST edges
    * (intra-site links are nepotistic — the standard exclusion), one
    * edge per link occurrence so heavily-linking hosts carry
    * proportional weight. Output (host, rank_e6) — joinable onto any
    * host-keyed governance or frontier frame. */
  def hostRank(links: DataFrame, iters: Int = 3): DataFrame =
    Graph.pageRankFixed(
      links.where(col("src_host") =!= col("dst_host"))
        .select(col("src_host").as("src"), col("dst_host").as("dst")),
      iters)
      .select(col("node").as("host"), col("rank_e6"))
}
