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

  /** Per-document domain opt-out verdict — the crawl-governance pass a
    * web corpus runs BEFORE any curation (robots/ai.txt opt-outs,
    * publisher takedown lists, erasure requests): each document's
    * canonical host is checked against a bounded opt-out registry with
    * SUFFIX semantics — opting out `example.com` governs
    * `a.b.example.com` too — and the most specific hit wins (length
    * desc, then domain asc: deterministic longest-match attribution).
    *
    * The suffix DEVICE is what keeps this an equi-join: each host
    * explodes into its dot-suffixes with >= 2 labels (bounded by the
    * label count — a handful at web scale, like the shingle explode),
    * which equi-joins the BROADCAST registry; a subdomain test written
    * as a raw `endswith` predicate would be a broadcast nested-loop
    * over |docs|·|registry| comparisons instead.
    *
    * `kept` = no suffix matched. Ports never govern (stripped before
    * suffix split — an opt-out for `example.com` must cover
    * `example.com:8443`); a host with fewer than two labels, or an
    * unparseable URL, has no suffixes, matches nothing, and is KEPT:
    * governance registries name registrable domains, and dropping
    * garbage is the quality pass's job, not this one's.
    *
    * Shape at scale: the suffix explode and registry join are
    * scan-side (broadcast, no shuffle); the per-doc longest-match fold
    * is ONE map-side-combined shuffle whose partial aggregation
    * collapses each doc's handful of suffix rows before the exchange. */
  def domainOptOut(docs: DataFrame, optOut: DataFrame,
                   urlCol: String = "url",
                   idCol: String = "doc_id",
                   keep: Seq[String] = Nil): DataFrame = {
    // `keep`: extra per-doc columns (functionally dependent on idCol)
    // that ride the suffix explode and the longest-match fold as extra
    // grouping keys — the metadata-through-aggregation device
    // (Pipeline.fineWebCurate precedent), so a composed sweep needs no
    // id-keyed join to re-attach its scan-side verdict columns.
    val kc = keep.map(col)
    val hosts = canonicalizeUrls(
        docs.select(col(idCol) +: col(urlCol) +: kc: _*), urlCol)
      .select(col(idCol) +: col("host") +: kc: _*)
      .withColumn("_lbl",
        split(regexp_replace(col("host"), ":[0-9]+$", ""), "\\."))
    val sfx = hosts.select(col(idCol) +: col("host") +: kc :+
      explode_outer(when(size(col("_lbl")) >= 2,
        transform(sequence(lit(1), size(col("_lbl")) - 1),
          i => array_join(
            slice(col("_lbl"), i, size(col("_lbl")) - i + 1), ".")))
        .otherwise(array().cast("array<string>"))).as("_sfx"): _*)
    sfx
      .join(broadcast(optOut.select(col("domain").as("_sfx"), col("domain"))),
        Seq("_sfx"), "left")
      // non-matches contribute NULL (SQL MIN skips them), so _m is NULL
      // exactly when no suffix hit the registry
      .groupBy(col(idCol) +: col("host") +: kc: _*)
      .agg(min(when(col("domain").isNotNull,
        struct((-length(col("domain"))).as("nl"), col("domain").as("d"))))
        .as("_m"))
      .select(col(idCol) +: col("host") +: kc :+
        col("_m.d").as("optout_domain") :+ col("_m").isNull.as("kept"): _*)
  }

  /** robots.txt directive parser (RFC 9309) — where a real opt-out
    * registry COMES FROM: each host's robots document parses into
    * (host, agent, rule, value) rows, one per (directive, group
    * member). Semantics implemented:
    *
    *  - a GROUP is a maximal run of consecutive `User-agent:` lines
    *    followed by its rules; a rule after the run belongs to EVERY
    *    agent of the run (the RFC's multi-agent groups — one output
    *    row per pair);
    *  - rules before any User-agent line are ignored (outside a group);
    *  - `#` starts a comment (value cut there, then trimmed); field
    *    names are case-insensitive (lowercased on output); blank and
    *    non-directive lines are skipped;
    *  - an empty Disallow value survives as a row with value '' — RFC
    *    semantics ("allow everything") are the consumer's call.
    *
    * Kept directives: user-agent groups plus disallow / allow /
    * crawl-delay rules. All parsing is codegen'd string built-ins; the
    * group association is ONE per-host window (lag + conditional
    * running sum — run ids) plus an equi-join of rules to their run's
    * agents. Per-host robots files are KBs, so the window partition is
    * tiny; at 100 TB the parse rides the scan and the one shuffle is
    * by host. */
  def robotsRules(robots: DataFrame, hostCol: String = "host",
                  textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = robots.select(col(hostCol).as("host"),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val parsed = lines.select(col("host"), col("pos").cast("long").as("pos"),
        lower(regexp_extract(col("line"), "^\\s*([A-Za-z-]+)\\s*:", 1))
          .as("name"),
        trim(regexp_extract(col("line"),
          "^\\s*[A-Za-z-]+\\s*:\\s*([^#]*)", 1)).as("value"))
      .where(col("name")
        .isin("user-agent", "disallow", "allow", "crawl-delay"))
    val w = Window.partitionBy(col("host")).orderBy(col("pos"))
    val g = parsed
      .withColumn("_prev", lag(col("name"), 1).over(w))
      .withColumn("run", sum(when(col("name") === "user-agent" &&
        (col("_prev").isNull || col("_prev") =!= "user-agent"), 1L)
        .otherwise(0L)).over(w))
    val agents = g.where(col("name") === "user-agent")
      .select(col("host"), col("run"), col("value").as("agent"), col("pos"))
    // One marker row (`rule = 'group'`, empty value) per user-agent line,
    // so a group with NO rule lines at all still registers: RFC 9309 says
    // a matched specific group — even an empty one — ECLIPSES `*` (allow
    // everything). Without markers, [[robotsUrlVerdict]]/[[crawlDelay]]
    // group selection read `_has = false` for empty groups and fell back
    // to `*` (the r14-advice divergence). Consumers that only want rules
    // filter on `rule IN ('allow','disallow',...)` AFTER group selection.
    val markers = agents.select(col("host"), col("agent"),
      lit("group").as("rule"), lit("").as("value"), col("pos"))
    g.where(col("name") =!= "user-agent")
      .join(agents.select(col("host"), col("run"), col("agent")),
        Seq("host", "run"))
      .select(col("host"), col("agent"), col("name").as("rule"),
        col("value"), col("pos"))
      .unionByName(markers)
  }

  /** Derive a [[domainOptOut]] registry from parsed robots rules: a
    * host fully opts out of `bot` when any group covering it (`*` or
    * the bot's own token) carries `Disallow: /` — the RFC's
    * everything-is-off-limits form and the signal crawl pipelines
    * honor as a domain-level opt-out. RFC 9309 product tokens are
    * case-INsensitive, so the agent match folds case on both sides
    * ([[robotsRules]] lowercases field NAMES but preserves values —
    * `User-agent: GraftBot` must still cover graftbot). Substring
    * product-token matching (a `FooBot/2.1` group matching the token
    * `foobot`) is deliberately NOT implemented: the registry derives
    * from exact tokens or `*` only, the conservative read. Output:
    * distinct (domain) rows, broadcast-sized by construction (a
    * subset of crawled hosts). */
  def robotsOptOut(rules: DataFrame, bot: String = "graftbot"): DataFrame =
    rules.where((col("agent") === "*" ||
        lower(col("agent")) === bot.toLowerCase) &&
        col("rule") === "disallow" && col("value") === "/")
      .select(col("host").as("domain")).distinct()

  /** Per-URL RFC 9309 allow/block verdict — the rule robots.txt
    * actually encodes: [[robotsOptOut]] only honors the domain-level
    * `Disallow: /` form, but real governance is PER PATH, with
    * wildcard patterns and longest-match precedence (RFC 9309 §2.2.2):
    *
    *  - GROUP SELECTION: if any group names the bot's product token
    *    (case-insensitive exact match — the conservative read, no
    *    substring tokens), ALL its rules apply and `*` groups are
    *    IGNORED; otherwise the `*` groups apply; a host with neither
    *    (or no robots at all) allows everything;
    *  - the MATCH TARGET is the raw path + optional `?query` of the
    *    URI (fragment off, case preserved — robots paths are
    *    case-significant), `/` when empty;
    *  - a pattern matches as a PREFIX; `*` matches any char run; a
    *    TRAILING `$` anchors the end ( `$` elsewhere is literal);
    *    an empty pattern matches nothing (the RFC's empty-Disallow =
    *    allow-everything form);
    *  - among matching rules the LONGEST pattern (octet length as
    *    written) wins; on a length tie ALLOW wins; no match = allowed.
    *
    * The wildcard DEVICE: each pattern compiles to a SQL `LIKE ...
    * ESCAPE '!'` pattern (`%`/`_`/`!` escaped, `*`→`%`, `%` appended
    * unless `$`-anchored) — LIKE is codegen'd in Spark and
    * semantically identical in the DuckDB oracle, so no regex-dialect
    * drift and no per-row regex compile. Hosts fold to the canonical
    * port-stripped form for the robots lookup (the [[domainOptOut]]
    * "ports never govern" pipeline convention).
    *
    * Shape at scale: rules compile scan-side after one tiny window
    * over per-host groups (robots files are KBs); the verdict is one
    * host-keyed equi-join of the NARROW (id, host, target) frame —
    * never text — against the compiled rules (broadcast when the
    * crawl's host census is small, AQE decides), then one map-side-
    * combined fold per doc over its handful of candidate rules. */
  def robotsUrlVerdict(urls: DataFrame, rules: DataFrame,
                       bot: String = "graftbot",
                       urlCol: String = "url",
                       idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rawTarget = regexp_extract(col(urlCol), "^[^:/?#]+://[^/?#]*([^#]*)", 1)
    val docs = urls.select(col(idCol),
      regexp_replace(urlHost(col(urlCol)), ":[0-9]+$", "").as("host"),
      when(rawTarget === "", lit("/")).otherwise(rawTarget).as("target"))
    val w = Window.partitionBy(col("host"))
    // group selection sees ALL rules (RFC 9309: a specific-bot group
    // carrying only a Crawl-delay still ECLIPSES `*` — the review-pass
    // fix; crawlDelay already computed _has this way); only then does
    // the path matcher narrow to allow/disallow rows
    val applicable = rules
      .withColumn("_spec", lower(col("agent")) === lit(bot.toLowerCase))
      .withColumn("_has", max(col("_spec")).over(w))
      .where(col("rule").isin("allow", "disallow"))
      .where(((col("_spec") && col("_has")) ||
        (col("agent") === "*" && !col("_has"))) && col("value") =!= "")
      .withColumn("_anch", col("value").endsWith("$"))
      .withColumn("_core", when(col("_anch"),
        expr("substring(value, 1, length(value) - 1)")).otherwise(col("value")))
      .withColumn("_pat", concat(
        regexp_replace(regexp_replace(col("_core"), "([!%_])", "!$1"),
          "\\*", "%"),
        when(col("_anch"), lit("")).otherwise(lit("%"))))
      .select(col("host"), col("rule"), col("value"), col("_pat"))
    docs.join(applicable, Seq("host"), "left")
      .withColumn("_hit", col("rule").isNotNull &&
        expr("target LIKE _pat ESCAPE '!'"))
      .groupBy(col(idCol), col("host"), col("target"))
      .agg(min(when(col("_hit"), struct((-octet_length(col("value"))).as("nl"),
        col("rule").as("r"), col("value").as("v")))).as("_m"))
      .select(col(idCol), col("host"), col("target"),
        col("_m.r").as("matched_rule"), col("_m.v").as("matched_pattern"),
        (col("_m").isNull || col("_m.r") === "allow").as("allowed"))
  }

  /** Per-host effective crawl-delay for `bot` — the POLITENESS census
    * a crawl scheduler derives next to the [[robotsUrlVerdict]] access
    * rules: RFC 9309 group selection first (a specific-bot group
    * ECLIPSES `*`, even when the specific group carries no delay — no
    * fallback), then the MAX numeric `Crawl-delay` among the selected
    * group's rules (politeness takes the conservative read of a
    * contradictory file). Non-numeric delay values are ignored; a host
    * whose selected group has no delay reads NULL (crawl at default
    * pace); hosts with no applicable group emit no row. One tiny
    * grouped pass over the parsed rules — audit-sized throughout. */
  def crawlDelay(rules: DataFrame, bot: String = "graftbot"): DataFrame = {
    val ar = rules.withColumn("_spec",
      lower(col("agent")) === lit(bot.toLowerCase))
    val hs = ar.groupBy(col("host")).agg(max(col("_spec")).as("_has"))
    ar.join(hs, Seq("host"))
      .where((col("_spec") && col("_has")) ||
        (col("agent") === "*" && !col("_has")))
      .groupBy(col("host"), col("_has"))
      .agg(max(when(col("rule") === "crawl-delay" &&
        col("value").rlike("^[0-9]+$"), col("value").cast("long")))
        .as("delay_secs"))
      .select(col("host"), col("delay_secs"),
        when(col("_has"), lit("specific")).otherwise(lit("wildcard"))
          .as("delay_group"))
  }

  /** sitemap.xml parsing (the sitemaps.org protocol) — robots.txt's
    * crawl-frontier companion: where robots says what a crawler MAY
    * fetch, the sitemap says what the site WANTS fetched, with
    * freshness (`lastmod`) and weight (`priority`) hints a frontier
    * scheduler ranks by. Both document kinds parse in one pass:
    *
    *  - `<urlset>` documents yield `kind='url'` rows, one per
    *    `<url>` block;
    *  - `<sitemapindex>` documents yield `kind='sitemap'` rows, one
    *    per `<sitemap>` block (the nested-sitemap fan-out a fetcher
    *    follows);
    *  - a block without a non-empty `<loc>` carries nothing fetchable
    *    and is dropped; values are whitespace-trimmed; `lastmod`
    *    surfaces raw AND date-cast (`try`-semantics: junk -> NULL on
    *    both engines), `priority` as a double (junk -> NULL).
    *
    * Contract bounds (documented, fuzz-pinned in SitemapSpec): tags
    * are lowercase per the protocol's own examples; CDATA sections,
    * XML comments that SPAN block boundaries, and namespace-prefixed
    * tags are out of contract — real-world sitemaps are
    * machine-generated and overwhelmingly canonical. All parsing is
    * codegen'd regex over the raw text: scan-side, zero shuffles,
    * bounded by blocks/doc (the protocol caps urlset at 50k URLs). */
  def sitemapEntries(sitemaps: DataFrame, hostCol: String = "host",
                     textCol: String = "text"): DataFrame = {
    def blocks(kind: String, tag: String): DataFrame =
      sitemaps.select(col(hostCol).as("host"), lit(kind).as("kind"),
        explode(regexp_extract_all(col(textCol),
          lit(s"(?s)<$tag>(.*?)</$tag>"), lit(1))).as("_b"))
    // FULL whitespace trim, not SQL trim (which strips spaces only —
    // a <loc> on its own line would keep its newlines); the regex form
    // is identical on both engines
    def wsTrim(c: Column): Column =
      regexp_replace(regexp_replace(c, "^\\s+", ""), "\\s+$", "")
    def field(tag: String): Column =
      wsTrim(regexp_extract(col("_b"), s"(?s)<$tag>([^<]*)</$tag>", 1))
    def nullIfEmpty(c: Column): Column =
      when(c === "", lit(null).cast("string")).otherwise(c)
    blocks("url", "url").unionByName(blocks("sitemap", "sitemap"))
      .select(col("host"), col("kind"), field("loc").as("loc"),
        nullIfEmpty(field("lastmod")).as("lastmod"),
        nullIfEmpty(field("changefreq")).as("changefreq"),
        nullIfEmpty(field("priority")).as("_pr"))
      .where(col("loc") =!= "")
      .select(col("host"), col("kind"), col("loc"), col("lastmod"),
        col("lastmod").cast("date").as("lastmod_date"),
        col("changefreq"),
        col("_pr").cast("double").as("priority"))
  }

  /** Frontier report: [[sitemapEntries]] URL rows gated by the
    * [[robotsUrlVerdict]] access rules for `bot`, rolled up per host —
    * the "what should we fetch next from this site" census a crawl
    * scheduler consumes (URL volume, how much of it robots actually
    * permits, the strongest priority hint among PERMITTED urls, and
    * the freshest lastmod). The verdict leg is the one host-keyed
    * equi-join robots costs anywhere; the rollup is map-side combined
    * and bounded by the host census. */
  def sitemapFrontier(entries: DataFrame, rules: DataFrame,
                      bot: String = "graftbot"): DataFrame = {
    val urls = entries.where(col("kind") === "url")
      .select(col("loc"), col("priority"), col("lastmod_date"))
    val v = robotsUrlVerdict(
      urls.select(col("loc").as("doc_id"), col("loc").as("url")),
      rules, bot)
    urls.join(v.select(col("doc_id").as("loc"), col("host"),
        col("allowed")), Seq("loc"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_urls"),
        sum(when(col("allowed"), 1L).otherwise(0L)).as("n_allowed"),
        max(when(col("allowed"), col("priority")))
          .as("max_allowed_priority"),
        max(col("lastmod_date")).as("latest_lastmod"))
  }

  /** Registry-side audit for [[domainOptOut]]: per opt-out domain, how
    * many documents it dropped under longest-match attribution — with
    * ZERO-hit entries surfaced (the "this entry never fired" read a
    * governance review needs; the q145 suppression-report shape).
    * Bounded by the registry: the verdict side rolls up map-side into
    * <= |registry| rows, which join back broadcast. */
  def domainOptOutAudit(verdict: DataFrame, optOut: DataFrame): DataFrame = {
    val counts = verdict.where(!col("kept"))
      .groupBy(col("optout_domain")).agg(count(lit(1)).as("_n"))
    optOut.select(col("domain"))
      .join(broadcast(counts), col("domain") === col("optout_domain"), "left")
      .select(col("domain"), coalesce(col("_n"), lit(0L)).as("n_dropped"))
  }
}
