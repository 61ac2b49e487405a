package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.{Analytics, Boilerplate, LinkGraph, Pipeline, Quality, Web}
import graft.sources
import graft.SparkEntry.{boilerplateCtes, govSweepCtes, optOutRegistry,
  robotsDocs, robotsParseCte, robotsPathDocs, robotsUrlVerdictCte, synthUrl}

/** Crawl-frontier domain registry: the link-graph leg (q251–q253) and
  * sitemap ingestion + frontier report (q258–q259), each query next to
  * its DuckDB oracle SQL — the per-domain layout the round-14 verdict
  * asked the monolithic SparkEntry maps to migrate toward. SparkEntry
  * concatenates `queries`/`oracleSql` into the driver contract; fixture
  * helpers shared with other domains stay in SparkEntry as
  * `private[graft]` (robotsPathDocs, robotsUrlVerdictCte). */
private[graft] object CrawlRegistry {

  // ------------------------------------------------------------ fixtures

  /** The q251-q253 link-graph fixture: every page's base URL plus an
    * HTML body whose hrefs exercise each [[graft.ops.LinkGraph]]
    * resolution branch — absolute with the full canonicalization mess
    * (case-shifted scheme/host, `www.`, tracking params, fragment),
    * root-relative with a tracking param, dot-segment relative,
    * protocol-relative (fires on doc_id%3=0), directory-relative
    * (doc_id%5=0), a non-http scheme (mailto), and a fragment-only
    * href. Both engines synthesize the SAME bytes, so extraction,
    * resolution, and canonicalization all sit inside the hash gate.
    * Link targets land cross-host by construction ((3d+1)%20 walks the
    * source alphabet), so the host graph is connected and non-trivial. */
  private def pageUrl: Column =
    concat(lit("https://"), col("source"), lit(".example.com/page/"),
      col("doc_id").cast("string"))

  private def pageHtml: Column = {
    val d = col("doc_id")
    def n(c: Column): Column = c.cast("string")
    concat(
      lit("<html><head><title>p"), n(d),
      lit("</title></head><body>\n<p>intro "), n(d), lit("</p>\n"),
      lit("<a href=\"HTTPS://WWW.src"), n((d * 3 + 1) % 20),
      lit(".Example.COM/page/"), n((d * 7 + 3) % 500),
      lit("/?utm_campaign=x&b=2&a=1#frag\">abs</a>\n"),
      lit("<a href='/page/"), n((d + 11) % 500),
      lit("?z=9&utm_source=t'>root</a>\n"),
      lit("<A HREF=\"../page/"), n((d + 1) % 500), lit("#sec\">up</A>\n"),
      when(d % 3 === 0, concat(lit("<a href=\"//cdn.example.org/lib/v"),
        n(d % 7), lit(".js\">cdn</a>\n"))).otherwise(lit("")),
      when(d % 5 === 0, concat(lit("<a href=\"other/"), n(d % 50),
        lit("\">rel</a>\n"))).otherwise(lit("")),
      lit("<a href=\"mailto:u"), n(d),
      lit("@example.com\">m</a>\n<a href=\"#top\">t</a>\n</body></html>"))
  }

  private def linkPages(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), pageUrl.as("url"), pageHtml.as("html"))

  /** q258/q259 sitemap fixture: per source host an `<urlset>` doc —
    * four url blocks exercising trim (padded loc), junk lastmod/
    * priority, a missing-loc block and a whitespace-loc block (both
    * dropped), plus an md5-gated extra block — and a `<sitemapindex>`
    * doc. The locs land on the robotsPathDocs pattern battery so the
    * q259 frontier report exercises the verdict branches. */
  private def sitemapDocs(docs: DataFrame): DataFrame = {
    val srcs = docs.select(col("source")).distinct()
    val host = concat(col("source"), lit(".example.com"))
    val k = substring(md5(col("source")), 1, 2)
    val urlset = srcs.select(host.as("host"), concat(
      lit("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n"),
      lit("<url>\n  <loc>  https://"), col("source"),
      lit(".example.com/A/B/"), k,
      lit("/ </loc>\n  <lastmod>2026-01-15</lastmod>\n  <priority>0.8</priority>\n</url>\n"),
      lit("<url><loc>https://"), col("source"), lit(".example.com/A/x/page"),
      k, lit("</loc><changefreq>daily</changefreq></url>\n"),
      lit("<url><loc>https://www."), col("source"),
      lit(".example.com/misc?q=1</loc><lastmod>not-a-date</lastmod><priority>high</priority></url>\n"),
      when(substring(md5(col("source")), 3, 1) < "8",
        concat(lit("<url>\n<loc>https://"), col("source"),
          lit(".example.com/only/Path/</loc>\n<lastmod>2026-03-02</lastmod>\n<priority>0.5</priority>\n</url>\n")))
        .otherwise(lit("")),
      lit("<url><lastmod>2026-02-02</lastmod></url>\n<url><loc>   </loc></url>\n</urlset>"))
      .as("text"))
    val index = srcs.select(host.as("host"), concat(
      lit("<?xml version=\"1.0\"?>\n<sitemapindex>\n<sitemap><loc>https://"),
      col("source"),
      lit(".example.com/sitemap-a.xml</loc><lastmod>2026-03-01</lastmod></sitemap>\n"),
      lit("<sitemap>\n  <loc>https://"), col("source"),
      lit(".example.com/sitemap-b.xml</loc>\n</sitemap>\n</sitemapindex>"))
      .as("text"))
    urlset.unionByName(index)
  }

  // ------------------------------------------------------------ queries

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // outlink harvest (LinkGraph.outlinks over WARC HTTP bodies): pages
    // written as real WARC response records, read back through the
    // member walk + HTTP parser, hrefs extracted / RFC 3986-resolved /
    // canonicalized — the crawl front door's link-graph leg; the oracle
    // re-synthesizes the HTML from parquet and replays extraction,
    // resolution (same bounded dot-segment passes), and the q114 chain
    "q251_outlinks" -> ((s, d) => {
      val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft_warc_q251").getAbsolutePath
      sources.Warc.writeResponses(
        linkPages(Tables.documents(s, d)).select(
          col("doc_id"), col("url").as("uri"),
          lit("2026-05-06T07:08:09Z").as("date"), lit(200L).as("status"),
          lit("text/html; charset=utf-8").as("ctype"),
          col("html").as("text")),
        dir, perFile = 64)
      val back = sources.Warc.httpResponses(
        sources.Warc.read(s, s"$dir/*.warc.gz"))
      LinkGraph.outlinks(back.select(
        regexp_extract(col("target_uri"), "/page/([0-9]+)$", 1)
          .cast("long").as("doc_id"),
        col("target_uri").as("url"), col("body").cast("string").as("html")))
    }),
    // host-graph rollup of the same links: ONE map-side-combined
    // shuffle, output bounded by the host-pair census (the frame a URL
    // frontier and a domain-mix report both key on)
    "q252_host_graph" -> ((s, d) =>
      LinkGraph.hostGraph(LinkGraph.outlinks(
        linkPages(Tables.documents(s, d))))),
    // host-quality prior: integer-exact PageRank (Graph.pageRankFixed)
    // over cross-host edges + inbound degree — the host-keyed frame a
    // governance sweep or crawl frontier joins on; oracle = the q102
    // unrolled-iteration pattern over the link CTE
    "q253_host_rank" -> ((s, d) => {
      // the host columns materialize ONCE: the regexp-heavy href
      // extraction + URL resolution otherwise runs twice — once inside
      // hostRank's edge checkpoint and once for the inbound-degree leg
      // (r18; the page HTML never leaves the scan either way)
      val links = LinkGraph.outlinks(linkPages(Tables.documents(s, d)))
        .select(col("src_host"), col("dst_host"))
        .transform(graft.plans.CheckpointAudit.local)
      val inb = links.where(col("src_host") =!= col("dst_host"))
        .groupBy(col("dst_host").as("host"))
        .agg(count(lit(1)).as("_n"))
      LinkGraph.hostRank(links).join(inb, Seq("host"), "left")
        .select(col("host"), col("rank_e6"),
          coalesce(col("_n"), lit(0L)).as("n_inlinks"))
    }),
    // sitemap.xml parsing (Web.sitemapEntries): urlset + sitemapindex
    // blocks, trim/junk/missing-loc rules, try-cast date and priority —
    // the crawl-frontier companion of the robots battery
    "q258_sitemap" -> ((s, d) =>
      Web.sitemapEntries(sitemapDocs(Tables.documents(s, d)))),
    // frontier report (Web.sitemapFrontier): sitemap URLs gated by the
    // q241 robots verdict and rolled up per host — URL volume, robots-
    // permitted share, strongest permitted priority, freshest lastmod
    "q259_sitemap_frontier" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Web.sitemapFrontier(Web.sitemapEntries(sitemapDocs(docs)),
        Web.robotsRules(graft.SparkEntry.robotsPathDocs(docs)))
    }),
    // the composed CRAWL SCHEDULE — the round-14 verdict's "host prior
    // joinable" landing end-to-end: the q259 frontier (what each site
    // offers and robots permits) joined with the q253 PageRank prior
    // (how the web values the host), one host-keyed frame a scheduler
    // sorts by; politeness (q247) joins the same key. Hosts without
    // link evidence read rank 0 (nothing links them — crawl last)
    "q260_crawl_schedule" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val frontier = Web.sitemapFrontier(
        Web.sitemapEntries(sitemapDocs(docs)),
        Web.robotsRules(graft.SparkEntry.robotsPathDocs(docs)))
      val rank = LinkGraph.hostRank(LinkGraph.outlinks(linkPages(docs)))
      frontier.join(rank, Seq("host"), "left")
        .select(col("host"), col("n_urls"), col("n_allowed"),
          col("max_allowed_priority"),
          coalesce(col("rank_e6"), lit(0L)).as("rank_e6"))
    }),
    // bot-traffic detection by inter-arrival regularity (Analytics
    // .timingRegularity): users on user_id % 7 == 2 are re-timed in-plan
    // onto an exact 60 s grid (timer-scripted actors), the rest keep
    // organic bursty gaps — integer-seconds MAD/mean dispersion in ppm
    // separates them with zero float variance; the oracle replays the
    // planting, the lag window, and both bounded aggs
    "q157_bot_regularity" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
      val rn = row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id")))
      Analytics.timingRegularity(
        ev.withColumn("_rn", rn)
          .withColumn("ts", when(pmod(col("user_id"), lit(7)) === 2,
            timestamp_micros(lit(1700000000000000L) + col("_rn") * 60000000L))
            .otherwise(col("ts")))
          .drop("_rn"))
    }),
    // the crawl FRONT DOOR end-to-end (q239 bytes + q242 semantics):
    // the governance fixture is written as real WET files, read back
    // through the member walk, and the ROBOTS-CHAINED sweep runs on the
    // roundtripped (record_id, target_uri, text) rows — no parquet in
    // between; keyed by the deterministic WARC record id (md5-derived,
    // so the oracle re-derives it)
    "q246_wet_governance" -> ((s, d) => {
      val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft_wet_q246").getAbsolutePath
      val docs = Tables.documents(s, d)
      val base = Quality.injectLicenses(docs)
        .join(docs.select(col("doc_id"), synthUrl.as("url")), Seq("doc_id"))
        .select(col("doc_id"), col("url"),
          when(pmod(col("doc_id"), lit(11)) === 0,
            concat(col("text"), lit(" contact user"),
              col("doc_id").cast("string"), lit("@example.com now")))
            .otherwise(col("text")).as("text"))
      sources.Warc.writeWet(base.select(col("doc_id"),
        col("url").as("uri"), lit("2026-01-02T03:04:05Z").as("date"),
        col("text")), dir, perFile = 100)
      // materialize the roundtripped rows ONCE (r18): governanceSweep
      // derives six per-doc legs from its input frame, and an
      // un-checkpointed WET read re-runs the gunzip + record walk per
      // leg — six full WARC parses for one sweep
      val back = sources.Warc.readWet(s, s"$dir/*.warc.wet.gz")
        .select(col("record_id"), col("target_uri").as("url"), col("text"))
        .transform(graft.plans.CheckpointAudit.local)
      Pipeline.governanceSweep(back, optOutRegistry(docs),
        idCol = "record_id",
        robotsRules = Some(Web.robotsRules(robotsPathDocs(docs))))
    }),
    // per-host crawl-delay politeness census (Web.crawlDelay): RFC 9309
    // group selection (specific eclipses `*`, no fallback), then the
    // MAX numeric delay in the selected group — the q221 fixture's
    // graftbot groups carry 'Crawl-delay: 5' on the md5 flip and no
    // delay otherwise (NULL: crawl at default pace)
    "q247_crawl_delay" -> ((s, d) =>
      Web.crawlDelay(Web.robotsRules(robotsDocs(Tables.documents(s, d))))),
    // raw WARC -> extracted MAIN CONTENT (q244 bytes + q137 semantics):
    // the jusText page synthesis rides real HTTP response payloads, the
    // content-type/status gates filter the captures, and
    // Boilerplate.mainContent reassembles only the good blocks — the
    // extraction step a raw-crawl pipeline runs between ingestion and
    // every text gate (and mainContent's first end-to-end oracle)
    "q248_warc_main_content" -> ((s, d) => {
      val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft_warc_q248").getAbsolutePath
      val docs = Tables.documents(s, d)
      val page = concat_ws("\n\n",
        lit("@lnk home @lnk about @lnk contact nav menu"),
        concat(col("text"), lit(" the of and to in is on the a of and in")),
        concat(lit("posted "), col("doc_id")),
        col("text"),
        lit("@lnk privacy @lnk terms @lnk copyright site"))
      sources.Warc.writeResponses(docs.select(col("doc_id"),
        concat(lit("https://"), col("source"), lit(".example.com/a/"),
          col("doc_id").cast("string")).as("uri"),
        lit("2026-01-03T00:00:00Z").as("date"),
        lit(200L).as("status"),
        lit("text/html; charset=utf-8").as("ctype"),
        page.as("text")), dir, perFile = 100)
      val resp = sources.Warc
        .httpResponses(sources.Warc.read(s, s"$dir/*.warc.gz"))
        .where(col("http_ok") && col("http_status") === 200 &&
          col("http_content_type").startsWith("text/html"))
        .select(regexp_extract(col("target_uri"), "/a/([0-9]+)$", 1)
          .cast("long").as("doc_id"),
          col("body").cast("string").as("text"))
      Boilerplate.mainContent(resp)
    }))

  // ------------------------------------------------------------ oracles

  /** DuckDB twin of [[graft.ops.LinkGraph.resolveUrl]]'s bounded
    * dot-segment normalization: the SAME number of rounds and the SAME
    * six global replaces per round — cross-engine equality is exact by
    * construction, not approximate. */
  private def dotSegSql(e: String): String =
    (1 to LinkGraph.dotSegmentPasses).foldLeft(e)((u, _) =>
      "regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
        "regexp_replace(regexp_replace(" +
        u + ", '/\\./', '/', 'g'), '/\\.$', '/', 'g'), " +
        "'/[^/.][^/]*/\\.\\./', '/', 'g'), '/[^/.][^/]*/\\.\\.$', '/', 'g'), " +
        "'^/\\.\\./', '/', 'g'), '^/\\.\\.$', '/', 'g')")

  /** Shared q251-q253 oracle chain: re-synthesize the [[pageHtml]]
    * bytes from parquet, replay href extraction, RFC 3986 resolution
    * (same CASE branches as LinkGraph.resolveUrl, same [[dotSegSql]]
    * passes), the http(s) scheme filter, and the q114 canonicalization
    * for both endpoint hosts. Ends with a `links(doc_id, src_host,
    * dst_url, dst_host)` CTE. */
  private def outlinkCteSql: String =
    """pages AS (SELECT doc_id,
      |    'https://' || source || '.example.com/page/'
      |      || CAST(doc_id AS VARCHAR) AS url,
      |    '<html><head><title>p' || CAST(doc_id AS VARCHAR)
      |      || '</title></head><body>' || chr(10)
      |      || '<p>intro ' || CAST(doc_id AS VARCHAR) || '</p>' || chr(10)
      |      || '<a href="HTTPS://WWW.src' || CAST((doc_id * 3 + 1) % 20 AS VARCHAR)
      |      || '.Example.COM/page/' || CAST((doc_id * 7 + 3) % 500 AS VARCHAR)
      |      || '/?utm_campaign=x&b=2&a=1#frag">abs</a>' || chr(10)
      |      || '<a href=''/page/' || CAST((doc_id + 11) % 500 AS VARCHAR)
      |      || '?z=9&utm_source=t''>root</a>' || chr(10)
      |      || '<A HREF="../page/' || CAST((doc_id + 1) % 500 AS VARCHAR)
      |      || '#sec">up</A>' || chr(10)
      |      || CASE WHEN doc_id % 3 = 0 THEN '<a href="//cdn.example.org/lib/v'
      |           || CAST(doc_id % 7 AS VARCHAR) || '.js">cdn</a>' || chr(10)
      |         ELSE '' END
      |      || CASE WHEN doc_id % 5 = 0 THEN '<a href="other/'
      |           || CAST(doc_id % 50 AS VARCHAR) || '">rel</a>' || chr(10)
      |         ELSE '' END
      |      || '<a href="mailto:u' || CAST(doc_id AS VARCHAR)
      |      || '@example.com">m</a>' || chr(10)
      |      || '<a href="#top">t</a>' || chr(10) || '</body></html>' AS html
      |  FROM documents),
      |hrf AS (SELECT doc_id, url, unnest(regexp_extract_all(html,
      |    '(?i)href\s*=\s*["'']([^"''>]*)["'']', 1)) href FROM pages),
      |rs0 AS (SELECT doc_id, url, regexp_replace(href, '#.*$', '') h FROM hrf),
      |rs1 AS (SELECT doc_id, url,
      |    CASE WHEN h = '' THEN NULL
      |         WHEN regexp_matches(h, '^[A-Za-z][A-Za-z0-9+.-]*:') THEN h
      |         WHEN h LIKE '//%' THEN
      |           lower(regexp_extract(url, '^([^:/?#]+)://', 1)) || ':' || h
      |         WHEN h LIKE '/%' THEN
      |           lower(regexp_extract(url, '^([^:/?#]+)://', 1)) || '://'
      |           || regexp_extract(url, '^[^:/?#]+://([^/?#]*)', 1) || h
      |         WHEN h LIKE '?%' THEN
      |           lower(regexp_extract(url, '^([^:/?#]+)://', 1)) || '://'
      |           || regexp_extract(url, '^[^:/?#]+://([^/?#]*)', 1)
      |           || regexp_extract(url, '^[^:/?#]+://[^/?#]*([^?#]*)', 1) || h
      |         ELSE lower(regexp_extract(url, '^([^:/?#]+)://', 1)) || '://'
      |           || regexp_extract(url, '^[^:/?#]+://([^/?#]*)', 1)
      |           || CASE WHEN contains(regexp_extract(url,
      |                '^[^:/?#]+://[^/?#]*([^?#]*)', 1), '/')
      |              THEN regexp_extract(regexp_extract(url,
      |                '^[^:/?#]+://[^/?#]*([^?#]*)', 1), '^(.*/)', 1)
      |              ELSE '/' END || h
      |    END raw FROM rs0),
      |rs2 AS (SELECT doc_id, url,
      |    regexp_extract(raw, '^([^:/?#]+://[^/?#]*)', 1) ||
      |    """.stripMargin +
      dotSegSql("regexp_replace(raw, '^[^:/?#]+://[^/?#]*', '')") + """ dst
      |  FROM rs1 WHERE raw IS NOT NULL),
      |lk0 AS (SELECT doc_id, url, dst FROM rs2
      |  WHERE lower(regexp_extract(dst, '^([^:/?#]+)://', 1)) IN ('http', 'https')),
      |cn AS (SELECT doc_id,
      |    lower(regexp_extract(url, '^([^:/?#]+)://', 1)) s_sch,
      |    regexp_replace(lower(regexp_extract(url, '^[^:/?#]+://([^/?#]*)', 1)),
      |      '^www\.', '') s_auth,
      |    lower(regexp_extract(dst, '^([^:/?#]+)://', 1)) d_sch,
      |    regexp_replace(lower(regexp_extract(dst, '^[^:/?#]+://([^/?#]*)', 1)),
      |      '^www\.', '') d_auth,
      |    regexp_replace(regexp_extract(dst, '^[^:/?#]+://[^/?#]*([^?#]*)', 1),
      |      '/+$', '') d_path,
      |    list_sort(list_filter(string_split(
      |      regexp_extract(dst, '^[^#?]*\?([^#]*)', 1), '&'), x -> x <> ''
      |      AND NOT regexp_matches(x,
      |        '^(utm_[^=]*|fbclid|gclid|mc_eid|ref)(=.*)?$'))) d_ps
      |  FROM lk0),
      |links AS (SELECT doc_id,
      |    CASE WHEN s_sch = 'http' THEN regexp_replace(s_auth, ':80$', '')
      |         WHEN s_sch = 'https' THEN regexp_replace(s_auth, ':443$', '')
      |         ELSE s_auth END src_host,
      |    d_sch || '://'
      |      || CASE WHEN d_sch = 'http' THEN regexp_replace(d_auth, ':80$', '')
      |           WHEN d_sch = 'https' THEN regexp_replace(d_auth, ':443$', '')
      |           ELSE d_auth END || d_path
      |      || CASE WHEN len(d_ps) > 0 THEN '?' || array_to_string(d_ps, '&')
      |           ELSE '' END dst_url,
      |    CASE WHEN d_sch = 'http' THEN regexp_replace(d_auth, ':80$', '')
      |         WHEN d_sch = 'https' THEN regexp_replace(d_auth, ':443$', '')
      |         ELSE d_auth END dst_host
      |  FROM cn)""".stripMargin

  /** The q102-pattern unrolled 3-iteration integer-exact PageRank over
    * the link CTE's cross-host edges, ending in `r3(node, rank_e6)` +
    * `inb(node, n)` — shared by the q253 and q260 oracles. */
  private def hostRankCtesSql: String =
    """e AS (SELECT src_host src, dst_host dst FROM links
      |      WHERE src_host <> dst_host),
      |nodes AS (SELECT DISTINCT node FROM
      |  (SELECT src node FROM e UNION ALL SELECT dst FROM e)),
      |deg AS (SELECT src, COUNT(*) deg FROM e GROUP BY 1),
      |r0 AS (SELECT node, CAST(1000000 AS BIGINT) rank_e6 FROM nodes),
      |c1 AS (SELECT e.dst node, SUM(r0.rank_e6 // d.deg) in_c
      |       FROM e JOIN r0 ON e.src = r0.node
      |       JOIN deg d ON e.src = d.src GROUP BY 1),
      |r1 AS (SELECT n.node,
      |       CAST(150000 + (85 * COALESCE(c1.in_c, 0)) // 100 AS BIGINT) rank_e6
      |       FROM nodes n LEFT JOIN c1 USING (node)),
      |c2 AS (SELECT e.dst node, SUM(r1.rank_e6 // d.deg) in_c
      |       FROM e JOIN r1 ON e.src = r1.node
      |       JOIN deg d ON e.src = d.src GROUP BY 1),
      |r2 AS (SELECT n.node,
      |       CAST(150000 + (85 * COALESCE(c2.in_c, 0)) // 100 AS BIGINT) rank_e6
      |       FROM nodes n LEFT JOIN c2 USING (node)),
      |c3 AS (SELECT e.dst node, SUM(r2.rank_e6 // d.deg) in_c
      |       FROM e JOIN r2 ON e.src = r2.node
      |       JOIN deg d ON e.src = d.src GROUP BY 1),
      |r3 AS (SELECT n.node,
      |       CAST(150000 + (85 * COALESCE(c3.in_c, 0)) // 100 AS BIGINT) rank_e6
      |       FROM nodes n LEFT JOIN c3 USING (node)),
      |inb AS (SELECT dst node, COUNT(*) n FROM e GROUP BY 1)""".stripMargin

  /** The [[sitemapDocs]] fixture + the sitemapEntries parse chain as
    * SQL, ending in `sm(host, kind, loc, lastmod, lastmod_date,
    * changefreq, priority)`. */
  private def sitemapCteSql: String =
    """smdocs AS (
      |  SELECT source || '.example.com' host,
      |    '<?xml version="1.0" encoding="UTF-8"?>' || chr(10)
      |    || '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">' || chr(10)
      |    || '<url>' || chr(10) || '  <loc>  https://' || source
      |    || '.example.com/A/B/' || substring(md5(source), 1, 2)
      |    || '/ </loc>' || chr(10) || '  <lastmod>2026-01-15</lastmod>'
      |    || chr(10) || '  <priority>0.8</priority>' || chr(10) || '</url>' || chr(10)
      |    || '<url><loc>https://' || source || '.example.com/A/x/page'
      |    || substring(md5(source), 1, 2)
      |    || '</loc><changefreq>daily</changefreq></url>' || chr(10)
      |    || '<url><loc>https://www.' || source
      |    || '.example.com/misc?q=1</loc><lastmod>not-a-date</lastmod><priority>high</priority></url>' || chr(10)
      |    || CASE WHEN substring(md5(source), 3, 1) < '8'
      |       THEN '<url>' || chr(10) || '<loc>https://' || source
      |         || '.example.com/only/Path/</loc>' || chr(10)
      |         || '<lastmod>2026-03-02</lastmod>' || chr(10)
      |         || '<priority>0.5</priority>' || chr(10) || '</url>' || chr(10)
      |       ELSE '' END
      |    || '<url><lastmod>2026-02-02</lastmod></url>' || chr(10)
      |    || '<url><loc>   </loc></url>' || chr(10) || '</urlset>' AS text
      |  FROM (SELECT DISTINCT source FROM documents)
      |  UNION ALL
      |  SELECT source || '.example.com',
      |    '<?xml version="1.0"?>' || chr(10) || '<sitemapindex>' || chr(10)
      |    || '<sitemap><loc>https://' || source
      |    || '.example.com/sitemap-a.xml</loc><lastmod>2026-03-01</lastmod></sitemap>' || chr(10)
      |    || '<sitemap>' || chr(10) || '  <loc>https://' || source
      |    || '.example.com/sitemap-b.xml</loc>' || chr(10) || '</sitemap>'
      |    || chr(10) || '</sitemapindex>'
      |  FROM (SELECT DISTINCT source FROM documents)),
      |sblk AS (
      |  SELECT host, 'url' kind, unnest(regexp_extract_all(text,
      |    '(?s)<url>(.*?)</url>', 1)) b FROM smdocs
      |  UNION ALL
      |  SELECT host, 'sitemap', unnest(regexp_extract_all(text,
      |    '(?s)<sitemap>(.*?)</sitemap>', 1)) FROM smdocs),
      |sfld AS (SELECT host, kind,
      |    regexp_replace(regexp_replace(regexp_extract(b,
      |      '(?s)<loc>([^<]*)</loc>', 1), '^\s+', ''), '\s+$', '') loc,
      |    regexp_replace(regexp_replace(regexp_extract(b,
      |      '(?s)<lastmod>([^<]*)</lastmod>', 1), '^\s+', ''), '\s+$', '') lastmod,
      |    regexp_replace(regexp_replace(regexp_extract(b,
      |      '(?s)<changefreq>([^<]*)</changefreq>', 1), '^\s+', ''), '\s+$', '') changefreq,
      |    regexp_replace(regexp_replace(regexp_extract(b,
      |      '(?s)<priority>([^<]*)</priority>', 1), '^\s+', ''), '\s+$', '') pr
      |  FROM sblk),
      |sm AS (SELECT host, kind, loc,
      |    CASE WHEN lastmod = '' THEN NULL ELSE lastmod END lastmod,
      |    TRY_CAST(CASE WHEN lastmod = '' THEN NULL ELSE lastmod END AS DATE)
      |      lastmod_date,
      |    CASE WHEN changefreq = '' THEN NULL ELSE changefreq END changefreq,
      |    TRY_CAST(CASE WHEN pr = '' THEN NULL ELSE pr END AS DOUBLE) priority
      |  FROM sfld WHERE loc <> '')""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // outlink replay: pageHtml re-synthesized from parquet, href
    // extraction + RFC 3986 resolution + q114 canonicalization all
    // inside the hash gate (outlinkCteSql)
    "q251_outlinks" ->
      ("WITH " + outlinkCteSql + """
        |SELECT doc_id, src_host, dst_url, dst_host,
        |  src_host = dst_host AS internal FROM links""".stripMargin),
    "q252_host_graph" ->
      ("WITH " + outlinkCteSql + """
        |SELECT src_host, dst_host, COUNT(*) n_links,
        |  COUNT(DISTINCT doc_id) n_pages
        |FROM links GROUP BY 1, 2""".stripMargin),
    // host-rank replay: the q102 unrolled integer-exact iterations over
    // the cross-host edges of the link CTE, plus inbound degree
    "q253_host_rank" ->
      ("WITH " + outlinkCteSql + ",\n" + hostRankCtesSql + """
        |SELECT r3.node host, r3.rank_e6,
        |  COALESCE(inb.n, 0) n_inlinks
        |FROM r3 LEFT JOIN inb USING (node)""".stripMargin),
    // sitemap parse replay: fixture XML re-synthesized from parquet,
    // block extraction + field trim + try-casts all inside the gate
    "q258_sitemap" ->
      ("WITH " + sitemapCteSql + """
        |SELECT host, kind, loc, lastmod, lastmod_date, changefreq,
        |  priority
        |FROM sm""".stripMargin),
    // frontier replay: the sitemap chain's url rows as the verdict
    // input (doc_id = loc), the q241 robots CTE, one per-host rollup
    "q259_sitemap_frontier" ->
      ("WITH " + sitemapCteSql + """,
        |u AS (SELECT loc doc_id, loc url FROM sm WHERE kind = 'url'),
        |""".stripMargin + graft.SparkEntry.robotsUrlVerdictCte + """
        |SELECT v.host, CAST(COUNT(*) AS BIGINT) n_urls,
        |  CAST(SUM(CASE WHEN allowed THEN 1 ELSE 0 END) AS BIGINT)
        |    n_allowed,
        |  MAX(CASE WHEN allowed THEN priority END) max_allowed_priority,
        |  MAX(lastmod_date) latest_lastmod
        |FROM sm JOIN rvd v ON sm.loc = v.doc_id
        |WHERE sm.kind = 'url'
        |GROUP BY 1""".stripMargin),
    // crawl-schedule replay: the q259 frontier rollup joined with the
    // q253 rank chain — every CTE family in one WITH (outlink pages,
    // PageRank, sitemap parse, the q241 robots verdict); rank coalesces
    // to 0 for never-linked hosts exactly like the Spark side
    "q260_crawl_schedule" ->
      ("WITH " + outlinkCteSql + ",\n" + hostRankCtesSql + ",\n" +
        sitemapCteSql + """,
        |u AS (SELECT loc doc_id, loc url FROM sm WHERE kind = 'url'),
        |""".stripMargin + graft.SparkEntry.robotsUrlVerdictCte + """,
        |fr AS (SELECT v.host, CAST(COUNT(*) AS BIGINT) n_urls,
        |    CAST(SUM(CASE WHEN allowed THEN 1 ELSE 0 END) AS BIGINT)
        |      n_allowed,
        |    MAX(CASE WHEN allowed THEN priority END) max_allowed_priority
        |  FROM sm JOIN rvd v ON sm.loc = v.doc_id
        |  WHERE sm.kind = 'url'
        |  GROUP BY 1)
        |SELECT fr.host, fr.n_urls, fr.n_allowed, fr.max_allowed_priority,
        |  COALESCE(r3.rank_e6, 0) rank_e6
        |FROM fr LEFT JOIN r3 ON fr.host = r3.node""".stripMargin),
    "q157_bot_regularity" ->
      """WITH rn AS (SELECT user_id, event_id, ts,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) rn
        |  FROM events),
        |p AS (SELECT user_id, event_id,
        |    CASE WHEN user_id % 7 = 2
        |         THEN make_timestamp(1700000000000000 + rn * 60000000)
        |         ELSE ts END ts2 FROM rn),
        |d AS (SELECT user_id,
        |    (epoch_us(ts2) - LAG(epoch_us(ts2)) OVER (
        |       PARTITION BY user_id ORDER BY ts2, event_id)) // 1000000 gap_s
        |  FROM p),
        |g AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) n_gaps,
        |             CAST(SUM(gap_s) AS BIGINT) sum_s
        |      FROM d WHERE gap_s IS NOT NULL GROUP BY 1),
        |m AS (SELECT user_id, n_gaps,
        |             CAST(sum_s // n_gaps AS BIGINT) mean_gap_s FROM g),
        |a AS (SELECT d.user_id,
        |             CAST(SUM(ABS(d.gap_s - m.mean_gap_s)) AS BIGINT) adev
        |      FROM d JOIN m ON d.user_id = m.user_id
        |      WHERE d.gap_s IS NOT NULL GROUP BY 1)
        |SELECT m.user_id, m.n_gaps, m.mean_gap_s,
        |       CAST((a.adev * 1000000)
        |            // (m.n_gaps * GREATEST(m.mean_gap_s, 1)) AS BIGINT)
        |         mad_ppm,
        |       (m.n_gaps >= 9 AND
        |        (a.adev * 1000000)
        |          // (m.n_gaps * GREATEST(m.mean_gap_s, 1)) <= 100000)
        |         bot_like
        |FROM m JOIN a ON m.user_id = a.user_id""".stripMargin,
    // front-door replay: the q242 CTEs keyed through the DETERMINISTIC
    // WARC record id (md5 of the conversion seed, re-derived in SQL) —
    // matching proves the governance verdict survives the byte-level
    // WET roundtrip value-for-value
    "q246_wet_governance" ->
      ("WITH " + govSweepCtes + """,
        |rid AS (SELECT doc_id, '<urn:uuid:' || substr(hh, 1, 8) || '-'
        |    || substr(hh, 9, 4) || '-' || substr(hh, 13, 4) || '-'
        |    || substr(hh, 17, 4) || '-' || substr(hh, 21, 12) || '>' record_id
        |  FROM (SELECT doc_id, md5('conversion:'
        |    || CAST(doc_id AS VARCHAR) || ':' || url) hh FROM base)),
        |u AS (SELECT doc_id, url FROM base),
        |""".stripMargin + robotsUrlVerdictCte + """
        |SELECT rid.record_id, h.host, m."domain" optout_domain,
        |  lcv.spdx_id, lcv.license_class, CAST(fr.fre AS BIGINT) fre_milli,
        |  pii.has_pii,
        |  CASE WHEN m."domain" IS NOT NULL THEN 'opted_out'
        |       WHEN NOT rvd.allowed THEN 'robots_blocked'
        |       WHEN lcv.license_class IN ('copyleft', 'other-spdx')
        |         THEN 'license'
        |       WHEN pii.has_pii THEN 'pii'
        |       WHEN fr.fre IS NULL OR fr.fre < 30000 THEN 'unreadable'
        |       ELSE 'keep' END verdict,
        |  CASE WHEN m."domain" IS NOT NULL THEN FALSE
        |       WHEN NOT rvd.allowed THEN FALSE
        |       WHEN lcv.license_class IN ('copyleft', 'other-spdx')
        |         THEN FALSE
        |       WHEN pii.has_pii THEN FALSE
        |       WHEN fr.fre IS NULL OR fr.fre < 30000 THEN FALSE
        |       ELSE TRUE END kept
        |FROM h LEFT JOIN m USING (doc_id)
        |  JOIN lcv USING (doc_id) JOIN fr USING (doc_id)
        |  JOIN pii USING (doc_id) JOIN rvd USING (doc_id)
        |  JOIN rid USING (doc_id)""".stripMargin),
    // crawl-delay replay: the q221 parse chain + group selection +
    // conservative MAX over numeric delays
    "q247_crawl_delay" ->
      ("WITH " + robotsParseCte + """,
        |ar AS (SELECT host, agent, "rule", "value",
        |    lower(agent) = 'graftbot' spec FROM rules),
        |hs AS (SELECT host, bool_or(spec) has_spec FROM ar GROUP BY 1)
        |SELECT ar.host,
        |  MAX(CASE WHEN "rule" = 'crawl-delay'
        |        AND regexp_matches("value", '^[0-9]+$')
        |      THEN CAST("value" AS BIGINT) END) delay_secs,
        |  CASE WHEN has_spec THEN 'specific' ELSE 'wildcard' END delay_group
        |FROM ar JOIN hs USING (host)
        |WHERE (spec AND has_spec) OR (agent = '*' AND NOT has_spec)
        |GROUP BY 1, 3""".stripMargin),
    // main-content replay: the q137 chain + the good-block reassembly
    // (string_agg ordered by block index) — matching proves the HTTP
    // body roundtrip AND the block classification compose losslessly
    "q248_warc_main_content" ->
      ("WITH " + boilerplateCtes + """,
        |fin AS (SELECT doc_id, bidx,
        |  CASE WHEN cls = 'good' THEN 'good'
        |       WHEN cls = 'bad' THEN 'bad'
        |       WHEN cls = 'near_good' THEN
        |         CASE WHEN pv = 'good' OR nx = 'good' THEN 'good' ELSE 'bad' END
        |       ELSE CASE WHEN pv = 'good' AND nx = 'good' THEN 'good' ELSE 'bad' END
        |  END final_cls FROM cx),
        |gd AS (SELECT doc_id, bidx FROM fin WHERE final_cls = 'good')
        |SELECT b2.doc_id,
        |  string_agg(b2.blk, chr(10) || chr(10) ORDER BY b2.bidx) "text"
        |FROM b2 JOIN gd ON gd.doc_id = b2.doc_id AND gd.bidx = b2.bidx
        |GROUP BY 1""".stripMargin))
}
