package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry.{blocklistFixture, blocklistOracleSql,
  blocklistPhrases, govSweepCtes, optOutRegistry, robotsDocs,
  robotsParseCte, robotsPathDocs, robotsUrlVerdictCte, synthUrl}
import graft.model.Tables
import graft.ops
import graft.ops.{Curate, Pipeline, Quality, Web}

/** Governance/privacy domain registry (round-15 split tranche 7):
  * URL canonicalization + domain caps (q114/q115), the privacy trio
  * (q145 k-anonymity, q151 l-diversity, q153 t-closeness), blocklist
  * and Luhn audits (q176/q204), license census (q213), opt-out
  * composition and audit (q216/q217), the RFC 9309 robots family
  * (q221/q222/q241/q242) and the composed governance pipeline (q238)
  * — each query above its DuckDB oracle. Fixtures (synthUrl,
  * robotsDocs, robotsPathDocs, optOutRegistry) and shared oracle CTE
  * text stay in SparkEntry private[graft]: the crawl/WARC registries
  * and the streaming governance resident compose them too. Bodies and
  * SQL moved verbatim; the oracle gate re-ran on the split —
  * byte-identical results. */
private[graft] object GovernanceRegistry {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // URL canonicalization (ops/Web): messy surface forms synthesized
    // in-plan (case-shifted scheme/host, www., default/non-default ports,
    // tracking params, fragments, unsorted params, trailing slashes) so
    // every rule fires; the oracle re-derives the canonical form with
    // independent DuckDB string SQL
    "q114_url_canon" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val url = when(col("doc_id") % 4 === 0,
          concat(lit("HTTP://WWW."), col("source"), lit(".Example.COM:80/A/B/"),
            col("doc_id").cast("string"), lit("/?utm_source=feed&b=2&a=1#frag")))
        .when(col("doc_id") % 4 === 1,
          concat(lit("https://"), col("source"),
            lit(".example.com:8443/x?z=9&fbclid=XYZ&y=8&utm_medium=m")))
        .when(col("doc_id") % 4 === 2,
          concat(lit("HTTPS://Sub."), col("source"), lit(".Example.com:443/only/Path/")))
        .otherwise(concat(lit("http://"), col("source"), lit(".example.com/?q="),
          col("doc_id").cast("string"), lit("&ref=abc")))
      Web.canonicalizeUrls(docs.select(col("doc_id"), url.as("url")))
    }),
    // deterministic per-domain cap (ops/Curate.capPerDomain): the salted
    // two-level top-k must be row-identical to the oracle's plain
    // `row_number() OVER (PARTITION BY source ORDER BY md5, id) <= k`
    "q115_domain_cap" -> ((s, d) =>
      Curate.capPerDomain(
        Tables.documents(s, d).select(col("doc_id"), col("source")),
        domainCol = "source", idCol = "doc_id", k = 25, salt = "s7")
        .withColumn("rk", col("rk").cast("long"))),
    // k-anonymity audit (Quality.kAnonymity, Sweeney '02): equivalence
    // classes over the (nation, market segment) quasi-identifiers of the
    // customer table with k=10 — the privacy-risk report that
    // complements q48's PII redaction (direct identifiers removed there;
    // linkage risk lives in the QI combinations measured here)
    "q145_k_anonymity" -> ((s, d) =>
      Quality.kAnonymity(Tables.customer(s, d),
        Seq("c_nationkey", "c_mktsegment"), k = 10L)),
    // l-diversity audit (Quality.lDiversity, Machanavajjhala '06):
    // k-anonymity's homogeneity blind spot — classes are measured by
    // the DIVERSITY of a sensitive attribute (account-balance thousand
    // band) within each (nation, segment) QI class, l=3
    "q151_l_diversity" -> ((s, d) =>
      Quality.lDiversity(
        Tables.customer(s, d).withColumn("bal_band",
          floor(col("c_acctbal") / 1000.0).cast("long")),
        Seq("c_nationkey", "c_mktsegment"), "bal_band", l = 3L)),
    // t-closeness audit (Quality.tCloseness, Li et al. '07): the
    // skewness blind spot left after q145/q151 — per (nation, segment)
    // QI class, the ordered-domain Earth Mover's Distance between the
    // class's account-balance-band distribution and the global one, in
    // exact ppm fixed point (cumulative fractions ppm-quantized BEFORE
    // differencing, so both engines walk identical BIGINTs); t = 0.2
    "q153_t_closeness" -> ((s, d) =>
      Quality.tCloseness(
        Tables.customer(s, d).withColumn("bal_band",
          floor(col("c_acctbal") / 1000.0).cast("long")),
        Seq("c_nationkey", "c_mktsegment"), "bal_band", tPpm = 200000L)),
    // phrase-blocklist report (Curate.blocklistReport): the bad-word
    // pass c4Filter leaves to site policy — distinct word-boundary
    // phrase hits per doc over case-blind whitespace-normalized text.
    // Spam phrases planted in-plan (%13 / %17, mid-text so boundaries
    // are interior; %17 also plants "pillsbury", which must NOT fire
    // the "pills" entry — the boundary rule's negative control); the
    // oracle replays normalization and each phrase regex; the AC
    // automaton twin (blocklistReportAC) is spec-pinned equal
    "q176_blocklist" -> ((s, d) =>
      Curate.blocklistReport(blocklistFixture(s, d), blocklistPhrases)),
    // ROUGE-L instruction dedup (Dedup.rougeLPairs, the Self-Instruct
    // 0.7 gate): token-level LCS over first-16-token prefixes on a
    // bounded candidate set, F-measure in exact integer ppm; plants:
    // 8 verbatim copies (rouge 1e6) and 8 40-char-prefix copies (high
    // but asymmetric overlap) must surface; the oracle replays the DP
    // as a recursive CTE advancing one outer token per step with 16
    // lateral-alias max-chained row cells (the q188 bounded-width
    // device) — within-row lateral aliases are named d1..d16 so they
    // can never resolve to the carried c1..c16 columns
    // Luhn-checksum payment-card audit (Curate.luhnAudit, ISO/IEC
    // 7812-1): checksum-gated PII detection — injection plants a valid
    // spaced Visa test number, an invalid 16-digit twin, a doc-varying
    // 18-digit dashed run (both verdict branches exercised across the
    // corpus), and a 5-digit ZIP the pattern's length floor rejects; the oracle
    // replays extraction with the SAME regex string and the mod-10 fold
    // as a list comprehension over generate_series — pure integer
    // arithmetic, engine-exact
    "q204_luhn_audit" -> ((s, d) =>
      Curate.luhnAudit(Curate.injectCards(Tables.documents(s, d)))),
    // license-marker census (Quality.licenseCensus, The Stack/BigCode
    // compliance pass): SPDX header id + copyleft/permissive phrase
    // hits + one verdict by fixed precedence (spdx > copyleft >
    // permissive > none); lookaround-free (?i) patterns run verbatim
    // in Java regex and RE2; injection plants all five marker classes
    // incl. the spdx-over-prose and copyleft-over-permissive cases
    "q213_license_census" -> ((s, d) =>
      Quality.licenseCensus(Quality.injectLicenses(Tables.documents(s, d)))),
    // per-domain opt-out governance verdict (Web.domainOptOut): canonical
    // hosts vs a broadcast registry under SUFFIX semantics via the
    // bounded dot-suffix explode (equi-join, never a nested-loop
    // endswith); longest match wins, ports never govern, unmatched docs
    // kept — run BEFORE any curation
    "q216_domain_optout" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Web.domainOptOut(docs.select(col("doc_id"), synthUrl.as("url")),
        optOutRegistry(docs))
    }),
    // registry-side audit (Web.domainOptOutAudit): drops per opt-out
    // domain under longest-match attribution, zero-hit entries surfaced
    // (the q145 suppression-report shape)
    "q217_optout_audit" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val reg = optOutRegistry(docs)
      Web.domainOptOutAudit(
        Web.domainOptOut(docs.select(col("doc_id"), synthUrl.as("url")), reg),
        reg)
    }),
    // robots.txt directive parser (Web.robotsRules, RFC 9309): group
    // runs (consecutive User-agent lines share their rules — one row
    // per pair), rules outside any group ignored, comments cut,
    // case-insensitive field names; the fixture fires every branch
    "q221_robots_rules" -> ((s, d) =>
      Web.robotsRules(robotsDocs(Tables.documents(s, d)))),
    // robots-derived opt-out composition: parse the robots corpus,
    // derive the full-opt-out registry (any *- or graftbot-covering
    // group with Disallow /), and run the q216 governance verdict
    // against it — the registry COMES FROM data instead of a curated
    // list; end-to-end crawl-compliance in one query
    "q222_robots_optout" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Web.domainOptOut(docs.select(col("doc_id"), synthUrl.as("url")),
        Web.robotsOptOut(Web.robotsRules(robotsDocs(docs))))
    }),
    // the composed governance sweep (Pipeline.governanceSweep): the
    // q216 opt-out verdict, q213 license census, PII patterns, and
    // q228 readability chained with ONE reason-coded precedence —
    // opted_out > license > pii > unreadable > keep; fixture = the
    // q216 urls + the q213 license injection + a %11 planted email
    "q238_governance_pipeline" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val base = Quality.injectLicenses(docs)
        .join(docs.select(col("doc_id"), synthUrl.as("url")), Seq("doc_id"))
        .select(col("doc_id"), col("url"),
          when(pmod(col("doc_id"), lit(11)) === 0,
            concat(col("text"), lit(" contact user"),
              col("doc_id").cast("string"), lit("@example.com now")))
            .otherwise(col("text")).as("text"))
      Pipeline.governanceSweep(base, optOutRegistry(docs))
    }),
    // per-URL RFC 9309 verdict (Web.robotsUrlVerdict): group selection
    // (specific bot group eclipses `*`, case-folded token), wildcard/
    // anchor path patterns compiled to LIKE-with-escape, longest-match
    // precedence with allow-wins ties — the robots fixture plants a
    // length tie, a $-anchored disallow over a shorter allow, an empty
    // Disallow, and a robots-less subdomain branch
    "q241_robots_url_verdict" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Web.robotsUrlVerdict(docs.select(col("doc_id"), synthUrl.as("url")),
        Web.robotsRules(robotsPathDocs(docs)))
    }),
    // the governance sweep with the URL-LEVEL robots gate chained in
    // (q238 + q241): RFC 9309 path verdicts slot between the legal
    // opt-out registry and the content gates — `robots_blocked` docs
    // must not reach the license/PII/readability reports
    "q242_governance_robots" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val base = Quality.injectLicenses(docs)
        .join(docs.select(col("doc_id"), synthUrl.as("url")), Seq("doc_id"))
        .select(col("doc_id"), col("url"),
          when(pmod(col("doc_id"), lit(11)) === 0,
            concat(col("text"), lit(" contact user"),
              col("doc_id").cast("string"), lit("@example.com now")))
            .otherwise(col("text")).as("text"))
      Pipeline.governanceSweep(base, optOutRegistry(docs),
        robotsRules = Some(Web.robotsRules(robotsPathDocs(docs))))
    }))

  val oracleSql: Map[String, String] = Map(
    "q114_url_canon" ->
      """WITH u AS (SELECT doc_id,
        |  CASE CAST(doc_id % 4 AS INT)
        |    WHEN 0 THEN 'HTTP://WWW.' || source || '.Example.COM:80/A/B/'
        |      || CAST(doc_id AS VARCHAR) || '/?utm_source=feed&b=2&a=1#frag'
        |    WHEN 1 THEN 'https://' || source
        |      || '.example.com:8443/x?z=9&fbclid=XYZ&y=8&utm_medium=m'
        |    WHEN 2 THEN 'HTTPS://Sub.' || source || '.Example.com:443/only/Path/'
        |    ELSE 'http://' || source || '.example.com/?q='
        |      || CAST(doc_id AS VARCHAR) || '&ref=abc'
        |  END url FROM documents),
        |p AS (SELECT doc_id, url,
        |  lower(regexp_extract(url, '^([^:/?#]+)://', 1)) scheme,
        |  regexp_replace(lower(regexp_extract(url, '^[^:/?#]+://([^/?#]*)', 1)),
        |    '^www\.', '') auth,
        |  regexp_replace(regexp_extract(url, '^[^:/?#]+://[^/?#]*([^?#]*)', 1),
        |    '/+$', '') path,
        |  regexp_extract(url, '^[^#?]*\?([^#]*)', 1) q
        | FROM u),
        |h AS (SELECT doc_id, url, scheme, path,
        |  CASE WHEN scheme = 'http' THEN regexp_replace(auth, ':80$', '')
        |       WHEN scheme = 'https' THEN regexp_replace(auth, ':443$', '')
        |       ELSE auth END host,
        |  list_sort(list_filter(string_split(q, '&'), x -> x <> ''
        |    AND NOT regexp_matches(x, '^(utm_[^=]*|fbclid|gclid|mc_eid|ref)(=.*)?$'))) ps
        | FROM p)
        |SELECT doc_id, url,
        |  scheme || '://' || host || path ||
        |    CASE WHEN len(ps) > 0 THEN '?' || array_to_string(ps, '&') ELSE '' END url_canon,
        |  host
        |FROM h""".stripMargin,
    "q115_domain_cap" ->
      """SELECT doc_id, source, rk FROM (
        |  SELECT doc_id, source, row_number() OVER (PARTITION BY source
        |      ORDER BY substr(md5(CAST(doc_id AS VARCHAR) || 's7'), 1, 8), doc_id) rk
        |  FROM documents)
        |WHERE rk <= 25""".stripMargin,
    "q145_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment,
        |  CAST(COUNT(*) AS BIGINT) class_size,
        |  COUNT(*) >= 10 k_anonymous
        |FROM customer GROUP BY 1, 2""".stripMargin,
    "q151_l_diversity" ->
      """SELECT c_nationkey, c_mktsegment,
        |  CAST(COUNT(*) AS BIGINT) class_size,
        |  CAST(COUNT(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT))
        |    AS BIGINT) distinct_sensitive,
        |  COUNT(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT)) >= 3
        |    l_diverse
        |FROM customer GROUP BY 1, 2""".stripMargin,
    "q153_t_closeness" ->
      """WITH base AS (
        |  SELECT c_nationkey, c_mktsegment,
        |         CAST(floor(c_acctbal / 1000.0) AS BIGINT) v
        |  FROM customer),
        |g AS (SELECT v, CAST(COUNT(*) AS BIGINT) cnt_g FROM base GROUP BY 1),
        |tot AS (SELECT CAST(SUM(cnt_g) AS BIGINT) n,
        |               CAST(COUNT(*) AS BIGINT) m FROM g),
        |gcum AS (SELECT v, CAST(SUM(cnt_g) OVER (ORDER BY v) AS BIGINT) cum_g
        |         FROM g),
        |cls AS (SELECT c_nationkey, c_mktsegment,
        |               CAST(COUNT(*) AS BIGINT) class_size
        |        FROM base GROUP BY 1, 2),
        |cc AS (SELECT c_nationkey, c_mktsegment, v,
        |              CAST(COUNT(*) AS BIGINT) cnt_c
        |       FROM base GROUP BY 1, 2, 3),
        |cum AS (SELECT cls.c_nationkey, cls.c_mktsegment, cls.class_size,
        |               gcum.v, gcum.cum_g,
        |               CAST(SUM(COALESCE(cc.cnt_c, 0)) OVER (
        |                 PARTITION BY cls.c_nationkey, cls.c_mktsegment
        |                 ORDER BY gcum.v) AS BIGINT) cum_c
        |        FROM cls CROSS JOIN gcum
        |        LEFT JOIN cc ON cc.c_nationkey = cls.c_nationkey
        |                    AND cc.c_mktsegment = cls.c_mktsegment
        |                    AND cc.v = gcum.v),
        |d AS (SELECT c_nationkey, c_mktsegment, class_size,
        |             CAST(SUM(ABS((1000000 * cum_c) // class_size
        |                        - (1000000 * cum_g) // n)) AS BIGINT) s,
        |             MAX(m) m
        |      FROM cum CROSS JOIN tot GROUP BY 1, 2, 3)
        |SELECT c_nationkey, c_mktsegment, class_size,
        |       CAST(CASE WHEN m <= 1 THEN 0 ELSE s // (m - 1) END
        |         AS BIGINT) emd_ppm,
        |       CAST(CASE WHEN m <= 1 THEN 0 ELSE s // (m - 1) END
        |         AS BIGINT) <= 200000 t_close
        |FROM d""".stripMargin,
    "q176_blocklist" -> blocklistOracleSql,
    // Luhn replay: same regex string (which itself enforces 13-19
    // digits), translate-strip,
    // mod-10 fold as a list comprehension over generate_series
    "q204_luhn_audit" ->
      """WITH injected AS (
        |  SELECT doc_id, concat_ws(' ', substring(text, 1, 30),
        |    'card 4111 1111 1111 1111 and 4111111111111112 ref',
        |    concat('55-', lpad(CAST(doc_id % 100000000 AS VARCHAR), 8, '0'),
        |      '-', lpad(CAST((doc_id * 7) % 100000000 AS VARCHAR), 8, '0')),
        |    'zip 12345', substring(text, 31, 1000000)) AS text
        |  FROM documents),
        |cands AS (
        |  SELECT doc_id,
        |    [translate(r, ' -', '') FOR r IN
        |      regexp_extract_all(text, '[0-9](?:[- ]?[0-9]){12,18}')] AS cs
        |  FROM injected),
        |ex AS (SELECT doc_id, generate_subscripts(cs, 1) - 1 AS cand_idx,
        |  unnest(cs) AS d FROM cands)
        |SELECT doc_id, CAST(cand_idx AS BIGINT) AS cand_idx,
        |  CAST(length(d) AS BIGINT) AS n_digits,
        |  repeat('*', length(d) - 4) || substring(d, length(d) - 3, 4) AS masked,
        |  (list_sum([CASE WHEN ((length(d) - i) % 2) = 1
        |     THEN CASE WHEN 2 * (ascii(substring(d, i, 1)) - 48) > 9
        |       THEN 2 * (ascii(substring(d, i, 1)) - 48) - 9
        |       ELSE 2 * (ascii(substring(d, i, 1)) - 48) END
        |     ELSE ascii(substring(d, i, 1)) - 48 END
        |   FOR i IN generate_series(1, length(d))]) % 10) = 0 AS luhn_valid
        |FROM ex""".stripMargin,
    // license replay: same injection, same regex strings, same
    // precedence CASE
    "q213_license_census" ->
      """WITH injected AS (SELECT doc_id, concat_ws(' ',
        |    substring(text, 1, 20),
        |    CASE doc_id % 5
        |      WHEN 0 THEN 'SPDX-License-Identifier: MIT (not the GNU General Public License)'
        |      WHEN 1 THEN 'SPDX-License-Identifier: GPL-3.0-only'
        |      WHEN 2 THEN 'under the GNU General Public License; MIT License text follows'
        |      WHEN 3 THEN 'licensed under the Apache License, Version 2.0'
        |      ELSE '' END,
        |    substring(text, 21, 1000000)) AS text
        |  FROM documents),
        |m AS (SELECT doc_id,
        |    regexp_extract(text,
        |      'SPDX-License-Identifier:[ \t]*([A-Za-z0-9.+-]+)', 1) spdx0,
        |    regexp_matches(text,
        |      '(?i)GNU (Affero |Lesser )?General Public License|\b[AL]?GPL-?[0-9]|\bGPL\b|Creative Commons|\bCC-BY')
        |      has_copyleft,
        |    regexp_matches(text,
        |      '(?i)MIT License|Apache License|BSD [0-9]-Clause|\bISC License|\bUnlicense\b')
        |      has_permissive
        |  FROM injected)
        |SELECT doc_id,
        |  CASE WHEN spdx0 = '' THEN NULL ELSE spdx0 END spdx_id,
        |  has_copyleft, has_permissive,
        |  CASE WHEN spdx0 <> '' THEN
        |      CASE WHEN regexp_matches(upper(spdx0),
        |          '^(A?GPL|LGPL|CC-BY-SA|EUPL|MPL)') THEN 'copyleft'
        |        WHEN regexp_matches(upper(spdx0),
        |          '^(MIT|APACHE|BSD|ISC|UNLICENSE|ZLIB|CC0)') THEN 'permissive'
        |        ELSE 'other-spdx' END
        |    WHEN has_copyleft THEN 'copyleft'
        |    WHEN has_permissive THEN 'permissive'
        |    ELSE 'none' END license_class
        |FROM m""".stripMargin,
    // opt-out replay: the q114 url/host derivation, dot-suffix explode
    // (port stripped first), the md5-gated registry, longest-match by
    // (length desc, domain asc), left join back so kept docs survive
    "q216_domain_optout" ->
      """WITH u AS (SELECT doc_id,
        |  CASE CAST(doc_id % 4 AS INT)
        |    WHEN 0 THEN 'HTTP://WWW.' || source || '.Example.COM:80/A/B/'
        |      || CAST(doc_id AS VARCHAR) || '/?utm_source=feed&b=2&a=1#frag'
        |    WHEN 1 THEN 'https://' || source
        |      || '.example.com:8443/x?z=9&fbclid=XYZ&y=8&utm_medium=m'
        |    WHEN 2 THEN 'HTTPS://Sub.' || source || '.Example.com:443/only/Path/'
        |    ELSE 'http://' || source || '.example.com/?q='
        |      || CAST(doc_id AS VARCHAR) || '&ref=abc'
        |  END url FROM documents),
        |p AS (SELECT doc_id,
        |  lower(regexp_extract(url, '^([^:/?#]+)://', 1)) scheme,
        |  regexp_replace(lower(regexp_extract(url, '^[^:/?#]+://([^/?#]*)', 1)),
        |    '^www\.', '') auth FROM u),
        |h AS (SELECT doc_id,
        |  CASE WHEN scheme = 'http' THEN regexp_replace(auth, ':80$', '')
        |       WHEN scheme = 'https' THEN regexp_replace(auth, ':443$', '')
        |       ELSE auth END host FROM p),
        |l AS (SELECT doc_id, host,
        |  string_split(regexp_replace(host, ':[0-9]+$', ''), '.') lbl FROM h),
        |s AS (SELECT doc_id, array_to_string(lbl[i:], '.') sfx
        |  FROM (SELECT doc_id, lbl, unnest(range(1, len(lbl))) i
        |        FROM l WHERE len(lbl) >= 2)),
        |srcs AS (SELECT DISTINCT source FROM documents),
        |reg AS (SELECT source || '.example.com' "domain" FROM srcs
        |    WHERE substring(md5(source), 1, 1) < '8'
        |  UNION ALL
        |  SELECT 'sub.' || source || '.example.com' FROM srcs
        |    WHERE substring(md5(source), 1, 1) < '4'),
        |m AS (SELECT doc_id, "domain" FROM (
        |    SELECT s.doc_id, r."domain", row_number() OVER (PARTITION BY s.doc_id
        |      ORDER BY length(r."domain") DESC, r."domain" ASC) rn
        |    FROM s JOIN reg r ON s.sfx = r."domain") WHERE rn = 1)
        |SELECT h.doc_id, h.host, m."domain" optout_domain,
        |  m."domain" IS NULL kept
        |FROM h LEFT JOIN m USING (doc_id)""".stripMargin,
    // audit replay: the q216 verdict rolled up per registry domain,
    // zero-hit entries kept via the left join ("domain" is a DuckDB
    // reserved word — quoted throughout, like cluster/off)
    "q217_optout_audit" ->
      """WITH u AS (SELECT doc_id,
        |  CASE CAST(doc_id % 4 AS INT)
        |    WHEN 0 THEN 'HTTP://WWW.' || source || '.Example.COM:80/A/B/'
        |      || CAST(doc_id AS VARCHAR) || '/?utm_source=feed&b=2&a=1#frag'
        |    WHEN 1 THEN 'https://' || source
        |      || '.example.com:8443/x?z=9&fbclid=XYZ&y=8&utm_medium=m'
        |    WHEN 2 THEN 'HTTPS://Sub.' || source || '.Example.com:443/only/Path/'
        |    ELSE 'http://' || source || '.example.com/?q='
        |      || CAST(doc_id AS VARCHAR) || '&ref=abc'
        |  END url FROM documents),
        |p AS (SELECT doc_id,
        |  lower(regexp_extract(url, '^([^:/?#]+)://', 1)) scheme,
        |  regexp_replace(lower(regexp_extract(url, '^[^:/?#]+://([^/?#]*)', 1)),
        |    '^www\.', '') auth FROM u),
        |h AS (SELECT doc_id,
        |  CASE WHEN scheme = 'http' THEN regexp_replace(auth, ':80$', '')
        |       WHEN scheme = 'https' THEN regexp_replace(auth, ':443$', '')
        |       ELSE auth END host FROM p),
        |l AS (SELECT doc_id, host,
        |  string_split(regexp_replace(host, ':[0-9]+$', ''), '.') lbl FROM h),
        |s AS (SELECT doc_id, array_to_string(lbl[i:], '.') sfx
        |  FROM (SELECT doc_id, lbl, unnest(range(1, len(lbl))) i
        |        FROM l WHERE len(lbl) >= 2)),
        |srcs AS (SELECT DISTINCT source FROM documents),
        |reg AS (SELECT source || '.example.com' "domain" FROM srcs
        |    WHERE substring(md5(source), 1, 1) < '8'
        |  UNION ALL
        |  SELECT 'sub.' || source || '.example.com' FROM srcs
        |    WHERE substring(md5(source), 1, 1) < '4'),
        |m AS (SELECT doc_id, "domain" FROM (
        |    SELECT s.doc_id, r."domain", row_number() OVER (PARTITION BY s.doc_id
        |      ORDER BY length(r."domain") DESC, r."domain" ASC) rn
        |    FROM s JOIN reg r ON s.sfx = r."domain") WHERE rn = 1)
        |SELECT reg."domain", CAST(COALESCE(c.n, 0) AS BIGINT) n_dropped
        |FROM reg LEFT JOIN (SELECT "domain", COUNT(*) n FROM m GROUP BY 1) c
        |  USING ("domain")""".stripMargin,
    // robots parse replay: fixture synthesis, line split, directive
    // regexes, lag + conditional running sum for group runs, rules
    // joined to every agent of their run
    "q221_robots_rules" ->
      ("WITH " + robotsParseCte + """
        |SELECT host, agent, "rule", "value", pos FROM rules""".stripMargin),
    // robots->opt-out composition replay: the q221 rules, the derived
    // full-opt-out registry, then the q216 suffix/longest-match
    // machinery against the synthesized crawl URLs
    "q222_robots_optout" ->
      ("WITH " + robotsParseCte + """,
        |reg AS (SELECT DISTINCT host "domain" FROM rules
        |  WHERE (agent = '*' OR agent = 'graftbot')
        |    AND "rule" = 'disallow' AND "value" = '/'),
        |u AS (SELECT doc_id,
        |  CASE CAST(doc_id % 4 AS INT)
        |    WHEN 0 THEN 'HTTP://WWW.' || source || '.Example.COM:80/A/B/'
        |      || CAST(doc_id AS VARCHAR) || '/?utm_source=feed&b=2&a=1#frag'
        |    WHEN 1 THEN 'https://' || source
        |      || '.example.com:8443/x?z=9&fbclid=XYZ&y=8&utm_medium=m'
        |    WHEN 2 THEN 'HTTPS://Sub.' || source || '.Example.com:443/only/Path/'
        |    ELSE 'http://' || source || '.example.com/?q='
        |      || CAST(doc_id AS VARCHAR) || '&ref=abc'
        |  END url FROM documents),
        |p AS (SELECT doc_id,
        |  lower(regexp_extract(url, '^([^:/?#]+)://', 1)) scheme,
        |  regexp_replace(lower(regexp_extract(url, '^[^:/?#]+://([^/?#]*)', 1)),
        |    '^www\.', '') auth FROM u),
        |hh AS (SELECT doc_id,
        |  CASE WHEN scheme = 'http' THEN regexp_replace(auth, ':80$', '')
        |       WHEN scheme = 'https' THEN regexp_replace(auth, ':443$', '')
        |       ELSE auth END host FROM p),
        |lb AS (SELECT doc_id, host,
        |  string_split(regexp_replace(host, ':[0-9]+$', ''), '.') lbl
        |  FROM hh),
        |sx AS (SELECT doc_id, array_to_string(lbl[i:], '.') sfx
        |  FROM (SELECT doc_id, lbl, unnest(range(1, len(lbl))) i
        |        FROM lb WHERE len(lbl) >= 2)),
        |m AS (SELECT doc_id, "domain" FROM (
        |    SELECT sx.doc_id, r."domain", row_number() OVER (
        |      PARTITION BY sx.doc_id
        |      ORDER BY length(r."domain") DESC, r."domain" ASC) rn
        |    FROM sx JOIN reg r ON sx.sfx = r."domain") WHERE rn = 1)
        |SELECT hh.doc_id, hh.host, m."domain" optout_domain,
        |  m."domain" IS NULL kept
        |FROM hh LEFT JOIN m USING (doc_id)""".stripMargin),
    // governance-sweep replay: the q216 url/suffix/registry chain, the
    // q213 census, the q48 PII patterns, and the readability chain all
    // over ONE injected base, folded by the precedence CASE
    "q238_governance_pipeline" ->
      ("WITH " + govSweepCtes + """
        |SELECT h.doc_id, h.host, m."domain" optout_domain,
        |  lcv.spdx_id, lcv.license_class, CAST(fr.fre AS BIGINT) fre_milli,
        |  pii.has_pii,
        |  CASE WHEN m."domain" IS NOT NULL THEN 'opted_out'
        |       WHEN lcv.license_class IN ('copyleft', 'other-spdx')
        |         THEN 'license'
        |       WHEN pii.has_pii THEN 'pii'
        |       WHEN fr.fre IS NULL OR fr.fre < 30000 THEN 'unreadable'
        |       ELSE 'keep' END verdict,
        |  CASE WHEN m."domain" IS NOT NULL THEN FALSE
        |       WHEN lcv.license_class IN ('copyleft', 'other-spdx')
        |         THEN FALSE
        |       WHEN pii.has_pii THEN FALSE
        |       WHEN fr.fre IS NULL OR fr.fre < 30000 THEN FALSE
        |       ELSE TRUE END kept
        |FROM h LEFT JOIN m USING (doc_id)
        |  JOIN lcv USING (doc_id) JOIN fr USING (doc_id)
        |  JOIN pii USING (doc_id)""".stripMargin),
    // per-URL robots verdict replay: the path-pattern fixture, the
    // parse chain, group selection (bool_or(spec) per host), the same
    // LIKE-with-escape pattern compile, and the longest-match /
    // allow-wins fold as a row_number over (NULLs-last, length DESC,
    // rule ASC, value ASC)
    "q241_robots_url_verdict" ->
      ("""WITH u AS (SELECT doc_id,
        |  CASE CAST(doc_id % 4 AS INT)
        |    WHEN 0 THEN 'HTTP://WWW.' || source || '.Example.COM:80/A/B/'
        |      || CAST(doc_id AS VARCHAR) || '/?utm_source=feed&b=2&a=1#frag'
        |    WHEN 1 THEN 'https://' || source
        |      || '.example.com:8443/x?z=9&fbclid=XYZ&y=8&utm_medium=m'
        |    WHEN 2 THEN 'HTTPS://Sub.' || source || '.Example.com:443/only/Path/'
        |    ELSE 'http://' || source || '.example.com/?q='
        |      || CAST(doc_id AS VARCHAR) || '&ref=abc'
        |  END url FROM documents),
        |""".stripMargin + robotsUrlVerdictCte + """
        |SELECT doc_id, host, target, matched_rule, matched_pattern,
        |  allowed
        |FROM rvd""".stripMargin),
    // robots-chained governance replay: the q238 CTEs, the q241 robots
    // verdict CTEs riding the same base urls, and the widened
    // precedence CASE (opted_out > robots_blocked > license > pii >
    // unreadable > keep)
    "q242_governance_robots" ->
      ("WITH " + govSweepCtes + """,
        |u AS (SELECT doc_id, url FROM base),
        |""".stripMargin + robotsUrlVerdictCte + """
        |SELECT h.doc_id, h.host, m."domain" optout_domain,
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
        |  JOIN pii USING (doc_id) JOIN rvd USING (doc_id)""".stripMargin))
}
