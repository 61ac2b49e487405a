package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.Web
import graft.sources

/** WARC/WET ingestion domain registry (q239/q240/q244/q245): the
  * self-contained exchange-format roundtrips, each query next to its
  * DuckDB oracle (the per-domain layout the round-14 verdict asked the
  * monolithic SparkEntry maps to migrate toward). The governance- and
  * boilerplate-composed WARC queries (q246/q248) stay in SparkEntry —
  * their oracles share the governance/boilerplate CTE chains with
  * non-WARC queries. `synthUrl` stays in SparkEntry (shared with the
  * q114 family) and is referenced private[graft]-qualified. */
private[graft] object WarcRegistry {

  private def synthUrl = graft.SparkEntry.synthUrl

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // WARC/WET roundtrip (sources/Warc): a deterministic documents slice
    // is written as Common-Crawl-shaped WET files (per-record gzip
    // members, warcinfo leader, strict record grammar) and read back
    // through the member-walk parser; the oracle computes the same
    // aggregate straight from parquet, so any drift through the gzip
    // codec, record framing, header parse, or UTF-8 text decode breaks
    // the hash (the q113 Avro pattern)
    "q239_wet_roundtrip" -> ((s, d) => {
      val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft_wet_q239").getAbsolutePath
      val slice = Tables.documents(s, d).where(col("doc_id") % 3 === 0)
        .select(col("doc_id"),
          concat(lit("https://"), col("source"), lit(".example.com/doc/"),
            col("doc_id").cast("string")).as("uri"),
          concat(lit("2026-01-0"), ((col("doc_id") % 9) + 1).cast("string"),
            lit("T00:00:00Z")).as("date"),
          coalesce(col("text"), lit("")).as("text"))
      sources.Warc.writeWet(slice, dir, perFile = 50)
      sources.Warc.readWet(s, s"$dir/*.warc.wet.gz")
        .select(regexp_extract(col("target_uri"), "/doc/([0-9]+)$", 1)
          .cast("long").as("doc_id"),
          col("target_uri"), col("warc_date"), col("text"))
        .groupBy((col("doc_id") % 10).as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).as("sum_ids"),
          sum(octet_length(col("text"))).as("sum_octets"),
          min(col("target_uri")).as("first_uri"),
          max(col("warc_date")).as("last_date"))
    }),
    // WET -> URL canonicalization end-to-end (the crawl front door): the
    // q114 messy-surface-form synthesis rides WARC-Target-URI through
    // real WET bytes, and the read-back URIs feed Web.canonicalizeUrls;
    // the oracle re-derives the canonical form from parquet with the
    // q114 DuckDB chain — bytes-level framing AND string-level
    // canonicalization must both hold for the hash to match
    "q240_wet_url_canon" -> ((s, d) => {
      val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft_wet_q240").getAbsolutePath
      val docs = Tables.documents(s, d)
      sources.Warc.writeWet(
        docs.select(col("doc_id"), synthUrl.as("uri"),
          lit("2026-01-02T03:04:05Z").as("date"),
          coalesce(col("text"), lit("")).as("text")),
        dir, perFile = 100)
      val back = sources.Warc.readWet(s, s"$dir/*.warc.wet.gz")
      Web.canonicalizeUrls(back.select(col("target_uri").as("url")))
        .groupBy(col("url_canon"), col("host"))
        .agg(count(lit(1)).as("n_docs"), min(col("url")).as("first_url"))
    }),
    // raw-WARC HTTP census (sources/Warc.writeResponses -> read ->
    // httpResponses): response records with real HTTP/1.1 payloads ride
    // the member walk, the payload parser splits status line / headers /
    // body, and the census rolls up by (status, content-type) — framing,
    // HTTP grammar, ISO-8859-1 header decode, and body octets all
    // hash-gated against the parquet-derived oracle
    "q244_warc_http_census" -> ((s, d) => {
      val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft_warc_q244").getAbsolutePath
      val slice = Tables.documents(s, d).where(col("doc_id") % 2 === 0)
        .select(col("doc_id"),
          concat(lit("https://"), col("source"), lit(".example.com/page/"),
            col("doc_id").cast("string")).as("uri"),
          lit("2026-03-04T05:06:07Z").as("date"),
          (lit(200) + (col("doc_id") % 3) * 102).cast("long").as("status"),
          when(col("doc_id") % 4 === 0, lit("text/html; charset=utf-8"))
            .otherwise(lit("text/plain")).as("ctype"),
          coalesce(col("text"), lit("")).as("text"))
      sources.Warc.writeResponses(slice, dir, perFile = 64)
      sources.Warc.httpResponses(sources.Warc.read(s, s"$dir/*.warc.gz"))
        .groupBy(col("http_status"), col("http_content_type"))
        .agg(count(lit(1)).as("n_resp"),
          sum(octet_length(col("body"))).as("sum_octets"),
          min(col("target_uri")).as("first_uri"),
          sum(when(col("http_ok"), 1L).otherwise(0L)).as("n_ok"))
    }),
    // CDX sidecar derivation (sources/Warc.cdxIndex): the split index a
    // 100 TB WARC reader distributes on — canonical urlkey (the q114
    // chain over messy synthUrl surface forms), containing file, block
    // length; member_offset stays spec-tested (gzip byte offsets are
    // not DuckDB-derivable)
    "q245_cdx_index" -> ((s, d) => {
      val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft_wet_q245").getAbsolutePath
      val docs = Tables.documents(s, d)
      sources.Warc.writeWet(
        docs.select(col("doc_id"), synthUrl.as("uri"),
          lit("2026-01-02T03:04:05Z").as("date"),
          coalesce(col("text"), lit("")).as("text")),
        dir, perFile = 100)
      sources.Warc.cdxIndex(sources.Warc.read(s, s"$dir/*.warc.wet.gz"))
        .select(col("urlkey"), col("warc_date"), col("file"),
          col("content_length"))
    }))

  val oracleSql: Map[String, String] = Map(
    // WET roundtrip: the same slice/synthesis straight from parquet —
    // matching means the gzip members, record framing, header parse,
    // and UTF-8 decode were all lossless (strlen = BYTE length in
    // DuckDB, pairing Spark's octet_length)
    "q239_wet_roundtrip" ->
      """WITH w AS (SELECT doc_id,
        |  'https://' || source || '.example.com/doc/'
        |    || CAST(doc_id AS VARCHAR) uri,
        |  '2026-01-0' || CAST((doc_id % 9) + 1 AS VARCHAR)
        |    || 'T00:00:00Z' dt,
        |  COALESCE(text, '') body
        | FROM documents WHERE doc_id % 3 = 0)
        |SELECT doc_id % 10 bucket, COUNT(*) n_docs,
        |  CAST(SUM(doc_id) AS BIGINT) sum_ids,
        |  CAST(SUM(strlen(body)) AS BIGINT) sum_octets,
        |  MIN(uri) first_uri, MAX(dt) last_date
        |FROM w GROUP BY 1""".stripMargin,
    // WET -> canonicalization: the q114 DuckDB chain, grouped on the
    // canonical form (branches %4 in {1,2} collapse per source, the
    // doc_id-bearing branches stay singletons)
    "q240_wet_url_canon" ->
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
        |p AS (SELECT url,
        |  lower(regexp_extract(url, '^([^:/?#]+)://', 1)) scheme,
        |  regexp_replace(lower(regexp_extract(url, '^[^:/?#]+://([^/?#]*)', 1)),
        |    '^www\.', '') auth,
        |  regexp_replace(regexp_extract(url, '^[^:/?#]+://[^/?#]*([^?#]*)', 1),
        |    '/+$', '') path,
        |  regexp_extract(url, '^[^#?]*\?([^#]*)', 1) q
        | FROM u),
        |h AS (SELECT url, scheme, path,
        |  CASE WHEN scheme = 'http' THEN regexp_replace(auth, ':80$', '')
        |       WHEN scheme = 'https' THEN regexp_replace(auth, ':443$', '')
        |       ELSE auth END host,
        |  list_sort(list_filter(string_split(q, '&'), x -> x <> ''
        |    AND NOT regexp_matches(x, '^(utm_[^=]*|fbclid|gclid|mc_eid|ref)(=.*)?$'))) ps
        | FROM p),
        |c AS (SELECT url, host,
        |  scheme || '://' || host || path ||
        |    CASE WHEN len(ps) > 0 THEN '?' || array_to_string(ps, '&')
        |         ELSE '' END url_canon
        | FROM h)
        |SELECT url_canon, host, COUNT(*) n_docs, MIN(url) first_url
        |FROM c GROUP BY 1, 2""".stripMargin,
    // raw-WARC census replay: the same slice/status/ctype synthesis
    // straight from parquet — matching means record framing, the HTTP
    // payload grammar, and the body byte passthrough were all lossless
    "q244_warc_http_census" ->
      """WITH w AS (SELECT doc_id,
        |  'https://' || source || '.example.com/page/'
        |    || CAST(doc_id AS VARCHAR) uri,
        |  200 + (doc_id % 3) * 102 st,
        |  CASE WHEN doc_id % 4 = 0 THEN 'text/html; charset=utf-8'
        |       ELSE 'text/plain' END ct,
        |  COALESCE(text, '') body
        | FROM documents WHERE doc_id % 2 = 0)
        |SELECT CAST(st AS BIGINT) http_status, ct http_content_type,
        |  COUNT(*) n_resp, CAST(SUM(strlen(body)) AS BIGINT) sum_octets,
        |  MIN(uri) first_uri, CAST(COUNT(*) AS BIGINT) n_ok
        |FROM w GROUP BY 1, 2""".stripMargin,
    // CDX replay: the q240 canonicalization chain per doc, the writer's
    // deterministic file assignment (id div 100 -> wet-%05d), and the
    // UTF-8 block length
    "q245_cdx_index" ->
      """WITH u AS (SELECT doc_id,
        |  CASE CAST(doc_id % 4 AS INT)
        |    WHEN 0 THEN 'HTTP://WWW.' || source || '.Example.COM:80/A/B/'
        |      || CAST(doc_id AS VARCHAR) || '/?utm_source=feed&b=2&a=1#frag'
        |    WHEN 1 THEN 'https://' || source
        |      || '.example.com:8443/x?z=9&fbclid=XYZ&y=8&utm_medium=m'
        |    WHEN 2 THEN 'HTTPS://Sub.' || source || '.Example.com:443/only/Path/'
        |    ELSE 'http://' || source || '.example.com/?q='
        |      || CAST(doc_id AS VARCHAR) || '&ref=abc'
        |  END url,
        |  strlen(COALESCE(text, '')) blen
        |  FROM documents),
        |p AS (SELECT doc_id, blen, url,
        |  lower(regexp_extract(url, '^([^:/?#]+)://', 1)) scheme,
        |  regexp_replace(lower(regexp_extract(url, '^[^:/?#]+://([^/?#]*)', 1)),
        |    '^www\.', '') auth,
        |  regexp_replace(regexp_extract(url, '^[^:/?#]+://[^/?#]*([^?#]*)', 1),
        |    '/+$', '') path,
        |  regexp_extract(url, '^[^#?]*\?([^#]*)', 1) q
        | FROM u),
        |h AS (SELECT doc_id, blen, scheme, path,
        |  CASE WHEN scheme = 'http' THEN regexp_replace(auth, ':80$', '')
        |       WHEN scheme = 'https' THEN regexp_replace(auth, ':443$', '')
        |       ELSE auth END host,
        |  list_sort(list_filter(string_split(q, '&'), x -> x <> ''
        |    AND NOT regexp_matches(x, '^(utm_[^=]*|fbclid|gclid|mc_eid|ref)(=.*)?$'))) ps
        | FROM p)
        |SELECT scheme || '://' || host || path ||
        |    CASE WHEN len(ps) > 0 THEN '?' || array_to_string(ps, '&')
        |         ELSE '' END urlkey,
        |  '2026-01-02T03:04:05Z' warc_date,
        |  printf('wet-%05d.warc.wet.gz', doc_id // 100) "file",
        |  CAST(blen AS BIGINT) content_length
        |FROM h""".stripMargin)
}
