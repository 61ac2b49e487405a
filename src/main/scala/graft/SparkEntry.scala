package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.expr.Exprs
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator claimed in SURVEY.md §2 (plus the training-data-pipeline
  * extensions) appears here as a named query; `oracleSql` carries the
  * DuckDB-equivalent ANSI SQL the driver hash-compares against. Column
  * names and values are engineered to be bit-identical across engines —
  * see ops/Relational.scala header for the determinism rules.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's core semantics in one plan: parse-shaped facts,
    * broadcast LEFT dim join, NULL-propagating derived columns
    * (reference pipeline/app.py:60-76). */
  def entry(spark: SparkSession): DataFrame =
    enrichQuery(spark, "/root/testdata/sf0.001")

  // ------------------------------------------------------------ helpers

  /** Facts/dim mapping used by q02: lineitem as the engagement fact stream,
    * part as the content dimension (SURVEY.md §7.2 step 2). NULL paths are
    * injected deterministically so the reference's NULL rules
    * (README.md:91-92) are exercised by the oracle, and l_linenumber=7
    * rows get an unmatched content_id to exercise the LEFT join. */
  private def enrichQuery(spark: SparkSession, dir: String): DataFrame = {
    val facts = Tables.lineitem(spark, dir).select(
      col("l_orderkey"), col("l_linenumber"),
      (col("l_partkey") + when(col("l_linenumber") === 7, 1000000L).otherwise(0L))
        .cast("string").as("content_id"),
      when(col("l_returnflag") === "N", lit(null))
        .otherwise(floor(col("l_quantity") * 60000).cast("int")).as("duration_ms"))
    val dim = Tables.part(spark, dir).select(
      col("p_partkey").cast("string").as("content_id"),
      col("p_brand").as("content_type"),
      when(col("p_size") % 7 === 0, lit(null))
        .otherwise((col("p_size") * 60).cast("int")).as("length_seconds"))
    Enrich.enrich(facts, dim).select(
      col("l_orderkey"), col("l_linenumber"), col("content_id"), col("content_type"),
      col("duration_ms"), col("length_seconds"),
      col("engagement_seconds"), col("engagement_pct"))
  }

  /** CDC roundtrip for q01: rebuild a Debezium-shaped envelope from the
    * events table (wrapped for even ids, bare for odd — both parse paths
    * hot), then run the production parser over it. The oracle recomputes
    * the expected projection directly. */
  private def cdcQuery(spark: SparkSession, dir: String): DataFrame = {
    val after = to_json(struct(
      col("event_id").as("id"),
      col("user_id").cast("string").as("content_id"),
      (col("event_id") % 97).cast("string").as("user_id"),
      col("event_type").as("event_type"),
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("event_ts"),
      floor(col("value") * 1000).cast("int").as("duration_ms"),
      col("event_type").as("device"),
      col("props").as("raw_payload")))
    val enveloped = Tables.events(spark, dir)
      .select(Parse.asEnvelope(after, col("event_id")).as("json"))
    Parse.cdcEvents(enveloped)
  }

  /** Top-1 assertion for the planted ANN probes (q28/q36): each probe id
    * is its source vector's id + offset; the rank-1 neighbor must BE the
    * source. A probe with an empty result emits no row at all, so a
    * bucketing/probing regression fails the oracle on row count, not just
    * on a boolean. */
  /** In-plan SFT transcript synthesis for q167–q169 (the planted-class
    * discipline): doc_id % 4 + 2 turns whose contents are 4-token
    * slices of the doc text; doc_id % 3 == 0 opens with a system turn,
    * the rest alternate user/assistant; doc_id % 19 == 0 NULLs turn 1's
    * role (the NULL-role contract class — render/mask/pack drop the
    * turn, validate flags it on BOTH engines, round-10 advice);
    * doc_id % 7 == 0 collapses every role to "user" (alternation +
    * ends-with-assistant violations); doc_id % 11 == 0 (and not % 7)
    * empties turn 1 (non-empty-turn violation). Pure column
    * arithmetic — any engine replays it. */
  private[graft] def chatConv(docs: DataFrame): DataFrame = {
    val tk = filter(split(col("text"), "\\s+"), t => length(t) > 0)
    def role(i: Int): Column = {
      val sys = pmod(col("doc_id"), lit(3)) === 0
      when(pmod(col("doc_id"), lit(19)) === 0 && lit(i) === 1,
          lit(null).cast("string"))
        .when(pmod(col("doc_id"), lit(7)) === 0, lit("user"))
        .when(sys && lit(i) === 0, lit("system"))
        .when(pmod(lit(i) - when(sys, 1).otherwise(0), lit(2)) === 0, lit("user"))
        .otherwise(lit("assistant"))
    }
    def content(i: Int): Column =
      when(pmod(col("doc_id"), lit(11)) === 0 &&
        pmod(col("doc_id"), lit(7)) =!= 0 && lit(i) === 1, lit(""))
        .otherwise(array_join(slice(tk, i * 4 + 1, 4), " "))
    val turns5 = array((0 until 5).map(i =>
      struct(role(i).as("role"), content(i).as("content"))): _*)
    docs.select(col("doc_id"),
      slice(turns5, lit(1), (pmod(col("doc_id"), lit(4)) + 2).cast("int"))
        .as("turns"))
  }


  /** The q114 URL synthesis, shared by the governance queries: every
    * canonicalization rule fires, and the four doc_id%4 branches yield
    * hosts `{s}.example.com`, `{s}.example.com:8443` (non-default port
    * kept), and `sub.{s}.example.com`. */
  private[graft] def synthUrl: Column =
    when(col("doc_id") % 4 === 0,
      concat(lit("HTTP://WWW."), col("source"), lit(".Example.COM:80/A/B/"),
        col("doc_id").cast("string"), lit("/?utm_source=feed&b=2&a=1#frag")))
      .when(col("doc_id") % 4 === 1,
        concat(lit("https://"), col("source"),
          lit(".example.com:8443/x?z=9&fbclid=XYZ&y=8&utm_medium=m")))
      .when(col("doc_id") % 4 === 2,
        concat(lit("HTTPS://Sub."), col("source"), lit(".Example.com:443/only/Path/")))
      .otherwise(concat(lit("http://"), col("source"), lit(".example.com/?q="),
        col("doc_id").cast("string"), lit("&ref=abc")))

  /** Per-source robots.txt fixture for the governance queries: every
    * parser rule fires — a rule OUTSIDE any group (ignored), a `*`
    * group whose Disallow flips on md5 hex 1, a comment-bearing Allow,
    * a blank line, a two-agent run (multi-agent group expansion), and
    * a second Disallow flip on md5 hex 2. */
  private[graft] def robotsDocs(docs: DataFrame): DataFrame =
    docs.select(col("source")).distinct().select(
      concat(col("source"), lit(".example.com")).as("host"),
      concat_ws("\n",
        lit("# corpus robots fixture"),
        lit("Crawl-delay: 1"),
        lit("User-agent: *"),
        when(substring(md5(col("source")), 1, 1) < "8", lit("Disallow: /"))
          .otherwise(lit("Disallow: /private")),
        lit("Allow: /public # static assets"),
        lit(""),
        lit("User-agent: graftbot"),
        lit("User-agent: extrabot"),
        // md5(3) < '4': the graftbot group is EMPTY (user-agent lines
        // only) — RFC 9309 still selects it, eclipsing `*` entirely
        when(substring(md5(col("source")), 3, 1) < "4",
          lit("# empty specific group"))
          .otherwise(concat_ws("\n",
            when(substring(md5(col("source")), 2, 1) < "8",
              lit("Disallow: /")).otherwise(lit("Crawl-delay: 5")),
            lit("Disallow: /tmp/")))).as("text"))

  /** Per-source robots fixture for the PER-URL verdict (q241/q242):
    * every RFC 9309 path-matching rule fires against a [[synthUrl]]
    * branch — a wildcard/literal LENGTH TIE (disallow `/A/` + star +
    * slash vs allow `/A/B/`, allow wins), an md5-flipped
    * allow/disallow wildcard on the query
    * branch, a `$`-anchored disallow outranking a shorter allow by
    * length, an empty Disallow (matches nothing), and for the
    * md5-second-hex < '4' hosts a specific `GraftBot` group
    * (case-folded token match) that ECLIPSES the `*` group entirely;
    * the `sub.` branch has no robots host at all (allowed, NULL rule). */
  private[graft] def robotsPathDocs(docs: DataFrame): DataFrame =
    docs.select(col("source")).distinct().select(
      concat(col("source"), lit(".example.com")).as("host"),
      concat_ws("\n",
        lit("# path-pattern fixture"),
        lit("User-agent: *"),
        lit("Disallow: /A/*/"),
        lit("Allow: /A/B/"),
        when(substring(md5(col("source")), 1, 1) < "6",
          lit("Disallow: /x?z=9*")).otherwise(lit("Allow: /x?z=9*")),
        lit("Disallow: /?q=*&ref=abc$"),
        lit("Allow: /?q=1*"),
        when(substring(md5(col("source")), 2, 1) < "4",
          lit("User-agent: GraftBot\nDisallow:\nDisallow: /A/"))
          .when(substring(md5(col("source")), 2, 1) < "8",
            // EMPTY specific group: still eclipses `*` (allow all)
            lit("User-agent: GraftBot"))
          .otherwise(lit("# no specific group"))).as("text"))

  /** Deterministic in-plan opt-out registry over the documents sources:
    * `{s}.example.com` for the md5-first-hex < '8' half (suffix-governs
    * every branch host, ports included) plus `sub.{s}.example.com` for
    * the < '4' quarter — so %4==2 docs of those sources carry TWO
    * matches and exercise the longest-match attribution. */
  private[graft] def optOutRegistry(docs: DataFrame): DataFrame = {
    val srcs = docs.select(col("source")).distinct()
    srcs.where(substring(md5(col("source")), 1, 1) < "8")
      .select(concat(col("source"), lit(".example.com")).as("domain"))
      .unionByName(srcs.where(substring(md5(col("source")), 1, 1) < "4")
        .select(concat(lit("sub."), col("source"), lit(".example.com"))
          .as("domain")))
  }

  // ------------------------------------------------------------ queries

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    baseQueries ++ registry.CrawlRegistry.queries ++
      registry.TokenScriptRegistry.queries ++ registry.WarcRegistry.queries ++
      registry.GraphAnnRegistry.queries ++ registry.VectorRegistry.queries ++
      registry.EvalRegistry.queries ++ registry.SketchRegistry.queries ++
      registry.ClusterRegistry.queries ++ registry.RelationalRegistry.queries ++
      registry.GovernanceRegistry.queries ++ registry.ChatRegistry.queries ++
      registry.MediaRegistry.queries ++ registry.DedupRegistry.queries ++
      registry.QualityRegistry.queries ++ registry.TokenizerRegistry.queries ++
      registry.ContaminationRegistry.queries ++ registry.MixtureRegistry.queries ++ registry.CurationRegistry.queries ++ registry.AnalyticsRegistry.queries

  private def baseQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- reference parity (SURVEY.md §2) ---
    "q01_cdc_parse" -> ((s, d) => cdcQuery(s, d)),
    "q02_enrich" -> ((s, d) => enrichQuery(s, d)),
    "q03_sliding_count" -> ((s, d) =>
      Aggregate.slidingCount(Tables.events(s, d), "user_id", "ts", windowMinutes = 10080)),
    "q04_leaderboard" -> ((s, d) =>
      Aggregate.leaderboard(Tables.events(s, d), "user_id", 10)),
    "q05_recent" -> ((s, d) =>
      Aggregate.recent(Tables.events(s, d), "ts", 5))
  )

  // ------------------------------------------------------------ oracles

  // PII patterns shared verbatim with the Spark side (RE2+Java portable)
  private[graft] val emailPat = Curate.emailPattern
  private[graft] val phonePat = Curate.phonePattern
  // Tokenizer oracle: split on \s+ then drop empty fragments — mirrors
  // TextAnalysis.tokens exactly, including blank text => [] and tab/newline
  // padding (SQL TRIM strips only spaces, so a trim-based formulation
  // produced phantom empty tokens; found by PropertySpec round 2).
  private[graft] val toks =
    "list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')"

  // ascii() alignment note (round-6 advice follow-up): Spark 4's ascii()
  // returns the full CODEPOINT of the first char — probe-verified
  // (ascii('é')=233, ascii('中')=20013), NOT the signed first
  // UTF-8 byte — which is exactly DuckDB's ascii() semantics. The
  // winnow/fingerprint polynomial hashes therefore agree cross-engine
  // and stay non-negative on non-ASCII BMP text with no masking; astral
  // (non-BMP) chars iterate differently (UTF-16 units vs codepoints)
  // and are outside the oracle contract. Pinned by TextAnalysisSpec.


  /** Shared by q49 (min-label propagation) and q77 (large-star/small-star):
    * both must resolve the same pair graph to the same components. */
  /** Shared CTE prefix: q49/q77's verified pair graph expanded to
    * connected-component reachability; q117 extends it with the
    * representative-selection step. */
  private[graft] val dupClustersCte: String =
    """WITH RECURSIVE
      |t AS (
      |  SELECT doc_id, list_distinct(
      |    CASE WHEN len(tk) < 2 THEN [array_to_string(tk, ' ')]
      |         ELSE list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1]) END) sh
      |  FROM (SELECT doc_id,
      |        list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '') tk
      |        FROM documents WHERE doc_id < 60)),
      |p AS (
      |  SELECT doc_a, doc_b FROM (
      |    SELECT a.doc_id doc_a, b.doc_id doc_b,
      |      CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |        / len(list_distinct(a.sh || b.sh)) jaccard
      |    FROM t a, t b WHERE a.doc_id < b.doc_id)
      |  WHERE jaccard >= 0.05),
      |e AS (SELECT doc_a a, doc_b b FROM p UNION SELECT doc_b, doc_a FROM p),
      |reach(node, r) AS (
      |  SELECT a, a FROM e
      |  UNION
      |  SELECT e.b, reach.r FROM reach JOIN e ON e.a = reach.node)""".stripMargin




  /** The q142 unigram-entropy pipeline as a DuckDB CTE chain (planted
    * classes -> token counts -> integer floor-log2 surprisal -> permille
    * normalization in `v`); shared by q142 (the verdict report) and
    * q152 (curriculum packing staged by the same verdicts). */
  /** The q184 merge table — a FIXED, BPE-valid artifact (every merge's
    * output appears as an input only in later-rank merges, the
    * invariant trained tables satisfy and the oracle's replace-all
    * simulation relies on). Fixed rather than trained because the
    * oracle must hold the same literal; the trained-table composition
    * is ChatSpec's round-trip. */
  /** The q187/q197 game schedule: 8 pseudo-policies, a = doc_id%8 vs
    * b = (doc_id div 8)%8, winner by the replayable rule "a wins iff
    * hash48 mod (a+b+2) <= b" (P = (b+1)/(a+b+2) — lower indices are
    * genuinely stronger). */
  /** The q180 preference-pair fixture + validation (Chat
    * .preferencePairs over pairs synthesized in-plan from the chat
    * transcripts: rejected = chosen with the final response TRUNCATED
    * to half (the valid class), %29 mutates a PREFIX turn (prefix
    * violation), %23 leaves the pair identical (tie violation); the
    * %7/%19 transcript classes flow through as ends/NULL-role
    * failures) — shared by q180 and q227's length-bias audit.
    * Slice + concat, NOT an indexed transform: an `i === size(turns)-1`
    * test inside a lambda would capture the whole turns-construction
    * expression (split included) per element — the PlanGuardSpec
    * lambda-cost class; here size() stays row-level. */
  private[graft] def prefPairsFrame(s: SparkSession, d: String): DataFrame = {
    val conv = chatConv(Tables.documents(s, d))
    def role(t: Column) = t.getField("role")
    def content(t: Column) = t.getField("content")
    val n = size(col("turns"))
    val first = element_at(col("turns"), 1)
    val last = element_at(col("turns"), -1)
    val rejected =
      when(pmod(col("doc_id"), lit(29)) === 0,
        concat(
          array(struct(role(first).as("role"),
            concat(content(first), lit("!")).as("content"))),
          slice(col("turns"), lit(2), n - 1)))
      .when(pmod(col("doc_id"), lit(23)) === 0, col("turns"))
      .otherwise(concat(
        slice(col("turns"), lit(1), n - 1),
        array(struct(role(last).as("role"),
          content(last).substr(lit(1),
            floor(length(content(last)) / 2).cast("int")).as("content")))))
    Chat.preferencePairs(conv.select(col("doc_id").as("pair_id"),
      col("turns").as("chosen"), rejected.as("rejected")))
  }

  private[graft] def btGames(s: SparkSession, d: String): DataFrame = {
    val a = pmod(col("doc_id"), lit(8L))
    val b = pmod(expr("doc_id div 8"), lit(8L))
    val h = pmod(Kmv.hash48(
      concat(col("doc_id").cast("string"), lit("bt"))), a + b + lit(2L))
    Tables.documents(s, d)
      .select(a.as("a"), b.as("b"), h.as("h"))
      .where(col("a") =!= col("b"))
      .select(
        when(col("h") <= col("b"), col("a")).otherwise(col("b")).as("winner"),
        when(col("h") <= col("b"), col("b")).otherwise(col("a")).as("loser"))
  }

  private[graft] val subwordMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "an" -> "d",
    "e" -> "r", "o" -> "n", "r" -> "e", "s" -> "t", "e" -> "n",
    "a" -> "t", "o" -> "r", "e" -> "s", "a" -> "l", "o" -> "u",
    "in" -> "g")


  /** The q176/q176b blocklist fixture: spam phrases planted mid-text
    * (%13 / %17; %17 also plants "pillsbury", the boundary rule's
    * negative control — it must NOT fire the "pills" entry). */
  private[graft] val blocklistPhrases =
    Seq("cheap pills", "casino bonus", "pills", "winnings")
  private[graft] def blocklistFixture(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val planted = when(pmod(col("doc_id"), lit(13)) === 0,
        concat(col("text"), lit(" buy cheap pills online now")))
      .when(pmod(col("doc_id"), lit(17)) === 0,
        concat(lit("casino bonus spins! pillsbury dough: "), col("text")))
      .otherwise(col("text"))
    docs.select(col("doc_id"), planted.as("text"))
  }

  /** One oracle for both blocklist forms (q176 unrolled rlike, q176b
    * Aho-Corasick): normalization + one word-boundary regex per
    * phrase. */
  private[graft] val blocklistOracleSql: String =
    """WITH d AS (SELECT doc_id,
      |    CASE WHEN doc_id % 13 = 0
      |           THEN text || ' buy cheap pills online now'
      |         WHEN doc_id % 17 = 0
      |           THEN 'casino bonus spins! pillsbury dough: ' || text
      |         ELSE text END AS text
      |  FROM documents),
      |n AS (SELECT doc_id,
      |    regexp_replace(lower(text), '\s+', ' ', 'g') t FROM d),
      |h AS (SELECT doc_id, CAST(
      |    CASE WHEN regexp_matches(t,
      |      '(^|[^a-z0-9])cheap pills([^a-z0-9]|$)') THEN 1 ELSE 0 END
      |  + CASE WHEN regexp_matches(t,
      |      '(^|[^a-z0-9])casino bonus([^a-z0-9]|$)') THEN 1 ELSE 0 END
      |  + CASE WHEN regexp_matches(t,
      |      '(^|[^a-z0-9])pills([^a-z0-9]|$)') THEN 1 ELSE 0 END
      |  + CASE WHEN regexp_matches(t,
      |      '(^|[^a-z0-9])winnings([^a-z0-9]|$)') THEN 1 ELSE 0 END
      |  AS BIGINT) n_hits FROM n)
      |SELECT doc_id, n_hits, n_hits > 0 blocked FROM h""".stripMargin

  /** The q167–q169 transcript synthesis + template pieces as DuckDB
    * CTEs (mirrors [[chatConv]] and Chat's template exactly; chr(10)
    * keeps the newline out of the SQL literal). `cp` keeps only
    * renderable turns — the same `role IS NOT NULL` filter Chat's
    * render/mask/pack apply (the %19 NULL-role class). */
  private[graft] val chatCte: String =
    """tkc AS (SELECT doc_id,
      |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') tk
      |  FROM documents),
      |ct AS (SELECT doc_id, CAST(i AS BIGINT) turn_idx,
      |    CASE WHEN doc_id % 19 = 0 AND i = 1 THEN NULL
      |         WHEN doc_id % 7 = 0 THEN 'user'
      |         WHEN doc_id % 3 = 0 AND i = 0 THEN 'system'
      |         WHEN (i - CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) % 2 = 0
      |           THEN 'user'
      |         ELSE 'assistant' END AS role,
      |    CASE WHEN doc_id % 11 = 0 AND doc_id % 7 <> 0 AND i = 1 THEN ''
      |         ELSE COALESCE(
      |           array_to_string(list_slice(tk, i*4 + 1, i*4 + 4), ' '), '')
      |         END AS content
      |  FROM (SELECT doc_id, tk, unnest(range(doc_id % 4 + 2)) i FROM tkc)),
      |cp AS (SELECT doc_id, turn_idx, role, content,
      |    '<|' || role || '|>' || chr(10) || content || chr(10)
      |      || '<|end|>' || chr(10) piece
      |  FROM ct WHERE role IS NOT NULL AND content IS NOT NULL)""".stripMargin

  private[graft] val entropyCte: String =
    """d AS (SELECT doc_id, CASE
      |    WHEN doc_id % 7 = 0 THEN repeat('spam ', 39) || 'spam'
      |    WHEN doc_id % 7 = 3 THEN text || ' ' || text
      |    ELSE text END AS text FROM documents),
      |tok AS (SELECT doc_id, unnest(list_filter(
      |    regexp_split_to_array(lower(text), '\s+'), t -> t <> '')) t
      |  FROM d),
      |tc AS (SELECT doc_id, t, COUNT(*) c FROM tok GROUP BY 1, 2),
      |n AS (SELECT doc_id, SUM(c) n, COUNT(*) nd FROM tc GROUP BY 1),
      |sp AS (SELECT tc.doc_id, SUM(c * (length(bin(n.n // c)) - 1)) surp
      |  FROM tc JOIN n USING (doc_id) GROUP BY 1),
      |v AS (SELECT d.doc_id, COALESCE(n.n, 0) nt, COALESCE(n.nd, 0) nd,
      |    COALESCE(sp.surp, 0) surp,
      |    CASE WHEN COALESCE(n.n, 0) >= 2
      |      THEN COALESCE(sp.surp, 0) * 1000 // (n.n * (length(bin(n.n)) - 1))
      |      ELSE 0 END nm
      |  FROM d LEFT JOIN n USING (doc_id) LEFT JOIN sp USING (doc_id))""".stripMargin


  /** The q143 BM25 pipeline as a DuckDB CTE chain (tokenize → postings →
    * global df/avgdl → fixed-point idf/tf-weight/term floor-then-sum →
    * per-query rank in `r`); shared by q143 (the top-k report) and q147
    * (reciprocal-rank fusion with the cosine ranks). */
  /** Shared Bradley-Terry replay (q187/q197): the hash game schedule,
    * the pair/wins/item frames, and all 8 unrolled MM updates as
    * chained MATERIALIZED CTEs (plain CTEs re-inline exponentially).
    * Ends with `gm` (games), `it` (items) and `s8` (final strengths). */
  /** The hash-derived game schedule alone (shared by btCtes and q201):
    * ends with `gm` (winner, loser). */
  private[graft] val btScheduleCte: String =
    """hx AS (SELECT doc_id, doc_id % 8 a, (doc_id // 8) % 8 b,
      |    md5(CAST(doc_id AS VARCHAR) || 'bt') h FROM documents),
      |g0 AS (SELECT doc_id, a, b, CAST(SUM(
      |      (strpos('0123456789abcdef', substr(h, i, 1)) - 1)
      |      * CAST(power(16, 12 - i) AS BIGINT)) AS BIGINT) v
      |  FROM hx CROSS JOIN generate_series(1, 12) t(i)
      |  GROUP BY doc_id, a, b),
      |gm AS MATERIALIZED (SELECT
      |    CASE WHEN v % (a + b + 2) <= b THEN a ELSE b END winner,
      |    CASE WHEN v % (a + b + 2) <= b THEN b ELSE a END loser
      |  FROM g0 WHERE a <> b)""".stripMargin

  private[graft] val btCtes: String = {
    val iterCtes = (1 to 8).map { t =>
      val p = t - 1
      s"""d$t AS MATERIALIZED (SELECT item, CAST(SUM(term) AS BIGINT) dsum FROM (
         |    SELECT pr.a item, (pr.n * 1000000000000) // (sa.s + sb.s) term
         |      FROM pr JOIN s$p sa ON sa.item = pr.a
         |        JOIN s$p sb ON sb.item = pr.b
         |    UNION ALL
         |    SELECT pr.b item, (pr.n * 1000000000000) // (sa.s + sb.s) term
         |      FROM pr JOIN s$p sa ON sa.item = pr.a
         |        JOIN s$p sb ON sb.item = pr.b
         |  ) GROUP BY item),
         |r$t AS MATERIALIZED (SELECT it.item,
         |    CAST(((it.wins + 1) * 1000000000000) //
         |      (COALESCE(d$t.dsum, 0) + 2000000000000 // (s$p.s + 1000000))
         |      AS BIGINT) raw
         |  FROM it JOIN s$p ON s$p.item = it.item
         |    LEFT JOIN d$t ON d$t.item = it.item),
         |s$t AS MATERIALIZED (SELECT item, CAST((raw * (SELECT COUNT(*) FROM it) * 1000000)
         |    // (SELECT CAST(SUM(raw) AS BIGINT) FROM r$t) AS BIGINT) s FROM r$t)""".stripMargin
    }.mkString(",\n")
    s"""$btScheduleCte,
       |pr AS MATERIALIZED (SELECT LEAST(winner, loser) a, GREATEST(winner, loser) b,
       |    COUNT(*) n FROM gm GROUP BY 1, 2),
       |wn AS MATERIALIZED (SELECT winner item, COUNT(*) wins FROM gm GROUP BY 1),
       |it AS MATERIALIZED (SELECT item, CAST(COUNT(*) AS BIGINT) games,
       |    CAST(COALESCE(MAX(wins), 0) AS BIGINT) wins
       |  FROM (SELECT winner item FROM gm UNION ALL SELECT loser FROM gm)
       |    LEFT JOIN wn USING (item) GROUP BY item),
       |s0 AS MATERIALIZED (SELECT item, CAST(1000000 AS BIGINT) s FROM it),
       |$iterCtes"""
      .stripMargin
  }

  /** Shared logistic-head replay (q199): the quantized feature frame,
    * then 8 unrolled hard-sigmoid gradient-descent updates as chained
    * MATERIALIZED CTEs (the btCtes discipline — plain CTEs re-inline
    * exponentially). Every gradient product routes through HUGEINT and
    * the update divides magnitudes with the sign factored out; the
    * hard-sigmoid's shifted division is clamp-safe on negatives (Spark
    * trunc and DuckDB floor differ by at most 1 there, both under the
    * 0-clamp). Ends with `feat` (per-doc features) and `wr8` (weights). */
  private[graft] val logregCtes: String = {
    def sig(w: String) =
      s"least(greatest(($w.w0 + $w.w1*f.x1 + $w.w2*f.x2 + $w.w3*f.x3 + 2000000) // 4, 0), 1000000)"
    val iterCtes = (1 to 8).map { t =>
      val p = t - 1
      def upd(wc: String, sc: String) =
        s"CAST(w.$wc - (CASE WHEN g.$sc < 0 THEN -1 ELSE 1 END) * " +
          s"(abs(g.$sc) // (64 * CAST(nt.nn AS HUGEINT))) AS BIGINT) $wc"
      s"""g$t AS MATERIALIZED (SELECT CAST(SUM(r) AS HUGEINT) s0,
         |    CAST(SUM(r * x1) AS HUGEINT) s1, CAST(SUM(r * x2) AS HUGEINT) s2,
         |    CAST(SUM(r * x3) AS HUGEINT) s3 FROM (
         |    SELECT CAST(f.n AS HUGEINT) * ${sig("w")}
         |        - CAST(f.npos AS HUGEINT) * 1000000 r, f.x1, f.x2, f.x3
         |    FROM frame f CROSS JOIN wr$p w)),
         |wr$t AS MATERIALIZED (SELECT ${upd("w0", "s0")}, ${upd("w1", "s1")},
         |    ${upd("w2", "s2")}, ${upd("w3", "s3")}
         |  FROM wr$p w, g$t g, nt)""".stripMargin
    }.mkString(",\n")
    s"""feat AS MATERIALIZED (SELECT doc_id,
       |    least(length(text) // 64, 15) x1,
       |    least(LEN(regexp_extract_all(text,
       |      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) // 32, 15) x2,
       |    least((16 * LEN(regexp_extract_all(text, '[^A-Za-z0-9\\s]')))
       |      // (length(text) + 1), 15) x3,
       |    CASE WHEN contains(text, ' the ') THEN 1 ELSE 0 END y
       |  FROM documents),
       |frame AS MATERIALIZED (SELECT x1, x2, x3, COUNT(*) n, SUM(y) npos
       |  FROM feat GROUP BY 1, 2, 3),
       |nt AS MATERIALIZED (SELECT greatest(SUM(n), 1) nn FROM frame),
       |wr0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) w0, CAST(0 AS BIGINT) w1,
       |    CAST(0 AS BIGINT) w2, CAST(0 AS BIGINT) w3),
       |$iterCtes""".stripMargin
  }

  /** The Mann–Whitney AUC fold (q231/q232): expects a CTE `sl(s, y)`
    * (nullable BIGINT score, nullable BOOLEAN label) already defined;
    * groups by score, runs the ascending running negative sum, folds
    * wins/"ties", and SELECTs the single result row. Appended directly
    * after the upstream chain (it begins with the `gr` CTE). */
  private[graft] val aucFoldSql: String =
    """gr AS (SELECT CASE WHEN s IS NULL OR y IS NULL THEN NULL
      |      ELSE s END s,
      |    SUM(CASE WHEN s IS NOT NULL AND y IS NOT NULL AND y
      |      THEN 1 ELSE 0 END) np,
      |    SUM(CASE WHEN s IS NOT NULL AND y IS NOT NULL AND NOT y
      |      THEN 1 ELSE 0 END) nn,
      |    SUM(CASE WHEN s IS NULL OR y IS NULL THEN 1 ELSE 0 END) nx
      |  FROM sl GROUP BY 1),
      |acc AS (SELECT np, nn, nx,
      |    COALESCE(SUM(nn) OVER (ORDER BY s ASC NULLS FIRST
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cum_nn
      |  FROM gr),
      |f AS (SELECT CAST(COALESCE(SUM(np), 0) AS BIGINT) n_pos,
      |    CAST(COALESCE(SUM(nn), 0) AS BIGINT) n_neg,
      |    CAST(COALESCE(SUM(nx), 0) AS BIGINT) n_excluded,
      |    CAST(COALESCE(SUM(np * cum_nn), 0) AS BIGINT) wins,
      |    CAST(COALESCE(SUM(np * nn), 0) AS BIGINT) AS "ties"
      |  FROM acc)
      |SELECT n_pos, n_neg, n_excluded, wins, "ties",
      |  CAST(CASE WHEN n_pos > 0 AND n_neg > 0 THEN
      |    (1000000 * (2 * CAST(wins AS HUGEINT) + "ties"))
      |      // (2 * CAST(n_pos AS HUGEINT) * n_neg) END AS BIGINT)
      |    auc_ppm
      |FROM f""".stripMargin


  /** Waterfill replay chain (q210/q211): expects a CTE `av(source,
    * avail)` already defined; produces `alloc(source, avail,
    * alloc_tokens, saturated)` via ascending-order prefix sums,
    * window-min saturation, the integer level, and remainder bumps —
    * the exact Importance.waterfillOver algorithm. */
  private[graft] def waterfillCtes(ppm: Long): String =
    s"""b AS (SELECT COUNT(*) k, CAST(SUM(avail) AS BIGINT) total,
       |    CAST((SUM(avail) * $ppm) // 1000000 AS BIGINT) budget FROM av),
       |r AS (SELECT source, avail, k, total, budget,
       |    CAST(row_number() OVER ord AS BIGINT) i,
       |    CAST(COALESCE(SUM(avail) OVER (ord
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      pfx
       |  FROM av CROSS JOIN b
       |  WINDOW ord AS (ORDER BY avail ASC, source ASC)),
       |c AS (SELECT *, CASE WHEN avail * (k - i + 1) + pfx <= budget
       |    THEN 1 ELSE 0 END cond FROM r),
       |sflag AS (SELECT *, (MIN(cond) OVER (ORDER BY avail ASC, source ASC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) = 1 sat
       |  FROM c),
       |tot AS (SELECT *,
       |    CAST(SUM(CASE WHEN sat THEN avail ELSE 0 END) OVER () AS BIGINT)
       |      sat_sum,
       |    k - CAST(SUM(CASE WHEN sat THEN 1 ELSE 0 END) OVER () AS BIGINT)
       |      n_unsat,
       |    CAST(SUM(CASE WHEN sat THEN 0 ELSE 1 END) OVER (
       |      ORDER BY avail ASC, source ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      rank_unsat
       |  FROM sflag),
       |alloc AS (SELECT source, avail, sat saturated,
       |  CAST(CASE WHEN sat THEN avail ELSE
       |    (budget - sat_sum) // n_unsat +
       |    (CASE WHEN rank_unsat <= (budget - sat_sum) % n_unsat
       |     THEN 1 ELSE 0 END) END AS BIGINT) alloc_tokens
       |  FROM tot)""".stripMargin





  /** Shared unigram-tokenizer training replay (q188/q192/q196):
    * vocabulary = top-512 sample substrings with ilog2 integer
    * log2-prob scores. Callers must open with WITH RECURSIVE when they
    * append a DP CTE. */
  private[graft] val unigramTrainCte: String =
    """smp AS (SELECT substring(text, 1, 262144) "text" FROM documents
      |        ORDER BY md5(CAST(doc_id AS VARCHAR) || 'uni') LIMIT 256),
      |sw AS (SELECT unnest(regexp_extract_all(text,
      |    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) w FROM smp),
      |sub AS MATERIALIZED (SELECT substr(w, i, k) piece
      |  FROM (SELECT w, k, unnest(range(1, length(w) - k + 2)) i
      |        FROM (SELECT w, unnest([1, 2, 3, 4]) k FROM sw)
      |        WHERE length(w) >= k)),
      |cnt AS MATERIALIZED (SELECT piece, COUNT(*) c FROM sub GROUP BY 1),
      |tot AS (SELECT SUM(c) s FROM cnt),
      |voc AS MATERIALIZED (SELECT piece,
      |    CAST(length(bin((c * 1073741824) // s)) - 31 AS BIGINT) score
      |  FROM cnt, tot ORDER BY c DESC, piece LIMIT 512)""".stripMargin


  /** The Viterbi DP as a recursive CTE: state = the last four
    * (best score, payload) pairs, advancing one character per step,
    * candidates keyed `cand*8 + k` (all keys distinct mod 8, ties to
    * the longer piece), -2^62 the invalid-candidate sentinel. Two
    * payload modes: piece COUNTS (`paths=false` — n_k+1 on extension)
    * or the chosen piece PATH as a space-joined string (`paths=true` —
    * words never contain whitespace, so the join is unambiguous).
    * `name` is the emitted CTE, `voc` the score table, `src` the
    * distinct-word source (column `w`). */
  private[graft] def unigramDpCte(name: String, voc: String, src: String,
                           paths: Boolean): String = {
    val (init, ext, typ) =
      if (paths) (
        "''",
        (k: Int) => s"CASE WHEN g$k = '' THEN p$k ELSE g$k || ' ' || p$k END",
        "VARCHAR")
      else (
        "CAST(0 AS BIGINT)",
        (k: Int) => s"n$k + 1",
        "BIGINT")
    val pay = if (paths) "g" else "n"
    s"""$name(w, pos, b1, ${pay}1, b2, ${pay}2, b3, ${pay}3, b4, ${pay}4) AS (
       |  SELECT w, CAST(0 AS BIGINT), CAST(0 AS BIGINT), $init,
       |      CAST(NULL AS BIGINT), CAST(NULL AS $typ),
       |      CAST(NULL AS BIGINT), CAST(NULL AS $typ),
       |      CAST(NULL AS BIGINT), CAST(NULL AS $typ)
       |  FROM $src
       |  UNION ALL
       |  SELECT w, pos + 1,
       |    CASE WHEN mk = k4 THEN c4 WHEN mk = k3 THEN c3
       |         WHEN mk = k2 THEN c2 ELSE c1 END,
       |    CASE WHEN mk = k4 THEN ${ext(4)} WHEN mk = k3 THEN ${ext(3)}
       |         WHEN mk = k2 THEN ${ext(2)} ELSE ${ext(1)} END,
       |    b1, ${pay}1, b2, ${pay}2, b3, ${pay}3
       |  FROM (SELECT w, pos, b1, ${pay}1, b2, ${pay}2, b3, ${pay}3, ${pay}4,
       |      c1, c2, c3, c4, p1, p2, p3, p4,
       |      k1, k2, k3, k4, GREATEST(k1, k2, k3, k4) mk
       |    FROM (SELECT w, pos, b1, ${pay}1, b2, ${pay}2, b3, ${pay}3, ${pay}4,
       |        c1, c2, c3, c4, p1, p2, p3, p4,
       |        c1 * 8 + 1 k1,
       |        COALESCE(c2 * 8 + 2, -4611686018427387904) k2,
       |        COALESCE(c3 * 8 + 3, -4611686018427387904) k3,
       |        COALESCE(c4 * 8 + 4, -4611686018427387904) k4
       |      FROM (SELECT v.w, v.pos, v.b1, v.${pay}1, v.b2, v.${pay}2,
       |          v.b3, v.${pay}3, v.${pay}4,
       |          substr(v.w, v.pos + 1, 1) p1, substr(v.w, v.pos, 2) p2,
       |          substr(v.w, v.pos - 1, 3) p3, substr(v.w, v.pos - 2, 4) p4,
       |          v.b1 + COALESCE(v1.score, -40) c1,
       |          v.b2 + v2.score c2,
       |          v.b3 + v3.score c3,
       |          v.b4 + v4.score c4
       |        FROM $name v
       |          LEFT JOIN $voc v1 ON v1.piece = substr(v.w, v.pos + 1, 1)
       |          LEFT JOIN $voc v2
       |            ON v.pos >= 1 AND v2.piece = substr(v.w, v.pos, 2)
       |          LEFT JOIN $voc v3
       |            ON v.pos >= 2 AND v3.piece = substr(v.w, v.pos - 1, 3)
       |          LEFT JOIN $voc v4
       |            ON v.pos >= 3 AND v4.piece = substr(v.w, v.pos - 2, 4)
       |        WHERE v.pos < length(v.w)))))""".stripMargin
  }



  /** The q180 preference-pair synthesis + validation through the `pp`
    * CTE (pair_id, prefix_ok, ends_ok, divergent_ok, chosen_chars,
    * rejected_chars, ok) — chains after `chatCte`; shared by q180 and
    * q227's length-bias audit. */
  private[graft] val prefPairCtes: String =
    """rej AS (SELECT doc_id, turn_idx, role,
      |    CASE WHEN doc_id % 29 = 0 AND turn_idx = 0 THEN content || '!'
      |         WHEN doc_id % 23 = 0 AND doc_id % 29 <> 0 THEN content
      |         WHEN doc_id % 29 <> 0 AND doc_id % 23 <> 0
      |              AND turn_idx = doc_id % 4 + 1
      |           THEN substr(content, 1, length(content) // 2)
      |         ELSE content END AS content
      |  FROM ct),
      |nc AS (SELECT doc_id, MAX(turn_idx) + 1 n FROM ct GROUP BY doc_id),
      |j AS (SELECT c.doc_id, c.turn_idx i, c.role cr, c.content cc,
      |        r.role rr, r.content rc, n
      |      FROM ct c JOIN rej r USING (doc_id, turn_idx)
      |        JOIN nc USING (doc_id)),
      |a AS (SELECT doc_id,
      |    MIN(CASE WHEN i < n - 1 THEN
      |      CASE WHEN cr IS NOT DISTINCT FROM rr
      |        AND cc IS NOT DISTINCT FROM rc THEN 1 ELSE 0 END END) pfx,
      |    MAX(CASE WHEN i = n - 1 AND cr = 'assistant'
      |      AND rr = 'assistant' THEN 1 ELSE 0 END) ends,
      |    MAX(CASE WHEN i = n - 1 AND cc IS DISTINCT FROM rc
      |      THEN 1 ELSE 0 END) dv,
      |    SUM(CASE WHEN i = n - 1 THEN length(cc) END) ccs,
      |    SUM(CASE WHEN i = n - 1 THEN length(rc) END) rcs
      |  FROM j GROUP BY doc_id),
      |pp AS (SELECT doc_id pair_id,
      |    COALESCE(pfx, 1) = 1 prefix_ok,
      |    COALESCE(ends, 0) = 1 ends_ok,
      |    COALESCE(dv, 0) = 1 divergent_ok,
      |    CAST(COALESCE(ccs, 0) AS BIGINT) chosen_chars,
      |    CAST(COALESCE(rcs, 0) AS BIGINT) rejected_chars,
      |    (COALESCE(pfx, 1) = 1 AND COALESCE(ends, 0) = 1
      |     AND COALESCE(dv, 0) = 1) ok
      |  FROM a)""".stripMargin


  /** RFC 9309 parse chain `ln`→`rules` over an `rb(host, rtxt)` CTE the
    * caller defines first — shared by the q221/q222 fixture and the
    * q241/q242 path-pattern fixture. */
  private val robotsChainCte: String =
    """ln AS (SELECT host, generate_subscripts(lns, 1) - 1 pos,
      |    unnest(lns) line
      |  FROM (SELECT host, string_split(rtxt, chr(10)) lns FROM rb)),
      |pd AS (SELECT host, pos,
      |    lower(regexp_extract(line, '^\s*([A-Za-z-]+)\s*:', 1)) dname,
      |    trim(regexp_extract(line, '^\s*[A-Za-z-]+\s*:\s*([^#]*)', 1))
      |      "value"
      |  FROM ln),
      |flt AS (SELECT host, pos, dname, "value" FROM pd
      |  WHERE dname IN ('user-agent', 'disallow', 'allow', 'crawl-delay')),
      |grp AS (SELECT host, pos, dname, "value",
      |    SUM(CASE WHEN dname = 'user-agent'
      |          AND (prv IS NULL OR prv <> 'user-agent') THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY host ORDER BY pos) run
      |  FROM (SELECT host, pos, dname, "value",
      |        lag(dname) OVER (PARTITION BY host ORDER BY pos) prv
      |        FROM flt)),
      |ag AS (SELECT host, run, "value" agent FROM grp
      |  WHERE dname = 'user-agent'),
      |rules AS (SELECT g.host, ag.agent, g.dname "rule", g."value",
      |    CAST(g.pos AS BIGINT) pos
      |  FROM grp g JOIN ag ON ag.host = g.host AND ag.run = g.run
      |  WHERE g.dname <> 'user-agent'
      |  UNION ALL
      |  SELECT host, "value" agent, 'group' "rule", '' "value",
      |    CAST(pos AS BIGINT) pos
      |  FROM grp WHERE dname = 'user-agent')""".stripMargin

  /** The q238 governance fixture (urls + licenses + planted PII) and
    * its gate CTEs `base`..`pii` — shared by q238 and the
    * robots-chained q242. */
  private[graft] val govSweepCtes: String =
      s"""base AS (SELECT doc_id,
        |  CASE CAST(doc_id % 4 AS INT)
        |    WHEN 0 THEN 'HTTP://WWW.' || source || '.Example.COM:80/A/B/'
        |      || CAST(doc_id AS VARCHAR) || '/?utm_source=feed&b=2&a=1#frag'
        |    WHEN 1 THEN 'https://' || source
        |      || '.example.com:8443/x?z=9&fbclid=XYZ&y=8&utm_medium=m'
        |    WHEN 2 THEN 'HTTPS://Sub.' || source || '.Example.com:443/only/Path/'
        |    ELSE 'http://' || source || '.example.com/?q='
        |      || CAST(doc_id AS VARCHAR) || '&ref=abc'
        |  END url,
        |  concat_ws(' ', substring(text, 1, 20),
        |    CASE doc_id % 5
        |      WHEN 0 THEN 'SPDX-License-Identifier: MIT (not the GNU General Public License)'
        |      WHEN 1 THEN 'SPDX-License-Identifier: GPL-3.0-only'
        |      WHEN 2 THEN 'under the GNU General Public License; MIT License text follows'
        |      WHEN 3 THEN 'licensed under the Apache License, Version 2.0'
        |      ELSE '' END,
        |    substring(text, 21, 1000000))
        |  || CASE WHEN doc_id % 11 = 0 THEN ' contact user'
        |       || CAST(doc_id AS VARCHAR) || '@example.com now'
        |     ELSE '' END AS "text"
        |  FROM documents),
        |p AS (SELECT doc_id,
        |  lower(regexp_extract(url, '^([^:/?#]+)://', 1)) scheme,
        |  regexp_replace(lower(regexp_extract(url, '^[^:/?#]+://([^/?#]*)', 1)),
        |    '^www\\.', '') auth FROM base),
        |h AS (SELECT doc_id,
        |  CASE WHEN scheme = 'http' THEN regexp_replace(auth, ':80$$', '')
        |       WHEN scheme = 'https' THEN regexp_replace(auth, ':443$$', '')
        |       ELSE auth END host FROM p),
        |l AS (SELECT doc_id, host,
        |  string_split(regexp_replace(host, ':[0-9]+$$', ''), '.') lbl FROM h),
        |sfx AS (SELECT doc_id, array_to_string(lbl[i:], '.') sfx
        |  FROM (SELECT doc_id, lbl, unnest(range(1, len(lbl))) i
        |        FROM l WHERE len(lbl) >= 2)),
        |srcs AS (SELECT DISTINCT source FROM documents),
        |reg AS (SELECT source || '.example.com' "domain" FROM srcs
        |    WHERE substring(md5(source), 1, 1) < '8'
        |  UNION ALL
        |  SELECT 'sub.' || source || '.example.com' FROM srcs
        |    WHERE substring(md5(source), 1, 1) < '4'),
        |m AS (SELECT doc_id, "domain" FROM (
        |    SELECT sfx.doc_id, r."domain",
        |      row_number() OVER (PARTITION BY sfx.doc_id
        |        ORDER BY length(r."domain") DESC, r."domain" ASC) rn
        |    FROM sfx JOIN reg r ON sfx.sfx = r."domain") WHERE rn = 1),
        |lc AS (SELECT doc_id,
        |    regexp_extract("text",
        |      'SPDX-License-Identifier:[ \\t]*([A-Za-z0-9.+-]+)', 1) spdx0,
        |    regexp_matches("text",
        |      '(?i)GNU (Affero |Lesser )?General Public License|\\b[AL]?GPL-?[0-9]|\\bGPL\\b|Creative Commons|\\bCC-BY')
        |      has_copyleft,
        |    regexp_matches("text",
        |      '(?i)MIT License|Apache License|BSD [0-9]-Clause|\\bISC License|\\bUnlicense\\b')
        |      has_permissive
        |  FROM base),
        |lcv AS (SELECT doc_id,
        |  CASE WHEN spdx0 = '' THEN NULL ELSE spdx0 END spdx_id,
        |  CASE WHEN spdx0 <> '' THEN
        |      CASE WHEN regexp_matches(upper(spdx0),
        |          '^(A?GPL|LGPL|CC-BY-SA|EUPL|MPL)') THEN 'copyleft'
        |        WHEN regexp_matches(upper(spdx0),
        |          '^(MIT|APACHE|BSD|ISC|UNLICENSE|ZLIB|CC0)') THEN 'permissive'
        |        ELSE 'other-spdx' END
        |    WHEN has_copyleft THEN 'copyleft'
        |    WHEN has_permissive THEN 'permissive'
        |    ELSE 'none' END license_class
        |  FROM lc),
        |rc AS (SELECT doc_id,
        |    CASE WHEN "text" IS NULL THEN 0
        |      ELSE len(list_filter(regexp_split_to_array("text", '\\s+'),
        |        t2 -> t2 <> '')) END nw,
        |    CASE WHEN "text" IS NULL THEN 0
        |      ELSE greatest(len(regexp_extract_all("text", '[.!?]+')), 1)
        |      END ns,
        |    CASE WHEN "text" IS NULL THEN 0
        |      ELSE len(regexp_extract_all("text", '[aeiouyAEIOUY]+')) END ny
        |  FROM base),
        |fr AS (SELECT doc_id,
        |    CASE WHEN nw > 0 THEN 206835
        |      - (1015 * ((1000 * nw) // ns)) // 1000
        |      - (84600 * ((1000 * ny) // nw)) // 1000 END fre
        |  FROM rc),
        |pii AS (SELECT doc_id,
        |    len(regexp_extract_all("text", '$emailPat'))
        |      + len(regexp_extract_all("text", '$phonePat')) > 0 has_pii
        |  FROM base)""".stripMargin

  /** The q137 jusText chain `x`..`cx` (page synthesis, block split,
    * context-free classes, IGNORE-NULLS neighbor windows) — shared by
    * q137 (the block report) and q248 (raw-WARC -> main content). */
  private[graft] val boilerplateCtes: String =
      """x AS (SELECT doc_id,
        |    '@lnk home @lnk about @lnk contact nav menu' || chr(10) || chr(10) ||
        |    text || ' the of and to in is on the a of and in' || chr(10) || chr(10) ||
        |    'posted ' || CAST(doc_id AS VARCHAR) || chr(10) || chr(10) ||
        |    text || chr(10) || chr(10) ||
        |    '@lnk privacy @lnk terms @lnk copyright site' AS text
        |  FROM documents),
        |bl AS (SELECT doc_id, unnest(list_transform(range(1, len(l) + 1),
        |    i -> {'b': i - 1, 'blk': l[i]})) u
        |  FROM (SELECT doc_id, string_split(text, chr(10) || chr(10)) l FROM x)),
        |b2 AS (SELECT doc_id, u.b bidx, u.blk blk FROM bl),
        |cn AS (SELECT doc_id, CAST(bidx AS BIGINT) bidx,
        |    CAST(length(blk) AS BIGINT) n_chars,
        |    CAST(len(tk) AS BIGINT) n_tokens,
        |    CAST(len(list_filter(tk, t -> starts_with(t, '@lnk')
        |        OR regexp_matches(t, '^https?://'))) AS BIGINT) n_links,
        |    CAST(len(list_filter(tk, t -> list_contains(
        |        ['the','a','of','and','to','in','is','on'], lower(t)))) AS BIGINT) n_stops
        |  FROM (SELECT doc_id, bidx, blk,
        |      list_filter(regexp_split_to_array(blk, '\s+'), t -> t <> '') tk
        |    FROM b2)),
        |cf AS (SELECT *, CASE
        |    WHEN n_links * 3 > n_tokens THEN 'bad'
        |    WHEN n_chars < 80 THEN 'short'
        |    WHEN n_stops * 10 >= n_tokens * 3 THEN 'good'
        |    WHEN n_stops * 20 >= n_tokens * 3 THEN 'near_good'
        |    ELSE 'bad' END cls FROM cn),
        |cx AS (SELECT *,
        |    COALESCE(last_value(CASE WHEN cls IN ('good','bad') THEN cls END IGNORE NULLS)
        |      OVER (PARTITION BY doc_id ORDER BY bidx
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 'bad') pv,
        |    COALESCE(first_value(CASE WHEN cls IN ('good','bad') THEN cls END IGNORE NULLS)
        |      OVER (PARTITION BY doc_id ORDER BY bidx
        |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 'bad') nx
        |  FROM cf)""".stripMargin

  /** The q221/q222 robots fixture + the parse chain. "value"/"domain"
    * quoted: DuckDB reserved words. */
  private[graft] val robotsParseCte: String =
    """srcs2 AS (SELECT DISTINCT source FROM documents),
      |rb AS (SELECT source || '.example.com' host,
      |    '# corpus robots fixture' || chr(10) || 'Crawl-delay: 1'
      |    || chr(10) || 'User-agent: *' || chr(10) ||
      |    CASE WHEN substring(md5(source), 1, 1) < '8' THEN 'Disallow: /'
      |         ELSE 'Disallow: /private' END || chr(10) ||
      |    'Allow: /public # static assets' || chr(10) || '' || chr(10) ||
      |    'User-agent: graftbot' || chr(10) || 'User-agent: extrabot'
      |    || chr(10) ||
      |    CASE WHEN substring(md5(source), 3, 1) < '4'
      |         THEN '# empty specific group'
      |         ELSE (CASE WHEN substring(md5(source), 2, 1) < '8'
      |                    THEN 'Disallow: /' ELSE 'Crawl-delay: 5' END)
      |           || chr(10) || 'Disallow: /tmp/' END rtxt
      |  FROM srcs2),
      |""".stripMargin + robotsChainCte

  /** The q241/q242 path-pattern robots fixture (the [[robotsPathDocs]]
    * synthesis) + the parse chain + group selection + LIKE-pattern
    * compilation + the per-URL longest-match fold — everything after
    * `u(doc_id, url)` that maps a URL to its RFC 9309 verdict row. */
  private[graft] val robotsUrlVerdictCte: String =
    """srcs2 AS (SELECT DISTINCT source FROM documents),
      |rb AS (SELECT source || '.example.com' host,
      |    '# path-pattern fixture' || chr(10) || 'User-agent: *'
      |    || chr(10) || 'Disallow: /A/*/' || chr(10) || 'Allow: /A/B/'
      |    || chr(10) ||
      |    CASE WHEN substring(md5(source), 1, 1) < '6'
      |         THEN 'Disallow: /x?z=9*' ELSE 'Allow: /x?z=9*' END
      |    || chr(10) || 'Disallow: /?q=*&ref=abc$' || chr(10) ||
      |    'Allow: /?q=1*' || chr(10) ||
      |    CASE WHEN substring(md5(source), 2, 1) < '4'
      |         THEN 'User-agent: GraftBot' || chr(10) || 'Disallow:'
      |           || chr(10) || 'Disallow: /A/'
      |         WHEN substring(md5(source), 2, 1) < '8'
      |         THEN 'User-agent: GraftBot'
      |         ELSE '# no specific group' END rtxt
      |  FROM srcs2),
      |""".stripMargin + robotsChainCte + """,
      |ar AS (SELECT host, agent, "rule", "value",
      |    lower(agent) = 'graftbot' spec FROM rules),
      |hs AS (SELECT host, bool_or(spec) has_spec FROM ar GROUP BY 1),
      |app AS (SELECT host, "rule", "value",
      |    replace(regexp_replace(core, '([!%_])', '!\1', 'g'), '*', '%')
      |      || CASE WHEN anch THEN '' ELSE '%' END pat
      |  FROM (SELECT ar.host, "rule", "value",
      |      CASE WHEN "value" LIKE '%$' THEN
      |        substring("value", 1, length("value") - 1)
      |        ELSE "value" END core,
      |      "value" LIKE '%$' anch
      |    FROM ar JOIN hs USING (host)
      |    WHERE "rule" IN ('allow', 'disallow')
      |      AND ((spec AND has_spec) OR (agent = '*' AND NOT has_spec))
      |      AND "value" <> '')),
      |du AS (SELECT doc_id,
      |    lower(regexp_extract(url, '^([^:/?#]+)://', 1)) scheme,
      |    regexp_replace(lower(regexp_extract(url,
      |      '^[^:/?#]+://([^/?#]*)', 1)), '^www\.', '') auth,
      |    regexp_extract(url, '^[^:/?#]+://[^/?#]*([^#]*)', 1) t
      |  FROM u),
      |dv AS (SELECT doc_id,
      |    regexp_replace(CASE
      |      WHEN scheme = 'http' THEN regexp_replace(auth, ':80$', '')
      |      WHEN scheme = 'https' THEN regexp_replace(auth, ':443$', '')
      |      ELSE auth END, ':[0-9]+$', '') host,
      |    CASE WHEN t = '' THEN '/' ELSE t END target
      |  FROM du),
      |jm AS (SELECT d.doc_id, d.host, d.target, a."rule", a."value"
      |  FROM dv d LEFT JOIN app a
      |    ON a.host = d.host AND d.target LIKE a.pat ESCAPE '!'),
      |rvd AS (SELECT doc_id, host, target,
      |    "rule" matched_rule, "value" matched_pattern,
      |    ("rule" IS NULL OR "rule" = 'allow') allowed
      |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
      |      ORDER BY ("value" IS NULL) ASC, strlen("value") DESC,
      |        "rule" ASC, "value" ASC) rn FROM jm)
      |  WHERE rn = 1)""".stripMargin

  private[graft] val bm25Cte: String =
    """tokd AS (SELECT doc_id, list_filter(
      |    regexp_split_to_array(lower(text), '\s+'), t -> t <> '') tk
      |  FROM documents),
      |q AS (SELECT doc_id query_id, list_distinct(tk[3:6]) qt
      |  FROM tokd WHERE doc_id % 100 = 0),
      |post AS (SELECT doc_id, len(tk) dl, unnest(tk) t FROM tokd),
      |pc AS (SELECT t, doc_id, dl, COUNT(*) tf FROM post GROUP BY 1, 2, 3),
      |docl AS (SELECT DISTINCT doc_id, dl FROM pc),
      |stats AS (SELECT n_docs, (tot * 1000) // n_docs avg_fx
      |  FROM (SELECT COUNT(*) n_docs, SUM(dl) tot FROM docl)),
      |qt AS (SELECT query_id, unnest(qt) t FROM q),
      |dfq AS (SELECT t, COUNT(*) df FROM pc
      |  WHERE t IN (SELECT DISTINCT t FROM qt) GROUP BY 1),
      |sc AS (SELECT m.query_id, m.doc_id, SUM(
      |    ( (((2*s.n_docs - 2*dfq.df + 1) * 1000000) // (2*dfq.df + 1))
      |    * ((22 * m.tf * s.avg_fx * 1000)
      |       // (10*s.avg_fx*m.tf + 3*s.avg_fx + 9000*m.dl)) ) // 1000) score_fx
      |  FROM (SELECT qt.query_id, pc.doc_id, pc.tf, pc.dl, pc.t
      |        FROM pc JOIN qt USING (t)) m
      |    JOIN dfq USING (t) CROSS JOIN stats s
      |  GROUP BY 1, 2),
      |r AS (SELECT query_id, doc_id, score_fx, row_number() OVER (
      |    PARTITION BY query_id ORDER BY score_fx DESC, doc_id ASC) rk
      |  FROM sc)""".stripMargin


  def oracleSql: Map[String, String] =
    baseOracleSql ++ registry.CrawlRegistry.oracleSql ++
      registry.TokenScriptRegistry.oracleSql ++ registry.WarcRegistry.oracleSql ++
      registry.GraphAnnRegistry.oracleSql ++ registry.VectorRegistry.oracleSql ++
      registry.EvalRegistry.oracleSql ++ registry.SketchRegistry.oracleSql ++
      registry.ClusterRegistry.oracleSql ++ registry.RelationalRegistry.oracleSql ++
      registry.GovernanceRegistry.oracleSql ++ registry.ChatRegistry.oracleSql ++
      registry.MediaRegistry.oracleSql ++ registry.DedupRegistry.oracleSql ++
      registry.QualityRegistry.oracleSql ++ registry.TokenizerRegistry.oracleSql ++
      registry.ContaminationRegistry.oracleSql ++
      registry.MixtureRegistry.oracleSql ++
      registry.CurationRegistry.oracleSql ++ registry.AnalyticsRegistry.oracleSql

  private def baseOracleSql: Map[String, String] = Map(
    "q01_cdc_parse" ->
      """SELECT event_id, CAST(user_id AS VARCHAR) content_id,
        |  CAST(event_id % 97 AS VARCHAR) user_id, event_type,
        |  date_trunc('microseconds', ts) event_ts,
        |  CAST(FLOOR(value*1000) AS INT) duration_ms,
        |  event_type device, props raw
        |FROM events""".stripMargin,
    "q02_enrich" ->
      """WITH facts AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(l_partkey + CASE WHEN l_linenumber=7 THEN 1000000 ELSE 0 END AS VARCHAR) content_id,
        |    CASE WHEN l_returnflag='N' THEN NULL ELSE CAST(FLOOR(l_quantity*60000) AS INT) END duration_ms
        |  FROM lineitem),
        |dim AS (
        |  SELECT CAST(p_partkey AS VARCHAR) content_id, p_brand content_type,
        |    CASE WHEN p_size%7=0 THEN NULL ELSE p_size*60 END length_seconds
        |  FROM part)
        |SELECT f.l_orderkey, f.l_linenumber, f.content_id, d.content_type,
        |  f.duration_ms, d.length_seconds,
        |  CASE WHEN f.duration_ms IS NULL THEN NULL
        |       ELSE CAST(f.duration_ms/1000.0 AS DOUBLE) END engagement_seconds,
        |  CASE WHEN d.length_seconds IS NULL OR f.duration_ms IS NULL THEN NULL
        |       ELSE FLOOR((f.duration_ms/1000.0)/d.length_seconds*100 + 0.5)/100.0 END engagement_pct
        |FROM facts f LEFT JOIN dim d USING (content_id)""".stripMargin,
    "q03_sliding_count" ->
      """SELECT CAST(user_id AS VARCHAR) content_id, COUNT(*) cnt
        |FROM events, (SELECT MAX(date_trunc('second', ts)) m FROM events) mx
        |WHERE date_trunc('second', ts) >= mx.m - INTERVAL 10080 MINUTES
        |GROUP BY 1""".stripMargin,
    "q04_leaderboard" ->
      """SELECT CAST(user_id AS VARCHAR) content_id, COUNT(*) cnt FROM events
        |GROUP BY 1 ORDER BY cnt DESC, content_id ASC LIMIT 10""".stripMargin,
    "q05_recent" ->
      """SELECT event_id, date_trunc('millisecond', ts) ts_ms, event_type, value
        |FROM events ORDER BY ts_ms DESC, event_id ASC LIMIT 5""".stripMargin
  )
}
