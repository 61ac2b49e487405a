package graft

import org.apache.spark.sql.functions._
import graft.ops.Web

class WebSpec extends SparkTestBase {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(Web.canonicalizeUrl($"url")).as[String].collect().toSeq

  test("canonical form: case, www, default port, tracking params, fragment, order") {
    assert(canon("HTTP://WWW.Example.COM:80/A/B/123/?utm_source=feed&b=2&a=1#frag")
      == Seq("http://example.com/A/B/123?a=1&b=2"))
    // path case is significant and preserved; host case is not
    assert(canon("HTTPS://Sub.Example.com:443/only/Path/")
      == Seq("https://sub.example.com/only/Path"))
  }

  test("non-default ports and non-http schemes keep their port") {
    assert(canon("https://sub.example.com:8443/x?z=9&fbclid=X&y=8")
      == Seq("https://sub.example.com:8443/x?y=8&z=9"))
    assert(canon("ftp://Example.com:21/f") == Seq("ftp://example.com:21/f"))
    // :80 is only default for http, :443 only for https
    assert(canon("https://example.com:80/x") == Seq("https://example.com:80/x"))
  }

  test("query edge cases: all-tracking, empties, bare ?, missing query") {
    // every param dropped -> the '?' goes too
    assert(canon("http://example.com/p?utm_a=1&ref=x&gclid=2&mc_eid=3")
      == Seq("http://example.com/p"))
    // empty segments between && are dropped, survivors sorted
    assert(canon("http://example.com/p?b=2&&a=1") == Seq("http://example.com/p?a=1&b=2"))
    assert(canon("http://example.com/p?") == Seq("http://example.com/p"))
    assert(canon("http://Example.com") == Seq("http://example.com"))
  }

  test("tracking match is whole-param: a non-tracking key containing 'ref' survives") {
    assert(canon("http://example.com/p?referrer=x&prefix=1")
      == Seq("http://example.com/p?prefix=1&referrer=x"))
    // bare key form (no '=') is still dropped
    assert(canon("http://example.com/p?ref&a=1") == Seq("http://example.com/p?a=1"))
  }

  test("canonicalizeUrls adds url_canon + host; host strips www and default port") {
    val out = Web.canonicalizeUrls(
      Seq("HTTP://WWW.Example.COM:80/A/?b=2").toDF("url"))
    val row = out.select($"url_canon", $"host").as[(String, String)].head()
    assert(row == ("http://example.com/A?b=2", "example.com"))
  }

  test("domainOptOut: suffix governs subdomains, longest match wins, ports never govern") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "http://a.b.example.com/x"),       // suffix hit on example.com
      (2L, "https://sub.example.com/y"),      // two hits -> sub.example.com
      (3L, "http://example.com:8080/z"),      // port stripped -> hit
      (4L, "http://kept.org/w"),              // no registry entry -> kept
      (5L, "http://localhost/v"),             // single label -> no suffixes, kept
      (6L, "https://notexample.com/u")        // no dot-boundary bypass:
      ).toDF("doc_id", "url")                 //   notexample.com != *.example.com
    val reg = Seq("example.com", "sub.example.com").toDF("domain")
    val got = Web.domainOptOut(docs, reg).collect()
      .map(r => r.getLong(0) ->
        ((Option(r.getString(2)), r.getBoolean(3)))).toMap
    assert(got(1L) == ((Some("example.com"), false)))
    assert(got(2L) == ((Some("sub.example.com"), false)), "longest match must win")
    assert(got(3L) == ((Some("example.com"), false)), "opt-out must cover any port")
    assert(got(4L) == ((None, true)))
    assert(got(5L) == ((None, true)), "single-label host has no suffixes")
    assert(got(6L) == ((None, true)),
      "suffixes split on dots: notexample.com must not match example.com")
    // audit: longest-match attribution + zero-hit entry surfaced
    val reg2 = Seq("example.com", "sub.example.com", "never.net").toDF("domain")
    val audit = Web.domainOptOutAudit(Web.domainOptOut(docs, reg2), reg2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(audit == Map("example.com" -> 2L, "sub.example.com" -> 1L,
      "never.net" -> 0L))
  }

  test("robotsRules: group runs, outside-group drop, comments, case-insensitive fields") {
    import org.apache.spark.sql.functions.col
    val robots = Seq(("site.com", Seq(
      "Disallow: /orphan",          // before any group -> ignored
      "user-AGENT: *",              // case-insensitive field name
      "Disallow: /private # hidden",// comment cut, value trimmed
      "Noindex: /x",                // unknown directive -> skipped
      "",
      "User-agent: abot",
      "User-agent: bbot",           // consecutive run: rules fan out to both
      "Allow: /ok",
      "Crawl-delay: 5",
      "User-agent: cbot",           // NEW run (previous line was a rule)
      "Disallow: /"
    ).mkString("\n"))).toDF("host", "text")
    val got = Web.robotsRules(robots).collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(got == Set(
      ("*", "disallow", "/private"),
      ("abot", "allow", "/ok"), ("bbot", "allow", "/ok"),
      ("abot", "crawl-delay", "5"), ("bbot", "crawl-delay", "5"),
      ("cbot", "disallow", "/"),
      // one marker row per user-agent line, so EMPTY groups register
      // with downstream group selection (rule='group', empty value)
      ("*", "group", ""), ("abot", "group", ""), ("bbot", "group", ""),
      ("cbot", "group", "")))
    // opt-out derivation: only cbot's full disallow counts for cbot;
    // '*' has no full disallow here -> graftbot not opted out
    assert(Web.robotsOptOut(Web.robotsRules(robots), bot = "cbot")
      .collect().map(_.getString(0)).toSeq == Seq("site.com"))
    assert(Web.robotsOptOut(Web.robotsRules(robots), bot = "graftbot")
      .isEmpty)
  }

  test("robotsOptOut: RFC 9309 product tokens match case-insensitively") {
    // robotsRules lowercases field NAMES but preserves values — a
    // 'User-agent: GraftBot' group with 'Disallow: /' must still opt
    // the host out for the token 'graftbot' (and vice versa)
    val robots = Seq(("cased.com", "User-agent: GraftBot\nDisallow: /"))
      .toDF("host", "text")
    val rules = Web.robotsRules(robots)
    assert(Web.robotsOptOut(rules, bot = "graftbot")
      .collect().map(_.getString(0)).toSeq == Seq("cased.com"))
    assert(Web.robotsOptOut(rules, bot = "GRAFTBOT")
      .collect().map(_.getString(0)).toSeq == Seq("cased.com"))
    assert(Web.robotsOptOut(rules, bot = "otherbot").isEmpty)
  }

  test("crawlDelay: group selection without fallback, conservative max, non-numeric ignored") {
    val robots = Seq(
      // specific group eclipses * — and carries NO delay: NULL, not 9
      ("a.com", "User-agent: *\nCrawl-delay: 9\nUser-agent: graftbot\nDisallow: /x"),
      // star-only host: its delay applies; contradictory values -> max
      ("b.com", "User-agent: *\nCrawl-delay: 2\nDisallow: /y\nUser-agent: *\nCrawl-delay: 7"),
      // non-numeric delay ignored -> NULL
      ("c.com", "User-agent: graftbot\nCrawl-delay: fast\nDisallow: /z"),
      // no applicable group for graftbot at all -> no row
      ("d.com", "User-agent: otherbot\nCrawl-delay: 3\nDisallow: /"))
      .toDF("host", "text")
    val got = Web.crawlDelay(Web.robotsRules(robots)).collect()
      .map(r => r.getString(0) ->
        ((Option(r.get(1)).map(_.toString.toLong), r.getString(2)))).toMap
    assert(got == Map(
      "a.com" -> ((None, "specific")),
      "b.com" -> ((Some(7L), "wildcard")),
      "c.com" -> ((None, "specific"))))
  }

  test("empty specific group still eclipses * (RFC 9309) — verdict and delay") {
    // graftbot's group carries NO rule lines at all; RFC 9309 group
    // selection still makes it the matched group (allow everything),
    // eclipsing the * group's Disallow: / — the r14-advice fix: the
    // parser emits a marker row per group, so selection can SEE it
    val robots = Seq(("e.com",
      "User-agent: *\nDisallow: /\nUser-agent: graftbot"))
    val v = verdicts(robots, Seq((1L, "https://e.com/x"), (2L, "https://e.com/")))
    assert(v(1L) == ((None, None, true)))
    assert(v(2L) == ((None, None, true)))
    // otherbot is NOT covered by the empty group: * applies, / blocked
    val vo = verdicts(robots, Seq((3L, "https://e.com/x")), bot = "otherbot")
    assert(vo(3L) == ((Some("disallow"), Some("/"), false)))
    // the delay census attributes the (empty) specific group: NULL delay
    val d = Web.crawlDelay(Web.robotsRules(robots.toDF("host", "text")))
      .collect().map(r => r.getString(0) ->
        ((Option(r.get(1)).map(_.toString.toLong), r.getString(2)))).toMap
    assert(d == Map("e.com" -> ((None, "specific"))))
  }

  private def verdicts(robots: Seq[(String, String)],
                       urls: Seq[(Long, String)],
                       bot: String = "graftbot")
      : Map[Long, (Option[String], Option[String], Boolean)] =
    Web.robotsUrlVerdict(urls.toDF("doc_id", "url"),
      Web.robotsRules(robots.toDF("host", "text")), bot)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(3)), Option(r.getString(4)), r.getBoolean(5))))
      .toMap

  test("robotsUrlVerdict: wildcard, anchor, longest-match, allow-wins tie") {
    val robots = Seq(("s.com", Seq(
      "User-agent: *",
      "Disallow: /a/*/c",     // wildcard prefix
      "Allow: /a/b/c$",       // anchored, longer -> wins EXACT /a/b/c
      "Disallow: /fish*.php", // mid-pattern wildcard
      "Disallow: /dir$",      // anchored: /dir only, not /dir/x
      "Disallow: /p",         // short prefix
      "Allow: /pg"            // longer allow overrides for /pg...
    ).mkString("\n")))
    def v(path: String) =
      verdicts(robots, Seq((1L, s"http://s.com$path")))(1L)
    // wildcard matches any run incl. empty continuation chars
    assert(v("/a/x/c") == ((Some("disallow"), Some("/a/*/c"), false)))
    assert(v("/a/x/y/c?q=1") == ((Some("disallow"), Some("/a/*/c"), false)))
    // exact /a/b/c: both match; the anchored allow is longer as
    // written (7 octets incl. '$' vs 6) -> allow wins by length
    assert(v("/a/b/c") == ((Some("allow"), Some("/a/b/c$"), true)))
    // the anchor forbids continuation: /a/b/cd only matches the disallow
    assert(v("/a/b/cd") == ((Some("disallow"), Some("/a/*/c"), false)))
    assert(v("/fish-cake.php") ==
      ((Some("disallow"), Some("/fish*.php"), false)))
    // $ anchors: /dir blocked, /dir/x falls through to no match
    assert(v("/dir") == ((Some("disallow"), Some("/dir$"), false)))
    assert(v("/dir/x") == ((None, None, true)))
    // longest-match: /pg hits both /p (2) and /pg (3) -> allow wins
    assert(v("/pgrave") == ((Some("allow"), Some("/pg"), true)))
    assert(v("/plain") == ((Some("disallow"), Some("/p"), false)))
    // equal length tie -> allow wins ('/ab' vs '/ab')
    val tie = Seq(("t.com", "User-agent: *\nDisallow: /ab\nAllow: /ab"))
    assert(verdicts(tie, Seq((9L, "http://t.com/abc")))(9L) ==
      ((Some("allow"), Some("/ab"), true)))
  }

  test("robotsUrlVerdict: group selection, empty patterns, LIKE metachars, target edges") {
    // a specific group ECLIPSES '*' entirely (its allow does not leak)
    val robots = Seq(("g.com", Seq(
      "User-agent: *", "Allow: /open",
      "User-agent: GraftBot", "Disallow:", "Disallow: /open/sub"
    ).mkString("\n")))
    assert(verdicts(robots, Seq((1L, "http://g.com/open/sub/x")))(1L) ==
      ((Some("disallow"), Some("/open/sub"), false)))
    // empty Disallow matches nothing; /open is NOT allowed-by-rule
    // (star group ignored) but allowed-by-default
    assert(verdicts(robots, Seq((2L, "http://g.com/open")))(2L) ==
      ((None, None, true)))
    // for another bot the star group applies
    assert(verdicts(robots, Seq((3L, "http://g.com/open/sub/x")),
      bot = "otherbot")(3L) == ((Some("allow"), Some("/open"), true)))
    // group selection sees ALL rules (the review-pass fix): a specific
    // group carrying ONLY a Crawl-delay still eclipses '*' — graftbot
    // crawls everything at its own pace, the star Disallow never applies
    val delayOnly = Seq(("d.com",
      "User-agent: graftbot\nCrawl-delay: 10\nUser-agent: *\nDisallow: /"))
    assert(verdicts(delayOnly, Seq((1L, "http://d.com/anything")))(1L) ==
      ((None, None, true)))
    assert(verdicts(delayOnly, Seq((2L, "http://d.com/x")),
      bot = "otherbot")(2L) == ((Some("disallow"), Some("/"), false)))
    // SQL-LIKE metachars in patterns/targets are literal robots chars:
    // '%'/'_'/'!' must not act as wildcards or escapes
    val meta = Seq(("m.com",
      "User-agent: *\nDisallow: /100%_off!\nDisallow: /u_*id$"))
    assert(verdicts(meta, Seq((1L, "http://m.com/100%_off!now")))(1L) ==
      ((Some("disallow"), Some("/100%_off!"), false)))
    // '_' is literal: /100X_off! must NOT match /100%_off!
    assert(verdicts(meta, Seq((2L, "http://m.com/100X_off!")))(2L) ==
      ((None, None, true)))
    assert(verdicts(meta, Seq((3L, "http://m.com/u_77id")))(3L) ==
      ((Some("disallow"), Some("/u_*id$"), false)))
    // target is path+query, '/' when empty; host folds case/www/port;
    // a host with no robots rows allows everything
    val root = Seq(("r.com", "User-agent: *\nDisallow: /$"))
    assert(verdicts(root, Seq((1L, "HTTP://WWW.R.COM:80")))(1L) ==
      ((Some("disallow"), Some("/$"), false)))
    assert(verdicts(root, Seq((2L, "http://r.com/?q=1")))(2L) ==
      ((None, None, true)))
    assert(verdicts(root, Seq((3L, "http://norules.com/x")))(3L) ==
      ((None, None, true)))
  }
}
