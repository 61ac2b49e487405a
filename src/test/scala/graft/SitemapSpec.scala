package graft

import org.apache.spark.sql.functions._
import graft.ops.Web

/** sitemap.xml parsing: hand-computed block/field/trim/junk cases, the
  * frontier rollup on a tiny known graph, and a property-fuzz battery
  * comparing the regex chain against an independent hand-rolled block
  * scanner (the robots LIKE-compiler fuzz discipline, commit 5bcb23e).
  */
class SitemapSpec extends SparkTestBase {
  import spark.implicits._

  private def parse(host: String, xml: String) =
    Web.sitemapEntries(Seq((host, xml)).toDF("host", "text"))
      .select("kind", "loc", "lastmod", "lastmod_date", "changefreq",
        "priority")
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        Option(r.getString(2)), Option(r.getDate(3)).map(_.toString),
        Option(r.getString(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
      .toSeq

  test("hand-computed urlset: trim, junk casts, dropped blocks") {
    val xml =
      """<?xml version="1.0"?>
        |<urlset xmlns="x">
        |<url>
        |  <loc>
        |  https://a.com/p1 </loc>
        |  <lastmod>2026-01-15</lastmod>
        |  <priority>0.8</priority>
        |</url>
        |<url><loc>https://a.com/p2</loc><changefreq>daily</changefreq></url>
        |<url><loc>https://a.com/p3</loc><lastmod>junk</lastmod><priority>hi</priority></url>
        |<url><lastmod>2026-02-02</lastmod></url>
        |<url><loc>   </loc></url>
        |</urlset>""".stripMargin
    assert(parse("a.com", xml) == Seq(
      ("url", "https://a.com/p1", Some("2026-01-15"), Some("2026-01-15"),
        None, Some(0.8)),
      ("url", "https://a.com/p2", None, None, Some("daily"), None),
      ("url", "https://a.com/p3", Some("junk"), None, None, None)))
  }

  test("hand-computed sitemapindex: kind and nested-sitemap fan-out") {
    val xml = "<sitemapindex><sitemap><loc>https://a.com/s1.xml</loc>" +
      "<lastmod>2026-03-01</lastmod></sitemap>\n<sitemap>\n" +
      "<loc>https://a.com/s2.xml</loc>\n</sitemap></sitemapindex>"
    assert(parse("a.com", xml) == Seq(
      ("sitemap", "https://a.com/s1.xml", Some("2026-03-01"),
        Some("2026-03-01"), None, None),
      ("sitemap", "https://a.com/s2.xml", None, None, None, None)))
  }

  test("frontier rollup: robots gate, permitted-only priority, freshest lastmod") {
    val entries = Web.sitemapEntries(Seq(("h.com",
      "<urlset>" +
        "<url><loc>https://h.com/ok/1</loc><priority>0.4</priority>" +
        "<lastmod>2026-01-01</lastmod></url>" +
        "<url><loc>https://h.com/ok/2</loc><priority>0.9</priority></url>" +
        "<url><loc>https://h.com/private/x</loc><priority>1.0</priority>" +
        "<lastmod>2026-06-01</lastmod></url>" +
        "</urlset>")).toDF("host", "text"))
    val rules = Web.robotsRules(Seq(
      ("h.com", "User-agent: *\nDisallow: /private/")).toDF("host", "text"))
    val got = Web.sitemapFrontier(entries, rules).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getString(0) == "h.com" && r.getLong(1) == 3L &&
      r.getLong(2) == 2L && r.getDouble(3) == 0.9 &&
      r.getDate(4).toString == "2026-06-01")
  }

  // ---- property fuzz: regex chain vs an independent block scanner ----

  /** Reference parser: plain index scanning, no regex. Mirrors the
    * documented contract: non-overlapping <tag>...</tag> blocks (first
    * closing tag wins), per-field first occurrence, value stops at '<',
    * space-trimmed, block dropped without a non-empty loc. */
  private def refBlocks(text: String, tag: String): Seq[String] = {
    val open = s"<$tag>"; val close = s"</$tag>"
    val out = Seq.newBuilder[String]
    var i = 0
    var continue = true
    while (continue) {
      val s = text.indexOf(open, i)
      if (s < 0) continue = false
      else {
        val e = text.indexOf(close, s + open.length)
        if (e < 0) continue = false
        else { out += text.substring(s + open.length, e); i = e + close.length }
      }
    }
    out.result()
  }

  private def refField(block: String, tag: String): String = {
    val s = block.indexOf(s"<$tag>")
    if (s < 0) ""
    else {
      val from = s + tag.length + 2
      val e = block.indexOf('<', from)
      val raw = if (e < 0) "" else block.substring(from, e)
      // FULL whitespace trim (the op's contract — a loc on its own
      // line must not keep its newlines)
      raw.replaceAll("^\\s+", "").replaceAll("\\s+$", "")
    }
  }

  private def refParse(text: String): Seq[(String, String, String, String, String)] =
    (refBlocks(text, "url").map(("url", _)) ++
      refBlocks(text, "sitemap").map(("sitemap", _)))
      .map { case (k, b) =>
        (k, refField(b, "loc"), refField(b, "lastmod"),
          refField(b, "changefreq"), refField(b, "priority"))
      }
      .filter(_._2.nonEmpty)

  test("fuzz: 300 generated documents match the reference scanner") {
    val rng = new scala.util.Random(4242)
    val locs = Seq("https://f.com/a", "https://f.com/b?q=1", "  https://f.com/pad  ",
      "", "   ", "relative/p", "\n  https://f.com/nl\n", "\t\nhttps://f.com/tab")
    val dates = Seq("2026-01-15", "junk", "", "2026-02-30", " 2026-03-01 ",
      "\n2026-04-01\n")
    val freqs = Seq("daily", "never", "", "sometimes")
    val prios = Seq("0.5", "1.0", "high", "", "0.85")
    val junk = Seq("", "\n", "<!-- c -->", "<meta>x</meta>", "stray text", "<lastmod>orphan</lastmod>")
    def block(tag: String): String = {
      val fields = Seq(
        if (rng.nextBoolean()) s"<loc>${locs(rng.nextInt(locs.size))}</loc>" else "",
        if (rng.nextBoolean()) s"<lastmod>${dates(rng.nextInt(dates.size))}</lastmod>" else "",
        if (rng.nextBoolean() && tag == "url") s"<changefreq>${freqs(rng.nextInt(freqs.size))}</changefreq>" else "",
        if (rng.nextBoolean() && tag == "url") s"<priority>${prios(rng.nextInt(prios.size))}</priority>" else "")
      val body = rng.shuffle(fields).mkString(junk(rng.nextInt(junk.size)))
      s"<$tag>$body</$tag>"
    }
    val docs = (0 until 300).map { i =>
      val tag = if (i % 3 == 0) "sitemap" else "url"
      val n = 1 + rng.nextInt(5)
      val doc = (if (tag == "url") "<urlset>" else "<sitemapindex>") +
        (1 to n).map(_ => junk(rng.nextInt(junk.size)) + block(tag))
          .mkString("\n") +
        junk(rng.nextInt(junk.size)) +
        (if (rng.nextInt(10) == 0) s"<$tag><loc>unclosed" else "") +
        (if (tag == "url") "</urlset>" else "</sitemapindex>")
      (s"h$i.com", doc)
    }
    val got = Web.sitemapEntries(docs.toDF("host", "text"))
      .select("host", "kind", "loc", "lastmod", "changefreq", "priority")
      .collect()
      .groupBy(_.getString(0))
      .map { case (h, rs) =>
        h -> rs.map(r => (r.getString(1), r.getString(2),
          Option(r.getString(3)).getOrElse(""),
          Option(r.getString(4)).getOrElse(""),
          if (r.isNullAt(5)) "" else r.getDouble(5).toString)).toSeq
      }
    docs.foreach { case (h, text) =>
      val want = refParse(text).map { case (k, l, lm, cf, pr) =>
        (k, l, lm, cf,
          if (pr.isEmpty) ""
          else scala.util.Try(pr.toDouble.toString).getOrElse(""))
      }
      assert(got.getOrElse(h, Seq.empty) == want, s"drift on $h: <$text>")
    }
  }
}
