package graft

import org.apache.spark.sql.functions._
import graft.ops.LinkGraph

/** The crawl link-graph leg: href extraction, RFC 3986 reference
  * resolution (hand-computed cases incl. the bounded dot-segment
  * contract), the outlinks edge frame (scheme filter, canonical
  * endpoints, internal flag), the host rollup, and the PageRank
  * host-quality prior on a graph whose ordering is known.
  */
class LinkGraphSpec extends SparkTestBase {
  import spark.implicits._

  private def resolve(base: String, href: String): Option[String] = {
    val r = Seq((base, href)).toDF("b", "h")
      .select(LinkGraph.resolveUrl(col("b"), col("h")).as("r"))
      .head()
    if (r.isNullAt(0)) None else Some(r.getString(0))
  }

  test("resolveUrl: hand-computed RFC 3986 cases") {
    val base = "https://a.example.com/dir/page.html"
    assert(resolve(base, "b.html").contains("https://a.example.com/dir/b.html"))
    assert(resolve(base, "/x/y").contains("https://a.example.com/x/y"))
    assert(resolve(base, "//cdn.com/z").contains("https://cdn.com/z"))
    assert(resolve(base, "../up").contains("https://a.example.com/up"))
    assert(resolve(base, "./same").contains("https://a.example.com/dir/same"))
    assert(resolve(base, "a/../b/./c").contains("https://a.example.com/dir/b/c"))
    // absolute references pass through (case kept — canonicalization is
    // the NEXT stage's job); non-http schemes survive resolution and
    // die at the outlinks scheme filter
    assert(resolve(base, "HTTP://UP.COM/Q").contains("HTTP://UP.COM/Q"))
    assert(resolve(base, "mailto:x@y.z").contains("mailto:x@y.z"))
    // fragment-only and empty href: no edge
    assert(resolve(base, "#frag").isEmpty)
    assert(resolve(base, "").isEmpty)
    // fragment stripped before resolution
    assert(resolve(base, "b.html#sec").contains("https://a.example.com/dir/b.html"))
  }

  test("resolveUrl: base with root path, trailing-dot segment, deep ../ chain") {
    assert(resolve("https://h.com/", "p").contains("https://h.com/p"))
    // base path with no slash after authority: directory is /
    assert(resolve("https://h.com", "p").contains("https://h.com/p"))
    assert(resolve("https://h.com/a/b/c/page", "../../x")
      .contains("https://h.com/a/x"))
    assert(resolve("https://h.com/d/", ".").contains("https://h.com/d/"))
    // four nested levels — the documented pass bound
    assert(resolve("https://h.com/a/b/c/d/e/page", "../../../../x")
      .contains("https://h.com/a/x"))
  }

  test("fuzz: resolution matches java.net.URI (the JDK's RFC 3986 resolver) within contract") {
    val rng = new scala.util.Random(77)
    val bases = Seq(
      "https://a.example.com/dir/page.html",
      "https://b.com/a/b/c/page",
      "http://c.com/",
      "http://d.com",
      "https://e.com/x/y/?q=1",
      "HTTP://F.com/Mixed/Case/p")
    val segs = Vector("x", "y2", "img.png", "a-b_c", ".")
    def randRef(): String = rng.nextInt(12) match {
      case 0 => "https://other.com/" + segs(rng.nextInt(4))
      case 1 => "//cdn.net/" + segs(rng.nextInt(4))
      case 2 | 3 => "/" + (0 to rng.nextInt(3)).map(_ => segs(rng.nextInt(4))).mkString("/")
      case 4 => "?k=" + rng.nextInt(10)
      case 5 => "../" + (0 to rng.nextInt(2)).map(_ => segs(rng.nextInt(4))).mkString("/")
      case _ => (0 to rng.nextInt(3)).map(_ => segs(rng.nextInt(segs.size))).mkString("/")
    }
    def lcScheme(u: String): String =
      u.replaceFirst("^[A-Za-z][A-Za-z0-9+.-]*:",
        u.takeWhile(_ != ':').toLowerCase + ":")
    val pairs = (1 to 400).map(_ => (bases(rng.nextInt(bases.size)), randRef()))
    var checked = 0
    pairs.foreach { case (b, h) =>
      val want = scala.util.Try(new java.net.URI(b).resolve(h).toString).toOption
      // contract: depth-bounded dot segments; pairs whose REFERENCE
      // result escapes the root (java keeps excess ..) are out of it.
      // ?query-only refs are EXCLUDED from the java battery: java.net
      // .URI resolves them against the parent directory, while RFC
      // 3986 §5.3 keeps the FULL base path when the ref path is empty
      // and a query is defined — this resolver follows the RFC (the
      // dedicated test below pins it)
      want match {
        case Some(w) if !w.contains("/../") && !w.contains("/..?") &&
            !w.endsWith("/..") && !h.startsWith("?") =>
          val got = resolve(b, h)
          assert(got.map(lcScheme).contains(lcScheme(w)),
            s"resolve drift: base=<$b> href=<$h> got=<$got> want=<$w>")
          checked += 1
        case _ => () // out of contract or unparseable — skipped
      }
    }
    assert(checked >= 300, s"battery too thin: $checked checked")
  }

  test("?query-only reference keeps the base path, replaces the query") {
    assert(resolve("https://e.com/x/y?q=1", "?k=2")
      .contains("https://e.com/x/y?k=2"))
    assert(resolve("http://d.com", "?k=1").contains("http://d.com?k=1"))
  }

  test("extractHrefs: case-insensitive name, both quote styles, > fence") {
    val html = """<a HREF="/one">1</a><a href='two.html'>2</a>""" +
      """<area href="#f"><link hREf='//c.com/s.css'>""" +
      // unterminated quote must not swallow the following tag
      """<a href="broken>ignored</a><a href="/after">3</a>"""
    val got = Seq(html).toDF("h")
      .select(LinkGraph.extractHrefs(col("h")).as("a"))
      .head().getSeq[String](0)
    assert(got == Seq("/one", "two.html", "#f", "//c.com/s.css", "/after"))
  }

  test("outlinks: scheme filter, canonical endpoints, internal flag, occurrence weight") {
    val pages = Seq(
      (1L, "https://www.A.example.com/p/1",
        """<a href="/p/2?utm_source=x&b=1">i</a>""" +
          """<a href="HTTPS://Other.COM:443/Z/">x</a>""" +
          """<a href="/p/2?b=1">i2</a>""" +
          """<a href="mailto:u@v">m</a><a href="#t">f</a>""" +
          """<a href="javascript:void(0)">j</a>"""),
      (2L, "https://b.com/q", """<a href="../r">up</a>"""))
      .toDF("doc_id", "url", "html")
    val got = LinkGraph.outlinks(pages)
      .orderBy("doc_id", "dst_url").collect()
    assert(got.length == 4)
    // www. stripped + lowercased on the src side
    assert(got.take(3).forall(_.getString(1) == "a.example.com"))
    // the two /p/2 variants canonicalize to the SAME dst (tracking param
    // dropped) — two rows, occurrence weight preserved
    assert(got.count(r => r.getString(2) == "https://a.example.com/p/2?b=1"
      && r.getBoolean(4)) == 2)
    assert(got.map(_.getString(2)).contains("https://other.com/Z"))
    assert(got.filter(_.getLong(0) == 2L).map(_.getString(2)).toSeq ==
      Seq("https://b.com/r"))
  }

  test("hostGraph + hostRank: rollup counts; cross-host-only rank ordering") {
    val links = Seq(
      (1L, "a.com", "https://b.com/1", "b.com"),
      (1L, "a.com", "https://b.com/2", "b.com"),
      (2L, "a.com", "https://b.com/1", "b.com"),
      (2L, "a.com", "https://a.com/self", "a.com"), // self-loop: graph-kept, rank-excluded
      (3L, "b.com", "https://a.com/x", "a.com"),
      (4L, "c.com", "https://b.com/3", "b.com"))
      .toDF("doc_id", "src_host", "dst_url", "dst_host")
      .withColumn("internal", col("src_host") === col("dst_host"))
    val g = LinkGraph.hostGraph(links).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(g(("a.com", "b.com")) == (3L, 2L)) // 3 links from 2 pages
    assert(g(("a.com", "a.com")) == (1L, 1L))
    assert(g(("b.com", "a.com")) == (1L, 1L))
    // one micro-rank iteration, hand-computed (self-loop excluded):
    // in(b) = 3*(1e6 div 3) + 1e6 = 1999999 (integer floor!) ->
    // 150000 + 85*1999999 div 100 = 1849999; in(a) = 1e6; in(c) = 0
    val r1 = LinkGraph.hostRank(links, iters = 1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r1 == Map("a.com" -> 1000000L, "b.com" -> 1849999L,
      "c.com" -> 150000L))
    val rank = LinkGraph.hostRank(links).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rank("b.com") > rank("a.com") && rank("a.com") > rank("c.com"))
  }
}
