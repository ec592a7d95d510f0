package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.crawl.{HtmlParser, RobotsRules}

/** Parse-layer semantics from the reference's link extractor and sitemap
  * parser (SimpleLinkExtractor nofollow handling, BaseLinkExtractor anchor
  * collection, SimpleSiteMapParser loc/text formats).
  */
class HtmlParserSpec extends AnyFunSuite {

  test("extracts title, text, and absolute outlinks with anchors") {
    val html =
      """<html><head><title> My Page </title></head><body>
        |<p>Hello <b>world</b></p>
        |<a href="/rel/path">relative</a>
        |<a href="http://other.com/abs">absolute</a>
        |</body></html>""".stripMargin
    val r = HtmlParser.parse("http://d.com/base/page", html, 1.0f)
    assert(r.title == "My Page")
    assert(r.text.contains("Hello world"))
    val links = r.outlinks.map(o => o.url -> o.anchorText).toMap
    assert(links("http://d.com/rel/path") == "relative")
    assert(links("http://other.com/abs") == "absolute")
    // page score spread equally across outlinks
    assert(r.outlinks.forall(o => math.abs(o.score - 0.5f) < 1e-6))
  }

  test("base href re-bases relative links but not absolute ones") {
    val r = HtmlParser.parse(
      "http://d.com/deep/page.html",
      """<html><head><base href="http://cdn.d.com/assets/"></head>
        |<body><a href="x.html">rel</a>
        |<a href="/root.html">abs-path</a>
        |<a href="http://other.com/y">abs</a></body></html>""".stripMargin,
      1.0f)
    val urls = r.outlinks.map(_.url)
    assert(urls.contains("http://cdn.d.com/assets/x.html"))
    assert(urls.contains("http://cdn.d.com/root.html"))
    assert(urls.contains("http://other.com/y"))
  }

  test("relative base href resolves against the page url first") {
    val r = HtmlParser.parse(
      "http://d.com/a/b/page.html",
      """<base href="../up/"><a href="z.html">z</a>""",
      1.0f)
    assert(r.outlinks.map(_.url) == Seq("http://d.com/a/up/z.html"))
  }

  test("media links extract from img/video/iframe src with base resolution") {
    val links = HtmlParser.mediaLinks(
      "http://d.com/p/page.html",
      """<base href="http://cdn.d.com/m/">
        |<img src="pic.jpg"><img src="pic.jpg">
        |<video src="/clips/v.mp4"></video>
        |<iframe src="http://other.com/e"></iframe>
        |<img data-src="lazy.jpg">
        |<a href="not-media.html">x</a>""".stripMargin)
    assert(links == Seq(
      "http://cdn.d.com/m/pic.jpg",
      "http://cdn.d.com/clips/v.mp4",
      "http://other.com/e"))
  }

  test("meta robots nofollow suppresses media links too") {
    val links = HtmlParser.mediaLinks(
      "http://d.com/p",
      """<meta name="robots" content="nofollow">
        |<img src="pic.jpg">""".stripMargin)
    assert(links.isEmpty)
  }

  test("meta robots nofollow suppresses all outlinks") {
    val html =
      """<html><head><meta name="robots" content="nofollow"></head>
        |<body><a href="http://x.com/">x</a></body></html>""".stripMargin
    val r = HtmlParser.parse("http://d.com/", html, 1.0f)
    assert(r.noFollow && r.outlinks.isEmpty)
  }

  test("rel=nofollow drops only that link; fragments are skipped") {
    val html =
      """<a href="http://a.com/" rel="nofollow">no</a>
        |<a href="http://b.com/">yes</a>
        |<a href="#frag">frag</a>""".stripMargin
    val r = HtmlParser.parse("http://d.com/", html, 1.0f)
    assert(r.outlinks.map(_.url) == Seq("http://b.com/"))
  }

  test("script and style content is excluded from text") {
    val html =
      "<html><body><script>var x = 1;</script><style>.a{}</style>real</body></html>"
    val r = HtmlParser.parse("http://d.com/", html, 1.0f)
    assert(r.text == "real")
  }

  test("sitemap XML loc entries and plain-text URL lines both parse") {
    val xml = "<urlset><url><loc> http://a.com/1 </loc></url>" +
      "<url><loc>http://a.com/2</loc></url></urlset>"
    assert(HtmlParser.parseSitemap(xml) == Seq("http://a.com/1", "http://a.com/2"))
    val txt = "http://b.com/1\n# comment\nnot-a-url\nhttps://b.com/2\n"
    assert(HtmlParser.parseSitemap(txt) == Seq("http://b.com/1", "https://b.com/2"))
  }

  test("robots parsing: disallow prefixes, crawl-delay, sitemaps, comments") {
    val rules = RobotsRules.parse(
      """# a comment
        |User-agent: *
        |Disallow: /private
        |Disallow: /tmp # trailing comment
        |Crawl-delay: 2.5
        |Sitemap: http://d.com/sitemap.xml
        |Disallow:
        |""".stripMargin)
    assert(!rules.isAllowed("/private/x"))
    assert(!rules.isAllowed("/tmp"))
    assert(rules.isAllowed("/public"))
    assert(rules.crawlDelayMs.contains(2500L))
    assert(rules.sitemaps == Seq("http://d.com/sitemap.xml"))
    // empty Disallow must not block everything
    assert(rules.isAllowed("/"))
  }

  test("robots RFC 9309: Allow overrides, wildcards, end anchors") {
    val rules = RobotsRules.parse(
      """User-agent: *
        |Disallow: /shop
        |Allow: /shop/public
        |Disallow: /*.pdf$
        |Disallow: /cgi-*/run
        |Allow: /
        |""".stripMargin)
    // longest-match wins: /shop blocked, /shop/public re-allowed
    assert(!rules.isAllowed("/shop/cart"))
    assert(rules.isAllowed("/shop/public/item"))
    // $ anchors: only paths ENDING in .pdf are blocked
    assert(!rules.isAllowed("/docs/manual.pdf"))
    assert(rules.isAllowed("/docs/manual.pdf.html"))
    // mid-pattern wildcard
    assert(!rules.isAllowed("/cgi-bin/run"))
    assert(rules.isAllowed("/cgi-bin/other"))
    // bare Allow: / (len 1) loses to the longer Disallows, wins elsewhere
    assert(rules.isAllowed("/anything"))
  }

  test("robots precedence tie at equal length goes to Allow") {
    val rules = RobotsRules.parse(
      "User-agent: *\nDisallow: /a/\nAllow: /a/*\n".stripMargin)
    // '/a/*' and '/a/' differ in length; craft a true tie:
    val tie = RobotsRules.parse(
      "User-agent: *\nDisallow: /ab\nAllow: /ab\n")
    assert(tie.isAllowed("/ab/x"))
    assert(rules.isAllowed("/a/x"))
  }

  test("parse watchdog: budget bounds catastrophic backtracking") {
    // many unterminated '<a ' openers: every anchor-regex match attempt
    // rescans the tail, O(n^2) over ~4 MB — minutes unbudgeted
    val evil = ("<a " + ("x" * 2000) + " ") * 2000
    val t0 = System.nanoTime()
    val r = HtmlParser.parseWithBudget("http://e.com/", evil, 1.0f, 200L)
    val elapsedMs = (System.nanoTime() - t0) / 1000000
    assert(r.isEmpty, "pathological page must time out, not parse")
    assert(elapsedMs < 5000, s"watchdog fired too late: ${elapsedMs}ms")
  }

  test("parse watchdog: budget also covers the text-extraction pass") {
    // a run of bare '<' never matches the anchor scan (cheap) but makes
    // the tag-strip regex ('<[^>]*>') backtrack O(n^2) over the
    // INTERMEDIATE string — the guard must wrap that pass too
    val evil = "<" * 2000000
    val t0 = System.nanoTime()
    val r = HtmlParser.parseWithBudget("http://e.com/", evil, 1.0f, 200L)
    val elapsedMs = (System.nanoTime() - t0) / 1000000
    assert(r.isEmpty, "tag-strip pass must also hit the deadline")
    assert(elapsedMs < 5000, s"watchdog fired too late: ${elapsedMs}ms")
  }

  test("parse watchdog: healthy page parses within budget") {
    val html = """<html><head><title>t</title></head>
      |<body><a href="/x">x</a>hello</body></html>""".stripMargin
    val r = HtmlParser.parseWithBudget("http://e.com/", html, 1.0f, 30000L)
    assert(r.exists(_.title == "t"))
    assert(r.exists(_.outlinks.map(_.url) == Seq("http://e.com/x")))
  }
}
