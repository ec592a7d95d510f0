package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.crawl._
import graft.schema.{FetchStatus => FS}

/** Round-4 hardening of the crawl loop: durable frontier commits through
  * FrontierStore (reference contract …/flinkcrawler/tools/CrawlTool
  * .java:60-64 — a crawl survives a driver restart), sitemaps fetched once
  * per crawl (not once per round), pluggable wall-clock termination
  * (…/config/DurationCrawlTerminator.java:7-37), and the parse watchdog
  * (…/config/ParserPolicy.java:14-18).
  */
class CrawlDurabilitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val graph = WebGraph(
    "a.com" -> Seq("a.com/p1", "a.com/p2", "b.com"),
    "a.com/p1" -> Seq("a.com/p2"),
    "a.com/p2" -> Seq.empty,
    "b.com" -> Seq.empty)

  private def countingFetcher() = new Fetcher {
    val base = new WebGraphFetcher(graph)
    override def fetch(url: String): FetchedPage = {
      FetchLog.urls.add(url)
      base.fetch(url)
    }
  }

  test("frontierRoot: a restarted crawl resumes from the store and refetches nothing") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-durable-frontier").toString
    val cfg = CrawlConfig(maxRounds = 15, frontierRoot = Some(root))
    FetchLog.urls.clear()
    val first = CrawlTopology.run(
      spark, Seq(("a.com", 1.0f)),
      countingFetcher(), new MapRobotsFetcher(Map.empty), cfg)
    assert(!FetchLog.urls.isEmpty, "sanity: the first run must fetch")
    val firstSnapshot = first.frontier
      .select("url", "status").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(firstSnapshot.contains(("http://a.com/p2", FS.FETCHED)))

    // the store alone carries the state: same root, NO in-memory frontier
    // handoff — this is the driver-restart path
    FetchLog.urls.clear()
    val resumed = CrawlTopology.run(
      spark, Seq(("a.com", 1.0f)),
      countingFetcher(), new MapRobotsFetcher(Map.empty), cfg)
    import scala.jdk.CollectionConverters._
    val refetched = FetchLog.urls.asScala.toSeq
      .filterNot(_.endsWith("/robots.txt"))
    assert(refetched.isEmpty, s"refetched after restart: $refetched")
    val resumedSnapshot = resumed.frontier
      .select("url", "status").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(resumedSnapshot == firstSnapshot)
    // and the store itself reflects the same committed state
    val stored = FrontierStore.read(spark, root).get
      .select("url", "status").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(stored == firstSnapshot)
  }

  test("sitemap is fetched once per crawl, not once per round") {
    val sitemapUrl = "http://chain.com/sitemap.xml"
    val sitemapBody =
      "<urlset><url><loc>http://chain.com/from-sitemap</loc></url></urlset>"
    // a chain keeps the domain active for several scheduling rounds
    val g = WebGraph(
      "chain.com" -> Seq("chain.com/c1"),
      "chain.com/c1" -> Seq("chain.com/c2"),
      "chain.com/c2" -> Seq("chain.com/c3"),
      "chain.com/c3" -> Seq.empty,
      "chain.com/from-sitemap" -> Seq.empty)
    FetchLog.urls.clear()
    val fetcher = new Fetcher {
      val base = new WebGraphFetcher(g)
      override def fetch(url: String): FetchedPage = {
        FetchLog.urls.add(url)
        if (url == sitemapUrl) FetchedPage(200, sitemapBody, "application/xml")
        else base.fetch(url)
      }
    }
    val robots = new MapRobotsFetcher(Map(
      "http://chain.com/robots.txt" ->
        s"User-agent: *\nSitemap: $sitemapUrl\n"))
    val r = CrawlTopology.run(
      spark, Seq(("chain.com", 1.0f)), fetcher, robots,
      CrawlConfig(maxRounds = 20))
    assert(r.rounds >= 4, "sanity: the chain must take several rounds")
    import scala.jdk.CollectionConverters._
    val sitemapFetches = FetchLog.urls.asScala.count(_ == sitemapUrl)
    assert(sitemapFetches == 1,
      s"sitemap fetched $sitemapFetches times across ${r.rounds} rounds")
    val statuses = r.frontier.select("url", "status").collect()
      .map(x => (x.getString(0), x.getString(1))).toMap
    assert(statuses.get("http://chain.com/from-sitemap").contains(FS.FETCHED))
  }

  test("duration terminator stops a continuous (recrawl) crawl") {
    // logical clock: each isTerminated() consultation advances 100 ms;
    // the 450 ms budget trips after ~4 rounds even though recrawl mode
    // would otherwise run to maxRounds
    var tick = 0L
    val clock = () => { tick += 100; tick }
    val term = new DurationCrawlTerminator(450, clock)
    val g = WebGraph("loop.com" -> Seq.empty)
    val r = CrawlTopology.run(
      spark, Seq(("loop.com", 1.0f)),
      new WebGraphFetcher(g), new MapRobotsFetcher(Map.empty),
      CrawlConfig(maxRounds = 1000, recrawlIntervalMs = Some(1L),
        terminator = Some(term)))
    assert(r.rounds < 10,
      s"terminator must stop the endless recrawl, ran ${r.rounds} rounds")
  }

  test("unopened duration terminator never trips") {
    val term = new DurationCrawlTerminator(0, () => 1000000L)
    assert(!term.isTerminated())
    term.open()
    assert(term.isTerminated())
  }

  test("no-activity terminator stops an idle continuous crawl") {
    // recrawl interval far beyond the clock horizon: after round 1 fetches
    // the only page, every later round schedules nothing — a duration-less
    // continuous crawl would spin to maxRounds; the idle clock trips it
    var tick = 0L
    val clock = () => { tick += 100; tick }
    val term = new NoActivityCrawlTerminator(1000, clock)
    val g = WebGraph("idle.com" -> Seq.empty)
    val r = CrawlTopology.run(
      spark, Seq(("idle.com", 1.0f)),
      new WebGraphFetcher(g), new MapRobotsFetcher(Map.empty),
      CrawlConfig(maxRounds = 1000, recrawlIntervalMs = Some(Long.MaxValue / 4),
        terminator = Some(term)))
    assert(r.rounds > 1, "the seed round must have run")
    assert(r.rounds < 30,
      s"idle crawl must stop on the no-activity bound, ran ${r.rounds} rounds")
    val statuses = r.frontier.select("url", "status").collect()
      .map(x => (x.getString(0), x.getString(1))).toMap
    assert(statuses.get("http://idle.com/").contains(FS.FETCHED),
      "activity (the one fetch) must precede the idle-out")
  }

  test("no-activity terminator resets on reportActivity, never trips unopened") {
    var tick = 0L
    val term = new NoActivityCrawlTerminator(1000, () => tick)
    assert(!term.isTerminated(), "unopened must not trip")
    tick = 10000
    assert(!term.isTerminated(), "still unopened")
    term.open() // idle clock anchored at 10000
    tick = 10900
    assert(!term.isTerminated())
    term.reportActivity() // re-anchored at 10900
    tick = 11800
    assert(!term.isTerminated(), "activity must reset the idle clock")
    tick = 11900
    assert(term.isTerminated(), "1000 ms idle after last activity")
  }

  test("throwing fetchers downgrade to error statuses, crawl completes") {
    val g = WebGraph(
      "ok.com" -> Seq("ok.com/good", "ok.com/bomb"),
      "ok.com/good" -> Seq.empty,
      "throwy.com" -> Seq.empty)
    val base = new WebGraphFetcher(g)
    val pageFetcher = new Fetcher {
      override def fetch(url: String): FetchedPage =
        if (url.contains("/bomb")) throw new java.io.IOException("reset")
        else base.fetch(url)
    }
    // robots for throwy.com explodes too: the domain must still be crawled
    // under the allow-all error fallback instead of failing the round
    val robotsFetcher = new Fetcher {
      override def fetch(url: String): FetchedPage =
        if (url.contains("throwy.com"))
          throw new RuntimeException("robots fetch died")
        else FetchedPage(404, "", "text/plain")
    }
    val r = CrawlTopology.run(
      spark, Seq(("ok.com", 1.0f), ("throwy.com", 1.0f)),
      pageFetcher, robotsFetcher, CrawlConfig(maxRounds = 10))
    val statuses = r.frontier.select("url", "status").collect()
      .map(x => (x.getString(0), x.getString(1))).toMap
    assert(statuses.get("http://ok.com/bomb").contains(FS.ERROR_IOEXCEPTION),
      s"throwing page fetch must journal, got $statuses")
    assert(statuses.get("http://ok.com/good").contains(FS.FETCHED))
    assert(statuses.get("http://throwy.com/").contains(FS.SKIPPED_DEFERRED),
      "throwing robots fetch must DEFER the domain (retryable skip, " +
        s"reference CheckUrlWithRobotsFunction.java:224), got $statuses")
  }

  test("RobotsCache: throwing fetcher caches allow-NONE under the error TTL") {
    val scope = "robots-throw-spec"
    var calls = 0
    val boom = new Fetcher {
      override def fetch(url: String): FetchedPage = {
        calls += 1
        throw new java.io.IOException("robots down")
      }
    }
    val rules = RobotsCache.rulesFor(
      "http://err.com/robots.txt", boom, nowMs = 1000L, scope = scope)
    assert(!rules.isAllowed("/anything"),
      "unreachable robots.txt must defer the domain (RFC 9309), not crawl it")
    assert(rules.deferVisits,
      "error-path rules must carry the defer flag (SKIPPED_DEFERRED, " +
        "not SKIPPED_BLOCKED, downstream)")
    assert(calls == 1)
    // within the error TTL: served from cache, no refetch
    RobotsCache.rulesFor(
      "http://err.com/robots.txt", boom,
      nowMs = 1000L + RobotsCache.ErrorTtlMs - 1, scope = scope)
    assert(calls == 1, "cached error entry must not refetch inside its TTL")
    // past the error TTL: retried (and fails again, re-cached)
    RobotsCache.rulesFor(
      "http://err.com/robots.txt", boom,
      nowMs = 1000L + RobotsCache.ErrorTtlMs + 1, scope = scope)
    assert(calls == 2, "expired error entry must be refetched")
    RobotsCache.clearScope(scope)
  }

  test("RobotsCache: status-dependent fallbacks — 4xx allow-all, 5xx allow-none") {
    val scope = "robots-status-spec"
    def fixed(status: Int) = new Fetcher {
      override def fetch(url: String): FetchedPage =
        FetchedPage(status, "", "text/plain")
    }
    val missing = RobotsCache.rulesFor(
      "http://nf.com/robots.txt", fixed(404), nowMs = 1000L, scope = scope)
    assert(missing.isAllowed("/page"), "404 (no robots.txt) is allow-all")
    val forbidden = RobotsCache.rulesFor(
      "http://fb.com/robots.txt", fixed(403), nowMs = 1000L, scope = scope)
    assert(forbidden.isAllowed("/page"), "4xx is allow-all per RFC 9309")
    val down = RobotsCache.rulesFor(
      "http://dn.com/robots.txt", fixed(503), nowMs = 1000L, scope = scope)
    assert(!down.isAllowed("/page"),
      "5xx (unreachable) must assume full disallow per RFC 9309")
    assert(down.deferVisits && !missing.deferVisits,
      "only the indeterminate (5xx) stance defers; 4xx allow-all does not")
    RobotsCache.clearScope(scope)
  }

  test("safeFetch maps exception kinds to distinct statuses") {
    def throwing(e: Throwable) = new Fetcher {
      override def fetch(url: String): FetchedPage = throw e
    }
    import graft.schema.{FetchStatus => F}
    assert(F.fromHttpStatus(Fetcher.safeFetch(
      throwing(new java.io.IOException("dns")), "http://x.com/").statusCode)
      == F.ERROR_IOEXCEPTION)
    assert(F.fromHttpStatus(Fetcher.safeFetch(
      throwing(new java.net.MalformedURLException("bad")), "::").statusCode)
      == F.ERROR_INVALID_URL)
    assert(F.fromHttpStatus(Fetcher.safeFetch(
      throwing(new java.net.SocketTimeoutException("slow")), "http://x.com/")
      .statusCode) == F.ABORTED_FETCH)
  }

  test("parse watchdog: pathological page journals ERROR_PARSE, crawl continues") {
    // quadratic-backtracking bait for the anchor regex: many '<a ' openers,
    // no closing '</a>' — each match attempt scans the rest of the page
    val evil = ("<a " + ("b" * 2000) + " ") * 2000
    val g = WebGraph(
      "mix.com" -> Seq("mix.com/ok", "mix.com/evil"),
      "mix.com/ok" -> Seq.empty)
    val fetcher = new Fetcher {
      val base = new WebGraphFetcher(g)
      override def fetch(url: String): FetchedPage =
        if (url == "http://mix.com/evil") FetchedPage(200, evil, "text/html")
        else base.fetch(url)
    }
    val r = CrawlTopology.run(
      spark, Seq(("mix.com", 1.0f)),
      fetcher, new MapRobotsFetcher(Map.empty),
      CrawlConfig(maxRounds = 10, parseBudgetMs = 200L))
    val parseFailed = r.journal
      .filter(col("stage") === "parse_failed")
      .select("url", "status").collect()
      .map(x => (x.getString(0), x.getString(1)))
    assert(parseFailed.toSeq == Seq(("http://mix.com/evil", FS.ERROR_PARSE)))
    // the healthy page still parsed and the evil page is NOT in parsed
    val parsedUrls = r.parsed.select("url").collect().map(_.getString(0)).toSet
    assert(parsedUrls.contains("http://mix.com/ok"))
    assert(!parsedUrls.contains("http://mix.com/evil"))
    // the page itself still counts as FETCHED in the frontier
    val st = r.frontier.filter(col("url") === "http://mix.com/evil")
      .select("status").collect().map(_.getString(0)).toSeq
    assert(st == Seq(FS.FETCHED))
  }

  test("binary content path: ISO-8859-1 page round-trips fetch -> parse") {
    val latin1 = "café crème menü"
    val html =
      s"<html><head><title>$latin1</title></head><body>$latin1</body></html>"
    val bytes = html.getBytes(java.nio.charset.Charset.forName("ISO-8859-1"))
    // sanity: these bytes are NOT valid UTF-8 — a charset-blind decode
    // would mangle them, which is exactly what the byte path prevents
    assert(new String(bytes, java.nio.charset.StandardCharsets.UTF_8) != html)
    val fetcher = new Fetcher {
      override def fetch(url: String): FetchedPage =
        FetchedPage(200, "", "text/html; charset=ISO-8859-1", bytes = bytes)
    }
    val r = CrawlTopology.run(
      spark, Seq(("latin.com", 1.0f)),
      fetcher, new MapRobotsFetcher(Map.empty),
      CrawlConfig(maxRounds = 3))
    val parsed = r.parsed.select("title", "text").collect()
    assert(parsed.nonEmpty, "the page must parse")
    assert(parsed.head.getString(0) == latin1,
      s"title mangled: '${parsed.head.getString(0)}'")
    assert(parsed.head.getString(1).contains(latin1))
  }

  test("charsetFromContentType: declared, quoted, invalid, missing") {
    import graft.functions.UrlFunctions.charsetFromContentType
    import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
    assert(charsetFromContentType("text/html; charset=ISO-8859-1") == ISO_8859_1)
    assert(charsetFromContentType("text/html; charset=\"iso-8859-1\"") == ISO_8859_1)
    assert(charsetFromContentType("text/html; CHARSET=utf-8") == UTF_8)
    assert(charsetFromContentType("text/html; charset=not-a-charset") == UTF_8)
    assert(charsetFromContentType("text/html") == UTF_8)
    assert(charsetFromContentType(null) == UTF_8)
  }

  test("encodeForFetch: strict declared-charset encode, UTF-8 fallback rewrites contentType") {
    import graft.functions.UrlFunctions.{charsetFromContentType, encodeForFetch}
    // representable: identity round-trip under the declared charset
    val (b1, ct1) = encodeForFetch("café", "text/html; charset=ISO-8859-1")
    assert(ct1 == "text/html; charset=ISO-8859-1")
    assert(new String(b1, charsetFromContentType(ct1)) == "café")
    // NOT representable in latin-1 (emoji): falls back to UTF-8 and
    // rewrites the declared charset so decode still round-trips —
    // never the JVM default '?' substitution
    val emoji = "café 😀"
    val (b2, ct2) = encodeForFetch(emoji, "text/html; charset=ISO-8859-1")
    assert(ct2.toLowerCase.contains("charset=utf-8"), ct2)
    assert(new String(b2, charsetFromContentType(ct2)) == emoji)
    // no declared charset: UTF-8 both ways, contentType untouched
    val (b3, ct3) = encodeForFetch(emoji, "text/html")
    assert(ct3 == "text/html")
    assert(new String(b3, charsetFromContentType(ct3)) == emoji)
    // decode-only charset (ISO-2022-CN passes Charset.forName but its
    // newEncoder() throws UnsupportedOperationException): must fall back
    // to UTF-8 + contentType rewrite instead of crashing the fetch task
    val cs2022 = java.nio.charset.Charset.forName("ISO-2022-CN")
    assume(!cs2022.canEncode, "JVM grew an ISO-2022-CN encoder")
    val (b4, ct4) = encodeForFetch("中文 text", "text/html; charset=ISO-2022-CN")
    assert(ct4.toLowerCase.contains("charset=utf-8"), ct4)
    assert(new String(b4, charsetFromContentType(ct4)) == "中文 text")
  }

  test("failed sitemap fetch is retried next round, not blacked out") {
    val sitemapUrl = "http://flaky.com/sitemap.xml"
    val g = WebGraph(
      "flaky.com" -> Seq("flaky.com/c1"),
      "flaky.com/c1" -> Seq("flaky.com/c2"),
      "flaky.com/c2" -> Seq("flaky.com/c3"),
      "flaky.com/c3" -> Seq.empty)
    FetchLog.urls.clear()
    val fetcher = new Fetcher {
      val base = new WebGraphFetcher(g)
      override def fetch(url: String): FetchedPage = {
        FetchLog.urls.add(url)
        if (url == sitemapUrl) FetchedPage(503, "", "text/plain")
        else base.fetch(url)
      }
    }
    val robots = new MapRobotsFetcher(Map(
      "http://flaky.com/robots.txt" ->
        s"User-agent: *\nSitemap: $sitemapUrl\n"))
    val r = CrawlTopology.run(
      spark, Seq(("flaky.com", 1.0f)), fetcher, robots,
      CrawlConfig(maxRounds = 20))
    assert(r.rounds >= 4)
    import scala.jdk.CollectionConverters._
    val attempts = FetchLog.urls.asScala.count(_ == sitemapUrl)
    assert(attempts >= 2,
      s"failing sitemap must stay eligible for retry, attempts=$attempts")
  }

  test("journal/parsed compaction preserves content (compactEvery=1 vs huge)") {
    def snap(compactEvery: Int) = {
      val r = CrawlTopology.run(
        spark, Seq(("a.com", 1.0f)),
        new WebGraphFetcher(graph), new MapRobotsFetcher(Map.empty),
        CrawlConfig(maxRounds = 15, compactEvery = compactEvery))
      (r.journal.select("round", "stage", "url", "status").collect()
        .map(x => (x.getInt(0), x.getString(1), x.getString(2), x.getString(3)))
        .toSet,
        r.parsed.select("url", "title").collect()
          .map(x => (x.getString(0), x.getString(1))).toSet)
    }
    val (j1, p1) = snap(1)
    val (j2, p2) = snap(1000)
    assert(j1 == j2)
    assert(p1 == p2)
  }
}
