package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.Executors

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.crawl._
import graft.functions.UrlFunctions

/** The broad-crawl e2e over a REAL HTTP stack: the same 4-domain web the
  * CrawlTopologySpec fixture mocks, served by an in-process loopback
  * HttpServer and crawled through [[HttpFetcher]] (robots included), must
  * produce the IDENTICAL frontier and journal facts as the mock run — the
  * "a user could point this at the live web" gate, with zero egress.
  *
  * Domain-space URLs are routed to the loopback server by a test-only
  * rewriting wrapper (http://d/p → http://127.0.0.1:port/d/p); responses
  * carry domain-space absolute URLs (outlinks, Location, sitemap locs), so
  * everything downstream of the socket — parse, redirect re-feed, robots
  * scoping, frontier merge — runs on exactly the URLs a live crawl would.
  */
class LoopbackCrawlSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkTestSession.spark

  // === the CrawlTopologySpec fixture, verbatim ===
  private val graph = WebGraph(
    "domain1.com" -> Seq(
      "domain1.com/page1", "domain1.com/page2",
      "domain1.com/blocked", "domain1.com/short"),
    "domain1.com/page1" -> Seq.empty,
    "domain1.com/page2" -> Seq("domain2.com", "domain1.com", "domain1.com/page1"),
    "domain1.com/blocked" -> Seq.empty,
    "domain1.com/rtarget" -> Seq.empty,
    "domain1.com/sitemapped" -> Seq.empty,
    "domain2.com" -> Seq("domain2.com/page1"),
    "domain2.com/page1" -> Seq("domain2.com/missing"),
    // unlinked from the 4-domain web: only the robots-5xx deferral test
    // seeds it, so the mock-parity run never sees it
    "flaky.com/p" -> Seq.empty)

  /** When true, flaky.com's robots.txt answers 503 (server error). */
  @volatile private var flakyRobotsDown = true
  private val redirects =
    Map("http://domain1.com/short" -> "http://domain1.com/rtarget")
  private val sitemapUrl = "http://domain1.com/sitemap.xml"
  private val sitemapBody =
    """<?xml version="1.0"?><urlset>
      |<url><loc>http://domain1.com/sitemapped</loc></url>
      |</urlset>""".stripMargin
  private val robotsBodies = Map(
    "http://domain1.com/robots.txt" ->
      s"""User-agent: *
         |Disallow: /blocked
         |Sitemap: $sitemapUrl
         |""".stripMargin,
    "http://domain2.com/robots.txt" ->
      """User-agent: *
        |Sitemap: http://domain2.com/no-such-sitemap.xml
        |""".stripMargin)

  private val graphFetcher =
    new WebGraphFetcher(graph, redirects = redirects)

  private var server: HttpServer = _
  private var port: Int = _

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    port = server.getAddress.getPort
    server.setExecutor(Executors.newFixedThreadPool(8))
    server.createContext("/", (ex: HttpExchange) => {
      try serve(ex)
      catch { case _: Exception => try ex.close() catch { case _: Exception => } }
    })
    server.start()
  }

  override def afterAll(): Unit = server.stop(0)

  /** Path-prefix routing back to domain space: /d1.com/p → http://d1.com/p,
    * then answer from the SAME fixtures the mock fetchers use — bodies are
    * byte-identical, so any fact divergence is the HTTP stack's fault.
    */
  private def serve(ex: HttpExchange): Unit = {
    val original = "http://" + ex.getRequestURI.getPath.stripPrefix("/")
    def respond(code: Int, body: Array[Byte], ct: String,
        extra: (String, String)*): Unit = {
      if (ct.nonEmpty) ex.getResponseHeaders.set("Content-Type", ct)
      extra.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
      ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length.toLong)
      if (body.nonEmpty) ex.getResponseBody.write(body)
      ex.close()
    }
    if (original == "http://flaky.com/robots.txt") {
      if (flakyRobotsDown) respond(503, Array.empty, "")
      else respond(200, "User-agent: *\nDisallow:\n"
        .getBytes(StandardCharsets.UTF_8), "text/plain; charset=UTF-8")
    }
    else if (original.endsWith("/robots.txt"))
      robotsBodies.get(original) match {
        case Some(b) =>
          respond(200, b.getBytes(StandardCharsets.UTF_8),
            "text/plain; charset=UTF-8")
        case None => respond(404, Array.empty, "")
      }
    else if (original == sitemapUrl)
      respond(200, sitemapBody.getBytes(StandardCharsets.UTF_8),
        "application/xml; charset=UTF-8")
    else redirects.get(UrlFunctions.normalizeUrl(original)) match {
      case Some(target) =>
        // Location carries the DOMAIN-SPACE absolute target, like a live
        // server would; the engine's redirect re-feed sees real URLs
        respond(301, Array.empty, "", "Location" -> target)
      case None =>
        val page = graphFetcher.fetch(original)
        if (page.statusCode == 200)
          respond(200, page.content.getBytes(StandardCharsets.UTF_8),
            "text/html; charset=UTF-8")
        else respond(page.statusCode, Array.empty, "")
    }
  }

  /** Test-only domain→loopback router in FRONT of the real HTTP fetcher:
    * only the request target is rewritten; the response is untouched.
    */
  private final class Routed(port: Int, inner: Fetcher) extends Fetcher {
    override def fetch(url: String): FetchedPage = {
      val u = new java.net.URI(url)
      val path = Option(u.getRawPath).getOrElse("")
      val q = Option(u.getRawQuery).map("?" + _).getOrElse("")
      inner.fetch(s"http://127.0.0.1:$port/${u.getHost}$path$q")
    }
  }

  private def facts(r: CrawlResult): (Set[(String, String)], Set[(Int, String, String, String)], Int) = (
    r.frontier.select("url", "status").collect()
      .map(x => (x.getString(0), x.getString(1))).toSet,
    r.journal.select("round", "stage", "url", "status").collect()
      .map(x => (x.getInt(0), x.getString(1), x.getString(2), x.getString(3)))
      .toSet,
    r.rounds)

  test("loopback HTTP crawl reproduces the mock crawl's frontier and journal exactly") {
    val cfg = CrawlConfig(maxRounds = 30)
    val mockRun = CrawlTopology.run(
      spark, seeds = Seq(("domain1.com", 1.0f)),
      pageFetcher = {
        val smUrl = sitemapUrl; val smBody = sitemapBody
        val base = graphFetcher
        new Fetcher {
          override def fetch(url: String): FetchedPage =
            if (url == smUrl) FetchedPage(200, smBody, "application/xml")
            else base.fetch(url)
        }
      },
      robotsFetcher = new MapRobotsFetcher(robotsBodies),
      cfg = cfg)

    val http = new HttpFetcher(HttpFetcherConfig(
      userAgent = "graft-e2e/0.1", connectTimeoutMs = 5000L,
      fetchTimeoutMs = 10000L))
    val routed = new Routed(port, http)
    val httpRun = CrawlTopology.run(
      spark, seeds = Seq(("domain1.com", 1.0f)),
      pageFetcher = routed, robotsFetcher = routed, cfg = cfg)

    val (mockFrontier, mockJournal, mockRounds) = facts(mockRun)
    val (httpFrontier, httpJournal, httpRounds) = facts(httpRun)
    assert(httpRounds == mockRounds,
      s"round counts diverged: http=$httpRounds mock=$mockRounds")
    assert(httpFrontier == mockFrontier,
      "frontier diverged:\n only-http: " +
        (httpFrontier -- mockFrontier) +
        "\n only-mock: " + (mockFrontier -- httpFrontier))
    assert(httpJournal == mockJournal,
      "journal diverged:\n only-http: " +
        (httpJournal -- mockJournal).take(20) +
        "\n only-mock: " + (mockJournal -- httpJournal).take(20))
    // sanity on the facts themselves (not just mutual agreement): the
    // redirect target got fetched, the blocked page never did
    assert(httpFrontier.contains(
      ("http://domain1.com/rtarget", graft.schema.FetchStatus.FETCHED)))
    assert(httpFrontier.contains(
      ("http://domain1.com/blocked", graft.schema.FetchStatus.SKIPPED_BLOCKED)))
    assert(httpFrontier.contains(
      ("http://domain1.com/sitemapped", graft.schema.FetchStatus.FETCHED)))
  }

  test("robots 5xx over live HTTP defers (SKIPPED_DEFERRED), re-arms after the retry interval") {
    import graft.schema.{FetchStatus => FS}
    val root = java.nio.file.Files
      .createTempDirectory("graft_defer").toString + "/frontier"
    val http = new HttpFetcher(HttpFetcherConfig(
      userAgent = "graft-e2e/0.1", connectTimeoutMs = 5000L,
      fetchTimeoutMs = 10000L))
    val routed = new Routed(port, http)
    val seeds = Seq(("flaky.com/p", 1.0f))
    def stateOf(r: CrawlResult): (String, Long, Long) = {
      val row = r.frontier
        .filter(col("url") === "http://flaky.com/p")
        .select("status", "statusTime", "nextFetchTime")
        .collect()
      assert(row.length == 1, s"expected 1 frontier row, got ${row.length}")
      (row(0).getString(0), row(0).getLong(1), row(0).getLong(2))
    }
    // phase 1: robots.txt is DOWN (503) — the visit is DEFERRED, not
    // blocked: SKIPPED_DEFERRED re-arming after deferRetryMs, NOT the
    // 100,000 s blocked interval (reference CheckUrlWithRobotsFunction
    // .java:186-228)
    flakyRobotsDown = true
    val cfg1 = CrawlConfig(maxRounds = 5, frontierRoot = Some(root),
      deferRetryMs = 1500L)
    val r1 = CrawlTopology.run(spark, seeds, routed, routed, cfg1)
    val (st1, t1, next1) = stateOf(r1)
    assert(st1 == FS.SKIPPED_DEFERRED,
      s"503 robots must defer, not block: got $st1")
    assert(next1 - t1 == 1500L,
      s"deferred row must re-arm at deferRetryMs, got ${next1 - t1}")
    // phase 2: resume BEFORE the retry interval elapses (logical round 1
    // = 1000 < 2500) — the deferred row must NOT be retried yet
    val r2 = CrawlTopology.run(spark, seeds, routed, routed, cfg1)
    assert(stateOf(r2)._1 == FS.SKIPPED_DEFERRED,
      "deferred row retried before its interval elapsed")
    assert(r2.journal.filter(col("stage") === "fetch").count() == 0)
    // phase 3: robots heals; resume with the logical clock past the
    // retry point (tick 10000 > 2500). The fresh run's robots scope
    // plays the expired error TTL: rules are refetched, the URL fetches.
    flakyRobotsDown = false
    val r3 = CrawlTopology.run(spark, seeds, routed, routed,
      cfg1.copy(roundTickMs = 10000L))
    assert(stateOf(r3)._1 == FS.FETCHED,
      s"deferred URL must fetch once robots heals and the interval passes")
  }
}
