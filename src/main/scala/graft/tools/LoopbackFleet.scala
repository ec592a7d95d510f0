package graft.tools

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import java.util.concurrent.{ConcurrentHashMap, Executors}

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** A loopback server FLEET for live-crawl scale proof: hundreds-to-
  * thousands of synthetic domains served from one in-process HttpServer
  * bound to 0.0.0.0, each domain a distinct loopback address
  * (127.0.x.y — the whole 127/8 block is local on Linux), so
  * [[graft.crawl.HttpFetcher]] reaches every "domain" over a REAL socket
  * with zero egress and the engine's PLD handling sees distinct hosts.
  *
  * The synthetic web: domain i serves `/p0 … /p{pagesPerDomain-1}`; page
  * k links two same-domain successors and one deterministic cross-domain
  * page, so a few seeds discover the whole fleet over rounds. Every
  * `delayEvery`-th domain publishes a robots `Crawl-delay`, arming the
  * engine's politeness clocks.
  *
  * Ground-truth instrumentation AT THE SOCKET (what the crawl bench
  * asserts; the journal can only show round-level intent):
  *  - `politenessViolations`: two PAGE hits to the same delayed domain
  *    closer together than its crawl delay (nanoTime-measured);
  *  - `minGapMs`: the tightest observed page gap on any delayed domain;
  *  - `maxInFlight`: peak concurrent requests — realized fetch
  *    concurrency vs the configured tasks × fetchThreads;
  *  - `pageHits` / `robotsHits`: served request counts.
  */
final case class FleetConfig(
    domains: Int = 200,
    pagesPerDomain: Int = 100,
    latencyMs: Long = 20L,
    // every Nth domain gets `Crawl-delay: crawlDelaySec` (0 = none)
    delayEvery: Int = 5,
    crawlDelaySec: Double = 0.5,
    serverThreads: Int = 400)

final class LoopbackFleet(cfg: FleetConfig) {
  require(cfg.domains >= 1 && cfg.domains <= 250 * 200,
    s"domains=${cfg.domains} outside the 127.0.x.y address budget")

  val pageHits = new AtomicLong(0)
  val robotsHits = new AtomicLong(0)
  val politenessViolations = new AtomicLong(0)
  private val minGapNanos = new AtomicLong(Long.MaxValue)
  private val inFlight = new AtomicInteger(0)
  val maxInFlight = new AtomicInteger(0)
  private val lastPageHit = new ConcurrentHashMap[String, java.lang.Long]()

  private var server: HttpServer = _
  private var pool: java.util.concurrent.ExecutorService = _
  var port: Int = 0

  def minGapMs: Double =
    if (minGapNanos.get() == Long.MaxValue) Double.PositiveInfinity
    else minGapNanos.get() / 1e6

  /** Domain i's loopback address (each its own PLD to the engine). */
  def ip(i: Int): String = s"127.0.${1 + i / 250}.${2 + i % 250}"

  private def domainIndex(addr: String): Int = {
    val p = addr.split("\\.")
    (p(2).toInt - 1) * 250 + (p(3).toInt - 2)
  }

  def url(i: Int, path: String): String = s"http://${ip(i)}:$port$path"

  def delayMsFor(i: Int): Long =
    if (cfg.delayEvery > 0 && i % cfg.delayEvery == 0)
      (cfg.crawlDelaySec * 1000).toLong
    else 0L

  /** Deterministic page body: 2 same-domain successors + 1 cross-domain
    * link (a simple multiplicative hash spreads discovery fleet-wide).
    */
  private def pageBody(d: Int, k: Int): String = {
    val links = new StringBuilder
    Seq(k + 1, k + 2).filter(_ < cfg.pagesPerDomain).foreach { n =>
      links ++= s"""<a href="${url(d, s"/p$n")}">n$n</a> """
    }
    val cross = (d * 2654435761L + k * 40503L).abs % cfg.domains
    links ++= s"""<a href="${url(cross.toInt, "/p0")}">x</a>"""
    s"<html><head><title>d$d p$k</title></head><body>" +
      s"synthetic page $k of domain $d ${links}</body></html>"
  }

  def start(): Unit = {
    server = HttpServer.create(new InetSocketAddress("0.0.0.0", 0), 1024)
    port = server.getAddress.getPort
    pool = Executors.newFixedThreadPool(cfg.serverThreads)
    server.setExecutor(pool)
    server.createContext("/", (ex: HttpExchange) => {
      val cur = inFlight.incrementAndGet()
      maxInFlight.accumulateAndGet(cur, math.max)
      try serve(ex)
      catch { case _: Exception => () }
      finally {
        inFlight.decrementAndGet()
        try ex.close() catch { case _: Exception => () }
      }
    })
    server.start()
  }

  def stop(): Unit = {
    if (server != null) server.stop(0)
    // HttpServer.stop does NOT shut down a user-provided executor; its
    // non-daemon workers would pin the JVM after main returns
    if (pool != null) pool.shutdownNow()
  }

  private def serve(ex: HttpExchange): Unit = {
    val host = ex.getLocalAddress.getAddress.getHostAddress
    val d = domainIndex(host)
    val path = ex.getRequestURI.getPath
    def respond(code: Int, body: String, ct: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", ct)
      ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length.toLong)
      if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    }
    if (path == "/robots.txt") {
      robotsHits.incrementAndGet()
      val delay = delayMsFor(d)
      val body =
        if (delay > 0)
          s"User-agent: *\nCrawl-delay: ${delay / 1000.0}\nDisallow:\n"
        else "User-agent: *\nDisallow:\n"
      respond(200, body, "text/plain; charset=UTF-8")
    } else if (path.startsWith("/p")) {
      val k = path.stripPrefix("/p").toIntOption.getOrElse(-1)
      if (k < 0 || k >= cfg.pagesPerDomain) respond(404, "", "text/plain")
      else {
        // politeness ground truth: gaps between PAGE hits on a delayed
        // domain, measured at the socket with a monotonic clock
        val delay = delayMsFor(d)
        if (delay > 0) {
          val nowN = System.nanoTime()
          val prev = lastPageHit.put(host, nowN)
          if (prev != null) {
            val gap = nowN - prev.longValue()
            minGapNanos.accumulateAndGet(gap, math.min)
            if (gap < delay * 1000000L)
              politenessViolations.incrementAndGet()
          }
        }
        pageHits.incrementAndGet()
        if (cfg.latencyMs > 0) Thread.sleep(cfg.latencyMs)
        respond(200, pageBody(d, k), "text/html; charset=UTF-8")
      }
    } else respond(404, "", "text/plain")
  }
}
