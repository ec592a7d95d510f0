package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.Executors

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.schema.{FetchStatus => FS}

/** The CrawlTool-parity entry point end to end, zero mocks: seeds file →
  * LiveCrawlTool.run → HttpFetcher against a loopback site (robots
  * disallow honored, links followed) → WARC (gzip members) + parsed-text
  * outputs readable back.
  */
class LiveCrawlToolSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkTestSession.spark

  private var server: HttpServer = _
  private var port: Int = _
  private def u(p: String) = s"http://127.0.0.1:$port$p"
  private val hits = new java.util.concurrent.atomic.AtomicInteger(0)

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    port = server.getAddress.getPort
    server.setExecutor(Executors.newFixedThreadPool(4))
    def page(body: String) =
      s"<html><head><title>t</title></head><body>$body</body></html>"
    val pages = Map(
      "/" -> page(s"""<a href="${u("/a")}">a</a> <a href="${u("/b")}">b</a>
                     |<a href="${u("/private/x")}">p</a>
                     |<a href="${u("/data.bin")}">bin</a>""".stripMargin),
      "/a" -> page("alpha content here"),
      "/b" -> page(s"""beta content <a href="${u("/a")}">back</a>"""),
      "/private/x" -> page("should never be fetched"),
      "/data.bin" -> "BINARYPAYLOAD",
      "/robots.txt" -> "User-agent: *\nDisallow: /private\n")
    server.createContext("/", (ex: HttpExchange) => {
      try {
        hits.incrementAndGet()
        val path = ex.getRequestURI.getPath
        pages.get(path) match {
          case Some(body) =>
            val bytes = body.getBytes(StandardCharsets.UTF_8)
            ex.getResponseHeaders.set("Content-Type",
              if (path == "/robots.txt") "text/plain; charset=UTF-8"
              else if (path == "/data.bin") "application/octet-stream"
              else "text/html; charset=UTF-8")
            ex.sendResponseHeaders(200, bytes.length.toLong)
            ex.getResponseBody.write(bytes)
          case None => ex.sendResponseHeaders(404, -1)
        }
        ex.close()
      } catch { case _: Exception => try ex.close() catch { case _: Exception => } }
    })
    server.start()
  }

  override def afterAll(): Unit = server.stop(0)

  test("seeds file to crawled site to WARC + text outputs, no mocks") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_livetool").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "seeds.txt"),
      s"# the one seed\n${u("/")}\n")
    val result = graft.tools.LiveCrawlTool.run(spark, Map(
      "seedurls" -> s"$dir/seeds.txt",
      "maxrounds" -> "10",
      "defaultcrawldelay" -> "0",
      "warcdir" -> s"$dir/warc",
      "gzipmembers" -> "true",
      "textdir" -> s"$dir/text",
      "nolengthen" -> "true"))
    def statusOf(url: String) = result.frontier
      .filter(col("url") === url).select("status")
      .collect().map(_.getString(0)).toSeq
    assert(statusOf(u("/")) == Seq(FS.FETCHED))
    assert(statusOf(u("/a")) == Seq(FS.FETCHED))
    assert(statusOf(u("/b")) == Seq(FS.FETCHED))
    assert(statusOf(u("/private/x")) == Seq(FS.SKIPPED_BLOCKED),
      "robots disallow was not honored over live HTTP")
    // parsed text landed
    val text = spark.read.text(s"$dir/text")
      .collect().map(_.getString(0)).toSet
    assert(text.exists(l => l.startsWith(u("/a")) && l.contains("alpha")))
    // the gzip-member WARC archive reads back with the fetched bodies
    val warc = graft.sources.WarcSource.read(spark, s"$dir/warc")
    val archived = warc.select("url").collect().map(_.getString(0)).toSet
    assert(Set(u("/"), u("/a"), u("/b")).subsetOf(archived),
      s"archive missing pages: $archived")
    assert(!archived.contains(u("/private/x")))
  }

  private def seedsFile(dir: String): String = {
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "seeds.txt"), s"${u("/")}\n")
    s"$dir/seeds.txt"
  }

  test("--forcecrawldelay overrides robots and paces the journal's fetch rounds") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_livetool_force").toString
    // robots.txt is silent on delay and --defaultcrawldelay is 0, so
    // WITHOUT the force every round would fetch; forced 2500 ms at a
    // 1000 ms round tick means a domain fetches at most every 3rd round
    val result = graft.tools.LiveCrawlTool.run(spark, Map(
      "seedurls" -> seedsFile(dir),
      "maxrounds" -> "8",
      "defaultcrawldelay" -> "0",
      "forcecrawldelay" -> "2500",
      "nolengthen" -> "true"))
    val fetchRounds = result.journal
      .filter(col("stage") === "fetch").select("round")
      .collect().map(_.getInt(0)).sorted
    assert(fetchRounds.nonEmpty)
    val gaps = fetchRounds.zip(fetchRounds.tail).map { case (a, b) => b - a }
    assert(gaps.forall(_ >= 3),
      s"forced 2500ms delay must gap fetch rounds by >= 3 ticks, " +
        s"got rounds ${fetchRounds.toSeq}")
    // and the frontier re-arm time carries the FORCED delay, not robots'
    val rearm = result.frontier
      .filter(col("status") === FS.FETCHED)
      .select((col("nextFetchTime") - col("statusTime")).as("d"))
      .collect().map(_.getLong(0)).toSet
    assert(rearm == Set(2500L),
      s"fetched rows must re-arm at the forced delay, got $rearm")
  }

  test("--forcecrawldelay SMALLER than --defaultcrawldelay still wins (forced > robots > default)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_livetool_force_small").toString
    // ADVICE r16: the re-arm used max(crawlDelay, default), silently
    // overriding a forced delay below the default — the documented
    // precedence is forced > robots > default, unconditionally
    val result = graft.tools.LiveCrawlTool.run(spark, Map(
      "seedurls" -> seedsFile(dir),
      "maxrounds" -> "4",
      "defaultcrawldelay" -> "60000",
      "forcecrawldelay" -> "500",
      "nolengthen" -> "true"))
    val rearm = result.frontier
      .filter(col("status") === FS.FETCHED)
      .select((col("nextFetchTime") - col("statusTime")).as("d"))
      .collect().map(_.getLong(0)).toSet
    assert(rearm == Set(500L),
      s"forced 500ms must beat the 60s default in the re-arm, got $rearm")
  }

  test("--htmlonly aborts non-HTML responses at the header (INVALID_MIMETYPE parity)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_livetool_mime").toString
    val result = graft.tools.LiveCrawlTool.run(spark, Map(
      "seedurls" -> seedsFile(dir),
      "maxrounds" -> "10",
      "defaultcrawldelay" -> "0",
      "htmlonly" -> "true",
      "nolengthen" -> "true"))
    def statusOf(url: String) = result.frontier
      .filter(col("url") === url).select("status")
      .collect().map(_.getString(0)).toSeq
    assert(statusOf(u("/a")) == Seq(FS.FETCHED),
      "HTML pages must still fetch under --htmlonly")
    assert(statusOf(u("/data.bin")) == Seq(FS.ABORTED_FETCH),
      "an octet-stream response must abort as ABORTED_FETCH under --htmlonly")
    // the abort is a journaled fetch outcome, not a dropped row
    val journaled = result.journal
      .filter(col("stage") === "fetch" && col("url") === u("/data.bin"))
      .select("status").collect().map(_.getString(0)).toSeq
    assert(journaled == Seq(FS.ABORTED_FETCH))
  }

  test("--timeout self-terminates an idle crawl long before --maxrounds") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_livetool_idle").toString
    // a 1h forced delay parks the whole domain after round 1: every
    // later round schedules nothing (pure idle ticks); the no-activity
    // terminator must stop the crawl, not the round budget
    val result = graft.tools.LiveCrawlTool.run(spark, Map(
      "seedurls" -> seedsFile(dir),
      "maxrounds" -> "500",
      "defaultcrawldelay" -> "0",
      "forcecrawldelay" -> "3600000",
      "timeout" -> "2",
      "nolengthen" -> "true"))
    assert(result.rounds < 500,
      s"idle crawl must self-terminate via --timeout, ran ${result.rounds}")
    assert(result.frontier.filter(col("status") === FS.FETCHED).count() >= 1,
      "round 1 must have fetched before the idle stop")
  }

  test("--archivedir replays a WARC archive with ZERO live fetches (-commoncrawl parity)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_livetool_archive").toString
    // phase 1: live crawl builds the archive
    graft.tools.LiveCrawlTool.run(spark, Map(
      "seedurls" -> seedsFile(dir),
      "maxrounds" -> "10",
      "defaultcrawldelay" -> "0",
      "warcdir" -> s"$dir/warc",
      "nolengthen" -> "true"))
    // phase 2: archive mode — same seeds, fetch stage joins the archive
    val before = hits.get()
    val result = graft.tools.LiveCrawlTool.run(spark, Map(
      "seedurls" -> seedsFile(dir),
      "maxrounds" -> "10",
      "defaultcrawldelay" -> "0",
      "archivedir" -> s"$dir/warc"))
    assert(hits.get() == before,
      s"archive mode must never touch the network (${hits.get() - before} live hits)")
    def statusOf(url: String) = result.frontier
      .filter(col("url") === url).select("status")
      .collect().map(_.getString(0)).toSeq
    assert(statusOf(u("/")) == Seq(FS.FETCHED))
    assert(statusOf(u("/a")) == Seq(FS.FETCHED))
    assert(statusOf(u("/b")) == Seq(FS.FETCHED))
    // robots was never archived and archive mode is allow-all (noop 404
    // robots): the previously-blocked page is ATTEMPTED but misses the
    // archive — a not-found, never a live fetch
    assert(statusOf(u("/private/x")) == Seq(FS.HTTP_NOTFOUND),
      "archive miss must map to HTTP_NOTFOUND")
    // parsed text flows from archived bodies
    assert(result.parsed.filter(col("url") === u("/a")).count() == 1)
  }
}
