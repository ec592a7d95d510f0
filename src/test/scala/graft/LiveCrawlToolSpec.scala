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

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    port = server.getAddress.getPort
    server.setExecutor(Executors.newFixedThreadPool(4))
    def page(body: String) =
      s"<html><head><title>t</title></head><body>$body</body></html>"
    val pages = Map(
      "/" -> page(s"""<a href="${u("/a")}">a</a> <a href="${u("/b")}">b</a>
                     |<a href="${u("/private/x")}">p</a>""".stripMargin),
      "/a" -> page("alpha content here"),
      "/b" -> page(s"""beta content <a href="${u("/a")}">back</a>"""),
      "/private/x" -> page("should never be fetched"),
      "/robots.txt" -> "User-agent: *\nDisallow: /private\n")
    server.createContext("/", (ex: HttpExchange) => {
      try {
        val path = ex.getRequestURI.getPath
        pages.get(path) match {
          case Some(body) =>
            val bytes = body.getBytes(StandardCharsets.UTF_8)
            ex.getResponseHeaders.set("Content-Type",
              if (path == "/robots.txt") "text/plain; charset=UTF-8"
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
}
