package graft

import java.io.ByteArrayOutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.Executors

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.crawl.{Fetcher, HttpFetcher, HttpFetcherConfig, UrlLengthener}
import graft.schema.{FetchStatus => FS}

/** The live-web fetcher over an in-process loopback HttpServer (zero
  * egress): status passthrough, header/charset fidelity, redirects
  * surfaced not followed, User-Agent delivery, whole-fetch deadline
  * (headers AND stalled body), mid-stream truncation, settings aborts,
  * and transport-exception → status parity with the reference's
  * ExceptionUtils.java:19-120 via Fetcher.safeFetch.
  */
class HttpFetcherSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var port: Int = _
  // request headers observed server-side, keyed by path
  private val seen =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, String]]()

  private def respond(
      ex: HttpExchange, code: Int, body: Array[Byte],
      headers: (String, String)*): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
    ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length.toLong)
    if (body.nonEmpty) ex.getResponseBody.write(body)
    ex.close()
  }

  private def handler(f: HttpExchange => Unit): HttpHandler =
    new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        import scala.jdk.CollectionConverters._
        seen.put(ex.getRequestURI.getPath,
          ex.getRequestHeaders.asScala.map { case (k, v) =>
            k.toLowerCase -> v.asScala.headOption.getOrElse("")
          }.toMap)
        try f(ex)
        catch { case _: Exception => try ex.close() catch { case _: Exception => } }
      }
    }

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    port = server.getAddress.getPort
    server.setExecutor(Executors.newFixedThreadPool(8))

    server.createContext("/page", handler { ex =>
      respond(ex, 200,
        "<html><body>héllo</body></html>".getBytes("ISO-8859-1"),
        "Content-Type" -> "text/html; charset=ISO-8859-1",
        "X-Custom" -> "42")
    })
    server.createContext("/missing", handler(respond(_, 404, Array.empty)))
    server.createContext("/forbidden", handler(respond(_, 403, Array.empty)))
    server.createContext("/flaky", handler(respond(_, 503, Array.empty)))
    server.createContext("/moved", handler { ex =>
      respond(ex, 301, Array.empty,
        "Location" -> s"http://127.0.0.1:$port/page")
    })
    server.createContext("/relative-redirect", handler { ex =>
      respond(ex, 302, Array.empty, "Location" -> "/page")
    })
    server.createContext("/slow-headers", handler { ex =>
      Thread.sleep(10000); respond(ex, 200, Array.empty)
    })
    server.createContext("/stalled-body", handler { ex =>
      // chunked: headers + a first chunk arrive, then the stream hangs —
      // only the watchdog can bound this fetch
      ex.getResponseHeaders.set("Content-Type", "text/plain")
      ex.sendResponseHeaders(200, 0)
      val os = ex.getResponseBody
      os.write("partial".getBytes(StandardCharsets.UTF_8))
      os.flush()
      Thread.sleep(10000)
      ex.close()
    })
    server.createContext("/big-chunked", handler { ex =>
      // 64 KiB streamed without Content-Length: must truncate, not abort
      ex.getResponseHeaders.set("Content-Type", "text/plain")
      ex.sendResponseHeaders(200, 0)
      val os = ex.getResponseBody
      val block = ("x" * 1024).getBytes(StandardCharsets.UTF_8)
      (1 to 64).foreach(_ => os.write(block))
      ex.close()
    })
    server.createContext("/big-declared", handler { ex =>
      val body = ("y" * 65536).getBytes(StandardCharsets.UTF_8)
      respond(ex, 200, body, "Content-Type" -> "text/plain")
    })
    server.createContext("/exact", handler { ex =>
      respond(ex, 200, ("z" * 1000).getBytes(StandardCharsets.UTF_8),
        "Content-Type" -> "text/plain")
    })
    server.createContext("/gif", handler { ex =>
      respond(ex, 200, Array[Byte](0x47, 0x49, 0x46),
        "Content-Type" -> "image/gif")
    })
    server.createContext("/short", handler { ex =>
      respond(ex, 301, Array.empty,
        "Location" -> s"http://127.0.0.1:$port/lengthened")
    })
    server.createContext("/gzipped", handler { ex =>
      val bos = new ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write("unzipped text é".getBytes(StandardCharsets.UTF_8))
      gz.close()
      respond(ex, 200, bos.toByteArray,
        "Content-Type" -> "text/plain; charset=UTF-8",
        "Content-Encoding" -> "gzip")
    })
    server.createContext("/lying-gzip", handler { ex =>
      respond(ex, 200, "actually plain".getBytes(StandardCharsets.UTF_8),
        "Content-Type" -> "text/plain",
        "Content-Encoding" -> "gzip")
    })
    server.createContext("/deflated", handler { ex =>
      val bos = new ByteArrayOutputStream()
      val df = new java.util.zip.DeflaterOutputStream(bos)
      df.write("deflated text".getBytes(StandardCharsets.UTF_8))
      df.close()
      respond(ex, 200, bos.toByteArray,
        "Content-Type" -> "text/plain",
        "Content-Encoding" -> "deflate")
    })
    server.start()
  }

  override def afterAll(): Unit = server.stop(0)

  private def base(u: String) = s"http://127.0.0.1:$port$u"
  private val fetcher = new HttpFetcher(HttpFetcherConfig(
    userAgent = "graft-test/0.1",
    connectTimeoutMs = 2000L,
    fetchTimeoutMs = 2000L,
    maxContentBytes = 1000))

  test("200: status, bytes, declared charset, and headers pass through") {
    val p = fetcher.fetch(base("/page"))
    assert(p.statusCode == 200)
    assert(p.contentType == "text/html; charset=ISO-8859-1")
    assert(p.content == "<html><body>héllo</body></html>",
      "content must decode with the DECLARED charset, not UTF-8")
    assert(p.bytes.toSeq ==
      "<html><body>héllo</body></html>".getBytes("ISO-8859-1").toSeq)
    assert(graft.functions.UrlFunctions
      .headerFirst(p.headers, "X-Custom").contains("42"))
    assert(p.redirectedTo.isEmpty)
    // the configured User-Agent and Accept-Language reached the wire
    val h = seen.get("/page")
    assert(h("user-agent") == "graft-test/0.1")
    assert(h("accept-language").nonEmpty)
  }

  test("status passthrough maps to the reference's FetchStatus table") {
    assert(FS.fromHttpStatus(fetcher.fetch(base("/missing")).statusCode) ==
      FS.HTTP_NOTFOUND)
    assert(FS.fromHttpStatus(fetcher.fetch(base("/forbidden")).statusCode) ==
      FS.HTTP_FORBIDDEN)
    assert(FS.fromHttpStatus(fetcher.fetch(base("/flaky")).statusCode) ==
      FS.HTTP_SERVER_ERROR)
  }

  test("redirects are surfaced, never followed; relative Location resolves") {
    val m = fetcher.fetch(base("/moved"))
    assert(m.statusCode == 301 &&
      m.redirectedTo.contains(base("/page")))
    assert(FS.fromHttpStatus(m.statusCode) == FS.HTTP_MOVED)
    val r = fetcher.fetch(base("/relative-redirect"))
    assert(r.statusCode == 302 && r.redirectedTo.contains(base("/page")),
      s"relative Location must resolve against the request URI: $r")
    assert(FS.fromHttpStatus(r.statusCode) == FS.HTTP_REDIRECTED)
  }

  test("slow response headers time out to ABORTED_FETCH within the deadline") {
    val t0 = System.nanoTime()
    val p = Fetcher.safeFetch(fetcher, base("/slow-headers"))
    val ms = (System.nanoTime() - t0) / 1000000L
    assert(p.statusCode == -3 &&
      FS.fromHttpStatus(p.statusCode) == FS.ABORTED_FETCH)
    assert(ms < 8000L, s"deadline not enforced: ${ms}ms")
  }

  test("a stalled body stream times out to ABORTED_FETCH, not a hung worker") {
    val t0 = System.nanoTime()
    val p = Fetcher.safeFetch(fetcher, base("/stalled-body"))
    val ms = (System.nanoTime() - t0) / 1000000L
    assert(p.statusCode == -3 &&
      FS.fromHttpStatus(p.statusCode) == FS.ABORTED_FETCH,
      s"got $p")
    assert(ms < 8000L, s"watchdog did not close the stalled stream: ${ms}ms")
  }

  test("oversized chunked body truncates mid-stream and stays FETCHED") {
    val p = fetcher.fetch(base("/big-chunked"))
    assert(p.statusCode == 200)
    assert(p.bytes.length == 1000, "body not capped at maxContentBytes")
    assert(graft.functions.UrlFunctions
      .headerFirst(p.headers, "X-Graft-Truncated").contains("true"))
    // an exactly-max body is NOT a truncation
    val e = fetcher.fetch(base("/exact"))
    assert(e.bytes.length == 1000 &&
      graft.functions.UrlFunctions
        .headerFirst(e.headers, "X-Graft-Truncated").isEmpty)
  }

  test("a Content-Length over the cap aborts without reading the body") {
    val p = Fetcher.safeFetch(fetcher, base("/big-declared"))
    assert(p.statusCode == -3 &&
      FS.fromHttpStatus(p.statusCode) == FS.ABORTED_FETCH)
  }

  test("mime-type filter aborts disallowed types (reference INVALID_MIMETYPE)") {
    val textOnly = new HttpFetcher(HttpFetcherConfig(
      fetchTimeoutMs = 2000L, maxContentBytes = 1000,
      validMimeTypes = Set("text/html", "text/plain")))
    val p = Fetcher.safeFetch(textOnly, base("/gif"))
    assert(p.statusCode == -3 &&
      FS.fromHttpStatus(p.statusCode) == FS.ABORTED_FETCH)
    assert(Fetcher.safeFetch(textOnly, base("/exact")).statusCode == 200)
  }

  test("transport failures map to the reference's error statuses") {
    // connect refused: an unbound loopback port (reference IOFetchException)
    val refused = Fetcher.safeFetch(fetcher, "http://127.0.0.1:1/x")
    assert(refused.statusCode == -1 &&
      FS.fromHttpStatus(refused.statusCode) == FS.ERROR_IOEXCEPTION)
    // invalid URLs (reference UrlFetchException → ERROR_INVALID_URL)
    for (bad <- Seq("ftp://example.com/x", "http:///nohost", "not a url"))
      assert(Fetcher.safeFetch(fetcher, bad).statusCode == -2,
        s"$bad should be ERROR_INVALID_URL")
  }

  test("unsolicited Content-Encoding is decompressed, capped, and never trusted blindly") {
    // no Accept-Encoding is sent, but some servers compress anyway —
    // the body must reach parse as text, not binary garbage
    val g = fetcher.fetch(base("/gzipped"))
    assert(g.content == "unzipped text é", s"got '${g.content}'")
    val d = fetcher.fetch(base("/deflated"))
    assert(d.content == "deflated text")
    // a header that LIES (says gzip, body plain) keeps the raw bytes
    val l = fetcher.fetch(base("/lying-gzip"))
    assert(l.content == "actually plain")
  }

  test("the lengthener resolves shorteners through the live fetcher") {
    // reference SimpleUrlLengthener.java:73-124: one redirects-disabled
    // hop, read Location; non-shortener hosts pass through untouched
    val lengthener = new UrlLengthener(
      fetcher, shortenerHosts = Set("127.0.0.1"), threads = 4)
    val memo = UrlLengthener.newMemo(16)
    assert(lengthener.lengthen(base("/short"), memo) == base("/lengthened"))
    assert(lengthener.lengthen("http://example.com/full", memo) ==
      "http://example.com/full", "non-shortener must pass through")
    // memo hit: the second resolve of the same URL is served from cache
    seen.clear()
    assert(lengthener.lengthen(base("/short"), memo) == base("/lengthened"))
    assert(!seen.containsKey("/short"), "memo miss — refetched a cached URL")
    // a DEAD shortener (connect refused) passes the url through instead
    // of failing the task (reference SimpleUrlLengthener failure path)
    val deadHost = new UrlLengthener(
      fetcher, shortenerHosts = Set("127.0.0.1"), threads = 2)
    assert(deadHost.lengthen("http://127.0.0.1:1/s", UrlLengthener.newMemo(4))
      == "http://127.0.0.1:1/s")
  }
}
