package graft.crawl

import java.net.URI
import java.net.URISyntaxException
import java.net.http.{HttpClient, HttpRequest, HttpResponse, HttpTimeoutException}
import java.time.Duration
import java.util.Locale
import java.util.concurrent.{ConcurrentHashMap, Executors, ScheduledExecutorService, TimeUnit}
import java.util.concurrent.atomic.AtomicBoolean

import scala.jdk.CollectionConverters._

import graft.functions.UrlFunctions

/** Live-web fetch settings (reference: crawler-commons fetcher config as
  * surfaced through …/flinkcrawler/fetcher/BaseHttpFetcherBuilder.java:16-80
  * and …/flinkcrawler/tools/CrawlToolOptions.java:13,67-70 — UA, fetch
  * duration timeout of 100 s, max content size, valid mime types,
  * Accept-Language).
  *
  * `fetchTimeoutMs` bounds the WHOLE fetch — connect + headers + body —
  * like the reference's fetch-duration timeout, not just the first byte.
  * `maxContentBytes` truncates mid-stream (the body is never buffered past
  * it); a Content-Length that already declares an oversized body aborts
  * before reading at all.
  */
final case class HttpFetcherConfig(
    userAgent: String = "graft-crawler/1.0",
    connectTimeoutMs: Long = 10000L,
    fetchTimeoutMs: Long = 100000L,
    maxContentBytes: Int = 2 * 1024 * 1024,
    acceptLanguage: String = "en-us,en;q=0.7,*;q=0.3",
    // empty = accept everything; otherwise the response's mime (the
    // Content-Type before any ';') must be in this set or the fetch
    // aborts (reference AbortedFetchReason.INVALID_MIMETYPE)
    validMimeTypes: Set[String] = Set.empty)

/** The live-web [[Fetcher]]: JDK 17 `java.net.http.HttpClient` behind the
  * same seam every topology already drains through [[graft.util.Pooled]]
  * (reference: crawler-commons' SimpleHttpFetcher as built by
  * …/flinkcrawler/fetcher/BaseHttpFetcherBuilder.java:16 and consumed by
  * FetchUrlsFunction.java:28-226).
  *
  * Semantics the engine depends on:
  *
  *  - '''Redirects are NOT followed.''' 3xx responses surface as their
  *    status code plus `redirectedTo` (the `Location` header resolved
  *    against the request URI), so [[graft.schema.FetchStatus.fromHttpStatus]]
  *    maps them to HTTP_MOVED / HTTP_REDIRECTED and the target re-enters
  *    the loop as a fresh sighting — the reference's RedirectMode handling
  *    re-expressed as dataflow (LiveCrawl.scala redirect re-feed,
  *    CrawlTopology.redirectTargets).
  *  - '''One bad URL never kills a task.''' This fetcher THROWS on
  *    transport failures; [[Fetcher.safeFetch]] maps each exception kind to
  *    its status sentinel with parity to the reference's
  *    ExceptionUtils.java:64-120 — bad URL → ERROR_INVALID_URL, whole-fetch
  *    timeout / slow body / aborted-by-settings → ABORTED_FETCH,
  *    connect-refused / DNS / connect-timeout / TLS → ERROR_IOEXCEPTION.
  *  - '''Bounded memory.''' The body streams through a fixed 8 KiB chunk
  *    into a buffer capped at `maxContentBytes`; overflow keeps the prefix,
  *    marks the page with an `X-Graft-Truncated: true` response header, and
  *    stays FETCHED (crawler-commons' streaming truncation), while a
  *    Content-Length already over the cap aborts without reading
  *    (crawler-commons' CONTENT_SIZE abort).
  *  - '''Bounded time, even on a stalled stream.''' The request timeout
  *    bounds connect+headers; a shared daemon watchdog closes the body
  *    stream at the fetch deadline, so a server that sends headers and then
  *    trickles or hangs costs at most `fetchTimeoutMs`, not a worker thread
  *    forever (the reference's fetch-duration monitor).
  *
  * Instances are Serializable (config only); the HttpClient itself is an
  * executor-wide singleton per connect-timeout, so every task on an
  * executor shares one connection pool — politeness (per-domain pacing) is
  * enforced UPSTREAM by the topology's domain clocks, never here.
  */
final class HttpFetcher(
    cfg: HttpFetcherConfig = HttpFetcherConfig()) extends Fetcher {

  override def fetch(url: String): FetchedPage = {
    val uri = HttpFetcher.parseHttpUri(url)
    val deadlineNanos = System.nanoTime() + cfg.fetchTimeoutMs * 1000000L
    val request = HttpRequest.newBuilder(uri)
      .timeout(Duration.ofMillis(cfg.fetchTimeoutMs))
      .header("User-Agent", cfg.userAgent)
      .header("Accept-Language", cfg.acceptLanguage)
      .GET().build()
    val resp =
      try HttpFetcher.client(cfg.connectTimeoutMs)
        .send(request, HttpResponse.BodyHandlers.ofInputStream())
      catch {
        case _: InterruptedException =>
          // checked interrupt from HttpClient.send: restore the flag and
          // surface as the InterruptedIOException safeFetch maps to
          // ABORTED_FETCH (reference AbortedFetchReason.INTERRUPTED)
          Thread.currentThread().interrupt()
          throw new java.io.InterruptedIOException(s"fetch interrupted: $url")
      }
    val headers: Map[String, Seq[String]] =
      resp.headers().map().asScala.map { case (k, v) =>
        k -> v.asScala.toSeq
      }.toMap
    val contentType = UrlFunctions.headerFirst(headers, "Content-Type")
      .getOrElse("application/octet-stream")
    val code = resp.statusCode()
    val isRedirect = code >= 300 && code < 400
    // content validation applies to TERMINAL content only: a 3xx hop's
    // body is an incidental error page — aborting on its mime type (or a
    // bogus Content-Length) would lose the Location target and the
    // redirect would never re-enter the loop (the reference's mime filter
    // runs on fetched content, not redirect hops)
    if (!isRedirect && cfg.validMimeTypes.nonEmpty) {
      val mime = contentType.split(";")(0).trim.toLowerCase(Locale.ROOT)
      if (!cfg.validMimeTypes.contains(mime)) {
        resp.body().close()
        throw new Fetcher.AbortedFetchException(
          s"mime type $mime not in validMimeTypes for $url")
      }
    }
    val declaredLen = UrlFunctions.headerFirst(headers, "Content-Length")
      .flatMap(_.trim.toLongOption)
    if (!isRedirect && declaredLen.exists(_ > cfg.maxContentBytes.toLong)) {
      resp.body().close()
      throw new Fetcher.AbortedFetchException(
        s"Content-Length ${declaredLen.get} exceeds " +
          s"maxContentBytes=${cfg.maxContentBytes} for $url")
    }
    val (raw, truncated) =
      HttpFetcher.readCapped(resp.body(), cfg.maxContentBytes,
        deadlineNanos, url)
    // some servers compress unasked (we send no Accept-Encoding):
    // a gzip/deflate body must not reach parse as binary garbage.
    // Decompression is CAPPED at maxContentBytes (a zip bomb costs at
    // most the configured budget) and best-effort: a truncated or
    // malformed stream keeps the raw bytes (the parse stage's problem,
    // same as any other corrupt body).
    val bytes = UrlFunctions.headerFirst(headers, "Content-Encoding")
      .map(_.trim.toLowerCase(Locale.ROOT)) match {
      case Some("gzip") if !truncated =>
        HttpFetcher.inflateCapped(raw, cfg.maxContentBytes, gzip = true)
      case Some("deflate") if !truncated =>
        HttpFetcher.inflateCapped(raw, cfg.maxContentBytes, gzip = false)
      case _ => raw
    }
    val redirect =
      if (isRedirect)
        UrlFunctions.headerFirst(headers, "Location").flatMap { loc =>
          // relative Location resolves against the request URI; a Location
          // the resolver rejects is kept only if it is itself absolute
          try Some(uri.resolve(loc.trim).toString)
          catch {
            case _: IllegalArgumentException =>
              Option(loc.trim).filter(_.matches("(?i)https?://.*"))
          }
        }
      else None
    val outHeaders =
      if (truncated) headers + ("X-Graft-Truncated" -> Seq("true"))
      else headers
    // decoded text alongside raw bytes: robots / lengthener consumers read
    // `content`, the parse stage prefers `bytes` + header charset — the
    // SAME charset resolution on both, so the two views agree
    val text = new String(bytes, UrlFunctions.charsetFromContentType(contentType))
    FetchedPage(code, text, contentType,
      redirectedTo = redirect, bytes = bytes, headers = outHeaders)
  }
}

object HttpFetcher {

  /** One HttpClient per executor per connect-timeout: HttpClient owns the
    * connection pool, so fetcher instances deserialized per task all share
    * it. Redirect policy NEVER — the engine's loop owns redirects.
    */
  private val clients = new ConcurrentHashMap[Long, HttpClient]()

  private def client(connectTimeoutMs: Long): HttpClient =
    clients.computeIfAbsent(connectTimeoutMs, ms =>
      HttpClient.newBuilder()
        .followRedirects(HttpClient.Redirect.NEVER)
        .connectTimeout(Duration.ofMillis(ms))
        .build())

  /** Deadline enforcement for body reads: closing the stream from this
    * daemon thread unblocks a read stalled on a trickling/hung server.
    */
  private lazy val watchdog: ScheduledExecutorService =
    Executors.newSingleThreadScheduledExecutor { r =>
      val t = new Thread(r, "graft-http-watchdog")
      t.setDaemon(true)
      t
    }

  /** Strict http(s) URI or URISyntaxException — which [[Fetcher.safeFetch]]
    * maps to ERROR_INVALID_URL (reference UrlFetchException parity).
    */
  private def parseHttpUri(url: String): URI = {
    val uri = new URI(url)
    val scheme = Option(uri.getScheme)
      .map(_.toLowerCase(Locale.ROOT))
      .getOrElse(throw new URISyntaxException(url, "missing scheme"))
    if (scheme != "http" && scheme != "https")
      throw new URISyntaxException(url, s"unsupported scheme $scheme")
    if (uri.getHost == null)
      throw new URISyntaxException(url, "missing or unparsable host")
    uri
  }

  /** Best-effort capped decompression of a complete gzip/deflate body:
    * at most `max` bytes out (bomb-bounded), raw bytes back on any
    * malformation. `deflate` tries zlib-wrapped first, then the raw
    * stream some servers send despite the name.
    */
  private def inflateCapped(
      raw: Array[Byte], max: Int, gzip: Boolean): Array[Byte] = {
    def drain(in: java.io.InputStream): Array[Byte] = {
      val buf = new java.io.ByteArrayOutputStream(math.min(max, 16384))
      val chunk = new Array[Byte](8192)
      try {
        var n = in.read(chunk)
        while (n >= 0 && buf.size() < max) {
          buf.write(chunk, 0, math.min(n, max - buf.size()))
          n = if (buf.size() < max) in.read(chunk) else -1
        }
      } finally in.close()
      buf.toByteArray
    }
    def tryWith(mk: => java.io.InputStream): Option[Array[Byte]] =
      try Some(drain(mk))
      catch { case _: java.io.IOException |
                   _: java.util.zip.ZipException => None }
    val out =
      if (gzip)
        tryWith(new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(raw)))
      else
        tryWith(new java.util.zip.InflaterInputStream(
          new java.io.ByteArrayInputStream(raw)))
          .orElse(tryWith(new java.util.zip.InflaterInputStream(
            new java.io.ByteArrayInputStream(raw),
            new java.util.zip.Inflater(true))))
    out.filter(_.nonEmpty).getOrElse(raw)
  }

  /** Read at most `max` bytes; returns (bytes, truncated). The watchdog
    * closes the stream at the deadline, converting a stalled read into
    * HttpTimeoutException → ABORTED_FETCH, the reference's slow-response
    * abort.
    */
  private def readCapped(
      in: java.io.InputStream, max: Int, deadlineNanos: Long,
      url: String): (Array[Byte], Boolean) = {
    val timedOut = new AtomicBoolean(false)
    val remainingMs =
      math.max(1L, (deadlineNanos - System.nanoTime()) / 1000000L)
    val kill = watchdog.schedule(new Runnable {
      override def run(): Unit = {
        timedOut.set(true)
        try in.close() catch { case _: Exception => }
      }
    }, remainingMs, TimeUnit.MILLISECONDS)
    val buf = new java.io.ByteArrayOutputStream(math.min(max, 16384))
    val chunk = new Array[Byte](8192)
    var truncated = false
    try {
      var n = in.read(chunk)
      var total = 0
      while (n >= 0) {
        if (timedOut.get())
          throw new HttpTimeoutException(s"fetch deadline exceeded mid-body: $url")
        val take = math.min(n, max - total)
        buf.write(chunk, 0, take)
        total += take
        if (take < n) { truncated = true; n = -1 }
        else if (total == max) {
          // exactly full: only MORE data makes it a truncation
          if (in.read() >= 0) truncated = true
          n = -1
        } else n = in.read(chunk)
      }
    } catch {
      // the watchdog's close surfaces as an IOException from the blocked
      // read — rebrand it as the timeout it is
      case e: java.io.IOException if timedOut.get() =>
        throw new HttpTimeoutException(
          s"fetch deadline exceeded mid-body: $url (${e.getMessage})")
    } finally {
      kill.cancel(false)
      try in.close() catch { case _: Exception => }
    }
    (buf.toByteArray, truncated)
  }
}
