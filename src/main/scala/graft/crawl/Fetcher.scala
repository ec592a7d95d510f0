package graft.crawl

/** A fetched page: HTTP-ish status, body, content type, optional redirect
  * target (reference: crawler-commons FetchedResult as used by the
  * …/flinkcrawler/fetcher package; the engine only depends on this shape).
  *
  * `bytes` is the raw response body when the fetcher has one (the
  * reference carries `content: byte[]` end-to-end, FetchResultUrl
  * .java:6-109, with charset resolution deferred to parse); text-only
  * fixtures leave it null and the topology encodes `content` with the
  * contentType's declared charset at the fetch boundary, so the parse
  * stage always decodes bytes the same way.
  */
final case class FetchedPage(
    statusCode: Int,
    content: String,
    contentType: String,
    redirectedTo: Option[String] = None,
    bytes: Array[Byte] = null,
    // response headers, multimap like the reference's FetchResultUrl
    // (…/pojos/FetchResultUrl.java:6-109); charset resolution at parse
    // prefers the Content-Type HEADER over the contentType field
    headers: Map[String, Seq[String]] = Map.empty)

/** Pluggable page source. Implementations must be serializable: instances
  * are shipped to executors and invoked inside `mapPartitions`, one call per
  * URL, so an HTTP implementation can pool connections per partition while
  * test implementations stay pure.
  */
trait Fetcher extends Serializable {
  def fetch(url: String): FetchedPage
}

object Fetcher {
  @transient private lazy val log =
    org.slf4j.LoggerFactory.getLogger("graft.crawl.Fetcher")

  /** Synthetic page for a fetch that threw instead of returning: status -1
    * maps to ERROR_IOEXCEPTION via FetchStatus.fromHttpStatus, matching the
    * reference's exception→status mapping (…/flinkcrawler/utils
    * ExceptionUtils.java:64-120) so a fetcher failure stays a status row.
    */
  val ioError: FetchedPage = FetchedPage(-1, "", "text/plain")

  /** Exception-kind sentinels beyond plain IO, mirroring the reference's
    * UrlFetchException → ERROR_INVALID_URL and AbortedFetchException
    * (slow response) → ABORTED_FETCH distinctions. FetchStatus
    * .fromHttpStatus maps each to its status so fleet-wide failures stay
    * diagnosable from the journal (DNS/TLS vs bad URL vs timeout).
    */
  val invalidUrlError: FetchedPage = FetchedPage(-2, "", "text/plain")
  val abortedError: FetchedPage = FetchedPage(-3, "", "text/plain")

  /** A fetch aborted by the fetcher's own settings — oversized declared
    * body, disallowed mime type (reference AbortedFetchException with
    * CONTENT_SIZE / INVALID_MIMETYPE, ExceptionUtils.java:64-83). Mapped
    * to ABORTED_FETCH by [[safeFetch]].
    */
  final class AbortedFetchException(msg: String)
    extends java.io.IOException(msg)

  /** The one fetch entry point the topologies use: a throwing fetcher
    * becomes a synthetic error page instead of failing the Spark task —
    * one bad URL must never abort a round (batch) or kill the streaming
    * query (live). The exception is logged (warn) and mapped by kind with
    * parity to the reference's ExceptionUtils.java:64-120: bad URL →
    * ERROR_INVALID_URL; whole-fetch timeout, slow/stalled body, interrupt,
    * or settings-abort → ABORTED_FETCH; connect-timeout, connect-refused,
    * DNS, TLS, and every other transport failure → ERROR_IOEXCEPTION.
    */
  def safeFetch(f: Fetcher, url: String): FetchedPage =
    try f.fetch(url)
    catch {
      case scala.util.control.NonFatal(e) =>
        log.warn(s"fetch failed for $url: ${e.getClass.getName}: ${e.getMessage}")
        e match {
          case _: java.net.MalformedURLException |
               _: java.net.URISyntaxException => invalidUrlError
          // connect-timeout is an IO-class failure (reference
          // IOFetchException), NOT a slow-response abort — it must match
          // before its HttpTimeoutException parent
          case _: java.net.http.HttpConnectTimeoutException => ioError
          case _: java.net.http.HttpTimeoutException |
               _: AbortedFetchException |
               _: java.net.SocketTimeoutException |
               _: java.io.InterruptedIOException => abortedError
          case _ => ioError
        }
    }
}

/** Mocked web over an adjacency-list web graph (reference test fixture
  * src/test/java/…/fetcher/WebGraphFetcher.java:20-75): every known page
  * renders as synthetic HTML with one anchor per outlink; unknown pages are
  * 404s; redirect map support mirrors the URL-lengthener fixtures.
  */
final class WebGraphFetcher(
    graph: WebGraph,
    redirects: Map[String, String] = Map.empty)
  extends Fetcher {

  override def fetch(url: String): FetchedPage = {
    redirects.get(url) match {
      case Some(target) =>
        return FetchedPage(301, "", "text/plain", redirectedTo = Some(target))
      case None =>
    }
    graph.page(url) match {
      case Some(page) =>
        val links = page.outlinks.zipWithIndex
          .map { case (l, i) => s"""<li><a href="$l">outlink $i</a></li>""" }
          .mkString("\n")
        val html =
          s"""<html><head><title>Synthetic page - score = ${page.score}</title></head>
             |<body><ul>
             |$links
             |</ul></body></html>""".stripMargin
        FetchedPage(200, html, "text/html")
      case None => FetchedPage(404, "", "text/plain")
    }
  }
}

/** Robots bodies keyed by normalized robots.txt URL; unmapped domains 404
  * (no rules). Reference test fixture src/test/java/…/fetcher/
  * MockRobotsFetcher.java:17.
  */
final class MapRobotsFetcher(bodies: Map[String, String]) extends Fetcher {
  override def fetch(url: String): FetchedPage =
    bodies.get(url) match {
      case Some(body) => FetchedPage(200, body, "text/plain")
      case None => FetchedPage(404, "", "text/plain")
    }
}
