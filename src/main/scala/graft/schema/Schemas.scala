package graft.schema

/** Record types of the crawl dataflow, modeled on the reference's POJO
  * hierarchy (reference: src/main/java/com/scaleunlimited/flinkcrawler/pojos/
  * BaseUrl.java:7, RawUrl.java:6, ExtractedUrl.java:4, ValidUrl.java:12,
  * CrawlStateUrl.java:11, FetchResultUrl.java:6, ParsedUrl.java:6,
  * DomainScore.java:6) but flattened into immutable case classes so Spark
  * `Encoders.product` derives columnar schemas directly — no inheritance,
  * no mutable POJOs.
  */
final case class RawUrl(url: String, score: Float = 1.0f)

final case class ExtractedUrl(
    url: String,
    anchorText: String,
    relAttributes: String,
    score: Float)

/** Fetch lifecycle / outcome statuses (reference FetchStatus.java:22-73).
  * Stored as String columns; `priority` drives merge tie-breaks.
  */
object FetchStatus {
  val UNFETCHED = "UNFETCHED"
  val QUEUED = "QUEUED"
  val FETCHING = "FETCHING"
  val FETCHED = "FETCHED"
  val SKIPPED_BLOCKED = "SKIPPED_BLOCKED"
  val SKIPPED_DEFERRED = "SKIPPED_DEFERRED"
  val SKIPPED_CRAWLDELAY = "SKIPPED_CRAWLDELAY"
  val SKIPPED_INVALID_URL = "SKIPPED_INVALID_URL"
  val SKIPPED_BY_SCORE = "SKIPPED_BY_SCORE"
  val HTTP_NOTFOUND = "HTTP_NOTFOUND"
  val HTTP_FORBIDDEN = "HTTP_FORBIDDEN"
  val HTTP_UNAUTHORIZED = "HTTP_UNAUTHORIZED"
  val HTTP_SERVER_ERROR = "HTTP_SERVER_ERROR"
  val HTTP_TOO_MANY_REQUESTS = "HTTP_TOO_MANY_REQUESTS"
  // the reference's generic 4xx bucket (ExceptionUtils.java:51-52) —
  // unnamed client errors (400, 451, …) are a terminal HTTP outcome,
  // not an IO exception
  val HTTP_CLIENT_ERROR = "HTTP_CLIENT_ERROR"
  val HTTP_GONE = "HTTP_GONE"
  val HTTP_MOVED = "HTTP_MOVED"
  val HTTP_REDIRECTED = "HTTP_REDIRECTED"
  val ERROR_INVALID_URL = "ERROR_INVALID_URL"
  val ERROR_IOEXCEPTION = "ERROR_IOEXCEPTION"
  val ERROR_PARSE = "ERROR_PARSE"
  val ABORTED_FETCH = "ABORTED_FETCH"

  /** NOT a reference status: the frontier's deletion tombstone
    * ([[graft.crawl.FrontierStore.retire]]). A REMOVED row wins the
    * terminal merge (newest statusTime) and the bucket rewrite then
    * FILTERS the url out entirely — the right-to-be-forgotten purge of
    * the crawl journal itself, completing what the reference's
    * `_archivedUrls` MapState declared and never wrote
    * (UrlDBFunction.java:76,467). Never stored: it exists only inside a
    * merge.
    */
  val REMOVED = "REMOVED"

  /** Merge tie-break priority (reference FetchStatus.java:54-71):
    * lifecycle statuses rank below terminal outcomes so a FETCHED/error
    * record wins over a QUEUED/FETCHING one at equal timestamps.
    */
  def priority(status: String): Int = status match {
    case UNFETCHED => 0
    case QUEUED | FETCHING => 10
    case FETCHED => 25
    case _ => 50
  }

  /** Is this a terminal fetch outcome (anything but the pre-fetch
    * lifecycle states)? UNFETCHED sightings carry link mass (scores sum);
    * everything else represents an attempt whose most-recent record wins.
    */
  def isFetchedIsh(status: String): Boolean = status match {
    case UNFETCHED | QUEUED | FETCHING => false
    case _ => true
  }

  /** HTTP status code -> FetchStatus (reference ExceptionUtils.java:19-61).
    * Negative codes are Fetcher's exception-kind sentinels
    * (ExceptionUtils.java:64-120 analog): -1 IO, -2 bad URL, -3 timeout.
    */
  /** Inverse of [[fromHttpStatus]] onto representative codes, for
    * archive (WARC) round-trips: `fromHttpStatus(toHttpStatus(s)) == s`
    * for every fetch-attempt status, so a replayed crawl reconstructs the
    * exact FetchStatus the original crawl recorded — including redirects
    * and errors, not just 200s. Lifecycle/skip statuses (never produced
    * by a fetch attempt) map to 0.
    */
  def toHttpStatus(status: String): Int = status match {
    case FETCHED => 200
    case HTTP_MOVED => 301
    case HTTP_REDIRECTED => 302
    case HTTP_UNAUTHORIZED => 401
    case HTTP_FORBIDDEN => 403
    case HTTP_NOTFOUND => 404
    case HTTP_GONE => 410
    case HTTP_TOO_MANY_REQUESTS => 429
    case HTTP_CLIENT_ERROR => 400
    case HTTP_SERVER_ERROR => 500
    case ERROR_INVALID_URL => -2
    case ABORTED_FETCH => -3
    case ERROR_IOEXCEPTION => -1
    case _ => 0
  }

  def fromHttpStatus(code: Int): String = code match {
    case c if c >= 200 && c < 300 => FETCHED
    case 301 | 308 => HTTP_MOVED
    case 302 | 303 | 307 => HTTP_REDIRECTED
    case 401 => HTTP_UNAUTHORIZED
    case 403 => HTTP_FORBIDDEN
    case 404 => HTTP_NOTFOUND
    case 410 => HTTP_GONE
    case 429 => HTTP_TOO_MANY_REQUESTS
    // generic buckets, reference ExceptionUtils.java:46-56: unnamed 3xx
    // are redirection-class, unnamed 4xx client-error-class — neither is
    // an IO exception (a live web serves 300/304/400/451 routinely)
    case c if c >= 300 && c < 400 => HTTP_REDIRECTED
    case c if c >= 400 && c < 500 => HTTP_CLIENT_ERROR
    case c if c >= 500 => HTTP_SERVER_ERROR
    case -2 => ERROR_INVALID_URL
    case -3 => ABORTED_FETCH
    case _ => ERROR_IOEXCEPTION
  }
}

/** A URL in the crawl frontier ("crawl DB"): the row type of the persisted
  * frontier table (reference CrawlStateUrl.java:11-150; keyed state of
  * UrlDBFunction.java:94-139).
  */
final case class CrawlStateUrl(
    url: String,
    pld: String,
    status: String,
    statusTime: Long,
    score: Float,
    nextFetchTime: Long)

/** A URL cleared for fetching, with resolved politeness delay
  * (reference FetchUrl.java:4-27).
  */
final case class FetchUrl(
    url: String,
    pld: String,
    score: Float,
    crawlDelay: Long)

/** Result of fetching a page (reference FetchResultUrl.java:6-109). */
final case class FetchResultUrl(
    url: String,
    pld: String,
    status: String,
    statusTime: Long,
    fetchedUrl: String,
    headers: Map[String, Seq[String]],
    content: Array[Byte],
    contentType: String,
    score: Float)

/** Parse output (reference ParsedUrl.java:6-69 + ParserResult.java:4-17). */
final case class ParsedUrl(
    url: String,
    pld: String,
    parsedText: String,
    language: String,
    title: String,
    score: Float,
    parsedMeta: Map[String, String])

final case class DomainScore(pld: String, score: Float)
