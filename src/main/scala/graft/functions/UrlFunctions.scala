package graft.functions

import java.net.{URI, URL}
import java.nio.charset.StandardCharsets

/** URL scalar functions of the crawl pipeline: normalization, validation,
  * paid-level-domain extraction, stable hashing.
  *
  * Semantics follow the reference's "clean URLs" stage (reference:
  * src/main/java/com/scaleunlimited/flinkcrawler/urls/SimpleUrlNormalizer
  * .java:266-365, SimpleUrlValidator.java:54-80, pojos/ValidUrl.java:55-170)
  * re-expressed as pure Scala functions so they can run as Spark UDFs, be
  * registered for SQL, and be unit-tested without a SparkSession.
  */
object UrlFunctions {

  // ---------------------------------------------------------------- normalize

  /** Query keys stripped when they carry a value (reference
    * SimpleUrlNormalizer.java:63-76: SESSION_ID_PATTERN +
    * OTHER_IGNORED_QUERY_PARAMETERS_PATTERN — both applied by the default
    * normalizer; key-only occurrences are kept, as there).
    */
  private val StrippedQueryParamPattern =
    ("(?i)^(sid|phpsessid|sessionid|session_id|bv_sessionid|jsessionid|" +
      "-session|session|session_key|aspsessionid[a-z]*|cfid|cftoken|zenid|" +
      "width|format|country|height|src|user|username|uname|return_url|" +
      "returnurl|sort|sort_by|sortby|sort_direction|sort_key|order_by|" +
      "orderby|sortorder|collate)$").r

  /** `/segment/../` resolution exactly as the reference does it
    * (SimpleUrlNormalizer.java:55-56 RELATIVE_PATH_PATTERN, applied in a
    * loop): the parent segment must contain a non-dot character, and the
    * `..` must be followed by `/` — a bare trailing `/aa/..` is kept.
    */
  private val RelativePathPattern =
    "(/[^/]*[^/.][^/]*/\\.\\./|^(/\\.\\./)+)".r

  /** Default-page removal at path end (reference DEFAULT_PAGE_PATTERN,
    * SimpleUrlNormalizer.java:59-60; `?`/`&`/`#` cannot occur in a parsed
    * path, so end-of-path is the reachable case).
    */
  private val DefaultPagePattern =
    ("(?i)/(?:index|default)\\." +
      "(?:js[pf][afx]?|cgi|cfm|aspx?|[psx]?htm[l]?|php[3456]?)$").r

  /** Characters that stay unescaped in paths/queries; everything else is
    * percent-encoded. Matches RFC 3986 unreserved + common sub-delims kept
    * by crawler normalizers.
    */
  private def isSafeChar(c: Char, inQuery: Boolean): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') ||
      "-_.~!$&'()*+,;:@/".indexOf(c) >= 0 ||
      (inQuery && (c == '=' || c == '?'))

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** Percent-decode with bad-% repair: a '%' not followed by two hex digits
    * is kept literally (and later re-encoded) instead of throwing.
    */
  private[functions] def percentDecode(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    val bytes = new java.io.ByteArrayOutputStream(4)
    var i = 0
    def flushBytes(): Unit = if (bytes.size() > 0) {
      out.append(new String(bytes.toByteArray, StandardCharsets.UTF_8))
      bytes.reset()
    }
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length && hexVal(s.charAt(i + 1)) >= 0 &&
          hexVal(s.charAt(i + 2)) >= 0) {
        bytes.write(hexVal(s.charAt(i + 1)) * 16 + hexVal(s.charAt(i + 2)))
        i += 3
      } else {
        flushBytes()
        out.append(c)
        i += 1
      }
    }
    flushBytes()
    out.toString
  }

  private def percentEncode(s: String, inQuery: Boolean): String = {
    val out = new java.lang.StringBuilder(s.length)
    s.foreach { c =>
      if (c == ' ') out.append('+') // reference encodes spaces as '+'
      else if (isSafeChar(c, inQuery) || c == '%') out.append(c)
      else {
        c.toString.getBytes(StandardCharsets.UTF_8).foreach { b =>
          // lowercase hex, matching the reference's encoder output
          out.append('%').append(f"${b & 0xff}%02x")
        }
      }
    }
    out.toString
  }

  /** Decode-then-encode a path or query component until stable, so
    * equivalent escapings compare equal: unreserved characters end up
    * literal, unsafe ones as lowercase %xx. The fixpoint loop collapses
    * double-encoding (%2573id -> %73id -> sid) — a single pass would
    * leave a decodable layer that re-decodes on the NEXT normalize pass,
    * breaking idempotence. Bad escapes are stable immediately (repair
    * keeps them literal).
    */
  private def normalizeEscaping(s: String, inQuery: Boolean): String = {
    var cur = s
    var rounds = 0
    while (rounds < 4) {
      val next = percentEncode(percentDecode(cur), inQuery)
      if (next == cur) return cur
      cur = next
      rounds += 1
    }
    cur
  }

  /** Resolve `/seg/../` runs with the reference's iterative pattern —
    * a trailing `/..` without a slash is deliberately kept (their golden
    * case), and leading `/../` runs collapse.
    */
  private[functions] def normalizePathSegments(path0: String): String = {
    var path = path0
    var m = RelativePathPattern.findFirstMatchIn(path)
    while (m.isDefined) {
      path = path.substring(0, m.get.start) + "/" + path.substring(m.get.end)
      m = RelativePathPattern.findFirstMatchIn(path)
    }
    path
  }

  private def normalizeHostname(host: String): String = {
    var h = host.toLowerCase(java.util.Locale.ROOT)
    while (h.endsWith(".")) h = h.substring(0, h.length - 1)
    h
  }

  private def stripSessionParams(query: String): String =
    query
      .split("&", -1)
      .filter(_.nonEmpty) // reference drops empty parts: q=1&&z=2 -> q=1&z=2
      .filter { kv =>
        kv.indexOf('=') match {
          case -1 => true // key-only params are kept (reference patterns need '=')
          case i => // keys arrive escape-normalized (see normalizeUrl)
            StrippedQueryParamPattern.findFirstIn(kv.substring(0, i)).isEmpty
        }
      }
      .mkString("&")

  /** Canonicalize a URL (default protocol, lowercase host, default-port and
    * default-page removal, dot-segment resolution, session-param stripping,
    * percent-escaping normalization, fragment removal). Never throws; input
    * that cannot be parsed is returned trimmed.
    */
  def normalizeUrl(rawUrl: String): String = {
    if (rawUrl == null) return null
    var url = rawUrl.trim.replaceAll("[\\t\\r\\n]", "")
    if (url.isEmpty) return url
    // default protocol
    if (!url.matches("(?i)^[a-z][a-z0-9+.-]*:.*") || url.matches("(?i)^[a-z0-9.-]+:\\d+.*"))
      url = "http://" + url
    val parsed =
      try new URL(url)
      catch { case _: Exception => return url }

    val protocol = parsed.getProtocol.toLowerCase(java.util.Locale.ROOT)
    val host = normalizeHostname(Option(parsed.getHost).getOrElse(""))
    val defaultPort = if (protocol == "https") 443 else 80
    val port = parsed.getPort match {
      case -1 => -1
      case p if p == defaultPort => -1
      case p => p
    }

    // path: strip ;jsessionid matrix param, then escape-normalize each
    // segment FIRST — dot-segment resolution, default-page removal and
    // the `.`/empty filters must see final forms, or %2e-encoded dot
    // segments would survive one pass and resolve on the next
    // (idempotence). Per-segment encoding cannot create new boundaries
    // (an encoded %2f re-encodes inside its segment).
    var path = Option(parsed.getPath).getOrElse("")
    path = path.replaceAll("(?i);jsessionid=[^?#;]*", "")
    if (path.isEmpty) path = "/"
    path = path.split("/", -1)
      .map(normalizeEscaping(_, inQuery = false)).mkString("/")
    path = normalizePathSegments(path)
    path = DefaultPagePattern.replaceFirstIn(path, "/")
    // '/a/.' is the same location as '/a/' (RFC 3986 dot-segment), so a
    // trailing '/.' preserves the trailing slash after the '.' drops out
    val trailingSlash = path.endsWith("/") || path.endsWith("/.")
    val segs = path.split("/").filter(s => s.nonEmpty && s != ".")
    path =
      if (segs.isEmpty) "/"
      else segs.mkString("/", "/", if (trailingSlash) "/" else "")

    // query: same ordering principle — escape-normalize first so the
    // session-param strip and the emitted form share one representation
    // (an encoded %3D/%26 becomes structural on re-parse otherwise)
    var query = Option(parsed.getQuery).getOrElse("")
    if (query.nonEmpty) {
      query = normalizeEscaping(query, inQuery = true)
      query = stripSessionParams(query)
    }

    val sb = new java.lang.StringBuilder(url.length)
    sb.append(protocol).append("://").append(host)
    if (port != -1) sb.append(':').append(port)
    sb.append(path)
    if (query.nonEmpty) sb.append('?').append(query)
    sb.toString
  }

  // ----------------------------------------------------------------- validate

  private val HostnamePattern =
    "^([a-z0-9]([a-z0-9-]*[a-z0-9])?\\.)+[a-z]{2,}$".r
  private val Ipv4Pattern = "^\\d{1,3}(\\.\\d{1,3}){3}$".r

  /** http(s) scheme, parseable by both URL and URI, host is a dotted name
    * or IPv4 literal (reference SimpleUrlValidator.java:54-80).
    */
  def isValidUrl(url: String): Boolean = {
    if (url == null || url.isEmpty) return false
    try {
      val u = new URL(url)
      val proto = u.getProtocol
      if (proto != "http" && proto != "https") return false
      new URI(url) // must also be a valid URI
      val host = Option(u.getHost).getOrElse("").toLowerCase(java.util.Locale.ROOT)
      HostnamePattern.matches(host) || Ipv4Pattern.matches(host)
    } catch {
      case _: Exception => false
    }
  }

  /** Precompiled banned-suffix gate (reference SimpleUrlValidator.java
    * :35-50: the crawl CLI's mime filter builds `.(suffix|…)$` — the
    * leading `.` is any-char there, mirrored; the suffixes themselves
    * are quoted so metacharacters can't break or change the pattern).
    * Build once, apply per row.
    */
  def suffixValidator(bannedSuffixes: Seq[String]): String => Boolean =
    if (bannedSuffixes.isEmpty) url => isValidUrl(url)
    else {
      val p = java.util.regex.Pattern.compile(
        ".(" +
          bannedSuffixes.map(java.util.regex.Pattern.quote).mkString("|") +
          ")$")
      url => isValidUrl(url) && !p.matcher(url).find()
    }

  /** One-shot convenience form of [[suffixValidator]]. */
  def isValidUrl(url: String, bannedSuffixes: Seq[String]): Boolean =
    suffixValidator(bannedSuffixes)(url)

  /** Is `url`'s host within `domain` (equal or a subdomain)? Reference
    * SingleDomainUrlValidator.java:54-60.
    */
  def isUrlWithinDomain(url: String, domain: String): Boolean = {
    val host =
      try new URL(url).getHost.toLowerCase(java.util.Locale.ROOT)
      catch { case _: Exception => return false }
    val d = domain.toLowerCase(java.util.Locale.ROOT)
    host == d || host.endsWith("." + d)
  }

  // ---------------------------------------------------------------------- pld

  /** Multi-label public suffixes (beyond plain TLDs) for paid-level-domain
    * extraction. A compact curated subset of the public-suffix list — the
    * reference embeds the full Mozilla list via crawler-commons
    * EffectiveTldFinder (reference pojos/ValidUrl.java:161-170).
    */
  private val MultiLabelSuffixes: Set[String] = Set(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "sch.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "ind.in",
    "co.nz", "net.nz", "org.nz", "govt.nz",
    "co.za", "net.za", "org.za", "gov.za",
    "com.mx", "net.mx", "org.mx",
    "com.ar", "net.ar", "org.ar",
    "com.tr", "net.tr", "org.tr",
    "co.kr", "ne.kr", "or.kr", "go.kr",
    "com.sg", "net.sg", "org.sg", "edu.sg",
    "com.hk", "net.hk", "org.hk",
    "com.tw", "net.tw", "org.tw",
    "co.il", "net.il", "org.il",
    "com.ru", "net.ru", "org.ru")

  /** Paid-level domain: the registrable domain one label below the public
    * suffix ("www.foo.co.uk" -> "foo.co.uk"; "a.b.example.com" ->
    * "example.com"). IP literals and single-label hosts return unchanged.
    */
  def extractPldFromHost(hostRaw: String): String = {
    if (hostRaw == null || hostRaw.isEmpty) return hostRaw
    val host = normalizeHostname(hostRaw)
    if (Ipv4Pattern.matches(host)) return host
    val labels = host.split("\\.")
    if (labels.length <= 2) return host
    val lastTwo = labels.takeRight(2).mkString(".")
    if (MultiLabelSuffixes.contains(lastTwo) && labels.length >= 3)
      labels.takeRight(3).mkString(".")
    else lastTwo
  }

  /** PLD of a full URL; empty string when the URL has no parseable host. */
  def extractPld(url: String): String =
    try extractPldFromHost(new URL(url).getHost)
    catch { case _: Exception => "" }

  /** protocol://host[:port] (reference ValidUrl.java:128-135). */
  def urlWithoutPath(url: String): String =
    try {
      val u = new URL(url)
      val port = if (u.getPort == -1) "" else ":" + u.getPort
      s"${u.getProtocol}://${u.getHost.toLowerCase(java.util.Locale.ROOT)}$port"
    } catch { case _: Exception => url }

  def robotsUrl(url: String): String = urlWithoutPath(url) + "/robots.txt"

  /** The url's path for robots evaluation, "/" when absent (RFC 9309
    * matches rules against the path; an empty path is the root). Throws
    * on a malformed url — callers on executor paths guard with Try.
    */
  def robotsPath(url: String): String = {
    val u = new URL(url)
    Option(u.getPath).filter(_.nonEmpty).getOrElse("/")
  }

  /** Charset declared by a Content-Type header, validated against the
    * platform, falling back to UTF-8 (reference …/flinkcrawler/parser/
    * BasePageParser.java:62-63: CharsetUtils.clean of
    * HttpUtils.getCharsetFromContentType). Used to encode mock fetcher
    * text at the fetch boundary and to decode fetched bytes at parse —
    * the same resolution on both sides makes the byte path lossless.
    */
  def charsetFromContentType(contentType: String): java.nio.charset.Charset =
    "(?i)charset=\"?([^;\"\\s]+)"
      .r.findFirstMatchIn(Option(contentType).getOrElse(""))
      .map(_.group(1).trim)
      .flatMap { name =>
        try Some(java.nio.charset.Charset.forName(name))
        catch { case _: Exception => None }
      }
      .getOrElse(java.nio.charset.StandardCharsets.UTF_8)

  /** First value of a response header, case-insensitive on the name
    * (HTTP header names are case-insensitive; the reference's headers
    * multimap is consulted the same way, BasePageParser.java:62-91).
    */
  def headerFirst(
      headers: Map[String, Seq[String]], name: String): Option[String] =
    headers.collectFirst {
      case (k, vs) if k.equalsIgnoreCase(name) && vs.nonEmpty => vs.head
    }

  /** Parse-stage charset resolution: a charset declared by the
    * Content-Type response HEADER wins over one in the contentType field;
    * either falls back to UTF-8 (reference order: headers first, then
    * content sniffing — BasePageParser.java:62-91).
    */
  def charsetFromHeaders(
      headers: Map[String, Seq[String]],
      contentType: String): java.nio.charset.Charset =
    headerFirst(headers, "Content-Type")
      .filter(ct => "(?i)charset=".r.findFirstIn(ct).isDefined)
      .map(charsetFromContentType)
      .getOrElse(charsetFromContentType(contentType))

  /** Encode already-decoded text for the byte-faithful fetch path: the
    * DECLARED charset when it represents the text exactly (strict REPORT
    * encoding, not the JVM default '?'-substitution), else UTF-8 with the
    * contentType's charset rewritten to match — so the parse stage's
    * decode (same [[charsetFromContentType]] resolution) is always the
    * identity and mislabeled text is never silently corrupted.
    * Returns (bytes, possibly-rewritten contentType).
    */
  def encodeForFetch(
      text: String, contentType: String): (Array[Byte], String) = {
    def utf8Fallback: (Array[Byte], String) = {
      val ct = Option(contentType).getOrElse("text/plain")
      val rewritten =
        if ("(?i)charset=".r.findFirstIn(ct).isDefined)
          ct.replaceAll("(?i)charset=\"?[^;\"\\s]+\"?", "charset=UTF-8")
        else ct + "; charset=UTF-8"
      (text.getBytes(java.nio.charset.StandardCharsets.UTF_8), rewritten)
    }
    val cs = charsetFromContentType(contentType)
    // decode-only charsets (e.g. ISO-2022-CN) pass Charset.forName but
    // throw UnsupportedOperationException from newEncoder() — canEncode
    // screens them, NonFatal catches encoder failures beyond the strict
    // CharacterCodingException (either way the page re-labels as UTF-8)
    if (!cs.canEncode) utf8Fallback
    else
      try {
        val bb = cs.newEncoder().encode(java.nio.CharBuffer.wrap(text))
        val arr = new Array[Byte](bb.remaining())
        bb.get(arr)
        (arr, contentType)
      } catch {
        case scala.util.control.NonFatal(_) => utf8Fallback
      }
  }

  /** SURT-style archive index key (reference …/flinkcrawler/fetcher/
    * commoncrawl/CommonCrawlUrls.java:18-96 convertToIndexFormat):
    * lowercase host with a leading `www*` label dropped, labels reversed
    * and comma-joined, non-default port kept, then `)` and the lowercased
    * path (one trailing slash stripped, root stays `/`), the query with
    * params lowercased / sorted / deduped, and the fragment — groups all
    * of a registrable domain's URLs contiguously in a sorted archive
    * index and canonicalizes param order like the CDX index does.
    */
  def surtKey(url: String): String =
    try {
      val u = new URL(url)
      val labels = normalizeHostname(u.getHost).split("\\.")
      // only the FIRST label is www-skipped, by prefix — the reference's
      // startsWith("www") rule (CommonCrawlUrls.java:26): www2/www3
      // variants fold onto the apex, accepting that a pathological
      // wwwfoo.com folds too (faithful to the CDX convention)
      val kept =
        if (labels.length > 1 && labels.head.startsWith("www")) labels.tail
        else labels
      val reversed = kept.reverse.mkString(",")
      // explicit DEFAULT ports fold away (domain.com:80 == domain.com)
      val port =
        if (u.getPort == -1 || u.getPort == u.getDefaultPort) ""
        else ":" + u.getPort
      val rawPath = Option(u.getPath).getOrElse("")
      val path =
        if (rawPath.isEmpty || rawPath == "/") "/"
        else rawPath.toLowerCase(java.util.Locale.ROOT)
          .replaceAll("/$", "")
      val query = Option(u.getQuery).map { q =>
        // reference: lowercase, sort by full param text, dedupe identical
        "?" + q.toLowerCase(java.util.Locale.ROOT)
          .split("&").distinct.sorted.mkString("&")
      }.getOrElse("")
      val frag = Option(u.getRef).map("#" + _).getOrElse("")
      s"$reversed$port)$path$query$frag"
    } catch { case _: Exception => url }

  // --------------------------------------------------------------------- hash

  /** Stable 64-bit FNV-1a hash of a string's UTF-8 bytes. The engine only
    * needs internal consistency for frontier keys (reference uses JOAAT,
    * utils/HashUtils.java:7-10 — any well-mixed 64-bit hash is equivalent).
    */
  def urlHash64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xff).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  // ------------------------------------------------------------ registration

  /** Register all scalar functions for SQL use. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.udf.register("normalize_url", (s: String) => normalizeUrl(s))
    spark.udf.register("is_valid_url", (s: String) => isValidUrl(s))
    spark.udf.register("extract_pld", (s: String) => extractPld(s))
    spark.udf.register("url_without_path", (s: String) => urlWithoutPath(s))
    spark.udf.register("url_hash64", (s: String) => urlHash64(s))
    spark.udf.register("surt_key", (s: String) => surtKey(s))
  }
}
