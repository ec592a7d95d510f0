package graft.crawl

import graft.schema.ExtractedUrl

/** Dependency-light HTML extraction (title, text, outlinks, meta-robots)
  * covering what the reference pulls out of Tika + its SAX link extractor
  * (reference …/flinkcrawler/parser/SimplePageParser.java:158-213,
  * BaseLinkExtractor.java:18-148, SimpleLinkExtractor.java:12-82): anchors
  * with href/rel/anchor-text, `<meta name=robots content=nofollow|none>`
  * suppression, and whitespace-collapsed body text.
  */
object HtmlParser {

  final case class ParseResult(
      title: String,
      text: String,
      outlinks: Seq[ExtractedUrl],
      noFollow: Boolean,
      // <meta name=... content=...> pairs, names lowercased, first
      // occurrence wins (reference carries Tika's Metadata map on every
      // parsed page, …/pojos/ParsedUrl.java:6-69)
      meta: Map[String, String] = Map.empty)

  /** Thrown inside regex scans when the parse time budget is exhausted. */
  final class ParseTimeout(msg: String) extends RuntimeException(msg)

  /** Watchdog wrapper: java.util.regex reads input through CharSequence
    * .charAt, so a deadline check there bounds even catastrophic
    * backtracking (the reference kills a parse at 30 s via a watchdog
    * thread around Tika — …/flinkcrawler/config/ParserPolicy.java:14-18,
    * …/parser/TikaCallable.java:27; a cooperative deadline is the
    * single-threaded form). Checked every 1024 reads so the common case
    * costs one counter increment per char.
    */
  private final class DeadlineCharSequence(
      s: CharSequence, deadlineNanos: Long) extends CharSequence {
    private[this] var reads = 0
    override def length: Int = s.length
    override def charAt(i: Int): Char = {
      reads += 1
      if ((reads & 0x3ff) == 0 && System.nanoTime() - deadlineNanos > 0)
        throw new ParseTimeout("parse time budget exceeded")
      s.charAt(i)
    }
    override def subSequence(a: Int, b: Int): CharSequence =
      new DeadlineCharSequence(s.subSequence(a, b), deadlineNanos)
    override def toString: String = s.toString
  }

  private val TitleRe =
    "(?is)<title[^>]*>(.*?)</title>".r
  private val MetaRobotsRe =
    "(?is)<meta\\s+[^>]*name\\s*=\\s*[\"']?robots[\"']?[^>]*>".r
  private val MetaTagRe =
    "(?is)<meta\\s+[^>]*>".r
  private val NameAttrRe =
    "(?is)name\\s*=\\s*[\"']([^\"']+)[\"']".r
  private val ContentAttrRe =
    "(?is)content\\s*=\\s*[\"']([^\"']*)[\"']".r
  private val AnchorRe =
    "(?is)<a\\s+([^>]*?)>(.*?)</a>".r
  private val HrefRe =
    "(?is)href\\s*=\\s*[\"']([^\"'#][^\"']*)[\"']".r
  private val RelRe =
    "(?is)rel\\s*=\\s*[\"']([^\"']*)[\"']".r
  private val TagRe = "(?s)<[^>]*>".r
  private val ScriptStyleRe = "(?is)<(script|style)[^>]*>.*?</\\1>".r
  private val BaseRe =
    "(?is)<base\\s+[^>]*href\\s*=\\s*[\"']([^\"']+)[\"']".r
  // `src` must start an attribute (follow whitespace), not merely end one
  // (data-src, imagesrc would otherwise match)
  private val MediaSrcRe =
    "(?is)<(?:img|source|video|audio|embed|iframe)\\s+(?:[^>]*\\s)?src\\s*=\\s*[\"']([^\"'#][^\"']*)[\"']".r

  /** Resolve a possibly relative href against the page URL. */
  private def resolve(pageUrl: String, href: String): Option[String] =
    try {
      val abs = new java.net.URL(new java.net.URL(pageUrl), href).toExternalForm
      Some(abs)
    } catch { case _: Exception => None }

  /** Does a `<meta name=robots>` tag forbid following links? Shared by
    * [[parse]] and [[mediaLinks]] so the two link feeds cannot drift.
    */
  private def metaNoFollow(html: CharSequence): Boolean =
    MetaRobotsRe
      .findFirstIn(html)
      .flatMap(tag => ContentAttrRe.findFirstMatchIn(tag).map(_.group(1)))
      .exists { c =>
        val lc = c.toLowerCase(java.util.Locale.ROOT)
        lc.contains("nofollow") || lc.contains("none")
      }

  /** The effective base for relative links: `<base href>` (itself resolved
    * against the page URL, per the HTML spec) or the page URL.
    */
  private def resolvedBase(pageUrl: String, html: CharSequence): String =
    BaseRe.findFirstMatchIn(html)
      .map(_.group(1))
      .flatMap(b => resolve(pageUrl, b))
      .getOrElse(pageUrl)

  /** Parse a page. `pageScore` is spread equally across outlinks
    * (reference SimplePageParser.java:192-199: outlink score =
    * pageScore / numOutlinks). `timeBudgetMs` bounds total parse time —
    * pathological markup (unbounded regex backtracking) raises
    * [[ParseTimeout]] instead of pinning an executor core (reference
    * ParserPolicy.java:14-18 defaults to 30 s).
    */
  def parse(
      pageUrl: String, html: String, pageScore: Float,
      timeBudgetMs: Long = Long.MaxValue): ParseResult = {
    val deadline =
      if (timeBudgetMs == Long.MaxValue) Long.MaxValue
      else System.nanoTime() + timeBudgetMs * 1000000L
    // EVERY regex pass must scan through a guarded sequence — including
    // ones over intermediate Strings produced by earlier passes (TagRe on
    // '<'-runs is itself O(n^2)-backtracking bait)
    def guard(s: CharSequence): CharSequence =
      if (deadline == Long.MaxValue) s
      else new DeadlineCharSequence(s, deadline)
    val h = guard(html)
    val title = TitleRe.findFirstMatchIn(h).map(_.group(1).trim).getOrElse("")
    val baseUrl = resolvedBase(pageUrl, h)
    val noFollow = metaNoFollow(h)

    val rawLinks =
      if (noFollow) Seq.empty
      else
        AnchorRe.findAllMatchIn(h).flatMap { m =>
          val attrs = m.group(1)
          val anchor = TagRe.replaceAllIn(m.group(2), " ").trim
          for {
            href <- HrefRe.findFirstMatchIn(attrs).map(_.group(1))
            rel = RelRe.findFirstMatchIn(attrs).map(_.group(1)).getOrElse("")
            if !rel.toLowerCase(java.util.Locale.ROOT).contains("nofollow")
            abs <- resolve(baseUrl, href)
          } yield (abs, anchor, rel)
        }.toSeq

    val linkScore =
      if (rawLinks.isEmpty) 0.0f else pageScore / rawLinks.size
    val outlinks = rawLinks.map { case (u, anchor, rel) =>
      ExtractedUrl(u, anchor, rel, linkScore)
    }

    val text = TagRe
      .replaceAllIn(guard(ScriptStyleRe.replaceAllIn(h, " ")), " ")
      .replaceAll("\\s+", " ")
      .trim

    val meta = MetaTagRe.findAllIn(h).foldLeft(Map.empty[String, String]) {
      (acc, tag) =>
        (for {
          name <- NameAttrRe.findFirstMatchIn(tag).map(
            _.group(1).trim.toLowerCase(java.util.Locale.ROOT))
          if !acc.contains(name)
          content <- ContentAttrRe.findFirstMatchIn(tag).map(_.group(1).trim)
        } yield acc.updated(name, content)).getOrElse(acc)
    }
    ParseResult(title, text, outlinks, noFollow, meta)
  }

  /** Budgeted parse that surfaces a timeout as `None` so dataflow call
    * sites can journal the page as ERROR_PARSE and move on (the
    * reference's side-output path for failed parses).
    */
  def parseWithBudget(
      pageUrl: String, html: String, pageScore: Float,
      timeBudgetMs: Long): Option[ParseResult] =
    try Some(parse(pageUrl, html, pageScore, timeBudgetMs))
    catch { case _: ParseTimeout => None }

  /** Media links (img/source/video/audio/embed/iframe src) resolved like
    * outlinks — the reference's link extractor accepts configurable
    * tag/attr sets beyond anchors (BaseLinkExtractor.java:21-51); this is
    * the feed for a multimodal ingest pipeline (Multimodal.decodeMeta et
    * al. consume the fetched bytes).
    */
  def mediaLinks(pageUrl: String, html: String): Seq[String] =
    // honor meta robots exactly like parse(): a nofollow/none page must
    // not feed the media ingest either
    if (metaNoFollow(html)) Seq.empty
    else {
      val baseUrl = resolvedBase(pageUrl, html)
      MediaSrcRe.findAllMatchIn(html)
        .flatMap(m => resolve(baseUrl, m.group(1)))
        .distinct
        .toSeq
    }

  /** Sitemap parsing: XML `<loc>` entries or plain-text URL lines
    * (reference …/flinkcrawler/parser/SimpleSiteMapParser.java:48-76).
    */
  def parseSitemap(body: String): Seq[String] = {
    val locs = "(?is)<loc>\\s*(.*?)\\s*</loc>".r
      .findAllMatchIn(body).map(_.group(1)).toSeq
    if (locs.nonEmpty) locs
    else
      body.linesIterator
        .map(_.trim)
        .filter(l => l.startsWith("http://") || l.startsWith("https://"))
        .toSeq
  }
}
