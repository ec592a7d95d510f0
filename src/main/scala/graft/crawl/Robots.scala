package graft.crawl

/** Robots.txt semantics per the reference's parser (crawler-commons
  * SimpleRobotRulesParser, used at …/flinkcrawler/functions/
  * CheckUrlWithRobotsFunction.java:100-232), which implements the
  * RFC 9309 rule set: `Allow:`/`Disallow:` path rules with `*` wildcards
  * and `$` end-anchors, most-specific (longest) pattern wins, ties go to
  * Allow; plus `Crawl-delay:` seconds and `Sitemap:` discovery. Rules are
  * parsed once per robots body and cached per domain by the topology.
  *
  * @param rules (pattern, isAllow) in file order; empty pattern lines are
  *              dropped at parse time (`Disallow:` with no value = allow
  *              all, per the RFC)
  */
final case class RobotsRules(
    rules: Seq[(String, Boolean)],
    crawlDelayMs: Option[Long],
    sitemaps: Seq[String],
    // rules synthesized from an INDETERMINATE robots fetch (5xx /
    // exception): visits are DEFERRED, not blocked — crawler-commons'
    // isDeferVisits(), which the reference maps to SKIPPED_DEFERRED
    // instead of SKIPPED_BLOCKED (CheckUrlWithRobotsFunction.java:224)
    // so the URL retries once the short error TTL re-fetches robots
    deferVisits: Boolean = false) extends Serializable {

  @transient private lazy val compiled: Seq[(java.util.regex.Pattern, Boolean, Int)] =
    rules.map { case (pat, allow) =>
      (RobotsRules.compile(pat), allow, pat.length)
    }

  /** RFC 9309 evaluation: of all matching rules, the longest pattern
    * wins; at equal length Allow beats Disallow; no match = allowed.
    */
  def isAllowed(path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    compiled.foreach { case (p, allow, len) =>
      if (p.matcher(path).lookingAt() &&
        (len > bestLen || (len == bestLen && allow && !bestAllow))) {
        bestLen = len
        bestAllow = allow
      }
    }
    bestAllow
  }
}

object RobotsRules {

  val allowAll: RobotsRules = RobotsRules(Nil, None, Nil)

  /** Full disallow — the RFC 9309 stance when robots.txt is unreachable
    * (server error): every path starts with "/", so one disallow rule
    * covers the whole site. Reference parity: CheckUrlWithRobotsFunction
    * .java:137-142 maps robots fetch exceptions to a failed fetch rather
    * than crawling unguarded.
    */
  val allowNone: RobotsRules = RobotsRules(Seq("/" -> false), None, Nil)

  /** [[allowNone]] with the defer flag: the stance for a robots.txt that
    * is UNREACHABLE rather than forbidding — don't fetch now, but mark
    * the skip SKIPPED_DEFERRED so it re-arms on the error TTL instead of
    * the long blocked interval (reference CheckUrlWithRobotsFunction
    * .java:224 via crawler-commons failedFetch/isDeferVisits).
    */
  val deferAll: RobotsRules =
    RobotsRules(Seq("/" -> false), None, Nil, deferVisits = true)

  /** Back-compat helper: plain Disallow prefixes. */
  def disallowing(prefixes: String*): RobotsRules =
    RobotsRules(prefixes.map(_ -> false), None, Nil)

  /** Map a fetched robots.txt response to DEFINITIVE rules: 2xx →
    * parsed body, 4xx (no robots.txt) → allow-all, anything else
    * (5xx / exception sentinel / unreachable) → None. The ONE status
    * mapping both consumers share — they differ only in the
    * indeterminate stance: the CRAWL path assumes [[allowNone]] (don't
    * fetch while unsure — [[RobotsCache.rulesFor]]), the DELETION path
    * treats None as "never revoke" ([[RetentionPolicy]]): "delete the
    * corpus while unsure" is not a safe default.
    */
  def fromPage(page: FetchedPage): Option[RobotsRules] =
    if (page.statusCode >= 200 && page.statusCode < 300)
      Some(parse(page.content))
    else if (page.statusCode >= 400 && page.statusCode < 500)
      Some(allowAll)
    else None

  /** Compile a robots path pattern: literal prefix match with `*` as any
    * run and a trailing `$` anchoring the end of the path.
    */
  private[crawl] def compile(pat: String): java.util.regex.Pattern = {
    val anchored = pat.endsWith("$")
    val core = if (anchored) pat.dropRight(1) else pat
    val rx = core.split("\\*", -1)
      .map(java.util.regex.Pattern.quote)
      .mkString(".*")
    java.util.regex.Pattern.compile(rx + (if (anchored) "$" else ""))
  }

  /** Parse a robots.txt body. Like the reference's use, rules are taken
    * from every `User-agent` group (the mock fixtures use `*`
    * exclusively).
    */
  def parse(body: String): RobotsRules = {
    var rules = List.empty[(String, Boolean)]
    var delay: Option[Long] = None
    var sitemaps = List.empty[String]
    body.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val idx = line.indexOf(':')
      if (idx > 0) {
        val key = line.substring(0, idx).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(idx + 1).trim
        key match {
          case "disallow" => if (value.nonEmpty) rules ::= (value -> false)
          case "allow" => if (value.nonEmpty) rules ::= (value -> true)
          case "crawl-delay" =>
            delay = value.toDoubleOption.map(d => (d * 1000).toLong)
          case "sitemap" => if (value.nonEmpty) sitemaps ::= value
          case _ =>
        }
      }
    }
    RobotsRules(rules.reverse, delay, sitemaps.reverse)
  }
}
