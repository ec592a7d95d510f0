package graft.crawl

/** Minimal robots.txt semantics the reference relies on (via crawler-commons
  * SimpleRobotRulesParser in …/flinkcrawler/functions/
  * CheckUrlWithRobotsFunction.java:100-232): `Disallow:` path-prefix
  * blocking, `Crawl-delay:` seconds, `Sitemap:` discovery. Rules are parsed
  * once per robots body and cached per domain by the topology.
  */
final case class RobotsRules(
    disallowPrefixes: Seq[String],
    crawlDelayMs: Option[Long],
    sitemaps: Seq[String]) extends Serializable {

  def isAllowed(path: String): Boolean =
    !disallowPrefixes.exists(p => p.nonEmpty && path.startsWith(p))
}

object RobotsRules {

  val allowAll: RobotsRules = RobotsRules(Nil, None, Nil)

  /** Parse a robots.txt body. Like the reference's use, rules are taken from
    * every `User-agent` group (the mock fixtures use `*` exclusively).
    */
  def parse(body: String): RobotsRules = {
    var disallow = List.empty[String]
    var delay: Option[Long] = None
    var sitemaps = List.empty[String]
    body.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val idx = line.indexOf(':')
      if (idx > 0) {
        val key = line.substring(0, idx).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(idx + 1).trim
        key match {
          case "disallow" => if (value.nonEmpty) disallow ::= value
          case "crawl-delay" =>
            delay = value.toDoubleOption.map(d => (d * 1000).toLong)
          case "sitemap" => if (value.nonEmpty) sitemaps ::= value
          case _ =>
        }
      }
    }
    RobotsRules(disallow.reverse, delay, sitemaps.reverse)
  }
}
