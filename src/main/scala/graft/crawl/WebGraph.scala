package graft.crawl

import graft.functions.UrlFunctions

/** In-memory web graph fixture: adjacency list with optional per-page
  * scores (reference test fixtures src/test/java/…/webgraph/
  * SimpleWebGraph.java:13-40 and ScoredWebGraph.java:10-25; text format
  * `page<TAB>outlink<TAB>outlink…`, blank lines and `#` comments ignored).
  * URLs are normalized on insert, exactly like the fixture.
  */
final case class WebPage(url: String, score: Float, outlinks: Seq[String])

final class WebGraph private (pages: Map[String, WebPage]) extends Serializable {

  def page(url: String): Option[WebPage] = pages.get(UrlFunctions.normalizeUrl(url))
  def allUrls: Seq[String] = pages.keys.toSeq.sorted
  def size: Int = pages.size
}

object WebGraph {

  /** Build from (page, outlinks…) rows; default score 1.0. */
  def apply(entries: (String, Seq[String])*): WebGraph =
    scored(entries.map { case (p, os) => (p, 1.0f, os) }: _*)

  /** Build with explicit page scores. */
  def scored(entries: (String, Float, Seq[String])*): WebGraph =
    new WebGraph(entries.map { case (p, s, os) =>
      val np = UrlFunctions.normalizeUrl(p)
      np -> WebPage(np, s, os.map(UrlFunctions.normalizeUrl))
    }.toMap)

  /** Parse the tab-separated adjacency text format. */
  def parse(text: String): WebGraph =
    apply(
      text.linesIterator
        .map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("#"))
        .map { line =>
          val parts = line.split("\t").toSeq
          (parts.head, parts.tail)
        }
        .toSeq: _*)
}
