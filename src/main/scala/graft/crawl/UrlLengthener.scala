package graft.crawl

import org.apache.spark.sql.Dataset

import graft.functions.UrlFunctions

/** Async URL un-shortening stage (reference …/flinkcrawler/functions/
  * LengthenUrlsFunction.java:16-50 + urls/SimpleUrlLengthener.java:73-169):
  * URLs whose host is a known shortener are resolved one redirect hop via
  * the fetcher (redirects disabled, read the Location header — here the
  * `redirectedTo` field); everything else passes through. A per-partition
  * LRU memo (reference: 10k entries) bounds repeat lookups; partitions map
  * independently, so this scales with executors and the cache cost is
  * per-executor-core, not global.
  */
final class UrlLengthener(
    fetcher: Fetcher,
    shortenerHosts: Set[String] = UrlLengthener.DefaultShorteners,
    cacheSize: Int = 10000,
    // bounded-pool drain width (reference LengthenUrlsFunction.java:21
    // runs 100 threads); 1 = serial
    threads: Int = 100) extends Serializable {

  private def isShortened(url: String): Boolean = {
    val host =
      try new java.net.URL(UrlFunctions.normalizeUrl(url)).getHost
      catch { case _: Exception => return false }
    shortenerHosts.contains(host.toLowerCase(java.util.Locale.ROOT))
  }

  /** One redirect hop for shortener URLs; identity otherwise. The memo is
    * shared by the partition's pool workers: lookups/inserts synchronize
    * on it (access-ordered LRU mutates on get), the network hop runs
    * OUTSIDE the lock so a slow redirect never serializes the pool. Two
    * workers racing the same cold URL may both fetch — benign (same
    * answer, bounded by pool width), the price of not holding a lock
    * across I/O.
    */
  def lengthen(url: String, memo: java.util.LinkedHashMap[String, String]): String =
    if (!isShortened(url)) url
    else {
      val cached = memo.synchronized(memo.get(url))
      if (cached != null) cached
      else {
        // safeFetch: a dead/slow shortener must not fail the task — the
        // error page carries no redirect, so the url passes through
        // unchanged (reference SimpleUrlLengthener.java:104-111 returns
        // the original url on any fetch failure)
        val page = Fetcher.safeFetch(fetcher, UrlFunctions.normalizeUrl(url))
        val target = page.redirectedTo.getOrElse(url)
        memo.synchronized(memo.put(url, target))
        target
      }
    }

  /** Distributed form over (url, score) rows: each partition drains
    * through a bounded pool with unordered completion
    * ([[graft.util.Pooled]] — reference LengthenUrlsFunction.java:16-50's
    * 100-thread async stage).
    */
  def apply(urls: Dataset[(String, Float)]): Dataset[(String, Float)] = {
    val spark = urls.sparkSession
    import spark.implicits._
    val self = this
    val cap = cacheSize
    val width = threads
    urls.mapPartitions { it =>
      val memo = UrlLengthener.newMemo(cap)
      graft.util.Pooled.unordered(it, width, name = "lengthen") {
        case (u, s) => (self.lengthen(u, memo), s)
      }
    }
  }
}

object UrlLengthener {
  /** Access-ordered LRU memo capped at `cap` entries. NOTE: the cap must be
    * captured under a name that no LinkedHashMap member shadows — inside
    * the subclass, a captured local named `size` resolves to the inherited
    * size() method, silently making the bound `size() > size()` (never
    * true, unbounded growth).
    */
  def newMemo(cap: Int): java.util.LinkedHashMap[String, String] =
    new java.util.LinkedHashMap[String, String](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, String]): Boolean = this.size() > cap
    }

  /** Shortener-domain list (reference resource url-shorteners.txt — a
    * representative public subset).
    */
  val DefaultShorteners: Set[String] = Set(
    "bit.ly", "t.co", "goo.gl", "tinyurl.com", "ow.ly", "is.gd",
    "buff.ly", "j.mp", "dlvr.it", "tiny.cc", "lnkd.in", "db.tt",
    "qr.ae", "adf.ly", "bitly.com", "cur.lv", "ity.im", "q.gs",
    "po.st", "bc.vc", "su.pr", "twurl.nl")
}
