package graft.crawl

/** Pluggable crawl termination (reference …/flinkcrawler/config/
  * CrawlTerminator.java:6-12): consulted once per round by the driver
  * recurrence (the reference checks it in the UrlDB timer and the seed
  * source). A tripped terminator stops the crawl regardless of frontier
  * state — the only way to bound a continuous (recrawl-enabled) crawl,
  * whose frontier never exhausts by construction.
  */
trait CrawlTerminator extends Serializable {
  /** Anchor any clocks; called once when the crawl starts (the
    * reference's open()).
    */
  def open(): Unit = ()
  def isTerminated(): Boolean
}

/** Stop after a wall-clock duration (reference …/flinkcrawler/config/
  * DurationCrawlTerminator.java:7-37). The clock is injectable so specs
  * drive it deterministically.
  */
final class DurationCrawlTerminator(
    maxDurationMs: Long,
    clock: () => Long = () => System.currentTimeMillis())
  extends CrawlTerminator {

  // unopened terminators never trip (mirrors the reference, where
  // isTerminated is only consulted after open())
  @volatile private var endTime: Long = Long.MaxValue

  override def open(): Unit = { endTime = clock() + maxDurationMs }
  override def isTerminated(): Boolean = clock() >= endTime
}
