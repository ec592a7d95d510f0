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
  /** Topology signal: a round/batch made progress (URLs fetched, frontier
    * advanced). Activity-based terminators reset their idle clock here;
    * others ignore it.
    */
  def reportActivity(): Unit = ()
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

/** Stop once the crawl has made no progress for `noActivityMs` (reference
  * test harness src/test/java/…/topology/NoActivityCrawlTerminator.java:7-31
  * — its loop-idle detector). The only self-stop that works for a
  * continuous (recrawl-enabled) crawl blocked on an empty frontier: a
  * duration bound keeps fetching forever, frontier exhaustion never fires.
  */
final class NoActivityCrawlTerminator(
    noActivityMs: Long,
    clock: () => Long = () => System.currentTimeMillis())
  extends CrawlTerminator {

  @volatile private var lastActivity: Long = Long.MaxValue

  override def open(): Unit = { lastActivity = clock() }
  override def reportActivity(): Unit = { lastActivity = clock() }
  override def isTerminated(): Boolean =
    clock() - lastActivity >= noActivityMs
}
