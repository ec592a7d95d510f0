package graft.crawl

/** Executor-local robots-rules cache with status-dependent TTLs (reference
  * …/flinkcrawler/functions/CheckUrlWithRobotsFunction.java:68-69,186-199:
  * 200 OK -> 12 h, 404 -> 24 h, 5xx -> 1 h). A JVM-wide singleton map, so
  * every task on an executor shares fetched rules across rounds and
  * micro-batches — the Spark analog of the reference's per-subtask
  * ConcurrentHashMap. The clock is injectable for deterministic tests.
  */
object RobotsCache {

  val OkTtlMs: Long = 12L * 3600 * 1000
  val NotFoundTtlMs: Long = 24L * 3600 * 1000
  val ErrorTtlMs: Long = 1L * 3600 * 1000

  private final case class Entry(rules: RobotsRules, expiresAt: Long)

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  // single-flight guard: the robots gate runs pld-partitioned through a
  // bounded pool (graft.util.Pooled), so a new host's first round is a
  // BURST of concurrent misses for the same robots URL — without this,
  // poolSize identical fetches race (the reference has the same shape:
  // 10 threads over one ConcurrentHashMap, CheckUrlWithRobotsFunction
  // .java:52,68). Losers wait on the winner's future instead of fetching.
  private val inflight = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.CompletableFuture[RobotsRules]]()

  /** Opportunistic-purge threshold: per-run scopes make old entries
    * unreachable, so without eviction a long-lived JVM running many
    * crawls grows without bound.
    */
  private val MaxEntries = 100000

  def clear(): Unit = cache.clear()
  def size: Int = cache.size()

  /** Drop every entry belonging to one crawl run (called by
    * CrawlTopology.run on completion).
    */
  def clearScope(scope: String): Unit =
    cache.keySet.removeIf(_.startsWith(scope + "|"))

  /** Entries held by one crawl run's scope (tests assert cleanup). */
  def scopeSize(scope: String): Int = {
    var n = 0
    val it = cache.keySet.iterator()
    while (it.hasNext) if (it.next().startsWith(scope + "|")) n += 1
    n
  }

  private def purgeExpired(nowMs: Long): Unit = {
    cache.entrySet.removeIf(e => e.getValue.expiresAt <= nowMs)
    // still over cap (pathological TTLs): trim to a low-water mark (90%)
    // so steady-state inserts don't trigger a full O(n) scan per call —
    // correctness only costs a refetch for the evicted entries
    val lowWater = MaxEntries * 9 / 10
    if (cache.size() > lowWater) {
      val it = cache.keySet.iterator()
      while (cache.size() > lowWater && it.hasNext) {
        it.next(); it.remove()
      }
    }
  }

  private def ttlFor(statusCode: Int): Long = statusCode match {
    case c if c >= 200 && c < 300 => OkTtlMs
    case 404 => NotFoundTtlMs
    case _ => ErrorTtlMs
  }

  /** Rules for a robots.txt URL, fetching through `fetcher` on miss or
    * expiry. `nowMs` defaults to wall clock; tests pass a logical clock.
    * `scope` namespaces entries per crawl run — the map is JVM-wide, so
    * without it rules fetched by one crawl (or test fixture) would leak
    * into any other crawl sharing the executor JVM.
    */
  def rulesFor(
      robotsUrl: String,
      fetcher: Fetcher,
      nowMs: Long = System.currentTimeMillis(),
      scope: String = ""): RobotsRules = {
    val key = if (scope.isEmpty) robotsUrl else scope + "|" + robotsUrl
    if (cache.size() > MaxEntries) purgeExpired(nowMs)
    val hit = cache.get(key)
    if (hit != null && hit.expiresAt > nowMs) hit.rules
    else {
      val mine = new java.util.concurrent.CompletableFuture[RobotsRules]()
      val winner = inflight.putIfAbsent(key, mine)
      if (winner != null) winner.join()
      else {
        try {
          // re-check under the flight guard: a waiter released a moment
          // ago may have just cached the rules we were about to refetch
          val again = cache.get(key)
          if (again != null && again.expiresAt > nowMs) {
            mine.complete(again.rules)
            again.rules
          } else {
            // a throwing robots fetch must not fail the caller's task (it
            // runs inside mapPartitions on both crawl paths): treat it
            // like a 5xx. Status semantics per RFC 9309 + the reference
            // (CheckUrlWithRobotsFunction.java:137-142, crawler-commons):
            // 2xx → parse; 4xx (no robots.txt) → allow-all; 5xx /
            // exception / anything else (unreachable) → DEFER all visits
            // under the short error TTL, retried on expiry — a
            // transiently-down robots.txt must not open disallowed paths
            // to the crawler, but the skips it causes are SKIPPED_DEFERRED
            // (retryable), not SKIPPED_BLOCKED (reference
            // CheckUrlWithRobotsFunction.java:186-228 + crawler-commons
            // failedFetch/isDeferVisits).
            val page = Fetcher.safeFetch(fetcher, robotsUrl)
            val rules = RobotsRules.fromPage(page)
              .getOrElse(RobotsRules.deferAll)
            cache.put(key, Entry(rules, nowMs + ttlFor(page.statusCode)))
            mine.complete(rules)
            rules
          }
        } finally {
          inflight.remove(key, mine)
          // a throw above (fromPage on a hostile page shape) must release
          // waiters — fail-closed (deferAll, the same stance as the
          // error TTL) rather than hang them
          if (!mine.isDone)
            mine.complete(RobotsRules.deferAll)
        }
      }
    }
  }

}
