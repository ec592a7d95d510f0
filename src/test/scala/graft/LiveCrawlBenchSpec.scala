package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.{FleetConfig, LiveCrawlBench}

/** The live-crawl scale harness at spec scale: a real multi-domain fleet
  * (24 loopback domains, each a distinct PLD to the engine) crawled
  * through the FULL production wiring — LiveCrawlTool.run, HttpFetcher,
  * wall-clock politeness pacing, durable frontier — asserting the
  * ground-truth invariants the big bench reports:
  *
  *  - ZERO politeness violations measured AT THE SOCKET: no two page
  *    hits to a crawl-delayed domain closer than its delay, in real
  *    time (the r15 verdict's headline ask);
  *  - the crawl actually spans the fleet (cross-domain discovery);
  *  - realized concurrency never exceeds the configured ceiling.
  */
class LiveCrawlBenchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("multi-domain live crawl: zero socket-level politeness violations") {
    val m = LiveCrawlBench.run(spark,
      FleetConfig(domains = 24, pagesPerDomain = 12, latencyMs = 5L,
        delayEvery = 3, crawlDelaySec = 0.3, serverThreads = 64),
      rounds = 25, fetchThreads = 8, seeds = 4)
    assert(m.politenessViolations == 0L,
      s"${m.politenessViolations} page hits landed inside a domain's " +
        s"crawl delay (min observed gap ${m.minGapMs} ms vs 300 ms)")
    // delayed domains were genuinely exercised more than once (a gap was
    // measured), so the zero above is not vacuous
    assert(m.minGapMs.isFinite,
      "no delayed domain was hit twice — politeness never tested")
    assert(m.minGapMs >= 300.0)
    // the crawl spread beyond the seeds via cross-domain links
    assert(m.robotsFetched >= 20,
      s"only ${m.robotsFetched} domains discovered of 24")
    assert(m.pagesFetched >= 50,
      s"only ${m.pagesFetched} pages fetched across 25 rounds")
    // realized concurrency stays inside tasks x fetchThreads
    assert(m.maxInFlight <= m.configuredConcurrency,
      s"in-flight ${m.maxInFlight} exceeded configured ${m.configuredConcurrency}")
  }
}
