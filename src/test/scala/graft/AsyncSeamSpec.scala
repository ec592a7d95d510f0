package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.crawl._
import graft.schema.{FetchStatus => FS}

/** The async-I/O seams under INJECTED NETWORK LATENCY (the round-13
  * verdict's done-criterion): with every fetch costing real wall time,
  * the pooled drains ([[graft.util.Pooled]] at the robots gate, page
  * fetch, and lengthener — reference BaseAsyncFunction's 10/100-thread
  * pools) must hide latency relative to the serial threads=1 path while
  * producing IDENTICAL crawl facts (statuses, politeness, journal).
  */
/** JVM-static fetch counters (closures are task-serialized even in
  * local mode — instance fields would increment a copy).
  */
object AsyncSeamCounters {
  val robots = new java.util.concurrent.atomic.AtomicInteger(0)
  val retention = new java.util.concurrent.atomic.AtomicInteger(0)
  val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)
  val peak = new java.util.concurrent.atomic.AtomicInteger(0)
}

class AsyncSeamSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  /** Fetcher wrapper that sleeps `latencyMs` per request — the mocked
    * form of a real network round trip — and tracks the PEAK number of
    * concurrent in-flight fetches (JVM-static: closures are task-
    * serialized even in local mode).
    */
  private final class SlowFetcher(inner: Fetcher, latencyMs: Long)
    extends Fetcher {
    override def fetch(url: String): FetchedPage = {
      val cur = AsyncSeamCounters.inFlight.incrementAndGet()
      AsyncSeamCounters.peak.accumulateAndGet(cur, math.max)
      try {
        Thread.sleep(latencyMs)
        inner.fetch(url)
      } finally AsyncSeamCounters.inFlight.decrementAndGet()
    }
  }

  // two domains x 40 leaf pages, seeded directly: round 0 fetches all 80
  // (maxUrlsPerDomainPerRound = 40), and repartition-by-pld puts each
  // domain's 40 URLs in ONE partition — per-partition wall is where the
  // pool pays off (serial: 40 x latency; pooled: ~40/10 x latency)
  private val domains = Seq("pool-a.com", "pool-b.com")
  private val leaves =
    domains.flatMap(d => (1 to 40).map(i => s"$d/p$i"))
  private val graph = WebGraph(
    (domains.map(_ -> Seq.empty[String]) ++
      leaves.map(_ -> Seq.empty[String])): _*)

  private def crawl(latencyMs: Long, threads: Int): (CrawlResult, Long) = {
    val pf = new SlowFetcher(new WebGraphFetcher(graph), latencyMs)
    val rf = new SlowFetcher(new MapRobotsFetcher(Map.empty), latencyMs)
    val t0 = System.nanoTime()
    val r = CrawlTopology.run(
      spark,
      seeds = leaves.map(u => (u, 1.0f)),
      pageFetcher = pf,
      robotsFetcher = rf,
      cfg = CrawlConfig(
        maxRounds = 3, maxUrlsPerDomainPerRound = 40,
        robotsThreads = threads, fetchThreads = threads))
    (r, (System.nanoTime() - t0) / 1000000)
  }

  test("pooled fetch seams hide injected latency; crawl facts identical to serial") {
    val latency = 100L // 80 pages: ~2s of sequential sleep per fetch task
    // warm the whole path once (codegen/classloader/first-listing costs)
    // so the serial-vs-pooled differential measures ONLY the seams —
    // without this, first-run warmup lands entirely in whichever run
    // goes first and could mask a seam regressed to serial
    crawl(0L, threads = 1)
    def peaked(latencyMs: Long, threads: Int): (CrawlResult, Long, Int) = {
      AsyncSeamCounters.inFlight.set(0)
      AsyncSeamCounters.peak.set(0)
      val (r, ms) = crawl(latencyMs, threads)
      (r, ms, AsyncSeamCounters.peak.get())
    }
    val (serial, serialMs, serialPeak) = peaked(latency, threads = 1)
    val (pooled, pooledMs, pooledPeak) = peaked(latency, threads = 10)

    // identical facts: same per-url terminal status either way (pooling
    // reorders completion, never outcomes)
    def facts(r: CrawlResult): Map[String, String] =
      r.frontier.select("url", "status").collect()
        .map(row => row.getString(0) -> row.getString(1)).toMap
    val sf = facts(serial)
    val pf2 = facts(pooled)
    assert(sf == pf2, "pooled crawl changed terminal statuses")
    assert(leaves.forall(u => sf.get(s"http://$u").contains(FS.FETCHED)),
      s"not all leaves fetched: $sf")
    // journal discipline unchanged: same (stage,status) counts
    assert(serial.metrics == pooled.metrics,
      s"journal shape drifted: ${serial.metrics} vs ${pooled.metrics}")

    // concurrency, pinned DIRECTLY via peak in-flight fetches: with
    // threads=1 the seam degrades to a serial map, so concurrency is
    // capped by the slot count (local[4]); with threads=10 each of the
    // (explicitly slot-count-partitioned, see CrawlTopology.seamParts)
    // fetch tasks drains 10-wide — the crawl must exceed what task
    // parallelism alone can deliver
    val slots = spark.sparkContext.defaultParallelism
    assert(serialPeak <= slots,
      s"threads=1 should cap in-flight at the $slots slots, saw $serialPeak")
    assert(pooledPeak >= 2 * slots + 2,
      s"pooled peak $pooledPeak never exceeded task-level parallelism " +
        s"($slots slots x 10 threads configured) — seam not pooled")
    // latency hiding follows: the pooled run overlaps the sleep the
    // serial run pays sequentially (~20 urls x 100 ms per task)
    assert(pooledMs < serialMs - 1000,
      s"pooled ${pooledMs}ms did not beat serial ${serialMs}ms by the " +
        "injected-latency margin — seam not actually concurrent")
    // and the reference envelope holds WITH latency injected
    assert(pooledMs < 20000, s"broad-crawl envelope blown: ${pooledMs}ms")
  }

  test("robots single-flight: a same-host burst through the pool fetches robots.txt once") {
    // counter lives in a JVM-static object: the fetcher closure is
    // task-serialized even in local mode, so an instance field would
    // count into a deserialized COPY
    AsyncSeamCounters.robots.set(0)
    val countingRobots = new Fetcher {
      override def fetch(url: String): FetchedPage = {
        AsyncSeamCounters.robots.incrementAndGet()
        Thread.sleep(50)
        FetchedPage(404, "", "text/plain")
      }
    }
    val g = WebGraph(
      (1 to 24).map(i => s"burst.com/p$i" -> Seq.empty[String]): _*)
    CrawlTopology.run(
      spark,
      seeds = (1 to 24).map(i => (s"burst.com/p$i", 1.0f)),
      pageFetcher = new WebGraphFetcher(g),
      robotsFetcher = countingRobots,
      cfg = CrawlConfig(
        maxRounds = 2, maxUrlsPerDomainPerRound = 24,
        robotsThreads = 10, fetchThreads = 10))
    // one host, 24 concurrent misses in one partition, rules cached for
    // the rest of the crawl: exactly ONE fetch (the single-flight guard)
    val calls = AsyncSeamCounters.robots.get()
    assert(calls == 1,
      s"robots.txt fetched $calls times for one host under a pooled burst")
  }

  test("lengthener pool drains a single partition ≈ poolSize-wide (absolute wall)") {
    import spark.implicits._
    val latency = 50L
    val urls = (1 to 100).map(i => (s"http://bit.ly/u$i", 1.0f))
    val slow = new SlowFetcher(
      new Fetcher {
        override def fetch(url: String): FetchedPage =
          FetchedPage(301, "", "text/plain",
            redirectedTo = Some(url.replace("bit.ly", "long.example.com")))
      }, latency)
    val lengthener = new UrlLengthener(slow, threads = 100)
    val ds = spark.createDataset(urls).repartition(1) // force ONE partition
    val t0 = System.nanoTime()
    val out = lengthener(ds).collect()
    val wallMs = (System.nanoTime() - t0) / 1000000
    assert(out.length == 100)
    assert(out.forall(_._1.contains("long.example.com")))
    // serial would sleep 100 x 50ms = 5s in one task; 100 threads make
    // the sleep floor one latency — generous 2.5s bound absorbs Spark
    // job overhead while still being impossible serially
    assert(wallMs < 2500,
      s"single-partition lengthen took ${wallMs}ms — pool not hiding latency")
  }

  test("pooled retention robots re-check keeps revocation facts (affirmative-only)") {
    import spark.implicits._
    // 20 urls on one host, robots now disallows /gone-*: the pooled
    // drain (per-host computeIfAbsent single-flight) must revoke exactly
    // those, never the indeterminate host (5xx robots)
    AsyncSeamCounters.retention.set(0)
    val rf = new Fetcher {
      override def fetch(url: String): FetchedPage = {
        AsyncSeamCounters.retention.incrementAndGet()
        Thread.sleep(30)
        if (url.startsWith("http://tight.com"))
          FetchedPage(200, "User-agent: *\nDisallow: /gone-\n", "text/plain")
        else FetchedPage(503, "", "text/plain")
      }
    }
    val rows =
      (1 to 10).map(i => (s"http://tight.com/gone-$i", "tight.com")) ++
      (1 to 10).map(i => (s"http://tight.com/keep-$i", "tight.com")) ++
      (1 to 10).map(i => (s"http://down.com/p$i", "down.com"))
    val frontier = rows.toDF("url", "pld")
      .withColumn("status", lit(FS.FETCHED))
      .withColumn("statusTime", lit(1000L))
      .withColumn("score", lit(0.0f))
      .withColumn("nextFetchTime", lit(0L))
    val root = java.nio.file.Files
      .createTempDirectory("graft_async_ret").toString + "/frontier"
    FrontierStore.mergeInto(spark, root, frontier)
    val cands = RetentionPolicy.candidatesForFrontier(
      spark, root, nowMs = 2000L,
      cfg = RetentionConfig(robotsFetcher = Some(rf), robotsThreads = 8))
    val got = cands.select("url").collect().map(_.getString(0)).toSet
    assert(got == (1 to 10).map(i => s"http://tight.com/gone-$i").toSet,
      s"pooled re-check revoked the wrong set: $got")
    // per-host single-flight: 2 hosts → 2 robots fetches, not 30
    val rc = AsyncSeamCounters.retention.get()
    assert(rc == 2, s"robots re-fetched $rc times for 2 hosts")
  }

  test("live-crawl micro-batch seam drains pooled: single-partition batch ≈ poolSize-wide") {
    import spark.implicits._
    val latency = 50L
    val g = WebGraph(
      (1 to 40).map(i => s"live.com/p$i" -> Seq.empty[String]): _*)
    val pf = new SlowFetcher(new WebGraphFetcher(g), latency)
    val rf = new MapRobotsFetcher(Map.empty) // robots cached once per scope
    val batch = (1 to 40)
      .map(i => (s"http://live.com/p$i", "live.com", 1.0f))
      .toDF("url", "pld", "score")
      .repartition(1) // force ONE partition: the pool is the only width
    // untimed warmup (plan codegen + first-collect overhead), tiny batch
    graft.streaming.LiveCrawl.fetchParseBatch(
      spark, batch.limit(1), pf, rf,
      CrawlConfig(fetchThreads = 10, robotsThreads = 10),
      runScope = java.util.UUID.randomUUID().toString).collect()
    val t0 = System.nanoTime()
    val out = graft.streaming.LiveCrawl.fetchParseBatch(
      spark, batch, pf, rf,
      CrawlConfig(fetchThreads = 10, robotsThreads = 10),
      runScope = java.util.UUID.randomUUID().toString).collect()
    val wallMs = (System.nanoTime() - t0) / 1000000
    // every url produced its terminal status row
    assert(out.count(_.status == FS.FETCHED) == 40, out.mkString(","))
    // serial floor = 40 x 50ms = 2s in the one task; 10-wide ≈ 0.2s —
    // bound generous for job overhead, impossible serially
    assert(wallMs < 1500,
      s"single-partition live-fetch took ${wallMs}ms — seam not pooled")
  }
}
