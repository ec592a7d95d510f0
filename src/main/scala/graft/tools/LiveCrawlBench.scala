package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Live-crawl SCALE proof (VERDICT r15 item 1): drive
  * [[LiveCrawlTool.run]] — the full production wiring, real
  * [[graft.crawl.HttpFetcher]], durable frontier — against a
  * [[LoopbackFleet]] of hundreds of synthetic domains at local[32], and
  * measure what the reference's design point claims (10,000 outstanding
  * fetches with politeness pacing, CrawlTopologyBuilder.java:379-385):
  *
  *  - pages/s end to end and during the fetch-bound steady state;
  *  - realized fetch concurrency (fleet-measured peak in-flight) vs the
  *    configured ceiling (shuffle partitions × fetchThreads);
  *  - politeness adherence at the SOCKET: zero page hits inside a
  *    domain's crawl delay (wall-clock pacing via --wallclock);
  *  - per-round wall flatness over 50+ rounds with the durable frontier
  *    on (late-rounds mean / early-rounds mean from the round_ms gauge).
  *
  * Usage: LiveCrawlBench [domains] [pagesPerDomain] [latencyMs] [rounds]
  *        [fetchThreads]
  * Prints one JSON metrics line (PERF_NOTES carries the table).
  */
object LiveCrawlBench {

  def main(args: Array[String]): Unit = {
    val domains = args.lift(0).map(_.toInt).getOrElse(400)
    val pages = args.lift(1).map(_.toInt).getOrElse(200)
    val latency = args.lift(2).map(_.toLong).getOrElse(20L)
    val rounds = args.lift(3).map(_.toInt).getOrElse(60)
    val threads = args.lift(4).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // args 6+: extra LiveCrawlTool options as key=value (e.g.
    // maxurlsperdomain=5 frontierbuckets=16)
    val extra = args.drop(5).flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => Some(k -> v)
        case _ => None
      }
    }.toMap
    val m = run(spark, FleetConfig(
      domains = domains, pagesPerDomain = pages, latencyMs = latency),
      rounds = rounds, fetchThreads = threads, extraOpts = extra)
    println(m.json)
    spark.stop()
  }

  final case class Metrics(
      domains: Int, latencyMs: Long, rounds: Int,
      pagesFetched: Long, robotsFetched: Long, wallSec: Double,
      pagesPerSec: Double, steadyPagesPerSec: Double,
      maxInFlight: Int, configuredConcurrency: Int,
      politenessViolations: Long, minGapMs: Double, delayedDomains: Int,
      earlyRoundMs: Double, lateRoundMs: Double, flatness: Double) {
    def json: String =
      s"""{"metric":"live_crawl","domains":$domains,"latency_ms":$latencyMs,""" +
        s""""rounds":$rounds,"pages":$pagesFetched,"robots":$robotsFetched,""" +
        f""""wall_sec":$wallSec%.1f,"pages_per_sec":$pagesPerSec%.1f,""" +
        f""""steady_pages_per_sec":$steadyPagesPerSec%.1f,""" +
        s""""max_in_flight":$maxInFlight,"configured":$configuredConcurrency,""" +
        s""""politeness_violations":$politenessViolations,""" +
        f""""min_gap_ms":$minGapMs%.1f,"delayed_domains":$delayedDomains,""" +
        f""""early_round_ms":$earlyRoundMs%.0f,"late_round_ms":$lateRoundMs%.0f,""" +
        f""""flatness":$flatness%.2f}"""
  }

  /** The bench body against a caller-owned session (the spec drives a
    * small fleet through it and asserts on the returned metrics).
    */
  def run(
      spark: SparkSession, fleet: FleetConfig, rounds: Int,
      fetchThreads: Int = 10, seeds: Int = 8,
      extraOpts: Map[String, String] = Map.empty): Metrics = {
    val f = new LoopbackFleet(fleet)
    f.start()
    try {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_livebench").toString
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir, "seeds.txt"),
        (0 until math.min(seeds, fleet.domains))
          .map(i => f.url(i, "/p0")).mkString("", "\n", "\n"))
      val t0 = System.nanoTime()
      // nofrontier=true drops the durable store (in-memory frontier) so
      // an A/B of the two isolates the per-round commit cost
      val base = Map(
        "seedurls" -> s"$dir/seeds.txt",
        "maxrounds" -> rounds.toString,
        "defaultcrawldelay" -> "0",
        "fetchthreads" -> fetchThreads.toString,
        "frontierroot" -> s"$dir/frontier",
        "wallclock" -> "true",
        "nolengthen" -> "true") ++ extraOpts
      val opts =
        if (base.contains("nofrontier")) base - "frontierroot" - "nofrontier"
        else base
      val result = LiveCrawlTool.run(spark, opts)
      val wall = (System.nanoTime() - t0) / 1e9
      val roundMs = result.gauges
        .collect { case (r, "round_ms", v) => (r, v) }.sortBy(_._1)
      val fetchTasks = result.gauges
        .collect { case (_, "fetch_tasks", v) => v }
      System.err.println(s"[live-bench] fetch task counts: " +
        s"min=${if (fetchTasks.isEmpty) 0 else fetchTasks.min} " +
        s"max=${if (fetchTasks.isEmpty) 0 else fetchTasks.max}")
      val n = roundMs.length
      def mean(xs: Seq[Long]): Double =
        if (xs.isEmpty) 0.0 else xs.sum.toDouble / xs.length
      // skip round 1 (robots cold start for every discovered domain)
      val early = mean(roundMs.slice(1, math.min(11, n)).map(_._2))
      val late = mean(roundMs.takeRight(math.min(10, n - 1)).map(_._2))
      // steady-state throughput: pages per second over rounds 2..N
      // (round 1 pays the fleet-wide robots fan-out)
      val steadyWallMs = roundMs.drop(1).map(_._2).sum
      val r1Pages = result.journal
        .filter(col("stage") === "fetch" && col("round") === 1).count()
      val fetched = result.journal.filter(col("stage") === "fetch").count()
      val delayed =
        if (fleet.delayEvery > 0) (fleet.domains + fleet.delayEvery - 1) / fleet.delayEvery
        else 0
      Metrics(
        domains = fleet.domains, latencyMs = fleet.latencyMs,
        rounds = result.rounds,
        pagesFetched = fetched, robotsFetched = f.robotsHits.get(),
        wallSec = wall,
        pagesPerSec = fetched / wall,
        steadyPagesPerSec =
          if (steadyWallMs == 0) 0.0
          else (fetched - r1Pages) * 1000.0 / steadyWallMs,
        maxInFlight = f.maxInFlight.get(),
        configuredConcurrency =
          spark.conf.get("spark.sql.shuffle.partitions").toInt * fetchThreads,
        politenessViolations = f.politenessViolations.get(),
        minGapMs = f.minGapMs, delayedDomains = delayed,
        earlyRoundMs = early, lateRoundMs = late,
        flatness = if (early == 0) 0.0 else late / early)
    } finally f.stop()
  }
}
