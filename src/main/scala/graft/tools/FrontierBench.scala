package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.crawl.FrontierStore
import graft.operators.UrlStateMerger

/** Frontier-at-scale benchmark (PERF_NOTES round-2 candidate): merge and
  * persist a synthetic 10M-row frontier, then fold 1M-row update batches
  * into it — the steady-state shape of a continuous crawl where the
  * frontier is orders of magnitude larger than any round's update. Numbers
  * recorded in PERF_NOTES.md §"Frontier at 10M rows".
  *
  * Synthesis: ~1M plds x ~10 urls, 30% duplicate sightings so the merge
  * path (score-sum + recency pick) actually exercises, statuses mixed
  * lifecycle/terminal like a mid-crawl frontier.
  */
object FrontierBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    // NB: driver heap must be set by the launcher (sbt -mem / -Xmx) —
    // spark.driver.memory is a no-op once the JVM is running
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[frontier-bench] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    def synth(rows: Long, seedShift: Long) =
      // url space = (rows/10 plds) x 7 paths ≈ 0.7 x rows, so ~30% of rows
      // are duplicate sightings and the merge path actually folds
      spark.range(rows).select(
        concat(lit("http://d"), (col("id") + seedShift) % (rows / 10 + 1),
          lit(".com/p"), col("id") % 7).as("url"),
        concat(lit("d"), (col("id") + seedShift) % (rows / 10 + 1),
          lit(".com")).as("pld"),
        when(col("id") % 10 === 0, "FETCHED")
          .when(col("id") % 10 === 1, "HTTP_NOTFOUND")
          .when(col("id") % 10 === 2, "QUEUED")
          .otherwise("UNFETCHED").as("status"),
        (lit(1700000000000L) + col("id") % 100000).as("statusTime"),
        (col("id") % 100).cast("float").as("score"),
        (lit(1700000000000L) + col("id") % 50000).as("nextFetchTime"))

    val root = java.nio.file.Files
      .createTempDirectory("frontier_bench").toString

    val initial = synth(n, 0)
    time(s"merge ${n / 1000000}M rows (pure agg, count)") {
      println("  merged rows: " + UrlStateMerger.mergeFrontier(initial).count())
    }
    time(s"mergeInto v0 (${n / 1000000}M rows, bucketed write)") {
      FrontierStore.mergeInto(spark, root, initial)
    }
    val updates = synth(n / 10, 7) // 1M updates, keys overlap the frontier
    time(s"mergeInto v1 (+${n / 10000000.0}M updates over stored frontier)") {
      FrontierStore.mergeInto(spark, root, updates)
    }
    // merge-on-read payoff: a LOCALIZED round (updates whose domains all
    // live in one bucket — the steady-state shape is few crawled domains
    // changing) should cost ~1/64 of the uniform round above
    val localized = synth(n / 10, 7)
      .filter(pmod(xxhash64(col("pld")), lit(64)) === 0)
    println("  localized update rows: " + localized.count())
    time("mergeInto v2 (localized updates, bucket-pruned rewrite)") {
      FrontierStore.mergeInto(spark, root, localized)
    }
    time("domainSlice point lookup") {
      println("  slice rows: " +
        FrontierStore.domainSlice(spark, root, "d17.com").map(_.count()))
    }

    // right-to-be-forgotten purge cost: retire() rewrites only the
    // buckets the urls' plds hash into. A LOCALIZED delete set (one
    // domain — the takedown norm) touches ONE bucket; a scattered set
    // saturates at all 64 (≈ a full merge round), which is the honest
    // upper bound
    import spark.implicits._
    val oneDomain = FrontierStore.domainSlice(spark, root, "d17.com")
      .get.select("url").as[String].collect().toSeq
    time(s"frontier retire: one domain (${oneDomain.size} urls, 1 bucket)") {
      FrontierStore.retire(spark, root, oneDomain.toDF("url"))
    }
    val scattered = FrontierStore.read(spark, root).get
      .filter(pmod(xxhash64(col("url")), lit(1000)) === 0)
      .select("url").localCheckpoint(true)
    println("  scattered retire urls: " + scattered.count())
    time("frontier retire: scattered 0.1% (all buckets)") {
      FrontierStore.retire(spark, root, scattered)
    }

    // retention-sweep derivation cost: both time rules over the full
    // journal is ONE merge-on-read scan — the per-round price of the
    // autonomous deletion policy when it finds nothing (the steady
    // state) is this plus zero writes
    time("retention sweep candidates (GONE-age + TTL rules, one journal scan)") {
      println("  candidates: " + graft.crawl.RetentionPolicy
        .candidatesForFrontier(spark, root,
          graft.crawl.RetentionConfig(
            goneGraceMs = Some(1000L), maxAgeMs = Some(50000L)),
          nowMs = 1700000000000L + 100000L)
        .count())
    }

    // file-skipping payoff on the time-banded sweep: in a drifting crawl
    // the OLD rows concentrate in the buckets whose domains went quiet;
    // buckets whose every file is fresher than the cutoff are never
    // OPENED by the banded age scan (bucket-commit `_SKIP` sidecars).
    // Scenario: an old cohort localized to buckets 0-7 (domains that
    // stopped), then a full-width fresh cohort — the sweep should read
    // ~1/8 of the journal's files.
    def cohort(rows: Long, prefix: String, t: Long) =
      spark.range(rows).select(
        concat(lit(s"http://$prefix"), col("id") % (rows / 10 + 1),
          lit(".com/p"), col("id") % 7).as("url"),
        concat(lit(prefix), col("id") % (rows / 10 + 1), lit(".com")).as("pld"),
        lit("FETCHED").as("status"),
        (lit(t) + col("id") % 1000).as("statusTime"),
        lit(1.0f).as("score"), lit(0L).as("nextFetchTime"))
    val root2 = java.nio.file.Files
      .createTempDirectory("frontier_band").toString
    val oldCohort = cohort(n / 8, "olddom", 1700000000000L)
      .filter(pmod(xxhash64(col("pld")), lit(64)) < 8)
    time("banded-sweep setup: old cohort (buckets 0-7) + fresh full-width") {
      FrontierStore.mergeInto(spark, root2, oldCohort)
      FrontierStore.mergeInto(spark, root2,
        cohort(n, "newdom", 1705000000000L))
    }
    val bandCutoff = 1700000001000L
    time("age sweep, banded (sidecar file skipping)") {
      val Some((banded, info)) = FrontierStore.readBanded(spark, root2,
        Seq(graft.operators.DataSkipping
          .ColRange("statusTime", Long.MinValue, bandCutoff)))
      println(s"  rows: ${banded.count()}  files opened: " +
        s"${info.filesRead}/${info.filesTotal}")
    }
    time("age sweep, full scan (same predicate, no skipping)") {
      println("  rows: " + FrontierStore.read(spark, root2).get
        .filter(col("statusTime") <= bandCutoff).count())
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root2))

    // BASELINE.md scheduler target: drain a 10k-entry top-K selection per
    // round inside the reference's 200 ms average cadence budget. Same
    // plan shape as CrawlTopology's candidates block (eligibility gate,
    // per-PLD fairness window, global ORDER BY score LIMIT k).
    import org.apache.spark.sql.expressions.Window
    val stored = FrontierStore.read(spark, root).get
      .localCheckpoint(true)
    val perDomain = Window.partitionBy(col("pld"))
      .orderBy(col("score").desc, col("url").asc)
    def drain() = stored
      .filter(col("status") === "UNFETCHED" &&
        col("nextFetchTime") <= 1700000100000L)
      .withColumn("rn", row_number().over(perDomain))
      .filter(col("rn") <= 2)
      .orderBy(col("score").desc, col("url").asc)
      .limit(10000)
      .count()
    drain() // warm codegen
    time(s"schedule drain: top-10k over ${n / 10 * 7 / 1000000}M frontier") {
      println("  candidates: " + drain())
    }
    val rounds = 10
    time(s"schedule drain x$rounds (amortized per round)") {
      (1 to rounds).foreach(_ => drain())
    }

    // the literal reference budget: a 10k-entry frontier (FetchQueue
    // capacity) selected within the 200 ms cadence
    val small = stored.limit(10000).localCheckpoint(true)
    def drainSmall() = small
      .filter(col("status") === "UNFETCHED" &&
        col("nextFetchTime") <= 1700000100000L)
      .withColumn("rn", row_number().over(perDomain))
      .filter(col("rn") <= 2)
      .orderBy(col("score").desc, col("url").asc)
      .limit(10000)
      .count()
    drainSmall()
    time(s"schedule drain x$rounds on 10k frontier (amortized per round)") {
      (1 to rounds).foreach(_ => drainSmall())
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    spark.stop()
  }
}
