package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.crawl.{CrawlConfig, Fetcher, HtmlParser, RobotsCache}
import graft.functions.UrlFunctions
import graft.schema.{CrawlStateUrl, FetchStatus => FS}

/** The LIVE streaming crawl: the reference's cyclic Flink topology
  * (…/flinkcrawler/topology/CrawlTopologyBuilder.java:271-284 — UrlDB →
  * fetch queue → robots → fetch → parse → outlinks looping back into the
  * UrlDB) re-expressed over Structured Streaming's acyclic model. The
  * cycle is closed through an external feedback channel, exactly like a
  * production deployment closes it through a Kafka topic:
  *
  *   channel ── UrlDbProcessor (keyed state, timers, in-flight caps)
  *           ── emitted FetchUrls ── foreachBatch: robots → fetch → parse
  *           ── status updates + cleaned outlinks ── channel   [loop]
  *
  * `UrlDbProcessor` owns the latency tier (per-domain pacing, bounded
  * queue, displacement, in-flight caps — state-store checkpointed); the
  * fetch/parse stages run DISTRIBUTED inside each micro-batch
  * (mapPartitions over the emitted URLs). The production channel is
  * [[FeedbackChannel.file]]: a durable, REPLAYABLE directory the loop
  * appends to distributedly and reads back as a file stream — paired
  * with `checkpointDir`, a killed crawl resumes with zero lost URLs.
  * `FeedbackChannel.memory` is the driver-side test form; a Kafka writer
  * slots in behind the same trait for queue-backed deployments.
  *
  * The frontier-table recurrence ([[graft.crawl.CrawlTopology]] +
  * FrontierStore) remains the bulk/scale tier (PERF_NOTES: 1.2M rows/s
  * merge vs 22k rows/s through keyed state); this loop is for the
  * hot-domain low-latency tier the reference runs everything through.
  */
object LiveCrawl {

  /** The callers' no-op batch observer; identity-compared by channels so
    * the production path never collects a batch nobody is watching.
    */
  val NoObserver: Seq[CrawlStateUrl] => Unit = _ => ()

  /** Where the loop's feedback rows go. Production = [[FeedbackChannel
    * .file]] (durable, replayable, distributed append) or a Kafka writer;
    * tests = [[FeedbackChannel.memory]] (driver-side by nature, rows are
    * one micro-batch's emissions — small by the scheduler's own caps).
    */
  trait FeedbackChannel extends Serializable {
    /** Driver-side push: seeds and tests. */
    def push(rows: Seq[UrlDbProcessor.Envelope]): Unit

    /** One micro-batch's feedback (status updates + outlink sightings).
      * Default = collect on the driver (memory/test form); durable
      * channels override with a distributed write. `onBatch` is the
      * caller's observer and implies a driver copy — pass [[NoObserver]]
      * in production.
      */
    def pushUpdates(
        updates: Dataset[CrawlStateUrl],
        onBatch: Seq[CrawlStateUrl] => Unit): Unit = {
      val rows = updates.collect().toSeq
      onBatch(rows)
      push(rows.map(UrlDbProcessor.stateInput))
    }
  }

  object FeedbackChannel {
    /** Test-form channel over a MemoryStream (NOT replayable — restart
      * resume needs [[file]]).
      */
    def memory(
        stream: org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[UrlDbProcessor.Envelope]): FeedbackChannel =
      new FeedbackChannel {
        override def push(rows: Seq[UrlDbProcessor.Envelope]): Unit =
          if (rows.nonEmpty) stream.addData(rows)
      }

    /** The durable production channel, no external queue required:
      * feedback rows append as parquet files under `dir` (a DISTRIBUTED
      * write — no driver hop) and the loop input is a file stream over
      * the same directory. The file source checkpoints which files it has
      * consumed, so the pair (dir, checkpointDir) makes the whole loop
      * replayable: kill the query, start a new one on the same two paths,
      * and unconsumed feedback replays into the restored scheduler state
      * — the reference's checkpointed AT_LEAST_ONCE loop contract
      * (…/tools/CrawlTool.java:60-64). The directory doubles as a
      * complete crawl journal (every status row and sighting, in order).
      *
      * Returns (loop input, channel) — hand both to [[LiveCrawl.start]].
      * `writePartitions` coalesces each micro-batch's append (batches are
      * bounded by the scheduler caps; 1 file per batch is right unless
      * maxPerFiring × domains is huge). `maxFilesPerTrigger` bounds how
      * many backlog files one micro-batch swallows on resume.
      *
      * Retention: a continuous crawl appends feedback files forever, so by
      * default consumed files are DELETED once the file source's
      * checkpoint has committed past them (Spark's own `cleanSource`
      * cleaner — retention piggybacks on exactly the offset log that makes
      * the channel replayable, so an unconsumed file is never touched and
      * a restart still replays pending feedback). Directory size is then
      * proportional to the loop's in-flight lag, not to crawl age —
      * the flatness property the reference's checkpointed continuous loop
      * needs (…/tools/CrawlTool.java:60-64). Pass `archiveDir` to move
      * consumed files aside instead (keeps the complete crawl journal
      * while the live directory stays bounded), or `retainConsumed = true`
      * for the old keep-everything behavior (short test crawls). The
      * file-source seen-file map is bounded separately by Spark's
      * `maxFileAge` (default 7 days) + metadata-log compaction.
      */
    def file(
        spark: SparkSession,
        dir: String,
        writePartitions: Int = 1,
        maxFilesPerTrigger: Int = 64,
        archiveDir: Option[String] = None,
        retainConsumed: Boolean = false):
        (Dataset[UrlDbProcessor.Envelope], FeedbackChannel) = {
      import spark.implicits._
      new java.io.File(dir).mkdirs()
      val reader = spark.readStream
        .schema(org.apache.spark.sql.Encoders
          .product[UrlDbProcessor.Envelope].schema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
      archiveDir match {
        case Some(ad) =>
          reader.option("cleanSource", "archive")
            .option("sourceArchiveDir", ad)
        case None if !retainConsumed =>
          reader.option("cleanSource", "delete")
        case _ => ()
      }
      val input = reader.parquet(dir).as[UrlDbProcessor.Envelope]
      (input, new FileFeedbackChannel(dir, writePartitions))
    }
  }

  /** See [[FeedbackChannel.file]]. Serializable-safe: holds only the
    * directory path; sessions are resolved at call time on the driver
    * (both entry points run in driver context — push from the caller,
    * pushUpdates inside foreachBatch).
    */
  final class FileFeedbackChannel(dir: String, writePartitions: Int)
    extends FeedbackChannel {

    override def push(rows: Seq[UrlDbProcessor.Envelope]): Unit =
      if (rows.nonEmpty) {
        val spark = SparkSession.active
        import spark.implicits._
        spark.createDataset(rows).coalesce(1)
          .write.mode("append").parquet(dir)
      }

    override def pushUpdates(
        updates: Dataset[CrawlStateUrl],
        onBatch: Seq[CrawlStateUrl] => Unit): Unit =
      if (onBatch eq NoObserver) {
        // production path: one distributed append, nothing on the driver
        val spark = updates.sparkSession
        import spark.implicits._
        updates.map(UrlDbProcessor.stateInput _)
          .coalesce(writePartitions)
          .write.mode("append").parquet(dir)
      } else {
        // observer branch: collect ONCE and re-ship from the driver — a
        // second distributed action would re-run the fetch stage (fetch
        // side effects must happen exactly once per micro-batch)
        val rows = updates.collect().toSeq
        onBatch(rows)
        push(rows.map(UrlDbProcessor.stateInput))
      }
  }

  /** One micro-batch of the fetch/parse stage: robots-gate, fetch, parse
    * (budgeted), and derive the feedback rows — terminal status updates
    * (which retire the scheduler's in-flight slots) plus cleaned outlink
    * sightings. Distributed: one mapPartitions over the batch.
    */
  def fetchParseBatch(
      spark: SparkSession,
      batch: DataFrame,
      pageFetcher: Fetcher,
      robotsFetcher: Fetcher,
      cfg: CrawlConfig,
      runScope: String): Dataset[CrawlStateUrl] = {
    import spark.implicits._
    val pf = pageFetcher
    val rf = robotsFetcher
    val budget = cfg.parseBudgetMs
    val maxOutlinks = cfg.maxOutlinksPerPage
    batch.select("url", "pld", "score").as[(String, String, Float)]
      .mapPartitions { it =>
        // pooled unordered drain (graft.util.Pooled): robots + page fetch
        // are both network hops, so one slow host must not serialize the
        // micro-batch's partition. RobotsCache's single-flight guard
        // keeps a same-host burst to one robots fetch.
        graft.util.Pooled.unordered(
            it, cfg.fetchThreads, name = "live-fetch") {
          case (url, pld, score) =>
          val now = System.currentTimeMillis()
          val rules = RobotsCache.rulesFor(
            UrlFunctions.robotsUrl(url), rf, scope = runScope)
          val path =
            try UrlFunctions.robotsPath(url)
            catch { case _: Exception => "/" }
          if (!rules.isAllowed(path))
            // unreachable robots (deferVisits) → retryable DEFER on the
            // short interval, not a long-lived block (CrawlTopology's
            // batch gate makes the same split)
            Vector(
              if (rules.deferVisits)
                CrawlStateUrl(url, pld, FS.SKIPPED_DEFERRED, now, score,
                  now + cfg.deferRetryMs)
              else
                CrawlStateUrl(url, pld, FS.SKIPPED_BLOCKED, now, score,
                  now + cfg.deferBlockedMs))
          else {
            // a fetcher failure must stay a STATUS, not a query failure:
            // the reference maps fetch exceptions to error FetchStatuses
            // and the terminal row is what retires the scheduler's
            // in-flight slot — an escaped exception would kill the whole
            // streaming query and strand the slot until the zombie timeout
            val page = Fetcher.safeFetch(pf, url)
            val status = FS.fromHttpStatus(page.statusCode)
            val statusRow = CrawlStateUrl(
              url, pld, status, now, score,
              now + cfg.forceCrawlDelayMs.getOrElse(math.max(
                rules.crawlDelayMs.getOrElse(0L), cfg.defaultCrawlDelayMs)))
            // redirects feed the target back as a fresh sighting (same as
            // CrawlTopology.redirectTargets) — without this, pages behind
            // 3xx are silently lost to the live loop
            val redirect =
              if (status != FS.HTTP_MOVED && status != FS.HTTP_REDIRECTED)
                Iterator.empty
              else page.redirectedTo.iterator
                .map(UrlFunctions.normalizeUrl)
                .filter(UrlFunctions.isValidUrl)
                .map(t => CrawlStateUrl(
                  t, UrlFunctions.extractPld(t), FS.UNFETCHED, now, score,
                  0L))
            val outlinks =
              if (status != FS.FETCHED || !page.contentType.contains("html"))
                Iterator.empty
              else {
                val (bytes, ct) =
                  if (page.bytes != null) (page.bytes, page.contentType)
                  else UrlFunctions.encodeForFetch(
                    page.content, page.contentType)
                val html = new String(
                  bytes, UrlFunctions.charsetFromContentType(ct))
                HtmlParser.parseWithBudget(url, html, score, budget) match {
                  case None =>
                    Iterator.empty // budget blown: statusRow still FETCHED
                  case Some(p) => p.outlinks.iterator
                    .take(maxOutlinks)
                    .flatMap { o =>
                      val u = UrlFunctions.normalizeUrl(o.url)
                      if (UrlFunctions.isValidUrl(u))
                        Some(CrawlStateUrl(
                          u, UrlFunctions.extractPld(u), FS.UNFETCHED,
                          now, o.score, 0L))
                      else None
                    }
                }
              }
            // materialized ON the pool thread so parse work parallelizes
            // too (a lazy iterator would defer it to the drain thread)
            (Iterator.single(statusRow) ++ redirect ++ outlinks).toVector
          }
        }.flatten
      }
  }

  /** Start the loop. `input` is the channel's streaming Dataset (for the
    * memory form, `stream.toDS()`); seed by pushing UNFETCHED sightings
    * into the channel. Returns the running query; stop it to end the
    * crawl (or wire a [[graft.crawl.CrawlTerminator]] into the caller's
    * lifecycle).
    */
  def start(
      spark: SparkSession,
      input: Dataset[UrlDbProcessor.Envelope],
      channel: FeedbackChannel,
      pageFetcher: Fetcher,
      robotsFetcher: Fetcher,
      cfg: CrawlConfig = CrawlConfig(),
      checkIntervalMs: Long = 200,
      maxPerFiring: Int = 2,
      onBatch: Seq[CrawlStateUrl] => Unit = NoObserver,
      scope: String = "",
      checkpointDir: Option[String] = None,
      fetchTimeoutMs: Long = 300000): StreamingQuery = {
    // always unique per run: two live queries given the same caller scope
    // must not share robots entries or clear each other's mid-run. The
    // caller's scope stays a key PREFIX (runScope = "<scope>|<uuid>", keys
    // = "<runScope>|<url>"), so scopeSize(scope)/clearScope(scope) still
    // see all of that caller's runs while each run cleans only its own.
    val runScope = {
      val uuid = java.util.UUID.randomUUID().toString
      if (scope.nonEmpty) scope + "|" + uuid else uuid
    }
    val fetchUrls = UrlDbProcessor.scheduleWithScores(
      input, checkIntervalMs, maxPerFiring,
      maxQueueSize = cfg.maxQueueSize,
      maxInFlight = cfg.maxUrlsPerDomainPerRound * 100,
      fetchTimeoutMs = fetchTimeoutMs)
    val writer = fetchUrls.writeStream
      .outputMode("append")
    // durable scheduler state (queues, in-flight counts, pacing clocks)
    // lives in the state store under this checkpoint — restart with the
    // same dir and a REPLAYABLE channel (FeedbackChannel.file or Kafka)
    // to resume; the reference's checkpointed-UrlDB contract
    // (…/tools/CrawlTool.java:60-64). The MemoryStream test channel is
    // not replayable, so its specs exercise within-run state only.
    checkpointDir.foreach(writer.option("checkpointLocation", _))
    val query = writer
      .foreachBatch { (batch: Dataset[graft.schema.FetchUrl], _: Long) =>
        val updates = fetchParseBatch(
          spark, batch.toDF(), pageFetcher, robotsFetcher, cfg, runScope)
        // the channel decides how feedback travels: the file channel does
        // a distributed append (no driver hop); memory/observer forms
        // collect one micro-batch's rows (bounded by the scheduler caps)
        channel.pushUpdates(updates, onBatch)
      }
      .start()
    // this run's robots entries die with the query (CrawlTopology.run
    // clears its scope the same way) — otherwise every start() leaks a
    // scope's worth of cache until TTL / the opportunistic purge.
    // A daemon waiter, not a StreamingQueryListener: a listener added
    // after start() can miss an immediate termination event, whereas
    // awaitTermination returns at once if the query already ended.
    val waiter = new Thread(() => {
      // failed query still cleans up (finally); NonFatal only — swallowing
      // InterruptedException / VM errors would hide real problems
      try query.awaitTermination()
      catch { case scala.util.control.NonFatal(_) => () }
      finally RobotsCache.clearScope(runScope)
    }, s"livecrawl-scope-cleanup-$runScope")
    waiter.setDaemon(true)
    waiter.start()
    query
  }
}
