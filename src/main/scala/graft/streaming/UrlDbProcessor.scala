package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

import graft.functions.UrlFunctions
import graft.operators.UrlStateMerger
import graft.schema.{CrawlStateUrl, DomainScore, FetchUrl, FetchStatus => FS}

/** The crawl DB as a Spark 4 `transformWithState` processor — the closest
  * structural analog to the reference's keyed co-process operator
  * (…/flinkcrawler/functions/UrlDBFunction.java:47-581): per-PLD `MapState`
  * of URL states with upsert-merge, a politeness clock, and
  * processing-time timers driving the full fetch lifecycle — UNFETCHED →
  * QUEUED (bounded queue with displacement restore) → FETCHING (emitted,
  * in-flight-capped) → terminal status fed back by the fetch stage.
  *
  * The frontier-table recurrence (CrawlTopology) remains the recommended
  * scale path — state lives in a table, not a state store — but this
  * processor is the live-streaming form for pipelines that want the crawl
  * DB inside a continuously running query with state-store checkpointing.
  */
class UrlDbProcessor(
    checkIntervalMs: Long = 200,
    maxPerFiring: Int = 1,
    // focused-crawl pacing (UrlDBFunction.checkIntervalForDomain
    // :333-351): interval = base x baseline/domainScore clamped to
    // [minIntervalMs, maxIntervalMs] — high-scoring domains tick faster.
    // `baselineScore` stands in for the reference's per-subtask running
    // average (its cross-domain average is JVM-local, unreplayable state
    // — the reference's own TODO; a per-batch broadcast of avg(score)
    // is the cluster form and composes with this same state field).
    baselineScore: Float = 1.0f,
    minIntervalMs: Long = 1,
    maxIntervalMs: Long = 1000,
    // FetchQueue capacity (reference FetchQueue.java via
    // CrawlTopologyBuilder maxFetchQueueSize): at most this many URLs
    // sit QUEUED per domain; a better candidate displaces the worst
    // queued entry, whose previous status is restored
    // (UrlDBFunction.java:306-317)
    maxQueueSize: Int = 10,
    // in-flight cap (UrlDBFunction.java:54 MAX_IN_FLIGHT_URLS = 100):
    // emissions stop while this many FETCHING URLs await their terminal
    // status. The reference counts per subtask; keyed state makes the
    // per-domain count the replayable cluster form.
    maxInFlight: Int = 100,
    // zombie guard: a FETCHING entry whose fetch stage died never gets
    // terminal feedback (the reference's own in-flight-map worry,
    // UrlDBFunction.java:245-250 close() dump); after this long it
    // reverts to UNFETCHED and frees its in-flight slot
    fetchTimeoutMs: Long = 300000)
  extends StatefulProcessor[String, UrlDbProcessor.Envelope, FetchUrl] {

  @transient private var active: MapState[Long, CrawlStateUrl] = _
  @transient private var timerArmed: ValueState[Boolean] = _
  @transient private var domainScore: ValueState[Float] = _
  @transient private var inFlight: ValueState[Int] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    active = getHandle.getMapState[Long, CrawlStateUrl](
      "activeUrls", Encoders.scalaLong, Encoders.product[CrawlStateUrl],
      TTLConfig.NONE)
    timerArmed = getHandle.getValueState[Boolean](
      "timerArmed", Encoders.scalaBoolean, TTLConfig.NONE)
    domainScore = getHandle.getValueState[Float](
      "domainScore", Encoders.scalaFloat, TTLConfig.NONE)
    // checkpointed with the rest of the keyed state, so the count
    // survives restore (the reference's transient AtomicInteger does
    // not — its own TODO at UrlDBFunction.java:57)
    inFlight = getHandle.getValueState[Int](
      "inFlight", Encoders.scalaInt, TTLConfig.NONE)
  }

  private def intervalFor(): Long =
    UrlDbProcessor.checkIntervalForDomain(
      if (domainScore.exists()) Some(domainScore.get()) else None,
      checkIntervalMs, baselineScore, minIntervalMs, maxIntervalMs)

  override def handleInputRows(
      pld: String,
      rows: Iterator[UrlDbProcessor.Envelope],
      timerValues: TimerValues): Iterator[FetchUrl] = {
    var sawUrl = false
    // batch the state-store traffic for this firing: ONE store read per
    // distinct URL (getValue returns null when absent — containsKey would
    // be a second round-trip), merges of repeated sightings fold in a
    // local map, writes and the in-flight counter flush once at the end.
    // The store round-trip is the ingest floor (PERF_NOTES §UrlDb), so
    // per-row traffic is what this path must never re-grow.
    val pending = new java.util.HashMap[Long, CrawlStateUrl]()
    var inFlightDelta = 0
    rows.foreach { env =>
      // input 2 (DomainScore): update pacing state
      // (UrlDBFunction.processElement2 :560-581)
      if (env.score != null)
        domainScore.update(env.score.score)
      // input 1 (CrawlStateUrl): upsert-merge into the URL map
      if (env.state != null) {
        sawUrl = true
        val incoming = env.state
        val key = UrlFunctions.urlHash64(incoming.url)
        val local = pending.get(key)
        val existing = if (local != null) local else active.getValue(key)
        // terminal feedback for an emitted URL retires its in-flight slot
        // (UrlDBFunction.java:445-464: FETCHING entries must not become
        // zombies that hold the cap forever)
        if (existing != null && existing.status == FS.FETCHING &&
            FS.isFetchedIsh(incoming.status)) {
          inFlightDelta -= 1
        }
        val merged =
          if (existing != null) UrlStateMerger.merge(existing, incoming)
          else incoming
        pending.put(key, merged)
      }
    }
    pending.forEach((k, v) => active.updateValue(k, v))
    if (inFlightDelta != 0)
      inFlight.update(math.max(0, currentInFlight() + inFlightDelta))
    // arm one recurring timer per domain on the first URL — only URLs
    // (UrlDBFunction registers the timer in processElement1 :188-209);
    // a score-only domain must not tick forever emitting nothing
    if (sawUrl && !timerArmed.exists()) {
      getHandle.registerTimer(
        timerValues.getCurrentProcessingTimeInMs() + intervalFor())
      timerArmed.update(true)
    }
    Iterator.empty
  }

  private def currentInFlight(): Int =
    if (inFlight.exists()) inFlight.get() else 0

  override def handleExpiredTimer(
      pld: String,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[FetchUrl] = {
    import UrlDbProcessor.better
    val now = timerValues.getCurrentProcessingTimeInMs()

    // One pass over the domain's URLs: collect the (≤ maxQueueSize by
    // invariant) QUEUED entries and a BOUNDED top-maxPerFiring selection
    // of UNFETCHED candidates — O(n·k) time, O(k) memory per firing. The
    // previous sort-everything was O(n log n) time and O(n) memory per
    // tick per domain; a 1M-URL domain blows the 200 ms cadence budget
    // that way (the reference keeps an O(1) round-robin index,
    // UrlDBFunction.java:108-126 — bounded selection is the batch form).
    val (queued, best, stale) = UrlDbProcessor.scanForFiring(
      active.iterator(), maxPerFiring, now, fetchTimeoutMs)

    // zombie FETCHING entries (no terminal feedback within the timeout)
    // revert to UNFETCHED and release their in-flight slots — without
    // this, a died fetch stage permanently eats into maxInFlight
    if (stale.nonEmpty) {
      stale.foreach { case (key, s) =>
        active.updateValue(key,
          s.copy(status = FS.UNFETCHED, statusTime = now))
      }
      inFlight.update(math.max(0, currentInFlight() - stale.length))
    }

    // (a) promote candidates into the bounded fetch queue; a full queue
    // admits a better URL by displacing its worst entry, whose previous
    // status is restored so it stays eligible (UrlDBFunction.java:306-317
    // restorePreviousStatus — only UNFETCHED URLs enter the queue, so
    // restore = back to UNFETCHED)
    best.foreach { case (key, s) =>
      if (queued.length < maxQueueSize) {
        val q = s.copy(status = FS.QUEUED, statusTime = now)
        active.updateValue(key, q)
        queued += ((key, q))
      } else {
        val wi = UrlDbProcessor.extremeIdx(queued, wantBest = false)
        val (wKey, w) = queued(wi)
        if (better(s, w)) {
          active.updateValue(wKey,
            w.copy(status = FS.UNFETCHED, statusTime = now))
          val q = s.copy(status = FS.QUEUED, statusTime = now)
          active.updateValue(key, q)
          queued(wi) = ((key, q))
        }
      }
    }

    // (b) emit the best queued URLs as FETCHING while under the in-flight
    // cap (UrlDBFunction.java:434-443): at most maxPerFiring per tick,
    // and never more than maxInFlight awaiting terminal feedback
    val capacity = math.min(maxPerFiring, maxInFlight - currentInFlight())
    val out = scala.collection.mutable.ArrayBuffer.empty[FetchUrl]
    var emitted = 0
    while (emitted < capacity && queued.nonEmpty) {
      val (key, s) = queued.remove(
        UrlDbProcessor.extremeIdx(queued, wantBest = true))
      active.updateValue(key, s.copy(status = FS.FETCHING, statusTime = now))
      out += FetchUrl(s.url, s.pld, s.score, 0L)
      emitted += 1
    }
    if (emitted > 0) inFlight.update(currentInFlight() + emitted)

    // re-arm at the score-scaled cadence: the scheduler keeps ticking,
    // fast domains tick more often
    getHandle.registerTimer(now + intervalFor())
    out.iterator
  }
}

object UrlDbProcessor {

  /** Tagged two-input envelope (SURVEY §2.4: SS stateful operators are
    * single-input, so the reference's CoProcess dual stream becomes a
    * union of tagged rows — exactly one of `state`/`score` is set).
    */
  final case class Envelope(
      pld: String, state: CrawlStateUrl, score: DomainScore)

  /** "Better" = higher score, ties broken lexicographically (deterministic
    * replay); shared by selection, queue displacement, and emission order.
    */
  def better(a: CrawlStateUrl, b: CrawlStateUrl): Boolean =
    a.score > b.score || (a.score == b.score && a.url < b.url)

  /** Index of the best (`wantBest`) or worst entry under [[better]] — the
    * single comparison order shared by queue displacement and emission,
    * so the two can never silently diverge.
    */
  def extremeIdx(
      entries: scala.collection.mutable.ArrayBuffer[(Long, CrawlStateUrl)],
      wantBest: Boolean): Int = {
    var idx = 0
    var i = 1
    while (i < entries.length) {
      val cmp =
        if (wantBest) better(entries(i)._2, entries(idx)._2)
        else better(entries(idx)._2, entries(i)._2)
      if (cmp) idx = i
      i += 1
    }
    idx
  }

  /** The timer's single pass over a domain's URL states: the (bounded by
    * invariant) QUEUED entries, a top-`k` bounded selection of UNFETCHED
    * candidates sorted best-first, and FETCHING entries staler than
    * `fetchTimeoutMs` (zombie fetches to revert). O(n·k) time, O(k +
    * queue + stale) memory — pure, so the 1M-URL cadence budget is
    * benchmarkable apart from the state-store plumbing.
    */
  def scanForFiring(
      it: Iterator[(Long, CrawlStateUrl)], k: Int,
      nowMs: Long = 0L, fetchTimeoutMs: Long = Long.MaxValue):
      (scala.collection.mutable.ArrayBuffer[(Long, CrawlStateUrl)],
        scala.collection.mutable.ArrayBuffer[(Long, CrawlStateUrl)],
        scala.collection.mutable.ArrayBuffer[(Long, CrawlStateUrl)]) = {
    val queued =
      scala.collection.mutable.ArrayBuffer.empty[(Long, CrawlStateUrl)]
    val best =
      scala.collection.mutable.ArrayBuffer.empty[(Long, CrawlStateUrl)]
    val stale =
      scala.collection.mutable.ArrayBuffer.empty[(Long, CrawlStateUrl)]
    it.foreach { case e @ (_, s) =>
      if (s.status == FS.QUEUED) queued += e
      // SKIPPED_DEFERRED (robots was unreachable) re-arms once its short
      // retry interval has passed — deferred means retry, not blocked
      else if (s.status == FS.UNFETCHED ||
          (s.status == FS.SKIPPED_DEFERRED && s.nextFetchTime <= nowMs)) {
        // insertion into a ≤ k buffer, worst dropped
        var i = best.length
        while (i > 0 && better(s, best(i - 1)._2)) i -= 1
        if (i < k) {
          best.insert(i, e)
          if (best.length > k) best.remove(best.length - 1)
        }
      } else if (s.status == FS.FETCHING &&
          fetchTimeoutMs != Long.MaxValue &&
          s.statusTime + fetchTimeoutMs <= nowMs) {
        stale += e
      }
    }
    (queued, best, stale)
  }

  def stateInput(s: CrawlStateUrl): Envelope = Envelope(s.pld, s, null)
  def scoreInput(d: DomainScore): Envelope = Envelope(d.pld, null, d)

  /** The reference's score-proportional cadence (UrlDBFunction
    * .checkIntervalForDomain :333-351): interval = base x baseline/score,
    * clamped to [min, max]; unscored domains tick at the base rate. Pure
    * so the pacing math is unit-testable apart from timer plumbing
    * (micro-batch granularity quantizes actual firing times — an overdue
    * timer fires once per batch, not once per missed interval).
    */
  def checkIntervalForDomain(
      domainScore: Option[Float], baseMs: Long, baselineScore: Float,
      minMs: Long, maxMs: Long): Long = {
    val score = math.max(0.01f, domainScore.getOrElse(baselineScore))
    val scaled = (baseMs * (baselineScore / score)).toLong
    // the max clamp bounds score-driven slowdown; it must never cap the
    // configured base itself (a 5 s politeness cadence stays 5 s)
    math.min(math.max(maxMs, baseMs), math.max(minMs, scaled))
  }

  /** Wire the processor onto a keyed stream of crawl-state updates. */
  def schedule(
      updates: Dataset[CrawlStateUrl],
      checkIntervalMs: Long = 200,
      maxPerFiring: Int = 1,
      maxQueueSize: Int = 10,
      maxInFlight: Int = 100,
      fetchTimeoutMs: Long = 300000): Dataset[FetchUrl] = {
    val spark = updates.sparkSession
    import spark.implicits._
    scheduleWithScores(
      updates.map(stateInput _), checkIntervalMs, maxPerFiring,
      maxQueueSize = maxQueueSize, maxInFlight = maxInFlight,
      fetchTimeoutMs = fetchTimeoutMs)
  }

  /** Dual-input form: crawl-state updates unioned with domain scores
    * (the reference's `connect` + dual keyBy, CrawlTopologyBuilder
    * .java:280-284) — scores modulate each domain's timer cadence.
    */
  def scheduleWithScores(
      inputs: Dataset[Envelope],
      checkIntervalMs: Long = 200,
      maxPerFiring: Int = 1,
      baselineScore: Float = 1.0f,
      maxQueueSize: Int = 10,
      maxInFlight: Int = 100,
      fetchTimeoutMs: Long = 300000): Dataset[FetchUrl] = {
    val spark = inputs.sparkSession
    import spark.implicits._
    inputs
      .groupByKey(_.pld)
      .transformWithState(
        new UrlDbProcessor(checkIntervalMs, maxPerFiring, baselineScore,
          maxQueueSize = maxQueueSize, maxInFlight = maxInFlight,
          fetchTimeoutMs = fetchTimeoutMs),
        TimeMode.ProcessingTime(),
        OutputMode.Append())
  }
}
