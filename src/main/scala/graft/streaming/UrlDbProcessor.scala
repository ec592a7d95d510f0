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
  * processing-time timers that emit the best UNFETCHED URL per firing
  * (marking it QUEUED in state).
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
    maxIntervalMs: Long = 1000)
  extends StatefulProcessor[String, UrlDbProcessor.Envelope, FetchUrl] {

  @transient private var active: MapState[Long, CrawlStateUrl] = _
  @transient private var timerArmed: ValueState[Boolean] = _
  @transient private var domainScore: ValueState[Float] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    active = getHandle.getMapState[Long, CrawlStateUrl](
      "activeUrls", Encoders.scalaLong, Encoders.product[CrawlStateUrl],
      TTLConfig.NONE)
    timerArmed = getHandle.getValueState[Boolean](
      "timerArmed", Encoders.scalaBoolean, TTLConfig.NONE)
    domainScore = getHandle.getValueState[Float](
      "domainScore", Encoders.scalaFloat, TTLConfig.NONE)
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
        val merged =
          if (active.containsKey(key))
            UrlStateMerger.merge(active.getValue(key), incoming)
          else incoming
        active.updateValue(key, merged)
      }
    }
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

  override def handleExpiredTimer(
      pld: String,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[FetchUrl] = {
    // round-robin-ish selection: best-scored UNFETCHED urls, mark QUEUED
    val picks = active.iterator()
      .filter { case (_, s) => s.status == FS.UNFETCHED }
      .toSeq
      .sortBy { case (_, s) => (-s.score, s.url) }
      .take(maxPerFiring)
    val out = picks.map { case (key, s) =>
      active.updateValue(key,
        s.copy(status = FS.QUEUED,
          statusTime = timerValues.getCurrentProcessingTimeInMs()))
      FetchUrl(s.url, s.pld, s.score, 0L)
    }
    // re-arm at the score-scaled cadence: the scheduler keeps ticking,
    // fast domains tick more often
    getHandle.registerTimer(
      timerValues.getCurrentProcessingTimeInMs() + intervalFor())
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
      maxPerFiring: Int = 1): Dataset[FetchUrl] = {
    val spark = updates.sparkSession
    import spark.implicits._
    scheduleWithScores(
      updates.map(stateInput _), checkIntervalMs, maxPerFiring)
  }

  /** Dual-input form: crawl-state updates unioned with domain scores
    * (the reference's `connect` + dual keyBy, CrawlTopologyBuilder
    * .java:280-284) — scores modulate each domain's timer cadence.
    */
  def scheduleWithScores(
      inputs: Dataset[Envelope],
      checkIntervalMs: Long = 200,
      maxPerFiring: Int = 1,
      baselineScore: Float = 1.0f): Dataset[FetchUrl] = {
    val spark = inputs.sparkSession
    import spark.implicits._
    inputs
      .groupByKey(_.pld)
      .transformWithState(
        new UrlDbProcessor(checkIntervalMs, maxPerFiring, baselineScore),
        TimeMode.ProcessingTime(),
        OutputMode.Append())
  }
}
