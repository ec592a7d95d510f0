package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

import graft.functions.UrlFunctions
import graft.operators.UrlStateMerger
import graft.schema.{CrawlStateUrl, FetchUrl, FetchStatus => FS}

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
    maxPerFiring: Int = 1)
  extends StatefulProcessor[String, CrawlStateUrl, FetchUrl] {

  @transient private var active: MapState[Long, CrawlStateUrl] = _
  @transient private var timerArmed: ValueState[Boolean] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    active = getHandle.getMapState[Long, CrawlStateUrl](
      "activeUrls", Encoders.scalaLong, Encoders.product[CrawlStateUrl],
      TTLConfig.NONE)
    timerArmed = getHandle.getValueState[Boolean](
      "timerArmed", Encoders.scalaBoolean, TTLConfig.NONE)
  }

  override def handleInputRows(
      pld: String,
      rows: Iterator[CrawlStateUrl],
      timerValues: TimerValues): Iterator[FetchUrl] = {
    rows.foreach { incoming =>
      val key = UrlFunctions.urlHash64(incoming.url)
      val merged =
        if (active.containsKey(key))
          UrlStateMerger.merge(active.getValue(key), incoming)
        else incoming
      active.updateValue(key, merged)
    }
    // arm one recurring timer per domain on first sight (UrlDBFunction
    // registers a processing-time timer on the first URL :188-209)
    if (!timerArmed.exists()) {
      getHandle.registerTimer(
        timerValues.getCurrentProcessingTimeInMs() + checkIntervalMs)
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
    // re-arm: the scheduler keeps ticking while the query runs
    getHandle.registerTimer(
      timerValues.getCurrentProcessingTimeInMs() + checkIntervalMs)
    out.iterator
  }
}

object UrlDbProcessor {

  /** Wire the processor onto a keyed stream of crawl-state updates. */
  def schedule(
      updates: Dataset[CrawlStateUrl],
      checkIntervalMs: Long = 200,
      maxPerFiring: Int = 1): Dataset[FetchUrl] = {
    val spark = updates.sparkSession
    import spark.implicits._
    updates
      .groupByKey(_.pld)
      .transformWithState(
        new UrlDbProcessor(checkIntervalMs, maxPerFiring),
        TimeMode.ProcessingTime(),
        OutputMode.Append())
  }
}
