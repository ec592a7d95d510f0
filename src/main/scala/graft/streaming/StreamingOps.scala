package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.schema.{DomainScore, FetchUrl}

/** Keyed stateful streaming operators (SURVEY.md §2.15 "Stateful"): the
  * reference's timer/state constructs re-expressed with
  * `flatMapGroupsWithState` so they run identically under Structured
  * Streaming micro-batches and in batch tests via MemoryStream.
  */
object StreamingOps {

  // ----------------------------------------------------- moving average G1

  final case class ScoreEvent(pld: String, score: Float, seq: Long)
  final case class AvgState(window: List[Float])
  final case class AvgOut(pld: String, avgScore: Float, nSamples: Int)

  val MovingWindowSize = 10

  /** Per-PLD running average of the last 10 scores, emitted on every input
    * (reference …/flinkcrawler/functions/MovingAverageFunction.java:14-51:
    * count-based sliding window in keyed state).
    */
  def movingAverage(
      events: Dataset[ScoreEvent]): Dataset[AvgOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.pld)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (pld: String, it: Iterator[ScoreEvent], state: GroupState[AvgState]) => {
          var window = state.getOption.map(_.window).getOrElse(Nil)
          val out = it.toSeq.sortBy(_.seq).map { e =>
            window = (e.score :: window).take(MovingWindowSize)
            AvgOut(pld, window.sum / window.size, window.size)
          }
          state.update(AvgState(window))
          out.iterator
        })
  }

  // ---------------------------------------------------- politeness gate A2

  final case class GateState(nextFetchTime: Long)
  final case class GateOut(
      url: String, pld: String, score: Float, crawlDelay: Long,
      ready: Boolean, notBefore: Long)

  /** Per-domain politeness gate (reference …/flinkcrawler/functions/
    * FetchUrlsFunction.java:88-97): a URL arriving before the domain's
    * next-allowed fetch time is emitted as not-ready carrying that time;
    * otherwise it is released and the domain clock advances by its crawl
    * delay. `eventTime` supplies the logical clock (deterministic tests).
    */
  def politenessGate(
      urls: Dataset[FetchUrl], eventTime: Long): Dataset[GateOut] = {
    val spark = urls.sparkSession
    import spark.implicits._
    urls
      .groupByKey(_.pld)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (pld: String, it: Iterator[FetchUrl], state: GroupState[GateState]) => {
          var next = state.getOption.map(_.nextFetchTime).getOrElse(0L)
          // deterministic order: best score first, then url
          val out = it.toSeq.sortBy(u => (-u.score, u.url)).map { u =>
            if (eventTime >= next) {
              next = eventTime + u.crawlDelay
              GateOut(u.url, pld, u.score, u.crawlDelay, ready = true, 0L)
            } else
              GateOut(u.url, pld, u.score, u.crawlDelay, ready = false, next)
          }
          state.update(GateState(next))
          out.iterator
        })
  }

  // ------------------------------------------------- domain-score smoother

  /** Streamed domain-score averaging (the score feedback loop's stateful
    * half, reference UrlDBFunction.processElement2 :560-581): maintains
    * the per-domain moving average and the running global mean.
    */
  def domainScores(
      scores: Dataset[ScoreEvent]): Dataset[DomainScore] = {
    val spark = scores.sparkSession
    import spark.implicits._
    movingAverage(scores).map(a => DomainScore(a.pld, a.avgScore))
  }

  // -------------------------------------------------- event-rate window G4

  /** Sliding event-rate over a timestamped stream (reference TimedCounter,
    * FetchUrlsFunction.java:169-224): counts per 30 s window sliding by
    * 10 s, with a watermark bounding state.
    */
  def eventRate(
      spark: SparkSession,
      events: org.apache.spark.sql.DataFrame, // cols: ts timestamp, pld string
      window30s: String = "30 seconds",
      slide: String = "10 seconds") =
    events
      .withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), window30s, slide), col("pld"))
      .agg(count(lit(1)).as("n"))

  /** Streaming ingestion dedup for a continuous training-data pipeline:
    * drop re-arrivals of the same content fingerprint, with the watermark
    * bounding how long fingerprints are remembered — state is
    * O(docs per watermark horizon), not O(corpus), which is what keeps an
    * always-on ingest feed viable at 100 TB (the batch operators q18/q25
    * handle the full-corpus dedup passes).
    *
    * Input columns: ts (timestamp), plus `textCol`. Output adds the
    * fingerprint and keeps the first arrival of each.
    */
  def dedupStream(
      docs: org.apache.spark.sql.DataFrame,
      textCol: String,
      horizon: String = "10 minutes") =
    docs
      .withColumn("fingerprint", md5(col(textCol)))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Streaming gap sessionization — the always-on twin of
    * [[graft.queries.Relational.sessionize]], on Spark's native
    * `session_window` (state = open sessions only; the watermark closes
    * and emits a session once no event can extend it). Session
    * boundaries agree with the batch form exactly, INCLUDING the
    * exact-gap edge: Spark's session-merging iterator joins ADJACENT
    * windows (previous window end == next start ⇒ one session), so
    * events exactly `gap` apart stay together — the same `> gapMs`
    * split condition as [[graft.queries.Relational.sessionize]]
    * (batch ≡ stream equality on a replay, exact-gap pair included, is
    * spec-pinned in StreamingSpec).
    *
    * Input columns: `ts` (timestamp) + `keyCol`. Append-mode output, one
    * row per CLOSED session, field-parity with the batch form: key,
    * window struct, n_events, session_start / session_end (min/max event
    * epoch millis — NOT the window struct's `end`, which is last event
    * + gap), duration_ms.
    */
  def sessionizeStream(
      events: org.apache.spark.sql.DataFrame,
      keyCol: String,
      gap: String = "30 minutes",
      horizon: String = "10 minutes") =
    events
      .withWatermark("ts", horizon)
      .groupBy(session_window(col("ts"), gap), col(keyCol))
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_millis(col("ts"))).as("session_start"),
        max(unix_millis(col("ts"))).as("session_end"),
        (max(unix_millis(col("ts"))) - min(unix_millis(col("ts"))))
          .as("duration_ms"))
}
