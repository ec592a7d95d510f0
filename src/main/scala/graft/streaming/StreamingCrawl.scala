package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.crawl.{CrawlConfig, CrawlResult, CrawlTopology, Fetcher}

/** The crawl as a Structured Streaming query (SURVEY.md §2.12): seed URLs
  * arrive as a stream (file drop directory, rate-limited source, or
  * MemoryStream in tests — the reference's slow-drip SeedUrlSource);
  * `foreachBatch` merges each seed micro-batch into the persistent
  * frontier and crawls to quiescence with the batch topology. The frontier
  * folds across micro-batches, so re-seeded URLs hit the merge semantics
  * (already-FETCHED pages are not refetched) instead of restarting.
  */
object StreamingCrawl {

  /** Rate-limited drip of a fixed seed list (reference SeedUrlSource
    * .java:36,128-131: seeds trickle in instead of flooding round 1, so
    * the crawl warms up domain politeness state gradually). Driven by the
    * rate source: row `value` n carries seed n, paced at
    * `seedsPerSecond`; once the list is exhausted the stream goes quiet.
    */
  def drippedSeedStream(
      spark: SparkSession,
      seeds: Seq[(String, Float)],
      seedsPerSecond: Int = 1): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    import spark.implicits._
    val lookup = seeds.zipWithIndex
      .map { case ((u, s), i) => (i.toLong, u, s) }
      .toDF("idx", "url", "score")
    spark.readStream.format("rate")
      .option("rowsPerSecond", seedsPerSecond.toString).load()
      .select(col("value").as("idx"))
      .join(broadcast(lookup), Seq("idx"))
      .select(col("url"), col("score"))
  }

  /** File-drop seed source with ingest throttling: CSV lines `url,score`
    * under `dir`, at most `maxFilesPerTrigger` new files per micro-batch
    * (the Spark-native form of the reference's slow-drip seed source —
    * without the cap, a bulk drop of seed files floods the first batch).
    */
  def fileSeedStream(
      spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema("url STRING, score FLOAT")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .csv(dir)

  /** Start the streaming crawl. `seedStream` must be a streaming DataFrame
    * with columns (url string, score float). `onBatch` observes each
    * micro-batch's CrawlResult (journal/parsed/frontier).
    */
  def start(
      spark: SparkSession,
      seedStream: DataFrame,
      pageFetcher: Fetcher,
      robotsFetcher: Fetcher,
      cfg: CrawlConfig = CrawlConfig(),
      onBatch: CrawlResult => Unit = _ => ()): StreamingQuery = {

    // with a durable store configured the store IS the frontier: every
    // batch's run() merges into it and a restarted query (driver crash,
    // redeploy) resumes from _LATEST with nothing FETCHED refetched
    // (reference contract: …/flinkcrawler/tools/CrawlTool.java:60-64,
    // …/topology/CrawlTopology.java:17-25). The in-memory handoff var is
    // only the fallback for store-less (test/ephemeral) runs — it does
    // not survive a restart, which is exactly what frontierRoot fixes.
    @volatile var frontier: Option[DataFrame] = None
    seedStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // seed lists are tiny relative to the frontier; collecting them on
        // the driver mirrors the reference's parallelism-1 seed source
        val seeds = batch
          .select("url", "score")
          .collect()
          .map(r => (r.getString(0), r.getFloat(1)))
          .toSeq
        val result = CrawlTopology.run(
          spark, seeds, pageFetcher, robotsFetcher, cfg,
          initialFrontier = if (cfg.frontierRoot.isDefined) None else frontier)
        frontier = Some(result.frontier)
        onBatch(result)
      }
      .start()
  }
}
