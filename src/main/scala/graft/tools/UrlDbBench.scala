package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.schema.{CrawlStateUrl, FetchStatus => FS}
import graft.streaming.UrlDbProcessor

/** transformWithState crawl-DB throughput benchmark (PERF_NOTES round-2
  * candidate): how fast does the keyed-state path ingest URL sightings,
  * versus the batch frontier recurrence (FrontierBench)? Drives N sightings
  * across D domains through the processor and polls progress until the
  * input is fully absorbed into RocksDB state.
  */
object UrlDbBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val domains = 2000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[CrawlStateUrl]
    val out = UrlDbProcessor.schedule(
      input.toDS(), checkIntervalMs = 1000, maxPerFiring = 1)
    val query = out.writeStream
      .format("memory").queryName("urldb_bench")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .start()

    val rows = (0 until n).map { i =>
      CrawlStateUrl(s"http://d${i % domains}.com/p${i / domains}",
        s"d${i % domains}.com", FS.UNFETCHED, 1700000000000L + i,
        1.0f + (i % 100), 0L)
    }
    val t0 = System.nanoTime()
    // 4 micro-batches, like a drip of outlink discoveries
    rows.grouped(n / 4).foreach(batch => input.addData(batch))
    val deadline = System.currentTimeMillis() + 180000
    def absorbed: Long =
      query.recentProgress.map(_.numInputRows).sum
    while (absorbed < n && System.currentTimeMillis() < deadline)
      Thread.sleep(200)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[urldb-bench] absorbed $absorbed/$n sightings across " +
      f"$domains domains in $secs%.2f s " +
      f"(${absorbed / secs}%.0f rows/s incl. micro-batch overhead)")
    query.stop()
    spark.stop()
  }
}
