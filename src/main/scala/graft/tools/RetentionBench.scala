package graft.tools

import org.apache.spark.sql.SparkSession

import graft.schema.{CrawlStateUrl, FetchStatus => FS}
import graft.streaming.{LiveCrawl, UrlDbProcessor}

/** Long-run flatness probe for the file feedback channel's retention
  * (LiveCrawl.FeedbackChannel.file with cleanSource=delete): N appended
  * waves through a consuming stream, recording per-wave consume latency
  * and the live file count. The property under test is the CrawlBench
  * flatness property, now for the channel: neither latency nor directory
  * size may trend with crawl age. Prints one JSON line.
  */
object RetentionBench {
  def main(args: Array[String]): Unit = {
    val waves = args.headOption.map(_.toInt).getOrElse(200)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("graft-retbench").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-retbench-ck").toString
    def liveFiles(): Int =
      Option(new java.io.File(dir).listFiles()).map(
        _.count(f => f.isFile && f.getName.endsWith(".parquet"))).getOrElse(0)

    val (input, channel) = LiveCrawl.FeedbackChannel.file(spark, dir)
    val consumed = new java.util.concurrent.atomic.AtomicLong(0)
    val query = input.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[UrlDbProcessor.Envelope],
          _: Long) => consumed.addAndGet(b.count()); () }
      .start()
    val latencies = new Array[Double](waves)
    val files = new Array[Int](waves)
    (0 until waves).foreach { i =>
      val t0 = System.nanoTime()
      channel.push(Seq(UrlDbProcessor.stateInput(CrawlStateUrl(
        s"http://ret.com/$i", "ret.com", FS.UNFETCHED, 1L, 1.0f, 0L))))
      query.processAllAvailable()
      latencies(i) = (System.nanoTime() - t0) / 1e9
      files(i) = liveFiles()
    }
    query.stop()
    def mean(xs: Seq[Double]) = xs.sum / xs.size
    val h1 = mean(latencies.take(waves / 2).toSeq)
    val h2 = mean(latencies.drop(waves / 2).toSeq)
    println(s"""{"bench":"feedback_retention","waves":$waves,""" +
      s""""consumed":${consumed.get()},""" +
      s""""latency_first_half_mean_s":$h1,"latency_second_half_mean_s":$h2,""" +
      s""""latency_ratio":${h2 / h1},""" +
      s""""max_live_files":${files.max},"final_live_files":${files.last}}""")
    spark.stop()
  }
}
