package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Price the CDX-pruned archive lookup (graft.sources.CdxLookup) against
  * the full-archive scan it replaces: a many-segment WARC archive, a
  * sharded CDX sidecar, and a 3-URL point lookup — the reference's
  * CommonCrawlFetcher access pattern (secondary-index search, then fetch
  * one record; …/fetcher/commoncrawl/CommonCrawlFetcher.java:50).
  */
object CdxBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val pages = docs.select(
      concat(lit("http://d"), col("doc_id") % 97, lit(".example.com/doc/"),
        col("doc_id")).as("url"),
      lit("text/html").as("contentType"),
      col("text").as("content"),
      (lit(1700000000000L) + col("doc_id")).as("fetchTimeMs"))
      .localCheckpoint(true)
    val n = pages.count()
    val dir = java.nio.file.Files.createTempDirectory("graft-cdxbench").toString
    graft.sinks.Sinks.writeWarc(pages, s"$dir/warc",
      maxRecordsPerFile = math.max(1L, n / 64))
    graft.sinks.Sinks.writeCdx(spark, s"$dir/warc", s"$dir/cdx", shards = 16)

    val want = Seq(3L, 250L, 444L)
      .map(i => s"http://d${i % 97}.example.com/doc/$i")
    def sec[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // warmup both paths
    graft.sources.CdxLookup.fetch(spark, s"$dir/warc", s"$dir/cdx", want)
      ._1.count()
    graft.sources.WarcSource.read(spark, s"$dir/warc")
      .filter(col("url").isin(want: _*)).count()

    val ((rows, stats), tPruned) = sec {
      val (df, s) = graft.sources.CdxLookup.fetch(
        spark, s"$dir/warc", s"$dir/cdx", want)
      (df.count(), s)
    }
    val (fullRows, tFull) = sec {
      graft.sources.WarcSource.read(spark, s"$dir/warc")
        .filter(col("url").isin(want: _*)).count()
    }
    require(rows == fullRows, s"pruned $rows != full $fullRows")
    println(
      s"""{"archived":$n,"lookup_urls":${want.size},"hits":$rows,""" +
      s""""cdx_shards_total":${stats.cdxShardsTotal},""" +
      s""""cdx_shards_read":${stats.cdxShardsRead},""" +
      s""""warc_files_total":${stats.warcFilesTotal},""" +
      s""""warc_files_read":${stats.warcFilesRead},""" +
      s""""pruned_sec":$tPruned,"full_scan_sec":$tFull}""")
    spark.stop()
  }
}
