package graft.crawl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.UrlFunctions

/** Crawl → multimodal bridge: extract media references (img/source/video/
  * audio/embed/iframe `src`) from fetched pages and fetch them as opaque
  * binary rows ready for the [[graft.operators.Multimodal]] pipeline
  * (decodeMeta / sampleFrames / extractFeatures). The reference's link
  * extractor accepts configurable tag/attr sets beyond anchors
  * (…/flinkcrawler/parser/BaseLinkExtractor.java:21-51); this is that
  * feed turned into a training-data ingest path.
  *
  * Scale shape: link extraction is a projection over the content frame
  * (one UDF pass, no shuffle), the media fetch is `mapPartitions` over
  * DISTINCT media URLs (one shuffle for the dedup — the same media asset
  * referenced by thousands of pages is fetched once), and the output
  * carries `media_id = urlHash64(url)` so it plugs straight into
  * `Multimodal.decodeMeta(df, "media_id", "bytes", decoder)`.
  */
object MediaIngest {

  /** (page_url, media_url) rows from a crawl content frame — the frame
    * `CrawlConfig.contentSink` receives: url, contentType, headers,
    * content (binary). HTML decodes with the same header-first charset
    * resolution the parse stage uses, so the two paths can't drift.
    */
  def mediaLinks(content: DataFrame): DataFrame = {
    val extract = udf {
      (url: String, bytes: Array[Byte], headers: Map[String, Seq[String]],
       ct: String) =>
        val html = new String(bytes, UrlFunctions.charsetFromHeaders(headers, ct))
        HtmlParser.mediaLinks(url, html)
    }
    // headers outrank the contentType field, columnar form (same scalars
    // as q39): case-normalized map lookup, first value, fall back to field
    val effectiveCt = coalesce(
      element_at(element_at(
        transform_keys(col("headers"), (k, _) => lower(k)), "content-type"), 1),
      col("contentType"))
    content
      .filter(effectiveCt.contains("html"))
      .select(col("url").as("page_url"),
        explode(extract(col("url"), col("content"), col("headers"),
          col("contentType"))).as("media_url"))
  }

  /** Fetch each DISTINCT media URL as raw bytes through the pluggable
    * fetcher. Non-2xx fetches are dropped (media is best-effort — a
    * broken image must not fail the ingest). Output: media_id (stable
    * urlHash64), media_url, bytes, contentType.
    */
  def fetchMedia(
      media: DataFrame, fetcher: Fetcher, threads: Int = 10): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val f = fetcher
    media.select(col("media_url")).distinct()
      // slot-count partitions EXPLICITLY: the media fetch is latency-
      // bound, and AQE coalesces a small distinct()'s shuffle to one
      // task — capping concurrency at one task's pool (the crawl seams
      // pin theirs the same way, see CrawlTopology.seamParts)
      .repartition(
        spark.sparkContext.defaultParallelism, col("media_url"))
      .as[String]
      .mapPartitions { it =>
        // pooled unordered drain (graft.util.Pooled). Unlike the
        // small-payload seams this one buffers MEDIA BODIES (MB-scale),
        // so the backpressure window is pinned to the pool width — at
        // most `threads` bodies in flight+queued per task, not the
        // 4×threads item-count default
        graft.util.Pooled.unordered(
            it, threads, maxOutstanding = threads, name = "media") { url =>
          val page = Fetcher.safeFetch(f, url)
          if (page.statusCode < 200 || page.statusCode > 299) None
          else {
            val bytes =
              if (page.bytes != null) page.bytes
              else page.content.getBytes(
                UrlFunctions.charsetFromHeaders(page.headers, page.contentType))
            Some((UrlFunctions.urlHash64(url), url, bytes, page.contentType))
          }
        }.flatten
      }
      .toDF("media_id", "media_url", "bytes", "contentType")
  }
}
