package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.crawl._
import graft.operators.Multimodal

/** Crawl → multimodal bridge e2e: pages fetched by the crawl feed media
  * link extraction, media bytes fetch once per distinct URL, and the
  * binary rows plug into the Multimodal decode pipeline.
  */
class MediaIngestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // two pages referencing the same image (dedup must fetch it once) plus
  // a page-specific video; one broken media link (404, must be dropped)
  private val fetcher: Fetcher = new Fetcher {
    override def fetch(url: String): FetchedPage = url match {
      case u if u.startsWith("http://m.com/img.png") =>
        FetchedPage(200, "", "image/png",
          bytes = Array.tabulate(100)(i => (i % 127).toByte))
      case u if u.startsWith("http://m.com/clip.mp4") =>
        FetchedPage(200, "", "video/mp4",
          bytes = Array.tabulate(33)(i => (i % 7).toByte))
      case u if u.contains("/a") =>
        FetchedPage(200,
          """<html><body><img src="/img.png">
            |<a href="http://m.com/b">next</a></body></html>""".stripMargin,
          "text/html")
      case u if u.contains("/b") =>
        FetchedPage(200,
          """<html><body><img src="/img.png">
            |<video src="/clip.mp4"></video>
            |<img src="/missing.png"></body></html>""".stripMargin,
          "text/html")
      case u if u == "http://m.com/" || u == "http://m.com" =>
        FetchedPage(200,
          """<html><body><a href="http://m.com/a">a</a></body></html>""",
          "text/html")
      case _ => FetchedPage(404, "", "text/plain")
    }
  }

  test("crawl content feeds media extraction, dedup fetch, and decode") {
    var captured: Option[DataFrame] = None
    def capture(df: DataFrame): Unit = {
      val c = df.localCheckpoint(true)
      captured = Some(captured.fold(c)(_.unionByName(c)))
    }
    CrawlTopology.run(
      spark, Seq(("m.com", 1.0f)),
      fetcher, new MapRobotsFetcher(Map.empty),
      CrawlConfig(maxRounds = 5, contentSink = Some(capture)))

    val links = MediaIngest.mediaLinks(captured.get)
    val byPage = links.collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byPage("http://m.com/a") == Set("http://m.com/img.png"))
    assert(byPage("http://m.com/b") ==
      Set("http://m.com/img.png", "http://m.com/clip.mp4",
        "http://m.com/missing.png"))

    val fetched = MediaIngest.fetchMedia(links, fetcher)
    val rows = fetched.collect()
    // img.png referenced twice but fetched once; missing.png dropped
    assert(rows.length == 2, rows.mkString(", "))
    val byUrl = rows.map(r =>
      r.getAs[String]("media_url") ->
        (r.getAs[Array[Byte]]("bytes").length, r.getAs[String]("contentType")))
      .toMap
    assert(byUrl("http://m.com/img.png") == ((100, "image/png")))
    assert(byUrl("http://m.com/clip.mp4") == ((33, "video/mp4")))

    // binary rows plug straight into the multimodal decode pipeline
    val decoded = Multimodal.decodeMeta(
      fetched, "media_id", "bytes", new Multimodal.StubDecoder)
      .collect().map(d => d.nBytes -> d.format).toMap
    assert(decoded(100L) == "png" || decoded(100L) == "jpeg")
    assert(decoded.keySet == Set(100L, 33L))
  }
}
