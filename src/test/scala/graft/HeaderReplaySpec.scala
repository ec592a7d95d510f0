package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.crawl._
import graft.functions.UrlFunctions
import graft.schema.{FetchStatus => FS}

/** Response headers through the fetch stage (reference FetchResultUrl
  * .java:6-109) and the WARC archive-and-replay loop (reference
  * CommonCrawlFetcher.java:50-135).
  */
class HeaderCharsetSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val latinText = "café crème following résumé"

  /** A page whose BYTES are ISO-8859-1 and whose charset is declared only
    * by the Content-Type response HEADER (lowercase name: header lookup
    * must be case-insensitive); the contentType field says nothing.
    */
  private val headerCharsetFetcher: Fetcher = {
    // local copy: the anonymous Fetcher must not capture the (non-
    // serializable) spec instance through a field reference
    val text = latinText
    new Fetcher {
      override def fetch(url: String): FetchedPage =
        if (url.startsWith("http://latin.com")) {
          val html =
            s"<html><head><title>Latin</title></head><body>$text</body></html>"
          FetchedPage(200, "", "text/html",
            bytes = html.getBytes(java.nio.charset.Charset.forName("ISO-8859-1")),
            headers = Map(
              "content-type" -> Seq("text/html; charset=ISO-8859-1"),
              "X-Request-ID" -> Seq("req-1")))
        } else FetchedPage(404, "", "text/plain")
    }
  }

  test("fetch→parse round-trip decodes with the header-declared charset") {
    val r = CrawlTopology.run(
      spark, Seq(("latin.com", 1.0f)),
      headerCharsetFetcher, new MapRobotsFetcher(Map.empty),
      CrawlConfig(maxRounds = 3))
    val rows = r.parsed.select("text").collect()
    assert(rows.length == 1)
    // decoding 0xE9 as the contentType-field fallback (UTF-8) would
    // produce replacement chars — the header charset must win
    assert(rows(0).getString(0).contains("café crème"),
      s"text was '${rows(0).getString(0)}'")
  }

  test("q39 header scalars work over REAL fetched headers") {
    // capture the content tap: the same frame a WARC/content sink gets
    var captured: Option[DataFrame] = None
    def capture(df: DataFrame): Unit = {
      val c = df.localCheckpoint(true)
      captured = Some(captured.fold(c)(_.unionByName(c)))
    }
    CrawlTopology.run(
      spark, Seq(("latin.com", 1.0f)),
      headerCharsetFetcher, new MapRobotsFetcher(Map.empty),
      CrawlConfig(maxRounds = 3, contentSink = Some(capture)))
    val content = captured.get
    // q39's scalar pipeline (case-normalized map lookup + charset
    // extraction), applied to headers that came through the fetch stage
    val ct = element_at(
      element_at(transform_keys(col("headers"), (k, _) => lower(k)),
        "content-type"), 1)
    val row = content.select(
      col("url"),
      lower(coalesce(
        when(regexp_extract(ct, "charset=([^;]+)", 1) === "", null)
          .otherwise(regexp_extract(ct, "charset=([^;]+)", 1)),
        lit("utf-8"))).as("charset"),
      element_at(element_at(transform_keys(col("headers"), (k, _) => lower(k)),
        "x-request-id"), 1).as("req")).collect()
    assert(row.length == 1)
    assert(row(0).getString(1) == "iso-8859-1")
    assert(row(0).getString(2) == "req-1")
    // and the SQL-side resolution agrees with the Scala-side one the
    // parse stage uses
    val scalaSide = UrlFunctions.charsetFromHeaders(
      Map("content-type" -> Seq("text/html; charset=ISO-8859-1")),
      "text/html").name().toLowerCase(java.util.Locale.ROOT)
    assert(scalaSide == row(0).getString(1))
  }

  test("header charset outranks a conflicting contentType-field charset") {
    val cs = UrlFunctions.charsetFromHeaders(
      Map("Content-Type" -> Seq("text/html; charset=ISO-8859-1")),
      "text/html; charset=UTF-8")
    assert(cs.name() == "ISO-8859-1")
    // header present but without a charset → field's charset still applies
    val cs2 = UrlFunctions.charsetFromHeaders(
      Map("Content-Type" -> Seq("text/html")),
      "text/html; charset=ISO-8859-1")
    assert(cs2.name() == "ISO-8859-1")
  }
}

class WarcReplaySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("crawl B replayed from crawl A's WARC yields identical frontier facts") {
    val graph = WebGraph(
      "replay.com" -> Seq("replay.com/a", "replay.com/b"),
      "replay.com/a" -> Seq("replay.com/c", "replay.com/missing"),
      "replay.com/b" -> Seq("replay.com/c"),
      "replay.com/c" -> Seq.empty)
    val dir = java.nio.file.Files.createTempDirectory("warc_replay").toString

    // crawl A: live (mocked) fetch, archiving every fetched page as WARC
    val a = CrawlTopology.run(
      spark, Seq(("replay.com", 1.0f)),
      new WebGraphFetcher(graph), new MapRobotsFetcher(Map.empty),
      CrawlConfig(maxRounds = 8,
        contentSink = Some(df =>
          graft.sinks.Sinks.writeWarcContent(df, s"$dir/warc"))))

    // crawl B: same seeds, fetch stage = equi-join against A's archive
    val archive = ArchiveFetch.fromWarc(spark, s"$dir/warc")
    val b = CrawlTopology.run(
      spark, Seq(("replay.com", 1.0f)),
      new WebGraphFetcher(WebGraph()), // never consulted
      new MapRobotsFetcher(Map.empty),
      CrawlConfig(maxRounds = 8),
      fetchStage = Some(ArchiveFetch.stage(archive)))

    def facts(r: CrawlResult): Map[String, (String, Float)] =
      r.frontier.select("url", "status", "score").collect()
        .map(row => row.getString(0) -> (row.getString(1), row.getFloat(2)))
        .toMap
    val fa = facts(a)
    val fb = facts(b)
    assert(fa.keySet == fb.keySet, s"url sets differ: ${fa.keySet} vs ${fb.keySet}")
    fa.foreach { case (url, (st, score)) =>
      assert(fb(url)._1 == st, s"$url status ${fb(url)._1} != $st")
      assert(math.abs(fb(url)._2 - score) < 1e-6f, s"$url score differs")
    }
    // the archive replay really fetched pages (not all-404s)
    assert(fa.values.count(_._1 == FS.FETCHED) == 4)
    // parsed content identical
    def parsedMap(r: CrawlResult) =
      r.parsed.select("url", "title", "text").collect()
        .map(row => row.getString(0) -> (row.getString(1), row.getString(2)))
        .toMap
    assert(parsedMap(a) == parsedMap(b))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("redirects and errors replay with their real archived status codes") {
    // a graph with a 301 hop and a 404: the archive must carry both
    // outcomes (not flatten them to 200/404) so crawl B's frontier —
    // including the redirect TARGET discovered through the archived
    // redirectedTo — matches crawl A's exactly
    val graph = WebGraph(
      "rr.com" -> Seq("rr.com/old", "rr.com/missing"),
      "rr.com/new" -> Seq("rr.com/deep"),
      "rr.com/deep" -> Seq.empty)
    val redirects = Map("http://rr.com/old" -> "http://rr.com/new")
    val dir = java.nio.file.Files.createTempDirectory("warc_redir").toString

    val a = CrawlTopology.run(
      spark, Seq(("rr.com", 1.0f)),
      new WebGraphFetcher(graph, redirects), new MapRobotsFetcher(Map.empty),
      CrawlConfig(maxRounds = 8,
        contentSink = Some(df =>
          graft.sinks.Sinks.writeWarcContent(df, s"$dir/warc"))))
    val archive = ArchiveFetch.fromWarc(spark, s"$dir/warc")
    val b = CrawlTopology.run(
      spark, Seq(("rr.com", 1.0f)),
      new WebGraphFetcher(WebGraph()), // never consulted
      new MapRobotsFetcher(Map.empty),
      CrawlConfig(maxRounds = 8),
      fetchStage = Some(ArchiveFetch.stage(archive)))

    def facts(r: CrawlResult): Map[String, String] =
      r.frontier.select("url", "status").collect()
        .map(row => row.getString(0) -> row.getString(1)).toMap
    val fa = facts(a)
    val fb = facts(b)
    assert(fa == fb, s"replayed frontier differs:\n a=$fa\n b=$fb")
    assert(fb("http://rr.com/old") == FS.HTTP_MOVED,
      "archived redirect must replay as HTTP_MOVED, not HTTP_NOTFOUND")
    assert(fb("http://rr.com/new") == FS.FETCHED,
      "redirect target must be discovered through the archived redirectedTo")
    assert(fb("http://rr.com/deep") == FS.FETCHED)
    assert(fb("http://rr.com/missing") == FS.HTTP_NOTFOUND)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("fromWarc picks the newest record by millisecond fetch time within one second") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("warc_ms").toString
    // two records for one URL inside the same WARC-Date second, where the
    // NEWER fetch has the lexicographically LARGER body — the legacy
    // (warcDate desc, content asc) ordering would replay the stale body,
    // only the millisecond stamp discriminates
    val base = 1700000000000L
    Seq(
      ("http://ms.com/p", "text/html", "aaa old body", base + 100),
      ("http://ms.com/p", "text/html", "zzz new body", base + 900)
    ).toDF("url", "contentType", "content", "fetchTimeMs")
      .coalesce(1)
      .createOrReplaceTempView("ms_rows")
    graft.sinks.Sinks.writeWarc(spark.table("ms_rows"), dir)
    val picked = ArchiveFetch.fromWarc(spark, dir)
      .select("content").as[String].collect()
    assert(picked.toSeq == Seq("zzz new body"),
      s"must keep the higher fetchTimeMs record: ${picked.toSeq}")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
