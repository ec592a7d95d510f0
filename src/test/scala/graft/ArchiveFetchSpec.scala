package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.crawl._

/** The archive (snapshot-join) fetch path must produce the same frontier
  * as the live mapPartitions fetch path on the same web graph — the
  * CommonCrawl-mode parity the reference gets from swapping fetchers
  * (CrawlToolOptions -commoncrawl).
  */
class ArchiveFetchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val graph = WebGraph(
    "a.com" -> Seq("a.com/p1", "a.com/p2", "b.com"),
    "a.com/p1" -> Seq("a.com/p2"),
    "a.com/p2" -> Seq.empty,
    "b.com" -> Seq("b.com/missing-target"))

  test("archive join fetch produces the same frontier as live fetch") {
    val live = CrawlTopology.run(
      spark, Seq(("a.com", 1.0f)),
      new WebGraphFetcher(graph), new MapRobotsFetcher(Map.empty),
      CrawlConfig(maxRounds = 15))
    val archive = ArchiveFetch.archiveFromGraph(spark, graph)
    val arch = CrawlTopology.run(
      spark, Seq(("a.com", 1.0f)),
      new WebGraphFetcher(graph), new MapRobotsFetcher(Map.empty),
      CrawlConfig(maxRounds = 15),
      fetchStage = Some(ArchiveFetch.stage(archive)))
    def snap(r: CrawlResult) = r.frontier
      .select("url", "status").collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    assert(snap(arch) == snap(live))
    assert(snap(arch).contains(("http://a.com/p2", "FETCHED")))
    assert(snap(arch).contains(("http://b.com/missing-target", "HTTP_NOTFOUND")))
  }

  test("warc written from an archive re-ingests into an equivalent crawl") {
    import org.apache.spark.sql.functions.lit
    // archive -> WARC files -> WarcSource -> archive' -> crawl parity on
    // every fetched page: proves crawl output is re-ingestable end-to-end
    val archive = ArchiveFetch.archiveFromGraph(spark, graph)
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-cycle").toString
    graft.sinks.Sinks.writeWarc(
      archive.filter(col("statusCode") === 200)
        .select(col("url"), col("contentType"), col("content"),
          lit(1700000000000L).as("fetchTimeMs")),
      dir)
    val reingested = graft.sources.WarcSource.read(spark, dir)
      .select(col("url"), lit(200).as("statusCode"), col("content"),
        col("contentType"), lit(null).cast("string").as("redirectedTo"))
    val live = CrawlTopology.run(
      spark, Seq(("a.com", 1.0f)),
      new WebGraphFetcher(graph), new MapRobotsFetcher(Map.empty),
      CrawlConfig(maxRounds = 15))
    val cycled = CrawlTopology.run(
      spark, Seq(("a.com", 1.0f)),
      new WebGraphFetcher(graph), new MapRobotsFetcher(Map.empty),
      CrawlConfig(maxRounds = 15),
      fetchStage = Some(ArchiveFetch.stage(reingested)))
    def fetchedSet(r: CrawlResult) = r.frontier
      .filter(col("status") === "FETCHED")
      .select("url").collect().map(_.getString(0)).toSet
    assert(fetchedSet(cycled) == fetchedSet(live))
    // parse results survive the cycle too (content is byte-identical)
    def parsedTitles(r: CrawlResult) = r.parsed
      .select("url", "title").collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    assert(parsedTitles(cycled) == parsedTitles(live))
  }

  test("trickle crawl rounds route through the CDX-pruned fetch; big rounds batch-join") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    // the reference's CommonCrawlFetcher never scans the archive — it
    // binary-searches the secondary index per URL. Our batch default is
    // right for big rounds; this pins the trickle route: few fetches →
    // CdxLookup path → few WARC segments opened → identical frontier.
    val archive = ArchiveFetch.archiveFromGraph(spark, graph)
    val filler = (0 until 200).map(i =>
      (s"http://bulk$i.example/p", "text/html", s"filler body $i"))
      .toDF("url", "contentType", "content")
    val dir = java.nio.file.Files.createTempDirectory("graft-cdxroute").toString
    graft.sinks.Sinks.writeWarc(
      archive.filter(col("statusCode") === 200)
        .select(col("url"), col("contentType"), col("content"))
        .unionByName(filler)
        .withColumn("fetchTimeMs", lit(1700000000000L)),
      s"$dir/warc", maxRecordsPerFile = 10)
    graft.sinks.Sinks.writeCdx(spark, s"$dir/warc", s"$dir/cdx", shards = 8)

    def crawl(stage: org.apache.spark.sql.Dataset[RobotsVerdict] =>
        org.apache.spark.sql.Dataset[FetchOutcome]) =
      CrawlTopology.run(
        spark, Seq(("a.com", 1.0f)),
        new WebGraphFetcher(graph), new MapRobotsFetcher(Map.empty),
        CrawlConfig(maxRounds = 15), fetchStage = Some(stage))
    def fetchedSet(r: CrawlResult) = r.frontier
      .filter(col("status") === "FETCHED")
      .select("url").collect().map(_.getString(0)).toSet

    val batch = crawl(ArchiveFetch.stage(
      ArchiveFetch.fromWarc(spark, s"$dir/warc")))

    val routes = scala.collection.mutable.ArrayBuffer
      .empty[ArchiveFetch.FetchRoute]
    val pruned = crawl(ArchiveFetch.cdxRoutedStage(
      spark, s"$dir/warc", s"$dir/cdx", maxLookup = 16, Some(routes)))
    assert(fetchedSet(pruned) == fetchedSet(batch))
    assert(fetchedSet(pruned).contains("http://a.com/p2"))
    // every round was small enough to prune, and pruning was real:
    // far fewer WARC segments opened than exist
    assert(routes.nonEmpty && routes.forall(_.pruned), routes.toString)
    val st = routes.flatMap(_.stats)
    assert(st.forall(s => s.warcFilesTotal >= 20), st.toString)
    assert(st.forall(s => s.warcFilesRead <= 3), st.toString)

    // forcing the threshold to 0 re-routes every round to the batch join
    // with an identical frontier
    val routes0 = scala.collection.mutable.ArrayBuffer
      .empty[ArchiveFetch.FetchRoute]
    val big = crawl(ArchiveFetch.cdxRoutedStage(
      spark, s"$dir/warc", s"$dir/cdx", maxLookup = 0, Some(routes0)))
    assert(fetchedSet(big) == fetchedSet(batch))
    assert(routes0.nonEmpty && routes0.forall(!_.pruned), routes0.toString)
  }

  test("cdx index: one sorted line per archived record, fields faithful") {
    import org.apache.spark.sql.functions.lit
    val archive = ArchiveFetch.archiveFromGraph(spark, graph)
      .filter(col("statusCode") === 200)
    val dir = java.nio.file.Files.createTempDirectory("graft-cdx").toString
    graft.sinks.Sinks.writeWarc(
      archive.select(col("url"), col("contentType"), col("content"),
        lit(1700000000000L).as("fetchTimeMs")),
      s"$dir/warc")
    graft.sinks.Sinks.writeCdx(spark, s"$dir/warc", s"$dir/cdx", shards = 2)
    // read shard files in name order: lines must be globally sorted
    val files = new java.io.File(s"$dir/cdx").listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    val lines = files.flatMap(f =>
      scala.io.Source.fromFile(f).getLines().toSeq)
    assert(lines.length == archive.count())
    val keys = lines.map(_.split(" ").take(2).mkString(" "))
    assert(keys.toSeq == keys.sorted.toSeq, "cdx not globally sorted")
    // a concrete record round-trips: url, status, ts, digest present
    val p2 = lines.find(_.contains("http://a.com/p2")).get.split(" ")
    assert(p2(0).startsWith("com,a)/"), p2(0)) // surt key
    assert(p2(1) == "20231114221320") // 1700000000000 ms UTC
    assert(p2(4) == "200")
    assert(p2(5).matches("[0-9a-f]{32}")) // md5 digest
    assert(p2(6).toLong > 0)
  }

  test("cdx-pruned lookup reads only the shards and segments the keys live in") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val pages = (0 until 200).map(i =>
      (s"http://site$i.com/p", "text/html", s"body $i", 1700000000000L + i))
    val dir = java.nio.file.Files.createTempDirectory("graft-cdxlkp").toString
    graft.sinks.Sinks.writeWarc(
      pages.toDF("url", "contentType", "content", "fetchTimeMs"),
      s"$dir/warc", maxRecordsPerFile = 10)
    graft.sinks.Sinks.writeCdx(spark, s"$dir/warc", s"$dir/cdx", shards = 8)

    val want = Seq("http://site7.com/p", "http://site123.com/p")
    val (got, stats) = graft.sources.CdxLookup.fetch(
      spark, s"$dir/warc", s"$dir/cdx", want)
    val m = got.select("url", "content").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m.keySet == want.toSet, m.toString)
    assert(m("http://site7.com/p") == "body 7")
    assert(m("http://site123.com/p") == "body 123")
    // the point lookup touched a small fraction of both file sets
    assert(stats.cdxShardsTotal == 8, stats.toString)
    assert(stats.cdxShardsRead <= 3, stats.toString)
    assert(stats.warcFilesTotal >= 15, stats.toString)
    assert(stats.warcFilesRead <= 2, stats.toString)
    // a miss opens no archive file at all
    val (_, ms) = graft.sources.CdxLookup.fetch(
      spark, s"$dir/warc", s"$dir/cdx", Seq("http://nosuch.example/x"))
    assert(ms.warcFilesRead == 0, ms.toString)
    // pruned result == unpruned full-archive filter (no capture lost at
    // a shard boundary)
    val full = graft.sources.WarcSource.read(spark, s"$dir/warc")
      .filter(col("url").isin(want: _*))
      .select("url", "content").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(full == m)
    // a LARGE lookup set takes the broadcast-semi-join path (no
    // thousand-literal isin tree) and still returns every capture
    val many = (0 until 150).map(i => s"http://site$i.com/p")
    val (gotMany, manyStats) = graft.sources.CdxLookup.fetch(
      spark, s"$dir/warc", s"$dir/cdx", many)
    assert(gotMany.count() == 150, manyStats.toString)
  }

  test("cdx round-trips a mime with whitespace without shifting later fields") {
    import spark.implicits._
    // real fetch headers routinely carry 'text/html; charset=utf-8'; a
    // space-joined CDX line re-parsed positionally would shift
    // status/digest/n_octets/warc_file and fetch() would read bogus paths
    val pages = Seq(
      ("http://mimey.com/p", "text/html; charset=utf-8", "charset body", 1700000000000L),
      ("http://plain.com/p", "text/html", "plain body", 1700000001000L))
    val dir = java.nio.file.Files.createTempDirectory("graft-cdxmime").toString
    graft.sinks.Sinks.writeWarc(
      pages.toDF("url", "contentType", "content", "fetchTimeMs"), s"$dir/warc")
    graft.sinks.Sinks.writeCdx(spark, s"$dir/warc", s"$dir/cdx")
    val (entries, _) = graft.sources.CdxLookup.entries(
      spark, s"$dir/cdx", Seq("http://mimey.com/p"))
    val e = entries.collect()
    assert(e.length == 1)
    val r = e.head
    assert(r.getAs[String]("mime") == "text/html;charset=utf-8", r.toString)
    assert(r.getAs[Long]("status") == 200L, r.toString)
    assert(r.getAs[String]("digest").matches("[0-9a-f]{32}"), r.toString)
    assert(r.getAs[Long]("n_octets") == "charset body".length.toLong, r.toString)
    assert(r.getAs[String]("warc_file").startsWith("part-"), r.toString)
    // the pruned fetch resolves the real segment and returns the body
    val (got, stats) = graft.sources.CdxLookup.fetch(
      spark, s"$dir/warc", s"$dir/cdx", Seq("http://mimey.com/p"))
    val m = got.select("url", "content").collect()
      .map(x => x.getString(0) -> x.getString(1)).toMap
    assert(m == Map("http://mimey.com/p" -> "charset body"), stats.toString)
  }

  test("cdx parse drops short lines instead of mis-assigning fields") {
    // foreign/truncated CDX: a line with < 8 fields would feed negative
    // element_at indexes and silently shift status/digest/warc_file into
    // the wrong columns — the parse must route such lines OUT, and an
    // empty mime token (doubled separator) must surface as the classic
    // '-' unknown marker, not an empty string
    val url = "http://shortline.com/p"
    val surt = graft.functions.UrlFunctions.surtKey(url)
    val digest = "0123456789abcdef0123456789abcdef"
    val dir = java.nio.file.Files.createTempDirectory("graft-cdxshort")
    val lines = Seq(
      s"$surt 20240101000000 $url text/html; charset=utf-8 200 $digest 42 part-00000-a.warc.gz",
      s"$surt 20240101000001 $url", // truncated write: 3 fields
      s"$surt 20240101000002 $url 200 $digest 42 part-00000-b.warc.gz", // mime absent: 7 fields
      s"$surt 20240101000003 $url  200 $digest 42 part-00000-c.warc.gz" // doubled space: empty mime token
    )
    java.nio.file.Files.write(dir.resolve("part-00000"),
      lines.mkString("\n").getBytes("UTF-8"))
    val (entries, _) = graft.sources.CdxLookup.entries(
      spark, dir.toString, Seq(url))
    val rows = entries.orderBy("ts").collect()
    assert(rows.length == 2, rows.mkString("\n"))
    assert(rows(0).getAs[String]("mime") == "text/html; charset=utf-8")
    assert(rows(0).getAs[Long]("status") == 200L)
    assert(rows(0).getAs[String]("warc_file") == "part-00000-a.warc.gz")
    assert(rows(1).getAs[String]("mime") == "-", rows(1).toString)
    assert(rows(1).getAs[String]("warc_file") == "part-00000-c.warc.gz")
  }

  test("cdx timestamps are UTC under ANY session timezone") {
    import org.apache.spark.sql.functions.lit
    // CDX defines the 14-digit timestamp as UTC; a non-UTC session must
    // not shift it (interop + the global (surt, ts) sort contract)
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val ts = graft.sinks.Sinks.cdxIndex(
        spark.range(1).select(
          lit("http://a.com/p").as("url"),
          lit("text/html").as("contentType"),
          lit(200).as("statusCode"),
          lit("x".getBytes("UTF-8")).as("content"),
          lit(1700000000000L).as("fetchTimeMs")))
        .select("ts").head().getString(0)
      assert(ts == "20231114221320", s"session-tz-shifted: $ts")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("crawl resumes from a store-persisted frontier without refetching") {
    // the Fetcher is captured in serialized task closures, so a captured
    // var would record into per-task COPIES; a JVM-global object is
    // shared across local-mode tasks and actually observes the fetches
    FetchLog.urls.clear()
    val counting = new Fetcher {
      val base = new WebGraphFetcher(graph)
      override def fetch(url: String): FetchedPage = {
        FetchLog.urls.add(url)
        base.fetch(url)
      }
    }
    val first = CrawlTopology.run(
      spark, Seq(("a.com", 1.0f)),
      counting, new MapRobotsFetcher(Map.empty),
      CrawlConfig(maxRounds = 15))
    assert(!FetchLog.urls.isEmpty, "sanity: the log must see live fetches")
    val root = java.nio.file.Files
      .createTempDirectory("graft-frontier-resume").toString
    FrontierStore.mergeInto(spark, root,
      first.frontier.select(
        "url", "pld", "status", "statusTime", "score", "nextFetchTime"))
    val persisted = FrontierStore.read(spark, root).get
    FetchLog.urls.clear()
    val resumed = CrawlTopology.run(
      spark, Seq(("a.com", 1.0f)),
      counting, new MapRobotsFetcher(Map.empty),
      CrawlConfig(maxRounds = 15),
      initialFrontier = Some(persisted))
    // everything was already FETCHED/terminal: no page fetch happens again
    import scala.jdk.CollectionConverters._
    val pageFetches = FetchLog.urls.asScala.toSeq
      .filterNot(_.endsWith("/robots.txt"))
    assert(pageFetches.isEmpty, s"refetched: $pageFetches")
    assert(resumed.frontier.count() == first.frontier.count())
  }

  test("httpStatusToFetchStatusCol matches the scalar mapping") {
    import spark.implicits._
    val codes = Seq(200, 204, 301, 302, 308, 401, 403, 404, 410, 429,
      // generic redirection/client-error buckets (300/304/400/451) —
      // terminal HTTP outcomes, never ERROR_IOEXCEPTION
      300, 304, 400, 451, 500, 503, 100)
    val got = codes.toDF("code")
      .select(ArchiveFetch.httpStatusToFetchStatusCol(col("code")).as("s"))
      .collect().map(_.getString(0))
    val want = codes.map(graft.schema.FetchStatus.fromHttpStatus)
    assert(got.toSeq == want)
    import graft.schema.{FetchStatus => F}
    assert(F.fromHttpStatus(400) == F.HTTP_CLIENT_ERROR &&
      F.fromHttpStatus(304) == F.HTTP_REDIRECTED)
    // WARC replay round trip holds for the new bucket too
    assert(F.fromHttpStatus(F.toHttpStatus(F.HTTP_CLIENT_ERROR)) ==
      F.HTTP_CLIENT_ERROR)
  }
}

/** JVM-global fetch journal for closure-serialized fetchers (local-mode
  * tasks share the JVM, so object state is visible where captured vars
  * are not).
  */
object FetchLog {
  val urls = new java.util.concurrent.ConcurrentLinkedQueue[String]()
}

class UrlLengthenerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("shortener URLs resolve one hop; others pass through; memo caches") {
    import spark.implicits._
    var fetches = 0
    val fetcher = new Fetcher {
      override def fetch(url: String): FetchedPage = {
        fetches += 1
        FetchedPage(301, "", "text/plain",
          redirectedTo = Some("http://real.example.com/article"))
      }
    }
    val l = new UrlLengthener(fetcher)
    val memo = new java.util.LinkedHashMap[String, String]()
    assert(l.lengthen("http://bit.ly/abc", memo) == "http://real.example.com/article")
    assert(l.lengthen("http://bit.ly/abc", memo) == "http://real.example.com/article")
    assert(fetches == 1, "memo cache did not prevent a refetch")
    assert(l.lengthen("http://example.com/x", memo) == "http://example.com/x")
    assert(fetches == 1)
  }

  test("memo LRU evicts beyond its cap (cap+1 entries -> size == cap)") {
    val memo = UrlLengthener.newMemo(3)
    (1 to 4).foreach(i => memo.put(s"k$i", s"v$i"))
    assert(memo.size() == 3, s"expected eviction at cap 3, size=${memo.size()}")
    assert(!memo.containsKey("k1"), "eldest entry should have been evicted")
    assert(memo.containsKey("k4"))
    // access order: touching k2 makes k3 the eldest
    memo.get("k2")
    memo.put("k5", "v5")
    assert(!memo.containsKey("k3") && memo.containsKey("k2"))
  }

  test("lengthener wired into the crawl resolves shortened outlinks") {
    val graph = WebGraph(
      "d.com" -> Seq("bit.ly/abc"),
      "d.com/target" -> Seq.empty)
    val redirecting = new Fetcher {
      override def fetch(url: String): FetchedPage =
        if (url.startsWith("http://bit.ly"))
          FetchedPage(301, "", "text/plain", Some("http://d.com/target"))
        else new WebGraphFetcher(graph).fetch(url)
    }
    val r = CrawlTopology.run(
      spark, Seq(("d.com", 1.0f)),
      redirecting, new MapRobotsFetcher(Map.empty),
      CrawlConfig(maxRounds = 6),
      lengthener = Some(new UrlLengthener(redirecting)))
    val statuses = r.frontier.select("url", "status").collect()
      .map(x => (x.getString(0), x.getString(1))).toMap
    assert(statuses.get("http://d.com/target").contains("FETCHED"))
    assert(!statuses.contains("http://bit.ly/abc"),
      "shortened form leaked into the frontier")
    assert(r.metrics.getOrElse("fetch.FETCHED", 0L) == 2L)
  }
}

class RobotsCacheSpec extends AnyFunSuite {

  test("TTL semantics: OK 12h, 404 24h, 5xx 1h; expiry refetches") {
    RobotsCache.clear()
    var fetches = 0
    def fetcher(status: Int, body: String) = new Fetcher {
      override def fetch(url: String): FetchedPage = {
        fetches += 1; FetchedPage(status, body, "text/plain")
      }
    }
    val ok = fetcher(200, "User-agent: *\nDisallow: /priv\n")
    val t0 = 1000L
    val r1 = RobotsCache.rulesFor("http://a.com/robots.txt", ok, t0)
    assert(!r1.isAllowed("/priv/x") && fetches == 1)
    // within TTL: served from cache
    RobotsCache.rulesFor("http://a.com/robots.txt", ok, t0 + RobotsCache.OkTtlMs - 1)
    assert(fetches == 1)
    // after TTL: refetched
    RobotsCache.rulesFor("http://a.com/robots.txt", ok, t0 + RobotsCache.OkTtlMs + 1)
    assert(fetches == 2)
    // 404 cached longer than errors
    fetches = 0
    RobotsCache.rulesFor("http://nf.com/robots.txt", fetcher(404, ""), t0)
    RobotsCache.rulesFor("http://nf.com/robots.txt", fetcher(404, ""),
      t0 + RobotsCache.ErrorTtlMs + 1)
    assert(fetches == 1, "404 entry must outlive the error TTL")
    fetches = 0
    RobotsCache.rulesFor("http://err.com/robots.txt", fetcher(500, ""), t0)
    RobotsCache.rulesFor("http://err.com/robots.txt", fetcher(500, ""),
      t0 + RobotsCache.ErrorTtlMs + 1)
    assert(fetches == 2, "5xx entry must expire after 1h")
  }

  test("scoped entries are isolated between crawl runs in one JVM") {
    RobotsCache.clear()
    var fetches = 0
    def fetcher(body: String) = new Fetcher {
      override def fetch(url: String): FetchedPage = {
        fetches += 1; FetchedPage(200, body, "text/plain")
      }
    }
    val strict = fetcher("User-agent: *\nDisallow: /\n")
    val open = fetcher("User-agent: *\nDisallow:\n")
    val rA = RobotsCache.rulesFor("http://x.com/robots.txt", strict, 0L, "runA")
    val rB = RobotsCache.rulesFor("http://x.com/robots.txt", open, 0L, "runB")
    assert(fetches == 2, "second run must not see the first run's rules")
    assert(!rA.isAllowed("/p") && rB.isAllowed("/p"))
    // same scope still caches
    RobotsCache.rulesFor("http://x.com/robots.txt", strict, 1L, "runA")
    assert(fetches == 2)
  }
}
