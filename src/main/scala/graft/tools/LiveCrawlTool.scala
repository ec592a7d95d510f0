package graft.tools

import org.apache.spark.sql.SparkSession

import graft.crawl._

/** The live-web crawl entry point — the reference's
  * …/flinkcrawler/tools/CrawlTool.java:28-120 + CrawlToolOptions.java:13
  * surface re-expressed over [[CrawlTopology]] with the real
  * [[HttpFetcher]] wired into every network seam (pages, robots,
  * lengthener). No mock anywhere: point it at seed URLs and it crawls,
  * archives, and extracts.
  *
  * Options (defaults mirror the reference where it has one):
  * {{{
  * --seedurls <file>        text file, one URL per line (required)
  * --agent <string>         User-Agent                   [graft-crawler/1.0]
  * --singledomain <pld>     restrict the crawl to one domain
  * --maxrounds <n>          crawl rounds                 [50]
  * --defaultcrawldelay <ms> when robots.txt is silent    [10000]
  * --forcecrawldelay <ms>   use THIS delay even if robots.txt provides one
  *                          (forced > robots > default; reference
  *                          CrawlToolOptions.java:70)
  * --htmlonly               only fully fetch+parse HTML mime types — other
  *                          responses abort at the header (journal status
  *                          ABORTED_FETCH; reference CrawlToolOptions
  *                          .java:120 → INVALID_MIMETYPE)
  * --maxcontentsize <bytes> mid-stream truncation cap    [2 MiB]
  * --fetchtimeout <ms>      whole-fetch deadline         [100000]
  * --fetchthreads <n>       pooled fetchers per task     [10]
  * --maxoutlinks <n>        outlinks kept per page       [50]
  * --maxurlsperdomain <n>   fetches per domain per round [1]
  * --frontierbuckets <n>    durable-frontier bucket count [64]
  * --maxdurationsec <s>     wall-clock terminator
  * --timeout <s>            max IDLE time before self-termination
  *                          (reference CrawlToolOptions.java:140 → the
  *                          no-activity terminator)
  * --archivedir <path>      ARCHIVE mode: fetch pages from this WARC
  *                          directory instead of the live web — zero live
  *                          fetches, robots allow-all (the reference's
  *                          -commoncrawl dataset mode,
  *                          CrawlToolOptions.java:85)
  * --warcdir <path>         archive fetched pages as WARC
  * --gzipmembers            member-per-record gzip WARC segments
  * --textdir <path>         parsed text as url<TAB>text
  * --frontierroot <path>    durable frontier (resume a killed crawl)
  * --nolengthen             skip the URL-shortener resolver
  * --wallclock              pace rounds and politeness clocks on the WALL
  *                          clock (live-web mode: no two hits to a domain
  *                          inside its crawl delay, in real time)
  * --cpus <n>               local cores                  [4]
  * }}}
  */
object LiveCrawlTool {

  def main(args: Array[String]): Unit = {
    val opts = parse(args.toList, Map.empty)
    val cpus = opts.getOrElse("cpus", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val result = run(spark, opts)
    println(s"[live-crawl] rounds: ${result.rounds}")
    result.metrics.toSeq.sorted.foreach { case (k, v) =>
      println(s"[live-crawl] $k: $v")
    }
    spark.stop()
  }

  /** The tool body against a caller-owned session (specs drive it over a
    * loopback server; `main` owns session lifecycle).
    */
  def run(spark: SparkSession, opts: Map[String, String]): CrawlResult = {
    val seedFile = opts.getOrElse("seedurls",
      sys.error("--seedurls <file> is required"))
    val seeds = scala.io.Source.fromFile(seedFile).getLines()
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map((_, 1.0f)).toSeq
    val archiveMode = opts.contains("archivedir")
    // --htmlonly: the mime allow-list is what Tika's HtmlParser accepts
    // (reference CrawlTool.java:94-100 builds validMimeTypes from
    // HtmlParser.getSupportedTypes); disallowed responses abort at the
    // response header and journal as ABORTED_FETCH
    val htmlMimes: Set[String] =
      if (opts.contains("htmlonly"))
        Set("text/html", "application/xhtml+xml",
          "application/vnd.wap.xhtml+xml", "application/x-asp")
      else Set.empty
    val baseCfg = HttpFetcherConfig(
      userAgent = opts.getOrElse("agent", "graft-crawler/1.0"),
      fetchTimeoutMs = opts.get("fetchtimeout").map(_.toLong)
        .getOrElse(100000L),
      maxContentBytes = opts.get("maxcontentsize").map(_.toInt)
        .getOrElse(2 * 1024 * 1024))
    // the mime allow-list applies to the PAGE fetcher only — robots.txt
    // (text/plain) and shortener resolution must keep fetching under
    // --htmlonly, exactly like the reference restricting only
    // pageFetcherBuilder (CrawlTool.java:94-100)
    val http = new HttpFetcher(baseCfg.copy(validMimeTypes = htmlMimes))
    val auxHttp =
      if (htmlMimes.isEmpty) http else new HttpFetcher(baseCfg)
    // the two terminators compose like the reference tool's pair (wall
    // -clock -maxcrawlduration + idle -timeout): whichever trips first
    // stops the crawl
    val terminators = Seq(
      opts.get("maxdurationsec").map(s =>
        new DurationCrawlTerminator(s.toLong * 1000L)),
      opts.get("timeout").map(s =>
        new NoActivityCrawlTerminator(s.toLong * 1000L))).flatten
    val terminator: Option[CrawlTerminator] = terminators match {
      case Seq() => None
      case Seq(one) => Some(one)
      case many => Some(new CrawlTerminator {
        override def open(): Unit = many.foreach(_.open())
        override def reportActivity(): Unit = many.foreach(_.reportActivity())
        override def isTerminated(): Boolean = many.exists(_.isTerminated())
      })
    }
    val cfg = CrawlConfig(
      maxRounds = opts.get("maxrounds").map(_.toInt).getOrElse(50),
      singleDomain = opts.get("singledomain"),
      defaultCrawlDelayMs = opts.get("defaultcrawldelay").map(_.toLong)
        .getOrElse(10000L), // reference CrawlToolOptions default
      forceCrawlDelayMs = opts.get("forcecrawldelay").map(_.toLong),
      wallClockRounds = opts.contains("wallclock"),
      maxOutlinksPerPage = opts.get("maxoutlinks").map(_.toInt).getOrElse(50),
      maxUrlsPerDomainPerRound =
        opts.get("maxurlsperdomain").map(_.toInt).getOrElse(1),
      frontierBuckets = opts.get("frontierbuckets").map(_.toInt).getOrElse(64),
      frontierCompactEvery =
        opts.get("frontiercompactevery").map(_.toInt).getOrElse(8),
      fetchThreads = opts.get("fetchthreads").map(_.toInt).getOrElse(10),
      terminator = terminator,
      frontierRoot = opts.get("frontierroot"),
      contentSink = opts.get("warcdir").map { dir =>
        if (opts.contains("gzipmembers"))
          (df: org.apache.spark.sql.DataFrame) =>
            graft.sinks.Sinks.writeWarcContentGzipMembers(df, dir)
        else
          (df: org.apache.spark.sql.DataFrame) =>
            graft.sinks.Sinks.writeWarcContent(df, dir)
      })
    val lengthener =
      if (opts.contains("nolengthen") || archiveMode) None
      else Some(new UrlLengthener(auxHttp))

    // ARCHIVE mode (the reference's -commoncrawl switch): the fetch stage
    // is an equi-join against the WARC archive's newest captures; robots
    // and the lengthener go through a noop fetcher (always 404 → robots
    // allow-all), exactly the reference's NoopHttpFetcherBuilder wiring
    // (CrawlToolUtils.java:46,64) — ZERO live fetches in this mode
    val result =
      if (archiveMode) {
        val archive = ArchiveFetch.fromWarc(spark, opts("archivedir"))
          .localCheckpoint(true)
        CrawlTopology.run(
          spark, seeds,
          pageFetcher = LiveCrawlTool.NoopFetcher,
          robotsFetcher = LiveCrawlTool.NoopFetcher,
          cfg = cfg, lengthener = None,
          fetchStage = Some(ArchiveFetch.stage(archive) _))
      } else
        CrawlTopology.run(
          spark, seeds, pageFetcher = http, robotsFetcher = auxHttp,
          cfg = cfg, lengthener = lengthener,
          sitemapFetcher = Some(auxHttp))

    opts.get("textdir").foreach(dir =>
      graft.sinks.Sinks.writeParsedTsv(result.parsed, dir))
    result
  }

  /** Always-404 fetcher (reference NoopHttpFetcherBuilder.java:17-40):
    * archive mode's robots/sitemap stance — no robots.txt anywhere, so
    * everything in the archive is crawlable and nothing touches the net.
    */
  object NoopFetcher extends Fetcher {
    override def fetch(url: String): FetchedPage =
      FetchedPage(404, "", "text/plain")
  }

  @scala.annotation.tailrec
  private def parse(
      args: List[String], acc: Map[String, String]): Map[String, String] =
    args match {
      case Nil => acc
      case flag :: rest if flag.startsWith("--") =>
        val key = flag.stripPrefix("--")
        rest match {
          // boolean flags: next token is another option or nothing
          case v :: tail if !v.startsWith("--") =>
            parse(tail, acc + (key -> v))
          case _ => parse(rest, acc + (key -> "true"))
        }
      case other :: _ =>
        sys.error(s"unexpected argument '$other' (options are --key value)")
    }
}
