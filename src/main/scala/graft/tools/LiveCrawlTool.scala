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
  * --maxcontentsize <bytes> mid-stream truncation cap    [2 MiB]
  * --fetchtimeout <ms>      whole-fetch deadline         [100000]
  * --fetchthreads <n>       pooled fetchers per task     [10]
  * --maxoutlinks <n>        outlinks kept per page       [50]
  * --maxdurationsec <s>     wall-clock terminator
  * --warcdir <path>         archive fetched pages as WARC
  * --gzipmembers            member-per-record gzip WARC segments
  * --textdir <path>         parsed text as url<TAB>text
  * --frontierroot <path>    durable frontier (resume a killed crawl)
  * --nolengthen             skip the URL-shortener resolver
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
    val http = new HttpFetcher(HttpFetcherConfig(
      userAgent = opts.getOrElse("agent", "graft-crawler/1.0"),
      fetchTimeoutMs = opts.get("fetchtimeout").map(_.toLong)
        .getOrElse(100000L),
      maxContentBytes = opts.get("maxcontentsize").map(_.toInt)
        .getOrElse(2 * 1024 * 1024)))
    val cfg = CrawlConfig(
      maxRounds = opts.get("maxrounds").map(_.toInt).getOrElse(50),
      singleDomain = opts.get("singledomain"),
      defaultCrawlDelayMs = opts.get("defaultcrawldelay").map(_.toLong)
        .getOrElse(10000L), // reference CrawlToolOptions default
      maxOutlinksPerPage = opts.get("maxoutlinks").map(_.toInt).getOrElse(50),
      fetchThreads = opts.get("fetchthreads").map(_.toInt).getOrElse(10),
      terminator = opts.get("maxdurationsec").map(s =>
        new DurationCrawlTerminator(s.toLong * 1000L)),
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
      if (opts.contains("nolengthen")) None
      else Some(new UrlLengthener(http))

    val result = CrawlTopology.run(
      spark, seeds, pageFetcher = http, robotsFetcher = http,
      cfg = cfg, lengthener = lengthener)

    opts.get("textdir").foreach(dir =>
      graft.sinks.Sinks.writeParsedTsv(result.parsed, dir))
    result
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
