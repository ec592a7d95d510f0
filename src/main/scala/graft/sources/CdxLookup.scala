package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.UrlFunctions

/** CDX-pruned archive lookup — the read side of
  * [[graft.sinks.Sinks.writeCdx]], modeled on the reference's CommonCrawl
  * secondary-index path (…/fetcher/commoncrawl/CommonCrawlFetcher.java:50
  * and SecondaryIndexMap.java:25: binary-search the sorted secondary
  * index, then fetch ONE archive range): given a URL set,
  *
  *   1. shard pruning — the CDX was written range-partitioned and sorted
  *      by (surt, ts), so shard i covers [firstKey_i, firstKey_{i+1}).
  *      The driver reads ONE line per shard (the first — cheap, bounded
  *      by shard count) and keeps only shards whose range can hold a
  *      wanted key: the distributed analogue of the binary search.
  *   2. entry filter — the surviving shards are scanned for the wanted
  *      surt keys, yielding the CDX entries incl. the `warc_file` field.
  *   3. file-pruned fetch — only the named segment files are read
  *      ([[WarcSource.readPaths]]); the rest of the archive is never
  *      opened.
  *
  * Scale shape: a point lookup against an N-segment archive reads
  * |shard headers| driver-side bytes + the few CDX shards and WARC
  * segments the keys actually live in — touched-file count is bounded by
  * the lookup set, never by archive size. [[LookupStats]] reports both
  * counts so callers (and the spec/bench) can assert the pruning.
  */
object CdxLookup {

  final case class LookupStats(
    cdxShardsTotal: Int, cdxShardsRead: Int,
    warcFilesTotal: Int, warcFilesRead: Int)

  /** 14-digit CDX timestamp (UTC wall time by convention) → epoch
    * millis, ARITHMETICALLY — date arithmetic on the yyyyMMdd prefix
    * plus the time-of-day fields, never a session-timezone
    * to_timestamp/from_utc_timestamp round trip (only exact in
    * fixed-offset zones; near a DST transition the two offsets differ
    * and captures shift by an hour). Shared by
    * [[graft.crawl.RevisitPolicy.fromCdx]] and the incremental archive
    * rounds ([[graft.crawl.CrawlCorpusLoop]]).
    */
  def cdxTsToMs(ts: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    datediff(to_date(substring(ts, 1, 8), "yyyyMMdd"),
        to_date(lit("1970-01-01"))).cast("long") * 86400000L +
      substring(ts, 9, 2).cast("long") * 3600000L +
      substring(ts, 11, 2).cast("long") * 60000L +
      substring(ts, 13, 2).cast("long") * 1000L

  private val entryCols = Seq("surt", "ts", "url", "mime", "status",
    "digest", "n_octets", "warc_file")

  private def emptyEntries(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(entryCols.map {
        case n @ ("status" | "n_octets") => StructField(n, LongType)
        case n => StructField(n, StringType)
      }))
  }

  private def emptyRecords(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("url", StringType),
        StructField("contentType", StringType),
        StructField("warcDate", StringType),
        StructField("content", StringType),
        StructField("statusCode", IntegerType),
        StructField("redirectedTo", StringType),
        StructField("fetchTimeMs", LongType))))
  }

  /** Membership filter that stays plan-friendly at any lookup-set size:
    * a literal `isin` for small sets, a broadcast semi-join above that
    * (thousands of literals make a thousands-deep expression tree).
    */
  private def filterIn(
      df: DataFrame, colName: String, values: Seq[String]): DataFrame =
    if (values.size <= 64) df.filter(col(colName).isin(values: _*))
    else {
      val spark = df.sparkSession
      import spark.implicits._
      df.join(broadcast(values.toDF(colName)), Seq(colName), "left_semi")
    }

  /** First text line of a file, driver-side (bounded read). */
  private def firstLine(
      fs: org.apache.hadoop.fs.FileSystem, p: Path): String = {
    val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(fs.open(p), "UTF-8"))
    try Option(in.readLine()).getOrElse("") finally in.close()
  }

  private def sortedShards(
      spark: SparkSession, cdxPath: String): (Seq[Path], Seq[String]) = {
    val root = new Path(cdxPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith("part-"))
      .sortBy(_.getName).toSeq
    // one open per shard: pooled (order-preserving) so the driver-side
    // cost of a point lookup against a 1000-shard index is ~latency ×
    // shards/16, not latency × shards (Hadoop FileSystem open/read is
    // thread-safe; each worker owns its stream)
    (files, graft.util.Pooled.ordered(files, threads = 16, name = "cdx")(
      f => firstLine(fs, f).takeWhile(_ != ' ')))
  }

  /** CDX entries for the wanted URLs: (surt, ts, url, mime, status,
    * digest, n_octets, warc_file), read from only the shards whose key
    * range can contain a wanted surt.
    */
  def entries(
      spark: SparkSession, cdxPath: String,
      urls: Seq[String]): (DataFrame, LookupStats) = {
    val wanted = urls.map(UrlFunctions.surtKey).distinct
    val (files, firstKeys) = sortedShards(spark, cdxPath)
    // nonempty shards in range order; an empty shard holds nothing and
    // must not shadow its predecessor's range
    val cand = firstKeys.zipWithIndex.filter(_._1.nonEmpty)
    // shard j may contain surt k iff firstKey_j <= k and the NEXT shard
    // starts at or after k (range partitioning on (surt, ts) can split
    // one surt's captures across a boundary, so boundary equality keeps
    // BOTH sides — the conservative interval test a binary search over
    // first keys implies)
    val hit = wanted.flatMap { k =>
      cand.indices.filter { j =>
        cand(j)._1 <= k &&
          (j == cand.length - 1 || cand(j + 1)._1 >= k)
      }.map(cand(_)._2)
    }.distinct.sorted
    val stats0 = LookupStats(files.size, hit.size, 0, 0)
    if (hit.isEmpty)
      return (emptyEntries(spark), stats0)
    val lines = spark.read.text(hit.map(i => files(i).toString): _*)
    (filterIn(parseLines(lines), "surt", wanted), stats0)
  }

  /** Tail-anchored CDX line parse: surt/ts/url from the head, the four
    * trailing fields by NEGATIVE index, mime = whatever lies between.
    * writeCdx strips whitespace from mime, but hand-built or foreign CDX
    * files routinely carry 'text/html; charset=utf-8' — positional split
    * on field 4 would shift status/digest/n_octets/warc_file for those.
    */
  private def parseLines(lines: DataFrame): DataFrame =
    lines
      .select(split(col("value"), " ").as("p"))
      // a CDX line carries at least 8 fields (1-token mime). Shorter
      // lines (truncated writes, foreign formats) would feed negative
      // element_at indexes that mis-assign columns — drop them instead;
      // a line without a warc_file can never be fetched anyway
      .where(size(col("p")) >= 8)
      .select(
        element_at(col("p"), 1).as("surt"),
        element_at(col("p"), 2).as("ts"),
        element_at(col("p"), 3).as("url"),
        // '-' is the classic-CDX unknown marker; an empty join result
        // (doubled separators) must not masquerade as a real empty mime
        when(length(concat_ws(" ",
            slice(col("p"), lit(4), greatest(size(col("p")) - 7, lit(0)))))
            === 0, lit("-"))
          .otherwise(concat_ws(" ",
            slice(col("p"), lit(4), greatest(size(col("p")) - 7, lit(0)))))
          .as("mime"),
        element_at(col("p"), -4).cast("long").as("status"),
        element_at(col("p"), -3).as("digest"),
        element_at(col("p"), -2).cast("long").as("n_octets"),
        element_at(col("p"), -1).as("warc_file"))

  /** Every entry of the CDX sidecar — the full-SNAPSHOT read that
    * cross-round diffing ([[graft.crawl.SnapshotDelta.fromCdx]]) and
    * offline audits want; point lookups go through [[entries]]' pruned
    * path instead (there is no key set to prune by here). One scan of
    * all shards, shape = shard count × shard size, never driver-side.
    */
  def allEntries(spark: SparkSession, cdxPath: String): DataFrame = {
    val (files, _) = sortedShards(spark, cdxPath)
    if (files.isEmpty) emptyEntries(spark)
    else parseLines(spark.read.text(files.map(_.toString): _*))
  }

  /** Fetch the wanted URLs' archived records, reading ONLY the WARC
    * segment files the CDX entries name. Returns [[WarcSource.read]]'s
    * schema filtered to the URL set, plus the pruning stats.
    */
  def fetch(
      spark: SparkSession, archiveDir: String, cdxPath: String,
      urls: Seq[String]): (DataFrame, LookupStats) = {
    val (cdx, s0) = entries(spark, cdxPath, urls)
    val archiveRoot = new Path(archiveDir)
    val fs = archiveRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalFiles = fs.listStatus(archiveRoot)
      .count(st => st.getPath.getName.startsWith("part-"))
    val wantedFiles =
      if (s0.cdxShardsRead == 0) Seq.empty[String]
      else cdx.select("warc_file").distinct()
        .collect().map(_.getString(0)).sorted.toSeq
    val stats = s0.copy(
      warcFilesTotal = totalFiles, warcFilesRead = wantedFiles.size)
    if (wantedFiles.isEmpty) return (emptyRecords(spark), stats)
    val records = WarcSource.readPaths(spark,
      wantedFiles.map(n => s"$archiveDir/$n"))
    (filterIn(records, "url", urls), stats)
  }
}
