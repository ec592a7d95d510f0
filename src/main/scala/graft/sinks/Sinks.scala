package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Output sinks mirroring the reference's two writers (SURVEY.md §2.13):
  * WARC archive records (W1) and tab-separated parsed text (W2), plus the
  * analytics-native parquet content sink.
  */
object Sinks {

  /** ISO-8601 date used in WARC headers (reference
    * …/flinkcrawler/warc/CreateWARCWritableFunction.java:23).
    */
  private val WarcDate = "yyyy-MM-dd'T'HH:mm:ss'Z'"

  /** Render one WARC/1.0 `resource` record per fetched page as a column
    * expression (reference WARCRecord.java:35, CreateWARCWritableFunction
    * .java:87-110). Expects columns: url, contentType, content (string),
    * fetchTimeMs (long).
    *
    * Three extension fields (WARC/1.0 §4 named-field extensibility) make
    * the archive REPLAY-complete: the archived HTTP status code, the
    * redirect target, and the millisecond fetch time (WARC-Date is
    * second-resolution — recrawls within one second need the real stamp
    * to pick "newest" correctly on replay, [[graft.crawl.ArchiveFetch
    * .fromWarc]]).
    */
  def warcRecordCol(
      statusCode: Column = lit(200),
      redirectedTo: Column = lit("")) = {
    val body = col("content")
    // WARC Content-Length is the OCTET count of the block — length() on a
    // string counts characters, wrong for any non-ASCII body
    val len = length(encode(body, "UTF-8")).cast("string")
    concat(
      lit("WARC/1.0\r\n"),
      lit("WARC-Type: resource\r\n"),
      concat(lit("WARC-Target-URI: "), col("url"), lit("\r\n")),
      concat(lit("WARC-Date: "),
        date_format(timestamp_millis(col("fetchTimeMs")), WarcDate),
        lit("\r\n")),
      concat(lit("WARC-Graft-Status-Code: "),
        statusCode.cast("string"), lit("\r\n")),
      when(coalesce(redirectedTo, lit("")) === "", lit(""))
        .otherwise(concat(lit("WARC-Graft-Redirect: "), redirectedTo,
          lit("\r\n"))),
      concat(lit("WARC-Graft-Fetch-Ms: "),
        col("fetchTimeMs").cast("string"), lit("\r\n")),
      concat(lit("Content-Type: "), col("contentType"), lit("\r\n")),
      concat(lit("Content-Length: "), len, lit("\r\n")),
      lit("\r\n"),
      body, lit("\r\n\r\n"))
  }

  /** One-time warcinfo header record (reference
    * CreateWARCWritableFunction.java:55-86).
    */
  def warcInfoRecord(crawler: String, timeMs: Long): String = {
    val date = java.time.Instant.ofEpochMilli(timeMs).toString
    val fields = s"software: $crawler\r\nformat: WARC file version 1.0\r\n"
    val octets = fields.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
    s"WARC/1.0\r\nWARC-Type: warcinfo\r\nWARC-Date: $date\r\n" +
      s"Content-Type: application/warc-fields\r\n" +
      s"Content-Length: $octets\r\n\r\n$fields\r\n\r\n"
  }

  /** Write fetched pages as rolling WARC text segments (the reference
    * rotates ~1 GB segments, WARCFileWriter.java:96-170; here segment size
    * is bounded via maxRecordsPerFile and optional gzip via codec).
    */
  def writeWarc(
      fetched: DataFrame, path: String,
      maxRecordsPerFile: Long = 100000, gzip: Boolean = false): Unit = {
    val writer = fetched
      .select(warcRecordCol().as("value"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
    (if (gzip) writer.option("compression", "gzip") else writer).text(path)
  }

  /** WARC sink for the crawl's `contentSink` tap (CrawlConfig.contentSink
    * frame: url, statusCode, contentType, headers, content binary,
    * fetchTimeMs, redirectedTo): decodes each body with the
    * response-header charset (headers outrank the contentType field,
    * exactly like the parse stage) and APPENDS records, so a multi-round
    * crawl accumulates one archive — the writer half of the
    * archive-and-replay loop closed by [[graft.crawl.ArchiveFetch
    * .fromWarc]]. Status code and redirect target travel in the record's
    * extension fields so non-200 outcomes replay faithfully (frames from
    * older taps without `redirectedTo` still write, as 200s-only did).
    */
  def writeWarcContent(
      content: DataFrame, path: String,
      maxRecordsPerFile: Long = 100000, gzip: Boolean = false): Unit = {
    val frame = contentRecordFrame(content)
    val writer = frame
      .select(warcRecordCol(col("statusCode"), col("redirectedTo")).as("value"))
      .write.mode("append")
      .option("maxRecordsPerFile", maxRecordsPerFile)
    (if (gzip) writer.option("compression", "gzip") else writer).text(path)
  }

  /** Member-per-record gzip WARC segments (reference WARCFileWriter
    * .java:96-170: each record is its OWN gzip member, members
    * concatenated — the archive-ecosystem `.warc.gz` convention, which
    * lets replay tools seek to a record offset and decompress just that
    * member; file-level gzip cannot). Same record rendering and append
    * discipline as [[writeWarcContent]]; [[graft.sources.WarcSource]]
    * reads both forms transparently (Hadoop's gzip codec decompresses
    * concatenated members).
    *
    * Write protocol: one task per partition streams records through a
    * per-record gzip member into rolling `part-*-N.warc.gz` segments
    * (rolled every `maxRecordsPerFile`), each written under an
    * `.inprogress` name and renamed on completion — readers (which match
    * only `*.warc.gz`-suffixed names via the text reader's non-hidden
    * listing) never see a torn segment. Single-writer archive discipline
    * (the engine's StoreProtocol norm): run one archive write at a time;
    * a failed attempt leaves only `.inprogress` litter, overwritten on
    * retry by attempt-unique names.
    */
  def writeWarcContentGzipMembers(
      content: DataFrame, path: String,
      maxRecordsPerFile: Long = 100000): Unit = {
    val frame = contentRecordFrame(content)
    val records = frame
      .select(warcRecordCol(col("statusCode"), col("redirectedTo")).as("value"))
    val spark = records.sparkSession
    import spark.implicits._
    graft.util.StoreProtocol.fs(spark, path)
      .mkdirs(new org.apache.hadoop.fs.Path(path))
    records.as[String].foreachPartition { it: Iterator[String] =>
      if (it.hasNext) {
        val dir = new org.apache.hadoop.fs.Path(path)
        val fs = dir.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val tc = org.apache.spark.TaskContext.get()
        var out: org.apache.hadoop.fs.FSDataOutputStream = null
        var current: org.apache.hadoop.fs.Path = null
        var seq = 0
        var n = 0L
        def open(): Unit = {
          current = new org.apache.hadoop.fs.Path(dir,
            f"part-${tc.partitionId()}%05d-${tc.taskAttemptId()}-$seq%04d" +
              ".warc.gz.inprogress")
          out = fs.create(current, true)
          n = 0L
        }
        def closeSegment(): Unit = if (out != null) {
          out.close()
          val done = new org.apache.hadoop.fs.Path(dir,
            current.getName.stripSuffix(".inprogress"))
          // a silent rename failure would LOSE the segment (readers match
          // only *.warc.gz) — fail the task instead, Spark retries it
          if (!fs.rename(current, done))
            throw new java.io.IOException(
              s"failed to commit WARC segment $current -> $done")
          out = null
          seq += 1
        }
        try {
          it.foreach { record =>
            if (out == null) open()
            val gz = new MemberGzipStream(out)
            gz.write(record.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            gz.finishMember()
            n += 1
            if (n >= maxRecordsPerFile) closeSegment()
          }
          closeSegment()
        } finally if (out != null) out.close()
      }
    }
  }

  /** One gzip member on a shared stream: `finishMember` flushes the
    * trailer and releases the Deflater's native buffer WITHOUT closing
    * the underlying segment stream — a 100k-record segment must not hold
    * 100k live Deflaters until GC.
    */
  private final class MemberGzipStream(out: java.io.OutputStream)
    extends java.util.zip.GZIPOutputStream(out) {
    def finishMember(): Unit = {
      finish()
      `def`.end()
    }
  }

  /** The shared contentSink-frame projection of [[writeWarcContent]] and
    * [[writeWarcContentGzipMembers]]: body decoded with the
    * response-header charset (headers outrank the contentType field),
    * status/redirect surfaced for replay.
    */
  private def contentRecordFrame(content: DataFrame): DataFrame = {
    val decode = udf {
      (bytes: Array[Byte], headers: Map[String, Seq[String]], ct: String) =>
        new String(bytes,
          graft.functions.UrlFunctions.charsetFromHeaders(headers, ct))
    }
    val redirect =
      if (content.columns.contains("redirectedTo")) col("redirectedTo")
      else lit("")
    content.select(
      col("url"), col("contentType"),
      decode(col("content"), col("headers"), col("contentType")).as("content"),
      col("fetchTimeMs"), col("statusCode"), redirect.as("redirectedTo"))
  }

  /** Tab-separated `url<TAB>text` lines with tabs/newlines scrubbed
    * (reference CrawlTopologyBuilder.java:441-453, scrub regex :81).
    */
  def parsedTextTsv(parsed: DataFrame): DataFrame =
    parsed.select(concat_ws("\t",
      col("url"),
      regexp_replace(col("text"), "[\\t\\r\\n]", " ")).as("value"))

  def writeParsedTsv(parsed: DataFrame, path: String): Unit =
    parsedTextTsv(parsed).write.mode("overwrite").text(path)

  /** The analytics-engine content sink: pages as parquet partitioned by
    * pld bucket so frontier joins prune partitions.
    */
  def writeContentParquet(fetched: DataFrame, path: String,
      buckets: Int = 64): Unit =
    fetched
      .withColumn("pld_bucket", pmod(hash(col("pld")), lit(buckets)))
      .write.mode("overwrite")
      .partitionBy("pld_bucket")
      .parquet(path)

  /** CDX capture index over an archive's records (the web-archive lookup
    * sidecar: CommonCrawl publishes exactly this next to its WARC
    * segments; the reference's CommonCrawlFetcher navigates the crawl via
    * the secondary index over these files, SecondaryIndexMap.java /
    * CommonCrawlFetcher.java:67,146). One row per record: canonicalized
    * SURT key, 14-digit timestamp, original url, mime, archived status,
    * md5 content digest, octet length. Input is [[graft.sources
    * .WarcSource.read]]'s frame (or any frame with those columns).
    *
    * Scale shape: pure projection — surt/digest/length are per-row
    * expressions; ordering happens only in [[writeCdx]] via a range
    * repartition so the emitted shards are globally sorted by
    * (surt, ts), the property CDX binary-search lookup needs.
    */
  def cdxIndex(records: DataFrame, extraCols: Seq[Column] = Nil): DataFrame = {
    val surt = udf((u: String) => graft.functions.UrlFunctions.surtKey(u))
    records.select(Seq(
      surt(col("url")).as("surt"),
      // CDX timestamps are defined as UTC; date_format renders wall time
      // in the SESSION timezone, so shift the instant first such that the
      // session-tz rendering shows the UTC wall clock — correct under any
      // spark.sql.session.timeZone, not just the UTC the tests pin
      date_format(
        to_utc_timestamp(timestamp_millis(col("fetchTimeMs")),
          expr("current_timezone()")),
        "yyyyMMddHHmmss").as("ts"),
      col("url"),
      col("contentType").as("mime"),
      col("statusCode").cast("long").as("status"),
      md5(col("content")).as("digest"),
      length(encode(col("content"), "UTF-8")).cast("long").as("n_octets"))
      ++ extraCols: _*)
  }

  /** Render + write the CDX index for an archive directory: space-joined
    * text lines (the classic CDX line shape: key, timestamp, url, mime,
    * status, digest, length, plus the holding WARC segment's filename —
    * the reference CDX `filename` field that lets a lookup read ONE
    * archive file, CommonCrawlFetcher.java:146), range-partitioned and
    * sorted so the file set reads back in global (surt, ts) order —
    * the property [[graft.sources.CdxLookup]]'s shard pruning needs.
    */
  def writeCdx(spark: org.apache.spark.sql.SparkSession,
      archiveDir: String, path: String, shards: Int = 1): Unit = {
    val records = graft.sources.WarcSource.readWithFile(spark, archiveDir)
    cdxIndex(records, extraCols = Seq(col("warc_file")))
      .repartitionByRange(shards, col("surt"), col("ts"))
      .sortWithinPartitions(col("surt"), col("ts"))
      // CDX lines are space-delimited, so a mime like
      // 'text/html; charset=utf-8' (routine in fetch headers) would shift
      // every later field on re-parse — classic CDX strips internal
      // whitespace from the mime field; do the same ('-' when absent)
      .select(concat_ws(" ", col("surt"), col("ts"), col("url"),
        regexp_replace(coalesce(col("mime"), lit("-")), "\\s+", ""),
        col("status"), col("digest"), col("n_octets"), col("warc_file"))
        .as("value"))
      .write.mode("overwrite").text(path)
  }

  /** Training-corpus export: parquet laid out by split (and shard, when
    * a shard column is present — [[graft.operators.TextOps.shardAndPack]]
    * assigns one), so a training job reads its split with partition
    * pruning and each shard is an independently consumable file set.
    * One writer job, no repartition beyond the layout columns — the
    * directory structure IS the index.
    */
  def writeTrainingSplits(
      corpus: DataFrame, path: String,
      splitCol: String = "split", shardCol: String = "shard"): Unit = {
    val layout =
      if (corpus.columns.contains(shardCol)) Seq(splitCol, shardCol)
      else Seq(splitCol)
    corpus.write.mode("overwrite").partitionBy(layout: _*).parquet(path)
  }
}
