package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC archive *source*: parse WARC/1.0 files (as produced by
  * `graft.sinks.Sinks.writeWarc` / `writeWarcContent` /
  * `writeWarcContentGzipMembers`, or any writer of `resource` records)
  * back into rows — the ingestion half of the reference's WARC support
  * (record model + parser at …/flinkcrawler/warc/WARCRecord.java:35, used
  * by the CommonCrawl fetch path to read archived pages).
  *
  * Scale shape: one task per file, records parsed as a STREAM — headers
  * line-by-line, body as exactly Content-Length octets — so memory is
  * one record at a time, never a whole decompressed segment. (The
  * pre-round-16 reader went through `wholetext`, which materializes each
  * ~100k-record segment as one string: at sf10 that was 32 concurrent
  * multi-hundred-MB char arrays — the q122 bend and a 48 g heap
  * requirement, both retired by this reader.) Gzip segments (file-level
  * OR member-per-record — JDK's GZIPInputStream reads concatenated
  * members transparently) decompress through the same stream. Segment
  * files are bounded by the writer (`maxRecordsPerFile` / ~1 GB
  * segments), so tasks stay evenly sized. Body extraction honors
  * Content-Length in OCTETS, exactly, because it reads bytes — bodies
  * containing blank lines or multi-byte text parse correctly. Foreign
  * record types (warcinfo, request, metadata) parse and are filtered by
  * type, so archives from other tools read cleanly.
  */
object WarcSource {

  final case class WarcRecord(
      warcType: String, url: String, contentType: String,
      warcDate: String, content: String,
      // replay-fidelity extension fields (writer: Sinks.warcRecordCol).
      // Records from other writers default to 200/""/0L — the pre-round-7
      // "every record is a 200" behavior, now the fallback instead of the
      // rule.
      statusCode: Int = 200, redirectedTo: String = "",
      fetchTimeMs: Long = 0L)

  /** Largest body a single record may claim (writer segments are bounded
    * at ~1 GiB, so no conforming record exceeds this); larger claims are
    * treated as corruption and resynced past.
    */
  private[sources] val MaxRecordOctets: Int = 1 << 30

  /** Streaming record parser over a raw (already-decompressed) WARC
    * byte stream: resyncs on `WARC/1.0` marker lines, reads header
    * lines to the blank line, then exactly Content-Length octets of
    * body. One record in memory at a time. Junk between records is
    * skipped line-wise; record bodies can contain anything (including
    * `WARC/1.0` text) because they are consumed by length, not scanned.
    */
  private[sources] def parseStream(in: java.io.InputStream): Iterator[WarcRecord] = {
    val buf = new java.io.BufferedInputStream(in, 1 << 16)
    // one header/marker line as bytes (up to \n, \r stripped); null at EOF
    def readLine(): String = {
      val line = new java.io.ByteArrayOutputStream(64)
      var b = buf.read()
      if (b < 0) return null
      while (b >= 0 && b != '\n') { line.write(b); b = buf.read() }
      val bytes = line.toByteArray
      val n = if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r')
        bytes.length - 1 else bytes.length
      new String(bytes, 0, n, java.nio.charset.StandardCharsets.UTF_8)
    }
    def readFully(n: Int): Array[Byte] = {
      val out = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val r = buf.read(out, off, n - off)
        if (r < 0) return java.util.Arrays.copyOf(out, off) // truncated file
        off += r
      }
      out
    }
    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = null
      private var eof = false
      private def advance(): Unit = {
        while (nextRec == null && !eof) {
          var line = readLine()
          while (line != null && line != "WARC/1.0") line = readLine()
          if (line == null) { eof = true; return }
          var headers = Map.empty[String, String]
          var h = readLine()
          while (h != null && h.nonEmpty) {
            val i = h.indexOf(": ")
            if (i > 0)
              headers += h.substring(0, i)
                .toLowerCase(java.util.Locale.ROOT) -> h.substring(i + 2)
            h = readLine()
          }
          if (h == null) { eof = true; return }
          // Content-Length is untrusted input: a negative value would
          // throw in the array allocation, and an absurd one (up to
          // Int.MaxValue) would be a ~2 GB single allocation from one
          // corrupt/hostile record. Clamp negatives to 0 and treat
          // anything beyond the writer's segment bound (1 GiB — no
          // conforming record from our writers can exceed its segment)
          // as corrupt: read no body and let the line-wise resync find
          // the next WARC/1.0 marker.
          val octets = headers.get("content-length")
            .flatMap(_.trim.toIntOption)
            .map(n => if (n < 0 || n > MaxRecordOctets) 0 else n)
            .getOrElse(0)
          val body = new String(readFully(octets),
            java.nio.charset.StandardCharsets.UTF_8)
          nextRec = WarcRecord(
            headers.getOrElse("warc-type", ""),
            headers.getOrElse("warc-target-uri", ""),
            headers.getOrElse("content-type", ""),
            headers.getOrElse("warc-date", ""),
            body,
            headers.get("warc-graft-status-code")
              .flatMap(_.trim.toIntOption).getOrElse(200),
            headers.getOrElse("warc-graft-redirect", ""),
            headers.get("warc-graft-fetch-ms")
              .flatMap(_.trim.toLongOption).getOrElse(0L))
        }
      }
      override def hasNext: Boolean = { advance(); nextRec != null }
      override def next(): WarcRecord = {
        if (!hasNext) throw new NoSuchElementException("WARC stream drained")
        val r = nextRec; nextRec = null; r
      }
    }
  }

  /** Back-compat string form (specs exercise it directly): parse a whole
    * file's text via the streaming parser.
    */
  private[graft] def parseFile(text: String): Seq[WarcRecord] =
    parseStream(new java.io.ByteArrayInputStream(
      text.getBytes(java.nio.charset.StandardCharsets.UTF_8))).toSeq

  /** Expand dirs to their non-hidden files (the same universe Spark's
    * file listing would read: names starting with `.` or `_` excluded);
    * plain file paths pass through.
    */
  private def expand(
      spark: SparkSession, paths: Seq[String]): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    def visible(n: String): Boolean =
      !n.startsWith(".") && !n.startsWith("_") &&
        // torn segments from a crashed writer are never in the read
        // universe, whatever their prefix (ADVICE r15)
        !n.endsWith(".inprogress")
    paths.flatMap { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(conf)
      if (p.exists("*?[{".contains(_)))
        // globStatus returns NULL (not empty) when the glob's parent
        // directory doesn't exist — surface that as "no files"
        Option(fs.globStatus(path)).map(_.toSeq).getOrElse(Seq.empty)
          .filter(st => st.isFile && visible(st.getPath.getName))
          .map(_.getPath.toString)
      else if (fs.isDirectory(path))
        fs.listStatus(path).toSeq
          .filter(st => st.isFile && visible(st.getPath.getName))
          .map(_.getPath.toString)
      else Seq(p)
    }
  }

  /** One row per WARC record across `files`, streamed (see class doc):
    * (warcType, url, contentType, warcDate, content, statusCode,
    * redirectedTo, fetchTimeMs, warc_file).
    */
  private def readRecords(
      spark: SparkSession, paths: Seq[String]): DataFrame = {
    import spark.implicits._
    val files = expand(spark, paths)
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val parts = math.max(1,
      math.min(files.size, spark.sparkContext.defaultParallelism))
    spark.createDataset(files).repartition(parts)
      .flatMap { f =>
        val path = new org.apache.hadoop.fs.Path(f)
        val raw: java.io.InputStream =
          path.getFileSystem(hconf.value).open(path)
        val in =
          if (f.endsWith(".gz"))
            // JDK GZIPInputStream reads CONCATENATED members natively —
            // one stream serves both file-level gzip and the
            // member-per-record .warc.gz convention
            new java.util.zip.GZIPInputStream(raw, 1 << 16)
          else raw
        val name = f.substring(f.lastIndexOf('/') + 1)
        // Close discipline: Spark abandons partially-consumed flatMap
        // iterators under limit/take/show plans, and a parse exception
        // skips exhaustion entirely — so the authoritative close is a
        // task-completion listener (fires on success, abandonment, and
        // failure alike). The exhaustion close below is just the eager
        // path for fully-drained files; `closed` keeps both idempotent.
        val closeOnce = new java.util.concurrent.atomic.AtomicBoolean(false)
        def closeIn(): Unit =
          if (closeOnce.compareAndSet(false, true))
            try in.close() catch { case _: java.io.IOException => () }
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => closeIn()))
        new Iterator[(String, String, String, String, String, Int, String, Long, String)] {
          private val it = parseStream(in)
          override def hasNext: Boolean = {
            val h = it.hasNext
            if (!h) closeIn()
            h
          }
          override def next() = {
            val r = it.next()
            (r.warcType, r.url, r.contentType, r.warcDate, r.content,
              r.statusCode, r.redirectedTo, r.fetchTimeMs, name)
          }
        }
      }
      .toDF("warcType", "url", "contentType", "warcDate", "content",
        "statusCode", "redirectedTo", "fetchTimeMs", "warc_file")
  }

  /** Read a WARC directory into one row per `resource` record:
    * (url, contentType, warcDate, content, statusCode, redirectedTo,
    * fetchTimeMs). warcinfo headers are dropped (pass `keepAllTypes =
    * true` to surface every record with its type).
    */
  def read(spark: SparkSession, path: String,
      keepAllTypes: Boolean = false): DataFrame =
    readPaths(spark, Seq(path), keepAllTypes)

  /** [[read]] over an explicit file list — the CDX-pruned lookup path
    * ([[CdxLookup.fetch]]) reads ONLY the segment files its index hits
    * name, instead of the whole archive directory.
    */
  def readPaths(spark: SparkSession, paths: Seq[String],
      keepAllTypes: Boolean = false): DataFrame = {
    val all = readRecords(spark, paths).drop("warc_file")
    if (keepAllTypes) all
    else all.filter(col("warcType") === "resource")
      .select(col("url"), col("contentType"), col("warcDate"), col("content"),
        col("statusCode"), col("redirectedTo"), col("fetchTimeMs"))
  }

  /** One row per resource record WITH the holding segment file's name —
    * what [[graft.sinks.Sinks.writeCdx]] records so a CDX hit maps back
    * to the one file that must be read (the reference's CDX `filename`
    * field, …/fetcher/commoncrawl/CommonCrawlFetcher.java:146).
    */
  def readWithFile(spark: SparkSession, path: String): DataFrame =
    readRecords(spark, Seq(path))
      .filter(col("warcType") === "resource")
      .drop("warcType")
}
