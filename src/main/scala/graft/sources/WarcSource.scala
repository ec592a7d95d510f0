package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC archive *source*: parse WARC/1.0 files (as produced by
  * `graft.sinks.Sinks.writeWarc`, or any writer of `resource` records)
  * back into rows — the ingestion half of the reference's WARC support
  * (record model + parser at …/flinkcrawler/warc/WARCRecord.java:35, used
  * by the CommonCrawl fetch path to read archived pages).
  *
  * Scale shape: one task per file (Spark file splitting off for wholetext),
  * record parsing is a linear scan per file — segment files are bounded by
  * the writer (`maxRecordsPerFile` / ~1 GB segments), so tasks stay evenly
  * sized. Body extraction honors Content-Length in OCTETS, as the spec
  * requires — bodies containing blank lines parse correctly.
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

  /** Split one file's text into WARC records. */
  private[sources] def parseFile(text: String): Seq[WarcRecord] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    val marker = "WARC/1.0\r\n"
    var pos = text.indexOf(marker)
    while (pos >= 0) {
      val headerEnd = text.indexOf("\r\n\r\n", pos)
      if (headerEnd < 0) { pos = -1 }
      else {
        val headers = text.substring(pos + marker.length, headerEnd)
          .split("\r\n")
          .flatMap { line =>
            line.indexOf(": ") match {
              case -1 => None
              case i => Some(
                line.substring(0, i).toLowerCase(java.util.Locale.ROOT) ->
                  line.substring(i + 2))
            }
          }.toMap
        val bodyStart = headerEnd + 4
        val bodyOctets = headers.get("content-length").map(_.trim.toInt)
          .getOrElse(0)
        // Content-Length counts octets; the in-memory text is chars. Walk
        // chars accumulating UTF-8 byte width so multi-byte bodies parse.
        var taken = 0
        var i = bodyStart
        while (taken < bodyOctets && i < text.length) {
          val c = text.charAt(i)
          taken += (
            if (c < 0x80) 1
            else if (c < 0x800) 2
            else if (Character.isHighSurrogate(c)) { i += 1; 4 }
            else 3)
          i += 1
        }
        val body = text.substring(bodyStart, math.min(i, text.length))
        out += WarcRecord(
          headers.getOrElse("warc-type", ""),
          headers.getOrElse("warc-target-uri", ""),
          headers.getOrElse("content-type", ""),
          headers.getOrElse("warc-date", ""),
          body,
          headers.get("warc-graft-status-code")
            .flatMap(s => s.trim.toIntOption).getOrElse(200),
          headers.getOrElse("warc-graft-redirect", ""),
          headers.get("warc-graft-fetch-ms")
            .flatMap(s => s.trim.toLongOption).getOrElse(0L))
        pos = text.indexOf(marker, math.max(i, bodyStart))
      }
    }
    out.toSeq
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
    import spark.implicits._
    val all = spark.read.option("wholetext", "true").text(paths: _*)
      .as[String]
      .flatMap(parseFile _)
      .toDF()
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
  def readWithFile(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(path)
      .select(col("value"), input_file_name().as("f"))
      .as[(String, String)]
      .flatMap { case (text, f) =>
        val name = f.substring(f.lastIndexOf('/') + 1)
        parseFile(text).map(r => (r.warcType, r.url, r.contentType,
          r.warcDate, r.content, r.statusCode, r.redirectedTo,
          r.fetchTimeMs, name))
      }
      .toDF("warcType", "url", "contentType", "warcDate", "content",
        "statusCode", "redirectedTo", "fetchTimeMs", "warc_file")
      .filter(col("warcType") === "resource")
      .drop("warcType")
  }
}
