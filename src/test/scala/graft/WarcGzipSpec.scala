package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.Sinks
import graft.sources.WarcSource

/** Member-per-record gzip WARC segments (reference WARCFileWriter
  * .java:96-170): round-trip identity with the plain writer, true gzip
  * member boundaries (one member per record — the seekability property
  * archive tools expect), segment rolling, and mixed plain+gzip directory
  * reads through the one WarcSource.
  */
class WarcGzipSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_warcgz").toString

  /** A contentSink-shaped frame exercising the fidelity corners: multi-
    * byte bodies, bodies containing blank lines (the Content-Length
    * octet-walk), non-200 statuses, redirects, millisecond stamps.
    */
  private def contentFrame(ids: Range): DataFrame = {
    import spark.implicits._
    ids.map { i =>
      val body =
        if (i % 3 == 0) s"café $i\r\n\r\nWARC/1.0 looks like a header\ndone"
        else s"plain body $i"
      val status = if (i % 5 == 0) 301 else 200
      val redirect = if (status == 301) s"http://t.com/moved$i" else ""
      (s"http://site.com/p$i", status,
        "text/html; charset=UTF-8",
        Map("Content-Type" -> Seq("text/html; charset=UTF-8")),
        body.getBytes("UTF-8"), 1700000000000L + i, redirect)
    }.toDF("url", "statusCode", "contentType", "headers", "content",
      "fetchTimeMs", "redirectedTo")
  }

  private def readBack(dir: String): Set[(String, Int, String, String, Long)] =
    WarcSource.read(spark, dir)
      .select("url", "statusCode", "content", "redirectedTo", "fetchTimeMs")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3),
        r.getLong(4))).toSet

  test("gzip-member archive round-trips identically to the plain form") {
    val base = tmp()
    val frame = contentFrame(0 until 40).repartition(3)
    Sinks.writeWarcContent(frame, s"$base/plain")
    Sinks.writeWarcContentGzipMembers(frame, s"$base/gz")
    val plain = readBack(s"$base/plain")
    val gz = readBack(s"$base/gz")
    assert(plain.size == 40)
    assert(gz == plain,
      "gzip-member read diverged from plain:\n only-gz: " +
        (gz -- plain).take(3) + "\n only-plain: " + (plain -- gz).take(3))
  }

  test("each record is its own gzip member (seekable .warc.gz convention)") {
    val dir = tmp() + "/members"
    Sinks.writeWarcContentGzipMembers(
      contentFrame(0 until 12).coalesce(1), dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.gz"))
    assert(files.length == 1)
    val bytes = java.nio.file.Files.readAllBytes(files(0).toPath)
    // java's GZIPOutputStream emits a fixed member header prefix
    // (1f 8b 08, flags 0, mtime 0, xfl 0; the OS byte varies by JDK) —
    // count member starts by the 9 fixed bytes
    val sig = Array[Byte](0x1f.toByte, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0)
    val members = bytes.indices.count(i =>
      i + sig.length <= bytes.length &&
        sig.indices.forall(j => bytes(i + j) == sig(j)))
    assert(members == 12, s"expected 12 gzip members, found $members")
    // and no torn-segment litter remains
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.endsWith(".inprogress")))
  }

  test("segments roll at maxRecordsPerFile") {
    val dir = tmp() + "/rolled"
    Sinks.writeWarcContentGzipMembers(
      contentFrame(0 until 25).coalesce(1), dir, maxRecordsPerFile = 10)
    val segs = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.gz"))
    assert(segs.length == 3, s"25 records / cap 10 should roll 3 segments")
    assert(readBack(dir).size == 25)
  }

  test("a directory mixing plain and gzip-member segments reads as one archive") {
    val dir = tmp() + "/mixed"
    Sinks.writeWarcContent(contentFrame(0 until 10), dir)
    Sinks.writeWarcContentGzipMembers(contentFrame(10 until 20), dir)
    val all = readBack(dir)
    assert(all.size == 20 &&
      all.map(_._1) == (0 until 20).map(i => s"http://site.com/p$i").toSet)
  }
}
