package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.crawl.SnapshotDelta

/** Cross-round snapshot diffing: the four per-URL verdicts between two
  * crawl rounds, plus the summary and recrawl-feed projections.
  */
class SnapshotDeltaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def frames = {
    import spark.implicits._
    val oldSnap = Seq(
      ("http://a.com/1", "d1", 100L),  // unchanged
      ("http://a.com/2", "d2", 100L),  // changed in new
      ("http://a.com/3", "d3", 100L))  // gone in new
      .toDF("url", "digest", "ts")
    val newSnap = Seq(
      ("http://a.com/1", "d1", 200L),  // same digest, newer ts
      ("http://a.com/2", "d2x", 200L),
      ("http://a.com/4", "d4", 200L))  // added
      .toDF("url", "digest", "ts")
    (oldSnap, newSnap)
  }

  test("delta assigns all four verdicts and carries both sides' fields") {
    val (o, n) = frames
    val got = SnapshotDelta.delta(o, n, "url", "digest", "ts")
      .collect()
      .map(r => r.getString(0) -> (r.getString(1),
        Option(r.get(2)), Option(r.get(3)),
        Option(r.get(4)), Option(r.get(5))))
      .toMap
    assert(got("http://a.com/1") ==
      (("UNCHANGED", Some("d1"), Some("d1"), Some(100L), Some(200L))))
    assert(got("http://a.com/2") ==
      (("CHANGED", Some("d2"), Some("d2x"), Some(100L), Some(200L))))
    assert(got("http://a.com/3") ==
      (("GONE", Some("d3"), None, Some(100L), None)))
    assert(got("http://a.com/4") ==
      (("ADDED", None, Some("d4"), None, Some(200L))))
  }

  test("deltaStats counts per verdict; toIngest keeps ADDED+CHANGED") {
    val (o, n) = frames
    val d = SnapshotDelta.delta(o, n, "url", "digest", "ts")
    val stats = SnapshotDelta.deltaStats(d)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats == Map(
      "UNCHANGED" -> 1L, "CHANGED" -> 1L, "GONE" -> 1L, "ADDED" -> 1L))
    val feed = SnapshotDelta.toIngest(d)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2), r.getLong(3))).toSet
    assert(feed == Set(
      ("http://a.com/2", "CHANGED", "d2x", 200L),
      ("http://a.com/4", "ADDED", "d4", 200L)))
  }

  test("fromCdx: whole-archive diff of two crawl rounds via their own " +
    "CDX sidecars (writer digest = change fingerprint)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir =
      java.nio.file.Files.createTempDirectory("graft-snapdelta").toString
    def writeRound(
        n: Int, pages: Seq[(String, String)], ts: Long): String = {
      val df = pages.toDF("url", "body")
        .select(col("url"), lit("text/html").as("contentType"),
          encode(col("body"), "UTF-8").as("content"),
          lit(ts).as("fetchTimeMs"))
      graft.sinks.Sinks.writeWarc(df, s"$dir/r$n/warc",
        maxRecordsPerFile = 2)
      graft.sinks.Sinks.writeCdx(spark, s"$dir/r$n/warc", s"$dir/r$n/cdx",
        shards = 2)
      s"$dir/r$n/cdx"
    }
    val c1 = writeRound(1, Seq(
      "http://a.com/1" -> "body one",
      "http://a.com/2" -> "body two",
      "http://b.com/3" -> "body three"), 1700000000000L)
    val c2 = writeRound(2, Seq(
      "http://a.com/1" -> "body one",            // identical content
      "http://a.com/2" -> "body two CHANGED",
      "http://c.com/4" -> "body four"), 1700000600000L)
    val d = graft.crawl.SnapshotDelta.fromCdx(
      graft.sources.CdxLookup.allEntries(spark, c1),
      graft.sources.CdxLookup.allEntries(spark, c2))
    val surt = graft.functions.UrlFunctions.surtKey _
    val got = d.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map(
      surt("http://a.com/1") -> "UNCHANGED",
      surt("http://a.com/2") -> "CHANGED",
      surt("http://b.com/3") -> "GONE",
      surt("http://c.com/4") -> "ADDED"))
    // the recrawl feed carries exactly the new/changed keys — what the
    // next round fetches; UNCHANGED re-captures cost nothing downstream
    val feed = graft.crawl.SnapshotDelta.toIngest(d)
      .select("key").as[String].collect().toSet
    assert(feed == Set(surt("http://a.com/2"), surt("http://c.com/4")))
  }

  test("snapshots written bucketed on the key diff with ZERO Exchange " +
    "(alias-aware partitioning survives delta's key projection)") {
    import spark.implicits._
    val tag = java.util.UUID.randomUUID.toString.replace("-", "")
    val base = java.nio.file.Files
      .createTempDirectory("graft_snap_bucketed_").toString
    def snap(n: Int, rows: Seq[(String, String, Long)]): String = {
      val t = s"snap_${n}_$tag"
      graft.operators.CorpusLayout.writeBucketed(
        rows.toDF("url", "digest", "ts"), t, s"$base/$n", "url", 4,
        Seq("url"))
      t
    }
    val t1 = snap(1, (0 until 400).map(i =>
      (s"http://s.com/$i", s"d$i", 100L)))
    val t2 = snap(2, (0 until 400).map(i =>
      (s"http://s.com/$i", if (i % 5 == 0) s"d${i}x" else s"d$i", 200L)))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val d = SnapshotDelta.delta(
        spark.table(t1), spark.table(t2), "url", "digest", "ts")
      val rows = d.collect()
      val stats = rows.groupBy(_.getString(1)).view.mapValues(_.length)
      assert(stats.toMap == Map("CHANGED" -> 80, "UNCHANGED" -> 320))
      // executed (post-AQE) plan of the delta itself
      val plan = d.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(!plan.contains("Exchange"),
        s"bucketed snapshot delta shuffled:\n${plan.take(3000)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("disjoint snapshots: everything is ADDED or GONE") {
    import spark.implicits._
    val o = Seq(("u1", "a", 1L)).toDF("url", "digest", "ts")
    val n = Seq(("u2", "b", 2L)).toDF("url", "digest", "ts")
    val got = SnapshotDelta.delta(o, n, "url", "digest", "ts")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("u1" -> "GONE", "u2" -> "ADDED"))
  }
}
