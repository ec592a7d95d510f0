package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.schema.FetchUrl
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.{AvgOut, ScoreEvent}

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("moving average over a MemoryStream keeps the last-10 window per key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ScoreEvent]
    val query = StreamingOps
      .movingAverage(input.toDS())
      .writeStream.format("memory").queryName("mavg")
      .outputMode("append").start()
    try {
      input.addData((1 to 12).map(i => ScoreEvent("d1.com", i.toFloat, i.toLong)))
      input.addData(Seq(ScoreEvent("d2.com", 100f, 1L)))
      query.processAllAvailable()
      val rows = spark.table("mavg").as[AvgOut].collect()
      val d1 = rows.filter(_.pld == "d1.com").sortBy(_.nSamples)
      // first emission avg=1, tenth avg=(1..10)/10=5.5
      assert(d1.head.avgScore == 1.0f)
      assert(d1.exists(r => r.nSamples == 10 && math.abs(r.avgScore - 5.5f) < 1e-5))
      // 12th emission: window 3..12 -> avg 7.5
      assert(math.abs(d1.last.avgScore - 7.5f) < 1e-5)
      assert(rows.filter(_.pld == "d2.com").head.avgScore == 100f)
    } finally query.stop()
  }

  test("moving average state persists across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ScoreEvent]
    val query = StreamingOps
      .movingAverage(input.toDS())
      .writeStream.format("memory").queryName("mavg2")
      .outputMode("append").start()
    try {
      input.addData(Seq(ScoreEvent("d.com", 2f, 1L)))
      query.processAllAvailable()
      input.addData(Seq(ScoreEvent("d.com", 4f, 2L)))
      query.processAllAvailable()
      val rows = spark.table("mavg2").as[AvgOut].collect().sortBy(_.nSamples)
      assert(rows.map(_.avgScore).toSeq == Seq(2.0f, 3.0f)) // (2), (2+4)/2
    } finally query.stop()
  }

  test("politeness gate releases one URL per domain per delay window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FetchUrl]
    val query = StreamingOps
      .politenessGate(input.toDS(), eventTime = 1000L)
      .writeStream.format("memory").queryName("gate")
      .outputMode("append").start()
    try {
      input.addData(Seq(
        FetchUrl("http://d.com/a", "d.com", 2.0f, 500L),
        FetchUrl("http://d.com/b", "d.com", 1.0f, 500L),
        FetchUrl("http://e.com/x", "e.com", 1.0f, 500L)))
      query.processAllAvailable()
      val rows = spark.table("gate").collect()
        .map(r => r.getAs[String]("url") -> r.getAs[Boolean]("ready")).toMap
      assert(rows("http://d.com/a")) // best score released first
      assert(!rows("http://d.com/b")) // same domain, inside delay window
      assert(rows("http://e.com/x")) // other domain unaffected
    } finally query.stop()
  }

  test("windowed event rate with watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val df = input.toDF().toDF("ts", "pld")
    val query = StreamingOps.eventRate(spark, df)
      .writeStream.format("memory").queryName("rate")
      .outputMode("append").start()
    try {
      val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      def at(s: Int) = new java.sql.Timestamp(base.getTime + s * 1000L)
      input.addData(Seq((at(1), "d.com"), (at(5), "d.com"), (at(15), "d.com")))
      // advance watermark far enough to close the early windows
      input.addData(Seq((at(600), "d.com")))
      query.processAllAvailable()
      val rows = spark.table("rate")
        .select(col("window.start").cast("long").as("s"), col("n")).collect()
      assert(rows.nonEmpty)
      // the window covering 0-30s (starting at 1704067200 - slide offsets)
      // must have counted all three early events in some 30s window
      assert(rows.map(_.getAs[Long]("n")).max == 3)
    } finally query.stop()
  }

  test("warc + tsv sinks round-trip") {
    import spark.implicits._
    val fetched = Seq(
      ("http://d.com/a", "text/html", "<html>hello</html>", 1700000000000L),
      ("http://d.com/b", "text/html", "<html>world</html>", 1700000001000L)
    ).toDF("url", "contentType", "content", "fetchTimeMs")
    val dir = java.nio.file.Files.createTempDirectory("graft-warc").toString
    graft.sinks.Sinks.writeWarc(fetched, s"$dir/warc")
    val back = spark.read.text(s"$dir/warc").collect().map(_.getString(0))
    assert(back.count(_.startsWith("WARC/1.0")) == 2)
    assert(back.count(_.startsWith("WARC-Target-URI: ")) == 2)
    assert(back.exists(_ == "Content-Length: 18"))

    val parsed = Seq(("http://d.com/a", "line1\twith\ttabs\nand newline"))
      .toDF("url", "text")
    graft.sinks.Sinks.writeParsedTsv(parsed, s"$dir/tsv")
    val tsv = spark.read.text(s"$dir/tsv").collect().map(_.getString(0))
    assert(tsv.length == 1)
    assert(tsv.head == "http://d.com/a\tline1 with tabs and newline")
  }

  test("streaming dedup drops re-arrivals of the same fingerprint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val query = StreamingOps
      .dedupStream(
        input.toDS().toDF("ts", "doc_id", "text"), "text", "10 minutes")
      .writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      def t(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
      input.addData(Seq(
        (t(0), 1L, "alpha text"), (t(1), 2L, "beta text"),
        (t(2), 3L, "alpha text"))) // dup of doc 1 in the same batch
      query.processAllAvailable()
      input.addData(Seq(
        (t(3), 4L, "alpha text"), // dup across batches, inside horizon
        (t(4), 5L, "gamma text")))
      query.processAllAvailable()
      val got = spark.table("sdedup").select("doc_id").as[Long]
        .collect().toSet
      assert(got == Set(1L, 2L, 5L), s"got $got")
    } finally query.stop()
  }

  test("streaming sessionization: gaps split sessions, watermark closes them") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val query = StreamingOps
      .sessionizeStream(
        input.toDS().toDF("ts", "user_id"), "user_id",
        gap = "30 seconds", horizon = "10 seconds")
      .writeStream.format("memory").queryName("ssess")
      .outputMode("append").start()
    try {
      def t(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
      // user 1: two bursts 100 s apart (2 sessions); user 2: one event
      input.addData(Seq((t(0), 1L), (t(10), 1L), (t(110), 1L),
        (t(5), 2L)))
      query.processAllAvailable()
      // advance the watermark far enough to close everything
      input.addData(Seq((t(500), 9L)))
      query.processAllAvailable()
      input.addData(Seq((t(900), 9L)))
      query.processAllAvailable()
      val got = spark.table("ssess")
        .select(col("user_id"), col("n_events"),
          unix_millis(col("session_window.start")).as("s"))
        .as[(Long, Long, Long)].collect().toSet
      val base = 1700000000000L
      assert(got.contains((1L, 2L, base)), s"got $got")         // burst 1
      assert(got.contains((1L, 1L, base + 110000L)), s"got $got") // burst 2
      assert(got.contains((2L, 1L, base + 5000L)), s"got $got")
    } finally query.stop()
  }

  test("sessionization: batch and stream agree field-for-field on a replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L
    def t(s: Long) = new java.sql.Timestamp(base + s * 1000)
    // includes an EXACT-gap pair (user 3: events 30 s apart at gap=30 s)
    // — session_window's merging iterator joins ADJACENT windows, so
    // they stay in ONE session; the batch form's strict > gapMs split
    // must keep them together identically
    val events = Seq(
      (t(0), 1L), (t(10), 1L), (t(110), 1L), // 2 sessions
      (t(5), 2L),                            // singleton
      (t(0), 3L), (t(30), 3L), (t(45), 3L))  // exact gap: ONE session
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val query = StreamingOps
      .sessionizeStream(
        input.toDS().toDF("ts", "user_id"), "user_id",
        gap = "30 seconds", horizon = "10 seconds")
      .writeStream.format("memory").queryName("ssess_parity")
      .outputMode("append").start()
    val streamed = try {
      input.addData(events)
      query.processAllAvailable()
      input.addData(Seq((t(500), 9L)))   // watermark push: close all
      query.processAllAvailable()
      input.addData(Seq((t(900), 9L)))
      query.processAllAvailable()
      spark.table("ssess_parity")
        .filter(col("user_id") =!= 9L)
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("duration_ms"), col("n_events"))
        .as[(Long, Long, Long, Long, Long)].collect().toSet
    } finally query.stop()
    val batch = graft.queries.Relational.sessionize(
        events.toDF("ts", "user_id")
          .select(col("user_id"), unix_millis(col("ts")).as("ets"),
            col("ts").as("tie")),
        "user_id", "ets", "tie", gapMs = 30000L)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("duration_ms"), col("n_events"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch, s"stream $streamed\nbatch $batch")
    // the exact-gap events really did land in one 3-event session
    assert(batch.filter(_._1 == 3L).map(_._5) == Set(3L),
      s"user-3 sessions: $batch")
  }

  test("count-min sketch runs unchanged on a stream, converging to the batch grid") {
    // the sketch is projection + one aggregation, so Structured Streaming
    // maintains it incrementally (complete mode); state is the constant
    // depth x width grid — the always-on frequency monitor shape
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val query = graft.operators.TextOps.countMinSketch(
      input.toDS().toDF("doc_id", "text"), "text")
      .writeStream.format("memory").queryName("scms")
      .outputMode("complete").start()
    try {
      val batch1 = Seq((1L, "alpha beta alpha"), (2L, "beta gamma"))
      val batch2 = Seq((3L, "alpha delta epsilon"))
      input.addData(batch1)
      query.processAllAvailable()
      input.addData(batch2)
      query.processAllAvailable()
      val streamed = spark.table("scms").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val batch = graft.operators.TextOps.countMinSketch(
        (batch1 ++ batch2).toDF("doc_id", "text"), "text")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed == batch, s"stream $streamed != batch $batch")
    } finally query.stop()
  }

  test("streaming ingest pipeline: quality gate + lang-id + PII scrub + dedup compose on a stream") {
    // the always-on training-data ingest path: the BATCH operators
    // (quality features, language id, PII scrub — all projections) run
    // unchanged under Structured Streaming, with dedupStream's
    // watermarked state as the only stateful stage. This is the
    // Spark-first payoff the reference's separate stream topology needs
    // custom operators for.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val docs = input.toDS().toDF("ts", "doc_id", "text")
    val en = "the quick study describes the data and the careful analysis plainly"
    val gated = docs
      .withColumn("pred_lang", graft.operators.TextOps.predictLangUdf(col("text")))
      .withColumn("n_tokens",
        graft.operators.TextOps.preTokenCount(col("text")))
      .filter(col("n_tokens") >= 5 && col("pred_lang") === "en")
      .withColumn("clean_text",
        expr(graft.operators.TextOps.scrubPiiSql("text")))
    val query = StreamingOps
      .dedupStream(gated, "clean_text", "10 minutes")
      .writeStream.format("memory").queryName("singest")
      .outputMode("append").start()
    try {
      def t(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
      input.addData(Seq(
        (t(0), 1L, s"$en contact bob@example.com for details"),
        (t(1), 2L, "le chat et le chien sont dans la maison avec le garcon"),
        (t(2), 3L, "too short")))
      query.processAllAvailable()
      input.addData(Seq(
        // same text as doc 1 after scrubbing (different email) -> dup
        (t(3), 4L, s"$en contact alice@other.org for details"),
        (t(4), 5L, s"$en with genuinely new content appended here")))
      query.processAllAvailable()
      val out = spark.table("singest")
        .select("doc_id", "clean_text").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      // doc 2 fails lang-id, doc 3 fails length, doc 4 dedups against 1
      assert(out.keySet == Set(1L, 5L), s"got ${out.keySet}")
      assert(!out(1L).contains("bob@example.com"),
        s"PII not scrubbed: ${out(1L)}")
    } finally query.stop()
  }

  test("warc source parses written records back, octet-exact") {
    import spark.implicits._
    val fetched = Seq(
      // non-ASCII body: Content-Length counts UTF-8 octets, not chars
      ("http://d.com/u", "text/html; charset=utf-8", "héllo wörld ✓", 1700000000000L),
      // body containing a blank line — only octet counting parses past it
      ("http://d.com/b", "text/plain", "para one\r\n\r\npara two", 1700000001000L),
      ("http://d.com/c", "text/html", "<html>plain</html>", 1700000002000L)
    ).toDF("url", "contentType", "content", "fetchTimeMs")
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-rt").toString
    graft.sinks.Sinks.writeWarc(fetched, dir)
    val back = graft.sources.WarcSource.read(spark, dir)
      .collect()
      .map(r => r.getAs[String]("url") -> r.getAs[String]("content"))
      .toMap
    assert(back.size == 3)
    assert(back("http://d.com/u") == "héllo wörld ✓")
    assert(back("http://d.com/b") == "para one\r\n\r\npara two")
    assert(back("http://d.com/c") == "<html>plain</html>")
  }
}
class StreamingCrawlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("streaming crawl folds the frontier across seed micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val graph = graft.crawl.WebGraph(
      "d1.com" -> Seq("d1.com/a"), "d1.com/a" -> Seq.empty,
      "d2.com" -> Seq("d2.com/b"), "d2.com/b" -> Seq.empty)
    val fetcher = new graft.crawl.WebGraphFetcher(graph)
    val robots = new graft.crawl.MapRobotsFetcher(Map.empty)
    val results = scala.collection.mutable.ArrayBuffer.empty[graft.crawl.CrawlResult]

    val input = MemoryStream[(String, Float)]
    val query = graft.streaming.StreamingCrawl.start(
      spark, input.toDF().toDF("url", "score"), fetcher, robots,
      graft.crawl.CrawlConfig(maxRounds = 10),
      r => results.synchronized { results += r })
    try {
      input.addData(Seq(("d1.com", 1.0f)))
      query.processAllAvailable()
      input.addData(Seq(("d2.com", 1.0f), ("d1.com", 1.0f)))
      query.processAllAvailable()
      val frontier = results.last.frontier.collect()
        .map(r => r.getAs[String]("url") -> r.getAs[String]("status")).toMap
      assert(frontier("http://d1.com/") == "FETCHED")
      assert(frontier("http://d2.com/") == "FETCHED")
      assert(frontier("http://d2.com/b") == "FETCHED")
      // second batch must not refetch d1 pages (already FETCHED in frontier)
      val refetched = results.last.journal
        .filter(col("stage") === "fetch" && col("url").startsWith("http://d1.com"))
        .count()
      assert(refetched == 0, "frontier state leaked between micro-batches")
    } finally query.stop()
  }

  test("dripped seed stream paces seeds and crawls them all exactly once") {
    import graft.crawl._
    val graph = WebGraph(
      "s1.com" -> Seq.empty, "s2.com" -> Seq.empty, "s3.com" -> Seq.empty)
    FetchLog.urls.clear()
    val fetcher = new Fetcher {
      val base = new WebGraphFetcher(graph)
      override def fetch(url: String): FetchedPage = {
        FetchLog.urls.add(url); base.fetch(url)
      }
    }
    val seeds = Seq(("s1.com", 1.0f), ("s2.com", 1.0f), ("s3.com", 1.0f))
    val results = scala.collection.mutable.ArrayBuffer.empty[CrawlResult]
    val query = graft.streaming.StreamingCrawl.start(
      spark,
      graft.streaming.StreamingCrawl.drippedSeedStream(spark, seeds, 50),
      fetcher, new MapRobotsFetcher(Map.empty),
      CrawlConfig(maxRounds = 5),
      r => results.synchronized { results += r })
    try {
      val deadline = System.currentTimeMillis() + 60000
      def fetchedAll(): Boolean = results.synchronized {
        results.lastOption.exists { r =>
          val f = r.frontier.filter(col("status") === "FETCHED").count()
          f >= 3
        }
      }
      while (!fetchedAll() && System.currentTimeMillis() < deadline)
        Thread.sleep(250)
      assert(fetchedAll(), "dripped seeds never all crawled")
      // paced, deduped: each seed fetched exactly once despite re-merges
      import scala.jdk.CollectionConverters._
      val pageFetches = FetchLog.urls.asScala.toSeq
        .filterNot(_.endsWith("/robots.txt"))
      assert(pageFetches.sorted == Seq(
        "http://s1.com/", "http://s2.com/", "http://s3.com/"),
        s"unexpected fetch set: $pageFetches")
    } finally query.stop()
  }
}
