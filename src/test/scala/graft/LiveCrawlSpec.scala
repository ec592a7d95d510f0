package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.crawl._
import graft.schema.{CrawlStateUrl, FetchStatus => FS}
import graft.streaming.{LiveCrawl, UrlDbProcessor}

/** The live streaming loop end-to-end: seeds pushed into the feedback
  * channel flow through the UrlDbProcessor scheduler (keyed state, pacing
  * timers, in-flight caps), out as FetchUrls, through the distributed
  * fetch/parse micro-batch stage, and back into the channel as status
  * updates + outlink sightings — until the web graph is drained. The
  * streaming analog of the reference's CrawlTopologyTest broad crawl.
  */
class LiveCrawlSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s
  }

  test("live loop drains a web graph through scheduler + fetch + feedback") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val graph = WebGraph(
      "l1.com" -> Seq("l1.com/a", "l1.com/missing"),
      "l1.com/a" -> Seq("l1.com/b"),
      "l1.com/b" -> Seq.empty,
      "l2.com" -> Seq.empty)
    val robots = new MapRobotsFetcher(Map(
      "http://l1.com/robots.txt" -> "User-agent: *\nDisallow: /blockedpath\n"))

    val input = MemoryStream[UrlDbProcessor.Envelope]
    val channel = LiveCrawl.FeedbackChannel.memory(input)
    val terminal = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val query = LiveCrawl.start(
      spark, input.toDS(), channel,
      new WebGraphFetcher(graph), robots,
      CrawlConfig(), checkIntervalMs = 50, maxPerFiring = 2,
      onBatch = rows => rows.foreach { u =>
        if (FS.isFetchedIsh(u.status)) terminal.put(u.url, u.status)
      })
    try {
      channel.push(Seq(
        UrlDbProcessor.stateInput(
          CrawlStateUrl("http://l1.com/", "l1.com", FS.UNFETCHED, 1L, 1.0f, 0L)),
        UrlDbProcessor.stateInput(
          CrawlStateUrl("http://l2.com/", "l2.com", FS.UNFETCHED, 1L, 1.0f, 0L))))
      val want = Set(
        "http://l1.com/", "http://l1.com/a", "http://l1.com/b",
        "http://l1.com/missing", "http://l2.com/")
      import scala.jdk.CollectionConverters._
      val deadline = System.currentTimeMillis() + 120000
      while (!want.subsetOf(terminal.keySet().asScala.toSet) &&
          System.currentTimeMillis() < deadline)
        Thread.sleep(250)
      val got = terminal.asScala.toMap
      assert(want.subsetOf(got.keySet),
        s"loop did not drain the graph: $got")
      assert(got("http://l1.com/") == FS.FETCHED)
      assert(got("http://l1.com/b") == FS.FETCHED,
        "two-hop outlink must flow back through the channel and fetch")
      assert(got("http://l1.com/missing") == FS.HTTP_NOTFOUND)
      assert(got("http://l2.com/") == FS.FETCHED)
    } finally query.stop()
  }

  test("fetchParseBatch feeds a redirect target back as an UNFETCHED sighting") {
    import spark.implicits._
    val graph = WebGraph("r.com/new" -> Seq.empty)
    val fetcher = new WebGraphFetcher(
      graph, redirects = Map("http://r.com/old" -> "http://r.com/new"))
    val batch = Seq(("http://r.com/old", "r.com", 1.0f))
      .toDF("url", "pld", "score")
    val rows = LiveCrawl.fetchParseBatch(
      spark, batch, fetcher, new MapRobotsFetcher(Map.empty),
      CrawlConfig(), runScope = "redir-spec").collect()
    val byStatus = rows.groupBy(_.status)
    assert(byStatus(FS.HTTP_MOVED).map(_.url).toSeq == Seq("http://r.com/old"))
    val sightings = byStatus.getOrElse(FS.UNFETCHED, Array.empty)
    assert(sightings.map(_.url).toSeq == Seq("http://r.com/new"),
      s"redirect target must come back as a sighting: ${rows.toSeq}")
    assert(sightings.head.pld == "r.com")
  }

  test("a throwing fetcher becomes an ERROR_IOEXCEPTION status row, not a query failure") {
    import spark.implicits._
    val boom = new Fetcher {
      override def fetch(url: String): FetchedPage =
        throw new java.io.IOException("connection reset")
    }
    val batch = Seq(("http://down.com/", "down.com", 1.0f))
      .toDF("url", "pld", "score")
    val rows = LiveCrawl.fetchParseBatch(
      spark, batch, boom, new MapRobotsFetcher(Map.empty),
      CrawlConfig(), runScope = "boom-spec").collect()
    assert(rows.map(u => u.url -> u.status).toSeq ==
      Seq("http://down.com/" -> FS.ERROR_IOEXCEPTION))
  }

  test("file channel: loop runs distributed (no observer collect) and drains the graph") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-feedback").toString
    val graph = WebGraph(
      "f1.com" -> Seq("f1.com/a"),
      "f1.com/a" -> Seq.empty)
    // retainConsumed: this spec reads the dir as a journal to observe
    // progress; retention (the production default) has its own spec below
    val (input, channel) =
      LiveCrawl.FeedbackChannel.file(spark, dir, retainConsumed = true)
    val query = LiveCrawl.start(
      spark, input, channel,
      new WebGraphFetcher(graph), new MapRobotsFetcher(Map.empty),
      CrawlConfig(), checkIntervalMs = 50, maxPerFiring = 2)
    try {
      channel.push(Seq(UrlDbProcessor.stateInput(
        CrawlStateUrl("http://f1.com/", "f1.com", FS.UNFETCHED, 1L, 1.0f, 0L))))
      val want = Set("http://f1.com/", "http://f1.com/a")
      def fetched(): Set[String] =
        spark.read.schema(
          org.apache.spark.sql.Encoders.product[UrlDbProcessor.Envelope].schema)
          .parquet(dir)
          .where($"state.status" === FS.FETCHED)
          .select($"state.url").as[String].collect().toSet
      val deadline = System.currentTimeMillis() + 120000
      while (!want.subsetOf(fetched()) &&
          System.currentTimeMillis() < deadline)
        Thread.sleep(250)
      assert(want.subsetOf(fetched()),
        s"file-channel loop did not drain the graph: ${fetched()}")
    } finally query.stop()
  }

  test("file channel + checkpoint: killed crawl resumes with zero lost URLs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-feedback").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    // a chain: each hop needs a full loop round-trip, so the first kill
    // always lands mid-crawl with sightings still unconsumed in the dir
    val graph = WebGraph(
      "rz.com" -> Seq("rz.com/a"),
      "rz.com/a" -> Seq("rz.com/b"),
      "rz.com/b" -> Seq("rz.com/c"),
      "rz.com/c" -> Seq("rz.com/d", "rz.com/gone"),
      "rz.com/d" -> Seq.empty)
    val fetcher = new WebGraphFetcher(graph)
    val robots = new MapRobotsFetcher(Map.empty)
    val envSchema =
      org.apache.spark.sql.Encoders.product[UrlDbProcessor.Envelope].schema
    def terminal(): Map[String, String] =
      spark.read.schema(envSchema).parquet(dir)
        .select($"state.url", $"state.status").as[(String, String)]
        .collect().filter(x => FS.isFetchedIsh(x._2)).toMap

    val (input1, channel1) =
      LiveCrawl.FeedbackChannel.file(spark, dir, retainConsumed = true)
    val q1 = LiveCrawl.start(
      spark, input1, channel1, fetcher, robots,
      CrawlConfig(), checkIntervalMs = 50, maxPerFiring = 1,
      checkpointDir = Some(ckpt), fetchTimeoutMs = 3000)
    try {
      channel1.push(Seq(UrlDbProcessor.stateInput(
        CrawlStateUrl("http://rz.com/", "rz.com", FS.UNFETCHED, 1L, 1.0f, 0L))))
      // wait for the crawl to be demonstrably mid-flight, then kill it
      val deadline = System.currentTimeMillis() + 60000
      while (terminal().isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(terminal().nonEmpty, "first run never fetched anything")
    } finally q1.stop()
    q1.awaitTermination()
    val afterKill = terminal().keySet
    val all = Set("http://rz.com/", "http://rz.com/a", "http://rz.com/b",
      "http://rz.com/c", "http://rz.com/d", "http://rz.com/gone")
    assert(!all.subsetOf(afterKill), "kill landed too late to prove resume")

    // same dir + same checkpoint = restored scheduler state + replay of
    // unconsumed feedback files; stranded FETCHING entries revert via the
    // fetch timeout. Zero lost URLs = every page reaches a terminal state.
    val (input2, channel2) =
      LiveCrawl.FeedbackChannel.file(spark, dir, retainConsumed = true)
    val q2 = LiveCrawl.start(
      spark, input2, channel2, fetcher, robots,
      CrawlConfig(), checkIntervalMs = 50, maxPerFiring = 1,
      checkpointDir = Some(ckpt), fetchTimeoutMs = 3000)
    try {
      val deadline = System.currentTimeMillis() + 120000
      while (!all.subsetOf(terminal().keySet) &&
          System.currentTimeMillis() < deadline)
        Thread.sleep(250)
      val got = terminal()
      assert(all.subsetOf(got.keySet),
        s"resume lost URLs: missing ${all -- got.keySet}, got $got")
      assert(got("http://rz.com/d") == FS.FETCHED,
        "the chain's tail must be fetched by the resumed run")
      assert(got("http://rz.com/gone") == FS.HTTP_NOTFOUND)
    } finally q2.stop()
  }

  test("stopping the live query clears its robots-cache scope") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val graph = WebGraph("s.com" -> Seq.empty)
    val robots = new MapRobotsFetcher(Map(
      "http://s.com/robots.txt" -> "User-agent: *\nDisallow: /private\n"))
    val input = MemoryStream[UrlDbProcessor.Envelope]
    val channel = LiveCrawl.FeedbackChannel.memory(input)
    val scope = "scope-cleanup-spec"
    val fetched = new java.util.concurrent.atomic.AtomicBoolean(false)
    val query = LiveCrawl.start(
      spark, input.toDS(), channel,
      new WebGraphFetcher(graph), robots,
      CrawlConfig(), checkIntervalMs = 50, maxPerFiring = 2,
      onBatch = rows =>
        if (rows.exists(u => FS.isFetchedIsh(u.status))) fetched.set(true),
      scope = scope)
    try {
      channel.push(Seq(UrlDbProcessor.stateInput(
        CrawlStateUrl("http://s.com/", "s.com", FS.UNFETCHED, 1L, 1.0f, 0L))))
      val deadline = System.currentTimeMillis() + 60000
      while (!fetched.get() && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(fetched.get(), "seed never fetched")
      assert(RobotsCache.scopeSize(scope) > 0,
        "robots lookup should have populated the run's scope")
    } finally query.stop()
    query.awaitTermination()
    // the termination listener fires asynchronously
    val deadline = System.currentTimeMillis() + 30000
    while (RobotsCache.scopeSize(scope) > 0 &&
        System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    assert(RobotsCache.scopeSize(scope) == 0,
      "query termination must clear the run's robots scope")
  }

  test("file channel retention: consumed feedback files are pruned, file count stays flat") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-retention").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-retention-ckpt").toString
    def liveFiles(): Int =
      Option(new java.io.File(dir).listFiles()).map(
        _.count(f => f.isFile && f.getName.endsWith(".parquet"))).getOrElse(0)
    def env(i: Int) = UrlDbProcessor.stateInput(CrawlStateUrl(
      s"http://ret.com/$i", "ret.com", FS.UNFETCHED, 1L, 1.0f, 0L))

    // the channel pair is the unit under test: a trivial consumer stands
    // in for the crawl loop so the spec measures only channel retention
    val (input, channel) = LiveCrawl.FeedbackChannel.file(spark, dir)
    val consumed = new java.util.concurrent.atomic.AtomicLong(0)
    val query = input.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[UrlDbProcessor.Envelope],
          _: Long) => consumed.addAndGet(b.count()); () }
      .start()
    try {
      // a long-running crawl's shape in miniature: many small appended
      // batches over time. Flatness = the live directory never
      // accumulates anywhere near the total file count written.
      val waves = 60
      var maxLive = 0
      (1 to waves).foreach { i =>
        channel.push(Seq(env(i)))
        maxLive = math.max(maxLive, liveFiles())
        if (i % 10 == 0) query.processAllAvailable()
      }
      query.processAllAvailable()
      assert(consumed.get() == waves,
        s"all pushed rows must be consumed exactly once: ${consumed.get()}")
      // the cleaner runs async per committed batch; poll for drain
      val deadline = System.currentTimeMillis() + 60000
      while (liveFiles() > 5 && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      assert(liveFiles() <= 5,
        s"consumed files must be pruned: ${liveFiles()} still live")
      assert(maxLive < waves,
        s"file count must stay flat while consuming (peaked at $maxLive/$waves)")
    } finally query.stop()

    // restart on the same checkpoint: retention must not break resume
    // semantics — pending (unconsumed) files replay, nothing re-delivers
    val (input2, channel2) = LiveCrawl.FeedbackChannel.file(spark, dir)
    channel2.push((61 to 70).map(env))
    val consumed2 = new java.util.concurrent.atomic.AtomicLong(0)
    val q2 = input2.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[UrlDbProcessor.Envelope],
          _: Long) => consumed2.addAndGet(b.count()); () }
      .start()
    try {
      q2.processAllAvailable()
      assert(consumed2.get() == 10,
        s"restart must deliver only the pending rows once: ${consumed2.get()}")
    } finally q2.stop()
  }
}
