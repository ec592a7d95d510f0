package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.schema.{CrawlStateUrl, FetchUrl, FetchStatus => FS}
import graft.streaming.UrlDbProcessor

/** Drives the transformWithState crawl-DB processor with a MemoryStream —
  * the Spark-4 analog of the reference's UrlDBFunctionTest harness. The
  * processor re-arms its own processing-time timer, so the query is never
  * idle: assertions poll the sink with a deadline instead of
  * processAllAvailable (which waits for an idle stream).
  */
class UrlDbProcessorSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    // transformWithState requires the RocksDB state store provider
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s
  }

  test("merges sightings per domain and emits best UNFETCHED on timers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CrawlStateUrl]
    val out = UrlDbProcessor.schedule(
      input.toDS(), checkIntervalMs = 100, maxPerFiring = 1)
    val query = out.writeStream
      .format("memory").queryName("urldb")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      input.addData(Seq(
        CrawlStateUrl("http://d.com/hi", "d.com", FS.UNFETCHED, 1L, 5.0f, 0L),
        CrawlStateUrl("http://d.com/lo", "d.com", FS.UNFETCHED, 1L, 1.0f, 0L),
        // duplicate sighting of /hi: scores must sum (5 + 2 = 7)
        CrawlStateUrl("http://d.com/hi", "d.com", FS.UNFETCHED, 2L, 2.0f, 0L)))
      def emitted(): Seq[FetchUrl] =
        spark.table("urldb").as[FetchUrl].collect().toSeq
      val deadline = System.currentTimeMillis() + 60000
      while (emitted().length < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(250)
      val all = emitted()
      assert(all.length >= 2, s"timers did not fire twice: $all")
      // best-scored URL first, with the merged (summed) score
      assert(all.head.url == "http://d.com/hi")
      assert(math.abs(all.head.score - 7.0f) < 1e-6)
      // second firing emits the next-best URL exactly once (first is QUEUED)
      assert(all(1).url == "http://d.com/lo")
      assert(all.map(_.url).distinct.length == all.length,
        s"a QUEUED url was re-emitted: $all")
    } finally query.stop()
  }

  test("checkIntervalForDomain: score-proportional cadence with clamps") {
    def iv(s: Option[Float]) =
      UrlDbProcessor.checkIntervalForDomain(s, 200L, 1.0f, 1L, 1000L)
    assert(iv(None) == 200L, "unscored domain ticks at base")
    assert(iv(Some(1.0f)) == 200L)
    assert(iv(Some(10.0f)) == 20L, "hot domain ticks 10x faster")
    assert(iv(Some(0.2f)) == 1000L, "cold domain clamps at max")
    assert(iv(Some(0.0f)) == 1000L, "zero score uses the 0.01 floor + clamp")
    assert(iv(Some(1000.0f)) == 1L, "floor clamp")
    // the max clamp may not cap the configured base cadence itself
    assert(UrlDbProcessor.checkIntervalForDomain(None, 5000L, 1.0f, 1L, 1000L)
      == 5000L, "a 5s politeness base must stay 5s for unscored domains")
  }

  test("domain scores modulate timer cadence: hot domain drains faster") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UrlDbProcessor.Envelope]
    // fast.com: score 10 -> interval clamps to base/10 = 20ms;
    // slow.com: score 0.2 -> interval 1000ms (clamped max)
    val out = UrlDbProcessor.scheduleWithScores(
      input.toDS(), checkIntervalMs = 200, maxPerFiring = 1)
    val query = out.writeStream
      .format("memory").queryName("urldb_paced")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try {
      val urls = (1 to 40).flatMap { i =>
        Seq(
          UrlDbProcessor.stateInput(CrawlStateUrl(
            s"http://fast.com/p$i", "fast.com", FS.UNFETCHED, 1L, 1.0f, 0L)),
          UrlDbProcessor.stateInput(CrawlStateUrl(
            s"http://slow.com/p$i", "slow.com", FS.UNFETCHED, 1L, 1.0f, 0L)))
      }
      input.addData(urls ++ Seq(
        UrlDbProcessor.scoreInput(graft.schema.DomainScore("fast.com", 10.0f)),
        UrlDbProcessor.scoreInput(graft.schema.DomainScore("slow.com", 0.2f))))
      def counts(): Map[String, Int] =
        spark.table("urldb_paced").as[FetchUrl].collect()
          .groupBy(_.pld).view.mapValues(_.length).toMap
      val deadline = System.currentTimeMillis() + 60000
      while (counts().getOrElse("fast.com", 0) < 8 &&
        System.currentTimeMillis() < deadline)
        Thread.sleep(250)
      val c = counts()
      assert(c.getOrElse("fast.com", 0) >= 8,
        s"hot domain never drained: $c")
      // micro-batch granularity quantizes timers (an overdue timer fires
      // once per batch), so under load both cadences degrade toward the
      // batch rate — the hot domain can never fall BEHIND the cold one
      assert(c.getOrElse("fast.com", 0) >= c.getOrElse("slow.com", 0),
        s"hot domain fell behind: $c")
    } finally query.stop()
  }

  test("scanForFiring returns exactly the global top-k UNFETCHED, best first") {
    val rng = new scala.util.Random(42)
    val entries = Array.tabulate(1000) { i =>
      val st = i % 7 match {
        case 0 => FS.FETCHED
        case 1 => FS.QUEUED
        case _ => FS.UNFETCHED
      }
      (i.toLong, CrawlStateUrl(s"http://k.com/p$i", "k.com", st, 1L,
        rng.nextInt(100).toFloat, 0L))
    }
    val (queued, best, _) = UrlDbProcessor.scanForFiring(entries.iterator, 5)
    assert(queued.length == entries.count(_._2.status == FS.QUEUED))
    val expected = entries.filter(_._2.status == FS.UNFETCHED)
      .sortBy { case (_, s) => (-s.score, s.url) }.take(5).map(_._1).toSeq
    assert(best.map(_._1).toSeq == expected)
  }

  test("timer scan holds the 200 ms cadence budget on a 1M-URL domain") {
    // the reference's AVERAGE_DOMAIN_CHECK_INTERVAL budget
    // (UrlDBFunction.java:58): selection itself must be far under it —
    // the previous sort-everything materialized and sorted all 1M rows
    val entries = Array.tabulate(1000000) { i =>
      (i.toLong, CrawlStateUrl(s"http://big.com/p$i", "big.com",
        if (i % 50 == 0) FS.FETCHED else FS.UNFETCHED, 1L,
        (i % 1000).toFloat, 0L))
    }
    UrlDbProcessor.scanForFiring(entries.iterator, 10) // warm JIT
    val t0 = System.nanoTime()
    val (_, best, _) = UrlDbProcessor.scanForFiring(entries.iterator, 10)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(best.length == 10)
    assert(best.forall(_._2.score == 999.0f), "must find the top stratum")
    assert(ms < 200, f"1M-entry scan blew the cadence budget: $ms%.0f ms")
    info(f"1M-entry bounded scan: $ms%.1f ms")
  }

  test("in-flight cap blocks emissions until terminal feedback retires them") {
    // mirrors UrlDBFunctionTest.java:117 (emit FETCHING → feed back
    // FETCHED → next wave emits): maxInFlight=2, four URLs, no feedback
    // → exactly 2 emitted; FETCHED feedback for both → the other 2 follow
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CrawlStateUrl]
    val out = UrlDbProcessor.schedule(
      input.toDS(), checkIntervalMs = 50, maxPerFiring = 2, maxInFlight = 2)
    val query = out.writeStream
      .format("memory").queryName("urldb_cap")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try {
      input.addData((1 to 4).map(i =>
        CrawlStateUrl(s"http://cap.com/p$i", "cap.com", FS.UNFETCHED,
          1L, i.toFloat, 0L)))
      def emitted(): Seq[FetchUrl] =
        spark.table("urldb_cap").as[FetchUrl].collect().toSeq
      val deadline = System.currentTimeMillis() + 60000
      while (emitted().length < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      // cap reached: give the timer several more firings to (wrongly)
      // overshoot, then check it held
      Thread.sleep(1500)
      val atCap = emitted()
      assert(atCap.length == 2, s"in-flight cap 2 violated: $atCap")
      assert(atCap.map(_.url).toSet ==
        Set("http://cap.com/p4", "http://cap.com/p3"),
        s"must emit the two best-scored first: $atCap")
      // terminal feedback retires both slots; the remaining two emit
      input.addData(atCap.map(f =>
        CrawlStateUrl(f.url, f.pld, FS.FETCHED, 100L, f.score, 0L)))
      while (emitted().length < 4 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      val all = emitted()
      assert(all.length == 4, s"retired slots did not free capacity: $all")
      assert(all.map(_.url).distinct.length == 4)
    } finally query.stop()
  }

  test("zombie FETCHING entries revert after the fetch timeout and free their slot") {
    // emit one URL (FETCHING), never feed back terminal status: without
    // the timeout the in-flight cap of 1 deadlocks the domain forever;
    // with it the entry reverts to UNFETCHED and is re-emitted
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CrawlStateUrl]
    val out = UrlDbProcessor.schedule(
      input.toDS(), checkIntervalMs = 50, maxPerFiring = 1,
      maxInFlight = 1, fetchTimeoutMs = 500)
    val query = out.writeStream
      .format("memory").queryName("urldb_zombie")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try {
      input.addData(Seq(
        CrawlStateUrl("http://z.com/a", "z.com", FS.UNFETCHED, 1L, 1.0f, 0L)))
      def emissions(): Long = spark.table("urldb_zombie").count()
      val deadline = System.currentTimeMillis() + 60000
      while (emissions() < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(emissions() >= 2,
        "timed-out FETCHING entry was never reverted and re-emitted")
    } finally query.stop()
  }

  test("full queue admits a better URL by displacing (and restoring) the worst") {
    // maxInFlight=1 keeps the queue from draining, so queue dynamics are
    // observable: A emits (in-flight), C occupies the 1-slot queue, D
    // (better) displaces C — restored to UNFETCHED, not lost. Feeding
    // back FETCHED per emission drains everything; displacement shows as
    // D emitted before C, restore as C (and B) still emitted at all.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CrawlStateUrl]
    val out = UrlDbProcessor.schedule(
      input.toDS(), checkIntervalMs = 50, maxPerFiring = 1,
      maxQueueSize = 1, maxInFlight = 1)
    val query = out.writeStream
      .format("memory").queryName("urldb_displace")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try {
      def emitted(): Seq[FetchUrl] =
        spark.table("urldb_displace").as[FetchUrl].collect().toSeq
      val deadline = System.currentTimeMillis() + 90000
      def awaitCount(n: Int): Unit =
        while (emitted().length < n && System.currentTimeMillis() < deadline)
          Thread.sleep(100)
      input.addData(Seq(
        CrawlStateUrl("http://q.com/a", "q.com", FS.UNFETCHED, 1L, 1.0f, 0L)))
      awaitCount(1) // A in flight; cap now blocks emission
      input.addData(Seq(
        CrawlStateUrl("http://q.com/b", "q.com", FS.UNFETCHED, 2L, 2.0f, 0L),
        CrawlStateUrl("http://q.com/c", "q.com", FS.UNFETCHED, 2L, 3.0f, 0L)))
      Thread.sleep(1000) // timers queue C (best), B waits as UNFETCHED
      input.addData(Seq(
        CrawlStateUrl("http://q.com/d", "q.com", FS.UNFETCHED, 3L, 5.0f, 0L)))
      Thread.sleep(1000) // D displaces C from the full queue
      // drain: feed FETCHED back for each emission as it appears
      var acked = Set.empty[String]
      while (emitted().length < 4 && System.currentTimeMillis() < deadline) {
        val toAck = emitted().filterNot(f => acked.contains(f.url))
        if (toAck.nonEmpty) {
          input.addData(toAck.map(f =>
            CrawlStateUrl(f.url, f.pld, FS.FETCHED, 1000L, f.score, 0L)))
          acked ++= toAck.map(_.url).toSet
        }
        Thread.sleep(100)
      }
      val order = emitted().map(_.url)
      assert(order.length == 4,
        s"displaced URL was lost (restore failed): $order")
      assert(order.head == "http://q.com/a")
      assert(order.indexOf("http://q.com/d") < order.indexOf("http://q.com/c"),
        s"better URL did not displace the queued one: $order")
      assert(order.indexOf("http://q.com/c") < order.indexOf("http://q.com/b"),
        s"restored URL lost its priority: $order")
    } finally query.stop()
  }

  test("checkpoint restore under a CHANGED shuffle-partition count: no double-emit, state intact") {
    // the reference's flagship operator test snapshots, restarts at
    // DIFFERENT parallelism and re-asserts scheduling invariants
    // (UrlDBFunctionTest.java:117,181-182). Spark's analog: the state
    // store pins its partition count in the checkpoint, so a restart
    // under a different session spark.sql.shuffle.partitions must
    // restore cleanly at the CHECKPOINTED layout — queued/in-flight
    // state intact, nothing re-emitted.
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft_rescale").toString
    val ckpt = s"$base/ckpt"
    val feedDir = s"$base/feedback"
    val origParts = spark.conf.get("spark.sql.shuffle.partitions")
    // the memory sink refuses checkpoint recovery; foreachBatch into a
    // per-run driver buffer is the recoverable equivalent
    val sunk = new java.util.concurrent.ConcurrentHashMap[
      String, java.util.concurrent.ConcurrentLinkedQueue[FetchUrl]]()
    def startRun(name: String): org.apache.spark.sql.streaming.StreamingQuery = {
      sunk.putIfAbsent(name,
        new java.util.concurrent.ConcurrentLinkedQueue[FetchUrl]())
      val (input, _) = graft.streaming.LiveCrawl.FeedbackChannel.file(
        spark, feedDir, retainConsumed = true)
      UrlDbProcessor.scheduleWithScores(
          input, checkIntervalMs = 100, maxPerFiring = 1)
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime("100 milliseconds"))
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[FetchUrl], _: Long) =>
            batch.collect().foreach(sunk.get(name).add)
        }
        .start()
    }
    def push(rows: CrawlStateUrl*): Unit = {
      val ds = spark.createDataset(rows.map(UrlDbProcessor.stateInput))
      ds.coalesce(1).write.mode("append").parquet(feedDir)
    }
    def emitted(name: String): Seq[FetchUrl] = {
      import scala.jdk.CollectionConverters._
      sunk.get(name).iterator().asScala.toSeq
    }
    def await(name: String, n: Int): Seq[FetchUrl] = {
      val deadline = System.currentTimeMillis() + 60000
      while (emitted(name).length < n &&
        System.currentTimeMillis() < deadline) Thread.sleep(200)
      emitted(name)
    }
    try {
      // run 1 at 4 shuffle partitions: two urls drain fully, then quiesce
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      val q1 = startRun("rescale_run1")
      push(
        CrawlStateUrl("http://r.com/a", "r.com", FS.UNFETCHED, 1L, 5.0f, 0L),
        CrawlStateUrl("http://r.com/b", "r.com", FS.UNFETCHED, 1L, 1.0f, 0L))
      val run1 = await("rescale_run1", 2)
      assert(run1.map(_.url) == Seq("http://r.com/a", "http://r.com/b"),
        s"run1 order: $run1")
      // let the emitting batches' commits land before the kill
      Thread.sleep(1000)
      q1.stop()

      // run 2 at 13 shuffle partitions, same checkpoint: a re-sighting
      // of /a (already QUEUED in restored state) must NOT re-emit; the
      // new /c must
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      val q2 = startRun("rescale_run2")
      try {
        push(
          CrawlStateUrl("http://r.com/a", "r.com", FS.UNFETCHED, 9L, 9.0f, 0L),
          CrawlStateUrl("http://r.com/c", "r.com", FS.UNFETCHED, 9L, 3.0f, 0L))
        val run2 = await("rescale_run2", 1)
        assert(run2.nonEmpty, "restored query never emitted")
        // give a would-be erroneous /a re-emit time to surface
        Thread.sleep(1500)
        val finalRun2 = emitted("rescale_run2").map(_.url)
        assert(finalRun2.contains("http://r.com/c"),
          s"new url not scheduled after restore: $finalRun2")
        assert(!finalRun2.contains("http://r.com/a") &&
          !finalRun2.contains("http://r.com/b"),
          s"restored QUEUED state was lost — double-emit: $finalRun2")
      } finally q2.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", origParts)
  }
}
