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
}
