package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.crawl._

/** The archive (snapshot-join) fetch path must produce the same frontier
  * as the live mapPartitions fetch path on the same web graph — the
  * CommonCrawl-mode parity the reference gets from swapping fetchers
  * (CrawlToolOptions -commoncrawl).
  */
class ArchiveFetchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val graph = WebGraph(
    "a.com" -> Seq("a.com/p1", "a.com/p2", "b.com"),
    "a.com/p1" -> Seq("a.com/p2"),
    "a.com/p2" -> Seq.empty,
    "b.com" -> Seq("b.com/missing-target"))

  test("archive join fetch produces the same frontier as live fetch") {
    val live = CrawlTopology.run(
      spark, Seq(("a.com", 1.0f)),
      new WebGraphFetcher(graph), new MapRobotsFetcher(Map.empty),
      CrawlConfig(maxRounds = 15))
    val archive = ArchiveFetch.archiveFromGraph(spark, graph)
    val arch = CrawlTopology.run(
      spark, Seq(("a.com", 1.0f)),
      new WebGraphFetcher(graph), new MapRobotsFetcher(Map.empty),
      CrawlConfig(maxRounds = 15),
      fetchStage = Some(ArchiveFetch.stage(archive)))
    def snap(r: CrawlResult) = r.frontier
      .select("url", "status").collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    assert(snap(arch) == snap(live))
    assert(snap(arch).contains(("http://a.com/p2", "FETCHED")))
    assert(snap(arch).contains(("http://b.com/missing-target", "HTTP_NOTFOUND")))
  }

  test("httpStatusToFetchStatusCol matches the scalar mapping") {
    import spark.implicits._
    val codes = Seq(200, 204, 301, 302, 308, 401, 403, 404, 410, 429, 500, 503, 100)
    val got = codes.toDF("code")
      .select(ArchiveFetch.httpStatusToFetchStatusCol(col("code")).as("s"))
      .collect().map(_.getString(0))
    val want = codes.map(graft.schema.FetchStatus.fromHttpStatus)
    assert(got.toSeq == want)
  }
}
