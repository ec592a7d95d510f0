package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LinkRank

class LinkRankSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    LinkRank.pageRankFixedPoint(
      edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("2-cycle is the fixed point: rank stays at scale every round") {
    // contrib = 10^6 div 1; r' = 150000 + 85*10^6 div 100 = 10^6 exactly
    val r = ranks(Seq((1L, 2L), (2L, 1L)), iters = 5)
    assert(r == Map(1L -> 1000000L, 2L -> 1000000L), s"got $r")
  }

  test("star graph: hand-computed integer ranks after 1 and 2 rounds") {
    val edges = Seq((1L, 2L), (1L, 3L))
    // round 1: leaves get 150000 + 85*(10^6 div 2) div 100 = 575000,
    // the root (no in-links) drops to the base 150000
    val r1 = ranks(edges, iters = 1)
    assert(r1 == Map(1L -> 150000L, 2L -> 575000L, 3L -> 575000L), s"$r1")
    // round 2: leaves get 150000 + 85*(150000 div 2) div 100 = 213750
    val r2 = ranks(edges, iters = 2)
    assert(r2 == Map(1L -> 150000L, 2L -> 213750L, 3L -> 213750L), s"$r2")
  }

  test("self-loops and duplicate edges are dropped before degree counting") {
    // (1,1) ignored; duplicated (1,2) collapses to one edge, so node 1's
    // out-degree is 1 and node 2 receives the full contribution
    val r = ranks(Seq((1L, 1L), (1L, 2L), (1L, 2L), (2L, 1L)), iters = 3)
    assert(r == Map(1L -> 1000000L, 2L -> 1000000L), s"got $r")
  }

  test("hub concentration: many-to-one beats one-to-one after iteration") {
    val n = 20L
    // nodes 1..n all link to the hub 0; hub links back to node 1 only
    val edges = (1L to n).map(i => (i, 0L)) :+ ((0L, 1L))
    val r = ranks(edges, iters = 10)
    assert(r(0L) > r(2L) * 5, s"hub not concentrated: $r")
    // node 1 (the hub's sole outlink) outranks its peers
    assert(r(1L) > r(2L), s"got $r")
    // every rank is at least the teleport base
    assert(r.values.forall(_ >= 150000L), s"got $r")
  }

  test("integer arithmetic is bit-exact across runs") {
    // quadratic map -> non-uniform in-degrees (a bijective linear map
    // would make the graph regular and every rank identical)
    val edges = (0L until 60L).flatMap(i =>
      Seq((i, (i * 31 + 7) % 60), (i, (i * i * 17 + 3) % 60)))
    val a = ranks(edges, iters = 4)
    val b = ranks(edges, iters = 4)
    assert(a == b)
    assert(a.values.toSet.size > 1, "degenerate: all ranks equal")
    // mass invariant: integer truncation and dangling nodes only ever
    // LEAK rank, so total mass stays within [n·base, n·scale]
    val n = a.size
    assert(a.values.sum <= n * 1000000L, s"mass grew: ${a.values.sum}")
    assert(a.values.sum >= n * 150000L, s"mass below teleport floor")
  }
}

class LinkRankPlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("per-round plan: equi-join + hash aggregation, no cartesian shapes") {
    val edges = (0L until 500L).map(i => (i, (i * 31 + 7) % 500))
      .toDF("src", "dst")
    val (_, plan) = graft.operators.LinkRank.pageRankWithPlan(
      edges, "src", "dst", iters = 2)
    assert(plan.nonEmpty)
    // the round cost multiplies by the iteration budget — a cartesian or
    // nested-loop regression here is a scale-killer times iters
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(plan.contains("HashAggregate"), plan.take(3000))
  }
}

class DomainRankSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val outlinks = Seq(
    // three sites point at popular.com; popular.com points at niche.org;
    // intra-site links and a junk URL must not become edges
    ("http://a.com/page1", "http://popular.com/x"),
    ("http://a.com/page2", "http://a.com/page3"), // intra-domain: dropped
    ("http://b.net/p", "https://www.popular.com/y"), // same PLD as above
    ("http://c.io/p", "http://popular.com/z"),
    ("http://popular.com/x", "http://niche.org/only"),
    ("http://c.io/p2", "not a url at all") // unparseable: dropped
  ).toDF("src", "dst")

  test("domain edges: pld-collapsed, cross-domain only, junk dropped") {
    val edges = graft.crawl.DomainRank.domainEdges(outlinks, "src", "dst")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(edges == Set(
      ("a.com", "popular.com"), ("b.net", "popular.com"),
      ("c.io", "popular.com"), ("popular.com", "niche.org")), edges.toString)
  }

  test("domain rank: link-fed domains outrank unlinked ones, rank flows on") {
    val rank = graft.crawl.DomainRank.domainRank(outlinks, "src", "dst",
      iters = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // three in-links beat zero
    assert(rank("popular.com") > rank("a.com"), rank.toString)
    // popular.com's SOLE outlink receives its whole (damped) rank, so the
    // downstream domain tops the graph — rank flows, it doesn't pool
    assert(rank("niche.org") > rank("popular.com"), rank.toString)
    // the unlinked linkers sit at the teleport base
    assert(rank("a.com") == 150000L, rank.toString)
  }

  test("cold-start integration: link-rank priors drive the fetch scheduler") {
    import graft.crawl._
    // outlinks from an earlier crawl snapshot: everyone points at hub.com
    val snapshot = Seq(
      ("http://a.com/p", "http://hub.com/x"),
      ("http://b.com/p", "http://hub.com/y"),
      ("http://c.com/p", "http://hub.com/z"),
      ("http://hub.com/x", "http://a.com/p")
    ).toDF("src", "dst")
    val priors = DomainRank.seedScores(
      DomainRank.domainRank(snapshot, "src", "dst", iters = 3))
      .collect().map(r => r.getString(0) -> r.getFloat(1)).toMap
    assert(priors("hub.com") == 1.0f, priors.toString)
    // seed a FRESH crawl of never-fetched domains with those priors as
    // initial scores; one round, one queue slot -> the scheduler must
    // spend its only fetch on the top-prior domain
    val graph = WebGraph(
      "a.com" -> Seq.empty, "b.com" -> Seq.empty,
      "c.com" -> Seq.empty, "hub.com" -> Seq.empty)
    val robots = new MapRobotsFetcher(
      Seq("a.com", "b.com", "c.com", "hub.com")
        .map(d => s"http://$d/robots.txt" -> "User-agent: *\n").toMap)
    val result = CrawlTopology.run(
      spark,
      seeds = Seq("a.com", "b.com", "c.com", "hub.com")
        .map(d => (d, priors.getOrElse(d, 0.0f))),
      pageFetcher = new WebGraphFetcher(graph),
      robotsFetcher = robots,
      cfg = CrawlConfig(maxRounds = 1, maxQueueSize = 1))
    val fetched = result.frontier
      .filter(org.apache.spark.sql.functions.col("status") === "FETCHED")
      .select("url").collect().map(_.getString(0)).toSeq
    assert(fetched == Seq("http://hub.com/"), s"fetched $fetched")
  }

  test("seed scores normalize into (0, 1] with the top domain at 1.0") {
    val scores = graft.crawl.DomainRank.seedScores(
      graft.crawl.DomainRank.domainRank(outlinks, "src", "dst", iters = 5))
      .collect().map(r => r.getString(0) -> r.getFloat(1)).toMap
    assert(scores("niche.org") == 1.0f, scores.toString)
    assert(scores.values.forall(s => s > 0f && s <= 1.0f), scores.toString)
    assert(scores("popular.com") > scores("a.com"), scores.toString)
  }
}
