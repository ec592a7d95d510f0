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
