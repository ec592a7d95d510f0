package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Components

/** Incremental cluster maintenance: folding a new pair batch into a
  * standing label set must equal batch CC over the union, while leaving
  * untouched components out of the propagation.
  */
class IncrementalComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def batch(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Components.connectedComponents(pairs.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def incr(
      oldPairs: Seq[(Long, Long)],
      newPairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val standing = Components.connectedComponents(
      oldPairs.toDF("a", "b"), "a", "b")
    Components.incrementalComponents(
        standing, "id", "component", newPairs.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("splicing two standing clusters relabels both to the joint min") {
    val old = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val got = incr(old, Seq((3L, 10L)))
    assert(got == batch(old ++ Seq((3L, 10L))), s"got $got")
    assert(got(11L) == 1L, s"got $got")
  }

  test("untouched components keep their labels verbatim") {
    val old = Seq((1L, 2L), (10L, 11L), (20L, 21L), (21L, 22L))
    val got = incr(old, Seq((1L, 10L)))
    assert(got(20L) == 20L && got(21L) == 20L && got(22L) == 20L, s"$got")
    assert(got == batch(old ++ Seq((1L, 10L))), s"got $got")
  }

  test("brand-new nodes attach to standing clusters or form their own") {
    val old = Seq((5L, 6L))
    val got = incr(old, Seq((100L, 6L), (200L, 201L)))
    assert(got == Map(5L -> 5L, 6L -> 5L, 100L -> 5L,
      200L -> 200L, 201L -> 200L), s"got $got")
  }

  test("a new pair with a smaller id downgrades the standing label") {
    val old = Seq((10L, 11L))
    val got = incr(old, Seq((1L, 11L)))
    assert(got == Map(1L -> 1L, 10L -> 1L, 11L -> 1L), s"got $got")
  }

  test("empty new batch returns the standing set unchanged") {
    val old = Seq((1L, 2L), (7L, 8L))
    val got = incr(old, Seq.empty)
    assert(got == batch(old), s"got $got")
  }

  test("chained merges across three standing clusters in one batch") {
    val old = Seq((1L, 2L), (10L, 11L), (20L, 21L))
    val nw = Seq((2L, 10L), (11L, 20L))
    val got = incr(old, nw)
    assert(got == batch(old ++ nw), s"got $got")
    assert(got.values.toSet == Set(1L), s"got $got")
  }

  test("randomized equivalence with batch CC (deterministic seed)") {
    val rnd = new scala.util.Random(42)
    (0 until 3).foreach { _ =>
      val old = Seq.fill(40)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
        .filter { case (a, b) => a != b }
      val nw = Seq.fill(10)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter { case (a, b) => a != b }
      val got = incr(old, nw)
      assert(got == batch(old ++ nw), s"old=$old new=$nw got=$got")
    }
  }
}
