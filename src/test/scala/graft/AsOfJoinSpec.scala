package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(
      left: Seq[(Long, Long, String)],
      right: Seq[(Long, Long, Long)]): Seq[(Long, Long, String, Option[Long], Option[Long])] =
    AsOfJoin.lastAtOrBefore(
        left.toDF("k", "ts", "tag"),
        right.toDF("k", "ts", "score"),
        "k", "ts", Seq("score"))
      .orderBy("k", "ts")
      .collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("ts"),
        r.getAs[String]("tag"),
        Option(r.getAs[java.lang.Long]("score")).map(_.longValue()),
        Option(r.getAs[java.lang.Long]("asof_ts")).map(_.longValue())))
      .toSeq

  test("latest right row at or before each left ts; equal ts matches") {
    val out = run(
      left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 25L, "c")),
      right = Seq((1L, 10L, 100L), (1L, 20L, 200L), (1L, 30L, 300L)))
    assert(out == Seq(
      (1L, 10L, "a", Some(100L), Some(10L)),
      (1L, 20L, "b", Some(200L), Some(20L)),
      (1L, 25L, "c", Some(200L), Some(20L))), s"got $out")
  }

  test("left rows before any right row get nulls") {
    val out = run(
      left = Seq((1L, 5L, "early"), (1L, 50L, "late")),
      right = Seq((1L, 10L, 7L)))
    assert(out == Seq(
      (1L, 5L, "early", None, None),
      (1L, 50L, "late", Some(7L), Some(10L))), s"got $out")
  }

  test("keys never leak: a right row only serves its own key") {
    val out = run(
      left = Seq((1L, 10L, "x"), (2L, 10L, "y")),
      right = Seq((1L, 5L, 11L)))
    assert(out == Seq(
      (1L, 10L, "x", Some(11L), Some(5L)),
      (2L, 10L, "y", None, None)), s"got $out")
  }

  test("duplicate left timestamps each read the same carried state") {
    val out = run(
      left = Seq((1L, 10L, "p"), (1L, 10L, "q")),
      right = Seq((1L, 3L, 5L)))
    assert(out.map(_._4) == Seq(Some(5L), Some(5L)), s"got $out")
  }

  test("left schema passes through bit-exact (doubles, extra columns)") {
    val left = Seq((1L, 10L, 0.1 + 0.2, "keep")).toDF("k", "ts", "v", "note")
    val right = Seq((1L, 9L, 42L)).toDF("k", "ts", "score")
    val out = AsOfJoin.lastAtOrBefore(left, right, "k", "ts", Seq("score"))
      .collect().head
    assert(out.getAs[Double]("v") == 0.1 + 0.2)
    assert(out.getAs[String]("note") == "keep")
    assert(out.getAs[Long]("score") == 42L)
  }

  test("randomized equivalence with a brute-force reference") {
    val rnd = new scala.util.Random(7)
    (0 until 4).foreach { _ =>
      val left = Seq.fill(60)((rnd.nextInt(5).toLong,
        rnd.nextInt(50).toLong, rnd.nextInt(1000).toString))
      // unique (key, ts) on the right, as the contract requires
      val right = Seq.fill(40)((rnd.nextInt(5).toLong,
        rnd.nextInt(50).toLong, rnd.nextLong(10000)))
        .groupBy(t => (t._1, t._2)).values.map(_.head).toSeq
      val got = run(left, right).toSet
      val want = left.map { case (k, ts, tag) =>
        val best = right.filter(r => r._1 == k && r._2 <= ts)
          .sortBy(_._2).lastOption
        (k, ts, tag, best.map(_._3), best.map(_._2))
      }.toSet
      assert(got == want, s"left=$left right=$right")
    }
  }

  test("TimestampType inputs keep sub-second ordering (no whole-second truncation)") {
    import org.apache.spark.sql.functions.col
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    // right row at 10.500 s is AFTER left event at 10.200 s; a
    // cast('long') order key would truncate both to 10 and wrongly
    // match it (right sorts before left at equal keys)
    val left = Seq((1L, ts(10200L), "ev")).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, ts(9900L), 1L),
      (1L, ts(10500L), 2L)).toDF("k", "ts", "score")
    val out = AsOfJoin.lastAtOrBefore(left, right, "k", "ts", Seq("score"))
      .select(col("score"), col("asof_ts").cast("long").as("ats"))
      .collect().head
    assert(out.getAs[Long]("score") == 1L, s"got $out")
  }

  test("mixed numeric/timestamp ts kinds are refused") {
    intercept[IllegalArgumentException] {
      AsOfJoin.lastAtOrBefore(
        Seq((1L, 10L, "x")).toDF("k", "ts", "tag"),
        Seq((1L, new java.sql.Timestamp(10000L), 1L)).toDF("k", "ts", "score"),
        "k", "ts", Seq("score"))
    }
  }

  test("empty payloadCols is refused") {
    intercept[IllegalArgumentException] {
      AsOfJoin.lastAtOrBefore(
        Seq((1L, 1L)).toDF("k", "ts"),
        Seq((1L, 1L, 1L)).toDF("k", "ts", "p"),
        "k", "ts", Seq.empty)
    }
  }
}
