package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.crawl.RevisitPolicy

class RevisitPolicySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val DAY = 86400000L

  private def sched(rows: Seq[(String, Long, Long, Long)],
      minMs: Long = DAY, maxMs: Long = 30 * DAY): Map[String, (Long, Long, Long, Long)] =
    RevisitPolicy.schedule(
        rows.toDF("url", "ts", "fp", "cap_id"),
        "url", "ts", "fp", "cap_id", minMs, maxMs)
      .collect()
      .map(r => r.getAs[String]("url") ->
        ((r.getAs[Long]("n_changes"), r.getAs[Long]("est_interval_ms"),
          r.getAs[Long]("last_ts"), r.getAs[Long]("next_fetch_ms"))))
      .toMap

  test("never-changing URL gets the max interval") {
    val r = sched(Seq(("a", 0L, 7L, 1L), ("a", 10 * DAY, 7L, 2L)))
    assert(r("a") == ((0L, 30 * DAY, 10 * DAY, 40 * DAY)), s"got $r")
  }

  test("single capture is not a change and gets the max interval") {
    val r = sched(Seq(("a", 5L, 1L, 1L)))
    assert(r("a") == ((0L, 30 * DAY, 5L, 5L + 30 * DAY)), s"got $r")
  }

  test("change every capture: interval = span div changes") {
    // 4 captures over 9 days, fp flips 3 times -> 3 day estimate
    val r = sched(Seq(("a", 0L, 0L, 1L), ("a", 3 * DAY, 1L, 2L),
      ("a", 6 * DAY, 0L, 3L), ("a", 9 * DAY, 1L, 4L)))
    assert(r("a") == ((3L, 3 * DAY, 9 * DAY, 12 * DAY)), s"got $r")
  }

  test("hot page clamps to the min interval") {
    // two changes within one hour -> raw estimate 30 min, clamped to 1 day
    val h = 3600000L
    val r = sched(Seq(("a", 0L, 0L, 1L), ("a", h / 2, 1L, 2L), ("a", h, 2L, 3L)))
    assert(r("a")._1 == 2L && r("a")._2 == DAY, s"got $r")
  }

  test("glacial page clamps to the max interval") {
    // one change over 400 days -> raw estimate 400 days, clamped to 30
    val r = sched(Seq(("a", 0L, 0L, 1L), ("a", 400 * DAY, 1L, 2L)))
    assert(r("a") == ((1L, 30 * DAY, 400 * DAY, 430 * DAY)), s"got $r")
  }

  test("same-timestamp captures order by the tie column") {
    // at ts=0 the tie column decides fp order 0 then 1: one change there,
    // plus the flip back at DAY -> 2 changes. Reversed tie ids would
    // count the same 2 but via a different path; pin the exact sequence
    // by making one ordering produce 1 change: fps (0,0) then 1.
    val r = sched(Seq(("a", 0L, 0L, 2L), ("a", 0L, 0L, 1L), ("a", DAY, 1L, 3L)))
    assert(r("a")._1 == 1L, s"got $r")
  }

  test("urls are independent: mixed histories do not leak") {
    val r = sched(Seq(
      ("a", 0L, 0L, 1L), ("a", 2 * DAY, 1L, 2L),
      ("b", 0L, 5L, 3L), ("b", 2 * DAY, 5L, 4L)))
    assert(r("a")._1 == 1L && r("a")._2 == 2 * DAY, s"got $r")
    assert(r("b")._1 == 0L && r("b")._2 == 30 * DAY, s"got $r")
  }

  test("fromCdx: digests drive changes, 14-digit UTC timestamps round-trip") {
    // build a real CDX frame through the WRITER (Sinks.cdxIndex), so the
    // timestamp parse is pinned against the rendering it must invert
    val t0 = 1700000000000L
    val records = Seq(
      ("http://hot.com/", "v1", t0),
      ("http://hot.com/", "v2", t0 + 2 * DAY),
      ("http://hot.com/", "v3", t0 + 4 * DAY),
      ("http://cold.com/", "same", t0),
      ("http://cold.com/", "same", t0 + 4 * DAY))
      .toDF("url", "body", "fetchTimeMs")
      .select(col("url"), lit("text/html").as("contentType"),
        lit(200).as("statusCode"),
        encode(col("body"), "UTF-8").as("content"), col("fetchTimeMs"))
    val cdx = graft.sinks.Sinks.cdxIndex(records)
    val out = graft.crawl.RevisitPolicy.fromCdx(cdx, DAY, 30 * DAY)
      .collect()
      .map(r => r.getAs[String]("url") ->
        ((r.getAs[Long]("n_changes"), r.getAs[Long]("est_interval_ms"),
          r.getAs[Long]("last_ts"))))
      .toMap
    // hot: 2 digest flips over 4 days -> 2-day interval; cold: none
    assert(out("http://hot.com/") == ((2L, 2 * DAY, t0 + 4 * DAY)),
      s"got $out")
    assert(out("http://cold.com/") == ((0L, 30 * DAY, t0 + 4 * DAY)),
      s"got $out")
  }

  test("fromCdx conversion is session-timezone- and DST-immune") {
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      // 2025-03-09T02:30:00Z: the wall time 02:30 does not EXIST in
      // America/New_York that day (spring-forward) — a session-tz
      // to_timestamp/from_utc_timestamp round trip shifts it by an hour.
      // The arithmetic conversion must not care what the session tz is.
      val cdx = Seq(
        ("u", "20250309023000", "d1"),
        ("u", "20251102063000", "d2")) // fall-back day, ambiguous local
        .toDF("url", "ts", "digest")
      val out = RevisitPolicy.fromCdx(cdx, DAY, 30 * DAY).collect().head
      assert(out.getAs[Long]("first_ts") ==
        java.time.Instant.parse("2025-03-09T02:30:00Z").toEpochMilli)
      assert(out.getAs[Long]("last_ts") ==
        java.time.Instant.parse("2025-11-02T06:30:00Z").toEpochMilli)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("interval band is validated") {
    intercept[IllegalArgumentException] {
      RevisitPolicy.schedule(
        Seq(("a", 0L, 0L, 1L)).toDF("url", "ts", "fp", "cap_id"),
        "url", "ts", "fp", "cap_id", minIntervalMs = 10L, maxIntervalMs = 5L)
    }
  }
}
