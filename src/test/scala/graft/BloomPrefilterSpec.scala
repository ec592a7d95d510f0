package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.BloomPrefilter

class BloomPrefilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val large = (0 until 10000)
    .map(i => s"http://d${i}.com/p").toDF("url")
  private lazy val small = (0 until 10000 by 100)
    .map(i => s"http://d${i}.com/p").toDF("url")

  test("bloom-prefiltered semi join equals the exact semi join") {
    val exact = large.join(small, Seq("url"), "left_semi")
      .collect().map(_.getString(0)).toSet
    val got = BloomPrefilter.semiJoin(large, small, "url",
      expectedItems = 1000, fpp = 0.03)
      .collect().map(_.getString(0)).toSet
    assert(got == exact)
    assert(got.size == 100)
  }

  test("non-string key types filter correctly (build/probe use one form)") {
    val largeL = (0L until 10000L).toDF("k")
    val smallL = (0L until 10000L by 100L).toDF("k")
    val exact = largeL.join(smallL, Seq("k"), "left_semi")
      .collect().map(_.getLong(0)).toSet
    val got = BloomPrefilter.semiJoin(largeL, smallL, "k",
      expectedItems = 1000, fpp = 0.03)
      .collect().map(_.getLong(0)).toSet
    assert(got == exact, s"long-keyed bloom dropped true members: ${got.size}")
    assert(got.size == 100)
  }

  test("approx filter keeps all members and drops most non-members") {
    val kept = BloomPrefilter.approxFilter(large, small, "url",
      expectedItems = 1000, fpp = 0.01).collect().map(_.getString(0)).toSet
    val members = small.collect().map(_.getString(0)).toSet
    assert(members.subsetOf(kept), "bloom filters never drop true members")
    // at fpp=1% on 9900 non-members, expect ~99 false positives; 5x slack
    assert(kept.size - members.size < 500,
      s"too many false positives: ${kept.size - members.size}")
  }
}
