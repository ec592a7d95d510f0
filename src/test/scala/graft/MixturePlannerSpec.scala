package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MixturePlanner

class MixturePlannerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("plan hits targets, caps rates, and reports shortfall honestly") {
    val counts = Map("web" -> 1000L, "books" -> 100L, "code" -> 500L)
    val weights = Map("web" -> 0.4, "books" -> 0.3, "code" -> 0.3)
    val plans = MixturePlanner.plan(counts, weights, budgetTokens = 600L)
      .map(p => p.stratum -> p).toMap
    // web: target 240 of 1000 -> rate .24; code: 180 of 500 -> .36
    assert(plans("web").rate == 0.24 && plans("web").shortfall == 0L)
    assert(plans("code").rate == 0.36 && plans("code").shortfall == 0L)
    // books wants 180 but only has 100: rate caps at 1.0, shortfall 80
    assert(plans("books").rate == 1.0)
    assert(plans("books").shortfall == 80L)
  }

  test("unknown strata get rate 0; zero weights normalize safely") {
    val plans = MixturePlanner.plan(
      Map("web" -> 100L, "junk" -> 50L), Map("web" -> 1.0), 50L)
      .map(p => p.stratum -> p.rate).toMap
    assert(plans("web") == 0.5)
    assert(plans("junk") == 0.0)
  }

  test("tokenTotals + applyPlan compose end-to-end over a dataframe") {
    val docs = Seq(
      (1L, "en", "one two three four"),
      (2L, "en", "five six seven eight"),
      (3L, "fr", "un deux trois quatre")
    ).toDF("doc_id", "lang", "text")
    val totals = MixturePlanner.tokenTotals(docs, "lang", "text")
    assert(totals == Map("en" -> 8L, "fr" -> 4L))
    // keep everything: rate 1.0 for both strata -> all rows survive
    val all = MixturePlanner.applyPlan(docs, "doc_id", "lang",
      MixturePlanner.plan(totals, Map("en" -> 2.0, "fr" -> 1.0), 12L))
    assert(all.count() == 3)
    // zero budget: nothing survives
    val none = MixturePlanner.applyPlan(docs, "doc_id", "lang",
      MixturePlanner.plan(totals, Map("en" -> 1.0), 0L))
    assert(none.count() == 0)
  }

  test("temperature plan boosts small sources with exact integer shares") {
    // big: 100 docs x 16 pre-tokens = 1600; small: 1 doc x 16 = 16.
    // raw share of small = 16/1616 ~ 0.99%; T=2 share = sqrt-flattened.
    val docs = (
      (0 until 100).map(i => (i.toLong, "big",
        "aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp")) :+
        (100L, "small", "aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp")
      ).toDF("doc_id", "source", "text")
    val plan = MixturePlanner.temperaturePlan(docs, "source", "text")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("weight"),
          r.getAs[Long]("share_ppm"))).toMap
    assert(plan("big") == ((1600L, 40L, 909090L)), plan.toString)
    assert(plan("small") == ((16L, 4L, 90909L)), plan.toString)
    // T=2 lifts the small source's share ~9x over its raw token share
    val raw = 16.0 / 1616.0
    assert(plan("small")._3 / 1e6 > raw * 8)
  }
}
