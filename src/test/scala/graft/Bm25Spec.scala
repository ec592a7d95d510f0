package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bm25

class Bm25Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val corpus = Seq(
    // 1: both query terms, twice each, short
    (1L, "fox river fox river"),
    // 2: both terms once, padded with common filler
    (2L, "fox river the the the the the the the the"),
    // 3: only the common filler word
    (3L, "the the the the"),
    // 4: one query term only
    (4L, "fox the the the"),
    // 5: rare term, appears nowhere else
    (5L, "zebra the the the")
  ).toDF("doc_id", "text")

  test("matchStats: integer candidate stats are exact") {
    val q = Seq((10L, "fox river")).toDF("query_id", "qtext")
    val rows = Bm25.matchStats(corpus, "doc_id", "text", q, "query_id", "qtext")
      .collect().map(r => (r.getLong(1), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // doc 1: fox*2 + river*2, 2 matched terms, len 4
    assert(rows(1L) == ((4L, 2L, 4L)))
    // doc 2: fox+river once each, len 10
    assert(rows(2L) == ((2L, 2L, 10L)))
    // doc 4: fox only
    assert(rows(4L) == ((1L, 1L, 4L)))
    // docs 3 and 5 share no query term -> not candidates
    assert(!rows.contains(3L) && !rows.contains(5L))
  }

  test("topK: tf and length normalization order the matches; k truncates") {
    val q = Seq((10L, "fox river")).toDF("query_id", "qtext")
    val ranked = Bm25.topK(corpus, "doc_id", "text", q, "query_id", "qtext", k = 2)
      .orderBy($"rn").collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(ranked.length == 2) // k truncates the 3 candidates
    // doc 1 (higher tf, shorter) above doc 2 (tf 1, longer), doc 4 cut
    assert(ranked(0) == ((1L, 1L)) && ranked(1) == ((2L, 2L)), ranked.toSeq)
  }

  test("topK: rare-term idf outweighs common-term matches") {
    val q = Seq((20L, "zebra the")).toDF("query_id", "qtext")
    val top = Bm25.topK(corpus, "doc_id", "text", q, "query_id", "qtext", k = 1)
      .collect().map(_.getLong(1))
    // doc 5 holds the corpus-unique term; 'the' appears in 4/5 docs so
    // its idf is near zero — the rare term must dominate
    assert(top.sameElements(Array(5L)), top.toSeq)
  }

  test("topK plan: per-query rank prunes map-side via WindowGroupLimit") {
    val q = Seq((10L, "fox river")).toDF("query_id", "qtext")
    val df = Bm25.topK(corpus, "doc_id", "text", q, "query_id", "qtext", k = 2)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      "per-query top-K lost its WindowGroupLimit rewrite:\n" + plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("topK: multiple queries rank independently") {
    val q = Seq((1L, "fox"), (2L, "zebra")).toDF("query_id", "qtext")
    val byQuery = Bm25.topK(corpus, "doc_id", "text", q, "query_id", "qtext", k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byQuery == Map(1L -> 1L, 2L -> 5L), byQuery)
  }
}
