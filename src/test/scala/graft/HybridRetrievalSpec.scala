package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.HybridRetrieval

class HybridRetrievalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fuse(
      lex: Seq[(Long, Long, Long)], dense: Seq[(Long, Long, Long)],
      k0: Int = 60, topK: Int = 10): Seq[(Long, Long, Long, Long)] =
    HybridRetrieval.rrfFuse(
        lex.toDF("query_id", "doc_id", "lex_rn"), "doc_id", "lex_rn",
        dense.toDF("query_id", "neighbor_id", "dense_rn"),
        "neighbor_id", "dense_rn", k0, topK)
      .orderBy("query_id", "rn")
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"),
        r.getAs[Long]("rrf_fp"), r.getAs[Long]("rn")))
      .toSeq

  test("candidate in both arms beats single-arm candidates") {
    // doc 5: lex rank 2 + dense rank 2 -> 2 * (10^12 div 62)
    // doc 1: lex rank 1 only; doc 2: dense rank 1 only -> 10^12 div 61
    val out = fuse(
      lex = Seq((10L, 1L, 1L), (10L, 5L, 2L)),
      dense = Seq((10L, 2L, 1L), (10L, 5L, 2L)))
    assert(out.head == ((10L, 5L, 32258064516L, 1L)), s"got $out")
    // the two single-arm docs tie on score; ascending id breaks it
    assert(out(1) == ((10L, 1L, 16393442622L, 2L)), s"got $out")
    assert(out(2) == ((10L, 2L, 16393442622L, 3L)), s"got $out")
  }

  test("fixed-point reciprocal: 10^12 div (k0 + rank) exactly") {
    val out = fuse(lex = Seq((1L, 7L, 3L)), dense = Seq.empty, k0 = 60)
    // 1000000000000 div 63 = 15873015873
    assert(out == Seq((1L, 7L, 15873015873L, 1L)), s"got $out")
  }

  test("deep ranks past 940 stay distinct (old 10^6 constant tied)") {
    // k0=60, ranks 1355/1356 -> divisors 1415/1416: at the former 10^6
    // fixed point both floored to 706 (id-ordered tail); at 10^12 they
    // are distinct, so the lower-rank candidate wins despite a HIGHER id.
    val out = fuse(
      lex = Seq((1L, 9L, 1355L), (1L, 1L, 1356L)),
      dense = Seq.empty, k0 = 60, topK = 5)
    assert(out == Seq(
      (1L, 9L, 706713780L, 1L),
      (1L, 1L, 706214689L, 2L)), s"got $out")
  }

  test("topK truncates the fused list per query, not globally") {
    val lex = (1L to 5L).map(i => (1L, i, i)) ++ (1L to 5L).map(i => (2L, 10 + i, i))
    val out = fuse(lex, Seq.empty, topK = 3)
    assert(out.count(_._1 == 1L) == 3 && out.count(_._1 == 2L) == 3, s"$out")
    assert(out.filter(_._1 == 2L).map(_._2) == Seq(11L, 12L, 13L), s"$out")
  }

  test("queries present in only one arm still fuse") {
    val out = fuse(lex = Seq((1L, 2L, 1L)), dense = Seq((9L, 3L, 1L)))
    assert(out.map(t => (t._1, t._2)).toSet == Set((1L, 2L), (9L, 3L)), s"$out")
  }

  test("k0 must be positive") {
    intercept[IllegalArgumentException] {
      HybridRetrieval.rrfFuse(
        Seq((1L, 2L, 1L)).toDF("query_id", "doc_id", "lex_rn"),
        "doc_id", "lex_rn",
        Seq((1L, 2L, 1L)).toDF("query_id", "neighbor_id", "dense_rn"),
        "neighbor_id", "dense_rn", k0 = 0, topK = 5)
    }
  }

  test("lexicalRank: term coverage beats tf; self-match excluded") {
    val docs = Seq(
      (0L, "alpha beta gamma"),       // 2 query terms
      (1L, "alpha alpha alpha"),      // 1 term, tf 3
      (2L, "alpha beta"),             // 2 terms (id tiebreak vs doc 0)
      (3L, "delta")).toDF("doc_id", "text")
    val q = Seq((0L, "alpha beta")).toDF("query_id", "qtext")
    val got = HybridRetrieval.lexicalRank(
        docs, "doc_id", "text", q, "query_id", "qtext",
        k = 10, excludeSelf = true)
      .orderBy("lex_rn").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("lex_rn"))).toSeq
    // doc 0 is the query itself -> excluded; doc 2 (2 terms) beats doc 1
    // (1 term, higher tf); doc 3 shares no term -> absent
    assert(got == Seq((2L, 1L), (1L, 2L)), s"got $got")
  }
}
