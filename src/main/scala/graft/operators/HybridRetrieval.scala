package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid lexical + dense retrieval with Reciprocal Rank Fusion —
  * the composition a training-data curation pipeline runs to pull
  * "documents like these seeds" out of a 100 TB corpus: a BM25-style
  * inverted-index arm ([[Bm25]]) and an embedding ANN arm
  * ([[Similarity]]/[[AnnIndexStore]]) each produce a per-query top-K,
  * and RRF (Cormack et al.: score = Σ 1/(k0 + rank)) fuses them without
  * needing the two arms' scores to be commensurable.
  *
  * The fusion score is computed in INTEGER fixed point —
  * `10^12 div (k0 + rank)` — so fused rankings are engine-exact and
  * oracle-checkable end to end (the [[graft.crawl.RevisitPolicy]] /
  * [[LinkRank]] discipline). Truncation keeps per-rank reciprocals
  * distinct through rank ≈ 10^6 at k0 = 60 (consecutive reciprocals
  * first collide near sqrt of the constant) — deeper than any
  * realistic fused list — and a two-arm sum stays < 2^63 for every
  * k0 ≥ 1. On genuine sum near-ties the ascending-id tie-break keeps
  * the output total and deterministic.
  *
  * Scale shape: each arm ends in a per-query rank window that
  * WindowGroupLimit prunes map-side (the q04 pattern), so the fusion
  * join sees at most `queries × K` rows per side — query-bounded, never
  * corpus-bounded. The fusion itself is one full-outer equi-join plus
  * one more query-partitioned window.
  */
object HybridRetrieval {

  /** Deterministic lexical ranking from [[Bm25.matchStats]]' integer
    * candidate statistics: more matched query terms beat fewer, then
    * higher summed tf, then ascending doc id. (The float BM25 fold is
    * spec-tested in Bm25Spec; ranking on the integer core keeps the
    * whole hybrid stack oracle-exact.) Output: (query_id, doc_id,
    * lex_rn) with lex_rn in [1, k].
    */
  def lexicalRank(
      docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int, excludeSelf: Boolean = false): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("n_terms").desc, col("sum_tf").desc, col("doc_id").asc)
    val ms = Bm25.matchStats(docs, idCol, textCol, queries, qidCol, qtextCol)
    val candidates =
      if (excludeSelf) ms.filter(col("query_id") =!= col("doc_id")) else ms
    candidates
      .withColumn("lex_rn", row_number().over(w).cast("bigint"))
      .filter(col("lex_rn") <= k)
      .select(col("query_id"), col("doc_id"), col("lex_rn"))
  }

  /** Fuse two per-query rank lists with fixed-point RRF. Inputs carry
    * (query_id, <candidate id>, <rank>); candidates missing from one arm
    * contribute only the other's reciprocal. Output: one row per fused
    * candidate — (query_id, cand_id, lex_rn, dense_rn nullable,
    * rrf_fp, rn) — rn in [1, topK] ordered by rrf_fp descending, cand_id
    * ascending.
    */
  def rrfFuse(
      lexical: DataFrame, lexIdCol: String, lexRankCol: String,
      dense: DataFrame, denseIdCol: String, denseRankCol: String,
      k0: Int, topK: Int): DataFrame = {
    require(k0 >= 1, s"rrf k0 must be >= 1, got $k0")
    val l = lexical.select(col("query_id"),
      col(lexIdCol).as("cand_id"), col(lexRankCol).as("lex_rn"))
    val r = dense.select(col("query_id"),
      col(denseIdCol).as("cand_id"), col(denseRankCol).as("dense_rn"))
    val fused = l.join(r, Seq("query_id", "cand_id"), "full_outer")
      .withColumn("rrf_fp",
        coalesce(expr(s"1000000000000 div ($k0 + lex_rn)"), lit(0L)) +
          coalesce(expr(s"1000000000000 div ($k0 + dense_rn)"), lit(0L)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_fp").desc, col("cand_id").asc)
    fused
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter(col("rn") <= topK)
      .select(col("query_id"), col("cand_id"), col("lex_rn"),
        col("dense_rn"), col("rrf_fp"), col("rn"))
  }
}
