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
    import org.apache.spark.sql.types.LongType
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("n_terms").desc, col("sum_tf").desc, col("doc_id").asc)
    // r17 kernel path: [[Bm25.matchStats]]' inverted-index join is the
    // right 100 TB shape when query terms are SELECTIVE, but a stop-
    // phrase-heavy query set (every term's posting list ~ the corpus)
    // degenerates it to all-pairs row traffic: the broadcast join emits
    // |doc-term rows| x |queries per term| rows into a |Q| x |docs|-group
    // aggregate, which is quadratic in rows MATERIALIZED even though the
    // ranking only ever keeps K per query. The kernel streams the SAME
    // per-doc term-frequency frame once and keeps a bounded per-query
    // top-K buffer (integer comparator = the window's order exactly), so
    // only per-partition survivors reach the exact final window. Same
    // broadcast bound as the join form (query terms were already
    // broadcast); matchStats itself (q69's oracle surface) is untouched.
    val candidates =
      (if (docs.schema(idCol).dataType == LongType &&
          queries.schema(qidCol).dataType == LongType)
        lexicalCandidates(docs, idCol, textCol,
          queries, qidCol, qtextCol, k, excludeSelf)
      else None).getOrElse {
        val ms = Bm25.matchStats(docs, idCol, textCol, queries, qidCol, qtextCol)
        if (excludeSelf) ms.filter(col("query_id") =!= col("doc_id")) else ms
      }
    candidates
      .withColumn("lex_rn", row_number().over(w).cast("bigint"))
      .filter(col("lex_rn") <= k)
      .select(col("query_id"), col("doc_id"), col("lex_rn"))
  }

  /** Per-partition top-K lexical candidates (kernel path of
    * [[lexicalRank]]): one pass over [[Bm25.docTermFreqs]] grouped per
    * doc, query-term sets from [[Bm25.queryTerms]] (BOTH the join form's
    * frames — tokenization cannot drift), per-query bounded buffers under
    * the exact (n_terms desc, sum_tf desc, doc_id asc) order. Emits
    * ≤ |Q| x K rows per partition — a superset of the global top-K.
    *
    * The doc-term frame is pre-filtered to the query VOCABULARY before
    * the per-doc group-by (guide §2.3 shuffle fewer bytes): a term no
    * query contains can never touch a buffer (`byTerm.get` misses), and
    * a doc with no vocabulary term emits nothing — exactly the inner
    * join's semantics — so with selective queries the group-by shuffles
    * only matched rows, the same rows the join form shuffled, while the
    * stop-phrase degenerate case (vocabulary ≈ corpus vocabulary) keeps
    * the kernel's bounded-buffer advantage. The query-term collect is
    * bounded (None past `spark.graft.kernel.maxProbeRows` or on null
    * ids/terms — the caller then takes the matchStats join form).
    */
  private def lexicalCandidates(
      docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int, excludeSelf: Boolean): Option[DataFrame] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // query-term pairs are broadcast-sized by the operator's contract
    // (the join form shipped this exact frame through a BroadcastExchange);
    // the collect is row-bounded and null-checked, None -> join fallback
    val maxRows = spark.conf.getOption("spark.graft.kernel.maxProbeRows")
      .map(_.toInt).getOrElse(1 << 22)
    val qtRows = Bm25.queryTerms(queries, qidCol, qtextCol)
      .select(col("query_id"), col("term"))
      .limit(maxRows + 1).collect()
    if (qtRows.length > maxRows ||
        qtRows.exists(r => r.isNullAt(0) || r.isNullAt(1)))
      return None
    val qt: Array[(Long, String)] =
      qtRows.map(r => (r.getLong(0), r.getString(1)))
    val qb = spark.sparkContext.broadcast(qt)
    val kk = k
    val exSelf = excludeSelf
    val vocab: Seq[String] = qt.map(_._2).distinct.toSeq
    Some(Bm25.docTermFreqs(docs, idCol, textCol)
      .where(col("term").isInCollection(vocab))
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("term"), col("tf"))).as("tts"))
      .as[(Long, Seq[(String, Long)])]
      .mapPartitions { it =>
        val pairs = qb.value
        if (pairs.isEmpty || kk < 1) Iterator.empty
        else {
          // dense query index + term -> query-index postings
          val qids: Array[Long] = pairs.map(_._1).distinct
          val qIdx = new java.util.HashMap[java.lang.Long, Integer](qids.length * 2)
          qids.zipWithIndex.foreach { case (q, i) => qIdx.put(q, i) }
          val byTerm = new java.util.HashMap[String, Array[Int]]()
          pairs.groupBy(_._2).foreach { case (t, qs) =>
            byTerm.put(t, qs.map(p => qIdx.get(p._1).intValue()).toArray)
          }
          val nq = qids.length
          // per-query worst-first top-K insertion buffers, best at slot 0
          val nBuf = Array.ofDim[Long](nq, kk)
          val sBuf = Array.ofDim[Long](nq, kk)
          val dBuf = Array.ofDim[Long](nq, kk)
          val cnt = new Array[Int](nq)
          // per-doc scratch, epoch-stamped so it never needs a reset pass
          val qN = new Array[Long](nq)
          val qSum = new Array[Long](nq)
          val stamp = new Array[Int](nq)
          val touched = new Array[Int](nq)
          var epoch = 0
          // better-than = lexicographic (n desc, sum desc, doc_id asc)
          def better(n1: Long, s1: Long, d1: Long,
              n2: Long, s2: Long, d2: Long): Boolean =
            n1 > n2 || (n1 == n2 && (s1 > s2 || (s1 == s2 && d1 < d2)))
          it.foreach { case (did, tts) =>
            epoch += 1
            var nTouched = 0
            tts.foreach { case (term, tf) =>
              val qs = byTerm.get(term)
              if (qs != null) {
                var j = 0
                while (j < qs.length) {
                  val qi = qs(j)
                  if (stamp(qi) != epoch) {
                    stamp(qi) = epoch; qN(qi) = 0L; qSum(qi) = 0L
                    touched(nTouched) = qi; nTouched += 1
                  }
                  qN(qi) += 1L; qSum(qi) += tf
                  j += 1
                }
              }
            }
            var t = 0
            while (t < nTouched) {
              val qi = touched(t)
              if (!exSelf || qids(qi) != did) {
                val n = cnt(qi); val nn = qN(qi); val ss = qSum(qi)
                if (n < kk ||
                    better(nn, ss, did, nBuf(qi)(n - 1), sBuf(qi)(n - 1),
                      dBuf(qi)(n - 1))) {
                  var pos = if (n < kk) n else n - 1
                  while (pos > 0 && better(nn, ss, did,
                      nBuf(qi)(pos - 1), sBuf(qi)(pos - 1), dBuf(qi)(pos - 1))) {
                    nBuf(qi)(pos) = nBuf(qi)(pos - 1)
                    sBuf(qi)(pos) = sBuf(qi)(pos - 1)
                    dBuf(qi)(pos) = dBuf(qi)(pos - 1)
                    pos -= 1
                  }
                  nBuf(qi)(pos) = nn; sBuf(qi)(pos) = ss; dBuf(qi)(pos) = did
                  if (n < kk) cnt(qi) = n + 1
                }
              }
              t += 1
            }
          }
          (0 until nq).iterator.flatMap { qi =>
            (0 until cnt(qi)).iterator.map(j =>
              (qids(qi), dBuf(qi)(j), nBuf(qi)(j), sBuf(qi)(j)))
          }
        }
      }
      .toDF("query_id", "doc_id", "n_terms", "sum_tf"))
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
