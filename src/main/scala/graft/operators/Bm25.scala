package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval over the corpus — the lexical counterpart to
  * [[Similarity]]'s embedding ANN: given a (small) table of keyword
  * queries, return each query's top-K documents under Okapi BM25 with
  * the Lucene idf (`ln(1 + (N - df + 0.5)/(df + 0.5))`, always ≥ 0).
  *
  * Scale shape (the inverted-index plan, without materializing an
  * index): the corpus is tokenized once into a (doc, term, tf, len)
  * frame — one explode + one partial->final hash aggregate, the only
  * corpus-wide shuffle. Document frequencies aggregate that frame down
  * to vocabulary size; corpus cardinality/avgdl is a broadcast 1-row
  * aggregate (the q44 pattern). The query side is small by construction,
  * so query terms + their idf/avgdl ride a broadcast hash join onto the
  * doc-term frame — non-matching terms die in the join, and only matched
  * (query, doc) rows reach the scoring aggregate. Per-query top-K is a
  * rank window pruned map-side by WindowGroupLimit (the q04 pattern), so
  * the per-query partition never collects more than K rows per task.
  *
  * Float caveat: the document score sums per-term double contributions
  * in aggregation order, so ranking is spec-tested on behavior (tf
  * monotonicity, rare-term idf dominance, length normalization) like
  * [[QualityClassifier]]/[[NgramLm]] scoring; the integer match
  * statistics underneath ([[matchStats]]) are oracle-hashed (q69).
  */
object Bm25 {

  /** (doc_id, term, tf, len): whitespace tokens of the lowercased text,
    * term frequency per document, document length in tokens. One
    * explode + one hash aggregate — the tokenizer is [[TextOps.tokensSql]]
    * so the frame is engine-portable.
    */
  def docTermFreqs(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        expr(TextOps.tokensSql(s"lower($textCol)")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("len"),
        explode(col("toks")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("len")).as("len"))

  /** Distinct (query_id, term) pairs of the lowercased query text.
    * `private[operators]`: [[HybridRetrieval]]'s rank kernel derives its
    * query-term sets from THIS frame so the two paths can never drift on
    * tokenization.
    */
  private[operators] def queryTerms(
      queries: DataFrame, qidCol: String, qtextCol: String): DataFrame =
    queries.select(col(qidCol).as("query_id"),
        explode(expr(
          s"array_distinct(${TextOps.tokensSql(s"lower($qtextCol)")})"))
          .as("term"))

  /** The oracle-checkable integer core of retrieval: for every (query,
    * document) pair sharing at least one term — the inverted-index
    * candidate set — the summed term frequency over matched terms, the
    * matched-term count, and the document length. Exactly the inputs
    * BM25 folds into a score, minus the float idf/normalization.
    */
  def matchStats(
      docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String): DataFrame =
    docTermFreqs(docs, idCol, textCol)
      .join(broadcast(queryTerms(queries, qidCol, qtextCol)), Seq("term"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("tf")).as("sum_tf"),
        count(lit(1)).as("n_terms"),
        max(col("len")).as("doc_len"))

  /** Top-K documents per query under BM25. Output: (query_id, doc_id,
    * score, rn) with rn in [1, k], ties broken by ascending doc id so
    * the ranking is total and retry-deterministic.
    */
  def topK(
      docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val dtf = docTermFreqs(docs, idCol, textCol)
    // corpus cardinality + average doc length: broadcast 1-row aggregate
    val global = dtf.groupBy(col("doc_id")).agg(max(col("len")).as("len"))
      .agg(count(lit(1)).cast("double").as("n_docs"),
        avg(col("len")).as("avgdl"))
    // per-term document frequency (vocabulary-sized), restricted to the
    // query vocabulary before the idf math — qIdf is query-terms-sized
    val qIdf = dtf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
      .join(broadcast(queryTerms(queries, qidCol, qtextCol)), Seq("term"))
      .join(broadcast(global))
      .select(col("query_id"), col("term"), col("avgdl"),
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))).as("idf"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    dtf
      .join(broadcast(qIdf), Seq("term"))
      .select(col("query_id"), col("doc_id"),
        (col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) +
            lit(b) * col("len").cast("double") / col("avgdl"))))
          .as("contrib"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("contrib")).as("score"))
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter(col("rn") <= k)
  }
}
