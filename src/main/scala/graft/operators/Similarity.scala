package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.plans.VectorExpressions

/** Similarity search over an embedding column (array<float>).
  *
  * Two paths, as a 100 TB pipeline needs:
  *  - [[cosineTopK]]: exact brute force — the correctness baseline. The
  *    query side is small (broadcast); the corpus streams through one
  *    projection + per-query window top-K. Cost O(|Q| x |corpus| x dim).
  *  - [[lshBuckets]] / [[annTopK]]: random-hyperplane LSH. Each vector gets
  *    a deterministic bucket id from sign bits against fixed pseudo-random
  *    hyperplanes; candidates are an equi-join on bucket (co-partitioned,
  *    no cross product), then exact cosine re-ranks within the bucket.
  *
  * All arithmetic is sequential-fold double math (aggregate over the dim
  * index), so the oracle can reproduce results bit-for-bit with
  * list_reduce in DuckDB — no rounding fudge needed.
  */
object Similarity {

  /** dot(a, b) as a left-fold in doubles. */
  def dotSql(a: String, b: String, dim: Int): String =
    s"""aggregate(transform(sequence(0, ${dim - 1}), d ->
       | cast(element_at($a, d + 1) as double) * cast(element_at($b, d + 1) as double)),
       | cast(0 as double), (s, v) -> s + v)""".stripMargin.replaceAll("\n", " ")

  def normSql(a: String, dim: Int): String =
    s"sqrt(${dotSql(a, a, dim)})"

  def cosineSql(a: String, b: String, dim: Int): String =
    s"${dotSql(a, b, dim)} / (${normSql(a, dim)} * ${normSql(b, dim)})"

  /** Deterministic pseudo-random hyperplane coefficient for (plane j,
    * dim d): ((j*31 + d*17) mod 7) - 3, an integer in [-3, 3].
    */
  def planeCoefSql(j: String, d: String): String =
    s"(($j * 31 + $d * 17) % 7) - 3"

  /** Sign-bit bucket id from `numPlanes` hyperplanes. */
  def bucketSql(vec: String, dim: Int, numPlanes: Int): String =
    s"""aggregate(transform(sequence(0, ${numPlanes - 1}), j ->
       | CASE WHEN aggregate(transform(sequence(0, ${dim - 1}), d ->
       |     cast(element_at($vec, d + 1) as double) * (${planeCoefSql("j", "d")})),
       |     cast(0 as double), (s, v) -> s + v) > 0
       |   THEN shiftleft(1L, j) ELSE 0L END),
       | 0L, (acc, x) -> acc + x)""".stripMargin.replaceAll("\n", " ")

  /** Exact top-K cosine neighbors for each query vector. `queries` and
    * `corpus` must both have (idCol, vecCol); queries are broadcast.
    */
  def cosineTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, dim: Int, k: Int): DataFrame = {
    // norms are per-vector, so compute them once per side, not per pair
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("qv"),
      VectorExpressions.norm(col(vecCol)).as("qn"))
    val c = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      VectorExpressions.norm(col(vecCol)).as("cn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    broadcast(q)
      .join(c, col("query_id") =!= col("neighbor_id"))
      .select(
        col("query_id"), col("neighbor_id"),
        (VectorExpressions.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
          .as("cos"))
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter(col("rn") <= k)
  }

  /** Assign every vector its LSH bucket. */
  def lshBuckets(
      df: DataFrame, idCol: String, vecCol: String,
      dim: Int, numPlanes: Int): DataFrame =
    df.select(
      col(idCol),
      VectorExpressions.lshBucket(col(vecCol), numPlanes).as("bucket"))

  /** Approximate top-K: candidates share the query's bucket (equi-join on
    * bucket — co-partitioned, linear), exact cosine re-rank inside.
    */
  def annTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, dim: Int, numPlanes: Int,
      k: Int): DataFrame = {
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("qv"),
      VectorExpressions.norm(col(vecCol)).as("qn"),
      VectorExpressions.lshBucket(col(vecCol), numPlanes).as("bucket"))
    val c = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      VectorExpressions.norm(col(vecCol)).as("cn"),
      VectorExpressions.lshBucket(col(vecCol), numPlanes).as("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(
        col("query_id"), col("neighbor_id"), col("bucket"),
        (VectorExpressions.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
          .as("cos"))
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter(col("rn") <= k)
  }
}
