package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph ranking for crawl frontiers and source weighting.
  *
  * The reference scores domains by a running fetch-feedback average
  * (DomainScore / UrlScorer — see reference FetchUrlsFunction usage); a
  * corpus-level crawler additionally wants a LINK-graph prior (which
  * domains the web itself points at) to seed those scores and to weight
  * sources in a training-data mixture. This is PageRank, expressed the
  * same way [[Components]] expresses label propagation: a bounded number
  * of join+aggregate rounds over an edge table, no driver-side graph.
  *
  * Determinism: ranks are FIXED-POINT integers (`scale` = 1.0). Every
  * operation is 64-bit integer arithmetic — `div` truncation included —
  * so the result is bit-exact regardless of execution order or engine,
  * which makes the whole iteration oracle-checkable (float PageRank sums
  * are order-dependent). The damping update is
  * `r' = scale·(1−d) + (d·Σ contrib) div 1` with d = dampNum/dampDen;
  * integer truncation leaks ≤1 unit of mass per edge per round — at
  * scale=10⁶ that is a 10⁻⁶ relative error, far below the float formula's
  * own convergence tolerance. Dangling-node mass is dropped (the standard
  * simplification); ranks are a prior, not a probability distribution.
  *
  * Scale shape: edges are staged ONCE with their out-degree attached and
  * hash-partitioned by src (`localCheckpoint` pins the staged table and
  * truncates lineage); each round is one equi-join (ranks shuffled to the
  * edge partitioning) plus one hash aggregation on dst — the identical
  * per-round cost profile as [[Components.connectedComponents]], with the
  * round count an explicit budget rather than data-dependent. Long
  * arithmetic headroom: total mass is n_nodes·scale, so scale=10⁶ holds
  * to ~9×10¹² nodes before Σ-overflow — beyond any real web graph.
  */
object LinkRank {

  /** `iters` rounds of fixed-point PageRank over `edges(srcCol, dstCol)`.
    * Self-loops dropped, duplicate edges collapsed. Node ids keep the
    * caller's type (numeric page ids, string PLDs — anything joinable).
    * Returns (node_id, rank_fp) with rank_fp in units of 1/scale.
    */
  def pageRankFixedPoint(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, scale: Long = 1000000L,
      dampNum: Long = 85L, dampDen: Long = 100L): DataFrame =
    pageRankWithPlan(edges, srcCol, dstCol, iters, scale, dampNum, dampDen)._1

  /** [[pageRankFixedPoint]] plus the first round's physical plan, captured
    * BEFORE checkpoint truncation hides it — what plan-regression tests
    * assert (equi-joins and hash aggregation only; a cartesian or
    * nested-loop shape here multiplies by the round count at scale).
    * Every later round runs the identical plan over new inputs.
    */
  def pageRankWithPlan(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, scale: Long = 1000000L,
      dampNum: Long = 85L, dampDen: Long = 100L): (DataFrame, String) = {
    require(iters >= 0 && dampNum >= 0 && dampNum <= dampDen,
      "need iters >= 0 and 0 <= dampNum <= dampDen")
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    // out-degree rides each edge row so the per-round join needs no
    // second lookup; repartition by src so every round's rank join
    // reuses one staged partitioning
    val withDeg = e.join(e.groupBy("src").agg(count(lit(1)).as("deg")), Seq("src"))
      .repartition(col("src"))
      .localCheckpoint(true)
    // derive nodes from the CHECKPOINTED edges: withDeg holds exactly e's
    // (src, dst) rows, so this reads the pinned blocks instead of
    // re-running the scan+filter+distinct edge subtree a second time
    // (no ReusedExchange fires across separate actions)
    val nodes = withDeg.select(col("src").as("node_id"))
      .union(withDeg.select(col("dst").as("node_id")))
      .distinct()
      .localCheckpoint(true)
    val base = scale * (dampDen - dampNum) / dampDen
    var ranks = nodes.withColumn("r", lit(scale))
    var roundPlan = ""
    for (i <- 1 to iters) {
      val contrib = withDeg
        .join(ranks.withColumnRenamed("node_id", "src"), Seq("src"))
        .select(col("dst").as("node_id"), expr("r div deg").as("c"))
        .groupBy("node_id").agg(sum(col("c")).as("s"))
      val next = nodes
        .join(contrib, Seq("node_id"), "left")
        .select(col("node_id"),
          expr(s"cast($base as bigint) + (($dampNum * coalesce(s, " +
            s"cast(0 as bigint))) div $dampDen)").as("r"))
      if (i == 1) roundPlan = next.queryExecution.executedPlan.toString
      // each round's result replaces the last — truncate lineage so the
      // driver plan stays O(1) across rounds (the Components discipline)
      ranks = next.localCheckpoint(true)
    }
    (ranks.select(col("node_id"), col("r").as("rank_fp")), roundPlan)
  }
}
