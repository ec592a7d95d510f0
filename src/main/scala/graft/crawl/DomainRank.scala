package graft.crawl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.LinkRank
import graft.plans.UrlExpressions

/** Domain-level link-graph prior for the crawl's scoring loop.
  *
  * The reference scores domains purely from fetch FEEDBACK (running page
  * scores per domain — reference CrawlTopology's domain-score iteration);
  * that loop is cold-start blind: a never-fetched domain has no score
  * until pages come back. The web's own link structure is the natural
  * prior — domains that many crawled pages point at are worth budget
  * first. This derives a PLD→PLD edge table from page outlinks (native
  * codegen PLD extraction, cross-domain edges only — intra-site nav says
  * nothing about external reputation) and runs the oracle-gated
  * fixed-point PageRank ([[LinkRank.pageRankFixedPoint]]) over it.
  *
  * Scale shape: edge derivation is a projection + distinct (one shuffle
  * on the pld pair); the rank loop is LinkRank's bounded join+agg rounds.
  * The PLD graph is orders of magnitude smaller than the page graph —
  * this is the form that stays cheap on a 100 TB crawl.
  */
object DomainRank {

  /** Distinct cross-domain pld→pld edges from an outlink frame of
    * (source page URL, target URL). Unparseable hosts drop out.
    */
  def domainEdges(
      outlinks: DataFrame, srcUrlCol: String, dstUrlCol: String): DataFrame =
    outlinks
      .select(
        UrlExpressions.extract_pld(col(srcUrlCol)).as("src_pld"),
        UrlExpressions.extract_pld(col(dstUrlCol)).as("dst_pld"))
      .filter(col("src_pld") =!= "" && col("dst_pld") =!= "")
      .filter(col("src_pld") =!= col("dst_pld"))
      .distinct()

  /** (pld, rank_fp) fixed-point link rank over the domain graph. */
  def domainRank(
      outlinks: DataFrame, srcUrlCol: String, dstUrlCol: String,
      iters: Int = 5): DataFrame =
    LinkRank.pageRankFixedPoint(
      domainEdges(outlinks, srcUrlCol, dstUrlCol),
      "src_pld", "dst_pld", iters)
      .withColumnRenamed("node_id", "pld")

  /** Rank normalized into the crawl's [0, 1] float score band — the
    * cold-start seed score for [[CrawlTopology]] candidates (the
    * feedback loop then takes over once fetches return). The max joins
    * in as a broadcast 1-row aggregate.
    */
  def seedScores(rank: DataFrame): DataFrame =
    rank
      .crossJoin(broadcast(rank.agg(
        greatest(max(col("rank_fp")), lit(1L)).as("max_fp"))))
      .select(col("pld"),
        (col("rank_fp").cast("double") / col("max_fp").cast("double"))
          .cast("float").as("prior"))
}
