package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decompose the sf1 outliers (PERF_NOTES §sf1 scale probe): per-stage
  * counts and warm timings for the queries whose Spark/oracle ratio
  * degraded >3× from sf0.1 — q19 (exact shingle join), q15 (distinct-path
  * count), q09/q10/q11 (TPC-H joins). Prints one line per measurement.
  */
object Sf1Audit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/bench-sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[sf1-audit] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    def dropLeftoverBlocks(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    // ---- q19: barrier-free self-join must share one exchange
    val docs = graft.queries.Tables.table(spark, dir, "documents")
    val q19 = graft.operators.TextOps.ngramJaccardPairs(
      docs, "doc_id", "text", k = 3, threshold = 0.5,
      maxDocFrequency = None)
    time("q19 full exact")(q19.count())
    val q19Plan = q19.queryExecution.executedPlan.toString
    println(s"[sf1-audit] q19 ReusedExchange in final plan: " +
      q19Plan.contains("ReusedExchange"))
    dropLeftoverBlocks()
    time("q19 full exact (repeat)")(graft.operators.TextOps.ngramJaccardPairs(
      docs, "doc_id", "text", k = 3, threshold = 0.5,
      maxDocFrequency = None).count())
    dropLeftoverBlocks()
    time("q47 guarded")(graft.operators.TextOps.ngramJaccardPairs(
      docs, "doc_id", "text", k = 3, threshold = 0.5).count())
    dropLeftoverBlocks()

    // ---- q15 decomposition
    time("q15 as-is")(graft.queries.Crawler.urlParse(spark, dir).count())
    time("q15 as-is (warm)")(graft.queries.Crawler.urlParse(spark, dir).count())

    // ---- join trio warm timings
    time("q09 warm 1")(graft.queries.Relational.joinMultiRevenue(spark, dir).count())
    time("q09 warm 2")(graft.queries.Relational.joinMultiRevenue(spark, dir).count())
    time("q10 warm")(graft.queries.Relational.queries("q10_semi_join")(spark, dir).count())
    time("q11 warm")(graft.queries.Relational.queries("q11_anti_join")(spark, dir).count())
    println("[sf1-audit] q09 final plan:")
    val q09 = graft.queries.Relational.joinMultiRevenue(spark, dir)
    q09.collect()
    println(q09.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
