package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase attribution for the durable frontier's per-round commit at
  * live-crawl scale (the LiveCrawlBench A/B's delta): N merge rounds of
  * crawl-sized update batches into a 64-bucket store, with
  * `-Dgraft.frontier.phases=true` walls from [[graft.crawl.FrontierStore
  * .mergeInto]] on stderr. Usage: FrontierCommitProbe [rounds] [rowsPerRound]
  * [buckets] [storeRows]
  */
object FrontierCommitProbe {
  def main(args: Array[String]): Unit = {
    val rounds = args.lift(0).map(_.toInt).getOrElse(10)
    val perRound = args.lift(1).map(_.toInt).getOrElse(800)
    val buckets = args.lift(2).map(_.toInt).getOrElse(64)
    val storeRows = args.lift(3).map(_.toInt).getOrElse(13000)
    System.setProperty("graft.frontier.phases", "true")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_commitprobe").toString + "/frontier"
    def rows(n: Int, seed: Int) = (0 until n).map { i =>
      val d = (i * 37 + seed) % 400
      (s"http://d$d.com/p${seed}_$i", s"d$d.com", "UNFETCHED",
        seed * 1000L + i, 1.0f, 0L)
    }.toDF("url", "pld", "status", "statusTime", "score", "nextFetchTime")
    graft.crawl.FrontierStore.mergeInto(spark, root, rows(storeRows, 0), buckets)
    val walls = (1 to rounds).map { r =>
      val t0 = System.nanoTime()
      graft.crawl.FrontierStore.mergeInto(spark, root, rows(perRound, r), buckets)
      val w = (System.nanoTime() - t0) / 1e6
      System.err.println(f"[commit-probe] round $r total $w%.0f ms")
      w
    }
    println(f"""{"metric":"frontier_commit","rounds":$rounds,"rows_per_round":$perRound,"buckets":$buckets,"mean_ms":${walls.sum / rounds}%.0f,"min_ms":${walls.min}%.0f,"max_ms":${walls.max}%.0f}""")
    spark.stop()
  }
}
