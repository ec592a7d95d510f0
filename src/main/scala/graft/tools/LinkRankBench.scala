package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-round cost of LinkRank.pageRankFixedPoint at multi-million-edge
  * scale, with a pathological hub (one node receiving an edge from EVERY
  * node) to prove the contribution aggregation survives extreme in-degree
  * skew via map-side partial aggregation. Reported in PERF_NOTES.
  *
  * Usage: LinkRankBench [nodes,nodes,...] (default "200000,2000000";
  * each node emits 10 edges → 2M / 20M edge graphs).
  */
object LinkRankBench {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("200000,2000000")
      .split(",").map(_.trim.toLong)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    sizes.foreach { n =>
      // 9 hashed edges per node (Poisson-ish in-degree) + 1 hub edge from
      // every node to node 0 (in-degree n — the skew stressor)
      val edges = spark.range(n).toDF("src")
        .select(col("src"), explode(expr("sequence(1, 10)")).as("k"))
        .select(col("src"),
          when(col("k") === 10, lit(0L))
            .otherwise(pmod(xxhash64(col("src"), col("k")), lit(n)))
            .as("dst"))
        .localCheckpoint(true) // price the rank loop, not edge synthesis
      val nEdges = edges.count()

      def run(iters: Int): (Long, Double) = {
        val (df, t) = timed {
          graft.operators.LinkRank.pageRankFixedPoint(
            edges, "src", "dst", iters)
        }
        (df.agg(sum("rank_fp")).first().getLong(0), t)
      }
      // warm codegen once, then measure 1 vs 5 rounds: the staging cost
      // (degree join + repartition) amortizes, per-round = (t5-t1)/4
      run(1)
      val (mass1, t1) = run(1)
      val (mass5, t5) = run(5)
      val perRound = (t5 - t1) / 4.0
      println(f"[linkrank-bench] nodes=$n%d edges=$nEdges%d " +
        f"t1=$t1%.2fs t5=$t5%.2fs perRound=$perRound%.2fs " +
        f"mass1=$mass1%d mass5=$mass5%d")
      // mass sanity: leak-only arithmetic keeps total under n*scale
      require(mass5 <= n * 1000000L, s"mass grew: $mass5")
    }
    spark.stop()
  }
}
