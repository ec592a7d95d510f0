package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{AnnIndexStore, Similarity}

/** Price the durable standing ANN index (graft.operators.AnnIndexStore)
  * against brute-force cosine as the corpus grows: the IVF contract is
  * that a query reads ~nprobe/cells of the index, so with cell count
  * scaled to the corpus the lookup cost decouples from corpus size while
  * brute force grows linearly. Index builds (train + assign + write) are
  * untimed — they are the standing corpus, amortized over its life; the
  * timed section is the query path both ways.
  *
  * Replicas jitter each copy's vectors deterministically (the ScaleUp
  * discipline) so cells spread instead of producing copy-count-way ties.
  */
object AnnBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val dim = base.select(size(col("embedding"))).head().getInt(0)

    def replicate(times: Int) = base
      .crossJoin(spark.range(times).select(col("id").as("rep")))
      .select(
        (col("vec_id") + col("rep") * 100000000L).as("vec_id"),
        expr("transform(embedding, (x, j) -> CAST(x + " +
          "CASE WHEN rep = 0 THEN CAST(0.0 AS FLOAT) ELSE " +
          "CAST(((rep * 31 + j * 7) % 13 - 6) AS FLOAT) * CAST(0.01 AS FLOAT) " +
          "END AS FLOAT))").as("embedding"))
      .repartition(32)

    val queries = base.limit(10).localCheckpoint(true)
    def sec[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    println("| index rows | cells | store query (s) | brute force (s) |")
    var lastRoot: String = null
    var lastCorpus: org.apache.spark.sql.DataFrame = null
    Seq((10, 64), (100, 256), (1000, 1024)).foreach { case (times, cells) =>
      val corpus = replicate(times).localCheckpoint(true)
      val n = corpus.count()
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-annbench-$times").toString
      lastRoot = root; lastCorpus = corpus
      AnnIndexStore.build(spark, root, corpus, "vec_id", "embedding",
        dim, numCentroids = cells, lloydRounds = 1)
      // warmup both paths once
      AnnIndexStore.query(spark, root, queries, "vec_id", "embedding",
        k = 5, nprobe = 4).count()
      Similarity.cosineTopK(queries, corpus, "vec_id", "embedding",
        dim, k = 5).count()
      val (_, tStore) = sec(AnnIndexStore.query(
        spark, root, queries, "vec_id", "embedding", k = 5, nprobe = 4)
        .count())
      val (_, tBrute) = sec(Similarity.cosineTopK(
        queries, corpus, "vec_id", "embedding", dim, k = 5).count())
      println(f"| $n | $cells | $tStore%.2f | $tBrute%.2f |")
    }

    // batch-scale query arm: a 100k-probe set (a "day of embeddings"
    // re-deduplicated against the store) must take the shuffle-on-cell
    // path — broadcasting 100k float vectors is the driver-OOM shape the
    // size switch exists to avoid. Assert the plan, then time it.
    val batchQ = lastCorpus.limit(100000).localCheckpoint(true)
    val nq = batchQ.count()
    val big = AnnIndexStore.query(spark, lastRoot, batchQ,
      "vec_id", "embedding", k = 5, nprobe = 4)
    big.count() // warmup
    val plan = big.queryExecution.executedPlan.toString
    require(!plan.contains("BroadcastExchange"),
      "batch query must not broadcast the probe side:\n" + plan.take(3000))
    val (pairs, tBatch) = sec(AnnIndexStore.query(spark, lastRoot, batchQ,
      "vec_id", "embedding", k = 5, nprobe = 4).count())
    println(f"| batch-query arm: $nq probes -> $pairs pairs | " +
      f"shuffle-on-cell | $tBatch%.2f s | no probe-side broadcast |")
    spark.stop()
  }
}
