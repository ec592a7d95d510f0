package graft.tools

import org.apache.spark.sql.SparkSession

/** Synthesize a CLUSTERED embedding table — mixture of Gaussians on the
  * unit sphere — for RecallBench (PERF_NOTES §ANN recall on clustered
  * data). The driver-generated embeddings are uniform random, which is
  * the degenerate case for every structure-exploiting index: k-means
  * training cannot beat random centroids when there are no clusters, and
  * PQ subspace codebooks see maximal quantization error. Real text/image
  * embeddings are strongly clustered; this fixture measures the recall
  * the IVF/PQ family was built to deliver.
  *
  * Deterministic (fixed seed), schema-compatible with the driver table
  * (vec_id, embedding float[], label = true mixture component). Usage:
  * ClusteredEmbeddings [outDir] [nVecs] [nClusters] [dim] [noise].
  */
object ClusteredEmbeddings {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/root/repo/target/clustered-emb")
    val n = args.lift(1).map(_.toInt).getOrElse(20000)
    val c = args.lift(2).map(_.toInt).getOrElse(50)
    val dim = args.lift(3).map(_.toInt).getOrElse(64)
    val noise = args.lift(4).map(_.toDouble).getOrElse(0.15)

    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val rnd = new scala.util.Random(4242)
    def unit(v: Array[Double]): Array[Double] = {
      val nrm = math.sqrt(v.map(x => x * x).sum).max(1e-12)
      v.map(_ / nrm)
    }
    val centers = Array.fill(c)(unit(Array.fill(dim)(rnd.nextGaussian())))
    val rows = (0L until n).map { i =>
      val comp = rnd.nextInt(c)
      val v = unit(centers(comp).map(x => x + noise * rnd.nextGaussian()))
      (i, v.map(_.toFloat).toSeq, comp)
    }
    spark.createDataset(rows).toDF("vec_id", "embedding", "label")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    println(s"[clustered-emb] $n vecs, $c clusters, dim $dim, " +
      s"noise $noise -> $out/embeddings.parquet")
    spark.stop()
  }
}
