package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AnnIndexStore, Similarity}

/** Measure the frozen-quantizer drift problem and its managed escape
  * (PERF_NOTES §ANN drift): an [[AnnIndexStore]] is built on one
  * clustered distribution, then fed a batch stream drawn from a SHIFTED
  * cluster set. Queries from the drifted distribution land in cells the
  * build-time sample never saw, so bounded-nprobe recall decays — the
  * geometry sensitivity RecallBench measured on static fixtures, now as
  * a store lifecycle. [[AnnIndexStore.rebuild]] retrains on the standing
  * corpus (old + drifted) into a fresh root; recall at the same nprobe
  * must recover.
  *
  * Prints one JSON line: recall@k before drift, after drift, and after
  * rebuild, plus the rebuild's wall time. Deterministic fixture (fixed
  * seeds, the [[ClusteredEmbeddings]] mixture construction).
  */
object DriftBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val clusters = args.lift(1).map(_.toInt).getOrElse(32)
    val dim = args.lift(2).map(_.toInt).getOrElse(64)
    val k = args.lift(3).map(_.toInt).getOrElse(5)
    val nprobe = args.lift(4).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def mixture(seed: Int, idBase: Long): DataFrame = {
      val rnd = new scala.util.Random(seed)
      def unit(v: Array[Double]): Array[Double] = {
        val nrm = math.sqrt(v.map(x => x * x).sum).max(1e-12)
        v.map(_ / nrm)
      }
      val centers =
        Array.fill(clusters)(unit(Array.fill(dim)(rnd.nextGaussian())))
      val rows = (0L until n).map { i =>
        val comp = rnd.nextInt(clusters)
        val v = unit(centers(comp).map(x => x + 0.15 * rnd.nextGaussian()))
        (idBase + i, v.map(_.toFloat).toSeq)
      }
      spark.createDataset(rows).toDF("vec_id", "embedding").repartition(32)
        .localCheckpoint(true)
    }

    val original = mixture(seed = 4242, idBase = 0L)
    val drifted = mixture(seed = 9999, idBase = 10000000L)
    // drifted queries, NOT members of the index (ids disjoint from both)
    val queries = mixture(seed = 7777, idBase = 20000000L)
      .filter(col("vec_id") % (n / 50).max(1) === 0)
      .localCheckpoint(true)

    def recall(root: String, corpus: DataFrame): Double = {
      def pairs(df: DataFrame) =
        df.select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val truth = pairs(Similarity.cosineTopK(
        queries, corpus, "vec_id", "embedding", dim, k))
      val approx = pairs(AnnIndexStore.query(
        spark, root, queries, "vec_id", "embedding", k, nprobe))
      if (truth.isEmpty) 1.0
      else approx.intersect(truth).size.toDouble / truth.size
    }

    val root = java.nio.file.Files
      .createTempDirectory("graft-drift").toString
    AnnIndexStore.build(spark, root, original, "vec_id", "embedding",
      dim, numCentroids = clusters, lloydRounds = 3)
    val beforeDrift = recall(root, original)

    // the drifted stream lands in 4 appends (a compressed loop history)
    (0 until 4).foreach { b =>
      AnnIndexStore.append(spark, root,
        drifted.filter(col("vec_id") % 4 === b), "vec_id", "embedding",
        b + 1L)
    }
    val standing = original.unionByName(drifted).localCheckpoint(true)
    val afterDrift = recall(root, standing)

    val newRoot = java.nio.file.Files
      .createTempDirectory("graft-drift-rb").toString
    val t0 = System.nanoTime()
    AnnIndexStore.rebuild(spark, root, newRoot,
      numCentroids = clusters, lloydRounds = 3)
    val rebuildSec = (System.nanoTime() - t0) / 1e9
    val afterRebuild = recall(newRoot, standing)

    println(f"""{"bench":"ann_drift","n":$n,"clusters":$clusters,""" +
      f""""dim":$dim,"k":$k,"nprobe":$nprobe,""" +
      f""""recall_before_drift":$beforeDrift%.3f,""" +
      f""""recall_after_drift":$afterDrift%.3f,""" +
      f""""recall_after_rebuild":$afterRebuild%.3f,""" +
      f""""rebuild_sec":$rebuildSec%.2f}""")
    spark.stop()
  }
}
