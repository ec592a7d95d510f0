package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** ANN quality measurement (PERF_NOTES §ANN recall): recall@k of each
  * approximate index against the exact brute-force top-k on the driver
  * embeddings table — an ANN path is only a "scale path" if its recall is
  * known. Prints one JSON line with recall and wall time per method.
  */
object RecallBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = graft.queries.Tables.table(spark, dir, "embeddings")
    val queries = e.filter(col("vec_id") % 50 === 0)
    val centroids = e.filter(col("vec_id") % 100 === 0)

    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val (truth, exactSec) = timed(pairs(
      Similarity.cosineTopK(queries, e, "vec_id", "embedding", 64, k)))

    def recallOf(approx: Set[(Long, Long)]): Double =
      if (truth.isEmpty) 1.0
      else approx.intersect(truth).size.toDouble / truth.size

    val (lsh, lshSec) = timed(pairs(Similarity.annTopK(
      queries, e, "vec_id", "embedding", 64, numPlanes = 16, k)))
    val (ivf1, ivf1Sec) = timed(pairs(Similarity.ivfTopK(
      queries, e, centroids, "vec_id", "embedding", "vec_id", "embedding",
      64, k)))
    val (ivf2, ivf2Sec) = timed(pairs(Similarity.ivfTopKProbed(
      queries, e, centroids, "vec_id", "embedding", "vec_id", "embedding",
      64, k, nprobe = 2)))
    val (ivf4, ivf4Sec) = timed(pairs(Similarity.ivfTopKProbed(
      queries, e, centroids, "vec_id", "embedding", "vec_id", "embedding",
      64, k, nprobe = 4)))

    // k-means-trained coarse quantizer: same centroid COUNT, 5 Lloyd
    // rounds from the hash-sampled init — isolates how much recall the
    // training step buys at fixed probe cost
    val (km, kmTrainSec) = timed(
      Similarity.kmeansRefine(e, centroids, "vec_id", "embedding", 64, 5)
        .localCheckpoint(true))
    val (ivfKm1, ivfKm1Sec) = timed(pairs(Similarity.ivfTopKProbed(
      queries, e, km, "vec_id", "embedding", "cent_id", "cv", 64, k,
      nprobe = 1)))
    val (ivfKm2, ivfKm2Sec) = timed(pairs(Similarity.ivfTopKProbed(
      queries, e, km, "vec_id", "embedding", "cent_id", "cv", 64, k,
      nprobe = 2)))

    // PQ (m=8 subspaces, 16 codes each): 8 bytes/vector vs 256 — the
    // 32x memory path. Normalize first so ADC inner product ~ cosine.
    val en = e
      .withColumn("n", graft.plans.VectorExpressions.norm(col("embedding")))
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x / n as float))")
          .as("embedding"))
      .localCheckpoint(true)
    val enq = en.filter(col("vec_id") % 50 === 0)
    val (pqCb, pqTrainSec) = timed(Similarity.pqTrain(
      en, "vec_id", "embedding", 64, m = 8, ksub = 16, iters = 3)
      .localCheckpoint(true))
    val (pqEnc, pqEncSec) = timed(Similarity.pqEncode(
      en, "vec_id", "embedding", pqCb, 64, m = 8).localCheckpoint(true))
    val (pq, pqSec) = timed(pairs(Similarity.pqTopK(
      enq, pqEnc, pqCb, "vec_id", "embedding", 64, m = 8, k)))
    // finer grain: m=16 (4-dim subspaces) = 16 bytes/vector, 16x
    val (pqCb16, pqTrain16Sec) = timed(Similarity.pqTrain(
      en, "vec_id", "embedding", 64, m = 16, ksub = 16, iters = 3)
      .localCheckpoint(true))
    val (pqEnc16, _) = timed(Similarity.pqEncode(
      en, "vec_id", "embedding", pqCb16, 64, m = 16).localCheckpoint(true))
    val (pq16, pq16Sec) = timed(pairs(Similarity.pqTopK(
      enq, pqEnc16, pqCb16, "vec_id", "embedding", 64, m = 16, k)))
    // same codes + exact rerank of a 20k-deep ADC shortlist: isolates how
    // much recall ADC RANKING loses vs what survives into the shortlist
    // (shortlist must cover the semantic cluster the true neighbors live
    // in — ~100 members in the clustered fixture)
    val (pq16r, pq16rSec) = timed(pairs(Similarity.pqTopKRerank(
      enq, pqEnc16, pqCb16, en, "vec_id", "embedding", 64, m = 16, k,
      shortlist = 20 * k)))

    // composed IVF+PQ (km-trained cells, m=16 codes, nprobe=4): cell cut
    // AND compressed scan — the billion-scale layout
    val (ivfpq, ivfpqSec) = timed(pairs(Similarity.ivfPqTopK(
      enq, en, km, pqCb16, "vec_id", "embedding", "cent_id", "cv",
      64, m = 16, k, nprobe = 4)))

    println(f"""{"bench":"ann_recall","k":$k,"truth_pairs":${truth.size},""" +
      f""""exact_sec":$exactSec%.2f,""" +
      f""""lsh16":{"recall":${recallOf(lsh)}%.3f,"sec":$lshSec%.2f},""" +
      f""""ivf_np1":{"recall":${recallOf(ivf1)}%.3f,"sec":$ivf1Sec%.2f},""" +
      f""""ivf_np2":{"recall":${recallOf(ivf2)}%.3f,"sec":$ivf2Sec%.2f},""" +
      f""""ivf_np4":{"recall":${recallOf(ivf4)}%.3f,"sec":$ivf4Sec%.2f},""" +
      f""""kmeans_train_sec":$kmTrainSec%.2f,""" +
      f""""ivf_km_np1":{"recall":${recallOf(ivfKm1)}%.3f,"sec":$ivfKm1Sec%.2f},""" +
      f""""ivf_km_np2":{"recall":${recallOf(ivfKm2)}%.3f,"sec":$ivfKm2Sec%.2f},""" +
      f""""pq_m8_k16":{"recall":${recallOf(pq)}%.3f,"train_sec":$pqTrainSec%.2f,""" +
      f""""enc_sec":$pqEncSec%.2f,"sec":$pqSec%.2f},""" +
      f""""pq_m16_k16":{"recall":${recallOf(pq16)}%.3f,""" +
      f""""train_sec":$pqTrain16Sec%.2f,"sec":$pq16Sec%.2f},""" +
      f""""pq_m16_rerank":{"recall":${recallOf(pq16r)}%.3f,"sec":$pq16rSec%.2f},""" +
      f""""ivfpq_m16_np4":{"recall":${recallOf(ivfpq)}%.3f,"sec":$ivfpqSec%.2f}}""")
    spark.stop()
  }
}
