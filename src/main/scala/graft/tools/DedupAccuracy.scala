package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Measure the signature-estimate dedup path (the 100 TB default,
  * `minhashDedupPairsApprox` — never re-reads text) against exact
  * shingle-Jaccard ground truth (`ngramJaccardPairs`, all-shingles mode)
  * on the real documents table: precision/recall of the PAIR SET at the
  * dedup thresholds, plus the exact-verify hybrid
  * (`minhashDedupPairs` = LSH candidates + exact Jaccard verify) for
  * reference. This prices the accuracy side of the "sig-only by default"
  * claim that PERF_NOTES prices on the cost side (q49 vs q31).
  *
  * Usage: DedupAccuracy [sfDir] [thresholds...]
  */
object DedupAccuracy {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val thresholds =
      if (args.length > 1) args.tail.map(_.toDouble).toSeq else Seq(0.5, 0.7)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    println("| t | exact pairs | sig-est pairs | sig P | sig R |" +
      " verified pairs | verified P | verified R |")
    thresholds.foreach { t =>
      val exact = pairSet(TextOps.ngramJaccardPairs(
        docs, "doc_id", "text", k = 3, threshold = t,
        maxDocFrequency = None))
      val approx = pairSet(TextOps.minhashDedupPairsApprox(
        docs, "doc_id", "text", 3, 16, 4, t))
      val verified = pairSet(TextOps.minhashDedupPairs(
        docs, "doc_id", "text", 3, 16, 4, t))
      def pr(got: Set[(Long, Long)]) = (
        if (got.isEmpty) 1.0 else (got & exact).size.toDouble / got.size,
        if (exact.isEmpty) 1.0 else (got & exact).size.toDouble / exact.size)
      val (ap, ar) = pr(approx)
      val (vp, vr) = pr(verified)
      println(f"| $t%.2f | ${exact.size} | ${approx.size} | $ap%.3f | $ar%.3f" +
        f" | ${verified.size} | $vp%.3f | $vr%.3f |")
    }

    // ---- estimator calibration in the BORDERLINE regime ----
    // The corpus's native near-dups sit far above the thresholds (easy).
    // Build known-jaccard pairs spanning the boundary: each doc gets a
    // variant with its tail fraction f replaced by unique junk tokens
    // (f = 0.05..0.65 by doc id), pair (i, i+10M) has exact jaccard
    // ~ (1-f)/(1+f). Report, per exact-jaccard band, the mean signature
    // estimate and how often estimate-vs-exact AGREE on the t=0.5 cut —
    // the number that says what the sig-only default costs at the
    // boundary, for the 16-hash default and the 64-hash dial.
    val base = docs.select(col("doc_id"), col("text"))
    val variant = base.select((col("doc_id") + 10000000L).as("doc_id"),
      expr("""concat_ws(' ',
        concat_ws(' ', slice(split(trim(text), '\\s+'), 1,
          cast(ceil(size(split(trim(text), '\\s+')) *
            (1.0 - (0.05 + (doc_id % 7) * 0.1))) as int))),
        concat_ws(' ', transform(
          sequence(1, size(split(trim(text), '\\s+')) -
            cast(ceil(size(split(trim(text), '\\s+')) *
              (1.0 - (0.05 + (doc_id % 7) * 0.1))) as int)),
          j -> concat('zq', doc_id, 'x', j))))""").as("text"))
    val both = base.unionByName(variant)
    def sigs(k: Int) = TextOps.minhashSignatures(both, "doc_id", "text", 3, k)
    val sh = both.select(col("doc_id"),
      TextOps.shingleUdf(3)(col("text")).as("sh"))
    val pairs = sh.select(col("doc_id").as("id"), col("sh").as("sha"))
      .join(sh.select((col("doc_id") - 10000000L).as("id"),
        col("sh").as("shb")), Seq("id"))
      .select(col("id"),
        (size(array_intersect(col("sha"), col("shb"))).cast("double") /
          size(array_union(col("sha"), col("shb")))).as("j_exact"))
    def estCol(k: Int) = (size(expr(
      "filter(zip_with(siga, sigb, (x, y) -> x = y), b -> b)"))
      .cast("double") / k).as("j_est")
    // (k, bandSize): shipped defaults 4x4 and 16x4, plus the band
    // planner's t=0.5 answer for 16 hashes (lshBandPlan(16, 0.5) = 8x2,
    // knee at (1/8)^(1/2) = 0.35) — the measured S-curves validate the
    // planner's choice at the boundary
    Seq((16, 4), (16, 2), (64, 4)).foreach { case (k, bandSize) =>
      val s = sigs(k)
      // the second factor in end-to-end recall: does LSH BANDING even
      // surface the pair as a candidate? (theory: 1 - (1 - j^r)^b)
      val cand = TextOps.minhashCandidates(both, "doc_id", "text",
          3, k, bandSize)
        .filter(col("id_b") - col("id_a") === 10000000L)
        .select(col("id_a").as("id"), lit(1).as("cand"))
      val est = pairs
        .join(s.select(col("doc_id").as("id"), col("sig").as("sigb")),
          Seq("id"))
        .join(s.select((col("doc_id") - 10000000L).as("id"),
          col("sig").as("siga")), Seq("id"))
        .join(cand, Seq("id"), "left")
        .select(col("j_exact"), estCol(k),
          coalesce(col("cand"), lit(0)).as("cand"))
      val bands = est
        .groupBy(floor(col("j_exact") * 10).cast("int").as("band"))
        .agg(count(lit(1)).as("n"), avg("j_exact").as("mean_exact"),
          avg("j_est").as("mean_est"),
          avg(when((col("j_est") >= 0.5) === (col("j_exact") >= 0.5), 1.0)
            .otherwise(0.0)).as("agree05"),
          avg(col("cand").cast("double")).as("band_recall"))
        .orderBy("band").collect()
      println(s"\ncalibration, numHashes=$k, bands=${k / bandSize}x$bandSize " +
        "(band = exact-jaccard decile; agree05 = sig-vs-exact agreement " +
        "on the 0.5 cut; band_recall = fraction surfaced as an LSH " +
        "candidate at all)")
      println("| j band | n | mean exact | mean est | agree@0.5 | band recall |")
      bands.foreach { r =>
        println(f"| ${r.getInt(0) / 10.0}%.1f | ${r.getLong(1)} " +
          f"| ${r.getDouble(2)}%.3f | ${r.getDouble(3)}%.3f " +
          f"| ${r.getDouble(4)}%.3f | ${r.getDouble(5)}%.3f |")
      }
    }
    spark.stop()
  }
}
