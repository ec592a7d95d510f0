package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.BpeTrainer

/** BPE trainer venue crossover (PERF_NOTES §"BPE merge-loop venue"):
  * prices [[BpeTrainer.trainMerges]] (one Spark job round-trip per merge,
  * per-round cost vocabulary-sized) against [[BpeTrainer.trainMergesLocal]]
  * (vocabulary collected once, incremental pair counts in driver memory)
  * on the real sf corpus vocabulary, and verifies both paths emit the
  * SAME ordered merge table while timing them.
  *
  * The distributed loop's cost is dominated by fixed per-round scheduling
  * (~0.3-1 s/merge); the local loop's by the one-time collect + per-merge
  * touched-word rewrites (micro/milliseconds). A production tokenizer is
  * 30k-50k merges, so the venue choice is hours vs minutes — this bench
  * records the measured per-merge costs that justify trainMergesAuto's
  * default.
  */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val distMerges = args.lift(1).map(_.toInt).getOrElse(40)
    val localMerges = args.lift(2).map(_.toInt).getOrElse(2000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val vocab = BpeTrainer.wordFrequencies(docs, "text").cache()
    val vocabSize = vocab.count()

    def sec(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // warmup: one tiny run of each path so codegen/classloading cost is
    // off the books
    BpeTrainer.trainMerges(vocab, 2)
    BpeTrainer.trainMergesLocal(vocab, 2)

    var dist: Seq[(String, String)] = null
    var loc: Seq[(String, String)] = null
    var locBig: Seq[(String, String)] = null
    val tDist = sec { dist = BpeTrainer.trainMerges(vocab, distMerges) }
    val tLoc = sec { loc = BpeTrainer.trainMergesLocal(vocab, distMerges) }
    val tLocBig = sec { locBig = BpeTrainer.trainMergesLocal(vocab, localMerges) }
    require(dist == loc,
      s"venue mismatch at $distMerges merges: $dist vs $loc")
    require(locBig.take(distMerges) == dist,
      "local long run must extend the distributed prefix")

    // synthetic arm: the sf corpus vocabulary is tiny (tens of words),
    // so also price the in-memory loop at a realistic vocabulary — 100k
    // distinct words over a 26-letter alphabet with Zipf-ish frequencies
    // — where incremental pair maintenance is what keeps rounds cheap
    val rnd = new scala.util.Random(42)
    val synVocab = Array.tabulate(100000) { i =>
      val len = 3 + rnd.nextInt(10)
      val w = (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      (w + i, (100000.0 / (i + 1)).toLong.max(1L))
    }
    var syn: Seq[(String, String)] = null
    val synMerges = 5000
    val tSyn = sec { syn = BpeTrainer.trainMergesInMemory(synVocab, synMerges) }

    val perDist = tDist / distMerges
    val perLoc = tLocBig / math.max(locBig.size, 1)
    val perSyn = tSyn / math.max(syn.size, 1)
    println(
      s"""{"vocab":$vocabSize,"dist_merges":$distMerges,""" +
      s""""dist_sec":$tDist,"dist_sec_per_merge":$perDist,""" +
      s""""local_sec_same":$tLoc,""" +
      s""""local_merges":${locBig.size},"local_sec":$tLocBig,""" +
      s""""local_sec_per_merge":$perLoc,""" +
      s""""syn_vocab":${synVocab.length},"syn_merges":${syn.size},""" +
      s""""syn_sec":$tSyn,"syn_sec_per_merge":$perSyn,""" +
      s""""projected_50k_dist_hours":${perDist * 50000 / 3600},""" +
      s""""projected_50k_local_min":${perSyn * 50000 / 60}}""")
    spark.stop()
  }
}
