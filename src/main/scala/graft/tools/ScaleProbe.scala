package graft.tools

import org.apache.spark.sql.SparkSession

/** Solo-fresh scale probe of the HEAVY query families (VERDICT r15 item
  * 2): run a named subset of SparkEntry.queries against any SF dir with
  * Bench's per-query hygiene (block eviction, StageTimer stage rows) but
  * without the 123-query suite around them — the tool behind the
  * PERF_NOTES sf0.1 / sf1 / sf10 three-point table.
  *
  * Usage: ScaleProbe <sfDir> [q1,q2,…]   (default list = the heavy
  * families: shingle joins, dedup, window hashes, CC, the five store
  * lifecycle gates, gzip WARC, the ANN gate)
  * Writes target/probe-<label>.json and prints one JSON line.
  */
object ScaleProbe {

  val HeavyFamilies: Seq[String] = Seq(
    "q19_ngram_jaccard", "q47_ngram_guarded",
    "q31_minhash_dedup", "q49_minhash_est",
    "q64_dup_spans", "q55_dedup_clusters", "q107_incr_components",
    "q101_store_dedup", "q109_label_store",
    "q115_sig_retire", "q116_ann_retire", "q117_label_retire",
    "q122", "q103_ann_ingest_gate")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/bench-sf10")
    val wanted = args.lift(1)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(HeavyFamilies)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val all = graft.SparkEntry.queries
    val names = wanted.flatMap { w =>
      val hit = all.keys.filter(k => k == w || k.startsWith(w)).toSeq.sorted
      if (hit.isEmpty) { System.err.println(s"[probe] no query matches '$w'") }
      hit
    }.distinct

    // Bench's warmups: table footers + bytes (page cache), codegen at the
    // smallest SF so Janino cost is out of the timings
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => }
    }
    def warmBytes(f: java.io.File): Unit =
      if (f.isDirectory) f.listFiles().foreach(warmBytes)
      else if (f.getName.endsWith(".parquet")) {
        val in = new java.io.FileInputStream(f)
        val buf = new Array[Byte](1 << 20)
        try { while (in.read(buf) >= 0) () } finally in.close()
      }
    try warmBytes(new java.io.File(sfDir)) catch { case _: Throwable => }
    val warm = "/root/testdata/sf0.001"
    if (new java.io.File(warm).isDirectory)
      names.foreach { n =>
        try all(n)(spark, warm).count() catch { case _: Throwable => }
      }

    graft.util.StageTimer.enabled = true
    def drop(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }
    val rows = names.map { n =>
      drop()
      graft.util.StageTimer.drain()
      val t0 = System.nanoTime()
      val count = try all(n)(spark, sfDir).count() catch {
        case e: Throwable =>
          System.err.println(s"[probe] $n FAILED: ${e.getMessage}"); -1L
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val stages = graft.util.StageTimer.drain()
      System.err.println(f"[probe] $n%-28s $sec%8.2f s  ($count rows)" +
        (if (stages.isEmpty) ""
         else stages.map { case (k, v) => f"$k=$v%.2f" }
           .mkString("  [", " ", "]")))
      (n, sec, count, stages)
    }
    val label = new java.io.File(sfDir).getName.stripPrefix("bench-")
    val qs = rows.map { case (n, s, _, _) => s"\"$n\":$s" }
      .mkString("{", ",", "}")
    val stagesJson = rows.filter(_._4.nonEmpty).map { case (n, _, _, st) =>
      "\"" + n + "\":" + st.map { case (k, v) => f""""$k%s":$v%.3f""" }
        .mkString("{", ",", "}")
    }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"probe","sf":"$label","sf_dir":"$sfDir",""" +
        s""""total":${rows.map(_._2).sum},"queries":$qs,"stages":$stagesJson}"""
    println(json)
    val out = new java.io.File(s"target/probe-$label.json")
    out.getParentFile.mkdirs()
    val w = new java.io.PrintWriter(out, "UTF-8")
    try w.println(json) finally w.close()
    spark.stop()
  }
}
