package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // session warmup: touch every table once so the first timed query does
    // not absorb JVM/classloader/parquet-footer startup cost
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => }
    }
    // OS page-cache warmup: count() reads only parquet metadata, so at
    // larger SFs the first timed queries still paid cold data-page reads
    // (sf1: sentinel-first ran 2x sentinel-last purely from disk, which
    // the canary then flagged as noise). Stream every table's bytes once.
    def warmBytes(f: java.io.File): Unit =
      if (f.isDirectory) f.listFiles().foreach(warmBytes)
      else if (f.getName.endsWith(".parquet")) {
        val in = new java.io.FileInputStream(f)
        val buf = new Array[Byte](1 << 20)
        try { while (in.read(buf) >= 0) () } finally in.close()
      }
    try warmBytes(new java.io.File(sfDir)) catch { case _: Throwable => }
    // codegen warmup: run the whole inventory once at the smallest SF.
    // Generated code is path-independent, so Janino compilation (the
    // dominant per-query fixed cost, 0.3-1 s each) is cached before the
    // timed pass; the timed numbers then measure the data path.
    // derived dirs (e.g. target/bench-sf1) don't match the sf suffix —
    // fall back to the smallest driver SF so the suite never runs cold
    // (a cold first half shows up as a sentinel-ratio "noise" flag)
    val warmDir0 = sfDir.replaceAll("sf[0-9.]+$", "sf0.001")
    val warmDir =
      if (warmDir0 != sfDir) warmDir0 else "/root/testdata/sf0.001"
    if (warmDir != sfDir && new java.io.File(warmDir).isDirectory)
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => }
      }
    // per-query storage hygiene: operators that stage through
    // localCheckpoint/cache pin block-manager storage that outlives their
    // query; without eviction every query inherits the previous queries'
    // blocks (GC pressure grew measurably across the suite — PERF_NOTES
    // §sf1 scale probe). DuckDB runs each oracle query fresh; this keeps
    // the comparison per-query honest.
    def dropLeftoverBlocks(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      // let the ContextCleaner reclaim dead shuffle files too — at sf1 the
      // heavy self-joins leave GBs of shuffle spill whose cleanup
      // otherwise lands inside the NEXT query's measurement
      System.gc()
    }
    // stage attribution for the composite store-lifecycle gates
    // (q101/q109/q115-q117): per-stage wall times land in the JSON so a
    // gate regression is attributable to append/retire/compact without
    // a bisect. Enabled only here — Verify and library paths are
    // untouched.
    graft.util.StageTimer.enabled = true
    val stageMap =
      scala.collection.mutable.LinkedHashMap.empty[String, Seq[(String, Double)]]
    def timed(name: String): Double = {
      dropLeftoverBlocks()
      graft.util.StageTimer.drain() // discard leftovers from warmups
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count() }
      catch { case _: Throwable => -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      val stages = graft.util.StageTimer.drain()
      if (stages.nonEmpty) stageMap(name) = stages
      sec
    }
    // Noise canary: a fixed sentinel query timed before and after the
    // suite. Same code + same data twice in one JVM should agree; a
    // sentinel ratio >1.5x means the box was loaded mid-run and the
    // suite's absolute numbers are untrustworthy (round 6: a driver run
    // recorded 311.7 s for a 46 s suite with exactly this decay shape,
    // and nothing in-band flagged it).
    // I/O probe: a fixed commit-shaped disk microbench — write 64 small
    // files, fsync each, rename into place, then delete — timed outside
    // Spark entirely. Two rounds (r15/r16) of judge/driver cycles went to
    // separating box-disk speed from code: the CPU sentinel stayed clean
    // while the commit/IO-bound lifecycle gates doubled, which is exactly
    // the signature this probe pins. Run before AND after the suite so a
    // mid-run disk-load shift is visible like the sentinel's.
    def ioProbe(): Double = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_ioprobe").toFile
      val payload = new Array[Byte](64 * 1024)
      java.util.Arrays.fill(payload, 0x42.toByte)
      val t0 = System.nanoTime()
      (0 until 64).foreach { i =>
        val tmp = new java.io.File(dir, s".part-$i.inprogress")
        val out = new java.io.FileOutputStream(tmp)
        try { out.write(payload); out.getFD.sync() } finally out.close()
        val fin = new java.io.File(dir, s"part-$i")
        if (!tmp.renameTo(fin))
          throw new java.io.IOException(s"io_probe rename failed: $tmp")
      }
      (0 until 64).foreach(i => new java.io.File(dir, s"part-$i").delete())
      dir.delete()
      (System.nanoTime() - t0) / 1e9
    }
    // CPU probe: a fixed single-thread arithmetic loop, timed outside
    // Spark. The sentinel RATIO only catches load that SHIFTS mid-run —
    // a steadily-loaded host slows every query uniformly and leaves the
    // ratio clean (r18 observed a 1.38x uniform slowdown at sentinel
    // 1.03). The probe's absolute wall is box-comparable across runs
    // and rounds: same code, same constant, no data dependence.
    def cpuProbe(): Double = {
      val t0 = System.nanoTime()
      var s = 0L
      var i = 0L
      while (i < 200000000L) { s += i * 31L + (s >> 3); i += 1 }
      if (s == 42L) System.err.println("") // defeat dead-code elimination
      (System.nanoTime() - t0) / 1e9
    }
    val cpuFirst = try cpuProbe() catch { case _: Throwable => -1.0 }
    val ioFirst = try ioProbe() catch { case _: Throwable => -1.0 }

    val sentinelName = "q09_join_multi_revenue"
    // one untimed sentinel pass at the TARGET SF first: the sf0.001
    // codegen warmup runs too few rows for C2 JIT tiering, so at larger
    // SFs the first timed run measured compilation ramp (sf1: 3.3 s
    // first vs 1.8 s last, flagged as noise). The canary exists to
    // detect EXTERNAL load shifts between suite start and end — warm
    // everything else out of its signal.
    timed(sentinelName)
    val sentinelFirst = timed(sentinelName)
    // explicit skip list (SPARK_GRAFT_SKIP, comma-separated query names):
    // the sf10 suite excludes the documented out-of-reach oracle gates
    // (q103's exhaustive ANN verify is quadratic BY DESIGN — it is
    // correctness apparatus, not a production path). Never a silent cap:
    // every skip is logged here and recorded in the JSON.
    val skip = sys.env.get("SPARK_GRAFT_SKIP")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    skip.foreach(q => System.err.println(
      s"""bench-skip {"query":"$q","reason":"SPARK_GRAFT_SKIP"}"""))
    // progressive per-query lines on stderr: even if stdout is truncated
    // or the JVM dies mid-suite, every completed measurement survives in
    // the captured log (round 7's artifact lost q01-q16 to tail capture)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(q => skip.contains(q._1)).map { case (name, _) =>
      val sec = timed(name)
      System.err.println(f"""bench-progress {"query":"$name%s","sec":$sec%.3f}""")
      name -> sec
    }
    val sentinelLast = timed(sentinelName)
    val cpuLast = try cpuProbe() catch { case _: Throwable => -1.0 }
    val ioLast = try ioProbe() catch { case _: Throwable => -1.0 }
    val ratio =
      if (sentinelFirst > 0 && sentinelLast > 0)
        math.max(sentinelFirst, sentinelLast) /
          math.min(sentinelFirst, sentinelLast)
      else -1.0
    val noisy = ratio < 0 || ratio > 1.5
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // sf LABEL, not the dir path: ScaleUp-derived dirs (target/bench-sf1)
    // must read as "sf1" in artifacts, the reader-confusion nit from r9
    val sfLabel = new java.io.File(sfDir).getName.stripPrefix("bench-")
    // per-stage breakdown of the lifecycle gates (last timed run of each)
    val stagesJson = stageMap.map { case (q, st) =>
      "\"" + q + "\":" + st.map { case (k, v) =>
        f""""$k%s":$v%.3f""" }.mkString("{", ",", "}")
    }.mkString("{", ",", "}")
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""stages":$stagesJson,""" +
      s""""sentinel":"$sentinelName","sentinel_first":$sentinelFirst,""" +
      s""""sentinel_last":$sentinelLast,"sentinel_ratio":$ratio,""" +
      f""""io_probe":$ioFirst%.3f,"io_probe_last":$ioLast%.3f,""" +
      f""""cpu_probe":$cpuFirst%.3f,"cpu_probe_last":$cpuLast%.3f,""" +
      s""""skipped":${skip.toSeq.sorted.map("\"" + _ + "\"")
        .mkString("[", ",", "]")},""" +
      s""""noisy":$noisy,"sf":"$sfLabel","sf_dir":"$sfDir"}"""
    println(json)
    // durable copy: the stdout line has been tail-truncated in round
    // artifacts twice; target/bench-<sf>-c<cpus>.json is the canonical
    // record. The cpu suffix keeps the 32- and 8-core runs of the same SF
    // from overwriting each other (r17: the noisy 8-core run clobbered
    // the clean 32-core per-query artifact). Dirs already named bench-*
    // (ScaleUp's target/bench-sf1) would otherwise double the prefix.
    val outFile = new java.io.File(s"target/bench-$sfLabel-c$cpus.json")
    outFile.getParentFile.mkdirs()
    // compact headline line (no per-query map): printed last on stdout
    // (tail captures keep it even when the full line is truncated — r7,
    // r8) AND appended as the artifact's last line so a dead stdout can
    // never lose it. cpus and the skip list ride in the headline too so
    // a non-empty skip or an off-core run is visible from the tail alone.
    val headline =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec",""" +
      s""""nq":${results.size},"cpus":$cpus,"sentinel_ratio":$ratio,""" +
      f""""noisy":$noisy,"io_probe":$ioFirst%.3f,""" +
      f""""cpu_probe":$cpuFirst%.3f,""" +
      s""""skipped":${skip.toSeq.sorted.map("\"" + _ + "\"")
        .mkString("[", ",", "]")},""" +
      s""""sf":"$sfLabel","artifact":"${outFile.getAbsolutePath}"}"""
    val w = new java.io.PrintWriter(outFile, "UTF-8")
    try { w.println(json); w.println(headline) } finally w.close()
    System.err.println(s"bench JSON written to ${outFile.getAbsolutePath}")
    println(headline)
    spark.stop()
  }
}
