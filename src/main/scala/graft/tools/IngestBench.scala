package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{CorpusIngest, SignatureIndexStore}

/** Price the continuous-ingest claim: per-batch cost must be a function
  * of the BATCH, not of the standing corpus — the property that keeps a
  * crawl feeding a 100 TB corpus viable. Runs the same fixed batch
  * (sf0.01 documents, 500 docs) through both layouts against standing
  * indexes of growing size (sf0.1-derived, then ×10 and ×100 replicas
  * with disjoint ids and perturbed signatures — band keys spread instead
  * of colliding):
  *
  *  - `in-memory`: [[CorpusIngest.ingest]] against a pinned index frame
  *    — re-explodes the index's band keys per batch (the cost the old
  *    `v=`-versioned streaming layout pays, BEFORE its index-sized
  *    rewrite).
  *  - `bucketed store`: [[CorpusIngest.ingestIndexed]] against a durable
  *    [[SignatureIndexStore]] — pre-exploded bands, bucket-pruned scans,
  *    batch-side broadcasts, batch-sized append. The number that must
  *    stay FLAT as the index grows.
  *
  * Store builds are untimed (they are the standing corpus, amortized over
  * its life); the timed section is exactly the per-batch work including
  * the survivors' append.
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val batchDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val corpusDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    // optional 3rd arg: comma-separated arm names to run
    // (growth, ann, loop, retire, purge, chain); default = all
    val arms = args.lift(2).map(_.split(",").toSet)
    def armOn(name: String) = arms.forall(_.contains(name))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = CorpusIngest.Config()
    val meta = SignatureIndexStore.Meta(
      cfg.indexBuckets, cfg.numHashes, cfg.bandSize)

    val batch = spark.read.parquet(s"$batchDir/documents.parquet")
      .select((col("doc_id") + 900000000L).as("doc_id"), col("text"))
      .localCheckpoint(true)
    val baseIndex = CorpusIngest.signatureIndex(
      spark.read.parquet(s"$corpusDir/documents.parquet"),
      "doc_id", "text", cfg)

    def replicate(times: Int) = baseIndex
      .crossJoin(spark.range(times).select(col("id").as("rep")))
      .select(
        (col("doc_id") + col("rep") * 10000000L).as("doc_id"),
        // perturb replica signatures (keep slot 0) so band keys spread
        // across copies instead of producing times-way collisions
        expr("transform(sig, (s, j) -> CASE WHEN j = 0 OR rep = 0" +
          " THEN s ELSE (s * 31 + rep * 97 + j) % 1000000007 END)")
          .as("sig"))
      .repartition(32)

    // codegen/JIT warmup: one untimed run of each layout at the base size
    CorpusIngest.ingest(batch, "doc_id", "text",
      baseIndex.localCheckpoint(true), cfg).accepted.count()
    locally {
      val root = java.nio.file.Files
        .createTempDirectory("graft-ingestbench-warm").toString
      SignatureIndexStore.append(spark, root, baseIndex, 0L, meta)
      CorpusIngest.ingestIndexed(batch, "doc_id", "text", root, 1L, cfg)
        ._1.count()
    }

    if (armOn("growth")) {
    println("| index rows | in-memory ingest (s) | bucketed store (s) | accepted |")
    Seq(1, 10, 100, 1000).foreach { times =>
      val index = replicate(times).localCheckpoint(true)
      val n = index.count()

      val t0 = System.nanoTime()
      val r = CorpusIngest.ingest(batch, "doc_id", "text", index, cfg)
      val accepted = r.accepted.count()
      val wallMem = (System.nanoTime() - t0) / 1e9

      // durable store seeded with the same index (untimed — the standing
      // corpus, amortized over its life)
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-ingestbench-$times").toString
      SignatureIndexStore.append(spark, root, index, 0L, meta)
      val t1 = System.nanoTime()
      val (acceptedDf, _) = CorpusIngest.ingestIndexed(
        batch, "doc_id", "text", root, 1L, cfg)
      val acceptedStore = acceptedDf.count()
      val wallStore = (System.nanoTime() - t1) / 1e9
      require(acceptedStore == accepted,
        s"layouts disagree: store=$acceptedStore mem=$accepted")

      println(f"| $n | $wallMem%.1f | $wallStore%.1f | $accepted |")

      // trickle arm at the largest store: the steady-state continuous-
      // ingest shape — a 10-doc batch against the 5M-row index. Reported
      // both as matches-only (the store's own cost) and as the FULL
      // ingestIndexed wall (gates + dedups + append), whose audit counts
      // now ride the stage checkpoints as observed metrics instead of
      // separate count() jobs.
      if (times == 1000) {
        val trickle = batch.limit(10).localCheckpoint(true)
        val trickleSigs = CorpusIngest.signatureIndex(
          trickle, "doc_id", "text", cfg).localCheckpoint(true)
        val t2 = System.nanoTime()
        val m = SignatureIndexStore.matches(
          spark, root, trickleSigs, cfg.threshold).count()
        println(f"| 10-doc lookup vs $n (matches only) | - | " +
          f"${(System.nanoTime() - t2) / 1e9}%.1f | $m matched |")
        val t3 = System.nanoTime()
        val (tDf, _) = CorpusIngest.ingestIndexed(
          trickle, "doc_id", "text", root, 2L, cfg)
        val tAcc = tDf.count()
        println(f"| 10-doc FULL ingest vs $n | - | " +
          f"${(System.nanoTime() - t3) / 1e9}%.1f | $tAcc accepted |")
      }
    }

    }

    // ANN-in-the-loop arm: the same 10-doc full ingest, now with the
    // AnnGate stage (embed + semantic query vs the standing vectors +
    // vector append), against standing ANN stores 10x apart — the
    // per-batch wall must stay flat as the VECTOR index grows too.
    // (Standing vectors are the synthetic embeddings table replicated
    // with jitter; the gate prices the path — probe + append cost — not
    // the match semantics, which CorpusIngestSpec pins.)
    if (armOn("ann")) {
      import graft.operators.AnnIndexStore
      val baseEmb = spark.read.parquet(s"$corpusDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val dim = baseEmb.select(size(col("embedding"))).head().getInt(0)
      def replicateEmb(times: Int) = baseEmb
        .crossJoin(spark.range(times).select(col("id").as("rep")))
        .select(
          (col("vec_id") + col("rep") * 100000000L).as("vec_id"),
          expr("transform(embedding, (x, j) -> CAST(x + " +
            "CASE WHEN rep = 0 THEN CAST(0.0 AS FLOAT) ELSE " +
            "CAST(((rep * 31 + j * 7) % 13 - 6) AS FLOAT) * " +
            "CAST(0.01 AS FLOAT) END AS FLOAT))").as("embedding"))
        .repartition(32)
      val trickle = batch.limit(10).localCheckpoint(true)
      println("| standing vectors | 10-doc FULL ingest + AnnGate (s) | accepted |")
      Seq(10, 100).foreach { times =>
        val vecs = replicateEmb(times).localCheckpoint(true)
        val nv = vecs.count()
        val sigRoot = java.nio.file.Files
          .createTempDirectory(s"graft-ingestann-sig-$times").toString
        SignatureIndexStore.append(spark, sigRoot, replicate(times), 0L, meta)
        val annRoot = java.nio.file.Files
          .createTempDirectory(s"graft-ingestann-vec-$times").toString
        AnnIndexStore.build(spark, annRoot, vecs, "vec_id", "embedding",
          dim, numCentroids = 256, lloydRounds = 1)
        val gate = CorpusIngest.AnnGate(
          annRoot, dim = dim, threshold = 0.9, nprobe = 4)
        val t0 = System.nanoTime()
        val (aDf, _) = CorpusIngest.ingestIndexed(
          trickle, "doc_id", "text", sigRoot, 1L, cfg, Some(gate))
        val acc = aDf.count()
        println(f"| $nv | ${(System.nanoTime() - t0) / 1e9}%.1f | $acc |")
      }
    }

    // long-loop arm (store compaction economics): many small batches
    // accumulate one batch=<id> dir per table per micro-batch; scan cost
    // grows with file count. Periodic compaction folds them into one
    // file per bucket — this arm measures per-batch wall early vs late,
    // with and without compaction, plus the compaction passes' own cost.
    def loopArm(nBatches: Int, compactEvery: Int,
        labels: Boolean = false): (Double, Double, Double) = {
      import spark.implicits._
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-ingestloop-$compactEvery").toString
      SignatureIndexStore.append(spark, root, replicate(10), 0L, meta)
      val labelsRoot = if (labels) Some(s"$root/labels") else None
      var compactSec = 0.0
      val walls = (1 to nBatches).map { b =>
        val fresh = (0 until 5).map { j =>
          val id = 950000000L + b * 100L + j
          (id, s"synthetic loop document $id covering subject s${b}x$j " +
            s"with unique tokens u${b}a$j u${b}b$j u${b}c$j and filler " +
            s"prose about matter m$b variant $j")
        }
        // lineage arm: every 10th batch re-submits batch 1's first doc
        // verbatim under a new id, so the cross-dedup drops it and the
        // LabelStore folds a real pair; the other 9 batches exercise the
        // zero-pair fast path (one marker write)
        val rows = if (labels && b > 1 && b % 10 == 0)
          fresh :+ ((950000000L + b * 100L + 99L,
            "synthetic loop document 950000100 covering subject s1x0 " +
              "with unique tokens u1a0 u1b0 u1c0 and filler " +
              "prose about matter m1 variant 0"))
        else fresh
        val docs = rows.toDF("doc_id", "text")
        val t0 = System.nanoTime()
        CorpusIngest.ingestIndexed(docs, "doc_id", "text", root, b.toLong,
          cfg, labelsRoot = labelsRoot)
        val wall = (System.nanoTime() - t0) / 1e9
        if (compactEvery > 0 && b % compactEvery == 0) {
          val c0 = System.nanoTime()
          SignatureIndexStore.compact(spark, root)
          labelsRoot.filter(lr =>
              graft.operators.LabelStore.readMeta(spark, lr).isDefined)
            .foreach(lr => graft.operators.LabelStore.compact(spark, lr))
          compactSec += (System.nanoTime() - c0) / 1e9
        }
        wall
      }
      val early = walls.slice(5, 25).sum / 20
      val late = walls.takeRight(20).sum / 20
      (early, late, compactSec)
    }
    val nLoop = 200
    if (armOn("loop")) {
      println(s"| long loop ($nLoop x 5-doc batches vs 50k-row base) " +
        "| early avg (s) | late avg (s) | compact total (s) |")
      Seq(0, 50).foreach { every =>
        val (early, late, cSec) = loopArm(nLoop, every)
        val label = if (every == 0) "no compaction" else s"compact every $every"
        println(f"| $label | $early%.2f | $late%.2f | $cSec%.1f |")
      }
      val (early, late, cSec) = loopArm(nLoop, 50, labels = true)
      println(f"| compact every 50 + lineage labels (1 cross-dup per 10 " +
        f"batches) | $early%.2f | $late%.2f | $cSec%.1f |")
    }

    // retirement-cost arm: delete cost must be DELETE-SET-bounded, never
    // index-sized. Against one 500k-row standing store: time retire()
    // (one tombstone write + marker) for growing delete sets, the
    // trickle-lookup penalty while tombstones are live (broadcast
    // anti-join), and the compact pass that makes the deletes physical.
    if (armOn("retire")) {
      val root = java.nio.file.Files
        .createTempDirectory("graft-ingestretire").toString
      val index = replicate(100).localCheckpoint(true)
      val n = index.count()
      SignatureIndexStore.append(spark, root, index, 0L, meta)
      val trickleSigs = CorpusIngest.signatureIndex(
        batch.limit(10), "doc_id", "text", cfg).localCheckpoint(true)
      def lookupWall(): Double = {
        val t = System.nanoTime()
        SignatureIndexStore.matches(
          spark, root, trickleSigs, cfg.threshold).count()
        (System.nanoTime() - t) / 1e9
      }
      println(s"| retire set (vs $n-row store) | retire (s) " +
        "| 10-doc lookup after (s) |")
      println(f"| 0 (baseline) | - | ${lookupWall()}%.2f |")
      Seq(100, 10000, 100000).zipWithIndex.foreach { case (nDel, i) =>
        val dels = index.select("doc_id").limit(nDel).localCheckpoint(true)
        val t0 = System.nanoTime()
        SignatureIndexStore.retire(spark, root, dels, "doc_id", 1L + i)
        val retireWall = (System.nanoTime() - t0) / 1e9
        println(f"| $nDel (cumulative) | $retireWall%.2f | " +
          f"${lookupWall()}%.2f |")
      }
      // one live data batch so the compact covers the retire batches,
      // then the pass that turns tombstones physical
      SignatureIndexStore.append(spark, root,
        CorpusIngest.signatureIndex(batch.limit(50), "doc_id", "text", cfg),
        10L, meta)
      val c0 = System.nanoTime()
      SignatureIndexStore.compact(spark, root, keepNewest = 1)
      println(f"| compact (applies+drops all tombstones) | " +
        f"${(System.nanoTime() - c0) / 1e9}%.1f | ${lookupWall()}%.2f |")
    }

    // whole-source-purge arm: a 10^7-id delete set — the size where the
    // round-12 single-file tombstone write (coalesce(1)) and broadcast
    // anti-join read would funnel one task / OOM an executor. Verifies
    // the write SHARDS (multiple bucket files, marker-recorded) and the
    // read path survives with the tombstone side unbroadcast (the
    // >32 MB size-switch to a shuffled anti-join).
    if (armOn("purge")) {
      val root = java.nio.file.Files
        .createTempDirectory("graft-ingestpurge").toString
      val index = replicate(100).localCheckpoint(true)
      SignatureIndexStore.append(spark, root, index, 0L, meta)
      val big = spark.range(10000000L)
        .select(col("id").cast("long").as("doc_id"))
      val t0 = System.nanoTime()
      SignatureIndexStore.retire(spark, root, big, "doc_id", 1L)
      val retireWall = (System.nanoTime() - t0) / 1e9
      val tombBuckets = new java.io.File(s"$root/tombs/batch=1")
        .listFiles().count(_.getName.startsWith("bucket="))
      val trickleSigs = CorpusIngest.signatureIndex(
        batch.limit(10), "doc_id", "text", cfg).localCheckpoint(true)
      val t1 = System.nanoTime()
      SignatureIndexStore.matches(
        spark, root, trickleSigs, cfg.threshold).count()
      val lookupWall = (System.nanoTime() - t1) / 1e9
      SignatureIndexStore.append(spark, root,
        CorpusIngest.signatureIndex(batch.limit(50), "doc_id", "text", cfg),
        10L, meta)
      val c0 = System.nanoTime()
      SignatureIndexStore.compact(spark, root, keepNewest = 1)
      val compactWall = (System.nanoTime() - c0) / 1e9
      println(f"| 10^7-id purge | retire $retireWall%.2f s | " +
        f"$tombBuckets tombstone buckets | " +
        f"lookup-after $lookupWall%.2f s (shuffled anti-join) | " +
        f"compact $compactWall%.1f s |")
    }

    // adversarial merge-chain arm (LabelStore): batches that repeatedly
    // merge the SAME growing mega-cluster — the worst shape for the
    // "fold work bounded by the touched subgraph" claim, because the
    // touched subgraph IS the mega-cluster and grows by a whole cluster
    // every batch. Seed 20 disjoint 1000-node clusters in one fold, then
    // one single-pair batch per round splicing the next cluster in;
    // the fold wall must track the TOUCHED size (mega + 1000), not the
    // store size, and must not blow up superlinearly.
    if (armOn("chain")) {
      import spark.implicits._
      import graft.operators.LabelStore
      val lroot = java.nio.file.Files
        .createTempDirectory("graft-ingestchain").toString + "/labels"
      val lmeta = LabelStore.Meta(buckets = 64)
      val seed = (0 until 20).flatMap { c =>
        (1 until 1000).map(i => (c * 10000L + i, c * 10000L)) }
      LabelStore.fold(spark, lroot, seed.toDF("a", "b"), "a", "b", 1L, lmeta)
      println("| merge-chain batch | touched-cluster size | fold (s) |")
      (1 until 20).foreach { m =>
        val pair = Seq((0L, m * 10000L)).toDF("a", "b")
        val t0 = System.nanoTime()
        LabelStore.fold(spark, lroot, pair, "a", "b", 1L + m, lmeta)
        val wall = (System.nanoTime() - t0) / 1e9
        if (Seq(1, 4, 9, 14, 19).contains(m))
          println(f"| ${m + 1} | ${(m + 1) * 1000} | $wall%.2f |")
      }
    }
    spark.stop()
  }
}
