package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusIngest, SignatureIndexStore}

class CorpusIngestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val cfg = CorpusIngest.Config(minTokens = 3, maxRepRatio = 0.9)

  test("payload passthrough: a stray column named doc_id never collides with the renamed id") {
    // idCol != "doc_id" and the batch ALSO carries a payload column
    // literally named doc_id: the survivor frame's names are the slice
    // schema contract, so the stray column is dropped (not an
    // ambiguous-reference crash, not a silent shadow)
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river"))
      .toDF("doc_id", "text")
    val index = CorpusIngest.signatureIndex(corpus, "doc_id", "text", cfg)
      .localCheckpoint(true)
    val batch = Seq(
      (21L, "completely novel sentences about astronomy and tidal forces",
        999L, "http://a.com/x"))
      .toDF("id", "body", "doc_id", "url")
    val r = CorpusIngest.ingest(batch, "id", "body", index, cfg)
    assert(r.accepted.columns.toSet == Set("doc_id", "text", "url"),
      r.accepted.columns.mkString(","))
    val row = r.accepted.collect().head
    assert(row.getAs[Long]("doc_id") == 21L, "stray payload doc_id shadowed the id")
    assert(row.getAs[String]("url") == "http://a.com/x")
  }

  test("one batch: every stage fires on its planted victim, index grows by survivors") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river"),
      (2L, "a careful study of historical documents reveals many patterns")
    ).toDF("doc_id", "text")
    val index = CorpusIngest.signatureIndex(corpus, "doc_id", "text", cfg)
      .localCheckpoint(true)
    assert(index.count() == 2)

    val batch = Seq(
      (10L, "xx"), // gate: under the token floor
      (11L, "completely novel sentences about astronomy and tidal forces"),
      (12L, "completely novel sentences about astronomy and tidal forces"),
      // ^ exact dup of 11 within the batch (keep 11)
      (13L, "the quick brown fox jumps over the lazy dog near the ocean"),
      // ^ near-dup of CORPUS doc 1 -> cross dedup drops it
      (14L, "entirely different content discussing gardening and soil health"),
      (15L, "entirely different content discussing gardening and soil health today")
      // ^ near-dup of 14 WITHIN the batch (append-one-token, jaccard
      //   ~0.86 — safely above the 0.5 estimator cut; keep 14)
    ).toDF("doc_id", "text")

    val r = CorpusIngest.ingest(batch, "doc_id", "text", index, cfg)
    val ids = r.accepted.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(11L, 14L), s"accepted $ids; audit=${r.audit}")

    val audit = r.audit.toMap
    assert(audit("input") == 6L)
    assert(audit("gates") == 5L, r.audit.toString)       // -10
    assert(audit("exact_dedup") == 4L, r.audit.toString) // -12
    assert(audit("batch_dedup") == 3L, r.audit.toString) // -15
    assert(audit("cross_dedup") == 2L, r.audit.toString) // -13
    assert(r.updatedIndex.count() == 4) // 2 corpus + 2 accepted
  }

  test("labelsRoot: cross-dedup lineage accumulates in the durable LabelStore") {
    import graft.operators.LabelStore
    val base = java.nio.file.Files
      .createTempDirectory("graft_ingest_labels_").toString
    val root = s"$base/index"
    val labels = s"$base/labels"

    val b0 = Seq(
      (10L, "fresh reporting on municipal budgets and local road repairs"),
      (11L, "unrelated notes on deep sea exploration and pressure hulls")
    ).toDF("doc_id", "text")
    val (a0, _) = CorpusIngest.ingestIndexed(
      b0, "doc_id", "text", root, 0L, cfg, labelsRoot = Some(labels))
    assert(a0.count() == 2)
    // no cross pairs yet: the store committed an empty batch
    assert(LabelStore.committedBatches(spark, labels) == Seq(0L))
    assert(LabelStore.labels(spark, labels).count() == 0)

    val b1 = Seq(
      // near-dups of standing 10 and 11
      (20L, "fresh reporting on municipal budgets and local road closures"),
      (21L, "unrelated notes on deep sea exploration and pressure hulls!"),
      (22L, "novel text about alpine glaciers and seasonal melt records"),
      // WITHIN-batch exact duplicates: lineage must record these too
      (23L, "verbatim duplicated bulletin about harbor tide measurements"),
      (24L, "verbatim duplicated bulletin about harbor tide measurements")
    ).toDF("doc_id", "text")
    val (a1, _) = CorpusIngest.ingestIndexed(
      b1, "doc_id", "text", root, 1L, cfg, labelsRoot = Some(labels))
    assert(a1.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(22L, 23L))
    val l1 = LabelStore.labels(spark, labels).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l1 == Map(10L -> 10L, 20L -> 10L, 11L -> 11L, 21L -> 11L,
      23L -> 23L, 24L -> 23L), s"$l1")

    val b2 = Seq(
      // another dup of the SAME standing doc joins the same cluster
      (30L, "fresh reporting on municipal budgets and local road updates")
    ).toDF("doc_id", "text")
    CorpusIngest.ingestIndexed(
      b2, "doc_id", "text", root, 2L, cfg, labelsRoot = Some(labels))
    val mem = LabelStore.members(spark, labels,
        Seq(10L).toDF("component"), "component")
      .collect().map(_.getLong(0)).toSet
    assert(mem == Set(10L, 20L, 30L), s"got $mem")
    // lineage lookup: which cluster did the dropped doc join?
    val who = LabelStore.lookup(spark, labels, Seq(30L).toDF("id"), "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(who == Map(30L -> 10L), s"got $who")
  }

  test("second batch dedups against FIRST batch's survivors via the updated index") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river")
    ).toDF("doc_id", "text")
    val index0 = CorpusIngest.signatureIndex(corpus, "doc_id", "text", cfg)
      .localCheckpoint(true)
    val b1 = Seq(
      (20L, "fresh reporting on municipal budgets and local road repairs")
    ).toDF("doc_id", "text")
    val r1 = CorpusIngest.ingest(b1, "doc_id", "text", index0, cfg)
    assert(r1.accepted.count() == 1)
    val index1 = r1.updatedIndex.localCheckpoint(true)

    val b2 = Seq(
      // near-dup of batch-1 doc 20 — only the UPDATED index knows it
      (30L, "fresh reporting on municipal budgets and local road closures"),
      (31L, "unrelated notes on deep sea exploration and pressure hulls")
    ).toDF("doc_id", "text")
    val r2 = CorpusIngest.ingest(b2, "doc_id", "text", index1, cfg)
    val ids = r2.accepted.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(31L), s"accepted $ids; audit=${r2.audit}")
    // the stale index would have admitted 30: prove the index update is
    // what blocked it
    val stale = CorpusIngest.ingest(b2, "doc_id", "text", index0, cfg)
    val staleIds = stale.accepted.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(staleIds == Set(30L, 31L), staleIds.toString)
  }

  test("streaming loop: micro-batches thread the durable index, dedup across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    val input = MemoryStream[(Long, String)]
    val q = CorpusIngest.streaming(
      input.toDF().toDF("doc_id", "text"),
      "doc_id", "text", s"$dir/index", s"$dir/accepted", cfg)
    try {
      input.addData(Seq(
        (1L, "the quick brown fox jumps over the lazy dog near the river"),
        (2L, "a careful study of historical documents reveals many patterns")))
      q.processAllAvailable()
      input.addData(Seq(
        // near-dup of batch-0's doc 1: the durable index must block it
        (10L, "the quick brown fox jumps over the lazy dog near the rivers"),
        (11L, "novel observations about glacier movement and seasonal melt")))
      q.processAllAvailable()
    } finally q.stop()
    val accepted = spark.read.parquet(s"$dir/accepted")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(accepted == Set(1L, 2L, 11L), accepted.toString)
    // latest index version carries exactly the accepted docs' signatures
    val latest = new java.io.File(s"$dir/index").listFiles()
      .map(_.getName).filter(_.startsWith("v="))
      .map(_.stripPrefix("v=").toLong).max
    val idx = spark.read.parquet(s"$dir/index/v=$latest")
    assert(idx.count() == 3)
  }

  // ------------------------------------------- durable bucketed store

  private val meta = SignatureIndexStore.Meta(
    buckets = 8, numHashes = cfg.numHashes, bandSize = cfg.bandSize)

  test("store: append is batch-sized and append-only; matches finds cross-batch near-dups") {
    val root = java.nio.file.Files.createTempDirectory("graft-sigstore").toString
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river"),
      (2L, "a careful study of historical documents reveals many patterns")
    ).toDF("doc_id", "text")
    val sigs0 = CorpusIngest.signatureIndex(corpus, "doc_id", "text", cfg)
    SignatureIndexStore.append(spark, root, sigs0, 0L, meta)

    // batch 1: one near-dup of corpus doc 1, one novel
    val b1 = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the ocean"),
      (11L, "novel observations about glacier movement and seasonal melt")
    ).toDF("doc_id", "text")
    val sigs1 = CorpusIngest.signatureIndex(b1, "doc_id", "text", cfg)
      .localCheckpoint(true)
    val m = SignatureIndexStore.matches(spark, root, sigs1, cfg.threshold)
    val matched = m.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(matched.map(_._1) == Set(10L), matched.toString)
    assert(matched.map(_._2) == Set(1L), matched.toString)

    // append batch 1 survivors; batch 2 near-dup of BATCH-1 doc 11 must match
    SignatureIndexStore.append(spark, root,
      sigs1.filter($"doc_id" === 11L), 1L, meta)
    val b2 = Seq(
      (20L, "novel observations about glacier movement and seasonal melts")
    ).toDF("doc_id", "text")
    val sigs2 = CorpusIngest.signatureIndex(b2, "doc_id", "text", cfg)
    val m2 = SignatureIndexStore.matches(spark, root, sigs2, cfg.threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(m2 == Set((20L, 11L)), m2.toString)

    // append-only: batch 0's files are untouched by batch 1's append
    val b0Dir = new java.io.File(s"$root/sigs/batch=0")
    assert(b0Dir.exists())
    // sigsView over committed batches = exactly the appended signatures
    val view = SignatureIndexStore.sigsView(spark, root)
    assert(view.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 11L))
    // belowBatch fence: a reader at batch 1 must not see batch 1's append
    assert(SignatureIndexStore.sigsView(spark, root, belowBatch = 1L)
      .select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("store: retried batch overwrites its own append instead of compounding") {
    val root = java.nio.file.Files.createTempDirectory("graft-sigstore").toString
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river")
    ).toDF("doc_id", "text")
    val sigs = CorpusIngest.signatureIndex(d, "doc_id", "text", cfg)
      .localCheckpoint(true)
    SignatureIndexStore.append(spark, root, sigs, 0L, meta)
    SignatureIndexStore.append(spark, root, sigs, 0L, meta) // the retry
    assert(SignatureIndexStore.sigsView(spark, root).count() == 1)
    assert(SignatureIndexStore.committedBatches(spark, root) == Seq(0L))
  }

  test("store: meta is pinned — appending with different parameters throws") {
    val root = java.nio.file.Files.createTempDirectory("graft-sigstore").toString
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river")
    ).toDF("doc_id", "text")
    val sigs = CorpusIngest.signatureIndex(d, "doc_id", "text", cfg)
    SignatureIndexStore.append(spark, root, sigs, 0L, meta)
    intercept[IllegalArgumentException] {
      SignatureIndexStore.append(spark, root, sigs, 1L,
        meta.copy(buckets = 16))
    }
  }

  test("store: sig-side scan is bucket-pruned to the candidates' partitions") {
    val root = java.nio.file.Files.createTempDirectory("graft-sigstore").toString
    val corpus = (0 until 50).map { i =>
      (i.toLong, s"corpus document number $i about topic $i with body text $i")
    }.toDF("doc_id", "text")
    SignatureIndexStore.append(spark, root,
      CorpusIngest.signatureIndex(corpus, "doc_id", "text", cfg), 0L, meta)
    val probe = Seq(
      (100L, "corpus document number 7 about topic 7 with body text 7s")
    ).toDF("doc_id", "text")
    val m = SignatureIndexStore.matches(spark, root,
      CorpusIngest.signatureIndex(probe, "doc_id", "text", cfg), cfg.threshold)
    m.collect()
    // the final (sig-side) scan reads EXPLICIT candidate-bucket paths:
    // one probe doc yields one candidate corpus doc, so at most a few
    // bucket directories appear in the plan (of the store's 8)
    val plan = m.queryExecution.executedPlan.toString
    val bucketsInPlan = "bucket=\\d+".r.findAllIn(plan).toSet
    assert(bucketsInPlan.nonEmpty && bucketsInPlan.size <= 4,
      s"$bucketsInPlan\n${plan.take(4000)}")
  }

  test("a survivor-less batch appends an empty dir that later reads tolerate") {
    val root = java.nio.file.Files.createTempDirectory("graft-empty").toString
    val d1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river")
    ).toDF("doc_id", "text")
    val (a0, _) = CorpusIngest.ingestIndexed(d1, "doc_id", "text", root, 0L, cfg)
    assert(a0.count() == 1L)
    // batch 1 is ENTIRELY a duplicate: zero survivors appended
    val (a1, _) = CorpusIngest.ingestIndexed(
      Seq((10L, "the quick brown fox jumps over the lazy dog near the river"))
        .toDF("doc_id", "text"),
      "doc_id", "text", root, 1L, cfg)
    assert(a1.count() == 0L)
    assert(SignatureIndexStore.committedBatches(spark, root) == Seq(0L, 1L))
    // reads spanning the empty batch dir still work
    assert(SignatureIndexStore.sigsView(spark, root).count() == 1L)
    val (a2, audit2) = CorpusIngest.ingestIndexed(
      Seq((20L, "the quick brown fox jumps over the lazy dog near the rivers"),
        (21L, "a careful study of historical documents reveals many patterns"))
        .toDF("doc_id", "text"),
      "doc_id", "text", root, 2L, cfg)
    assert(a2.select("doc_id").collect().map(_.getLong(0)).toSet == Set(21L),
      audit2.toString)
  }

  test("seedIndex dedupes the bulk seed (the store's dedup-sparse invariant)") {
    val root = java.nio.file.Files.createTempDirectory("graft-seed").toString
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river"),
      (2L, "the quick brown fox jumps over the lazy dog near the rivers"),
      // ^ near-dup cluster {1, 2}: only min id 1 may be indexed
      (3L, "a careful study of historical documents reveals many patterns")
    ).toDF("doc_id", "text")
    val indexed = CorpusIngest.seedIndex(corpus, "doc_id", "text", root, cfg)
    assert(indexed == 2L)
    assert(SignatureIndexStore.sigsView(spark, root)
      .select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    // a later batch near-dup of the DROPPED member still matches the
    // kept representative (cluster members are mutually near)
    val b = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the ocean")
    ).toDF("doc_id", "text")
    val (acc, audit) = CorpusIngest.ingestIndexed(
      b, "doc_id", "text", root, 1L, cfg)
    assert(acc.count() == 0L, audit.toString)
  }

  test("store compaction: one file per bucket, matches unchanged, retry fence still served") {
    val root = java.nio.file.Files.createTempDirectory("graft-sigcompact").toString
    def sigsOf(rows: Seq[(Long, String)]) = CorpusIngest.signatureIndex(
      rows.toDF("doc_id", "text"), "doc_id", "text", cfg)
    SignatureIndexStore.append(spark, root, sigsOf(Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river"))),
      0L, meta)
    SignatureIndexStore.append(spark, root, sigsOf(Seq(
      (2L, "a careful study of historical documents reveals many patterns"))),
      1L, meta)
    SignatureIndexStore.append(spark, root, sigsOf(Seq(
      (3L, "novel observations about glacier movement and seasonal melt"))),
      2L, meta)
    val probe = sigsOf(Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the ocean"),
      (11L, "novel observations about glacier movement and seasonal melts")))
      .localCheckpoint(true)
    def matchSet = SignatureIndexStore
      .matches(spark, root, probe, cfg.threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = matchSet
    assert(before == Set((10L, 1L), (11L, 3L)), before.toString)

    SignatureIndexStore.compact(spark, root) // keeps newest batch (2)
    assert(SignatureIndexStore.compactState(spark, root) == Some((0L, 1L)))
    assert(matchSet == before)
    assert(SignatureIndexStore.sigsView(spark, root)
      .select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    // covered batch dirs are gone; the snapshot has ONE file per bucket
    assert(!new java.io.File(s"$root/sigs/batch=0").exists())
    assert(!new java.io.File(s"$root/sigs/batch=1").exists())
    val bucketDirs = new java.io.File(s"$root/sigs/c0").listFiles()
      .filter(_.getName.startsWith("bucket="))
    assert(bucketDirs.nonEmpty)
    assert(bucketDirs.forall(
      _.listFiles().count(_.getName.startsWith("part-")) == 1))

    // the newest batch stayed uncompacted, so its own retry fence works
    assert(SignatureIndexStore
      .matches(spark, root, probe, cfg.threshold, belowBatch = 2L)
      .collect().map(_.getLong(1)).toSet == Set(1L))
    // a fence at or below the horizon is refused, not silently wrong
    intercept[IllegalStateException] {
      SignatureIndexStore.matches(spark, root, probe, cfg.threshold,
        belowBatch = 1L)
    }

    // append + second compaction folds the previous snapshot forward
    SignatureIndexStore.append(spark, root, sigsOf(Seq(
      (4L, "fresh reporting on municipal budgets and local road repairs"))),
      3L, meta)
    SignatureIndexStore.compact(spark, root)
    assert(SignatureIndexStore.compactState(spark, root) == Some((1L, 2L)))
    assert(!new java.io.File(s"$root/sigs/c0").exists())
    assert(matchSet == before)
    assert(SignatureIndexStore.sigsView(spark, root)
      .select("doc_id").collect().map(_.getLong(0)).toSet
      == Set(1L, 2L, 3L, 4L))
  }

  test("store: empty batches — matches returns zero rows and compact advances, no crash") {
    val root = java.nio.file.Files.createTempDirectory("graft-sigempty").toString
    def sigsOf(rows: Seq[(Long, String)]) = CorpusIngest.signatureIndex(
      rows.toDF("doc_id", "text"), "doc_id", "text", cfg)
    // empty FIRST micro-batch: commits a marker with empty bucket lists
    SignatureIndexStore.append(spark, root, sigsOf(Seq.empty), 0L, meta)
    assert(SignatureIndexStore.committedBatches(spark, root) == Seq(0L))
    // the next non-empty batch's matches must be ZERO MATCHES, not a
    // NoSuchElementException from readTable returning None
    val novel = sigsOf(Seq(
      (10L, "novel observations about glacier movement and seasonal melt")))
      .localCheckpoint(true)
    assert(SignatureIndexStore.matches(spark, root, novel, cfg.threshold)
      .count() == 0L)
    // compact whose ENTIRE cover is empty batches: advances the pointer
    // and reclaims dirs instead of throwing
    SignatureIndexStore.append(spark, root, sigsOf(Seq.empty), 1L, meta)
    SignatureIndexStore.append(spark, root, sigsOf(Seq.empty), 2L, meta)
    SignatureIndexStore.compact(spark, root) // covers batches 0, 1
    assert(SignatureIndexStore.compactState(spark, root) == Some((0L, 1L)))
    assert(SignatureIndexStore.sigsView(spark, root).count() == 0L)
    // the store still works after the degenerate compaction
    SignatureIndexStore.append(spark, root, sigsOf(Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river"))),
      3L, meta)
    val probe = sigsOf(Seq(
      (20L, "the quick brown fox jumps over the lazy dog near the ocean")))
      .localCheckpoint(true)
    assert(SignatureIndexStore.matches(spark, root, probe, cfg.threshold)
      .collect().map(_.getLong(1)).toSet == Set(1L))
    // second compaction folds the empty snapshot forward with real data
    SignatureIndexStore.append(spark, root, sigsOf(Seq(
      (2L, "a careful study of historical documents reveals many patterns"))),
      4L, meta)
    SignatureIndexStore.compact(spark, root)
    assert(SignatureIndexStore.compactState(spark, root) == Some((1L, 3L)))
    assert(SignatureIndexStore.matches(spark, root, probe, cfg.threshold)
      .collect().map(_.getLong(1)).toSet == Set(1L))
  }

  test("indexed streaming loop: accepted set equals the v=-versioned layout") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batches = Seq(
      Seq(
        (1L, "the quick brown fox jumps over the lazy dog near the river"),
        (2L, "a careful study of historical documents reveals many patterns"),
        (3L, "a careful study of historical documents reveals many patterns")),
      Seq(
        (10L, "the quick brown fox jumps over the lazy dog near the rivers"),
        (11L, "novel observations about glacier movement and seasonal melt")),
      Seq(
        (20L, "novel observations about glacier movement and seasonal melts"),
        (21L, "fresh reporting on municipal budgets and local road repairs")))

    def runLoop(indexed: Boolean, compactEvery: Int = 0)
        : (Set[Long], String) = {
      val dir = java.nio.file.Files.createTempDirectory("graft-ingest-eq").toString
      val input = MemoryStream[(Long, String)]
      val df = input.toDF().toDF("doc_id", "text")
      val q =
        if (indexed) CorpusIngest.streamingIndexed(
          df, "doc_id", "text", s"$dir/index", s"$dir/accepted", cfg,
          compactEvery = compactEvery)
        else CorpusIngest.streaming(
          df, "doc_id", "text", s"$dir/index", s"$dir/accepted", cfg)
      try {
        batches.foreach { b => input.addData(b); q.processAllAvailable() }
      } finally q.stop()
      (spark.read.parquet(s"$dir/accepted")
        .select("doc_id").collect().map(_.getLong(0)).toSet, dir)
    }

    val (versioned, _) = runLoop(indexed = false)
    val (bucketed, _) = runLoop(indexed = true)
    assert(bucketed == versioned, s"bucketed=$bucketed versioned=$versioned")
    assert(versioned == Set(1L, 2L, 11L, 21L), versioned.toString)
    // in-loop compaction (every batch) changes nothing the loop observes
    val (compacted, dir) = runLoop(indexed = true, compactEvery = 1)
    assert(compacted == versioned, s"compacted=$compacted")
    assert(SignatureIndexStore
      .compactState(spark, s"$dir/index").exists(_._2 >= 1L))
  }

  test("AnnGate: semantic cross-dedup catches what the signature index misses; vectors ride the loop") {
    import graft.operators.AnnIndexStore
    val root = java.nio.file.Files.createTempDirectory("graft-anngate").toString
    val annRoot = java.nio.file.Files
      .createTempDirectory("graft-anngate-vec").toString
    val g = CorpusIngest.AnnGate(
      annRoot, dim = 64, threshold = 0.9, nprobe = 8, numCentroids = 2)
    val article = "the committee reviewed the annual report and found " +
      "that the harbor restoration project had exceeded every one of " +
      "the stated goals while staying well under the approved budget"
    // same token multiset, scrambled order: 3-shingles shatter (MinHash
    // estimate ~0) but the bag-of-tokens embedding is IDENTICAL — the
    // deterministic stand-in for a paraphrase
    val scrambled = article.split(" ").sorted.mkString(" ")

    val b0 = Seq(
      (1L, article),
      (2L, "a careful study of historical documents reveals many patterns")
    ).toDF("doc_id", "text")
    val (a0, audit0) = CorpusIngest.ingestIndexed(
      b0, "doc_id", "text", root, 0L, cfg, Some(g))
    assert(a0.select("doc_id").collect().map(_.getLong(0)).toSet
      == Set(1L, 2L), audit0.toString)
    // first batch: no standing vectors to gate against; store created
    assert(audit0.toMap.apply("semantic_dedup") == 2L, audit0.toString)
    assert(AnnIndexStore.committedBatches(spark, annRoot) == Seq(0L))

    val b1 = Seq(
      (10L, scrambled), // passes sig cross-dedup, falls at SEMANTIC
      (11L, "novel observations about glacier movement and seasonal melt")
    ).toDF("doc_id", "text")
    val (a1, audit1) = CorpusIngest.ingestIndexed(
      b1, "doc_id", "text", root, 1L, cfg, Some(g))
    val ids1 = a1.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == Set(11L), s"$ids1 audit=$audit1")
    val am = audit1.toMap
    assert(am("cross_dedup") == 2L, audit1.toString) // sig store missed it
    assert(am("semantic_dedup") == 1L, audit1.toString) // the gate caught it
    // both standing indexes carry exactly the accepted docs
    assert(SignatureIndexStore.sigsView(spark, root)
      .select("doc_id").collect().map(_.getLong(0)).toSet
      == Set(1L, 2L, 11L))
    // the semantic victim's own vector was NOT appended
    val nn = AnnIndexStore.query(spark, annRoot,
      graft.operators.TextOps.hashedEmbedding(
        Seq((99L, article)).toDF("doc_id", "text"), "doc_id", "text", 64),
      "doc_id", "embedding", k = 3, nprobe = 8)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(nn == Set(1L, 2L, 11L), nn.toString)

    // retried batch: the fence hides its own append — identical verdicts
    val (a1r, audit1r) = CorpusIngest.ingestIndexed(
      b1, "doc_id", "text", root, 1L, cfg, Some(g))
    assert(a1r.select("doc_id").collect().map(_.getLong(0)).toSet
      == Set(11L), audit1r.toString)
    assert(AnnIndexStore.committedBatches(spark, annRoot) == Seq(0L, 1L))
  }

  test("AnnGate: mutual paraphrases in ONE batch collapse to the minimum id") {
    import graft.operators.AnnIndexStore
    // neither paraphrase matches anything STANDING (the store is empty /
    // doesn't contain them yet), so the standing gate passes both — the
    // within-batch pass must cluster them and keep the min id, or the
    // pair permanently seeds the ANN index with a semantic duplicate
    val root = java.nio.file.Files
      .createTempDirectory("graft-annbatch").toString
    val annRoot = java.nio.file.Files
      .createTempDirectory("graft-annbatch-vec").toString
    val labels = java.nio.file.Files
      .createTempDirectory("graft-annbatch-labels").toString + "/labels"
    val g = CorpusIngest.AnnGate(
      annRoot, dim = 64, threshold = 0.9, nprobe = 8, numCentroids = 2)
    val article = "the committee reviewed the annual report and found " +
      "that the harbor restoration project had exceeded every one of " +
      "the stated goals while staying well under the approved budget"
    val scrambled = article.split(" ").sorted.mkString(" ")
    val b0 = Seq(
      (5L, article),
      (9L, scrambled), // same-batch paraphrase: identical bag-of-tokens
      (2L, "a careful study of historical documents reveals many patterns")
    ).toDF("doc_id", "text")
    val (a0, audit0) = CorpusIngest.ingestIndexed(
      b0, "doc_id", "text", root, 0L, cfg, Some(g), Some(labels))
    val ids0 = a0.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids0 == Set(2L, 5L), s"$ids0 audit=$audit0")
    // SEMANTIC within-batch lineage reaches the label store too
    val sem0 = graft.operators.LabelStore.labels(spark, labels).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sem0 == Map(5L -> 5L, 9L -> 5L), s"got $sem0")
    val am0 = audit0.toMap
    assert(am0("cross_dedup") == 3L, audit0.toString) // sigs all distinct
    assert(am0("semantic_dedup") == 3L, audit0.toString) // nothing standing
    assert(am0("semantic_batch_dedup") == 2L, audit0.toString)
    // the dropped paraphrase's vector is NOT in the standing store
    val nn = AnnIndexStore.query(spark, annRoot,
      graft.operators.TextOps.hashedEmbedding(
        Seq((99L, article)).toDF("doc_id", "text"), "doc_id", "text", 64),
      "doc_id", "embedding", k = 3, nprobe = 8)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(nn == Set(2L, 5L), nn.toString)
    // a LATER paraphrase falls at the STANDING gate instead
    val b1 = Seq((20L, article.split(" ").reverse.mkString(" ")))
      .toDF("doc_id", "text")
    val (a1, audit1) = CorpusIngest.ingestIndexed(
      b1, "doc_id", "text", root, 1L, cfg, Some(g), Some(labels))
    assert(a1.count() == 0L, audit1.toString)
    assert(audit1.toMap.apply("semantic_dedup") == 0L, audit1.toString)
    // the STANDING-gate semantic drop joins its keeper's cluster
    val sem1 = graft.operators.LabelStore.lookup(spark, labels,
        Seq(20L).toDF("id"), "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sem1 == Map(20L -> 5L), s"got $sem1")
  }

  test("degenerate-signature docs are dropped at gates: every accepted doc is indexed") {
    // "alpha, beta." has >= 2 PRE-tokens (passes a minTokens=2 floor) but
    // only 2 whitespace tokens < shingleK=3 ⇒ all-null signature. Under
    // the old semantics it was accepted but never indexed, so identical
    // copies in later batches were re-accepted forever.
    val lowFloor = cfg.copy(minTokens = 2)
    val index = CorpusIngest.emptyIndex(spark)
    val b = Seq((1L, "alpha, beta."),
      (2L, "a careful study of historical documents reveals many patterns"))
      .toDF("doc_id", "text")
    val r = CorpusIngest.ingest(b, "doc_id", "text", index, lowFloor)
    val ids = r.accepted.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(2L), s"accepted $ids; audit=${r.audit}")
    // invariant: accepted ⊆ indexed
    assert(r.updatedIndex.select("doc_id").collect().map(_.getLong(0)).toSet
      == ids)
  }
}
