package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.crawl.CrawlCorpusLoop
import graft.schema.{FetchStatus => FS}

/** SnapshotDelta wired into the wave loop: incremental archive rounds
  * must fetch EXACTLY the ADDED ∪ CHANGED keys, surface GONE urls in the
  * frontier journal as retirement candidates, produce a corpus identical
  * to a full-recrawl run, and resume idempotently from a kill.
  */
class ArchiveLoopSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // two crawl rounds over a mutated web: A unchanged, B changed,
  // C gone, E added — every body long enough for 3-shingles
  private val bodyA =
    "the harbor restoration project exceeded every stated goal while " +
      "staying well under the approved budget for the second year running"
  private val bodyB1 =
    "ferry schedules rule the day in the small coastal town and every " +
      "arrival reshuffles the harbor front entirely for an hour"
  private val bodyB2 =
    "completely rewritten article about glacier movement and the slow " +
      "seasonal melt cycles observed across the northern ranges"
  private val bodyC =
    "notes on the annual committee review of the municipal water supply " +
      "infrastructure and the planned maintenance backlog for autumn"
  private val bodyE =
    "a brand new page describing the regional library expansion and the " +
      "reading programs planned for the coming winter season"

  private val round1 = Seq(
    ("http://a.com/a", bodyA), ("http://a.com/b", bodyB1),
    ("http://c.com/c", bodyC))
  private val round2 = Seq(
    ("http://a.com/a", bodyA), ("http://a.com/b", bodyB2),
    ("http://e.com/e", bodyE))

  /** Write one round's archive (WARC segments + CDX sidecar). */
  private def writeRound(
      base: String, pages: Seq[(String, String)], tMs: Long): (String, String) = {
    val warc = s"$base/warc"
    val cdx = s"$base/cdx"
    graft.sinks.Sinks.writeWarc(
      pages.toDF("url", "content")
        .withColumn("contentType", lit("text/html"))
        .withColumn("fetchTimeMs", lit(tMs)),
      warc)
    graft.sinks.Sinks.writeCdx(spark, warc, cdx)
    (warc, cdx)
  }

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_arch_$tag").toString

  private def corpusSet(workDir: String): Set[(Long, String, String)] =
    CrawlCorpusLoop.corpus(spark, workDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

  test("incremental round fetches exactly ADDED ∪ CHANGED; GONE lands in the frontier; corpus equals full recrawl") {
    val fix = tmp("fix")
    val (warc1, cdx1) = writeRound(s"$fix/r1", round1, 1700000000000L)
    val (warc2, cdx2) = writeRound(s"$fix/r2", round2, 1700086400000L)

    // incremental run
    val incWork = tmp("inc")
    CrawlCorpusLoop.runArchiveWave(spark, incWork, 0, warc1, cdx1)
    CrawlCorpusLoop.runArchiveWave(spark, incWork, 1, warc2, cdx2)
    // the second wave's FETCH set is exactly ADDED ∪ CHANGED
    val fetched = spark.read.parquet(s"$incWork/parsed/w=1")
      .select("url").collect().map(_.getString(0)).toSet
    assert(fetched == Set("http://a.com/b", "http://e.com/e"),
      s"fetched $fetched")
    // GONE is visible in the frontier journal, as the retirement feed
    val gone = CrawlCorpusLoop.retirementCandidates(spark, incWork)
      .select("url").collect().map(_.getString(0)).toSet
    assert(gone == Set("http://c.com/c"), s"gone $gone")
    val frontier = graft.crawl.FrontierStore
      .read(spark, s"$incWork/frontier").get
      .select("url", "status").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(frontier("http://c.com/c") == FS.HTTP_GONE, frontier.toString)
    assert(frontier("http://a.com/b") == FS.FETCHED, frontier.toString)

    // full-recrawl run: same rounds, but wave 1 re-reads the whole
    // archive (no previous-sidecar pointer)
    val fullWork = tmp("full")
    CrawlCorpusLoop.runArchiveWave(spark, fullWork, 0, warc1, cdx1)
    val f = new org.apache.hadoop.fs.Path(fullWork)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(fullWork, "_cdx_0"), false)
    CrawlCorpusLoop.runArchiveWave(spark, fullWork, 1, warc2, cdx2)
    // the full round fetched everything…
    val fullFetched = spark.read.parquet(s"$fullWork/parsed/w=1")
      .select("url").collect().map(_.getString(0)).toSet
    assert(fullFetched ==
      Set("http://a.com/a", "http://a.com/b", "http://e.com/e"))
    // …but the corpora are IDENTICAL: the unchanged re-fetch is dropped
    // by cross-dedup against the standing signature index
    assert(corpusSet(incWork) == corpusSet(fullWork))
    // and the incremental wave-1 slice is exactly the changed + added docs
    val w1 = spark.read.parquet(s"$incWork/corpus/w=1")
      .select("url").collect().map(_.getString(0)).toSet
    assert(w1 == Set("http://a.com/b", "http://e.com/e"), s"w1 $w1")
  }

  test("a kill after staging resumes to the identical end state") {
    val fix = tmp("fix2")
    val (warc1, cdx1) = writeRound(s"$fix/r1", round1, 1700000000000L)
    val (warc2, cdx2) = writeRound(s"$fix/r2", round2, 1700086400000L)
    val work = tmp("kill")
    CrawlCorpusLoop.runArchiveWave(spark, work, 0, warc1, cdx1)
    final class Kill extends RuntimeException("injected")
    intercept[Kill] {
      CrawlCorpusLoop.runArchiveWave(spark, work, 1, warc2, cdx2,
        onStage = (_, stage) => if (stage == "staged") throw new Kill)
    }
    assert(!new java.io.File(s"$work/_wave_1").exists())
    // resume: the staged fetch set is reused, the wave completes
    val r = CrawlCorpusLoop.runArchiveWave(spark, work, 1, warc2, cdx2)
    assert(!r.crawled, "resume re-fetched an already-staged wave")
    val w1 = spark.read.parquet(s"$work/corpus/w=1")
      .select("url").collect().map(_.getString(0)).toSet
    assert(w1 == Set("http://a.com/b", "http://e.com/e"), s"w1 $w1")
    assert(CrawlCorpusLoop.retirementCandidates(spark, work)
      .select("url").collect().map(_.getString(0)).toSet ==
      Set("http://c.com/c"))
    // re-running the completed wave is a marker-gated no-op
    val again = CrawlCorpusLoop.runArchiveWave(spark, work, 1, warc2, cdx2)
    assert(!again.crawled && again.accepted == r.accepted)
  }

  test("GONE feed drives takedownWave: the vanished url leaves corpus and standing index") {
    val fix = tmp("fix4")
    val (warc1, cdx1) = writeRound(s"$fix/r1", round1, 1700000000000L)
    val (warc2, cdx2) = writeRound(s"$fix/r2", round2, 1700086400000L)
    val work = tmp("td")
    CrawlCorpusLoop.runArchiveWave(spark, work, 0, warc1, cdx1)
    CrawlCorpusLoop.runArchiveWave(spark, work, 1, warc2, cdx2)
    // the full lifecycle composition: GONE candidates → one delete set →
    // corpus slices + standing signature index, as wave slot 2 (so no
    // later wave can collide with the retirement batch)
    val gone = CrawlCorpusLoop.retirementCandidates(spark, work)
    assert(gone.count() == 1L)
    CrawlCorpusLoop.takedownWave(spark, work, gone, "doc_id", wave = 2,
      urlCol = Some("url"))
    // the url is PURGED from the frontier journal itself (not merely
    // GONE-marked), and the candidate feed is consumed
    val journal = graft.crawl.FrontierStore
      .read(spark, s"$work/frontier").get
      .select("url").collect().map(_.getString(0)).toSet
    assert(!journal.contains("http://c.com/c"), s"journal $journal")
    assert(CrawlCorpusLoop.retirementCandidates(spark, work)
      .collect().isEmpty)
    // C's capture is gone from every wave slice…
    val urls = CrawlCorpusLoop.corpus(spark, work)
      .select("url").collect().map(_.getString(0)).toSet
    assert(!urls.contains("http://c.com/c"), s"corpus still holds C: $urls")
    assert(urls == Set("http://a.com/a", "http://a.com/b", "http://e.com/e"))
    // …and from the standing signature index: a verbatim resubmission of
    // C's body matches nothing anymore
    val probe = graft.operators.CorpusIngest.signatureIndex(
      Seq((777L, bodyC)).toDF("doc_id", "text"),
      "doc_id", "text", graft.operators.CorpusIngest.Config())
    val m = graft.operators.SignatureIndexStore.matches(
      spark, s"$work/sig", probe, 0.5)
    assert(m.collect().isEmpty,
      "retired doc still matches in the standing signature index")
    // the loop CONTINUES after the takedown wave: wave 3's snapshot has
    // C back — the sidecar diff looks PAST the takedown slot (vs wave
    // 1's sidecar), fetches only the re-added C, and its append id (3)
    // is past the retirement batch (2), so the re-capture is live again
    val round3 = round2 :+ ("http://c.com/c", bodyC)
    val (warc3, cdx3) = writeRound(s"$fix/r3", round3, 1700172800000L)
    CrawlCorpusLoop.runArchiveWave(spark, work, 3, warc3, cdx3)
    val fetched3 = spark.read.parquet(s"$work/parsed/w=3")
      .select("url").collect().map(_.getString(0)).toSet
    assert(fetched3 == Set("http://c.com/c"), s"fetched $fetched3")
    val urls2 = CrawlCorpusLoop.corpus(spark, work)
      .select("url").collect().map(_.getString(0)).toSet
    assert(urls2.contains("http://c.com/c"), s"re-capture not live: $urls2")
    // and a data append at the RETIREMENT batch id is refused loudly
    intercept[IllegalArgumentException] {
      graft.operators.SignatureIndexStore.append(spark, s"$work/sig",
        probe, 2L, graft.operators.SignatureIndexStore.Meta(
          graft.operators.CorpusIngest.indexBuckets(
            graft.operators.CorpusIngest.Config()),
          graft.operators.CorpusIngest.Config().numHashes,
          graft.operators.CorpusIngest.Config().bandSize))
    }
  }

  // ---------------------------------------------------- retention policy

  private def sigSet(workDir: String): Set[Long] =
    graft.operators.SignatureIndexStore.sigsView(spark, s"$workDir/sig")
      .select("doc_id").collect().map(_.getLong(0)).toSet

  private def frontierSet(workDir: String): Set[(String, String)] =
    graft.crawl.FrontierStore.read(spark, s"$workDir/frontier")
      .map(_.select("url", "status").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet)
      .getOrElse(Set.empty)

  test("retention: a multi-wave run autonomously purges the GONE-AGED url and not the fresh GONE") {
    import graft.crawl.{RetentionConfig, RetentionPolicy}
    val t1 = 1700000000000L
    val t2 = t1 + 86400000L
    val t3 = t2 + 86400000L
    val fix = tmp("ret")
    val (warc1, cdx1) = writeRound(s"$fix/r1", round1, t1)
    val (warc2, cdx2) = writeRound(s"$fix/r2", round2, t2) // C goes GONE
    val (warc3, cdx3) = writeRound(s"$fix/r3", round2, t3) // C still gone
    // grace = one snapshot interval: C is FRESH gone at round 2's sweep,
    // AGED at round 3's
    val retention = RetentionConfig(goneGraceMs = Some(86400000L))

    val work = tmp("retwork")
    val first = RetentionPolicy.runRetentive(spark, work,
      Seq((warc1, cdx1), (warc2, cdx2)), retention)
    // round 2's sweep saw the fresh GONE and did NOT fire
    assert(first.map(_._2.retired) == Seq(0L, 0L), first.toString)
    assert(CrawlCorpusLoop.corpus(spark, work)
      .select("url").collect().map(_.getString(0)).toSet
      .contains("http://c.com/c"), "fresh GONE was purged early")
    assert(frontierSet(work).contains(("http://c.com/c", FS.HTTP_GONE)))

    // continuing with round 3 (the resume path: rounds 1-2 are skipped
    // via their sidecar pointers) ages C past the grace — the sweep
    // fires autonomously
    val second = RetentionPolicy.runRetentive(spark, work,
      Seq((warc1, cdx1), (warc2, cdx2), (warc3, cdx3)), retention)
    assert(second.map(_._2.retired) == Seq(0L, 0L, 1L), second.toString)
    // wave slots: 0,1 = snapshots 1,2; 2 = snapshot 3; 3 = the takedown
    assert(second.last._2.wave == 3, second.toString)
    val urls = CrawlCorpusLoop.corpus(spark, work)
      .select("url").collect().map(_.getString(0)).toSet
    assert(!urls.contains("http://c.com/c"), s"corpus still holds C: $urls")
    assert(!frontierSet(work).exists(_._1 == "http://c.com/c"),
      "GONE url not purged from the frontier journal")

    // end state hash-equals a MANUAL takedown over the same waves
    val manual = tmp("retmanual")
    CrawlCorpusLoop.runArchiveWave(spark, manual, 0, warc1, cdx1)
    CrawlCorpusLoop.runArchiveWave(spark, manual, 1, warc2, cdx2)
    CrawlCorpusLoop.runArchiveWave(spark, manual, 2, warc3, cdx3)
    CrawlCorpusLoop.takedownWave(spark, manual,
      CrawlCorpusLoop.retirementCandidates(spark, manual), "doc_id",
      wave = 3, urlCol = Some("url"))
    assert(corpusSet(work) == corpusSet(manual))
    assert(sigSet(work) == sigSet(manual))
    assert(frontierSet(work) == frontierSet(manual))
  }

  test("retention: a kill between the takedown journal and the slot marker converges on resume") {
    import graft.crawl.{RetentionConfig, RetentionPolicy}
    val t1 = 1700000000000L
    val t2 = t1 + 86400000L
    val t3 = t2 + 86400000L
    val fix = tmp("retkill")
    val (warc1, cdx1) = writeRound(s"$fix/r1", round1, t1)
    val (warc2, cdx2) = writeRound(s"$fix/r2", round2, t2)
    val (warc3, cdx3) = writeRound(s"$fix/r3", round2, t3)
    val snaps = Seq((warc1, cdx1), (warc2, cdx2), (warc3, cdx3))
    val retention = RetentionConfig(goneGraceMs = Some(86400000L))

    // build the crash state: all three waves done (sweep never fires
    // under an infinite grace), then the sweep's takedown ran to its
    // JOURNAL completion — stores tombstoned at batch 3, corpus slices
    // rewritten — but the process died before the _wave_3 marker and
    // the frontier purge
    val work = tmp("retkillwork")
    RetentionPolicy.runRetentive(spark, work, snaps,
      RetentionConfig(goneGraceMs = Some(Long.MaxValue)))
    val cands = RetentionPolicy.candidates(spark, work, retention, t3)
      .localCheckpoint(true)
    assert(cands.count() == 1L)
    graft.operators.Takedown.takedown(spark, cands, "doc_id",
      graft.operators.Takedown.Targets(
        corpusDir = Some(s"$work/corpus"), corpusPartitionCol = "w",
        sigRoot = Some(s"$work/sig")),
      s"$work/takedowns", retireBatchId = Some(3L))
    assert(!new java.io.File(s"$work/_wave_3").exists())
    assert(frontierSet(work).exists(_._1 == "http://c.com/c"),
      "crash state should still hold the un-purged GONE row")

    // resume: the same runRetentive call re-derives the candidates and
    // re-fires into the still-unmarked slot 3 — the stores' digest
    // guard makes the retire re-runs no-ops, the corpus rewrite finds
    // nothing left to rewrite, and the frontier purge completes
    val resumed = RetentionPolicy.runRetentive(spark, work, snaps, retention)
    assert(resumed.map(_._2.retired) == Seq(0L, 0L, 1L), resumed.toString)
    assert(resumed.last._2.wave == 3, resumed.toString)
    assert(new java.io.File(s"$work/_wave_3").exists())
    assert(!frontierSet(work).exists(_._1 == "http://c.com/c"))

    // end state identical to the never-crashed autonomous world
    val clean = tmp("retkillclean")
    RetentionPolicy.runRetentive(spark, clean, snaps, retention)
    assert(corpusSet(work) == corpusSet(clean))
    assert(sigSet(work) == sigSet(clean))
    assert(frontierSet(work) == frontierSet(clean))
  }

  test("retention: robots revocation retires already-crawled pages of a newly-disallowed path") {
    import graft.crawl.{Fetcher, FetchedPage, RetentionConfig,
      RetentionPolicy}
    val t1 = 1700000000000L
    val fix = tmp("rob")
    val (warc1, cdx1) = writeRound(s"$fix/r1", round1, t1)
    val work = tmp("robwork")
    CrawlCorpusLoop.runArchiveWave(spark, work, 0, warc1, cdx1)
    assert(CrawlCorpusLoop.corpus(spark, work).count() == 3L)
    // c.com has since disallowed /c; a.com's robots.txt is DOWN (503)
    // — indeterminate, which must never delete (a transient outage
    // would otherwise mass-purge the host); everyone else 404s (no
    // robots.txt = allow all = no revocation)
    final class RevokedRobots extends Fetcher {
      def fetch(url: String): FetchedPage =
        if (url.startsWith("http://c.com/"))
          FetchedPage(200, "User-agent: *\nDisallow: /c", "text/plain")
        else if (url.startsWith("http://a.com/"))
          FetchedPage(503, "", "text/plain")
        else FetchedPage(404, "", "text/plain")
    }
    // the sweep clock comes from the loop's own recorded sidecar — the
    // standalone-sweep form of runRetentive's per-round clock
    val clock = RetentionPolicy.loopClock(spark, work).get
    assert(clock == t1, s"clock $clock")
    val swept = RetentionPolicy.sweep(spark, work,
      RetentionConfig(robotsFetcher = Some(new RevokedRobots)),
      nowMs = clock + 1000L)
    assert(swept.retired == 1L, swept.toString)
    val urls = CrawlCorpusLoop.corpus(spark, work)
      .select("url").collect().map(_.getString(0)).toSet
    assert(urls == Set("http://a.com/a", "http://a.com/b"),
      s"503-host pages deleted or revoked url kept: $urls")
    assert(!frontierSet(work).exists(_._1 == "http://c.com/c"),
      "revoked url not purged from the frontier journal")
    // a second sweep with the same rules finds nothing (the purge
    // consumed the candidate; the 503 host still must not fire)
    assert(RetentionPolicy.sweep(spark, work,
      RetentionConfig(robotsFetcher = Some(new RevokedRobots)),
      nowMs = clock + 2000L).retired == 0L)
  }

  test("retention: the pinned candidate set survives a crash even when the live robots answer changes") {
    import graft.crawl.{Fetcher, FetchedPage, RetentionConfig,
      RetentionPolicy}
    import graft.operators.Takedown
    val t1 = 1700000000000L
    val fix = tmp("pin")
    val (warc1, cdx1) = writeRound(s"$fix/r1", round1, t1)
    val work = tmp("pinwork")
    CrawlCorpusLoop.runArchiveWave(spark, work, 0, warc1, cdx1)
    // crash state: the sweep derived + PINNED {c.com/c} at slot 1 and
    // its takedown ran to journal completion, but died before the slot
    // marker and the frontier purge
    val cands = RetentionPolicy.candidates(spark, work,
        RetentionConfig(goneGraceMs = None, maxAgeMs = Some(0L)), t1 + 1L)
      .filter(col("url") === "http://c.com/c").localCheckpoint(true)
    assert(cands.count() == 1L)
    cands.write.mode("overwrite").parquet(s"$work/_sweep_w=1/cands")
    Takedown.takedown(spark, cands, "doc_id",
      Takedown.Targets(corpusDir = Some(s"$work/corpus"),
        corpusPartitionCol = "w", sigRoot = Some(s"$work/sig")),
      s"$work/takedowns", retireBatchId = Some(1L))
    // resume: the live robots answer has CHANGED (now allows everything
    // → a re-derivation would produce a DIFFERENT set and a different
    // digest under committed batch 1, wedging the journal). The sweep
    // must reuse the pin instead.
    final class AllowAllRobots extends Fetcher {
      def fetch(url: String): FetchedPage =
        FetchedPage(404, "", "text/plain")
    }
    val swept = RetentionPolicy.sweep(spark, work,
      RetentionConfig(robotsFetcher = Some(new AllowAllRobots)),
      nowMs = t1 + 2L)
    assert(swept.wave == 1 && swept.retired == 1L, swept.toString)
    assert(new java.io.File(s"$work/_wave_1").exists())
    assert(!new java.io.File(s"$work/_sweep_w=1").exists(),
      "completed sweep pin was not reclaimed")
    assert(!frontierSet(work).exists(_._1 == "http://c.com/c"))
    val urls = CrawlCorpusLoop.corpus(spark, work)
      .select("url").collect().map(_.getString(0)).toSet
    assert(urls == Set("http://a.com/a", "http://a.com/b"), s"left $urls")
    // and the journal is NOT wedged: a later takedown still works
    Takedown.takedown(spark,
      cands.select((col("doc_id") + 1L).as("doc_id")), "doc_id",
      Takedown.Targets(corpusDir = Some(s"$work/corpus"),
        corpusPartitionCol = "w", sigRoot = Some(s"$work/sig")),
      s"$work/takedowns", retireBatchId = Some(2L))
  }

  test("retention: age TTL retires content not re-fetched within the bound, keeps fresh captures") {
    import graft.crawl.{RetentionConfig, RetentionPolicy}
    val t1 = 1700000000000L
    val t2 = t1 + 86400000L
    val fix = tmp("ttl")
    val (warc1, cdx1) = writeRound(s"$fix/r1", round1, t1)
    val (warc2, cdx2) = writeRound(s"$fix/r2", round2, t2)
    val work = tmp("ttlwork")
    // maxAge = one interval: A (fetched at t1, unchanged at t2 so never
    // re-fetched) expires at round 2's sweep; B (changed, re-fetched at
    // t2) and E (new at t2) stay. C is GONE — the TTL rule does not
    // claim it (no grace configured, so nothing else does either).
    val results = RetentionPolicy.runRetentive(spark, work,
      Seq((warc1, cdx1), (warc2, cdx2)),
      RetentionConfig(maxAgeMs = Some(86400000L)))
    assert(results.map(_._2.retired) == Seq(0L, 1L), results.toString)
    val urls = CrawlCorpusLoop.corpus(spark, work)
      .select("url").collect().map(_.getString(0)).toSet
    assert(!urls.contains("http://a.com/a"), s"expired url kept: $urls")
    assert(urls.contains("http://a.com/b") && urls.contains("http://e.com/e"),
      s"fresh captures lost: $urls")
  }

  test("a re-captured GONE url flips back to FETCHED and leaves the retirement feed") {
    val fix = tmp("fix3")
    val (warc1, cdx1) = writeRound(s"$fix/r1", round1, 1700000000000L)
    val (warc2, cdx2) = writeRound(s"$fix/r2", round2, 1700086400000L)
    // round 3: C comes back (same content), B and E persist unchanged
    val round3 = Seq(
      ("http://a.com/a", bodyA), ("http://a.com/b", bodyB2),
      ("http://e.com/e", bodyE), ("http://c.com/c", bodyC))
    val (warc3, cdx3) = writeRound(s"$fix/r3", round3, 1700172800000L)
    val work = tmp("flip")
    CrawlCorpusLoop.runArchiveWave(spark, work, 0, warc1, cdx1)
    CrawlCorpusLoop.runArchiveWave(spark, work, 1, warc2, cdx2)
    CrawlCorpusLoop.runArchiveWave(spark, work, 2, warc3, cdx3)
    // wave 2 fetched only the re-ADDED C
    val fetched = spark.read.parquet(s"$work/parsed/w=2")
      .select("url").collect().map(_.getString(0)).toSet
    assert(fetched == Set("http://c.com/c"), s"fetched $fetched")
    // the retirement feed is empty again (terminal recency)
    assert(CrawlCorpusLoop.retirementCandidates(spark, work)
      .collect().isEmpty)
    // and C's re-capture was dropped by cross-dedup (same content as
    // wave 0's ingest): each distinct BODY is in the corpus exactly once
    // (url b appears twice by design — its old AND changed capture were
    // both accepted; same url, different content)
    val rows = CrawlCorpusLoop.corpus(spark, work)
      .select("url", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows.size == rows.distinct.size, s"duplicate captures: $rows")
    assert(rows.count(_._1 == "http://c.com/c") == 1, rows.toString)
  }

  test("completed-wave resume count resolves the slice's LIVE version under rewrite crash shapes") {
    val base = tmp("resumecnt")
    val (warc1, cdx1) = writeRound(s"$base/r1", round1, 1000L)
    val work = s"$base/work"
    val r0 = CrawlCorpusLoop.runArchiveWave(spark, work, 0, warc1, cdx1)
    assert(r0.accepted == 3L)
    val sliceDir = s"$work/corpus/w=0"

    // crash shape 1: a retention rewrite staged sv=0 (with _SUCCESS) but
    // died before the pointer flip — a plain dir read of the now
    // mixed-depth slice throws 'Conflicting directory structures'; the
    // resume count must resolve to the still-live plain files instead
    Seq((99L, "http://ghost", "orphan rows that must not count"))
      .toDF("doc_id", "url", "text")
      .write.parquet(s"$sliceDir/sv=0")
    val r1 = CrawlCorpusLoop.runArchiveWave(spark, work, 0, warc1, cdx1)
    assert(!r1.crawled && r1.accepted == 3L,
      s"orphan staged version corrupted the resume count: ${r1.accepted}")
    graft.util.SliceRewrite.gcStale(spark, s"$work/corpus", "w")

    // crash shape 2: a rewrite FLIPPED (sv=0 live, one doc removed) but
    // died before deleting the superseded plain originals — a plain read
    // would double-count; the resume count must see only the live version
    val survivors = spark.read.parquet(s"$sliceDir/*.parquet")
      .filter(col("url") =!= "http://c.com/c").localCheckpoint(true)
    graft.util.SliceRewrite.replaceSlice(spark, s"$work/corpus", "w=0", survivors)
    // re-plant a superseded plain file (replaceSlice deleted them)
    val scratch = s"$base/scratch"
    Seq((98L, "http://stale", "superseded plain rows"))
      .toDF("doc_id", "url", "text").coalesce(1).write.parquet(scratch)
    val f = new org.apache.hadoop.fs.Path(scratch)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val part = f.listStatus(new org.apache.hadoop.fs.Path(scratch))
      .map(_.getPath).filter(_.getName.startsWith("part-")).head
    f.rename(part, new org.apache.hadoop.fs.Path(sliceDir, "part-stale.parquet"))
    val r2 = CrawlCorpusLoop.runArchiveWave(spark, work, 0, warc1, cdx1)
    assert(!r2.crawled && r2.accepted == 2L,
      s"superseded plain files leaked into the resume count: ${r2.accepted}")
  }

  test("retention: an untouched pin under a CHANGED config is advisory; same config honors it") {
    import graft.crawl.{RetentionConfig, RetentionPolicy}
    val t1 = 1700000000000L
    val fix = tmp("pincfg")
    val (warc1, cdx1) = writeRound(s"$fix/r1", round1, t1)
    val work = tmp("pincfgwork")
    CrawlCorpusLoop.runArchiveWave(spark, work, 0, warc1, cdx1)
    val armed = RetentionConfig(maxAgeMs = Some(0L)) // everything expires
    def plantPin(): Unit = {
      // the crash shape: sweep derived + pinned ONE candidate and died
      // before Takedown wrote any journal entry (_PLAN) — nothing
      // references the slot yet
      val cands = RetentionPolicy.candidates(spark, work, armed, t1 + 1L)
        .filter(col("url") === "http://c.com/c").localCheckpoint(true)
      assert(cands.count() == 1L)
      cands.write.mode("overwrite").parquet(s"$work/_sweep_w=1/cands")
      graft.util.FsAtomic.writePointer(
        new org.apache.hadoop.fs.Path(work)
          .getFileSystem(spark.sparkContext.hadoopConfiguration),
        new org.apache.hadoop.fs.Path(s"$work/_sweep_w=1"), "_CFG",
        "gone=None age=Some(0) robots=false")
    }

    // operator DISARMED retention after the crash: the untouched pin
    // must not force the stale delete set — re-derive (empty), no wave
    plantPin()
    val disarmed = RetentionPolicy.sweep(spark, work,
      RetentionConfig(), nowMs = t1 + 2L)
    assert(disarmed.wave == -1 && disarmed.retired == 0L, disarmed.toString)
    assert(!new java.io.File(s"$work/_sweep_w=1").exists(),
      "stale-config pin not discarded")
    val urls0 = CrawlCorpusLoop.corpus(spark, work)
      .select("url").collect().map(_.getString(0)).toSet
    assert(urls0.size == 3, s"disarmed sweep deleted something: $urls0")

    // same config on resume: the pin IS the sweep (deterministic crash
    // resume) — it must be read verbatim, not re-derived (re-derivation
    // under maxAgeMs=0 would catch all 3 docs, the pin holds 1)
    plantPin()
    val resumed = RetentionPolicy.sweep(spark, work, armed, nowMs = t1 + 2L)
    assert(resumed.wave == 1 && resumed.retired == 1L, resumed.toString)
    val urls1 = CrawlCorpusLoop.corpus(spark, work)
      .select("url").collect().map(_.getString(0)).toSet
    assert(urls1 == Set("http://a.com/a", "http://a.com/b"),
      s"pin not honored verbatim under the same config: $urls1")
  }
}
