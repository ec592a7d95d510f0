package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.crawl._
import graft.operators.TrainingCorpus

/** Serializable page-map fetcher (an anonymous Fetcher inside the suite
  * would drag the non-serializable scalatest engine into the closure).
  */
private class MapPageFetcher(pages: Map[String, String]) extends Fetcher {
  override def fetch(url: String): FetchedPage = pages.get(url) match {
    case Some(html) => FetchedPage(200, html, "text/html")
    case None => FetchedPage(404, "", "text/plain")
  }
}

/** The switch-user story end to end: crawl real(istic) HTML with the
  * crawl topology, then feed `CrawlResult.parsed` straight into
  * `TrainingCorpus.build` — one library from frontier to training
  * corpus. Plants one victim per corpus gate INSIDE the crawled web:
  * a cross-domain mirrored article (near-dup), a repetition-spam page,
  * an under-length page, and a French page, and asserts each is
  * removed by the right stage while the clean prose survives.
  */
class CrawlToCorpusSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val article =
    "the committee reviewed the annual report and found that the harbor " +
      "restoration project had exceeded every one of the stated goals " +
      "while staying well under the approved budget for the second year"
  private val articleMirror = article.replace("second", "third")
  private val essay =
    "a long walk along the coastal path gives the observer time to " +
      "notice how the tide rearranges the gravel banks and how the " +
      "light changes the color of the water from hour to hour"

  private def page(title: String, body: String, links: Seq[String]) =
    s"<html><head><title>$title</title></head><body>" +
      links.map(l => s"""<a href="$l">more</a>""").mkString +
      s"<p>$body</p></body></html>"

  private val pages = Map(
    "http://a.com/" -> page("Home A", essay,
      Seq("http://a.com/article", "http://a.com/spam", "http://a.com/tiny",
        "http://a.com/fr")),
    "http://a.com/article" -> page("Article", article, Seq.empty),
    "http://a.com/spam" -> page("Spam",
      Seq.fill(30)("buy now").mkString(" "), Seq.empty),
    "http://a.com/tiny" -> page("Tiny", "ok", Seq.empty),
    "http://a.com/fr" -> page("Fr",
      "le chat et le chien sont dans la maison avec le garcon ce soir",
      Seq.empty),
    "http://b.com/" -> page("Home B",
      "notes from the other coast where the ferry schedule rules the " +
        "day and every arrival reshuffles the small harbor town entirely",
      Seq("http://b.com/mirror")),
    "http://b.com/mirror" -> page("Article", articleMirror, Seq.empty))

  private val fetcher: Fetcher = new MapPageFetcher(pages)

  test("crawl -> parsed -> TrainingCorpus: each gate removes its planted page") {
    val result = CrawlTopology.run(
      spark, Seq(("a.com", 1.0f), ("b.com", 1.0f)),
      fetcher, new MapRobotsFetcher(Map.empty),
      CrawlConfig(maxRounds = 8))
    val parsed = result.parsed
    assert(parsed.count() == 7, "every page should crawl and parse")

    val docs = parsed.select(
      xxhash64(col("url")).as("doc_id"), col("url"),
      col("pld").as("stratum"), col("text"))
    val built = TrainingCorpus.build(
      docs, "doc_id", "text", "stratum", None, "text", None,
      TrainingCorpus.Config(minAlphaRatio = 0.0, boilerplateMinDf = 99))

    val survivors = built.corpus
      .join(docs.select("doc_id", "url"), Seq("doc_id"))
      .select("url").collect().map(_.getString(0)).toSet
    // gates: tiny (token floor), fr (language), spam (repetition);
    // dedup: exactly ONE of the mirrored articles survives
    assert(!survivors("http://a.com/tiny"))
    assert(!survivors("http://a.com/fr"))
    assert(!survivors("http://a.com/spam"))
    val mirrors = Set("http://a.com/article", "http://b.com/mirror")
    assert((survivors & mirrors).size == 1, survivors.toString)
    assert(survivors("http://a.com/") && survivors("http://b.com/"))
    assert(survivors.size == 3, survivors.toString)

    val audit = built.audit.toMap
    assert(audit("input") == 7L)
    assert(audit("quality_lang_repetition") == 5L, built.audit.toString)
    assert(audit("repetition_gate") == 4L, built.audit.toString)
    assert(audit("dedup") == 3L, built.audit.toString)
  }

  test("continuous form: crawl batches -> ingestIndexed against the durable standing index") {
    import graft.operators.{CorpusIngest, SignatureIndexStore}
    // crawl site A, ingest as batch 0; then crawl site B (which mirrors
    // A's article) and ingest as batch 1 — the mirror must be blocked by
    // the STANDING index (site B's batch alone contains no duplicate)
    val root = java.nio.file.Files
      .createTempDirectory("graft-crawl-ingest").toString
    val cfgI = CorpusIngest.Config()
    def crawlDocs(seed: String) = {
      val parsed = CrawlTopology.run(
        spark, Seq((seed, 1.0f)),
        fetcher, new MapRobotsFetcher(Map.empty),
        CrawlConfig(maxRounds = 8)).parsed
      parsed.select(xxhash64(col("url")).as("doc_id"), col("url"),
        col("text")).localCheckpoint(true)
    }
    val a = crawlDocs("a.com")
    val (accA, _) = CorpusIngest.ingestIndexed(
      a, "doc_id", "text", root, 0L, cfgI)
    // ingestIndexed passes payload columns (url) through since round 14
    val urlsA = accA.select("url").collect().map(_.getString(0)).toSet
    // token floor eats tiny, repetition eats spam; the rest is admitted
    assert(urlsA == Set("http://a.com/", "http://a.com/article",
      "http://a.com/fr"), urlsA.toString)

    val b = crawlDocs("b.com")
    val (accB, auditB) = CorpusIngest.ingestIndexed(
      b, "doc_id", "text", root, 1L, cfgI)
    val urlsB = accB.select("url").collect().map(_.getString(0)).toSet
    assert(urlsB == Set("http://b.com/"), s"$urlsB audit=$auditB")
    // the mirror fell at CROSS dedup (standing index), not earlier
    val am = auditB.toMap
    assert(am("batch_dedup") == 2L && am("cross_dedup") == 1L,
      auditB.toString)
    // and the standing index now carries every admitted doc
    assert(SignatureIndexStore.sigsView(spark, root).count() == 4L)
  }

  test("continuous form with AnnGate: a cross-site paraphrase falls at SEMANTIC cross-dedup") {
    import graft.operators.{AnnIndexStore, CorpusIngest}
    // site C republishes A's article with the same vocabulary in a
    // different surface order (deterministic scramble — the shape of a
    // paraphrase to a bag-of-tokens embedder): 3-shingles shatter, so the
    // SIGNATURE index misses it; the embedding space does not
    val paraphrase = article.split(" ").sorted.mkString(" ")
    val cPages = pages ++ Map(
      "http://c.com/" -> page("Home C",
        "dispatches from the inland valley where orchard crews trade " +
          "weather lore and the irrigation ditches set the pace of work",
        Seq("http://c.com/para")),
      "http://c.com/para" -> page("Para", paraphrase, Seq.empty))
    val cFetcher: Fetcher = new MapPageFetcher(cPages)
    val root = java.nio.file.Files
      .createTempDirectory("graft-crawl-anngate").toString
    val annRoot = java.nio.file.Files
      .createTempDirectory("graft-crawl-anngate-vec").toString
    val cfgI = CorpusIngest.Config()
    val gate = CorpusIngest.AnnGate(
      annRoot, dim = 64, threshold = 0.9, nprobe = 8, numCentroids = 2)
    def crawlDocs(seed: String) = {
      val parsed = CrawlTopology.run(
        spark, Seq((seed, 1.0f)),
        cFetcher, new MapRobotsFetcher(Map.empty),
        CrawlConfig(maxRounds = 8)).parsed
      parsed.select(xxhash64(col("url")).as("doc_id"), col("url"),
        col("text")).localCheckpoint(true)
    }
    val a = crawlDocs("a.com")
    val (accA, _) = CorpusIngest.ingestIndexed(
      a, "doc_id", "text", root, 0L, cfgI, Some(gate))
    assert(accA.count() == 3L) // home, article, fr (tiny/spam gated)

    val c = crawlDocs("c.com")
    val (accC, auditC) = CorpusIngest.ingestIndexed(
      c, "doc_id", "text", root, 1L, cfgI, Some(gate))
    val urlsC = accC.select("url").collect().map(_.getString(0)).toSet
    assert(urlsC == Set("http://c.com/"), s"$urlsC audit=$auditC")
    val am = auditC.toMap
    // the paraphrase SURVIVED the signature cross-dedup...
    assert(am("cross_dedup") == 2L, auditC.toString)
    // ...and fell at the semantic gate against the standing vectors
    assert(am("semantic_dedup") == 1L, auditC.toString)
    // the ANN store grew only by the admitted doc
    assert(AnnIndexStore.committedBatches(spark, annRoot) == Seq(0L, 1L))
  }

  test("capstone: three stores, two kills mid-loop, resume with no refetch / re-accept / duplicate appends") {
    import graft.operators.{AnnIndexStore, CorpusIngest, SignatureIndexStore}
    // the full continuous system — durable frontier + signature store +
    // ANN store under CrawlCorpusLoop's wave protocol — killed at the two
    // nastiest seams and resumed:
    //   kill 1 after wave 1's FRONTIER MERGE, before ingest: the frontier
    //     says "fetched" but neither store has the docs — the staged
    //     parsed slice must carry them to ingest WITHOUT refetching;
    //   kill 2 after wave 1's STORE APPENDS, before the corpus write and
    //     wave marker: the replayed ingest must converge to the identical
    //     store state (no duplicate appends).
    val work = java.nio.file.Files
      .createTempDirectory("graft-capstone").toString
    val annRoot = s"$work/ann"
    val cfgC = CrawlConfig(maxRounds = 3)
    val cfgI = CorpusIngest.Config()
    val gate = CorpusIngest.AnnGate(
      annRoot, dim = 64, threshold = 0.9, nprobe = 8, numCentroids = 2)
    val seeds = Seq(("a.com", 1.0f), ("b.com", 1.0f))
    val counting: Fetcher = new CountingPageFetcher(pages)
    val robots = new MapRobotsFetcher(Map.empty)

    final class Kill extends RuntimeException("injected kill")
    def runTo(waves: Int, killAt: Option[(Int, String)]): Option[Kill] =
      try {
        CrawlCorpusLoop.run(spark, work, seeds, counting, robots, waves,
          cfgC, cfgI, Some(gate), lineage = true,
          onStage = (w, s) =>
            if (killAt.contains((w, s))) throw new Kill)
        None
      } catch { case k: Kill => Some(k) }

    CapstoneFetchLog.urls.clear()
    assert(runTo(2, Some((1, "merged"))).isDefined, "kill 1 must land")
    val fetchesRun1 = CapstoneFetchLog.pageFetches
    assert(fetchesRun1.nonEmpty)
    // wave 1 staged + merged, but nothing ingested for it
    assert(SignatureIndexStore.committedBatches(spark, s"$work/sig")
      == Seq(0L))

    CapstoneFetchLog.urls.clear()
    assert(runTo(2, Some((1, "ingested"))).isDefined, "kill 2 must land")
    // resume crawled NOTHING (wave 0 marker + wave 1's staged slice)...
    assert(CapstoneFetchLog.pageFetches.isEmpty,
      s"refetched: ${CapstoneFetchLog.pageFetches}")
    // ...yet both stores now carry wave 1's appends
    assert(SignatureIndexStore.committedBatches(spark, s"$work/sig")
      == Seq(0L, 1L))
    assert(AnnIndexStore.committedBatches(spark, annRoot) == Seq(0L, 1L))

    CapstoneFetchLog.urls.clear()
    assert(runTo(2, None).isEmpty, "final resume must complete")
    assert(CapstoneFetchLog.pageFetches.isEmpty,
      s"refetched: ${CapstoneFetchLog.pageFetches}")
    // replayed ingest converged: same single batch per store, and the
    // indexed doc set is exactly the corpus (each doc once)
    assert(SignatureIndexStore.committedBatches(spark, s"$work/sig")
      == Seq(0L, 1L))
    assert(AnnIndexStore.committedBatches(spark, annRoot) == Seq(0L, 1L))
    val corpus = CrawlCorpusLoop.corpus(spark, work)
      .select("url", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(corpus.length == corpus.toSet.size, "corpus carries a dup")
    val indexed = SignatureIndexStore.sigsView(spark, s"$work/sig")
      .select("doc_id").collect().map(_.getLong(0))
    assert(indexed.length == indexed.toSet.size, "sig store dup append")
    val corpusIds = CrawlCorpusLoop.corpus(spark, work)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(indexed.toSet == corpusIds,
      s"sig store ${indexed.toSet} != corpus $corpusIds")

    // reference: the SAME system, never killed, in a fresh workDir —
    // the killed-and-resumed corpus and stores must match it exactly
    val work2 = java.nio.file.Files
      .createTempDirectory("graft-capstone-ref").toString
    val gate2 = gate.copy(root = s"$work2/ann")
    CrawlCorpusLoop.run(spark, work2, seeds, counting, robots, 2,
      cfgC, cfgI, Some(gate2), lineage = true)
    // the FOURTH store: lineage folds committed once per wave, and the
    // killed-and-resumed label set equals the uninterrupted run's
    import graft.operators.LabelStore
    assert(LabelStore.committedBatches(spark, s"$work/labels")
      == Seq(0L, 1L))
    val lab1 = LabelStore.labels(spark, s"$work/labels").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lab2 = LabelStore.labels(spark, s"$work2/labels").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lab1 == lab2, s"lineage drifted: $lab1 vs $lab2")
    val refCorpus = CrawlCorpusLoop.corpus(spark, work2)
      .select("url", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(corpus.toSet == refCorpus.toSet,
      s"resumed corpus drifted: ${corpus.toSet} vs ${refCorpus.toSet}")
    // frontier agrees too: same URL -> status map
    val f1 = graft.crawl.FrontierStore.read(spark, s"$work/frontier").get
      .select("url", "status").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    val f2 = graft.crawl.FrontierStore.read(spark, s"$work2/frontier").get
      .select("url", "status").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(f1 == f2, s"frontier drifted: $f1 vs $f2")
    // and a fully-completed run is a pure no-op (markers short-circuit)
    CapstoneFetchLog.urls.clear()
    val again = CrawlCorpusLoop.run(
      spark, work, seeds, counting, robots, 2, cfgC, cfgI, Some(gate))
    assert(CapstoneFetchLog.pageFetches.isEmpty)
    assert(again.map(_.accepted).sum ==
      CrawlCorpusLoop.corpus(spark, work).count())
  }
}

/** JVM-global page-fetch journal for the capstone spec (its own object —
  * [[FetchLog]] belongs to ArchiveFetchSpec's suite).
  */
object CapstoneFetchLog {
  val urls = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  def pageFetches: Seq[String] = {
    import scala.jdk.CollectionConverters._
    urls.asScala.toSeq.filterNot(_.endsWith("/robots.txt"))
  }
}

/** Serializable counting fetcher over a page map (see [[MapPageFetcher]]). */
private class CountingPageFetcher(pages: Map[String, String])
    extends Fetcher {
  override def fetch(url: String): FetchedPage = {
    CapstoneFetchLog.urls.add(url)
    pages.get(url) match {
      case Some(html) => FetchedPage(200, html, "text/html")
      case None => FetchedPage(404, "", "text/plain")
    }
  }
}
