package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.crawl.FrontierStore
import graft.operators.{CorpusIngest, DataSkipping}
import graft.operators.DataSkipping.ColRange
import graft.schema.{FetchStatus => FS}

/** `_SKIP` sidecar adoption inside the durable stores: frontier bucket
  * commits and corpus slice accepts/rewrites record footer-stats
  * sidecars, time-banded scans open only intersecting files, rows stay
  * identical to the unbanded filter, and every rewrite path leaves the
  * sidecar REFRESHED or ABSENT — never stale over rewritten files.
  */
class DataSkippingStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_skipstore").toString

  /** n urls per pld over `plds`, every row stamped `t`. */
  private def rows(plds: Seq[String], n: Int, t: Long, status: String) = {
    import spark.implicits._
    plds.flatMap(p => (0 until n).map(i =>
      (s"http://$p/page$i", p, status, t, 1.0f, 0L)))
      .toDF("url", "pld", "status", "statusTime", "score", "nextFetchTime")
  }

  test("frontier bucket commits record sidecars; banded age scan prunes and matches") {
    val root = tmp() + "/frontier"
    // old cohort: 4 plds stamped t=1000; fresh cohort: 28 plds at t=100000
    val oldPlds = (0 until 4).map(i => s"old$i.com")
    val freshPlds = (0 until 28).map(i => s"fresh$i.com")
    FrontierStore.mergeInto(spark, root,
      rows(oldPlds, 5, 1000L, FS.FETCHED), buckets = 16)
    FrontierStore.mergeInto(spark, root,
      rows(freshPlds, 5, 100000L, FS.FETCHED), buckets = 16)
    // every manifest bucket version dir carries a _SKIP sidecar
    val full = FrontierStore.read(spark, root).get
    val cutoff = 50000L
    val Some((banded, info)) = FrontierStore.readBanded(spark, root,
      Seq(ColRange("statusTime", Long.MinValue, cutoff)))
    val expect = full.filter(col("statusTime") <= cutoff)
      .select("url").collect().map(_.getString(0)).toSet
    val got = banded.select("url").collect().map(_.getString(0)).toSet
    assert(got == expect && got.size == 20)
    // the fresh-only bucket files (second merge rewrote the old plds'
    // buckets too, mixing times there — but buckets holding ONLY fresh
    // plds must be pruned): strictly fewer files than total
    assert(info.filesRead < info.filesTotal,
      s"time band opened every bucket file: $info")
  }

  test("retire refreshes touched buckets' sidecars; purged url leaves the banded view") {
    import spark.implicits._
    val root = tmp() + "/retire"
    FrontierStore.mergeInto(spark, root,
      rows(Seq("a.com", "b.com"), 4, 1000L, FS.FETCHED), buckets = 8)
    FrontierStore.retire(spark, root,
      Seq("http://a.com/page0").toDF("url"))
    // the rewritten bucket's NEW version dir carries a fresh sidecar —
    // refresh-or-absent holds on the purge path (new-named version dirs)
    val Some((banded, _)) = FrontierStore.readBanded(spark, root,
      Seq(ColRange("statusTime", Long.MinValue, Long.MaxValue)))
    val urls = banded.select("url").collect().map(_.getString(0)).toSet
    assert(!urls.contains("http://a.com/page0") && urls.size == 7)
    // and every committed bucket dir has its sidecar present
    val f = new java.io.File(root).listFiles().filter(_.getName.startsWith("g"))
    f.foreach { gdir =>
      gdir.listFiles().filter(d =>
        d.isDirectory && d.getName.startsWith("bucket=")).foreach { bdir =>
        assert(new java.io.File(bdir, "_SKIP").exists(),
          s"bucket dir ${bdir} lacks a sidecar")
      }
    }
  }

  test("pre-adoption buckets (no sidecar) read unpruned, rows still exact") {
    val root = tmp() + "/mixed"
    FrontierStore.mergeInto(spark, root,
      rows(Seq("x.com", "y.com", "z.com"), 4, 1000L, FS.FETCHED), buckets = 8)
    // simulate a store written before the hook: strip some sidecars
    val vdirs = new java.io.File(root).listFiles()
      .filter(_.getName.startsWith("g")).flatMap(_.listFiles())
      .filter(d => d.isDirectory && d.getName.startsWith("bucket="))
    assert(vdirs.nonEmpty)
    vdirs.take(1).foreach(v => new java.io.File(v, "_SKIP").delete())
    val Some((banded, info)) = FrontierStore.readBanded(spark, root,
      Seq(ColRange("statusTime", 2000L, 3000L))) // disjoint band
    assert(banded.isEmpty)
    // the stripped bucket's files are unprunable — read despite the
    // disjoint band; sidecar-bearing buckets prune to zero
    assert(info.filesRead > 0 && info.filesRead < info.filesTotal, s"$info")
  }

  test("slice accepts + rewrites keep sidecars fresh; banded corpus scan prunes") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val dir = tmp()
    val input = MemoryStream[(Long, String, Long)]
    // rolling window of 2 batches: batch 2 expires batch 0's slice →
    // the replaceSlice rewrite path runs inside the loop
    val q = CorpusIngest.streamingIndexed(
      input.toDF().toDF("doc_id", "text", "ts"),
      "doc_id", "text", s"$dir/index", s"$dir/accepted",
      retireFeed = CorpusIngest.rollingWindowFeed(
        spark, s"$dir/accepted", "doc_id", keepBatches = 2),
      sliceStatsCols = Seq("doc_id", "ts"))
    try {
      def doc(i: Long) = (i, s"unique document number $i with plenty of " +
        s"distinct words to clear the minhash gate ${i * 17} ${i * 31}",
        1000L * i)
      input.addData(Seq(doc(1), doc(2))); q.processAllAvailable()
      input.addData(Seq(doc(10), doc(11))); q.processAllAvailable()
      input.addData(Seq(doc(20), doc(21))); q.processAllAvailable()
      input.addData(Seq(doc(30), doc(31))); q.processAllAvailable()
    } finally q.stop()
    // every live slice leaf carries a sidecar — the expired slice was
    // REWRITTEN (sv= version) and its fresh sidecar lives in the live
    // leaf; the superseded dir (and its sidecar) is gone with deleteStale
    val f = graft.util.StoreProtocol.fs(spark, s"$dir/accepted")
    val names = graft.util.SliceRewrite
      .sliceNames(spark, s"$dir/accepted", "batch")
    assert(names.size == 4)
    val rewritten = names.filter(n => graft.util.SliceRewrite
      .liveVersion(f, s"$dir/accepted/$n").isDefined)
    assert(rewritten.nonEmpty, "rolling window should have rewritten a slice")
    names.foreach { n =>
      val leaf = graft.util.SliceRewrite.liveLeaf(f, s"$dir/accepted/$n")
      assert(new java.io.File(leaf, "_SKIP").exists(),
        s"live leaf of $n lacks a sidecar")
    }
    // banded read on ts: only the slices whose band intersects are opened
    val Some((banded, info)) = CorpusIngest.acceptedBanded(
      spark, s"$dir/accepted",
      Seq(ColRange("ts", 20000L, 21999L)))
    assert(banded.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(20L, 21L))
    assert(info.filesRead < info.filesTotal, s"$info")
  }

  test("a rewrite WITHOUT statsCols leaves the sidecar absent, never stale") {
    import spark.implicits._
    val root = tmp() + "/nostats"
    val df = spark.range(100L).select(
      col("id").as("doc_id"), concat(lit("d"), col("id")).as("text"),
      (col("id") * 100L).as("ts"))
    df.write.parquet(s"$root/batch=0")
    DataSkipping.writeStats(spark, s"$root/batch=0", Seq("ts"))
    // a rewrite through the raw SliceRewrite protocol (no stats hook):
    // the versioned dir must NOT inherit the old sidecar
    val survivors = spark.read.parquet(s"$root/batch=0/*.parquet")
      .filter(col("doc_id") >= 50L).localCheckpoint(true)
    graft.util.SliceRewrite.replaceSlice(spark, root, "batch=0", survivors)
    val f = graft.util.StoreProtocol.fs(spark, root)
    val leaf = graft.util.SliceRewrite.liveLeaf(f, s"$root/batch=0")
    assert(!new java.io.File(leaf, "_SKIP").exists(),
      "rewrite without the hook must leave the sidecar ABSENT")
    assert(!new java.io.File(s"$root/batch=0", "_SKIP").exists(),
      "the superseded sidecar must die with the superseded files")
    // and the banded read treats the slice as unprunable, rows exact
    val (banded, info) = DataSkipping.prunedReadDirs(spark,
      Seq(graft.util.SliceRewrite.liveReadPath(f, s"$root/batch=0")),
      Seq(ColRange("ts", 0L, 100L)))
    assert(banded.isEmpty && info.filesRead == info.filesTotal)
  }
}
