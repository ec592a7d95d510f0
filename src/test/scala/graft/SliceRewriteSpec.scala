package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.util.{SliceRewrite, StoreProtocol}

/** The versioned-slice rewrite protocol in isolation: readers must see
  * exactly one complete version of every slice at EVERY protocol point
  * (staged-not-flipped, flipped-not-deleted, crash leftovers), versions
  * must advance monotonically, and gcStale must reap everything that is
  * not the live version. The composed lifecycle arms live in
  * TakedownSpec / ArchiveLoopSpec; these pin the primitive.
  */
class SliceRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_slice").toString

  private def ids(root: String): Set[Long] =
    SliceRewrite.readAll(spark, root, "batch")
      .map(_.select("id").collect().map(_.getLong(0)).toSet)
      .getOrElse(Set.empty)

  test("an orphan sv= dir inside a still-plain slice never leaks into reads; gcStale reaps it") {
    val root = tmp() + "/corpus"
    Seq(1L, 2L, 3L).toDF("id")
      .write.parquet(s"$root/batch=0")
    // a crashed first rewrite left a staged version (even with _SUCCESS)
    // that was never flipped live — its rows must not appear (neither
    // replacing nor DUPLICATING the plain files)
    Seq(2L, 3L).toDF("id")
      .write.parquet(s"$root/batch=0/sv=0")
    assert(ids(root) == Set(1L, 2L, 3L), s"orphan leaked: ${ids(root)}")
    SliceRewrite.gcStale(spark, root, "batch")
    assert(!new java.io.File(s"$root/batch=0/sv=0").exists(),
      "gcStale kept an orphan staged version in a plain slice")
    assert(ids(root) == Set(1L, 2L, 3L))
  }

  test("replaceSlice advances versions monotonically; reads always follow the pointer; stale versions die") {
    val root = tmp() + "/corpus"
    Seq(1L, 2L, 3L).toDF("id").write.parquet(s"$root/batch=0")
    Seq(10L, 11L).toDF("id").write.parquet(s"$root/batch=1")
    val f = StoreProtocol.fs(spark, root)
    // first rewrite: plain → sv=0
    SliceRewrite.replaceSlice(spark, root, "batch=0",
      Seq(2L, 3L).toDF("id"))
    assert(SliceRewrite.liveVersion(f, s"$root/batch=0").contains(0L))
    assert(ids(root) == Set(2L, 3L, 10L, 11L))
    // the plain originals are gone (privacy: retired bytes must not
    // outlive the rewrite)
    val loose = new java.io.File(s"$root/batch=0").listFiles()
      .map(_.getName).filter(_.endsWith(".parquet"))
    assert(loose.isEmpty, s"plain originals survived: ${loose.toSeq}")
    // second rewrite: sv=0 → sv=1, old version deleted
    SliceRewrite.replaceSlice(spark, root, "batch=0", Seq(3L).toDF("id"))
    assert(SliceRewrite.liveVersion(f, s"$root/batch=0").contains(1L))
    assert(!new java.io.File(s"$root/batch=0/sv=0").exists())
    assert(ids(root) == Set(3L, 10L, 11L))
    // mixed plain + versioned slices read together (two basePath groups)
    val withCol = SliceRewrite.readAll(spark, root, "batch").get
      .select("batch", "id").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(withCol == Set((0, 3L), (1, 10L), (1, 11L)), withCol.toString)
  }

  test("a flipped-but-undeleted previous version serves reads cleanly and gcStale makes the delete physical") {
    val root = tmp() + "/corpus"
    Seq(1L, 2L).toDF("id").write.parquet(s"$root/batch=0")
    // hand-build the crash state: sv=0 written AND _V flipped, plain
    // files not yet deleted
    Seq(2L).toDF("id").write.parquet(s"$root/batch=0/sv=0")
    graft.util.FsAtomic.writePointer(StoreProtocol.fs(spark, root),
      new org.apache.hadoop.fs.Path(s"$root/batch=0"), "_V", "0")
    assert(ids(root) == Set(2L), s"reader saw stale rows: ${ids(root)}")
    SliceRewrite.gcStale(spark, root, "batch")
    val leftover = new java.io.File(s"$root/batch=0").listFiles()
      .map(_.getName).filter(_.endsWith(".parquet"))
    assert(leftover.isEmpty, s"stale plain files survived: ${leftover.toSeq}")
    assert(ids(root) == Set(2L))
  }

  test("a reader racing the post-flip delete fails loudly; the RETRY sees the complete new version") {
    val root = tmp() + "/corpus"
    Seq(1L, 2L, 3L, 4L).toDF("id").write.parquet(s"$root/batch=0")
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // reader resolves the CURRENT live version (plain files) but has not
    // finished scanning when the takedown rewrites the slice
    val stalePath = SliceRewrite.liveReadPath(f, s"$root/batch=0")
    val staleDf = spark.read.parquet(stalePath)
    SliceRewrite.replaceSlice(spark, root, "batch=0",
      Seq(1L, 2L).toDF("id")) // survivors; flip + delete superseded
    // the stale handle fails LOUDLY — never a silent partial result
    val e = intercept[Exception](staleDf.collect())
    assert(e.toString.toLowerCase.contains("file") ||
      e.getCause != null, s"expected a loud read failure, got $e")
    // the retry (re-resolve live path) sees the COMPLETE new version
    val retried = spark.read
      .parquet(SliceRewrite.liveReadPath(f, s"$root/batch=0"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(retried == Set(1L, 2L),
      s"retried reader saw an incomplete version: $retried")
  }
}
