package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Atomic in-place replacement of one corpus SLICE (`<partCol>=<b>`
  * parquet dir) — the write path a takedown uses to physically drop
  * retired rows from plain-parquet corpora
  * ([[graft.operators.Takedown]] over an ingest loop's accepted dirs and
  * [[graft.crawl.CrawlCorpusLoop]]'s wave slices).
  *
  * A naive swap (write survivors aside, DELETE the live dir, rename the
  * rewrite in) has two failure modes this protocol closes:
  *
  *  1. '''Crash in the window''' — after the delete, before the rename:
  *     the slice's non-retired rows exist only in the rewrite dir, and a
  *     resume that recomputes "dirs still holding retired ids" no longer
  *     sees the slice at all — the loss is silent and permanent.
  *  2. '''Reader in the window''' — a concurrent reader listing the
  *     corpus between delete and rename sees the partition MISSING
  *     entirely and silently under-reports.
  *
  * Here a slice becomes VERSIONED on its first rewrite: survivors are
  * written to a `sv=<k>` subdir (the parquet job's `_SUCCESS` is the
  * write fence), then the slice's `_V` pointer flips to `k` atomically
  * ([[FsAtomic.writePointer]] — readers resolve either the old complete
  * version or the new one, never a partial and never absence), and only
  * then is superseded data deleted. The original un-versioned files are
  * themselves "version -1": they are removed only after the flip.
  * Readers racing that final delete fail LOUDLY (file-not-found on a
  * path they already resolved) rather than silently missing rows —
  * retired data must not outlive the takedown, so there is no
  * reader-retention window (the [[graft.crawl.FrontierStore]] purge
  * precedent: privacy outranks the retention window).
  *
  * Crash-safety: every step is re-runnable. [[gcStale]] (run before a
  * rewrite pass, and by Takedown.resume) removes non-live `sv=` dirs —
  * both half-written crash leftovers and superseded versions whose
  * delete crashed; a committed flip whose superseded-delete crashed is
  * thereby healed on ANY later pass, not just a rewrite of the same
  * slice.
  *
  * Layout note: a versioned slice's files live one level deeper
  * (`…/batch=3/sv=2/part-*.parquet`), so a whole-root
  * `spark.read.parquet(corpusDir)` stops working once a corpus holds a
  * mix of plain and versioned slices (Spark refuses mixed partition
  * depths). [[read]] is the layout-aware reader: it groups live leaves
  * by depth, reads each group under one `basePath`, and unions — the
  * common never-taken-down corpus stays a single plain read.
  */
object SliceRewrite {

  private def fs(spark: SparkSession, p: String): FileSystem =
    StoreProtocol.fs(spark, p)

  /** Slice dir names (`<partCol>=<b>`) under `root`, ascending by b. */
  def sliceNames(
      spark: SparkSession, root: String, partCol: String): Seq[String] = {
    val f = fs(spark, root)
    val p = new Path(root)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith(s"$partCol="))
      .sortBy(_.stripPrefix(s"$partCol=").toLong).toSeq
  }

  /** The live version of a slice: Some(k) once versioned, None while the
    * original plain files still serve.
    */
  def liveVersion(f: FileSystem, sliceDir: String): Option[Long] =
    StoreProtocol.readSmall(f, new Path(sliceDir, "_V")).map(_.trim.toLong)

  /** The dir whose files are the slice's CURRENT content. */
  def liveLeaf(f: FileSystem, sliceDir: String): String =
    liveVersion(f, sliceDir) match {
      case Some(k) => s"$sliceDir/sv=$k"
      case None    => sliceDir
    }

  /** The path to READ the slice's current content from. A versioned
    * slice reads its live `sv=` dir; a plain slice reads a `*.parquet`
    * file glob rather than the dir itself, so a crashed first-rewrite's
    * orphan `sv=` subdir (written but never flipped live) can never leak
    * into the scan as mixed-depth duplicates.
    */
  def liveReadPath(f: FileSystem, sliceDir: String): String =
    liveVersion(f, sliceDir) match {
      case Some(k) => s"$sliceDir/sv=$k"
      case None    => s"$sliceDir/*.parquet"
    }

  /** Read the live content of the given slices WITH the partition column
    * (inferred from the dir names). Plain and versioned slices scan as
    * TWO basePath groups at most (each group has uniform partition
    * depth), unioned — never a per-slice union, so the plan stays flat
    * at thousands of slices. Empty slice list → None.
    */
  def read(
      spark: SparkSession, root: String, partCol: String,
      names: Seq[String]): Option[DataFrame] = {
    val f = fs(spark, root)
    val (versioned, plain) =
      names.partition(n => liveVersion(f, s"$root/$n").isDefined)
    val parts =
      (if (plain.isEmpty) None
       else Some(spark.read.option("basePath", root)
         .parquet(plain.map(n => s"$root/$n/*.parquet"): _*))).toSeq ++
      (if (versioned.isEmpty) None
       else Some(spark.read.option("basePath", root)
         .parquet(versioned.map(n => liveLeaf(f, s"$root/$n")): _*)
         .drop("sv"))).toSeq
    parts.reduceOption(_ unionByName _)
  }

  /** Read every slice's live content under `root` (None if none). */
  def readAll(
      spark: SparkSession, root: String,
      partCol: String): Option[DataFrame] =
    read(spark, root, partCol, sliceNames(spark, root, partCol))

  /** Replace one slice's content with `rows` — write-new, flip pointer,
    * delete-old. `rows` must not itself read from this slice lazily
    * unless pinned by the caller (the write job would race the delete it
    * triggers — callers localCheckpoint or read-then-write).
    */
  def replaceSlice(
      spark: SparkSession, root: String, sliceName: String,
      rows: DataFrame): Unit = {
    val sliceDir = s"$root/$sliceName"
    val f = fs(spark, sliceDir)
    val prev = liveVersion(f, sliceDir)
    val next = prev.getOrElse(-1L) + 1L
    val nextDir = new Path(s"$sliceDir/sv=$next")
    if (f.exists(nextDir)) f.delete(nextDir, true) // crashed attempt
    rows.write.mode("overwrite").parquet(nextDir.toString)
    require(f.exists(new Path(nextDir, "_SUCCESS")),
      s"rewrite of $sliceDir produced no _SUCCESS — not flipping")
    FsAtomic.writePointer(f, new Path(sliceDir), "_V", next.toString)
    // superseded data goes NOW (privacy outranks in-flight readers);
    // a crash before this completes is healed by any later gcStale pass
    deleteStale(f, sliceDir, next)
  }

  /** Remove everything in `sliceDir` that is not the live `sv=` dir or
    * the pointer itself: the plain originals of a first rewrite,
    * superseded versions, and crash leftovers.
    */
  private def deleteStale(f: FileSystem, sliceDir: String, live: Long): Unit =
    f.listStatus(new Path(sliceDir)).map(_.getPath).foreach { p =>
      val n = p.getName
      if (n != s"sv=$live" && n != "_V" && !n.startsWith("._V"))
        f.delete(p, true)
    }

  /** Heal crash leftovers across ALL slices of a corpus: for each
    * versioned slice, delete every non-live `sv=` dir and any surviving
    * plain originals. Run before a rewrite pass and on resume — this is
    * what guarantees retired data cannot linger in a superseded version
    * whose delete crashed (the live content is already clean, so the
    * slice would never re-enter the "still holds retired ids" set).
    */
  def gcStale(spark: SparkSession, root: String, partCol: String): Unit = {
    val f = fs(spark, root)
    sliceNames(spark, root, partCol).foreach { n =>
      val sliceDir = s"$root/$n"
      liveVersion(f, sliceDir) match {
        case Some(live) => deleteStale(f, sliceDir, live)
        case None =>
          // still-plain slice: ANY sv= dir is a crash leftover (written
          // but never flipped live) — the plain files stay
          f.listStatus(new Path(sliceDir)).map(_.getPath)
            .filter(_.getName.startsWith("sv="))
            .foreach(p => f.delete(p, true))
      }
    }
  }
}
