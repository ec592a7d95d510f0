package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The append-only standing-store commit protocol, shared by
  * [[graft.operators.SignatureIndexStore]], [[graft.operators.AnnIndexStore]]
  * and [[graft.operators.LabelStore]] (and, in pointer form, by
  * [[graft.crawl.FrontierStore]]):
  *
  *   - `_META`               — key-value store parameters, pinned at creation
  *   - `<table>/batch=<b>/…` — immutable per-batch data dirs
  *   - `_commit_<b>`         — atomic marker: batch `b`'s files are complete;
  *                             content records each table's written
  *                             partition set so readers assemble EXPLICIT
  *                             paths with zero directory listing
  *   - `<table>/c<gen>/…`    — compaction snapshots
  *   - `_COMPACT`            — atomic pointer `"<gen> <coveredUpTo>"`:
  *                             batches ≤ coveredUpTo live merged in
  *                             generation `gen`
  *
  * Every mutation is write-new-files-then-flip-one-pointer
  * ([[FsAtomic.writePointer]]), so readers always see a complete store
  * state; `visible` is the read fence that makes retried loop batches
  * exclude their own crashed appends. Extracted once so a protocol fix
  * lands in every store — the three stores had carried near-verbatim
  * copies of this file's functions before round 11.
  */
object StoreProtocol {

  def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Whole small-file read (pointers, markers, meta). None if absent. */
  def readSmall(f: FileSystem, p: Path): Option[String] =
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8")) finally in.close()
    }

  /** `_META` as "key value" lines → map. None when the store does not
    * exist yet.
    */
  def readMetaKv(spark: SparkSession, root: String): Option[Map[String, String]] =
    readSmall(fs(spark, root), new Path(root, "_META")).map {
      _.linesIterator.filter(_.trim.nonEmpty).map { l =>
        val Array(k, v) = l.trim.split(" ", 2); k -> v
      }.toMap
    }

  /** Create the root (if needed) and atomically write `_META`. */
  def writeMetaKv(
      spark: SparkSession, root: String, kv: Seq[(String, String)]): Unit = {
    val f = fs(spark, root)
    f.mkdirs(new Path(root))
    FsAtomic.writePointer(f, new Path(root), "_META",
      kv.map { case (k, v) => s"$k $v" }.mkString("\n"))
  }

  /** Batch ids whose append/fold fully committed, ascending. */
  def committedBatches(spark: SparkSession, root: String): Seq[Long] = {
    val f = fs(spark, root)
    val p = new Path(root)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith("_commit_"))
      .map(_.stripPrefix("_commit_").toLong).sorted.toSeq
  }

  /** Latest compaction state: (generation, coveredUpTo). */
  def compactState(spark: SparkSession, root: String): Option[(Long, Long)] =
    readSmall(fs(spark, root), new Path(root, "_COMPACT")).map { text =>
      val Array(gen, upTo) = text.trim.split(" ")
      (gen.toLong, upTo.toLong)
    }

  /** Atomically flip the `_COMPACT` pointer — the compaction commit point. */
  def writeCompactPointer(
      spark: SparkSession, root: String, gen: Long, upTo: Long): Unit =
    FsAtomic.writePointer(fs(spark, root), new Path(root), "_COMPACT",
      s"$gen $upTo")

  /** Atomically write a batch's commit marker with the given content
    * (readers parse marker CONTENT, so a crashed writer must never leave
    * a half-written marker — temp + overwrite-rename, not create).
    */
  def writeCommitMarker(
      spark: SparkSession, root: String, batchId: Long,
      content: String): Unit =
    FsAtomic.writePointer(fs(spark, root), new Path(root),
      s"_commit_$batchId", content)

  /** List one table+batch dir's written `bucket=` partition ids. */
  def bucketsOnDisk(f: FileSystem, dir: String): Seq[Int] = {
    val p = new Path(dir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith("bucket="))
      .map(_.stripPrefix("bucket=").toInt).sorted.toSeq
  }

  /** Record each table's written bucket set in the batch's commit marker
    * (one "<table> <csv>" line per table): readers then build explicit
    * paths without listing batches × buckets directories.
    */
  def writeBucketMarker(
      spark: SparkSession, root: String, batchId: Long,
      tables: Seq[String]): Unit = {
    val f = fs(spark, root)
    val content = tables.map { t =>
      s"$t ${bucketsOnDisk(f, s"$root/$t/batch=$batchId").mkString(",")}"
    }.mkString("\n")
    writeCommitMarker(spark, root, batchId, content)
  }

  /** The bucket ids a committed batch wrote for `table`, parsed from its
    * commit marker. None when the marker predates the bucket-set field
    * (or the store was hand-built) — callers fall back to one listing of
    * the batch dir.
    */
  def markerBuckets(
      spark: SparkSession, root: String, table: String,
      batchId: Long): Option[Seq[Int]] =
    readSmall(fs(spark, root), new Path(root, s"_commit_$batchId"))
      .flatMap(_.linesIterator.find(_.startsWith(s"$table ")))
      .map(_.stripPrefix(s"$table ").trim)
      .map(csv => if (csv.isEmpty) Seq.empty[Int]
                  else csv.split(",").map(_.toInt).toSeq)

  /** Post-commit compaction cleanup: physically remove everything the
    * CURRENT `_COMPACT` pointer supersedes — every committed batch dir +
    * marker at or below `coveredUpTo` (not merely the batches folded in
    * this pass: a writer that crashed after a previous pointer flip but
    * before its cleanup left covered dirs that no later pass would
    * otherwise revisit, because fold candidates filter `> prevUpTo`) and
    * every `c<gen>` snapshot other than the live generation. Idempotent
    * and safe at any point after the flip — readers assemble paths from
    * the pointer + markers `> coveredUpTo`, never from the deleted ones.
    */
  def cleanupCompacted(
      spark: SparkSession, root: String, tables: Seq[String]): Unit = {
    val f = fs(spark, root)
    compactState(spark, root).foreach { case (gen, upTo) =>
      committedBatches(spark, root).filter(_ <= upTo).foreach { b =>
        tables.foreach(t => f.delete(new Path(s"$root/$t/batch=$b"), true))
        f.delete(new Path(root, s"_commit_$b"), false)
      }
      tables.foreach { t =>
        val tp = new Path(s"$root/$t")
        if (f.exists(tp)) f.listStatus(tp).map(_.getPath).foreach { p =>
          val n = p.getName
          if (n.length > 1 && n.head == 'c' && n.tail.forall(_.isDigit) &&
              n.tail.toLong != gen)
            f.delete(p, true)
        }
      }
    }
  }

  /** The data sources visible to a reader fenced at `belowBatch`: the
    * compact snapshot (if any) plus the uncompacted committed batches in
    * `(coveredUpTo, belowBatch)`. A fence at or below the compaction
    * horizon cannot be served (its batches no longer exist separately) —
    * compact()'s keep-newest policy makes that unreachable from a loop
    * (retry fences only ever point at the newest batch), so this throws
    * rather than silently over-matching. `what` names the store in the
    * error.
    */
  def visible(
      spark: SparkSession, root: String, belowBatch: Long,
      what: String): (Option[Long], Seq[Long]) = {
    val (gen, upTo) = compactState(spark, root).getOrElse((-1L, -1L))
    if (upTo >= belowBatch && upTo >= 0)
      throw new IllegalStateException(
        s"$what at $root is compacted through batch $upTo; a reader " +
          s"fenced at belowBatch=$belowBatch cannot exclude compacted " +
          "batches")
    val batches = committedBatches(spark, root)
      .filter(b => b > upTo && b < belowBatch)
    (if (gen >= 0) Some(gen) else None, batches)
  }
}
