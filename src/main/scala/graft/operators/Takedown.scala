package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.util.{FsAtomic, SliceRewrite, StoreProtocol}

/** Corpus-level deletion: propagate ONE delete set through the accepted
  * corpus parquet and every standing index — the right-to-be-forgotten
  * operation a 100 TB continuously-ingesting corpus must support (GONE
  * URLs, robots revocations, legal takedowns). The reference DECLARED
  * this path and never built it: `UrlDBFunction.java:76` allocates an
  * `_archivedUrls` MapState that `:467` reads but nothing ever writes.
  *
  * Durability model — journal-led, eventually-atomic: [[takedown]] first
  * pins the delete set and each store's retirement batch id under a
  * journal directory (`td=<tid>/ids` parquet + `_PLAN` pointer), then
  * executes; every step is idempotent, so a crash anywhere is healed by
  * [[resume]] re-executing the pinned plan (kill-mid-delete is
  * spec-pinned in TakedownSpec). Once the journal commits, the delete
  * set WILL reach every target — callers see either "not started" or
  * "eventually complete", never a silently half-applied delete.
  *
  * Single-writer like the stores themselves: run from the loop that owns
  * them (retirement batch ids are pinned at plan time, so a concurrent
  * appender could collide with them). Loops that allocate store batch
  * ids from their own counter have collision-free forms instead:
  * [[graft.crawl.CrawlCorpusLoop.takedownWave]] dedicates a wave slot,
  * and an always-on stream passes a per-batch retirement feed to
  * [[CorpusIngest.streamingIndexed]] (tombstones then ride the
  * micro-batch's own commits — [[CorpusIngest.ingestIndexed]]'s
  * `retireIds`).
  *
  * Scale shape: store retirements are one tombstone file each
  * (delete-set-bounded — the heavy reclamation happens at each store's
  * next compact); the corpus rewrite touches ONLY the `batch=` dirs that
  * still contain retired ids (discovered by one broadcast semi-join; the
  * rewrite set self-heals on resume because already-rewritten dirs no
  * longer contain the ids).
  */
object Takedown {

  /** Everything one delete set must reach. Roots that are None (or
    * stores that do not exist yet) are skipped. `corpusPartitionCol`
    * names the corpus's directory-partition column (`batch=` dirs for
    * the streaming ingest layout, `w=` for [[graft.crawl
    * .CrawlCorpusLoop]] wave slices).
    */
  final case class Targets(
    corpusDir: Option[String] = None,
    corpusIdCol: String = "doc_id",
    corpusPartitionCol: String = "batch",
    sigRoot: Option[String] = None,
    annRoot: Option[String] = None,
    labelsRoot: Option[String] = None)

  private def fs(spark: SparkSession, p: String) = StoreProtocol.fs(spark, p)

  private def tdDirs(spark: SparkSession, journalDir: String): Seq[Long] = {
    val f = fs(spark, journalDir)
    val p = new Path(journalDir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith("td=")).map(_.stripPrefix("td=").toLong)
      .sorted.toSeq
  }

  /** Execute a new takedown: pin the plan, run it, mark `_DONE`.
    * Returns the journal id. Any still-pending earlier takedown is
    * completed first (the journal is a queue, not a set of racers).
    */
  def takedown(
      spark: SparkSession, ids: DataFrame, idCol: String,
      targets: Targets, journalDir: String,
      /** Retirement batch id to use in EVERY store instead of the
        * default max-committed+1. A loop that allocates store batch ids
        * from its own counter (wave numbers) MUST pass its next slot
        * here — otherwise a later wave's append could collide with the
        * auto-picked retire id (the stores refuse the overwrite, but
        * the loop would wedge). See [[graft.crawl.CrawlCorpusLoop
        * .takedownWave]].
        */
      retireBatchId: Option[Long] = None): Long = {
    resume(spark, targets, journalDir) // drain anything pending first
    val f = fs(spark, journalDir)
    // reclaim _PLAN-less td dirs: a crash between the (possibly
    // multi-shard, GB-scale) ids write and the _PLAN commit leaves a
    // dead delete-set copy that resume correctly skips but nothing
    // committed — without this prelude every crashed attempt would
    // permanently consume a journal id and its bytes (single-writer
    // journal by protocol, so nothing concurrent is in that window)
    tdDirs(spark, journalDir).foreach { k =>
      val d = new Path(s"$journalDir/td=$k")
      if (!f.exists(new Path(d, "_PLAN"))) f.delete(d, true)
    }
    val tid = tdDirs(spark, journalDir).lastOption.getOrElse(-1L) + 1L
    val td = s"$journalDir/td=$tid"
    f.mkdirs(new Path(td))
    // the pinned delete set shards above TombIdsPerBucket, mirroring
    // StoreProtocol.writeTombstones: a takedown-sized set stays ONE
    // file (one task, cheap resume reads), a whole-source purge
    // (10^7-10^8 ids) spreads across hashed shards instead of
    // funneling the write through one task. Like writeTombstones, the
    // count rides the pinning job as an observed metric — no separate
    // count() job.
    val obs = new org.apache.spark.sql.Observation()
    val norm = ids.select(col(idCol).cast("long").as("id")).distinct()
      .observe(obs, count(lit(1)).as("n"))
      .localCheckpoint(true)
    val n = obs.get.getOrElse("n", null) match {
      case x: java.lang.Long => x.longValue()
      case _                 => 0L
    }
    val nShards = StoreProtocol.tombShards(n)
    (if (nShards == 1) norm.coalesce(1)
     else norm.repartition(nShards, col("id")))
      .write.mode("overwrite").parquet(s"$td/ids")
    // pin each store's retirement batch id NOW (caller-supplied, or max
    // committed + 1), so a crashed run and its resume retire under the
    // SAME id — idempotent
    def nextBatch(root: Option[String]): Option[Long] = root.flatMap { r =>
      if (StoreProtocol.readMetaKv(spark, r).isEmpty) None
      else Some(retireBatchId.getOrElse(
        StoreProtocol.committedBatches(spark, r)
          .lastOption.getOrElse(-1L) + 1L))
    }
    val plan = Seq(
      nextBatch(targets.sigRoot).map(b => s"sig $b"),
      nextBatch(targets.annRoot).map(b => s"ann $b"),
      nextBatch(targets.labelsRoot).map(b => s"labels $b")).flatten ++
      // the corpus id/partition columns are pinned WITH the dir: a
      // resume whose Targets carry different columns (e.g. the default
      // "batch" against a wave-sliced "w" corpus) would otherwise find
      // zero matching dirs, skip the rewrite, and still mark _DONE —
      // the silently-half-applied delete the journal contract forbids
      targets.corpusDir.toSeq.flatMap(d => Seq(s"corpus $d",
        s"corpus_id ${targets.corpusIdCol}",
        s"corpus_part ${targets.corpusPartitionCol}"))
    // _PLAN is the commit point: from here the delete set WILL be applied
    FsAtomic.writePointer(f, new Path(td), "_PLAN", plan.mkString("\n"))
    execute(spark, targets, td)
    tid
  }

  /** Complete every journaled takedown that has a `_PLAN` but no `_DONE`
    * (crash recovery). Returns how many were completed.
    */
  def resume(
      spark: SparkSession, targets: Targets, journalDir: String): Int = {
    val f = fs(spark, journalDir)
    val pending = tdDirs(spark, journalDir).filter { tid =>
      val td = s"$journalDir/td=$tid"
      f.exists(new Path(td, "_PLAN")) && !f.exists(new Path(td, "_DONE"))
    }
    pending.foreach(tid => execute(spark, targets, s"$journalDir/td=$tid"))
    pending.size
  }

  private def execute(
      spark: SparkSession, targets: Targets, td: String): Unit = {
    val f = fs(spark, td)
    val ids = spark.read.schema(
        StructType(Seq(StructField("id", LongType))))
      .parquet(s"$td/ids")
      .localCheckpoint(true)
    // on-disk byte size of the pinned set (FS metadata, zero jobs) —
    // drives the corpus joins' broadcast/shuffle switch exactly like
    // the stores' tombbytes marker line
    val idBytes = Option(f.globStatus(new Path(s"$td/ids", "*.parquet")))
      .getOrElse(Array.empty).map(_.getLen).sum
    val plan = StoreProtocol.readSmall(f, new Path(td, "_PLAN"))
      .getOrElse("").linesIterator.filter(_.trim.nonEmpty).map { l =>
        val Array(k, v) = l.trim.split(" ", 2); k -> v
      }.toMap
    // the plan names every target the original call promised to reach —
    // a resume with NARROWER targets must refuse, not silently skip part
    // of the committed delete and still mark _DONE
    def need(key: String, have: Option[_]): Unit =
      require(plan.get(key).isEmpty || have.isDefined,
        s"takedown $td planned a '$key' retirement but the resume's " +
          "targets omit that root — supply the original targets")
    need("sig", targets.sigRoot)
    need("ann", targets.annRoot)
    need("labels", targets.labelsRoot)
    need("corpus", targets.corpusDir)
    // store retirements — each one tombstone file + marker, idempotent
    // under its pinned batch id
    plan.get("sig").map(_.toLong).zip(targets.sigRoot).foreach {
      case (b, root) => SignatureIndexStore.retire(spark, root, ids, "id", b)
    }
    plan.get("ann").map(_.toLong).zip(targets.annRoot).foreach {
      case (b, root) => AnnIndexStore.retire(spark, root, ids, "id", b)
    }
    plan.get("labels").map(_.toLong).zip(targets.labelsRoot).foreach {
      case (b, root) => LabelStore.retire(spark, root, ids, "id", b)
    }
    // the corpus rewrite runs against the PINNED dir and columns — the
    // resume's Targets must name the same corpus (refused otherwise),
    // and its column defaults are ignored in favor of the plan's
    plan.get("corpus").foreach { pinnedDir =>
      require(targets.corpusDir.contains(pinnedDir),
        s"takedown $td planned the corpus rewrite at $pinnedDir but the " +
          s"resume's targets point at ${targets.corpusDir} — supply the " +
          "original targets")
      rewriteCorpus(spark, pinnedDir,
        plan.getOrElse("corpus_id", targets.corpusIdCol),
        plan.getOrElse("corpus_part", targets.corpusPartitionCol), ids, td,
        idBytes)
    }
    FsAtomic.writePointer(f, new Path(td), "_DONE", "done")
  }

  /** Physically drop the retired ids from the corpus's slice dirs via
    * the [[graft.util.SliceRewrite]] protocol: per affected slice, write
    * the survivors as a new `sv=` version, flip the slice's `_V` pointer
    * atomically, then delete superseded data — a concurrent corpus
    * reader resolves either the old complete version or the new one,
    * never a missing partition (the round-12 delete-then-rename swap's
    * absence window is gone). Idempotent/resumable: the affected set is
    * recomputed from the CURRENT live content (an already-rewritten
    * slice no longer contains retired ids, so it drops out on its own),
    * and the leading [[SliceRewrite.gcStale]] pass heals crash leftovers
    * INCLUDING a superseded version whose post-flip delete crashed —
    * without it, retired rows could linger on disk in a version no
    * rewrite would ever revisit.
    */
  private def rewriteCorpus(
      spark: SparkSession, corpusDir: String, idCol: String,
      partCol: String, ids: DataFrame, td: String,
      // required, not defaulted: a 0 default would silently select
      // broadcast — the every-task-OOM shape for a whole-source purge
      idBytes: Long): Unit = {
    // size-switched delete-set side: broadcast for takedown-sized sets,
    // shuffled join above TombBroadcastMaxBytes (whole-source purges
    // must not broadcast 10^8 ids to every task)
    def idsSide: DataFrame =
      if (idBytes <= StoreProtocol.TombBroadcastMaxBytes) broadcast(ids)
      else ids
    val f = fs(spark, corpusDir)
    // legacy-protocol recovery: a store that crashed under the round-12
    // delete-then-rename swap can hold a COMMITTED survivor rewrite
    // under this journal entry ($td/rewrite/<slice>) with the live
    // slice dir already deleted. Finish that swap first (rename into
    // place as plain slice content — the slice is already absent, so no
    // new reader window opens); a staged dir whose target still lives
    // is discarded and redone by the versioned protocol below.
    // Without this prelude the slice's survivors exist nowhere the new
    // protocol looks, and resume would mark _DONE having silently lost
    // them.
    val rr = new Path(s"$td/rewrite")
    if (f.exists(rr)) f.listStatus(rr).map(_.getPath).foreach { p =>
      val target = new Path(s"$corpusDir/${p.getName}")
      if (f.exists(new Path(p, "_SUCCESS")) && !f.exists(target)) {
        // a silent rename failure here would strand the slice's only
        // surviving copy under the journal and still mark _DONE — the
        // exact loss this prelude exists to prevent. Throw instead
        // (resume retries); mkdirs covers a corpusDir whose last slice
        // was the deleted one.
        f.mkdirs(target.getParent)
        if (!f.rename(p, target))
          throw new java.io.IOException(
            s"legacy rewrite recovery failed: $p -> $target")
      } else f.delete(p, true)
    }
    if (!f.exists(new Path(corpusDir))) return
    SliceRewrite.gcStale(spark, corpusDir, partCol)
    val names = SliceRewrite.sliceNames(spark, corpusDir, partCol)
    // affected slices = those still holding retired ids
    // (one broadcast semi-join; collect is bounded by the delete set)
    val affected = SliceRewrite.read(spark, corpusDir, partCol, names)
      .map { corpus =>
        corpus.join(idsSide, corpus(idCol) === ids("id"), "left_semi")
          .select(col(partCol).cast("long")).distinct()
          .collect().map(_.getLong(0)).toSeq
      }.getOrElse(Seq.empty)
    affected.foreach { b =>
      val name = s"$partCol=$b"
      val survivors = spark.read
        .parquet(SliceRewrite.liveReadPath(f, s"$corpusDir/$name"))
        .join(idsSide, col(idCol) === ids("id"), "left_anti")
      SliceRewrite.replaceSlice(spark, corpusDir, name, survivors)
    }
  }
}
