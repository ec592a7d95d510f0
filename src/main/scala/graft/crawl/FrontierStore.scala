package graft.crawl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.UrlStateMerger

/** Durable frontier storage: the crawl DB as a pld-bucketed parquet table
  * with **partition-level merge-on-read** (SURVEY §2.12/§7.4: at cluster
  * scale the frontier lives as a table, not operator state — "billions of
  * URLs" becomes a storage problem, not a state-backend problem).
  *
  * Layout: `<root>/b<bucket>/v<N>/part-*.parquet` plus a manifest
  * `_MANIFEST_v<N>` mapping each bucket to the version that owns its
  * current data, and a `_LATEST` pointer naming the active manifest. A
  * merge rewrites ONLY the buckets its updates touch; untouched buckets
  * keep their old files and are referenced by the new manifest — so a
  * steady-state round whose updates hit k of B buckets costs k/B of a
  * full rewrite (the Iceberg/Delta-style property a 100 TB frontier
  * needs; full-copy versioning rewrites 100% of the table for a 1%
  * update). Readers never see a half-written state: bucket data lands
  * before the manifest, the manifest before the pointer flip, and the
  * previous version of every rewritten bucket is retained one generation
  * for in-flight readers.
  *
  * Bucketing by pld hash keeps the merge shuffle stable round-over-round
  * and lets per-domain lookups prune to one bucket directory.
  */
object FrontierStore {

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def bucketOf(buckets: Int) =
    pmod(xxhash64(col("pld")), lit(buckets)).cast("int")

  def latestVersion(spark: SparkSession, root: String): Option[Int] = {
    val f = fs(spark, root)
    val ptr = new Path(root, "_LATEST")
    if (!f.exists(ptr)) None
    else {
      val in = f.open(ptr)
      try Some(new String(in.readAllBytes()).trim.toInt)
      finally in.close()
    }
  }

  /** (bucket count, bucket -> owning version) for manifest version `v`.
    * The bucket count is a persistent property of the store: merging with
    * a different count would hash a URL's update into a bucket its
    * existing row never lived in, silently duplicating state.
    */
  private def readManifest(
      spark: SparkSession, root: String, v: Int): (Int, Map[Int, Int]) = {
    val f = fs(spark, root)
    val mpath = new Path(root, s"_MANIFEST_v$v")
    if (!f.exists(mpath))
      throw new IllegalStateException(
        s"$root has _LATEST=$v but no _MANIFEST_v$v — " +
          "pre-manifest (full-copy v<N>) layout is not readable by the " +
          "merge-on-read store; rebuild it with mergeInto on a fresh root")
    val in = f.open(mpath)
    val text = try new String(in.readAllBytes()) finally in.close()
    val lines = text.linesIterator.filter(_.nonEmpty).toSeq
    val buckets = lines.head.stripPrefix("buckets ").toInt
    val entries = lines.tail.map { line =>
      val Array(b, ver) = line.trim.split(" ")
      b.toInt -> ver.toInt
    }.toMap
    (buckets, entries)
  }

  private def writeManifest(
      spark: SparkSession, root: String, v: Int, buckets: Int,
      manifest: Map[Int, Int]): Unit = {
    val f = fs(spark, root)
    val out = f.create(new Path(root, s"_MANIFEST_v$v"), true)
    try out.write(
      (s"buckets $buckets" +:
        manifest.toSeq.sorted.map { case (b, ver) => s"$b $ver" })
        .mkString("\n").getBytes)
    finally out.close()
  }

  private def bucketPath(root: String, bucket: Int, v: Int): String =
    s"$root/b$bucket/v$v"

  def read(spark: SparkSession, root: String): Option[DataFrame] =
    latestVersion(spark, root).flatMap { v =>
      val (_, manifest) = readManifest(spark, root, v)
      if (manifest.isEmpty) None
      else {
        val paths = manifest.toSeq.sorted
          .map { case (b, ver) => bucketPath(root, b, ver) }
        Some(spark.read.parquet(paths: _*))
      }
    }

  /** The journal columns every bucket version records a `_SKIP` sidecar
    * for at commit time: the two time axes the engine's scans band on
    * (retention age rules filter statusTime; schedules filter
    * nextFetchTime).
    */
  private val StatsCols = Seq("statusTime", "nextFetchTime")

  /** [[read]] restricted to the conjunction of `ranges` (inclusive, long
    * form), opening only the bucket FILES whose `_SKIP` ranges intersect
    * — the time-banded scan path ([[graft.crawl.RetentionPolicy]]'s age
    * rules). Buckets written before the sidecar hook read unpruned
    * (lenient adoption); rows returned equal [[read]] + the same filters
    * exactly. Returns the prune accounting alongside for benches/specs.
    */
  def readBanded(
      spark: SparkSession, root: String,
      ranges: Seq[graft.operators.DataSkipping.ColRange])
      : Option[(DataFrame, graft.operators.DataSkipping.PruneInfo)] =
    latestVersion(spark, root).flatMap { v =>
      val (_, manifest) = readManifest(spark, root, v)
      if (manifest.isEmpty) None
      else {
        val paths = manifest.toSeq.sorted
          .map { case (b, ver) => bucketPath(root, b, ver) }
        Some(graft.operators.DataSkipping.prunedReadDirs(spark, paths, ranges))
      }
    }

  /** Merge `updates` (CrawlStateUrl rows) into the stored frontier and
    * commit a new version, rewriting only the buckets the updates touch.
    * Returns the merged frontier.
    */
  def mergeInto(
      spark: SparkSession, root: String, updates: DataFrame,
      buckets: Int = 64): DataFrame = {
    val f = fs(spark, root)
    val prev = latestVersion(spark, root)
    val (storeBuckets, prevManifest) = prev
      .map(readManifest(spark, root, _))
      .getOrElse((buckets, Map.empty[Int, Int]))
    require(storeBuckets == buckets,
      s"store at $root was built with $storeBuckets buckets; " +
        s"merging with $buckets would split per-URL state across buckets")
    val next = prev.getOrElse(-1) + 1

    // pin the updates once: the bucket scan and the staging write must
    // see the SAME rows (a nondeterministic update pipeline could
    // otherwise emit rows into buckets the scan never saw, which the
    // staging cleanup would silently delete)
    val tagged = updates.withColumn("bucket", bucketOf(buckets))
      .localCheckpoint(true)
    val affected = tagged.select("bucket").distinct()
      .collect().map(_.getInt(0)).sorted
    if (affected.isEmpty)
      // nothing to merge: leave the store untouched (committing an empty
      // manifest on a fresh root would poison every subsequent read)
      return read(spark, root).getOrElse(updates)
    val currentAffected = affected
      .flatMap(b => prevManifest.get(b).map(v => bucketPath(root, b, v)))
    val base =
      if (currentAffected.isEmpty) tagged.drop("bucket")
      else spark.read.parquet(currentAffected.toSeq: _*)
        .unionByName(tagged.drop("bucket"))

    // one job: write all rewritten buckets to a staging dir, then move
    // each bucket dir into place (cheap FS renames, no data copy).
    // REMOVED winners ([[retire]] tombstones) are filtered HERE — the
    // physical deletion point: the rewritten bucket simply no longer
    // carries the url
    val staging = s"$root/_staging_v$next"
    UrlStateMerger.mergeFrontier(base)
      .filter(col("status") =!= graft.schema.FetchStatus.REMOVED)
      .withColumn("bucket", bucketOf(buckets))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(staging)
    // a bucket whose every row was REMOVED writes no staging dir: it
    // leaves the manifest entirely (readers skip unmapped buckets)
    val (present, emptied) = affected.partition(b =>
      f.exists(new Path(s"$staging/bucket=$b")))
    present.foreach { b =>
      val src = new Path(s"$staging/bucket=$b")
      val dst = new Path(bucketPath(root, b, next))
      f.mkdirs(dst.getParent)
      // a crashed earlier attempt at this same (unreferenced) version may
      // have left an orphan dst — clear it so rename cannot nest or fail
      if (f.exists(dst)) f.delete(dst, true)
      if (!f.rename(src, dst))
        throw new java.io.IOException(
          s"failed to commit bucket $b to $dst — aborting before the " +
            "manifest so the previous version stays intact")
    }
    // file-skipping sidecars for the NEW bucket versions (metadata-only,
    // footer-derived): time-banded scans — the retention candidate
    // rules' statusTime age bands, due-before-now schedules — open only
    // the bucket files whose range intersects ([[readBanded]]).
    // Freshness holds by construction: bucket versions are new-named
    // dirs, so a sidecar can never describe rewritten files; buckets
    // from before this hook simply have no sidecar and read unpruned.
    // One pooled pass ACROSS buckets (each bucket holds few files, so
    // the per-dir pool would idle; sequential dirs would serialize the
    // round trips — the cost that matters on object storage). Best-
    // effort: a failed stats write must NOT abort a data commit whose
    // renames already landed — an absent sidecar is merely unpruned
    // (the lenient-read contract), never wrong
    graft.util.Pooled.ordered(
        present.toSeq, threads = 16, name = "bucketstats") { b =>
      try graft.operators.DataSkipping.writeStats(
        spark, bucketPath(root, b, next), StatsCols, threads = 1)
      catch { case scala.util.control.NonFatal(e) =>
        org.slf4j.LoggerFactory.getLogger("graft.crawl.FrontierStore")
          .warn(s"skip-stats sidecar for bucket $b v$next failed (reads " +
            s"unpruned until the next rewrite): $e")
      }
    }
    f.delete(new Path(staging), true)

    val manifest =
      (prevManifest ++ present.map(_ -> next).toMap) -- emptied
    writeManifest(spark, root, next, buckets, manifest)
    graft.util.FsAtomic.writePointer(
      f, new Path(root), "_LATEST", next.toString)

    // retire: for each rewritten bucket keep only the new version and its
    // immediate predecessor (for readers that resolved the pointer just
    // before the flip); emptied buckets keep only the predecessor; drop
    // manifests older than the previous one
    affected.foreach { b =>
      val keep: Set[Int] =
        ((if (present.contains(b)) Seq(next) else Seq.empty) ++
          prevManifest.get(b).toSeq).toSet
      val dir = new Path(s"$root/b$b")
      if (f.exists(dir)) f.listStatus(dir).foreach { st =>
        val ver = st.getPath.getName.stripPrefix("v").toIntOption
        if (ver.exists(v => !keep.contains(v))) f.delete(st.getPath, true)
      }
    }
    (0 until next - 1).foreach { old =>
      f.delete(new Path(root, s"_MANIFEST_v$old"), false)
    }
    read(spark, root).getOrElse(updates.limit(0))
  }

  /** Purge `urls` from the journal — the frontier's right-to-be-forgotten
    * path, completing [[graft.operators.Takedown]]'s reach (corpus +
    * indexes + now the crawl state itself): merge-in
    * [[graft.schema.FetchStatus.REMOVED]] tombstone rows that win the
    * terminal merge unconditionally and are filtered out of the
    * rewritten buckets — the url's row is physically gone, and only the
    * buckets its plds hash into are rewritten (delete-set-bounded). A
    * later crawl re-admits the url as a fresh row (the tombstone is
    * never stored). Idempotent: re-purging a purged url merges a
    * tombstone against nothing.
    */
  def retire(
      spark: SparkSession, root: String, urls: DataFrame,
      urlCol: String = "url"): Unit =
    latestVersion(spark, root).foreach { v =>
      val (buckets, _) = readManifest(spark, root, v)
      val pldUdf = udf(graft.functions.UrlFunctions.extractPld _)
      // tombstone rows must carry the STORE's exact column types (score
      // may be float or decimal depending on the frontier's producer) —
      // a type-widening union would rewrite touched buckets under a new
      // schema and break reads that span touched + untouched buckets
      val storedSchema = read(spark, root) match {
        case Some(df) => df.schema
        case None     => return
      }
      val updates = urls.select(col(urlCol).as("url")).distinct()
        .select(col("url"), pldUdf(col("url")).as("pld"),
          lit(graft.schema.FetchStatus.REMOVED).as("status"),
          lit(Long.MaxValue).as("statusTime"),
          lit(0.0f).as("score"),
          lit(Long.MaxValue).as("nextFetchTime"))
        .select(storedSchema.map(fd =>
          col(fd.name).cast(fd.dataType).as(fd.name)): _*)
        .localCheckpoint(true)
      mergeInto(spark, root, updates, buckets)
      // privacy outranks the one-generation reader-retention window for
      // a PURGE: the touched buckets' superseded versions (which still
      // carry the url's bytes) are reclaimed immediately, not at the
      // next merge — the store is single-writer, and a purge is the one
      // operation whose old bytes must not linger
      val f = fs(spark, root)
      val vNow = latestVersion(spark, root).get
      val (_, manifest) = readManifest(spark, root, vNow)
      val touched = updates.select(bucketOf(buckets).as("b"))
        .distinct().collect().map(_.getInt(0))
      touched.foreach { b =>
        val keep = manifest.get(b).toSet
        val dir = new Path(s"$root/b$b")
        if (f.exists(dir)) f.listStatus(dir).foreach { st =>
          val ver = st.getPath.getName.stripPrefix("v").toIntOption
          if (ver.exists(x => !keep.contains(x))) f.delete(st.getPath, true)
        }
      }
    }

  /** Bucket-pruned per-domain lookup: reads exactly one bucket dir. The
    * bucket count comes from the store's manifest, not the caller.
    */
  def domainSlice(
      spark: SparkSession, root: String, pld: String): Option[DataFrame] =
    latestVersion(spark, root).flatMap { v =>
      val (buckets, manifest) = readManifest(spark, root, v)
      // same bucket function the writer uses, evaluated by Spark itself
      val b = spark.range(1)
        .select(pmod(xxhash64(lit(pld)), lit(buckets)).cast("int"))
        .head().getInt(0)
      manifest.get(b).map { ver =>
        spark.read.parquet(bucketPath(root, b, ver))
          .filter(col("pld") === pld)
      }
    }
}
