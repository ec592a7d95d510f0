package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.util.StoreProtocol

/** Durable standing CLUSTER LABELS — the pairs→clusters step
  * ([[Components]]) kept continuously up to date by an ingest loop, the
  * way [[SignatureIndexStore]] keeps signatures and [[AnnIndexStore]]
  * keeps vectors. Each micro-batch's near-dup pairs are folded in with
  * [[Components.incrementalComponents]] semantics: work and WRITES are
  * bounded by the affected subgraph (the clusters the batch actually
  * touches), never by the corpus.
  *
  * Layout (the [[SignatureIndexStore]] protocol: append-only `batch=`
  * dirs, atomic `_commit_<b>` markers carrying written bucket sets,
  * `_COMPACT` generation pointer):
  *
  *  - `byid/batch=<b>/bucket=pmod(xxhash64(id),B)` — rows
  *    (id, component, batch); point lookups ("what is doc X's cluster?")
  *    prune to the probe ids' buckets.
  *  - `bycomp/batch=<b>/bucket=pmod(xxhash64(component),B)` — the same
  *    rows keyed by component; membership reads ("who is in cluster C?")
  *    prune to the probe components' buckets.
  *
  * Two invariants make merge-on-read trivial with NO batch ordering:
  *
  *  1. **Labels only decrease — among LIVE rows.** A fold relabels
  *     entire touched components (every old member re-enters the
  *     subgraph via its star edge), so a node's new component is a
  *     superset of its old one and min-id labels are monotone
  *     non-increasing. The current label of an id is therefore
  *     `min(component)` over its live rows. [[retire]] is the one
  *     carve-out: a cluster that loses its minimum id gets a LARGER
  *     label (the surviving minimum) — retire restores the invariant by
  *     TOMBSTONING every stale row of the touched components and
  *     rewriting the survivors under the new label in the same batch, so
  *     min-resolution never sees the old labels.
  *  2. **Live labels have complete membership.** A component labeled C
  *     can only lose members if C itself is touched — in which case ALL
  *     its members are rewritten (and C's own row moves iff the merged
  *     min is smaller). So if C is some id's CURRENT label, every live
  *     `bycomp` row with component = C is a current member mention, and
  *     membership = distinct ids of those rows. Rows under dead labels
  *     are garbage that [[compact]] drops.
  *
  * The reference's crawl DB keeps exactly this kind of always-current
  * keyed state across an infinite stream (`…/flinkcrawler/functions/
  * UrlDBFunction.java:71-77` MapState by URL hash); this store is the
  * Spark-native, corpus-scale analogue for dedup cluster state.
  */
object LabelStore {

  case class Meta(buckets: Int)

  private val rowSchema = StructType(Seq(
    StructField("id", LongType), StructField("component", LongType),
    StructField("batch", LongType), StructField("bucket", IntegerType)))

  // the commit/fence/compaction protocol is the shared one — see
  // graft.util.StoreProtocol for the layout and atomicity contract
  private def fs(spark: SparkSession, root: String) =
    StoreProtocol.fs(spark, root)

  def readMeta(spark: SparkSession, root: String): Option[Meta] =
    StoreProtocol.readMetaKv(spark, root)
      .map(kv => Meta(kv("buckets").toInt))

  private def writeMeta(spark: SparkSession, root: String, meta: Meta): Unit =
    StoreProtocol.writeMetaKv(spark, root,
      Seq("buckets" -> meta.buckets.toString))

  /** Batch ids whose fold fully committed, ascending. */
  def committedBatches(spark: SparkSession, root: String): Seq[Long] =
    StoreProtocol.committedBatches(spark, root)

  /** Latest compaction state: (generation, coveredUpTo). */
  def compactState(spark: SparkSession, root: String): Option[(Long, Long)] =
    StoreProtocol.compactState(spark, root)

  private def bucketsFromMarker(
      spark: SparkSession, root: String, table: String,
      batchId: Long): Seq[Int] =
    StoreProtocol.markerBuckets(spark, root, table, batchId)
      .getOrElse(StoreProtocol.bucketsOnDisk(fs(spark, root),
        s"$root/$table/batch=$batchId"))

  private def visible(
      spark: SparkSession, root: String,
      belowBatch: Long): (Option[Long], Seq[Long]) =
    StoreProtocol.visible(spark, root, belowBatch, "label store")

  /** Union one table's compact snapshot + live batch dirs as EXPLICIT
    * bucket paths (marker-recorded sets; zero listing growth with loop
    * age), optionally pruned to `bucketFilter`.
    */
  private def readTable(
      spark: SparkSession, root: String, table: String,
      gen: Option[Long], batches: Seq[Long],
      bucketFilter: Option[Set[Int]]): DataFrame = {
    val f = fs(spark, root)
    def want(present: Seq[Int]): Seq[Int] =
      bucketFilter.fold(present)(keep => present.filter(keep))
    val batchPaths = batches.flatMap { b =>
      want(bucketsFromMarker(spark, root, table, b))
        .map(i => s"$root/$table/batch=$b/bucket=$i")
    }
    val snapPaths = gen.toSeq.flatMap { g =>
      val dir = new Path(s"$root/$table/c$g")
      if (!f.exists(dir)) Seq.empty
      else want(f.listStatus(dir).map(_.getPath.getName)
          .filter(_.startsWith("bucket="))
          .map(_.stripPrefix("bucket=").toInt).toSeq)
        .map(i => s"$root/$table/c$g/bucket=$i")
    }
    val paths = batchPaths ++ snapPaths
    if (paths.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(rowSchema.dropRight(1)))
    else
      spark.read.schema(StructType(rowSchema.dropRight(1)))
        .parquet(paths: _*)
  }

  /** The full current label set (id, component) — the audit /
    * materialization read (index-sized by design; batch-bounded reads
    * are [[lookup]]/[[members]]). Labels resolve with one min-aggregate
    * thanks to monotonicity — no per-id recency ordering.
    */
  def labels(
      spark: SparkSession, root: String,
      belowBatch: Long = Long.MaxValue): DataFrame = {
    val (gen, batches) = visible(spark, root, belowBatch)
    val tombs = StoreProtocol.readTombstones(spark, root, batches)
    StoreProtocol.applyTombstones(
        readTable(spark, root, "byid", gen, batches, None), "id", tombs)
      .groupBy("id").agg(min("component").as("component"))
  }

  /** Current labels of the probe ids. Bucket-pruned: only the buckets
    * the probe ids hash into are opened (bucket ids are a bounded,
    * ≤ `meta.buckets` driver-side set — the [[SignatureIndexStore]]
    * discipline).
    */
  def lookup(
      spark: SparkSession, root: String, ids: DataFrame, idCol: String,
      belowBatch: Long = Long.MaxValue): DataFrame = readMeta(spark, root) match {
    case None => emptyLabels(spark)
    case Some(meta) =>
      // the probe-bucket prune set rides the checkpoint's materializing
      // job as an observed collect_set (the SignatureIndexStore.matches
      // discipline) — no separate distinct+collect job per lookup
      val obs = new org.apache.spark.sql.Observation()
      val probe = ids.select(col(idCol).cast("long").as("id")).distinct()
        .observe(obs, sort_array(collect_set(
          pmod(xxhash64(col("id")), lit(meta.buckets)).cast("int")))
          .as("buckets"))
        .localCheckpoint(true)
      val probeBuckets = intSetMetric(obs.get.getOrElse("buckets", null))
      val (gen, batches) = visible(spark, root, belowBatch)
      val tombs = StoreProtocol.readTombstones(spark, root, batches)
      StoreProtocol.applyTombstones(
          readTable(spark, root, "byid", gen, batches, Some(probeBuckets)),
          "id", tombs)
        .join(probe, Seq("id"), "left_semi")
        .groupBy("id").agg(min("component").as("component"))
  }

  /** An observed `collect_set` metric as a Set[Int] (empty frame → empty
    * array, not null).
    */
  private def intSetMetric(v: Any): Set[Int] = v match {
    case s: Seq[_] => s.map(_.asInstanceOf[Number].intValue).toSet
    case null      => Set.empty
    case other => throw new IllegalStateException(
      s"unexpected observed metric $other")
  }

  /** Current members of the probe LIVE component labels (invariant 2:
    * membership under a live label is exactly its rows). Bucket-pruned
    * on the component hash.
    */
  def members(
      spark: SparkSession, root: String, comps: DataFrame, compCol: String,
      belowBatch: Long = Long.MaxValue): DataFrame = readMeta(spark, root) match {
    case None => emptyLabels(spark)
    case Some(meta) =>
      // bucket prune set rides the checkpoint job (see lookup)
      val obs = new org.apache.spark.sql.Observation()
      val probe = comps.select(col(compCol).cast("long").as("component"))
        .distinct()
        .observe(obs, sort_array(collect_set(
          pmod(xxhash64(col("component")), lit(meta.buckets)).cast("int")))
          .as("buckets"))
        .localCheckpoint(true)
      val probeBuckets = intSetMetric(obs.get.getOrElse("buckets", null))
      val (gen, batches) = visible(spark, root, belowBatch)
      val tombs = StoreProtocol.readTombstones(spark, root, batches)
      StoreProtocol.applyTombstones(
          readTable(spark, root, "bycomp", gen, batches, Some(probeBuckets)),
          "id", tombs)
        .join(probe, Seq("component"), "left_semi")
        .select("id", "component").distinct()
  }

  private def emptyLabels(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("id", LongType),
        StructField("component", LongType))))

  /** Fold one batch of new near-dup pairs into the store
    * ([[Components.incrementalComponents]] against the durable state):
    * look up the endpoints' current labels (bucket-pruned), pull the
    * touched components' membership (bucket-pruned), relabel only that
    * subgraph, and append the relabeled rows as `batch=<batchId>` under
    * both keys. Re-running the same batchId overwrites the same dirs and
    * re-writes the same marker — idempotent, because every read is
    * fenced at `belowBatch = batchId`.
    */
  def fold(
      spark: SparkSession, root: String, newPairs: DataFrame,
      aCol: String, bCol: String, batchId: Long, meta: Meta): Unit =
    applyBatch(spark, root, newPairs, aCol, bCol, None, batchId, meta)

  /** One batch of new pairs AND retirements, committed ATOMICALLY under
    * one batch id — the streaming-loop form, where the loop owns the
    * batch-id sequence and a separate retirement batch would collide
    * with the next micro-batch's fold ([[fold]] and [[retire]] are the
    * single-purpose wrappers). Semantics: retirement wins — a new pair
    * touching a retired id is dropped; survivors of every touched
    * component stay connected (star edges to the component's surviving
    * minimum) and the new pairs merge on top; every touched component's
    * old rows are tombstoned when retirements are present (labels can go
    * UP then — invariant 1's carve-out), and never otherwise (pure folds
    * stay tombstone-free: labels only decrease). Same fence/idempotence
    * as [[fold]].
    */
  def applyBatch(
      spark: SparkSession, root: String, newPairs: DataFrame,
      aCol: String, bCol: String, retireIds: Option[DataFrame],
      batchId: Long, meta: Meta, retireIdCol: String = "id"): Unit = {
    readMeta(spark, root) match {
      case Some(existing) =>
        require(existing == meta,
          s"label store at $root was created with $existing; folding " +
            s"with $meta would split keys across incompatible buckets")
      case None => writeMeta(spark, root, meta)
    }
    compactState(spark, root).foreach { case (_, upTo) =>
      require(batchId > upTo,
        s"label store at $root is compacted through batch $upTo; " +
          s"folding batch $batchId would be invisible to every reader")
    }
    // the retire-set count rides the pinning job as an observed metric
    // (no separate count() job per batch)
    val retObs = new org.apache.spark.sql.Observation()
    val retired = retireIds.map(_.select(
        col(retireIdCol).cast("long").as("id")).distinct()
      .observe(retObs, count(lit(1)).as("n"))
      .localCheckpoint(true))
    val nRetired =
      if (retired.isEmpty) 0L
      else retObs.get.getOrElse("n", null) match {
        case x: java.lang.Long => x.longValue()
        case _                 => 0L
      }
    // a pure fold must never overwrite a retirement batch's marker; a
    // retiring batch's own RETRY legitimately rewrites it
    if (nRetired == 0L) StoreProtocol.requireDataBatchId(spark, root, batchId)
    // the pair count rides the pinning job as an observed metric: a
    // trickle loop's common case is ZERO cross pairs per batch, and that
    // case must commit with one marker write, not a CC round + two
    // empty parquet jobs
    val obs = new org.apache.spark.sql.Observation()
    val rawPairs = newPairs
      .select(col(aCol).cast("long").as("pa"), col(bCol).cast("long").as("pb"))
      .filter(col("pa").isNotNull && col("pb").isNotNull)
      .observe(obs, count(lit(1)).as("n"))
      .localCheckpoint(true)
    val nPairs = obs.get.getOrElse("n", null) match {
      case x: java.lang.Long => x.longValue()
      case _                 => 0L
    }
    if (nPairs == 0L && nRetired == 0L) {
      StoreProtocol.writeCommitMarker(spark, root, batchId,
        "byid \nbycomp ")
      return
    }
    // retirement wins: drop pairs touching a retired id
    val pairs = retired.fold(rawPairs)(r => rawPairs
      .join(r, rawPairs("pa") === r("id"), "left_anti")
      .join(r, rawPairs("pb") === r("id"), "left_anti"))
    val endpoints = pairs.select(col("pa").as("id"))
      .union(pairs.select(col("pb").as("id")))
      .union(retired.map(_.select(col("id")))
        .getOrElse(spark.emptyDataFrame.select(lit(0L).as("id")).limit(0)))
      .distinct()
    val epLabels = lookup(spark, root, endpoints, "id", belowBatch = batchId)
    val touched = epLabels.select(col("component")).distinct()
    val affected = members(spark, root, touched, "component",
      belowBatch = batchId).localCheckpoint(true)
    val survivors = retired.fold(affected)(r =>
      affected.join(r, Seq("id"), "left_anti"))
    // survivors of a touched component stay connected via its surviving
    // minimum (the component label itself may be retired — never use it
    // as a star anchor when retirements are present)
    val starEdges = retired match {
      case None => survivors
        .select(col("id").as("pa"), col("component").as("pb"))
      case Some(_) => survivors
        .join(survivors.groupBy("component")
          .agg(min("id").as("__anchor")), Seq("component"))
        .select(col("id").as("pa"), col("__anchor").as("pb"))
    }
    // pure retirement (no new pairs): nothing merges, so each touched
    // component's survivors relabel DIRECTLY to its surviving minimum —
    // the star anchor. Label propagation over the star edges would
    // converge to exactly this in one round (min of {id, anchor} with
    // anchor = component min), so the CC invocation (edge checkpoint +
    // round jobs) is skipped outright. Survivor ids are unique by
    // invariant 2 (one live row per id), so no distinct is needed.
    val relabeled = (if (nPairs == 0L)
        starEdges.select(col("pa").as("id"), col("pb").as("component"))
      else Components.connectedComponents(starEdges.union(pairs), "pa", "pb"))
      .withColumn("batch", lit(batchId))
    if (nRetired > 0L) {
      // every touched row dies; survivors are rewritten below in this
      // same batch, retired ids are not. The marker records the digest
      // of the RETIRE set (the caller's intent), not the wider tombstone
      // set — retire()'s re-run guard compares incoming ids against it
      val allAffected = affected.select("id")
        .unionByName(retired.get.select("id")).distinct()
      val tombBytes =
        StoreProtocol.writeTombstones(spark, root, allAffected, "id", batchId)
      writeDelta(spark, root, relabeled, batchId, meta,
        tables = Seq("byid", "bycomp", "tombs"),
        extraLines = Seq(
          StoreProtocol.tombsetLine(
            StoreProtocol.tombsDigest(retired.get, "id")),
          StoreProtocol.tombBytesLine(tombBytes)))
    } else writeDelta(spark, root, relabeled, batchId, meta)
  }

  /** Retire `ids` from the standing labels as batch `batchId` — the
    * membership-level delete: retired ids drop out of their clusters,
    * and each touched cluster's SURVIVORS stay one cluster relabeled to
    * their new minimum id (the store tracks cluster membership, not the
    * pair graph, so it cannot know whether a retired node was a cut
    * vertex — keeping the remainder together is the conservative reading
    * of near-dup transitivity, which was itself an approximation).
    *
    * Mechanics (invariant 1's carve-out): every row of every TOUCHED
    * component is tombstoned — the retired ids' rows die outright, the
    * survivors' stale-label rows die and are REWRITTEN under the new
    * label in this same batch — so `min(component)` over live rows stays
    * the exact resolution read even though the label went UP. Work and
    * writes are bounded by the touched components + the delete set,
    * never the corpus. Idempotent per batchId: a COMMITTED re-run (the
    * marker's delete-set digest matches the incoming ids — exactly what
    * Takedown.resume replays after a crash between the labels commit and
    * `_DONE`) is a no-op, legitimately so even though the retirement
    * itself wrote byid/bycomp relabel rows in its batch; an uncommitted
    * crash's retry re-runs fully (reads are fenced at
    * `belowBatch = batchId`, re-runs overwrite their own dirs); a
    * DIFFERENT retirement or a data batch under this id is refused.
    * Retiring ids the store never saw just records their tombstones
    * (harmless; kills nothing).
    */
  def retire(
      spark: SparkSession, root: String, ids: DataFrame, idCol: String,
      batchId: Long): Unit = {
    val meta = readMeta(spark, root).getOrElse(return)
    if (StoreProtocol.retireAlreadyCommitted(spark, root, batchId,
        StoreProtocol.tombsDigest(ids, idCol)))
      return // committed re-run: state already holds this retirement
    applyBatch(spark, root,
      spark.emptyDataFrame.select(lit(0L).as("a"), lit(0L).as("b")).limit(0),
      "a", "b", Some(ids), batchId, meta, retireIdCol = idCol)
  }

  /** Write (id, component, batch) rows under both keys + the commit
    * marker. One file per bucket per batch (repartition on the bucket
    * column before the partitioned write).
    */
  private def writeDelta(
      spark: SparkSession, root: String, rows: DataFrame, batchId: Long,
      meta: Meta, tables: Seq[String] = Seq("byid", "bycomp"),
      extraLines: Seq[String] = Nil): Unit = {
    val pinned = rows.select(col("id"), col("component"), col("batch"))
      .localCheckpoint(true)
    def writeCopy(table: String, keyCol: String): Unit =
      pinned
        .withColumn("bucket",
          pmod(xxhash64(col(keyCol)), lit(meta.buckets)).cast("int"))
        .repartition(col("bucket"))
        .sortWithinPartitions("bucket", keyCol)
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(s"$root/$table/batch=$batchId")
    // both key-copies are independent jobs over the same pinned rows into
    // disjoint dirs — overlap them (guide §2.6); the marker below is the
    // commit point and is written only after both land
    graft.util.Par.run(
      () => writeCopy("byid", "id"),
      () => writeCopy("bycomp", "component"))
    StoreProtocol.writeBucketMarker(spark, root, batchId, tables, extraLines)
  }

  /** Fold batches at/below the horizon into one latest-wins snapshot per
    * key copy, keeping the newest `keepNewest` batches live (so in-loop
    * readers fenced at the newest batch stay serviceable). Dead-label
    * garbage in `bycomp` is dropped here: the snapshot is regenerated
    * from the RESOLVED labels. `_COMPACT` pointer flip is the commit
    * point; old dirs are removed only after it.
    */
  def compact(spark: SparkSession, root: String, keepNewest: Int = 1): Unit = {
    val meta = readMeta(spark, root).getOrElse(return)
    val committed = committedBatches(spark, root)
    val (prevGen, prevUpTo) = compactState(spark, root).getOrElse((-1L, -1L))
    val foldable = committed.filter(_ > prevUpTo).dropRight(keepNewest)
    if (foldable.isEmpty) return
    val upTo = foldable.max
    val gen = prevGen + 1
    val resolved = labels(spark, root, belowBatch = upTo + 1)
      .withColumn("batch", lit(upTo))
      .localCheckpoint(true)
    def writeSnap(table: String, keyCol: String): Unit =
      resolved
        .withColumn("bucket",
          pmod(xxhash64(col(keyCol)), lit(meta.buckets)).cast("int"))
        .repartition(col("bucket"))
        .sortWithinPartitions("bucket", keyCol)
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(s"$root/$table/c$gen")
    // independent snapshot writes into disjoint c<gen> dirs (guide §2.6);
    // the pointer flip below stays the commit point
    graft.util.Par.run(
      () => writeSnap("byid", "id"),
      () => writeSnap("bycomp", "component"))
    StoreProtocol.writeCompactPointer(spark, root, gen, upTo)
    // post-commit cleanup: everything at/below the NEW pointer horizon
    // (heals a previous crash-after-flip's unreclaimed dirs too); the
    // snapshot resolved labels WITH tombstones applied, so covered
    // tombstones are physically done and reclaimed here
    StoreProtocol.cleanupCompacted(spark, root,
      Seq("byid", "bycomp", "tombs"))
  }
}
