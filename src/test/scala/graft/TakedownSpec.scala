package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{AnnIndexStore, Components, CorpusIngest, LabelStore,
  SignatureIndexStore, Takedown, TextOps}
import graft.util.StoreProtocol

/** Deletion/retirement through the standing stores and the corpus-level
  * [[Takedown]] orchestration: state after deletes must equal a
  * from-scratch build over the survivors, compaction must make deletes
  * physical, re-appends must resurrect, and a kill anywhere mid-delete
  * must be healed by [[Takedown.resume]].
  */
class TakedownSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val cfg = CorpusIngest.Config()
  private val sigMeta = SignatureIndexStore.Meta(
    buckets = 8, numHashes = cfg.numHashes, bandSize = cfg.bandSize)
  private val labelMeta = LabelStore.Meta(buckets = 4)

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_td_$tag").toString

  private def docsDf(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private def sigsOf(df: org.apache.spark.sql.DataFrame) =
    CorpusIngest.signatureIndex(df, "doc_id", "text", cfg)
      .localCheckpoint(true)

  private def sigSet(root: String): Set[(Long, Seq[Long])] =
    SignatureIndexStore.sigsView(spark, root).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1))).toSet

  // ------------------------------------------------ signature store

  test("sig store: retire hides docs from matches and sigsView; re-append resurrects") {
    val root = tmp("sig") + "/store"
    val corpus = docsDf(
      (1L, "the quick brown fox jumps over the lazy dog near the river"),
      (2L, "a careful study of historical documents reveals many patterns"))
    SignatureIndexStore.append(spark, root, sigsOf(corpus), 0L, sigMeta)
    // a near-dup of doc 1 matches before the retirement…
    val probe = sigsOf(docsDf(
      (10L, "the quick brown fox jumps over the lazy dog near the ocean")))
    assert(SignatureIndexStore.matches(spark, root, probe, cfg.threshold)
      .collect().map(_.getLong(1)).toSet == Set(1L))
    // …and nothing matches after it
    SignatureIndexStore.retire(spark, root, Seq(1L).toDF("id"), "id", 1L)
    assert(SignatureIndexStore.matches(spark, root, probe, cfg.threshold)
      .collect().isEmpty)
    assert(SignatureIndexStore.sigsView(spark, root)
      .select("doc_id").collect().map(_.getLong(0)).toSet == Set(2L))
    // re-appending doc 1 in a LATER batch resurrects it
    SignatureIndexStore.append(spark, root,
      sigsOf(corpus.filter($"doc_id" === 1L)), 2L, sigMeta)
    assert(SignatureIndexStore.matches(spark, root, probe, cfg.threshold)
      .collect().map(_.getLong(1)).toSet == Set(1L))
    // exactly ONE live signature row for doc 1 (the stale one is dead)
    assert(SignatureIndexStore.sigsView(spark, root)
      .filter($"doc_id" === 1L).count() == 1L)
  }

  test("sig store: state after retire + compact hash-equals a from-scratch build over survivors") {
    val all = docsDf(
      (1L, "the quick brown fox jumps over the lazy dog near the river"),
      (2L, "a careful study of historical documents reveals many patterns"),
      (3L, "novel observations about glacier movement and seasonal melt"),
      (4L, "completely unrelated text about cooking pasta with tomatoes"))
    val retired = docsDf(
      (2L, "a careful study of historical documents reveals many patterns"),
      (3L, "novel observations about glacier movement and seasonal melt"))

    val rootA = tmp("sigA") + "/store"
    SignatureIndexStore.append(spark, rootA,
      sigsOf(all.filter($"doc_id" <= 2L)), 0L, sigMeta)
    SignatureIndexStore.append(spark, rootA,
      sigsOf(all.filter($"doc_id" > 2L)), 1L, sigMeta)
    SignatureIndexStore.retire(spark, rootA,
      retired.select("doc_id"), "doc_id", 2L)
    // one more live batch so keep-newest leaves the retire covered
    SignatureIndexStore.append(spark, rootA,
      sigsOf(docsDf((9L, "a ninth document about entirely new things here"))),
      3L, sigMeta)
    SignatureIndexStore.compact(spark, rootA, keepNewest = 1)

    val rootB = tmp("sigB") + "/store"
    SignatureIndexStore.append(spark, rootB,
      sigsOf(all.filter($"doc_id" === 1L || $"doc_id" === 4L)), 0L, sigMeta)
    SignatureIndexStore.append(spark, rootB,
      sigsOf(docsDf((9L, "a ninth document about entirely new things here"))),
      1L, sigMeta)

    assert(sigSet(rootA) == sigSet(rootB))
    // the deletes are PHYSICAL: applied tombstones and covered dirs gone
    val f = new java.io.File(rootA)
    assert(!new java.io.File(f, "tombs/batch=2").exists(),
      "applied tombstones were not reclaimed at compaction")
    assert(!new java.io.File(f, "sigs/batch=0").exists(),
      "covered data dirs were not reclaimed at compaction")
    // and a retired doc's signature appears in NO parquet file on disk
    val survivors = spark.read
      .option("recursiveFileLookup", "true")
      .parquet(s"$rootA/sigs")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!survivors.contains(2L) && !survivors.contains(3L),
      s"retired rows still on disk: $survivors")
  }

  test("sig store: retiring under a committed DATA batch id is refused; retire re-run is not") {
    val root = tmp("sigguard") + "/store"
    SignatureIndexStore.append(spark, root, sigsOf(docsDf(
      (1L, "the quick brown fox jumps over the lazy dog near the river"))),
      0L, sigMeta)
    intercept[IllegalArgumentException] {
      SignatureIndexStore.retire(spark, root, Seq(1L).toDF("id"), "id", 0L)
    }
    SignatureIndexStore.retire(spark, root, Seq(1L).toDF("id"), "id", 1L)
    SignatureIndexStore.retire(spark, root, Seq(1L).toDF("id"), "id", 1L)
    assert(SignatureIndexStore.sigsView(spark, root).collect().isEmpty)
  }

  // ------------------------------------------------------ ANN store

  test("ann store: retire hides vectors from query and rebuild; compact makes it physical") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .filter(col("vec_id") < 40L)
      .localCheckpoint(true)
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val root = tmp("ann") + "/store"
    AnnIndexStore.build(spark, root, emb, "vec_id", "embedding", dim,
      numCentroids = 4)
    // plant an exact copy of vector 0 under id 1000, then retire it:
    // the copy must vanish from its own top-1
    AnnIndexStore.append(spark, root,
      emb.filter(col("vec_id") === 0L)
        .select((col("vec_id") + 1000L).as("vec_id"), col("embedding")),
      "vec_id", "embedding", 1L)
    val q = emb.filter(col("vec_id") === 0L)
    def top1(): Long = AnnIndexStore.query(
        spark, root, q, "vec_id", "embedding", k = 1, nprobe = 4)
      .head().getAs[Long]("neighbor_id")
    assert(top1() == 1000L)
    AnnIndexStore.retire(spark, root, Seq(1000L).toDF("id"), "id", 2L)
    assert(top1() != 1000L)
    // exhaustive query equals brute force over SURVIVORS exactly
    val got = AnnIndexStore.query(
        spark, root, q, "vec_id", "embedding", k = 5, nprobe = 4)
      .select("neighbor_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = graft.operators.Similarity.cosineTopK(
        q, emb, "vec_id", "embedding", dim, k = 5)
      .select("neighbor_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute, s"diff=${(got diff brute) ++ (brute diff got)}")
    // compact applies + reclaims; the retired vid is gone from disk
    AnnIndexStore.append(spark, root,
      emb.filter(col("vec_id") === 1L)
        .select((col("vec_id") + 2000L).as("vec_id"), col("embedding")),
      "vec_id", "embedding", 3L)
    AnnIndexStore.compact(spark, root, keepNewest = 1)
    assert(!new java.io.File(s"$root/tombs/batch=2").exists())
    val onDisk = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$root/vecs")
      .select("vid").collect().map(_.getLong(0)).toSet
    assert(!onDisk.contains(1000L), "retired vector survived compaction")
    assert(top1() != 1000L)
  }

  // ---------------------------------------------------- label store

  test("label store: retiring the minimum id relabels survivors to the new minimum") {
    val root = tmp("label") + "/store"
    LabelStore.fold(spark, root, Seq((1L, 2L), (2L, 3L)).toDF("a", "b"),
      "a", "b", 1L, labelMeta)
    LabelStore.retire(spark, root, Seq(1L).toDF("id"), "id", 2L)
    val labels = LabelStore.labels(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(2L -> 2L, 3L -> 2L), s"got $labels")
    // membership under the NEW label is complete; the old label is dead
    val mem = LabelStore.members(spark, root,
        Seq(2L).toDF("component"), "component")
      .collect().map(_.getLong(0)).toSet
    assert(mem == Set(2L, 3L), s"got $mem")
    assert(LabelStore.members(spark, root,
      Seq(1L).toDF("component"), "component").collect().isEmpty)
    // a fold AFTER the retire merges against the relabeled cluster
    LabelStore.fold(spark, root, Seq((3L, 10L)).toDF("a", "b"),
      "a", "b", 3L, labelMeta)
    val after = LabelStore.labels(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after == Map(2L -> 2L, 3L -> 2L, 10L -> 2L), s"got $after")
    // compaction preserves the post-retire state and reclaims tombstones
    LabelStore.fold(spark, root, Seq((20L, 21L)).toDF("a", "b"),
      "a", "b", 4L, labelMeta)
    LabelStore.compact(spark, root, keepNewest = 1)
    val compacted = LabelStore.labels(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(compacted ==
      Map(2L -> 2L, 3L -> 2L, 10L -> 2L, 20L -> 20L, 21L -> 20L))
    assert(!new java.io.File(s"$root/tombs/batch=2").exists())
  }

  test("label store: retiring a whole cluster, a non-member, and untouched clusters") {
    val root = tmp("label2") + "/store"
    LabelStore.fold(spark, root,
      Seq((1L, 2L), (10L, 11L)).toDF("a", "b"), "a", "b", 1L, labelMeta)
    // whole cluster {1,2} + an id the store never saw
    LabelStore.retire(spark, root, Seq(1L, 2L, 999L).toDF("id"), "id", 2L)
    val labels = LabelStore.labels(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(10L -> 10L, 11L -> 10L), s"got $labels")
    // retired ids can come back as brand-new cluster members later
    LabelStore.fold(spark, root, Seq((1L, 50L)).toDF("a", "b"),
      "a", "b", 3L, labelMeta)
    val back = LabelStore.labels(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(back == Map(10L -> 10L, 11L -> 10L, 1L -> 1L, 50L -> 1L),
      s"got $back")
  }

  // ------------------------------------------- corpus-level takedown

  private def buildWorld(base: String): (Takedown.Targets, String) = {
    val corpusDir = s"$base/accepted"
    val targets = Takedown.Targets(
      corpusDir = Some(corpusDir),
      sigRoot = Some(s"$base/sig"),
      annRoot = Some(s"$base/ann"),
      labelsRoot = Some(s"$base/labels"))
    val b0 = docsDf(
      (1L, "the quick brown fox jumps over the lazy dog near the river"),
      (2L, "a careful study of historical documents reveals many patterns"),
      (3L, "novel observations about glacier movement and seasonal melt"),
      (4L, "completely unrelated text about cooking pasta with tomatoes"))
    val b1 = docsDf(
      (11L, "mountain weather patterns change rapidly during early spring"),
      (12L, "deep learning models require careful regularization choices"))
    b0.write.mode("overwrite").parquet(s"$corpusDir/batch=0")
    b1.write.mode("overwrite").parquet(s"$corpusDir/batch=1")
    SignatureIndexStore.append(spark, s"$base/sig", sigsOf(b0), 0L, sigMeta)
    SignatureIndexStore.append(spark, s"$base/sig", sigsOf(b1), 1L, sigMeta)
    val emb = TextOps.hashedEmbedding(b0.unionByName(b1), "doc_id", "text", 16)
    AnnIndexStore.build(spark, s"$base/ann", emb, "doc_id", "embedding",
      16, numCentroids = 2)
    LabelStore.fold(spark, s"$base/labels",
      Seq((1L, 2L), (11L, 12L)).toDF("a", "b"), "a", "b", 1L, labelMeta)
    (targets, s"$base/journal")
  }

  // layout-aware: slices a takedown rewrote serve from their live sv=
  // version, so a whole-root read would refuse the mixed depths
  private def corpusIds(dir: String): Set[Long] =
    CorpusIngest.accepted(spark, dir).select("doc_id").collect()
      .map(_.getLong(0)).toSet

  test("takedown propagates one delete set through corpus + all three stores") {
    val base = tmp("world")
    val (targets, journal) = buildWorld(base)
    Takedown.takedown(spark, Seq(1L, 11L).toDF("id"), "id", targets, journal)
    assert(corpusIds(s"$base/accepted") == Set(2L, 3L, 4L, 12L))
    assert(SignatureIndexStore.sigsView(spark, s"$base/sig")
      .select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(2L, 3L, 4L, 12L))
    val annLeft = AnnIndexStore.query(spark, s"$base/ann",
        TextOps.hashedEmbedding(docsDf(
          (50L, "the quick brown fox jumps over the lazy dog near rivers")),
          "doc_id", "text", 16),
        "doc_id", "embedding", k = 10, nprobe = 2)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(!annLeft.contains(1L) && !annLeft.contains(11L), s"$annLeft")
    val labels = LabelStore.labels(spark, s"$base/labels").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(2L -> 2L, 12L -> 12L), s"got $labels")
    // the journal records completion
    assert(new java.io.File(s"$journal/td=0/_DONE").exists())
  }

  test("kill right after the journal commit point: resume completes the delete") {
    val base = tmp("kill1")
    val (targets, journal) = buildWorld(base)
    // reproduce the crash state: ids + _PLAN committed, nothing executed
    val td = s"$journal/td=0"
    Seq(2L, 12L).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(s"$td/ids")
    def next(root: String): Long =
      StoreProtocol.committedBatches(spark, root)
        .lastOption.getOrElse(-1L) + 1L
    val f = StoreProtocol.fs(spark, journal)
    graft.util.FsAtomic.writePointer(f,
      new org.apache.hadoop.fs.Path(td), "_PLAN",
      Seq(s"sig ${next(s"$base/sig")}", s"ann ${next(s"$base/ann")}",
        s"labels ${next(s"$base/labels")}",
        s"corpus $base/accepted", "corpus_id doc_id",
        "corpus_part batch").mkString("\n"))
    // a resume with NARROWER targets than the plan must refuse, not
    // silently skip part of the committed delete
    intercept[IllegalArgumentException] {
      Takedown.resume(spark, targets.copy(annRoot = None), journal)
    }
    // …and so must a resume pointing at a DIFFERENT corpus than pinned
    intercept[IllegalArgumentException] {
      Takedown.resume(spark,
        targets.copy(corpusDir = Some(s"$base/elsewhere")), journal)
    }
    assert(Takedown.resume(spark, targets, journal) == 1)
    assert(corpusIds(s"$base/accepted") == Set(1L, 3L, 4L, 11L))
    assert(SignatureIndexStore.sigsView(spark, s"$base/sig")
      .select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L, 4L, 11L))
    assert(new java.io.File(s"$td/_DONE").exists())
    // resume again: nothing pending, nothing changes
    assert(Takedown.resume(spark, targets, journal) == 0)
  }

  test("kill mid-slice-rewrite: staged-unflipped discarded, flipped-undeleted healed, readers whole throughout") {
    val base = tmp("kill2")
    val (targets, journal) = buildWorld(base)
    val td = s"$journal/td=0"
    Seq(1L).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(s"$td/ids")
    def next(root: String): Long =
      StoreProtocol.committedBatches(spark, root)
        .lastOption.getOrElse(-1L) + 1L
    // crash shape A: batch=0's survivor version landed (sv=0, _SUCCESS)
    // but the process died BEFORE the _V flip — the plain originals
    // (still holding doc 1) stay live
    val survivors = spark.read.parquet(s"$base/accepted/batch=0")
      .filter(col("doc_id") =!= 1L).localCheckpoint(true)
    survivors.write.mode("overwrite")
      .parquet(s"$base/accepted/batch=0/sv=0")
    val f = StoreProtocol.fs(spark, base)
    graft.util.FsAtomic.writePointer(f,
      new org.apache.hadoop.fs.Path(td), "_PLAN",
      Seq(s"sig ${next(s"$base/sig")}", s"ann ${next(s"$base/ann")}",
        s"labels ${next(s"$base/labels")}",
        s"corpus $base/accepted", "corpus_id doc_id",
        "corpus_part batch").mkString("\n"))
    // a reader in this window sees the complete ORIGINAL corpus — not a
    // missing partition, not staged/live duplicates
    assert(corpusIds(s"$base/accepted") == Set(1L, 2L, 3L, 4L, 11L, 12L))
    assert(Takedown.resume(spark, targets, journal) == 1)
    assert(corpusIds(s"$base/accepted") == Set(2L, 3L, 4L, 11L, 12L))
    // the slice is versioned now, and no stale data survives in it
    val slice = new java.io.File(s"$base/accepted/batch=0")
    assert(slice.exists())
    val onDisk = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$base/accepted/batch=0")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(onDisk == Set(2L, 3L, 4L), s"stale rows on disk: $onDisk")
  }

  test("legacy round-12 crash shape: a journal-staged committed rewrite with a deleted target is finished") {
    val base = tmp("legacy")
    val (targets, journal) = buildWorld(base)
    val td = s"$journal/td=0"
    Seq(1L).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(s"$td/ids")
    def next(root: String): Long =
      StoreProtocol.committedBatches(spark, root)
        .lastOption.getOrElse(-1L) + 1L
    // the OLD protocol's crash state: batch=0's survivors committed
    // under $td/rewrite and the live dir already deleted before the
    // rename — the versioned protocol alone would never find them
    spark.read.parquet(s"$base/accepted/batch=0")
      .filter(col("doc_id") =!= 1L).localCheckpoint(true)
      .write.mode("overwrite").parquet(s"$td/rewrite/batch=0")
    val f = StoreProtocol.fs(spark, base)
    f.delete(new org.apache.hadoop.fs.Path(s"$base/accepted/batch=0"), true)
    graft.util.FsAtomic.writePointer(f,
      new org.apache.hadoop.fs.Path(td), "_PLAN",
      Seq(s"sig ${next(s"$base/sig")}", s"ann ${next(s"$base/ann")}",
        s"labels ${next(s"$base/labels")}",
        s"corpus $base/accepted", "corpus_id doc_id",
        "corpus_part batch").mkString("\n"))
    assert(Takedown.resume(spark, targets, journal) == 1)
    assert(corpusIds(s"$base/accepted") == Set(2L, 3L, 4L, 11L, 12L))
    assert(new java.io.File(s"$base/accepted/batch=0").exists())
  }

  test("kill after flip before delete: stale plain files are GC'd even though the live slice is clean") {
    val base = tmp("kill3")
    val (targets, journal) = buildWorld(base)
    val td = s"$journal/td=0"
    Seq(1L).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(s"$td/ids")
    def next(root: String): Long =
      StoreProtocol.committedBatches(spark, root)
        .lastOption.getOrElse(-1L) + 1L
    // crash shape B: sv=0 written AND _V flipped, superseded plain
    // files (holding retired doc 1) not yet deleted
    spark.read.parquet(s"$base/accepted/batch=0")
      .filter(col("doc_id") =!= 1L).localCheckpoint(true)
      .write.mode("overwrite").parquet(s"$base/accepted/batch=0/sv=0")
    val f = StoreProtocol.fs(spark, base)
    graft.util.FsAtomic.writePointer(f,
      new org.apache.hadoop.fs.Path(s"$base/accepted/batch=0"), "_V", "0")
    // a reader resolves the live version only — already clean, no dups
    assert(corpusIds(s"$base/accepted") == Set(2L, 3L, 4L, 11L, 12L))
    graft.util.FsAtomic.writePointer(f,
      new org.apache.hadoop.fs.Path(td), "_PLAN",
      Seq(s"sig ${next(s"$base/sig")}", s"ann ${next(s"$base/ann")}",
        s"labels ${next(s"$base/labels")}",
        s"corpus $base/accepted", "corpus_id doc_id",
        "corpus_part batch").mkString("\n"))
    // the live content holds no retired ids, so the affected set is
    // empty — gcStale is what must reap the stale plain files, or doc
    // 1's bytes would linger in a version no rewrite ever revisits
    assert(Takedown.resume(spark, targets, journal) == 1)
    val onDisk = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$base/accepted/batch=0")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(onDisk == Set(2L, 3L, 4L), s"stale rows on disk: $onDisk")
  }

  test("label store: fold + retire commit atomically as ONE batch (applyBatch)") {
    val root = tmp("combined") + "/store"
    // clusters A={1,2,3} (label 1), B={10,11}, C={20,21}
    LabelStore.fold(spark, root,
      Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L)).toDF("a", "b"),
      "a", "b", 1L, labelMeta)
    // one batch: retire A's minimum AND a pair merging B with C, AND a
    // pair touching the retired id (must be dropped — retirement wins)
    LabelStore.applyBatch(spark, root,
      Seq((11L, 20L), (1L, 99L)).toDF("a", "b"), "a", "b",
      Some(Seq(1L).toDF("id")), 2L, labelMeta)
    val labels = LabelStore.labels(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(
      2L -> 2L, 3L -> 2L,                       // A survivors, relabeled
      10L -> 10L, 11L -> 10L, 20L -> 10L, 21L -> 10L), // B ∪ C merged
      s"got $labels — and 99 must NOT appear (its pair touched retired 1)")
    // idempotent replay of the combined batch
    LabelStore.applyBatch(spark, root,
      Seq((11L, 20L), (1L, 99L)).toDF("a", "b"), "a", "b",
      Some(Seq(1L).toDF("id")), 2L, labelMeta)
    val replay = LabelStore.labels(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(replay == labels)
    // a PURE fold must still refuse the retirement batch's id
    intercept[IllegalArgumentException] {
      LabelStore.fold(spark, root, Seq((50L, 51L)).toDF("a", "b"),
        "a", "b", 2L, labelMeta)
    }
  }

  test("label retire re-run after commit is a no-op even though the retirement wrote relabel rows") {
    // the round-12 wedge: a label retirement touching components with
    // survivors legitimately writes byid/bycomp rows in its own batch,
    // and a guard keyed on "retire markers carry no data buckets" then
    // refused exactly the re-run Takedown.resume performs after a crash
    // between the labels commit and _DONE
    val root = tmp("rerun") + "/store"
    LabelStore.fold(spark, root, Seq((1L, 2L), (2L, 3L)).toDF("a", "b"),
      "a", "b", 1L, labelMeta)
    LabelStore.retire(spark, root, Seq(1L).toDF("id"), "id", 2L)
    val committed = LabelStore.labels(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(committed == Map(2L -> 2L, 3L -> 2L), s"got $committed")
    // the marker carries BOTH relabel data buckets and the tombs line —
    // the exact shape the old guard refused
    assert(StoreProtocol.markerBuckets(spark, root, "byid", 2L)
      .exists(_.nonEmpty), "retirement should have written relabel rows")
    assert(StoreProtocol.markerTombset(spark, root, 2L).isDefined)
    // same ids, same batch: no-op, not an exception, state unchanged
    LabelStore.retire(spark, root, Seq(1L).toDF("id"), "id", 2L)
    val after = LabelStore.labels(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after == committed)
    // a DIFFERENT delete set under the committed retire id is refused
    intercept[IllegalArgumentException] {
      LabelStore.retire(spark, root, Seq(2L).toDF("id"), "id", 2L)
    }
  }

  test("kill after the labels retirement committed: resume completes without wedging") {
    val base = tmp("kill4")
    val (targets, journal) = buildWorld(base)
    val td = s"$journal/td=0"
    Seq(1L).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(s"$td/ids")
    def next(root: String): Long =
      StoreProtocol.committedBatches(spark, root)
        .lastOption.getOrElse(-1L) + 1L
    val labelsBatch = next(s"$base/labels")
    val plan = Seq(s"sig ${next(s"$base/sig")}",
      s"ann ${next(s"$base/ann")}", s"labels $labelsBatch",
      s"corpus $base/accepted", "corpus_id doc_id", "corpus_part batch")
    graft.util.FsAtomic.writePointer(StoreProtocol.fs(spark, journal),
      new org.apache.hadoop.fs.Path(td), "_PLAN", plan.mkString("\n"))
    // the crash state: the labels retirement ran to COMMIT (relabel rows
    // + tombstones + marker) before the process died — buildWorld's
    // cluster {1,2} has a survivor, so the marker carries data buckets
    LabelStore.retire(spark, s"$base/labels", Seq(1L).toDF("id"), "id",
      labelsBatch)
    // resume must treat the committed labels retirement as done (not
    // throw), finish the rest, and mark _DONE
    assert(Takedown.resume(spark, targets, journal) == 1)
    assert(new java.io.File(s"$td/_DONE").exists())
    val labels = LabelStore.labels(spark, s"$base/labels").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(2L -> 2L, 11L -> 11L, 12L -> 11L), s"got $labels")
    assert(corpusIds(s"$base/accepted") == Set(2L, 3L, 4L, 11L, 12L))
    // and a SECOND takedown through the same journal still works (the
    // old guard left the journal permanently wedged here)
    Takedown.takedown(spark, Seq(2L).toDF("id"), "id", targets, journal)
    assert(corpusIds(s"$base/accepted") == Set(3L, 4L, 11L, 12L))
  }

  test("sig store: a committed combined append's id cannot be hijacked by a different retirement") {
    val root = tmp("combguard") + "/store"
    SignatureIndexStore.append(spark, root, sigsOf(docsDf(
      (1L, "the quick brown fox jumps over the lazy dog near the river"),
      (2L, "a careful study of historical documents reveals many patterns"))),
      0L, sigMeta)
    // batch 1: combined data + retirement of doc 1
    SignatureIndexStore.append(spark, root, sigsOf(docsDf(
      (3L, "novel observations about glacier movement and seasonal melt"))),
      1L, sigMeta, retireIds = Some(Seq(1L).toDF("id")))
    val live = SignatureIndexStore.sigsView(spark, root)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(live == Set(2L, 3L))
    // a DIFFERENT retirement reusing batch 1 would resurrect doc 1 and
    // kill doc 2 — refused by the digest guard
    intercept[IllegalArgumentException] {
      SignatureIndexStore.retire(spark, root, Seq(2L).toDF("id"), "id", 1L)
    }
    // the SAME retirement re-run is a harmless no-op
    SignatureIndexStore.retire(spark, root, Seq(1L).toDF("id"), "id", 1L)
    assert(SignatureIndexStore.sigsView(spark, root)
      .select("doc_id").collect().map(_.getLong(0)).toSet == Set(2L, 3L))
  }

  test("ann full erasure: rebuild after retire retrains the quantizer on survivors only") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .filter(col("vec_id") < 40L)
      .localCheckpoint(true)
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val root = tmp("erasure") + "/store"
    AnnIndexStore.build(spark, root, emb, "vec_id", "embedding", dim,
      numCentroids = 4)
    AnnIndexStore.retire(spark, root,
      (0L until 10L).toDF("id"), "id", 1L)
    val rebuilt = tmp("erasure") + "/rebuilt"
    AnnIndexStore.rebuild(spark, root, rebuilt, numCentroids = 4)
    // reference: a store that never saw the retired vectors at all
    val scratch = tmp("erasure") + "/scratch"
    AnnIndexStore.build(spark, scratch,
      emb.filter(col("vec_id") >= 10L), "vec_id", "embedding", dim,
      numCentroids = 4)
    // identical quantizer: same seeds (same survivor id set), same Lloyd
    // means — only float summation order can differ, so compare to 1e-4
    def cents(r: String): Map[Long, Seq[Float]] =
      AnnIndexStore.centroids(spark, r).collect()
        .map(x => x.getLong(0) -> x.getSeq[Float](1)).toMap
    val a = cents(rebuilt); val b = cents(scratch)
    assert(a.keySet == b.keySet, s"${a.keySet} vs ${b.keySet}")
    a.foreach { case (cid, av) =>
      val bv = b(cid)
      val maxDiff = av.zip(bv).map { case (x, y) => math.abs(x - y) }.max
      assert(maxDiff < 1e-4f,
        s"centroid $cid diverged from survivors-only training: $maxDiff")
    }
    // and the rebuilt index never surfaces a retired vid
    val got = AnnIndexStore.query(spark, rebuilt,
        emb.filter(col("vec_id") === 0L), "vec_id", "embedding",
        k = 30, nprobe = 4)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(got.forall(_ >= 10L), s"retired vids in rebuilt index: $got")
  }

  test("ann store: a committed combined append's id cannot be hijacked by a different retirement") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .filter(col("vec_id") < 20L)
      .localCheckpoint(true)
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val root = tmp("anng") + "/store"
    AnnIndexStore.build(spark, root, emb.filter(col("vec_id") < 10L),
      "vec_id", "embedding", dim, numCentroids = 2)
    // batch 1: combined append of 10..19 retiring vid 0
    AnnIndexStore.append(spark, root, emb.filter(col("vec_id") >= 10L),
      "vec_id", "embedding", 1L, retireIds = Some(Seq(0L).toDF("id")))
    intercept[IllegalArgumentException] {
      AnnIndexStore.retire(spark, root, Seq(5L).toDF("id"), "id", 1L)
    }
    // exact re-run: no-op; vid 0 stays retired, batch 1's vectors live
    AnnIndexStore.retire(spark, root, Seq(0L).toDF("id"), "id", 1L)
    val got = AnnIndexStore.query(spark, root,
        emb.filter(col("vec_id") === 1L), "vec_id", "embedding",
        k = 30, nprobe = 2)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(!got.contains(0L), "retired vid resurrected by retire re-run")
    assert(got.contains(10L), "combined batch's vectors lost")
  }

  test("ingestIndexed retireIds: atomic with the batch; retiring content is not a dup judge") {
    val root = tmp("ingestret") + "/store"
    val d0 = docsDf(
      (1L, "the quick brown fox jumps over the lazy dog near the river"),
      (2L, "a careful study of historical documents reveals many patterns"))
    CorpusIngest.ingestIndexed(d0, "doc_id", "text", root, 0L)
    // batch 1 retires doc 1 AND submits a verbatim copy under a new id:
    // the copy must be ACCEPTED (its only match is the retiring doc)
    val d1 = docsDf(
      (10L, "the quick brown fox jumps over the lazy dog near the river"))
    val (accepted, _) = CorpusIngest.ingestIndexed(
      d1, "doc_id", "text", root, 1L,
      retireIds = Some(Seq(1L).toDF("id")))
    assert(accepted.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(10L), "copy of retiring content was wrongly dropped as a dup")
    // standing state: 1 dead, 2 and 10 live
    assert(SignatureIndexStore.sigsView(spark, root)
      .select("doc_id").collect().map(_.getLong(0)).toSet == Set(2L, 10L))
  }

  test("streaming loop: the retire feed deletes atomically with a micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp("streamret")
    val input = MemoryStream[(Long, String)]
    // batch 1's commit retires doc 1 (deterministic per batch id)
    val feed: Long => Option[org.apache.spark.sql.DataFrame] =
      id => if (id == 1L) Some(Seq(1L).toDF("id")) else None
    val q = CorpusIngest.streamingIndexed(
      input.toDS().toDF("doc_id", "text"), "doc_id", "text",
      s"$dir/index", s"$dir/accepted", retireFeed = feed)
    try {
      input.addData(Seq(
        (1L, "the quick brown fox jumps over the lazy dog near the river"),
        (2L, "a careful study of historical documents reveals many patterns")))
      q.processAllAvailable()
      input.addData(Seq(
        (11L, "novel observations about glacier movement and seasonal melt")))
      q.processAllAvailable()
      // doc 1 is gone from the accepted slices AND the standing index
      val acc = CorpusIngest.accepted(spark, s"$dir/accepted")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(acc == Set(2L, 11L), s"accepted $acc")
      assert(SignatureIndexStore.sigsView(spark, s"$dir/index")
        .select("doc_id").collect().map(_.getLong(0)).toSet ==
        Set(2L, 11L))
      // a later batch re-admits the retired content
      input.addData(Seq(
        (21L, "the quick brown fox jumps over the lazy dog near the river")))
      q.processAllAvailable()
      val acc2 = CorpusIngest.accepted(spark, s"$dir/accepted")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(acc2 == Set(2L, 11L, 21L), s"accepted $acc2")
    } finally q.stop()
  }

  test("rolling-window feed: the streaming corpus becomes a sliding window; re-accepts stay live") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp("rollwin")
    val input = MemoryStream[(Long, String)]
    val feed = CorpusIngest.rollingWindowFeed(
      spark, s"$dir/accepted", "doc_id", keepBatches = 1)
    val q = CorpusIngest.streamingIndexed(
      input.toDS().toDF("doc_id", "text"), "doc_id", "text",
      s"$dir/index", s"$dir/accepted", retireFeed = feed)
    def acceptedIds(): Set[Long] =
      CorpusIngest.accepted(spark, s"$dir/accepted")
        .select("doc_id").collect().map(_.getLong(0)).toSet
    try {
      input.addData(Seq(
        (1L, "the quick brown fox jumps over the lazy dog near the river"),
        (2L, "a careful study of historical documents reveals many patterns")))
      q.processAllAvailable() // batch 0
      input.addData(Seq(
        (11L, "novel observations about glacier movement and seasonal melt")))
      q.processAllAvailable() // batch 1: window covers {0,1} — nothing expires
      assert(acceptedIds() == Set(1L, 2L, 11L), acceptedIds().toString)
      input.addData(Seq(
        (21L, "completely unrelated text about cooking pasta with tomatoes")))
      q.processAllAvailable() // batch 2: batch 0 ages out
      assert(acceptedIds() == Set(11L, 21L), acceptedIds().toString)
      // replay determinism: re-invoking the feed for batch 2 AFTER its
      // slice rewrites returns the JOURNALED set verbatim (a re-derive
      // from the now-empty slices would return None and flip the
      // replayed batch to a pure-data append the store refuses)
      val replayed = feed(2L)
      assert(replayed.isDefined, "replay lost the journaled retire set")
      assert(replayed.get.collect().map(_.getLong(0)).toSet == Set(1L, 2L))
      assert(SignatureIndexStore.sigsView(spark, s"$dir/index")
        .select("doc_id").collect().map(_.getLong(0)).toSet ==
        Set(11L, 21L), "expired docs still live in the standing index")
      // expired content re-submitted is NOT a dup (its standing copy is
      // dead) and re-enters the window under the newer batch
      input.addData(Seq(
        (31L, "the quick brown fox jumps over the lazy dog near the river")))
      q.processAllAvailable() // batch 3: batch 1 ages out
      assert(acceptedIds() == Set(21L, 31L), acceptedIds().toString)
    } finally q.stop()
  }

  test("frontier: retire physically purges urls from the journal; re-admission works") {
    import graft.crawl.FrontierStore
    import graft.schema.{FetchStatus => FS}
    val root = tmp("frontier") + "/frontier"
    def row(url: String, status: String, t: Long) =
      (url, graft.functions.UrlFunctions.extractPld(url), status, t,
        0.5f, t + 1000L)
    val rows = Seq(
      row("http://a.com/1", FS.FETCHED, 100L),
      row("http://a.com/2", FS.FETCHED, 100L),
      row("http://b.com/1", FS.HTTP_GONE, 100L))
      .toDF("url", "pld", "status", "statusTime", "score", "nextFetchTime")
    FrontierStore.mergeInto(spark, root, rows, buckets = 4)
    FrontierStore.retire(spark, root,
      Seq("http://b.com/1").toDF("url"))
    val left = FrontierStore.read(spark, root).get
      .select("url").collect().map(_.getString(0)).toSet
    assert(left == Set("http://a.com/1", "http://a.com/2"), s"left $left")
    // the purged url's bytes are GONE from EVERY parquet file under the
    // root — live generations AND any retained window (the purge path
    // reclaims superseded locations immediately)
    val allParquet = {
      def walk(d: java.io.File): Seq[java.io.File] =
        Option(d.listFiles()).toSeq.flatten.flatMap(f =>
          if (f.isDirectory) walk(f) else Seq(f))
      walk(new java.io.File(root))
        .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    }
    val onDisk = spark.read.parquet(allParquet: _*)
      .select("url").collect().map(_.getString(0)).toSet
    assert(!onDisk.contains("http://b.com/1"),
      s"purged url still on disk: $onDisk")
    // idempotent re-purge; then a later crawl re-admits the url fresh
    FrontierStore.retire(spark, root, Seq("http://b.com/1").toDF("url"))
    FrontierStore.mergeInto(spark, root,
      Seq(row("http://b.com/1", FS.UNFETCHED, 200L))
        .toDF("url", "pld", "status", "statusTime", "score",
          "nextFetchTime"), buckets = 4)
    val back = FrontierStore.read(spark, root).get
      .filter(col("url") === "http://b.com/1")
      .select("status").collect().map(_.getString(0)).toSeq
    assert(back == Seq(FS.UNFETCHED), s"got $back")
  }

  test("frontier: purging a bucket's every url drops it from the manifest; reads survive") {
    import graft.crawl.FrontierStore
    import graft.schema.{FetchStatus => FS}
    val root = tmp("frontier2") + "/frontier"
    // two plds -> (likely) different buckets; purge ALL of one pld
    val rows = Seq(
      ("http://x.com/1", "x.com", FS.FETCHED, 100L, 0.5f, 1100L),
      ("http://x.com/2", "x.com", FS.FETCHED, 100L, 0.5f, 1100L),
      ("http://y.com/1", "y.com", FS.FETCHED, 100L, 0.5f, 1100L))
      .toDF("url", "pld", "status", "statusTime", "score", "nextFetchTime")
    FrontierStore.mergeInto(spark, root, rows, buckets = 8)
    FrontierStore.retire(spark, root,
      Seq("http://x.com/1", "http://x.com/2").toDF("url"))
    val left = FrontierStore.read(spark, root).get
      .select("url").collect().map(_.getString(0)).toSet
    assert(left == Set("http://y.com/1"), s"left $left")
    // domain slice of the purged pld answers empty-or-none, not an error
    val slice = FrontierStore.domainSlice(spark, root, "x.com")
      .map(_.collect().length).getOrElse(0)
    assert(slice == 0, s"purged domain still sliced: $slice")
  }

  test("tombstone anti-join size-switches: a huge purge set shuffles, the takedown norm broadcasts") {
    import org.apache.spark.sql.functions.xxhash64
    // big: 5M hash-spread ids (> TombBroadcastMaxBytes on disk, and
    // sharded across multiple bucket files by the write)
    val bigRoot = tmp("tombswitch") + "/big"
    StoreProtocol.writeTombstones(spark, bigRoot,
      spark.range(5000000L).select(xxhash64(col("id")).as("id")), "id", 1L)
    StoreProtocol.writeBucketMarker(spark, bigRoot, 1L, Seq("tombs"))
    val bigBuckets = new java.io.File(s"$bigRoot/tombs/batch=1")
      .listFiles().count(_.getName.startsWith("bucket="))
    assert(bigBuckets > 1, s"5M-id tombstone set not sharded: $bigBuckets")
    val data = spark.range(1000L)
      .select(xxhash64(col("id")).as("id"), lit(0L).as("batch"))
    val big = StoreProtocol.applyTombstones(data, "id",
      StoreProtocol.readTombstones(spark, bigRoot, Seq(1L)))
    big.count()
    val bigPlan = big.queryExecution.executedPlan.toString
    assert(!bigPlan.contains("BroadcastHashJoin") &&
      !bigPlan.contains("BroadcastNestedLoop"),
      s"huge tombstone set was broadcast:\n${bigPlan.take(1500)}")
    // small: the takedown norm — one file, broadcast anti-join
    val smallRoot = tmp("tombswitch") + "/small"
    StoreProtocol.writeTombstones(spark, smallRoot,
      spark.range(100L).toDF("id"), "id", 1L)
    StoreProtocol.writeBucketMarker(spark, smallRoot, 1L, Seq("tombs"))
    assert(new java.io.File(s"$smallRoot/tombs/batch=1")
      .listFiles().count(_.getName.startsWith("bucket=")) == 1)
    val small = StoreProtocol.applyTombstones(data, "id",
      StoreProtocol.readTombstones(spark, smallRoot, Seq(1L)))
    small.count()
    assert(small.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"),
      "takedown-sized tombstone set lost its broadcast")
  }

  test("retire cost is delete-set-bounded: one tombstone file, no data rewrite") {
    val root = tmp("bounded") + "/store"
    val corpus = (0 until 60).map(i =>
      (i.toLong, s"corpus document number $i about topic $i body $i"))
      .toDF("doc_id", "text")
    SignatureIndexStore.append(spark, root, sigsOf(corpus), 0L, sigMeta)
    def mtimes(dir: String): Map[String, Long] = {
      val d = new java.io.File(dir)
      if (!d.exists()) Map.empty
      else d.listFiles().map(x => x.getName -> x.lastModified()).toMap
    }
    val before = mtimes(s"$root/sigs/batch=0") ++ mtimes(s"$root/bands/batch=0")
    SignatureIndexStore.retire(spark, root,
      Seq(7L, 13L).toDF("id"), "id", 1L)
    val after = mtimes(s"$root/sigs/batch=0") ++ mtimes(s"$root/bands/batch=0")
    assert(before == after, "retire rewrote index data dirs")
    val tombFiles = new java.io.File(s"$root/tombs/batch=1/bucket=0")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(tombFiles == 1, s"expected one tombstone file, got $tombFiles")
    assert(SignatureIndexStore.sigsView(spark, root).count() == 58L)
  }

  test("purge-scale takedown: the ids pin shards and the corpus joins shuffle above the broadcast cap") {
    val base = tmp("purge")
    // tiny corpus: 3 docs inside the purge set, 2 outside. Purge ids are
    // xxhash64 of 0..N-1, so "inside" = hash of a small seed value.
    val inSet = spark.range(3).select(expr("xxhash64(id)").as("doc_id"))
      .collect().map(_.getLong(0)).toSeq
    val corpusRows = inSet.zipWithIndex.map { case (id, i) =>
      (id, s"purged doc number $i with enough words to shingle cleanly")
    } ++ Seq(
      (900001L, "surviving doc one stays in the corpus after the purge"),
      (900002L, "surviving doc two stays in the corpus after the purge"))
    corpusRows.toDF("doc_id", "text")
      .write.parquet(s"$base/accepted/batch=0")
    // a whole-source purge set: 5M hashed ids ≈ 40MB parquet — above
    // TombBroadcastMaxBytes (32MB) and above TombIdsPerBucket x2
    val purge = spark.range(5000000)
      .select(expr("xxhash64(id)").as("id"))
    val journal = s"$base/takedowns"
    Takedown.takedown(spark, purge, "id",
      Takedown.Targets(corpusDir = Some(s"$base/accepted")), journal)
    // the pinned set sharded into >1 file, its bytes exceed the cap
    val idFiles = new java.io.File(s"$journal/td=0/ids").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(idFiles.length >= 2,
      s"5M-id pin funneled into ${idFiles.length} file(s)")
    assert(idFiles.map(_.length).sum > StoreProtocol.TombBroadcastMaxBytes,
      "fixture too small to exercise the shuffle branch")
    // and the delete applied exactly: in-set docs gone, survivors whole
    assert(corpusIds(s"$base/accepted") == Set(900001L, 900002L))
    assert(new java.io.File(s"$journal/td=0/_DONE").exists())
  }

  test("event-time feed: slices expire by TIME under irregular cadence, not by count; replay-safe") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp("ttlwin")
    val input = MemoryStream[(Long, String, Long)]
    val feed = CorpusIngest.eventTimeFeed(
      spark, s"$dir/accepted", "doc_id", "captureMs", ttlMs = 1000L)
    val q = CorpusIngest.streamingIndexed(
      input.toDS().toDF("doc_id", "text", "captureMs"), "doc_id", "text",
      s"$dir/index", s"$dir/accepted", retireFeed = feed)
    def acceptedIds(): Set[Long] =
      CorpusIngest.accepted(spark, s"$dir/accepted")
        .select("doc_id").collect().map(_.getLong(0)).toSet
    try {
      // burst of three quick batches inside one TTL: a COUNT window of 1
      // would be evicting already — time says everything stays
      input.addData(Seq(
        (1L, "the quick brown fox jumps over the lazy dog near the river", 10000L),
        (2L, "a careful study of historical documents reveals many patterns", 10050L)))
      q.processAllAvailable() // batch 0, captures ~10000
      input.addData(Seq(
        (11L, "novel observations about glacier movement and seasonal melt", 10100L)))
      q.processAllAvailable() // batch 1: clock 10050, nothing older than 1s
      input.addData(Seq(
        (21L, "completely unrelated text about cooking pasta with tomatoes", 10900L)))
      q.processAllAvailable() // batch 2: clock 10100, still nothing
      assert(acceptedIds() == Set(1L, 2L, 11L, 21L), acceptedIds().toString)

      // a quiet gap: the next batch's PREVIOUS slices now span the TTL —
      // batches 0 AND 1 expire together (time, not one-per-batch count),
      // batch 2 (10900) stays inside the window
      input.addData(Seq(
        (31L, "fresh arrival after the long quiet gap in the stream", 11500L)))
      q.processAllAvailable() // batch 3: clock 10900 — nothing yet (clock lags one batch)
      input.addData(Seq(
        (41L, "another capture keeps the stream moving well past the gap", 11600L)))
      q.processAllAvailable() // batch 4: clock 11500 → slices 0,1 (10050/10100) expire
      assert(acceptedIds() == Set(21L, 31L, 41L), acceptedIds().toString)

      // replay determinism: re-invoking the feed for batch 4 AFTER its
      // slice rewrites returns the JOURNALED set verbatim
      val replayed = feed(4L)
      assert(replayed.isDefined, "replay lost the journaled retire set")
      assert(replayed.get.collect().map(_.getLong(0)).toSet == Set(1L, 2L, 11L))
      assert(SignatureIndexStore.sigsView(spark, s"$dir/index")
        .select("doc_id").collect().map(_.getLong(0)).toSet ==
        Set(21L, 31L, 41L), "expired docs still live in the standing index")

      // expired content re-submitted is NOT a dup and re-enters under a
      // NEW capture time
      input.addData(Seq(
        (51L, "the quick brown fox jumps over the lazy dog near the river", 11700L)))
      q.processAllAvailable() // batch 5
      assert(acceptedIds() == Set(21L, 31L, 41L, 51L), acceptedIds().toString)
    } finally q.stop()
  }

  test("event-time feed GC: _times metadata stays window-bounded; the clock survives reclamation") {
    val base = tmp("ttlgc")
    val dir = s"$base/accepted"
    def writeSlice(k: Int): Unit =
      (0 until 3).map(i => (k * 10L + i, k * 1000L))
        .toDF("doc_id", "t").write.parquet(s"$dir/batch=$k")
    (0 to 11).foreach(writeSlice)
    val feed = CorpusIngest.eventTimeFeed(spark, dir, "doc_id", "t",
      ttlMs = 2500L)
    // fire 1..12: at firing b the clock is (b-1)*1000, so slice k
    // expires once k <= b-4 — by b=12 slices 0..8 are expired and the
    // contiguous prefix GC must have reclaimed their per-slice pointers
    val fired = (1 to 12).flatMap(b =>
      feed(b.toLong).map(df =>
        df.select("srcBatch").distinct()
          .collect().map(_.getLong(0)).toSet).toSeq)
    assert(fired.flatten.toSet == (0L to 8L).toSet, fired.toString)
    val files = new java.io.File(s"$dir/_times").listFiles().map(_.getName)
    val prefix = scala.io.Source
      .fromFile(s"$dir/_times/_EXPIRED_PREFIX").mkString.trim.toLong
    assert(prefix == 8L, s"prefix $prefix")
    val sidecars = files.filter(_.startsWith("t_batch="))
    assert(sidecars.toSet == Set("t_batch=9", "t_batch=10", "t_batch=11"),
      s"sidecars not window-bounded: ${sidecars.mkString(",")}")
    assert(!files.exists(_.startsWith("expired_batch=")),
      s"expired markers not reclaimed: ${files.mkString(",")}")
    // the clock survives the reclaimed sidecars (_CLOCK pointer): a new
    // slice advances it and slice 9 expires on schedule
    writeSlice(12)
    val next = feed(13L).map(_.select("id").collect()
      .map(_.getLong(0)).toSet)
    assert(next.contains(Set(90L, 91L, 92L)),
      s"post-GC firing wrong: $next")
  }

  test("event-time feed: a lost _CLOCK write is healed from the surviving sidecars") {
    // the sidecar and _CLOCK are two writes; a kill between them leaves
    // a recorded slice the clock never absorbed — and the recording loop
    // skips already-recorded slices. The heal folds surviving sidecars
    // back in, so a late-arrival slice with a SMALLER time cannot drag
    // the clock (and the expiry schedule) backwards.
    val base = tmp("ttlheal")
    val dir = s"$base/accepted"
    // slice 0 carries the NEWEST time (5000), slice 1 a late small one
    Seq((1L, 5000L)).toDF("doc_id", "t").write.parquet(s"$dir/batch=0")
    Seq((2L, 100L)).toDF("doc_id", "t").write.parquet(s"$dir/batch=1")
    val feed = CorpusIngest.eventTimeFeed(spark, dir, "doc_id", "t",
      ttlMs = 1000L)
    assert(feed(1L).isEmpty) // records t_batch=0 + _CLOCK=5000
    // crash shape: the sidecar landed, the clock write did not
    assert(new java.io.File(s"$dir/_times/_CLOCK").delete())
    val fired = feed(2L) // without the heal: clock=100, nothing expires
    assert(fired.isDefined, "lost clock write stalled the expiry schedule")
    assert(fired.get.select("id").collect().map(_.getLong(0)).toSet ==
      Set(2L), "healed clock must expire the late small-time slice")
    assert(scala.io.Source.fromFile(s"$dir/_times/_CLOCK").mkString.trim
      == "5000", "heal must re-persist the recovered clock")
  }

  test("event-time feed: a timestamp timeCol is refused, not silently unit-mismatched") {
    val base = tmp("ttltype")
    val dir = s"$base/accepted"
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-08 00:00:00")))
      .toDF("doc_id", "ts").write.parquet(s"$dir/batch=0")
    val feed = CorpusIngest.eventTimeFeed(spark, dir, "doc_id", "ts",
      ttlMs = 1000L)
    val e = intercept[IllegalArgumentException] { feed(1L) }
    assert(e.getMessage.contains("integral"), e.getMessage)
  }
}
