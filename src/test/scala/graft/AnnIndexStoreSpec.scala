package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{AnnIndexStore, Similarity}

class AnnIndexStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))
    .localCheckpoint(true)
  private lazy val dim =
    emb.select(size(col("embedding"))).head().getInt(0)

  test("exhaustive probing equals brute-force cosine top-K exactly") {
    val root = java.nio.file.Files.createTempDirectory("graft-ann").toString
    AnnIndexStore.build(spark, root, emb, "vec_id", "embedding", dim,
      numCentroids = 8)
    val queries = emb.filter(col("vec_id") % 100 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // nprobe = all cells → the search is exhaustive; same double-dot
    // kernel on both paths → identical ranking, not approximately equal
    val got = pairs(AnnIndexStore.query(
      spark, root, queries, "vec_id", "embedding", k = 5, nprobe = 8))
    val brute = pairs(Similarity.cosineTopK(
      queries, emb, "vec_id", "embedding", dim, k = 5))
    assert(got == brute, s"diff=${(got diff brute) ++ (brute diff got)}")
  }

  test("append extends the standing index; nprobe=1 prunes to the probed cells") {
    val root = java.nio.file.Files.createTempDirectory("graft-ann2").toString
    AnnIndexStore.build(spark, root, emb, "vec_id", "embedding", dim,
      numCentroids = 8)
    // batch 1: exact copies of every vector under shifted ids — each
    // query's nearest indexed neighbor becomes its own copy (cos = 1)
    AnnIndexStore.append(spark, root,
      emb.select((col("vec_id") + 10000L).as("vec_id"), col("embedding")),
      "vec_id", "embedding", 1L)
    assert(AnnIndexStore.committedBatches(spark, root) == Seq(0L, 1L))
    val queries = emb.filter(col("vec_id") % 250 === 0) // 2 queries
    val res = AnnIndexStore.query(
      spark, root, queries, "vec_id", "embedding", k = 1, nprobe = 1)
    res.collect().foreach { r =>
      // rank-1 neighbor is the planted copy (same cell by construction:
      // identical vector → identical centroid ranking)
      assert(r.getAs[Long]("neighbor_id") ==
        r.getAs[Long]("query_id") + 10000L, r.toString)
      assert(math.abs(r.getAs[Double]("cos") - 1.0) < 1e-9)
    }
    // the scan reads EXPLICIT probed-cell paths: at nprobe=1 with 2
    // queries, at most 2 distinct cell directories appear in the plan
    // (a basePath read would list all 8 cells before pruning)
    val plan = res.queryExecution.executedPlan.toString
    val cellsInPlan = "cell=\\d+".r.findAllIn(plan).toSet
    assert(cellsInPlan.nonEmpty && cellsInPlan.size <= 2,
      s"$cellsInPlan\n${plan.take(3000)}")
  }

  test("size-switched query: broadcast below the probe threshold, shuffle-on-cell above, same results") {
    val root = java.nio.file.Files.createTempDirectory("graft-annsz").toString
    AnnIndexStore.build(spark, root, emb, "vec_id", "embedding", dim,
      numCentroids = 8)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // r17: both bounded-side branches run the per-task top-K KERNEL
    // (Similarity.cellTopKCandidates / indexSideTopKCandidates) instead
    // of a broadcast JOIN — the bounded side rides a TorrentBroadcast
    // (plan-invisible) and the streaming side shows as MapPartitions;
    // no join node may appear. Results must stay exactly the join's.
    val small = AnnIndexStore.query(
      spark, root, queries, "vec_id", "embedding", k = 3, nprobe = 8)
    val smallPairs = pairs(small)
    val smallPlan = small.queryExecution.executedPlan.toString
    assert(smallPlan.contains("MapPartitions"), smallPlan.take(3000))
    assert(!smallPlan.contains("SortMergeJoin"), smallPlan.take(3000))
    // big batch vs SMALL probed index: the INDEX side rides task-local —
    // the probe side keeps its input parallelism instead of collapsing
    // onto <= |cells| shuffle tasks under a coarse quantizer
    val mid = AnnIndexStore.query(
      spark, root, queries, "vec_id", "embedding", k = 3, nprobe = 8,
      broadcastMaxProbes = 0L)
    val midPairs = pairs(mid)
    val midPlan = mid.queryExecution.executedPlan.toString
    assert(midPlan.contains("MapPartitions"), midPlan.take(3000))
    assert(!midPlan.contains("SortMergeJoin"), midPlan.take(3000))
    assert(midPairs == smallPairs,
      s"diff=${(midPairs diff smallPairs) ++ (smallPairs diff midPairs)}")
    // force the batch-scale path (BOTH sides big): nothing broadcast —
    // a day's embeddings re-deduplicated against a 100 TB store would
    // OOM the driver through either broadcast — shuffle on cell,
    // sort-merge join
    val big = AnnIndexStore.query(
      spark, root, queries, "vec_id", "embedding", k = 3, nprobe = 8,
      broadcastMaxProbes = 0L, broadcastMaxIndexBytes = 0L)
    val bigPairs = pairs(big)
    val bigPlan = big.queryExecution.executedPlan.toString
    assert(!bigPlan.contains("BroadcastExchange"), bigPlan.take(3000))
    assert(bigPlan.contains("SortMergeJoin"), bigPlan.take(3000))
    // the per-(query, cell) pre-reduce rides the join's cell partitioning:
    // exactly ONE exchange on each join input, none between the join and
    // the two windows
    assert(bigPairs == smallPairs,
      s"diff=${(bigPairs diff smallPairs) ++ (smallPairs diff bigPairs)}")
  }

  test("rebuild retrains into a fresh root with identical exhaustive answers; _CURRENT flips") {
    val root = java.nio.file.Files.createTempDirectory("graft-annrb").toString
    val newRoot = java.nio.file.Files.createTempDirectory("graft-annrb2").toString
    AnnIndexStore.build(spark, root, emb, "vec_id", "embedding", dim,
      numCentroids = 8)
    // a drifted batch: reversed-component vectors land far from the
    // build-time sample's geometry
    AnnIndexStore.append(spark, root,
      emb.select((col("vec_id") + 10000L).as("vec_id"),
        reverse(col("embedding")).as("embedding")),
      "vec_id", "embedding", 1L)
    val queries = emb.filter(col("vec_id") % 100 === 0)
    def pairs(r: String, nprobe: Int) = AnnIndexStore.query(
      spark, r, queries, "vec_id", "embedding", k = 5, nprobe = nprobe)
      .select("query_id", "neighbor_id", "rn").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    val before = pairs(root, nprobe = 8)

    // retrain with a DIFFERENT cell count: the answers must not move
    // (exhaustive probing is exact on both geometries)
    AnnIndexStore.rebuild(spark, root, newRoot, numCentroids = 12,
      lloydRounds = 2)
    assert(AnnIndexStore.readMeta(spark, newRoot) ==
      Some(AnnIndexStore.Meta(dim, 12)))
    assert(AnnIndexStore.committedBatches(spark, newRoot) == Seq(0L))
    assert(pairs(newRoot, nprobe = 12) == before)
    // the old root is untouched and still serves queries
    assert(pairs(root, nprobe = 8) == before)

    // active-root pointer: resolve → flip → resolve
    val ptr = java.nio.file.Files.createTempDirectory("graft-annptr").toString
    assert(AnnIndexStore.currentRoot(spark, ptr).isEmpty)
    AnnIndexStore.setCurrent(spark, ptr, root)
    assert(AnnIndexStore.currentRoot(spark, ptr) == Some(root))
    AnnIndexStore.setCurrent(spark, ptr, newRoot)
    assert(AnnIndexStore.currentRoot(spark, ptr) == Some(newRoot))
  }

  test("compaction folds batches into one file per cell; queries unchanged") {
    val root = java.nio.file.Files.createTempDirectory("graft-ann3").toString
    AnnIndexStore.build(spark, root, emb, "vec_id", "embedding", dim,
      numCentroids = 8)
    AnnIndexStore.append(spark, root,
      emb.select((col("vec_id") + 10000L).as("vec_id"), col("embedding")),
      "vec_id", "embedding", 1L)
    AnnIndexStore.append(spark, root,
      emb.select((col("vec_id") + 20000L).as("vec_id"), col("embedding")),
      "vec_id", "embedding", 2L)
    val queries = emb.filter(col("vec_id") % 250 === 0)
    def pairs = AnnIndexStore.query(
      spark, root, queries, "vec_id", "embedding", k = 4, nprobe = 8)
      .select("query_id", "neighbor_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val before = pairs
    AnnIndexStore.compact(spark, root) // keeps batch 2 uncompacted
    assert(AnnIndexStore.compactState(spark, root) == Some((0L, 1L)))
    assert(pairs == before)
    assert(!new java.io.File(s"$root/vecs/batch=0").exists())
    assert(!new java.io.File(s"$root/vecs/batch=1").exists())
    val cellDirs = new java.io.File(s"$root/vecs/c0").listFiles()
      .filter(_.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty)
    assert(cellDirs.forall(
      _.listFiles().count(_.getName.startsWith("part-")) == 1))
  }
}
