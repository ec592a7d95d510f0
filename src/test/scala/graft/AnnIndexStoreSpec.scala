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
