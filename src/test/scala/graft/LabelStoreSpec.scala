package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Components, LabelStore}

/** Durable standing cluster labels: incremental folds must equal batch
  * CC over the whole pair history, survive replays and mid-write kills,
  * and keep serving after compaction.
  */
class LabelStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_labelstore_").toString +
      "/store"

  private val meta = LabelStore.Meta(buckets = 4)

  private def foldAll(root: String, batches: Seq[Seq[(Long, Long)]]): Unit = {
    import spark.implicits._
    batches.zipWithIndex.foreach { case (p, i) =>
      LabelStore.fold(spark, root, p.toDF("a", "b"), "a", "b",
        batchId = i.toLong + 1, meta)
    }
  }

  private def storeLabels(root: String): Map[Long, Long] =
    LabelStore.labels(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def batchCc(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Components.connectedComponents(pairs.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("three folds equal batch CC over the union (merges + new nodes)") {
    val b1 = Seq((1L, 2L), (10L, 11L), (20L, 21L))
    val b2 = Seq((2L, 10L), (30L, 31L))   // merge {1,2}+{10,11}; new cluster
    val b3 = Seq((11L, 20L), (5L, 31L))   // merge into {1..}; 5 joins {30,31}
    val root = freshRoot()
    foldAll(root, Seq(b1, b2, b3))
    assert(storeLabels(root) == batchCc(b1 ++ b2 ++ b3))
  }

  test("lookup and members answer point queries after merges") {
    import spark.implicits._
    val root = freshRoot()
    foldAll(root, Seq(Seq((1L, 2L), (10L, 11L)), Seq((2L, 10L))))
    val got = LabelStore.lookup(spark, root,
        Seq(11L, 99L).toDF("id"), "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(11L -> 1L), s"got $got") // 99 unknown -> absent
    val mem = LabelStore.members(spark, root,
        Seq(1L).toDF("component"), "component")
      .collect().map(_.getLong(0)).toSet
    assert(mem == Set(1L, 2L, 10L, 11L), s"got $mem")
  }

  test("re-folding the same batch id is idempotent") {
    import spark.implicits._
    val root = freshRoot()
    foldAll(root, Seq(Seq((1L, 2L)), Seq((2L, 3L))))
    val before = storeLabels(root)
    LabelStore.fold(spark, root, Seq((2L, 3L)).toDF("a", "b"), "a", "b",
      batchId = 2L, meta)
    assert(storeLabels(root) == before)
    assert(LabelStore.committedBatches(spark, root) == Seq(1L, 2L))
  }

  test("a kill between delta write and marker replays cleanly") {
    import spark.implicits._
    val root = freshRoot()
    foldAll(root, Seq(Seq((1L, 2L))))
    LabelStore.fold(spark, root, Seq((2L, 5L)).toDF("a", "b"), "a", "b",
      batchId = 2L, meta)
    // simulate the crash: batch 2's marker vanishes, dirs remain
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(root, "_commit_2"), false)
    // uncommitted batch is invisible
    assert(storeLabels(root) == Map(1L -> 1L, 2L -> 1L))
    // replay commits the identical delta
    LabelStore.fold(spark, root, Seq((2L, 5L)).toDF("a", "b"), "a", "b",
      batchId = 2L, meta)
    assert(storeLabels(root) == Map(1L -> 1L, 2L -> 1L, 5L -> 1L))
  }

  test("compaction preserves labels, drops dead-label rows, keeps folding") {
    import spark.implicits._
    val root = freshRoot()
    val bs = Seq(
      Seq((1L, 2L), (10L, 11L)), Seq((2L, 10L)), // label 10 dies
      Seq((20L, 21L)), Seq((3L, 21L)))
    foldAll(root, bs)
    val before = storeLabels(root)
    LabelStore.compact(spark, root, keepNewest = 1)
    assert(LabelStore.compactState(spark, root).map(_._2) == Some(3L))
    assert(storeLabels(root) == before)
    // membership under the dead label 10 is empty after compaction
    val dead = LabelStore.members(spark, root,
        Seq(10L).toDF("component"), "component")
      .collect()
    assert(dead.isEmpty, s"dead label rows survived: ${dead.toSeq}")
    // the loop continues against the compacted store
    LabelStore.fold(spark, root, Seq((11L, 20L)).toDF("a", "b"), "a", "b",
      batchId = 5L, meta)
    assert(storeLabels(root) ==
      batchCc(bs.flatten ++ Seq((11L, 20L))))
    // folding at/below the horizon is refused
    intercept[IllegalArgumentException] {
      LabelStore.fold(spark, root, Seq((1L, 9L)).toDF("a", "b"), "a", "b",
        batchId = 3L, meta)
    }
  }

  test("meta mismatch is refused") {
    import spark.implicits._
    val root = freshRoot()
    foldAll(root, Seq(Seq((1L, 2L))))
    intercept[IllegalArgumentException] {
      LabelStore.fold(spark, root, Seq((3L, 4L)).toDF("a", "b"), "a", "b",
        batchId = 2L, LabelStore.Meta(buckets = 8))
    }
  }

  test("empty pair batch commits and changes nothing") {
    import spark.implicits._
    val root = freshRoot()
    foldAll(root, Seq(Seq((1L, 2L))))
    LabelStore.fold(spark, root,
      Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b", batchId = 2L, meta)
    assert(LabelStore.committedBatches(spark, root) == Seq(1L, 2L))
    assert(storeLabels(root) == Map(1L -> 1L, 2L -> 1L))
  }
}
