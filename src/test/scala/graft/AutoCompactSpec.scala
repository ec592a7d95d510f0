package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusIngest, SignatureIndexStore}

/** Auto-compaction inside the streaming ingest loop: with NO manual
  * `compactEvery`, the loop folds the stores once the uncompacted batch
  * count reaches the threshold — and a kill mid-auto-compact (an
  * unflipped `c<gen>` crash leftover) resumes cleanly: the next
  * triggered pass overwrites the partial generation and the standing
  * index answers identically throughout.
  */
class AutoCompactSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def doc(i: Long): (Long, String) =
    (i, s"unique document number $i carrying salted tokens w${i % 977} " +
      s"w${i % 761} w${i % 523} about topic ${i % 47}")

  test("auto-compaction triggers on uncompacted batch count, no knob set") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_autocompact").toString
    val input = MemoryStream[(Long, String)]
    val q = CorpusIngest.streamingIndexed(
      input.toDF().toDF("doc_id", "text"),
      "doc_id", "text", s"$dir/index", s"$dir/accepted",
      autoCompactBatches = 3)
    try {
      (0 until 8).foreach { b =>
        input.addData(Seq(doc(b * 10L), doc(b * 10L + 1)))
        q.processAllAvailable()
      }
      // the pointer advanced without anyone calling compact or setting
      // compactEvery; the uncompacted tail stays below the threshold
      val (gen, upTo) = SignatureIndexStore
        .compactState(spark, s"$dir/index")
        .getOrElse(fail("auto-compaction never ran"))
      assert(gen >= 0 && upTo >= 2, s"gen=$gen upTo=$upTo")
      val uncompacted = graft.util.StoreProtocol
        .committedBatches(spark, s"$dir/index").count(_ > upTo)
      assert(uncompacted < 3, s"$uncompacted uncompacted batches remain")
      // the folded history still blocks a near-dup of an early batch
      input.addData(Seq(
        (900L, doc(0L)._2 + "s"), // near-dup of doc 0 (batch 0, compacted)
        doc(901L)))
      q.processAllAvailable()
    } finally q.stop()
    val accepted = CorpusIngest.accepted(spark, s"$dir/accepted")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!accepted.contains(900L),
      "compacted history failed to block a near-duplicate")
    assert(accepted.contains(901L))
    assert(accepted.size == 17)
  }

  test("guardGate reclaims a gate's fixture dir when the body throws") {
    // temp-dir hygiene for the store-gate queries: a mid-query failure
    // must not strand a multi-GB fixture at sf1 — the failure path
    // deletes, the exception still propagates
    val base = java.nio.file.Files
      .createTempDirectory("graft_guard").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(base, "junk.parquet"), "payload")
    val e = intercept[RuntimeException] {
      graft.queries.TextQueries.guardGate(base) {
        throw new RuntimeException("mid-gate failure")
      }
    }
    assert(e.getMessage == "mid-gate failure")
    assert(!new java.io.File(base).exists(),
      "failed gate stranded its fixture dir")
    // success path: the dir is the BODY's to clean (materializedWith
    // Cleanup) — guardGate must not delete it
    val ok = java.nio.file.Files
      .createTempDirectory("graft_guard_ok").toString
    assert(graft.queries.TextQueries.guardGate(ok)(42) == 42)
    assert(new java.io.File(ok).exists())
    new java.io.File(ok).delete()
  }

  test("kill during auto-compact (unflipped c<gen>) resumes and overwrites") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_autocrash").toString
    val input = MemoryStream[(Long, String)]
    val q = CorpusIngest.streamingIndexed(
      input.toDF().toDF("doc_id", "text"),
      "doc_id", "text", s"$dir/index", s"$dir/accepted",
      autoCompactBatches = 3)
    try {
      (0 until 4).foreach { b =>
        input.addData(Seq(doc(b * 10L), doc(b * 10L + 1)))
        q.processAllAvailable()
      }
      val (gen0, upTo0) = SignatureIndexStore
        .compactState(spark, s"$dir/index").get
      // the kill window, injected between batches: a next-generation
      // compact dir written but never flipped live — garbage content,
      // exactly the on-disk state a killed pass leaves (compact writes
      // c<gen+1> BEFORE the pointer flip; nothing references it until
      // the flip, so a resumed loop must overwrite it, never read it)
      val partial =
        new java.io.File(s"$dir/index/bands/c${gen0 + 1}/bucket=0")
      partial.mkdirs()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(partial.getPath, "part-garbage.parquet"),
        "not parquet at all")
      // push enough batches to trigger the next auto pass over it
      (4 until 8).foreach { b =>
        input.addData(Seq(doc(b * 10L), doc(b * 10L + 1)))
        q.processAllAvailable()
      }
      val (gen1, upTo1) = SignatureIndexStore
        .compactState(spark, s"$dir/index").get
      assert(gen1 > gen0 && upTo1 > upTo0,
        s"auto-compact did not re-trigger over the crash leftover " +
          s"(gen $gen0->$gen1, upTo $upTo0->$upTo1)")
      // the garbage partial was overwritten by the real pass (same-gen
      // overwrite) or superseded entirely; either way no store read
      // ever touches it — the near-dup gate below proves the live
      // generation reads cleanly end to end
      assert(!new java.io.File(
        s"$dir/index/bands/c${gen0 + 1}/bucket=0/part-garbage.parquet")
        .exists() || gen1 > gen0 + 1,
        "crash leftover survived into the live generation")
      input.addData(Seq((900L, doc(10L)._2 + "s"), doc(901L)))
      q.processAllAvailable()
    } finally q.stop()
    val accepted = CorpusIngest.accepted(spark, s"$dir/accepted")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!accepted.contains(900L) && accepted.contains(901L))
  }
}
