package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusIngest

class CorpusIngestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val cfg = CorpusIngest.Config(minTokens = 3, maxRepRatio = 0.9)

  test("one batch: every stage fires on its planted victim, index grows by survivors") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river"),
      (2L, "a careful study of historical documents reveals many patterns")
    ).toDF("doc_id", "text")
    val index = CorpusIngest.signatureIndex(corpus, "doc_id", "text", cfg)
      .localCheckpoint(true)
    assert(index.count() == 2)

    val batch = Seq(
      (10L, "xx"), // gate: under the token floor
      (11L, "completely novel sentences about astronomy and tidal forces"),
      (12L, "completely novel sentences about astronomy and tidal forces"),
      // ^ exact dup of 11 within the batch (keep 11)
      (13L, "the quick brown fox jumps over the lazy dog near the ocean"),
      // ^ near-dup of CORPUS doc 1 -> cross dedup drops it
      (14L, "entirely different content discussing gardening and soil health"),
      (15L, "entirely different content discussing gardening and soil health today")
      // ^ near-dup of 14 WITHIN the batch (append-one-token, jaccard
      //   ~0.86 — safely above the 0.5 estimator cut; keep 14)
    ).toDF("doc_id", "text")

    val r = CorpusIngest.ingest(batch, "doc_id", "text", index, cfg)
    val ids = r.accepted.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(11L, 14L), s"accepted $ids; audit=${r.audit}")

    val audit = r.audit.toMap
    assert(audit("input") == 6L)
    assert(audit("gates") == 5L, r.audit.toString)       // -10
    assert(audit("exact_dedup") == 4L, r.audit.toString) // -12
    assert(audit("batch_dedup") == 3L, r.audit.toString) // -15
    assert(audit("cross_dedup") == 2L, r.audit.toString) // -13
    assert(r.updatedIndex.count() == 4) // 2 corpus + 2 accepted
  }

  test("second batch dedups against FIRST batch's survivors via the updated index") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river")
    ).toDF("doc_id", "text")
    val index0 = CorpusIngest.signatureIndex(corpus, "doc_id", "text", cfg)
      .localCheckpoint(true)
    val b1 = Seq(
      (20L, "fresh reporting on municipal budgets and local road repairs")
    ).toDF("doc_id", "text")
    val r1 = CorpusIngest.ingest(b1, "doc_id", "text", index0, cfg)
    assert(r1.accepted.count() == 1)
    val index1 = r1.updatedIndex.localCheckpoint(true)

    val b2 = Seq(
      // near-dup of batch-1 doc 20 — only the UPDATED index knows it
      (30L, "fresh reporting on municipal budgets and local road closures"),
      (31L, "unrelated notes on deep sea exploration and pressure hulls")
    ).toDF("doc_id", "text")
    val r2 = CorpusIngest.ingest(b2, "doc_id", "text", index1, cfg)
    val ids = r2.accepted.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(31L), s"accepted $ids; audit=${r2.audit}")
    // the stale index would have admitted 30: prove the index update is
    // what blocked it
    val stale = CorpusIngest.ingest(b2, "doc_id", "text", index0, cfg)
    val staleIds = stale.accepted.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(staleIds == Set(30L, 31L), staleIds.toString)
  }

  test("streaming loop: micro-batches thread the durable index, dedup across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    val input = MemoryStream[(Long, String)]
    val q = CorpusIngest.streaming(
      input.toDF().toDF("doc_id", "text"),
      "doc_id", "text", s"$dir/index", s"$dir/accepted", cfg)
    try {
      input.addData(Seq(
        (1L, "the quick brown fox jumps over the lazy dog near the river"),
        (2L, "a careful study of historical documents reveals many patterns")))
      q.processAllAvailable()
      input.addData(Seq(
        // near-dup of batch-0's doc 1: the durable index must block it
        (10L, "the quick brown fox jumps over the lazy dog near the rivers"),
        (11L, "novel observations about glacier movement and seasonal melt")))
      q.processAllAvailable()
    } finally q.stop()
    val accepted = spark.read.parquet(s"$dir/accepted")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(accepted == Set(1L, 2L, 11L), accepted.toString)
    // latest index version carries exactly the accepted docs' signatures
    val latest = new java.io.File(s"$dir/index").listFiles()
      .map(_.getName).filter(_.startsWith("v="))
      .map(_.stripPrefix("v=").toLong).max
    val idx = spark.read.parquet(s"$dir/index/v=$latest")
    assert(idx.count() == 3)
  }
}
