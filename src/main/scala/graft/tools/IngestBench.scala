package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.CorpusIngest

/** Price the continuous-ingest claim: per-batch cost must be a function
  * of the BATCH, not of the standing corpus — the property that keeps a
  * crawl feeding a 100 TB corpus viable. Runs the same fixed batch
  * (sf0.01 documents, 500 docs) through [[CorpusIngest.ingest]] against
  * signature indexes of growing size (sf0.1-derived, then ×10 and ×100
  * replicas with disjoint ids and perturbed signatures — band keys
  * spread instead of colliding), and reports wall per run. The index is
  * pre-pinned, so the timed section is exactly the per-batch work:
  * gates, within-batch dedup, the cross band join, and the audit counts.
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val batchDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val corpusDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = CorpusIngest.Config()

    val batch = spark.read.parquet(s"$batchDir/documents.parquet")
      .select((col("doc_id") + 900000000L).as("doc_id"), col("text"))
      .localCheckpoint(true)
    val baseIndex = CorpusIngest.signatureIndex(
      spark.read.parquet(s"$corpusDir/documents.parquet"),
      "doc_id", "text", cfg)

    def replicate(times: Int) =
      (0 until times).map { i =>
        baseIndex.select(
          (col("doc_id") + lit(i * 10000000L)).as("doc_id"),
          // perturb replica signatures (keep slot 0) so band keys spread
          // across copies instead of producing times-way collisions
          expr(s"transform(sig, (s, j) -> CASE WHEN j = 0 OR $i = 0" +
            s" THEN s ELSE (s * 31 + $i * 97 + j) % 1000000007 END)")
            .as("sig"))
      }.reduce(_ unionByName _)

    // codegen/JIT warmup: one untimed ingest against the small index
    CorpusIngest.ingest(batch, "doc_id", "text",
      baseIndex.localCheckpoint(true), cfg).accepted.count()

    println("| index rows | ingest wall (s) | accepted |")
    Seq(1, 10, 100).foreach { times =>
      val index = replicate(times).localCheckpoint(true)
      val n = index.count()
      val t0 = System.nanoTime()
      val r = CorpusIngest.ingest(batch, "doc_id", "text", index, cfg)
      val accepted = r.accepted.count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"| $n | $wall%.1f | $accepted |")
    }
    spark.stop()
  }
}
