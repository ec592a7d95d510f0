package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{CorpusIngest, SignatureIndexStore}

/** Price the continuous-ingest claim: per-batch cost must be a function
  * of the BATCH, not of the standing corpus — the property that keeps a
  * crawl feeding a 100 TB corpus viable. Runs the same fixed batch
  * (sf0.01 documents, 500 docs) through both layouts against standing
  * indexes of growing size (sf0.1-derived, then ×10 and ×100 replicas
  * with disjoint ids and perturbed signatures — band keys spread instead
  * of colliding):
  *
  *  - `in-memory`: [[CorpusIngest.ingest]] against a pinned index frame
  *    — re-explodes the index's band keys per batch (the cost the old
  *    `v=`-versioned streaming layout pays, BEFORE its index-sized
  *    rewrite).
  *  - `bucketed store`: [[CorpusIngest.ingestIndexed]] against a durable
  *    [[SignatureIndexStore]] — pre-exploded bands, bucket-pruned scans,
  *    batch-side broadcasts, batch-sized append. The number that must
  *    stay FLAT as the index grows.
  *
  * Store builds are untimed (they are the standing corpus, amortized over
  * its life); the timed section is exactly the per-batch work including
  * the survivors' append.
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
    val meta = SignatureIndexStore.Meta(
      cfg.indexBuckets, cfg.numHashes, cfg.bandSize)

    val batch = spark.read.parquet(s"$batchDir/documents.parquet")
      .select((col("doc_id") + 900000000L).as("doc_id"), col("text"))
      .localCheckpoint(true)
    val baseIndex = CorpusIngest.signatureIndex(
      spark.read.parquet(s"$corpusDir/documents.parquet"),
      "doc_id", "text", cfg)

    def replicate(times: Int) = baseIndex
      .crossJoin(spark.range(times).select(col("id").as("rep")))
      .select(
        (col("doc_id") + col("rep") * 10000000L).as("doc_id"),
        // perturb replica signatures (keep slot 0) so band keys spread
        // across copies instead of producing times-way collisions
        expr("transform(sig, (s, j) -> CASE WHEN j = 0 OR rep = 0" +
          " THEN s ELSE (s * 31 + rep * 97 + j) % 1000000007 END)")
          .as("sig"))
      .repartition(32)

    // codegen/JIT warmup: one untimed run of each layout at the base size
    CorpusIngest.ingest(batch, "doc_id", "text",
      baseIndex.localCheckpoint(true), cfg).accepted.count()
    locally {
      val root = java.nio.file.Files
        .createTempDirectory("graft-ingestbench-warm").toString
      SignatureIndexStore.append(spark, root, baseIndex, 0L, meta)
      CorpusIngest.ingestIndexed(batch, "doc_id", "text", root, 1L, cfg)
        ._1.count()
    }

    println("| index rows | in-memory ingest (s) | bucketed store (s) | accepted |")
    Seq(1, 10, 100, 1000).foreach { times =>
      val index = replicate(times).localCheckpoint(true)
      val n = index.count()

      val t0 = System.nanoTime()
      val r = CorpusIngest.ingest(batch, "doc_id", "text", index, cfg)
      val accepted = r.accepted.count()
      val wallMem = (System.nanoTime() - t0) / 1e9

      // durable store seeded with the same index (untimed — the standing
      // corpus, amortized over its life)
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-ingestbench-$times").toString
      SignatureIndexStore.append(spark, root, index, 0L, meta)
      val t1 = System.nanoTime()
      val (acceptedDf, _) = CorpusIngest.ingestIndexed(
        batch, "doc_id", "text", root, 1L, cfg)
      val acceptedStore = acceptedDf.count()
      val wallStore = (System.nanoTime() - t1) / 1e9
      require(acceptedStore == accepted,
        s"layouts disagree: store=$acceptedStore mem=$accepted")

      println(f"| $n | $wallMem%.1f | $wallStore%.1f | $accepted |")

      // trickle arm at the largest store: the standing-index LOOKUP for
      // a 10-doc batch (the steady-state continuous-ingest shape) —
      // bucket pruning + batch-side broadcasts price it near a point
      // lookup; the full per-batch wall above is job-count-bound, not
      // index-bound (audit checkpoints cost ~20 fixed-overhead jobs)
      if (times == 1000) {
        val trickleSigs = CorpusIngest.signatureIndex(
          batch.limit(10), "doc_id", "text", cfg).localCheckpoint(true)
        val t2 = System.nanoTime()
        val m = SignatureIndexStore.matches(
          spark, root, trickleSigs, cfg.threshold).count()
        println(f"| 10-doc lookup vs $n (matches only) | - | " +
          f"${(System.nanoTime() - t2) / 1e9}%.1f | $m matched |")
      }
    }
    spark.stop()
  }
}
