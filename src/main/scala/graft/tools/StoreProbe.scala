package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{CorpusIngest, SignatureIndexStore, TextOps}

/** One-off: where does per-batch time go in SignatureIndexStore.matches
  * at the 5M-row point — bands scan, sig fetch, or batch-side work?
  */
object StoreProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = CorpusIngest.Config()
    val meta = SignatureIndexStore.Meta(
      cfg.indexBuckets, cfg.numHashes, cfg.bandSize)

    val baseIndex = CorpusIngest.signatureIndex(
      spark.read.parquet("/root/testdata/sf0.1/documents.parquet"),
      "doc_id", "text", cfg)
    val index = baseIndex
      .crossJoin(spark.range(1000).select(col("id").as("rep")))
      .select(
        (col("doc_id") + col("rep") * 10000000L).as("doc_id"),
        expr("transform(sig, (s, j) -> CASE WHEN j = 0 OR rep = 0" +
          " THEN s ELSE (s * 31 + rep * 97 + j) % 1000000007 END)")
          .as("sig"))
      .repartition(32)
    val root = java.nio.file.Files
      .createTempDirectory("graft-storeprobe").toString
    SignatureIndexStore.append(spark, root, index, 0L, meta)
    println(s"store at $root")

    val batch = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select((col("doc_id") + 900000000L).as("doc_id"), col("text"))
      .localCheckpoint(true)
    val batchSigs = CorpusIngest.signatureIndex(batch, "doc_id", "text", cfg)
      .localCheckpoint(true)

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 3).foreach { round =>
      println(s"round $round")
      val m = time("matches total")(SignatureIndexStore
        .matches(spark, root, batchSigs, cfg.threshold).count())
      println(s"  matched=$m")
      // stage decomposition
      val numBands = meta.numBands
      val batchBands = batchSigs
        .select(col("doc_id").as("new_id"),
          explode(TextOps.bandKeysUdf(numBands, meta.bandSize)(col("sig")))
            .as("band_key"))
        .select(col("new_id"), xxhash64(col("band_key")).as("band_hash"))
        .distinct()
        .localCheckpoint(true)
      println(s"  batch band keys=${batchBands.count()}")
      val bands = spark.read
        .option("basePath", s"$root/bands").parquet(s"$root/bands/batch=0")
      time("bands scan only")(bands.count())
      val cand = time("band join -> cand")(
        bands.join(broadcast(batchBands), Seq("band_hash"))
          .select(col("new_id"), col("doc_id").as("corpus_id")).distinct()
          .localCheckpoint(true))
      println(s"  cand=${cand.count()}")
      val sigs = spark.read
        .option("basePath", s"$root/sigs").parquet(s"$root/sigs/batch=0")
      time("sigs scan only")(sigs.count())
      time("sig fetch join")(
        sigs.join(broadcast(cand),
          sigs("doc_id") === cand("corpus_id")).count())
    }
    spark.stop()
  }
}
