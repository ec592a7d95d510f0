package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.CorpusIngest

/** Steady-state cost probe for the always-on streaming retention feeds
  * ([[CorpusIngest.rollingWindowFeed]] / [[CorpusIngest.eventTimeFeed]])
  * at standing-store scale: N micro-batches of `docsPerBatch` unique
  * docs through `streamingIndexed` with the window armed, recording
  * per-batch wall and the feed's own derivation wall. The properties
  * under test: (1) per-batch cost is FLAT with stream age — the feed
  * derives from the newly-expiring band (one slice in steady state),
  * never the ever-growing expired tail; (2) the feed's share of the
  * batch is small (the derivation is one expiring-slice read + journal
  * write). Prints one JSON line.
  *
  * args: [batches=40] [docsPerBatch=5000] [keepBatches=8] [feed=count|time]
  *       [compactEvery=10] [autoCompact=32 — used when compactEvery=0]
  */
object RollingWindowBench {
  def main(args: Array[String]): Unit = {
    val batches = args.lift(0).map(_.toInt).getOrElse(40)
    val docsPerBatch = args.lift(1).map(_.toInt).getOrElse(5000)
    val keepBatches = args.lift(2).map(_.toInt).getOrElse(8)
    val feedKind = args.lift(3).getOrElse("count")
    val compactEvery = args.lift(4).map(_.toInt).getOrElse(10)
    val autoCompact = args.lift(5).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("graft-rollbench").toString

    // unique, gate-passing docs: id-salted words so nothing dedups away
    def docsFor(b: Int): Seq[(Long, String, Long)] =
      (0 until docsPerBatch).map { i =>
        val id = b.toLong * docsPerBatch + i
        (id,
          s"document body $id carries salted tokens w${id % 977} " +
            s"w${id % 761} w${id % 523} w${id % 331} about topic ${id % 47}",
          // event clock: 1s per batch (used only by the time feed)
          1000000L + b * 1000L + (i % 1000))
      }

    val feedWall = new java.util.concurrent.atomic.AtomicLong(0)
    val inner: Long => Option[org.apache.spark.sql.DataFrame] =
      if (feedKind == "time")
        CorpusIngest.eventTimeFeed(spark, s"$dir/accepted", "doc_id",
          "captureMs", ttlMs = keepBatches * 1000L)
      else
        CorpusIngest.rollingWindowFeed(spark, s"$dir/accepted", "doc_id",
          keepBatches)
    val feed: Long => Option[org.apache.spark.sql.DataFrame] = { b =>
      val t0 = System.nanoTime()
      // materialize the derivation (journal write happens inside); the
      // returned frame is a journal read
      val r = inner(b)
      feedWall.set(System.nanoTime() - t0)
      r
    }

    val input = MemoryStream[(Long, String, Long)]
    val q = CorpusIngest.streamingIndexed(
      input.toDS().toDF("doc_id", "text", "captureMs"), "doc_id", "text",
      s"$dir/index", s"$dir/accepted", retireFeed = feed,
      compactEvery = compactEvery, autoCompactBatches = autoCompact)
    val wall = new Array[Double](batches)
    val feedSec = new Array[Double](batches)
    try {
      (0 until batches).foreach { b =>
        input.addData(docsFor(b))
        val t0 = System.nanoTime()
        q.processAllAvailable()
        wall(b) = (System.nanoTime() - t0) / 1e9
        feedSec(b) = feedWall.get() / 1e9
      }
    } finally q.stop()

    // flatness: compare the steady-state halves (skip the pre-window
    // warmup batches where nothing expires yet)
    val steady = wall.drop(keepBatches + 1)
    def mean(xs: Seq[Double]) = if (xs.isEmpty) 0.0 else xs.sum / xs.size
    val h1 = mean(steady.take(steady.length / 2).toSeq)
    val h2 = mean(steady.drop(steady.length / 2).toSeq)
    val standing = CorpusIngest.accepted(spark, s"$dir/accepted").count()
    println(s"""{"bench":"rolling_window","feed":"$feedKind",""" +
      s""""batches":$batches,"docs_per_batch":$docsPerBatch,""" +
      s""""keep_batches":$keepBatches,"compact_every":$compactEvery,""" +
      s""""auto_compact":$autoCompact,""" +
      s""""standing_docs":$standing,""" +
      f""""batch_first_half_mean_s":$h1%.3f,""" +
      f""""batch_second_half_mean_s":$h2%.3f,""" +
      f""""batch_ratio":${h2 / math.max(h1, 1e-9)}%.3f,""" +
      f""""feed_mean_s":${mean(feedSec.drop(keepBatches + 1).toSeq)}%.3f,""" +
      f""""feed_max_s":${feedSec.drop(keepBatches + 1)
        .maxOption.getOrElse(0.0)}%.3f}""")
    spark.stop()
  }
}
