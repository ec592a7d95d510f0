package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.CorpusLayout

/** Bucketed-layout economics (PERF_NOTES §"Bucketed corpus layout"):
  * price the CorpusLayout contract — pay one partitioning shuffle at
  * write time, then run every id-keyed join exchange-free — against the
  * plain-parquet layout that re-shuffles BOTH sides on every join.
  *
  * Two N-row tables joined on id, broadcast disabled (the 100 TB shape:
  * neither side fits). Reports write cost and per-join cost for both
  * layouts plus the break-even join count; asserts the joined aggregate
  * is bit-identical across layouts.
  */
object LayoutBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000000L)
    val buckets = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("graft_layoutbench_")
      .toString
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val docs = spark.range(n).select(
      $"id", ($"id" % 1000).cast("long").as("payload"))
    val meta = spark.range(n).select(
      $"id".as("key"), ($"id" % 7).cast("long").as("tag"))

    // plain layout: partitioning is whatever the writer produced
    val (_, wPlain) = timed {
      docs.write.parquet(s"$base/plain_docs")
      meta.write.parquet(s"$base/plain_meta")
    }
    // bucketed layout: hash-partitioned on the join key at write time
    val (_, wBucketed) = timed {
      CorpusLayout.writeBucketed(docs, "lb_docs", s"$base/b_docs",
        "id", buckets, Seq("id"))
      CorpusLayout.writeBucketed(meta, "lb_meta", s"$base/b_meta",
        "key", buckets, Seq("key"))
    }

    def agg(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum($"payload" * $"tag")).collect()(0).getLong(0)

    def joinPlain(): Long = agg(
      spark.read.parquet(s"$base/plain_docs")
        .join(spark.read.parquet(s"$base/plain_meta"), $"id" === $"key"))
    def joinBucketed(): Long = agg(
      CorpusLayout.bucketedJoin(spark, "lb_docs", "lb_meta", "id", "key"))

    // warm both paths once (file listing, codegen), then take the best
    // of 3 — steady-state per-join cost is the quantity bucketing buys
    val first = (joinPlain(), joinBucketed())
    require(first._1 == first._2, s"layouts disagree: $first")
    val plainTimes = (1 to 3).map(_ => timed(joinPlain())._2)
    val bucketedTimes = (1 to 3).map(_ => timed(joinBucketed())._2)
    val jPlain = plainTimes.min
    val jBucketed = bucketedTimes.min
    // joins needed before the bucketed write's extra cost pays for itself
    val breakEven =
      if (jPlain <= jBucketed) Double.PositiveInfinity
      else (wBucketed - wPlain) / (jPlain - jBucketed)

    println(
      s"""{"bench":"layout","n":$n,"buckets":$buckets,""" +
        s""""write_plain_s":${f"$wPlain%.2f"},""" +
        s""""write_bucketed_s":${f"$wBucketed%.2f"},""" +
        s""""join_plain_s":${f"$jPlain%.2f"},""" +
        s""""join_bucketed_s":${f"$jBucketed%.2f"},""" +
        s""""break_even_joins":${f"$breakEven%.1f"}}""")
    spark.stop()
  }
}
