package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Hot-shingle fan-out benchmark (PERF_NOTES §"Hot-shingle skew guard"):
  * proves the default doc-frequency cap in [[TextOps.ngramJaccardPairs]]
  * bounds the shingle self-join's pair fan-out on a skewed corpus — the
  * web-scale failure shape where one boilerplate phrase (navigation text,
  * cookie banner) appears in a large fraction of all documents and its
  * join bucket alone fans out quadratically.
  *
  * Synthesis: N docs, 20% share a 5-token boilerplate phrase (3 shingles
  * at 20% doc frequency, each fanning out to C(N/5, 2) pairs when
  * unguarded); ~1% of docs are genuine near-dup pairs the dedup must keep
  * finding. Prints one JSON line with analytic fan-outs and wall times.
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val hot = "click here to subscribe now"
    // doc i ≡ 1 (mod 100) is a near-dup of doc i-1: it copies the first 7
    // filler tokens and changes the last, so genuine near-dup pairs exist
    // for the guarded path to keep finding
    val base = when($"id" % 100 === 1, $"id" - 1).otherwise($"id")
    val filler = ('a' to 'g').map(ch => concat(lit("u"), base, lit(ch.toString))) :+
      concat(lit("u"), $"id", lit("h"))
    val docs = spark.range(n).select(
      $"id".as("doc_id"),
      concat_ws(" ",
        when($"id" % 5 === 0, hot).otherwise("") +: filler: _*).as("text"))
      .localCheckpoint(true)

    // analytic join fan-out: sum over shingle buckets of c*(c-1)/2
    def fanout(capped: Boolean): Long = {
      val counts = docs
        .select(explode(TextOps.shingleUdf(3)($"text")).as("s"))
        .groupBy("s").count()
      val cap = math.max(1L, (n * 0.1).toLong)
      val kept = if (capped) counts.filter($"count" <= cap) else counts
      kept.agg(coalesce(sum(expr("count * (count - 1) DIV 2")), lit(0L)))
        .first().getLong(0)
    }

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val exactFanout = fanout(capped = false)
    val guardedFanout = fanout(capped = true)
    val (guardedPairs, guardedSec) = time {
      TextOps.ngramJaccardPairs(docs, "doc_id", "text", k = 3,
        threshold = 0.5).count()
    }
    val (exactPairs, exactSec) = time {
      TextOps.ngramJaccardPairs(docs, "doc_id", "text", k = 3,
        threshold = 0.5, maxDocFrequency = None).count()
    }

    println(s"""{"bench":"skew_guard","docs":$n,""" +
      s""""exact_fanout":$exactFanout,"guarded_fanout":$guardedFanout,""" +
      s""""exact_sec":$exactSec,"guarded_sec":$guardedSec,""" +
      s""""exact_pairs":$exactPairs,"guarded_pairs":$guardedPairs}""")
    spark.stop()
  }
}
