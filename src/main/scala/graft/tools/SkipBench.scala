package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.DataSkipping
import graft.operators.DataSkipping.ColRange

/** Data-skipping economics (PERF_NOTES §"Z-order + file skipping"):
  * price the [[DataSkipping]] contract at bench scale — pay one
  * clustering shuffle + a metadata-only footer sweep at write time, then
  * answer selective multi-column rectangles opening a handful of files.
  *
  * Three layouts over the same N-row (x, y, payload) table:
  *   - plain (writer order) — the baseline every query full-scans;
  *   - linear (sorted on x only) — skips on x, can't skip on y;
  *   - z-order on (x, y) — skips on both.
  * Reports write cost, per-query wall, and files opened for a 5%×5%
  * rectangle and a 5% y-band; asserts all layouts return identical
  * answers. The files-opened column is the number that matters at
  * 100 TB — wall time at bench scale is dominated by fixed job overhead,
  * while files opened IS the scan cost once files are object-store
  * objects.
  */
object SkipBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val nFiles = args.lift(1).map(_.toInt).getOrElse(256)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("graft_skipbench_")
      .toString
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // x, y spread independently over [0, 10000): x cycles fast (id mod),
    // y varies with the slow digits (id div), so (x, y) covers the plane
    // as a grid rather than a 1-D manifold
    val df = spark.range(n).select(
      ($"id" % 10000L).as("x"),
      expr("((id div 10000) * 7919) % 10000").as("y"),
      $"id".as("payload"))

    val (_, wPlain) = timed {
      df.repartition(nFiles).write.parquet(s"$base/plain")
    }
    val (_, wLinear) = timed {
      df.repartitionByRange(nFiles, $"x").sortWithinPartitions("x")
        .write.parquet(s"$base/linear")
      DataSkipping.writeStats(spark, s"$base/linear", Seq("x", "y"))
    }
    val (_, wZ) = timed {
      DataSkipping.writeZOrdered(df, s"$base/z", Seq("x", "y"), nFiles)
    }

    val rect = Seq(ColRange("x", 2000, 2499), ColRange("y", 7000, 7499))
    val band = Seq(ColRange("y", 7000, 7499))
    def fullScan(ranges: Seq[ColRange]): (Long, Long) = {
      val d = ranges.foldLeft(spark.read.parquet(s"$base/plain")) {
        (d, r) => d.filter(col(r.col).between(r.lo, r.hi))
      }
      val row = d.agg(count(lit(1)), sum($"payload")).head()
      (row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1))
    }
    def skipped(dir: String, ranges: Seq[ColRange]): ((Long, Long), Int) = {
      val (d, info) = DataSkipping.prunedRead(spark, dir, ranges)
      val row = d.agg(count(lit(1)), sum($"payload")).head()
      ((row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1)),
        info.filesRead)
    }

    // warm (listing, codegen), assert identical answers across layouts
    val expRect = fullScan(rect)
    val expBand = fullScan(band)
    require(skipped(s"$base/linear", rect)._1 == expRect)
    require(skipped(s"$base/z", rect)._1 == expRect)
    require(skipped(s"$base/linear", band)._1 == expBand)
    require(skipped(s"$base/z", band)._1 == expBand)

    def best3[T](f: => T): Double = (1 to 3).map(_ => timed(f)._2).min
    // one measurement protocol for every (layout, ranges) cell
    def measure(dir: String, rs: Seq[ColRange]): (Double, Int) =
      (best3(skipped(dir, rs)), skipped(dir, rs)._2)
    val tFullRect = best3(fullScan(rect))
    val (tLinRect, fLinRect) = measure(s"$base/linear", rect)
    val (tZRect, fZRect) = measure(s"$base/z", rect)
    val tFullBand = best3(fullScan(band))
    val (tLinBand, fLinBand) = measure(s"$base/linear", band)
    val (tZBand, fZBand) = measure(s"$base/z", band)

    println(
      s"""{"bench":"skip","n":$n,"files":$nFiles,""" +
        s""""write_plain_s":${f"$wPlain%.2f"},""" +
        s""""write_linear_s":${f"$wLinear%.2f"},""" +
        s""""write_z_s":${f"$wZ%.2f"},""" +
        s""""rect_full_s":${f"$tFullRect%.2f"},""" +
        s""""rect_linear_s":${f"$tLinRect%.2f"},"rect_linear_files":$fLinRect,""" +
        s""""rect_z_s":${f"$tZRect%.2f"},"rect_z_files":$fZRect,""" +
        s""""band_full_s":${f"$tFullBand%.2f"},""" +
        s""""band_linear_s":${f"$tLinBand%.2f"},"band_linear_files":$fLinBand,""" +
        s""""band_z_s":${f"$tZBand%.2f"},"band_z_files":$fZBand}""")
    spark.stop()
  }
}
