package graft.crawl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.UrlStateMerger

/** Durable frontier storage: the crawl DB as a versioned, pld-bucketed
  * parquet table (SURVEY §2.12/§7.4: at cluster scale the frontier lives
  * as a table, not operator state — "billions of URLs" becomes a storage
  * problem, not a state-backend problem).
  *
  * Layout: `<root>/v<N>/bucket=<b>/part-*.parquet` plus a `_LATEST`
  * pointer file. Each merge writes version N+1 from version N ∪ updates —
  * readers never see a half-written version (the pointer flips last), and
  * failed merges leave the previous version intact (at-least-once, same
  * guarantee the reference offers).
  *
  * Bucketing by pld hash keeps the merge shuffle stable round-over-round
  * and lets per-domain lookups prune to one bucket directory.
  */
object FrontierStore {

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def latestVersion(spark: SparkSession, root: String): Option[Int] = {
    val f = fs(spark, root)
    val ptr = new Path(root, "_LATEST")
    if (!f.exists(ptr)) None
    else {
      val in = f.open(ptr)
      try Some(new String(in.readAllBytes()).trim.toInt)
      finally in.close()
    }
  }

  def read(spark: SparkSession, root: String): Option[DataFrame] =
    latestVersion(spark, root).map { v =>
      spark.read.parquet(s"$root/v$v").drop("bucket")
    }

  /** Merge `updates` (CrawlStateUrl rows) into the stored frontier and
    * commit a new version. Returns the merged frontier.
    */
  def mergeInto(
      spark: SparkSession, root: String, updates: DataFrame,
      buckets: Int = 64): DataFrame = {
    val current = read(spark, root)
    val merged = UrlStateMerger.mergeFrontier(
      current.fold(updates)(c => c.unionByName(updates)))
    val next = latestVersion(spark, root).getOrElse(-1) + 1
    merged
      .withColumn("bucket", pmod(xxhash64(col("pld")), lit(buckets)))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$root/v$next")
    val f = fs(spark, root)
    val out = f.create(new Path(root, "_LATEST"), true)
    try out.write(next.toString.getBytes)
    finally out.close()
    // retire versions older than the previous one (keep N-1 for readers
    // that resolved the pointer just before the flip)
    (0 until next - 1).foreach { old =>
      f.delete(new Path(s"$root/v$old"), true)
    }
    read(spark, root).get
  }

  /** Bucket-pruned per-domain lookup. */
  def domainSlice(
      spark: SparkSession, root: String, pld: String,
      buckets: Int = 64): Option[DataFrame] =
    latestVersion(spark, root).map { v =>
      spark.read.parquet(s"$root/v$v")
        .filter(col("bucket") === pmod(xxhash64(lit(pld)), lit(buckets)) &&
          col("pld") === pld)
        .drop("bucket")
    }
}
