package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed corpus layout — pay the partitioning shuffle ONCE at write
  * time, then run every id-keyed join and aggregation shuffle-free.
  *
  * A corpus build touches the same join key over and over: dedup drop
  * sets join back on doc id, quality scores join on doc id, embeddings
  * attach on doc id, split assignments join on doc id. At 100 TB each of
  * those is a full-corpus shuffle — unless the corpus (and its sidecar
  * tables) are written BUCKETED on that key: Spark records the hash
  * partitioning in the catalog, and any equi-join or group-by on the
  * bucket column between tables with compatible bucket counts reads the
  * matching buckets side by side with ZERO Exchange in the plan — the
  * corpus-sized cost. (`sortBy` + the one-file-per-bucket layout written
  * here also remove the per-bucket Sort when
  * `spark.sql.legacy.bucketedTableScan.outputOrdering=true`; Spark
  * defaults it off because exposing the ordering makes planning list
  * files. The Sort it saves is in-partition and spill-bounded — the
  * Exchange is the win that matters at 100 TB.) This is the batch
  * twin of the co-partitioned stores ([[SignatureIndexStore]]'s bucket
  * dirs, [[AnnIndexStore]]'s cell dirs): layout chosen at write time so
  * reads never re-shuffle.
  *
  * The reference keys its entire crawl state the same way — PLD-keyed
  * state partitioning (`functions/UrlDBFunction.java:71-77`) so merges
  * and scheduling never cross domains; bucketing is the Spark-native
  * form of that discipline for the batch corpus.
  */
object CorpusLayout {

  /** Write `df` as a bucketed (+ optionally bucket-sorted) table.
    * `path` makes the table external so the data lives where the caller
    * says (object store at scale, tmp in tests), while the bucketing
    * metadata lives in the session catalog. Bucket counts must match
    * across tables that will be joined (`nBuckets` is a layout contract,
    * not a tuning knob — pick once per corpus generation).
    */
  def writeBucketed(
      df: DataFrame, table: String, path: String,
      bucketCol: String, nBuckets: Int,
      sortCols: Seq[String] = Seq.empty): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    // one shuffle so each bucket's rows land in exactly one task — which
    // yields exactly ONE file per bucket. That single-file invariant is
    // what lets the scan expose the sortBy ordering (multi-file buckets
    // force a re-Sort before merge joins) and keeps file count = buckets
    // instead of tasks × buckets.
    val oneFilePerBucket = df.repartition(nBuckets, col(bucketCol))
    val w = oneFilePerBucket.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(nBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Inner-join two bucketed tables on their bucket key. With matching
    * bucket counts the executed plan contains no Exchange (pin with
    * [[graft.plans.PlanChecks]]); with both sides `sortBy`-ed on the key
    * the merge join also skips its Sort. The sides are alias-qualified so
    * the common case — sidecar tables sharing the key NAME (everything in
    * a corpus is keyed `doc_id`) — resolves instead of throwing
    * AMBIGUOUS_REFERENCE; with keyA == keyB the duplicate right-side key
    * column is dropped from the output.
    */
  def bucketedJoin(
      spark: SparkSession, tableA: String, tableB: String,
      keyA: String, keyB: String): DataFrame = {
    val joined = spark.table(tableA).as("a").join(
      spark.table(tableB).as("b"), col(s"a.$keyA") === col(s"b.$keyB"))
    if (keyA == keyB) joined.drop(col(s"b.$keyB")) else joined
  }
}
