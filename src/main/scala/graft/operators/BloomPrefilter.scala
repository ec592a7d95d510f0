package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate-membership prefilter (reference ships an unused
  * …/flinkcrawler/utils/BloomFilter.java:74-130; SURVEY §2.7 maps it to
  * Spark's built-in sketch support). Builds a bloom filter over the join
  * keys of the small side and drops definite non-members from the large
  * side *before* the shuffle — the classic way to cut a semi-join's
  * shuffle volume when the large side is mostly misses (e.g. "which of
  * these 10B candidate URLs are already in the 100M-row fetched set").
  *
  * The key is canonicalized to its string form on BOTH the build and the
  * probe side — `stat.bloomFilter` hashes values by their native type, so
  * building from longs and probing strings would silently drop every
  * true member. One representation everywhere makes the filter correct
  * for any key type.
  *
  * False positives only pass extra rows to the exact join; results are
  * identical to the plain semi-join.
  */
object BloomPrefilter {

  /** Just the prefilter (no exact join) — for pipelines that tolerate the
    * configured false-positive rate in exchange for zero shuffle.
    */
  def approxFilter(
      large: DataFrame, small: DataFrame, key: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    // align the small side to the LARGE side's key type before
    // stringifying, so both sides stringify through one representation
    // even when the columns differ (INT 7 vs DOUBLE 7.0 would otherwise
    // build "7" but probe "7.0"); a lossy cast can only manufacture
    // false positives, which the exact join removes
    val bloom = small
      .select(col(key).cast(large.schema(key).dataType).cast("string").as(key))
      .stat.bloomFilter(key, expectedItems, fpp)
    val bloomBc = large.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((k: String) =>
      k != null && bloomBc.value.mightContainString(k))
    large.filter(mightContain(col(key).cast("string")))
  }

  /** `large LEFT SEMI JOIN small ON key`, bloom-prefiltered. */
  def semiJoin(
      large: DataFrame, small: DataFrame, key: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame =
    approxFilter(large, small, key, expectedItems, fpp)
      .join(small.select(col(key)).distinct(), Seq(key), "left_semi")
}
