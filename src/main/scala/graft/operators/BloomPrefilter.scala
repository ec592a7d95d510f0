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
  * False positives only pass extra rows to the exact join; results are
  * identical to the plain semi-join.
  */
object BloomPrefilter {

  /** `large LEFT SEMI JOIN small ON key`, bloom-prefiltered. */
  def semiJoin(
      large: DataFrame, small: DataFrame, key: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val bloom = small.stat.bloomFilter(key, expectedItems, fpp)
    val spark = large.sparkSession
    val bloomBc = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((k: String) =>
      k != null && bloomBc.value.mightContainString(k))
    large
      .filter(mightContain(col(key)))
      .join(small.select(col(key)).distinct(), Seq(key), "left_semi")
  }

  /** Just the prefilter (no exact join) — for pipelines that tolerate the
    * configured false-positive rate in exchange for zero shuffle.
    */
  def approxFilter(
      large: DataFrame, small: DataFrame, key: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val bloom = small.stat.bloomFilter(key, expectedItems, fpp)
    val spark = large.sparkSession
    val bloomBc = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((k: String) =>
      k != null && bloomBc.value.mightContainString(k))
    large.filter(mightContain(col(key)))
  }
}
