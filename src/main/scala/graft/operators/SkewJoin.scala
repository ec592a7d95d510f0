package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated joins. AQE's skew-join handling rebalances sort-merge
  * partitions at runtime, but it cannot help when one side must be
  * replicated (broadcast too big) or when the skew is in a derived key
  * the optimizer has no stats for (hot shingles, hot PLDs — a handful of
  * domains own most of a crawl frontier). Salting makes the hot key
  * shuffle-parallel deterministically: the skewed side scatters over
  * `salts` sub-keys, the other side replicates `salts` times.
  */
object SkewJoin {

  /** Equi-join `skewed ⋈ other ON key` with the skewed side salted and
    * the other side replicated across the salt space. Result equals the
    * plain inner join (row multiplicity included); the hot key's work is
    * spread over `salts` reducers instead of one.
    */
  def saltedInnerJoin(
      skewed: DataFrame, other: DataFrame, key: String,
      salts: Int = 16): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = skewed.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val replicated = other.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    salted
      .join(replicated, Seq(key, "_salt"))
      .drop("_salt")
  }

  /** Left-semi form ("is this URL already in the fetched set") — the other
    * side is deduplicated per salt, so each skewed row matches at most
    * once regardless of multiplicity on the right.
    */
  def saltedLeftSemiJoin(
      skewed: DataFrame, other: DataFrame, key: String,
      salts: Int = 16): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = skewed.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val replicated = other.select(col(key)).distinct()
      .withColumn("_salt", explode(array((0 until salts).map(lit): _*)))
    salted
      .join(replicated, Seq(key, "_salt"), "left_semi")
      .drop("_salt")
  }
}
