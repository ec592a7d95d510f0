package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 90% of rows share one hot key, like a mega-domain in a frontier
  private lazy val skewed = (0 until 2000).map { i =>
    (if (i % 10 == 0) s"d$i.com" else "hot.com", i)
  }.toDF("pld", "payload")
  private lazy val dim = Seq(
    ("hot.com", "A"), ("d10.com", "B"), ("d20.com", "C"), ("cold.com", "Z")
  ).toDF("pld", "tag")

  test("salted inner join equals the plain inner join, multiplicity included") {
    val plain = skewed.join(dim, Seq("pld"))
      .groupBy("pld", "tag").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val salted = SkewJoin.saltedInnerJoin(skewed, dim, "pld", salts = 8)
      .groupBy("pld", "tag").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("salted semi join equals the plain semi join even with dup dim rows") {
    val dupDim = dim.union(dim) // duplicated right side
    val plain = skewed.join(dupDim, Seq("pld"), "left_semi")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    val salted = SkewJoin.saltedLeftSemiJoin(skewed, dupDim, "pld", salts = 8)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(salted == plain)
    assert(salted.count(_._1 == "hot.com") == 1800)
  }

  test("the hot key actually spreads across salt partitions") {
    val salted = skewed.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(8)).cast("int"))
    val spread = salted.filter(col("pld") === "hot.com")
      .groupBy("_salt").count().collect()
    assert(spread.length == 8, "hot key must land in every salt bucket")
    assert(spread.map(_.getLong(1)).max < 1800, "no bucket owns the hot key")
  }
}
