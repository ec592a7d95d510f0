package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.CorpusLayout

/** Bucketed layout: the write-once shuffle contract. The join between
  * two tables bucketed (and bucket-sorted) on their join key must execute
  * with ZERO Exchange and zero Sort — that plan shape IS the operator's
  * value at 100 TB, so it is pinned here against the executed plan.
  */
class CorpusLayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def freshNames(): (String, String, String) = {
    val tag = java.util.UUID.randomUUID.toString.replace("-", "")
    val base = java.nio.file.Files
      .createTempDirectory("graft_layout_spec_").toString
    (s"layout_a_$tag", s"layout_b_$tag", base)
  }

  private def writeSides(
      ta: String, tb: String, base: String, n: Int, buckets: Int): Unit = {
    import spark.implicits._
    CorpusLayout.writeBucketed(
      (0 until n).map(i => (i.toLong, s"d$i")).toDF("id", "payload"),
      ta, s"$base/a", "id", buckets, Seq("id"))
    CorpusLayout.writeBucketed(
      (0 until n).map(i => (i.toLong, i % 7)).toDF("key", "tag"),
      tb, s"$base/b", "key", buckets, Seq("key"))
  }

  test("bucketed join: no Exchange, values correct") {
    val (ta, tb, base) = freshNames()
    writeSides(ta, tb, base, n = 1000, buckets = 4)
    // forbid broadcast so the no-shuffle claim is about BUCKETING, not
    // about the small side fitting in a broadcast
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = CorpusLayout.bucketedJoin(spark, ta, tb, "id", "key")
      val rows = j.collect()
      assert(rows.length == 1000)
      val whole = j.queryExecution.executedPlan.toString
      // AQE prints "== Final Plan ==" then "== Initial Plan =="; judge
      // the final (executed) section only
      val plan = whole.split("== Initial Plan ==").head
      assert(!plan.contains("Exchange"), s"bucketed join shuffled:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("same-name keys (the doc_id sidecar shape) resolve and stay " +
    "exchange-free; the duplicate key column is dropped") {
    import spark.implicits._
    val (ta, tb, base) = freshNames()
    CorpusLayout.writeBucketed(
      (0 until 500).map(i => (i.toLong, s"d$i")).toDF("doc_id", "payload"),
      ta, s"$base/a", "doc_id", 4, Seq("doc_id"))
    CorpusLayout.writeBucketed(
      (0 until 500).map(i => (i.toLong, i % 5)).toDF("doc_id", "quality"),
      tb, s"$base/b", "doc_id", 4, Seq("doc_id"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = CorpusLayout.bucketedJoin(spark, ta, tb, "doc_id", "doc_id")
      assert(j.columns.toSeq == Seq("doc_id", "payload", "quality"))
      assert(j.count() == 500)
      val plan = j.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(!plan.contains("Exchange"), s"bucketed join shuffled:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("sorted-scan conf also drops the per-bucket Sort (one file/bucket)") {
    val (ta, tb, base) = freshNames()
    writeSides(ta, tb, base, n = 1000, buckets = 4)
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val key = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(key, "true")
      val j = CorpusLayout.bucketedJoin(spark, ta, tb, "id", "key")
      assert(j.collect().length == 1000)
      val plan = j.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(!plan.contains("Exchange"), s"shuffled:\n$plan")
      assert(!plan.contains(" Sort ["), s"re-sorted:\n$plan")
    } finally {
      spark.conf.set(key, "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
    }
  }

  test("group-by on the bucket key also runs exchange-free") {
    val (ta, _, base) = freshNames()
    import spark.implicits._
    CorpusLayout.writeBucketed(
      (0 until 500).map(i => (i.toLong % 50, i.toLong)).toDF("id", "v"),
      ta, s"$base/a", "id", 4)
    val agg = spark.table(ta).groupBy("id").agg(sum("v").as("s"))
    val n = agg.collect().length
    assert(n == 50)
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed agg shuffled:\n$plan")
  }

  test("mismatched bucket counts fall back to a correct (shuffled) join") {
    val (ta, tb, base) = freshNames()
    import spark.implicits._
    CorpusLayout.writeBucketed(
      (0 until 100).map(i => (i.toLong, i)).toDF("id", "x"),
      ta, s"$base/a", "id", 4)
    CorpusLayout.writeBucketed(
      (0 until 100).map(i => (i.toLong, i)).toDF("key", "y"),
      tb, s"$base/b", "key", 3)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = CorpusLayout.bucketedJoin(spark, ta, tb, "id", "key")
      assert(j.collect().length == 100) // correctness survives the mismatch
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("nBuckets is validated") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      CorpusLayout.writeBucketed(
        Seq((1L, "x")).toDF("id", "p"), "layout_bad", "/tmp/never", "id", 0)
    }
  }
}
