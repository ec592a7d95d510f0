package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.UrlFunctions
import graft.plans.UrlExpressions

class UrlExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def urls = {
    import spark.implicits._
    Seq(
      "http://www.example.com/a",
      "HTTP://Example.COM:80/x/../y;jsessionid=z?q=1",
      "https://sub.foo.co.uk/path",
      "not a url at all",
      null
    ).toDF("url")
  }

  test("native expressions match the pure Scala functions") {
    val got = urls
      .select(
        col("url"),
        UrlExpressions.url_hash64(col("url")).as("h"),
        UrlExpressions.normalize_url(col("url")).as("n"),
        UrlExpressions.extract_pld(col("url")).as("p"))
      .collect()
    got.foreach { r =>
      Option(r.getAs[String]("url")) match {
        case None =>
          assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
        case Some(u) =>
          assert(r.getAs[Long]("h") == UrlFunctions.urlHash64(u))
          assert(r.getAs[String]("n") == UrlFunctions.normalizeUrl(u))
          assert(r.getAs[String]("p") == UrlFunctions.extractPld(UrlFunctions.normalizeUrl(u))
            || r.getAs[String]("p") == UrlFunctions.extractPld(u))
      }
    }
  }

  test("runtime-registered SQL functions work and codegen survives volume") {
    UrlExpressions.register(spark)
    import spark.implicits._
    // enough rows to force whole-stage codegen paths, not just interpreted
    val n = (1 to 10000).map(i => s"http://d$i.example.com/p$i").toDF("url")
    n.createOrReplaceTempView("urls_native_test")
    val agg = spark.sql(
      """SELECT count(distinct url_hash64_native(url)) AS dh,
        |       count(distinct extract_pld_native(url)) AS dp,
        |       count(normalize_url_native(url)) AS nn
        |FROM urls_native_test""".stripMargin).collect().head
    assert(agg.getAs[Long]("dh") == 10000)
    assert(agg.getAs[Long]("dp") == 1) // all under example.com
    assert(agg.getAs[Long]("nn") == 10000)
  }

  test("minhash_sig_native SQL registration matches the Column/UDF forms") {
    graft.plans.TextExpressions.register(spark)
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "short"),
      (3L, "another document with enough words to shingle nicely"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("mh_native_test")
    val viaSql = spark.sql(
      """SELECT doc_id, minhash_sig_native(text, 3, 16) AS sig
        |FROM mh_native_test""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    val viaUdf = docs.select(col("doc_id"),
      graft.operators.TextOps.minhashSigUdf(3, 16)(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    assert(viaSql == viaUdf)
    assert(viaSql(2L).forall(_ == null), "sub-shingle doc -> all-null sig")
  }

  test("hash distribution: no trivial collisions across a frontier sample") {
    import spark.implicits._
    val n = 50000
    val distinct = (1 to n).map(i => s"http://site$i.com/page$i").toDF("url")
      .select(UrlExpressions.url_hash64(col("url")).as("h"))
      .distinct().count()
    assert(distinct == n)
  }
}
