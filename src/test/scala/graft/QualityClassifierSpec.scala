package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QualityClassifier

class QualityClassifierSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val refDocs = Seq(
    "the study presents careful measured analysis of the observed data",
    "historical records describe the treaty and its careful negotiation",
    "the novel explores memory and loss through measured careful prose",
    "experimental results support the analysis presented in prior work")
  private val junkDocs = Seq(
    "click here buy now cheap cheap deals click subscribe",
    "winner winner click claim your prize now now now",
    "cheap pills buy click here subscribe subscribe buy",
    "free free free click now buy cheap claim prize")

  test("train separates reference text from junk and score ranks accordingly") {
    val docs = (refDocs.zipWithIndex.map { case (t, i) => (i.toLong, t, 1.0) } ++
      junkDocs.zipWithIndex.map { case (t, i) => (100L + i, t, 0.0) })
      .toDF("doc_id", "text", "label")
    val model = QualityClassifier.train(
      docs, "doc_id", "text", docs.select("doc_id", "label"), "label",
      hashDim = 1 << 12, epochs = 60, lr = 4.0)
    val scored = QualityClassifier.score(docs, "text", "q", model)
      .select("doc_id", "q").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val refScores = refDocs.indices.map(i => scored(i.toLong))
    val junkScores = junkDocs.indices.map(i => scored(100L + i))
    // full separation on the training set (it is linearly separable)
    assert(refScores.min > junkScores.max,
      s"ref $refScores must all outrank junk $junkScores")
    assert(refScores.min > 0.5 && junkScores.max < 0.5,
      s"decision boundary off: ref min ${refScores.min}, junk max ${junkScores.max}")
  }

  test("score handles empty and null text without throwing") {
    val model = QualityClassifier.Model(new Array[Double](16), 0.0, 16)
    val out = QualityClassifier.score(
      Seq((1L, ""), (2L, "   "), (3L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"),
      "text", "q", model)
      .select("q").collect().map(_.getDouble(0))
    assert(out.forall(_ == 0.5))
  }

  test("score UDF hash agrees with the training-side featurization hash") {
    // one token with weight pinned at its hashed slot: the UDF's
    // byte-folded md5 must land on the same feature id as hash32Sql,
    // or train/score silently diverge
    val dim = 1 << 10
    val tok = "careful"
    val feat = spark.sql(
      s"SELECT pmod(cast(conv(substr(md5('$tok'), 1, 8), 16, 10) as bigint), $dim) AS f")
      .collect()(0).getLong(0).toInt
    val w = new Array[Double](dim); w(feat) = 8.0
    val s = QualityClassifier.score(
      Seq((1L, tok)).toDF("doc_id", "text"), "text", "q",
      QualityClassifier.Model(w, 0.0, dim))
      .select("q").collect()(0).getDouble(0)
    assert(s > 0.99, s"weight at slot $feat not picked up by score UDF: $s")
  }
}
