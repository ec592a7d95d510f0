package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Fixed-point embedding outlier pruning: per-stratum integer centroid,
  * integer squared-L2 distances, exact discrete-quantile fence.
  */
class EmbeddingOutlierSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def run(
      rows: Seq[(Long, Int, Seq[Float])], pNum: Int, pDen: Int) = {
    import spark.implicits._
    Similarity.embeddingOutliers(
      rows.toDF("vec_id", "label", "embedding"),
      "vec_id", "embedding", "label", pNum, pDen)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
  }

  test("a planted far point is the outlier; the tight cluster is kept") {
    // 19 vectors near (1,0,0,0), one at (-1,0,0,0): with pDen=20 the
    // fence admits exactly the 19 near points
    val near = (1L to 19L).map(i =>
      (i, 0, Seq(1.0f, (i % 3) * 0.01f, 0.0f, 0.0f)))
    val far = Seq((99L, 0, Seq(-1.0f, 0.0f, 0.0f, 0.0f)))
    val got = run(near ++ far, pNum = 1, pDen = 20)
    assert(got.length == 20)
    val flagged = got.filter(_._4).map(_._1).toSet
    assert(flagged == Set(99L))
    // the outlier's distance strictly dominates every kept distance
    val worstKept = got.filterNot(_._4).map(_._3).max
    assert(got.find(_._1 == 99L).get._3 > worstKept)
  }

  test("flagged fraction is bounded by pNum/pDen in every stratum") {
    val rng = new scala.util.Random(7)
    val rows = (1L to 300L).map { i =>
      val label = (i % 3).toInt
      (i, label, Seq.fill(8)(rng.nextFloat() * 2 - 1))
    }
    val got = run(rows, pNum = 1, pDen = 10)
    got.groupBy(_._2).foreach { case (_, members) =>
      val flagged = members.count(_._4)
      assert(flagged * 10 <= members.length,
        s"flagged $flagged of ${members.length}")
    }
    assert(got.exists(_._4)) // the gate actually fires somewhere
  }

  test("ties exactly on the fence are kept (strict-greater outliers)") {
    // stratum of 4 identical vectors: all distances equal the fence, so
    // nothing can be flagged no matter the fraction
    val rows = (1L to 4L).map(i => (i, 0, Seq(0.5f, -0.5f, 0.25f)))
    val got = run(rows, pNum = 1, pDen = 4)
    assert(got.forall(!_._4))
    assert(got.map(_._3).distinct.length == 1)
  }

  test("strata are independent: a point ordinary in its own stratum " +
    "is not judged by another's geometry") {
    val a = (1L to 10L).map(i => (i, 0, Seq(1.0f, 0.0f)))
    // stratum 1 lives far from stratum 0 but is internally tight
    val b = (11L to 20L).map(i => (i, 1, Seq(-100.0f, 0.0f)))
    val got = run(a ++ b, pNum = 1, pDen = 5)
    assert(got.forall(!_._4)) // every point sits ON its centroid fence
  }
}
