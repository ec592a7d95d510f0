package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Components

/** Hash-min connected components: the pairs→clusters step of every dedup
  * pipeline (cluster id = min id in the transitive group).
  */
class ComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Components.connectedComponents(pairs.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chains, cliques and isolated pairs cluster to their min id") {
    val got = cc(Seq(
      (1L, 2L), (2L, 3L),           // chain: {1,2,3}
      (10L, 11L), (10L, 12L), (11L, 12L), // clique: {10,11,12}
      (20L, 21L)))                  // pair: {20,21}
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("long path converges (propagation crosses the full diameter)") {
    // a 12-hop path: hash-min needs ~diameter rounds; the min label (100)
    // must reach the far end
    val path = (100L until 112L).map(i => (i, i + 1))
    val got = cc(path)
    assert(got.values.toSet == Set(100L))
    assert(got.keySet == (100L to 112L).toSet)
  }

  test("checkpoint cadence changes neither labels nor the reported round count") {
    import spark.implicits._
    // a path (deep diameter), a clique, and an isolated pair — exercises
    // mid-superstep convergence, exact-boundary convergence, and round
    // counts that are not multiples of the cadence
    val pairs = ((100L until 112L).map(i => (i, i + 1)) ++
      Seq((1L, 2L), (1L, 3L), (2L, 3L), (50L, 51L))).toDF("a", "b")
    val results = Seq(1, 2, 3, 7).map { k =>
      val (labels, rounds) = Components.connectedComponentsWithStats(
        pairs, "a", "b", checkpointEvery = k)
      (labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap, rounds)
    }
    assert(results.map(_._1).distinct.size == 1,
      s"labels differ across cadences")
    assert(results.map(_._2).distinct.size == 1,
      s"round counts differ across cadences: ${results.map(_._2)}")
  }

  test("round count: diameter-bounded on paths, observed probe matches") {
    import spark.implicits._
    // 12-hop path: needs ~log/diameter rounds, must report them honestly
    val path = (100L until 112L).map(i => (i, i + 1))
    val (labels, rounds) = Components.connectedComponentsWithStats(
      path.toDF("a", "b"), "a", "b")
    assert(labels.collect().map(_.getLong(1)).toSet == Set(100L))
    // hash-min on a 12-edge path: strictly more than 2, bounded by
    // diameter+1 (the +1 is the fixpoint-confirming round)
    assert(rounds > 2 && rounds <= 13, s"rounds=$rounds")
    // clique: one propagation round + one confirming round
    val (_, r2) = Components.connectedComponentsWithStats(
      Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("a", "b"), "a", "b")
    assert(r2 == 2, s"clique rounds=$r2")
  }

  test("round count on the sf0.1 LSH candidate graph stays <= 4") {
    // the scale claim the dedup family rests on: LSH band buckets emit
    // clique-like clusters whose diameter does not grow with the corpus,
    // so the CC iteration budget is O(few) rounds at any SF
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val pairs = graft.operators.TextOps.minhashCandidates(
      docs, "doc_id", "text", shingleK = 3, numHashes = 16, bandSize = 4)
    val (labels, rounds) = Components.connectedComponentsWithStats(
      pairs, "id_a", "id_b")
    assert(labels.count() > 0)
    assert(rounds <= 4, s"LSH graph took $rounds rounds")
  }

  test("pair order does not matter (edges treated as undirected)") {
    assert(cc(Seq((5L, 3L), (3L, 4L))) == Map(3L -> 3L, 4L -> 3L, 5L -> 3L))
  }

  test("string ids cluster by lexicographic min") {
    import spark.implicits._
    val got = Components.connectedComponents(
      Seq(("docB", "docA"), ("docB", "docC")).toDF("a", "b"), "a", "b")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("docA" -> "docA", "docB" -> "docA", "docC" -> "docA"))
  }

  test("dedupClusters marks exactly one keeper per cluster") {
    import spark.implicits._
    val got = Components.dedupClusters(
      Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("a", "b"), "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byCluster = got.groupBy(_._2)
    assert(byCluster.keySet == Set(1L, 7L))
    byCluster.foreach { case (cid, rows) =>
      assert(rows.count(_._3) == 1, s"cluster $cid keepers: $rows")
      assert(rows.find(_._3).get._1 == cid, "keeper must be the min id")
    }
  }

  test("dedupClustersBy keeps the highest-scored member, min id on ties") {
    import spark.implicits._
    // cluster {1,2,3}: scores 5,9,9 -> keeper 2 (top score, min id tie)
    // cluster {7,8}:   scores 1,4  -> keeper 8 (score beats min id)
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("a", "b")
    val scores = Seq((1L, 5L), (2L, 9L), (3L, 9L), (7L, 1L), (8L, 4L))
      .toDF("doc_id", "quality")
    val got = Components.dedupClustersBy(
      pairs, "a", "b", scores, "doc_id", "quality")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.count(_._4) == 2)
    assert(got.filter(_._4).map(t => t._2 -> t._1).toMap ==
      Map(1L -> 2L, 7L -> 8L))
    // score column keeps its caller-facing name
    assert(Components.dedupClustersBy(
      pairs, "a", "b", scores, "doc_id", "quality").columns.toSeq ==
      Seq("id", "cluster_id", "quality", "keep"))
  }

  test("clusterSizeProfile counts clusters per size, docs as a product") {
    import spark.implicits._
    // sizes: {1,2,3}=3, {10,11}=2, {20,21}=2 -> (3,1,3), (2,2,4)
    val got = Components.clusterSizeProfile(
      Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L)).toDF("a", "b"),
      "a", "b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((3L, 1L, 3L), (2L, 2L, 4L)))
  }

  test("dedupedCorpus keeps cluster minima and all unclustered docs") {
    import spark.implicits._
    val docs = (1L to 10L).map(i => (i, s"text$i")).toDF("doc_id", "body")
    val pairs = Seq((2L, 3L), (3L, 5L), (8L, 9L)).toDF("a", "b")
    val kept = Components.dedupedCorpus(docs, "doc_id", pairs, "a", "b")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // clusters {2,3,5} -> keep 2; {8,9} -> keep 8; rest untouched
    assert(kept == Set(1L, 2L, 4L, 6L, 7L, 8L, 10L))
    // schema passes through unchanged (no helper columns leak)
    assert(Components.dedupedCorpus(docs, "doc_id", pairs, "a", "b")
      .columns.toSeq == Seq("doc_id", "body"))
  }

  test("leakageSafeSplits: clusters are split-homogeneous, singletons " +
    "match the doc-level gate, and at least one clustered doc moves") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val ids = (1L to 400L)
    val docs = ids.map(i => Tuple1(i)).toDF("doc_id")
    // doc-level assignment, to engineer a pair that straddles a fence
    val docLevel = graft.operators.TextOps
      .assignSplit(docs, "doc_id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val trainId = ids.find(i => docLevel(i) == "train").get
    val nonTrainId = ids.find(i => docLevel(i) != "train").get
    val pairs = Seq(
      (trainId, nonTrainId),       // straddles the fence doc-level
      (301L, 302L), (302L, 303L))  // a second, ordinary cluster
      .toDF("a", "b")
    val got = Components
      .leakageSafeSplits(docs, "doc_id", pairs, "a", "b", splits)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.length == 400)
    val byDoc = got.map(r => r._1 -> r).toMap
    // (a) every cluster is split-homogeneous
    got.groupBy(_._2).foreach { case (_, members) =>
      assert(members.map(_._3).distinct.length == 1)
    }
    // (b) the straddling pair now agrees — decided by the cluster id
    //     (= min of the pair), whose salted hash need not equal either
    //     doc's own bucket, but must be shared
    assert(byDoc(trainId)._3 == byDoc(nonTrainId)._3)
    assert(byDoc(trainId)._2 == math.min(trainId, nonTrainId))
    // (c) unclustered docs: cluster_id = own id, split = doc-level gate
    val clusteredIds =
      Set(trainId, nonTrainId, 301L, 302L, 303L)
    got.filterNot(r => clusteredIds(r._1)).foreach { case (id, cl, sp) =>
      assert(cl == id)
      assert(sp == docLevel(id))
    }
    // (d) the doc-level gate really did disagree on the pair (the hole
    //     this operator closes)
    assert(docLevel(trainId) != docLevel(nonTrainId))
  }

  test("leakageSafeSplits fractions reach the cluster population") {
    import spark.implicits._
    val splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val docs = (1L to 2000L).map(Tuple1(_)).toDF("doc_id")
    val pairs = (1L to 100L).map(i => (i * 2, i * 2 + 1)).toDF("a", "b")
    val counts = Components
      .leakageSafeSplits(docs, "doc_id", pairs, "a", "b", splits)
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000L)
    // salted-hash proportions are approximate; train must dominate
    assert(counts("train") > 1600L)
    assert(counts.getOrElse("val", 0L) > 0L)
    assert(counts.getOrElse("test", 0L) > 0L)
  }
}
