package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.NgramLm

class NgramLmSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val reference = Seq(
    "the cat sat on the mat",
    "the dog sat on the rug",
    "the cat and the dog sat")

  test("bigramCounts counts adjacent lowercased pairs") {
    val got = NgramLm.bigramCounts(
        Seq("The cat the CAT").toDF("text"), "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got == Map(("the", "cat") -> 2L, ("cat", "the") -> 1L))
  }

  test("reference-like text scores lower perplexity than shuffled junk") {
    val model = NgramLm.fit(reference.toDF("text"), "text")
    assert(model.bigrams(("sat", "on")) == 2L)
    assert(model.unigrams("the") == 6L)
    val scored = NgramLm.perplexity(
        Seq(
          (1L, "the cat sat on the rug"), // seen bigrams throughout
          (2L, "rug the on sat cat the"), // same words, unseen order
          (3L, "zx qv wk jm pt")          // fully out of vocabulary
        ).toDF("doc_id", "text"), "text", "ppl", model)
      .select("doc_id", "ppl")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored(1L) < scored(2L),
      s"in-order text must beat shuffled: $scored")
    assert(scored(2L) < scored(3L),
      s"gibberish must score worse than shuffled in-vocab text: $scored")
    assert(scored(1L) < 50.0, s"seen-bigram ppl unexpectedly high: $scored")
  }

  test("ccnet buckets: fluent docs land in the head, gibberish in the tail, per stratum") {
    val model = NgramLm.fit(reference.toDF("text"), "text")
    // two strata, each with one fluent / one shuffled / one OOV doc —
    // fences are PER stratum, so each stratum gets its own 0/1/2 spread
    val docs = Seq(
      (1L, "en", "the cat sat on the rug"),
      (2L, "en", "rug the on sat cat the"),
      (3L, "en", "zx qv wk jm pt"),
      (4L, "web", "the cat sat on the mat"),
      (5L, "web", "mat the on sat cat the"),
      (6L, "web", "qq ww ee rr tt")
    ).toDF("doc_id", "stratum", "text")
    val out = NgramLm.perplexityBuckets(docs, "text", "stratum", model)
      .select("doc_id", "ppl_bucket")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) < out(3L), out.toString) // fluent beats OOV in en
    assert(out(4L) < out(6L), out.toString) // and in web
    assert(out(1L) == 0L && out(4L) == 0L, out.toString) // heads
    assert(out(3L) == 2L && out(6L) == 2L, out.toString) // tails
    assert(out.values.forall(b => b >= 0 && b <= 2))
  }

  test("short and empty docs get the unseen ceiling, not an exception") {
    val model = NgramLm.fit(reference.toDF("text"), "text")
    val got = NgramLm.perplexity(
        Seq((1L, "word"), (2L, ""), (3L, null.asInstanceOf[String]))
          .toDF("doc_id", "text"), "text", "ppl", model)
      .select("ppl")
      .collect().map(_.getDouble(0))
    assert(got.distinct.length == 1 && got.head > 1.0)
  }

  test("maxBigrams truncation keeps the most frequent pairs") {
    val model = NgramLm.fit(reference.toDF("text"), "text", maxBigrams = 2)
    assert(model.bigrams.size == 2)
    // five pairs tie at cnt=2; (l asc, r asc) keeps (dog,sat), (on,the)
    assert(model.bigrams.keySet == Set(("dog", "sat"), ("on", "the")),
      s"got ${model.bigrams.keySet}")
    assert(model.bigrams.values.forall(_ == 2L))
  }

  test("continuation counts measure context versatility, not frequency") {
    import spark.implicits._
    // "francisco" occurs 4 times but ONLY after "san"; "house" occurs 4
    // times after 4 different words — same frequency, opposite KN base
    val ref = Seq(
      "san francisco is nice and san francisco is big",
      "we saw san francisco from san francisco bay",
      "red house green house small house my house").toDF("text")
    val cont = NgramLm.continuationCounts(ref, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cont("francisco") == 1L, cont.toString)
    assert(cont("house") == 4L, cont.toString)
    val uni = NgramLm.unigramCounts(ref, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(uni("francisco") == uni("house"), uni.toString) // same raw freq
  }

  test("KN scoring punishes versatile-frequency words in novel contexts less") {
    import spark.implicits._
    val ref = Seq(
      "san francisco is nice and san francisco is big",
      "we saw san francisco from san francisco bay",
      "red house green house small house my house").toDF("text")
    val model = NgramLm.fit(ref, "text")
    val contMap = NgramLm.continuationCounts(ref, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // both test docs put the target word after the SAME unseen context;
    // KN should find "zzz house" less surprising than "zzz francisco"
    // (house follows many things; francisco only ever follows san)
    val scored = NgramLm.perplexityKn(
      Seq((1L, "zzz francisco"), (2L, "zzz house")).toDF("doc_id", "text"),
      "text", "ppl", model, contMap)
      .select("doc_id", "ppl")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored(2L) < scored(1L), scored.toString)
    // and the headline filter ordering still holds under KN
    val order = NgramLm.perplexityKn(
      Seq((1L, "san francisco is nice"),
          (2L, "nice francisco san is")).toDF("doc_id", "text"),
      "text", "ppl", model, contMap)
      .select("doc_id", "ppl")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(order(1L) < order(2L), order.toString)
  }
}
