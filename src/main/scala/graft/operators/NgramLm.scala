package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bigram language-model perplexity scoring — CCNet's second filter
  * (Wenzek et al. 2020: rank crawl text by LM perplexity against a
  * reference corpus; keep the low-perplexity head). A full KenLM is a
  * 5-gram with Kneser–Ney; the pipeline-shaped core is the same: train
  * counts on a reference corpus, broadcast the model, score every
  * document as a projection. Jelinek–Mercer-interpolated bigrams keep
  * the model exact and the scale shape identical — swap the estimator
  * (e.g. for Kneser–Ney), keep the plan.
  *
  * Scale shape: counts = one explode + one partial->final hash aggregate
  * ([[bigramCounts]], oracle-checkable); the broadcast model is bounded
  * by `maxBigrams` (top-frequency truncation — a TakeOrderedAndProject,
  * and the driver never collects more than that); scoring is a
  * broadcast-closure UDF — zero shuffle at any corpus size.
  */
object NgramLm {

  final case class Model(
    bigrams: Map[(String, String), Long],
    unigrams: Map[String, Long],
    vocabSize: Long, totalTokens: Long, lambda: Double, k: Double)

  /** Adjacent-pair counts over lowercased whitespace tokens: (l, r, cnt).
    * Same windowed-explode pattern as [[TextOps.duplicatedWindows]].
    */
  def bigramCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(expr(TextOps.tokensSql(s"lower($textCol)")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> " +
          "struct(element_at(toks, i + 1) as l, " +
          "element_at(toks, i + 2) as r))")).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(count(lit(1)).as("cnt"))

  /** Unigram counts (same tokenization). */
  def unigramCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(expr(TextOps.tokensSql(s"lower($textCol)")))
        .as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))

  /** Fit on a reference corpus. `maxBigrams`/`maxUnigrams` bound what the
    * driver holds and broadcasts; truncation drops the rarest counts,
    * whose smoothed probability barely differs from unseen.
    */
  def fit(
      reference: DataFrame, textCol: String,
      maxBigrams: Int = 1 << 20, maxUnigrams: Int = 1 << 18,
      lambda: Double = 0.7, k: Double = 0.1): Model = {
    val bi = bigramCounts(reference, textCol)
      .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
      .limit(maxBigrams).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val uniRows = unigramCounts(reference, textCol)
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(maxUnigrams).collect()
    val uni = uniRows.map(r => r.getString(0) -> r.getLong(1)).toMap
    Model(bi, uni, vocabSize = math.max(uni.size.toLong, 1L),
      totalTokens = math.max(uni.values.sum, 1L), lambda = lambda, k = k)
  }

  /** Per-document perplexity (bits): 2^(mean of -log2 P(w_i | w_{i-1})),
    * Jelinek–Mercer interpolated — P = λ·ML(r|l) + (1-λ)·P_k(r) with an
    * add-k unigram base. Interpolation (not plain add-k) matters for the
    * FILTER use: under add-k a fully-OOV context gets the uniform 1/V,
    * outranking in-vocab text with unseen bigrams; interpolating through
    * the unigram pushes gibberish below shuffled-but-in-vocab text,
    * which ranks below reference-like text — the ordering a perplexity
    * gate exists to produce. Pure projection; docs under 2 tokens score
    * the OOV ceiling. Lower = more reference-like.
    */
  def perplexity(
      df: DataFrame, textCol: String, outCol: String,
      model: Model): DataFrame = {
    val bi = model.bigrams; val uni = model.unigrams
    val v = model.vocabSize; val n = model.totalTokens
    val lam = model.lambda; val k = model.k
    val ppl = udf { (text: String) =>
      val toks = Option(text).map(_.trim.toLowerCase)
        .filter(_.nonEmpty).map(_.split("\\s+")).getOrElse(Array.empty[String])
      def punigram(r: String): Double =
        (uni.getOrElse(r, 0L) + k) / (n + k * v)
      def logp(l: String, r: String): Double = {
        val cl = uni.getOrElse(l, 0L)
        val ml = if (cl > 0) bi.getOrElse((l, r), 0L).toDouble / cl else 0.0
        math.log(lam * ml + (1 - lam) * punigram(r)) / math.log(2.0)
      }
      if (toks.length < 2)
        math.pow(2.0, -math.log((1 - lam) * k / (n + k * v)) / math.log(2.0))
      else {
        val bits = toks.sliding(2).map(p => -logp(p(0), p(1))).sum /
          (toks.length - 1)
        math.pow(2.0, bits)
      }
    }
    df.withColumn(outCol, ppl(col(textCol)))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020: corpora split
    * per language into head/middle/tail by reference-LM perplexity, so
    * downstream mixing can prefer the fluent tier): score with
    * [[perplexity]], fix the score to integer milli-units
    * (`floor(ppl × fpScale)`), then assign tiers with
    * [[TextOps.fixedPointBuckets]] — EXACT discrete quantile fences from
    * a per-stratum histogram cumulative count, no `percentile_approx`,
    * no driver collect, and the whole fence+assignment arithmetic is
    * integer (oracle-gated via q100's fixed-point tier query). Bucket 0
    * = lowest perplexity (the "head"); fence ties stay in the lower
    * tier. The corpus is scanned twice (fence pass + assignment) and
    * shuffled never — only the histogram moves.
    */
  def perplexityBuckets(
      df: DataFrame, textCol: String, strataCol: String, model: Model,
      buckets: Int = 3, pplCol: String = "ppl",
      bucketCol: String = "ppl_bucket", fpScale: Long = 1024L): DataFrame = {
    val scored = perplexity(df, textCol, pplCol, model)
      .withColumn("__ppl_fp", floor(col(pplCol) * fpScale).cast("long"))
    TextOps.fixedPointBuckets(scored, "__ppl_fp", strataCol, buckets, bucketCol)
      .drop("__ppl_fp")
  }

  /** Kneser–Ney continuation counts: N1+(·, r) = in how many DISTINCT
    * left contexts does word r appear. The KN insight is that the unigram
    * base should measure context versatility, not raw frequency — the
    * classic example is "francisco": frequent, but (almost) only ever
    * after "san", so its continuation probability is tiny and a
    * "francisco" after a novel context is correctly surprising.
    * [[bigramCounts]] rows are already distinct (l, r), so this is one
    * further vocabulary-sized hash aggregate — integer, oracle-checkable.
    */
  def continuationCounts(df: DataFrame, textCol: String): DataFrame =
    bigramCounts(df, textCol)
      .groupBy(col("r").as("word"))
      .agg(count(lit(1)).as("n_contexts"))

  /** Kneser–Ney-smoothed perplexity (absolute discounting D over the
    * interpolated continuation base):
    * P(r|l) = max(c(l,r)−D, 0)/c(l·) + D·N1+(l,·)/c(l·) · Pcont(r),
    * Pcont(r) = N1+(·,r)/|distinct bigrams|. The float fold over the
    * oracle-gated integer counts (the q65/q67 split); same zero-shuffle
    * broadcast-closure plan as [[perplexity]]. `continuation` comes from
    * [[continuationCounts]] (driver-collected — vocabulary-sized, the
    * same bound `fit` already accepts for unigrams). Unseen contexts
    * back off to Pcont alone; sub-2-token docs score the OOV ceiling.
    */
  def perplexityKn(
      df: DataFrame, textCol: String, outCol: String,
      model: Model, continuation: Map[String, Long],
      discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, "discount in (0,1)")
    val bi = model.bigrams
    // c(l·) and N1+(l,·) from the broadcast bigram table (bounded by
    // maxBigrams); both driver-computed once, closure-captured
    val leftTotals = bi.groupMapReduce(_._1._1)(_._2)(_ + _)
    val leftDistinct = bi.keys.groupMapReduce(_._1)(_ => 1L)(_ + _)
    val nBigrams = math.max(bi.size.toLong, 1L)
    val contTotal = math.max(continuation.values.sum, nBigrams)
    val ppl = udf { (text: String) =>
      val toks = Option(text).map(_.trim.toLowerCase)
        .filter(_.nonEmpty).map(_.split("\\s+")).getOrElse(Array.empty[String])
      def pcont(r: String): Double =
        // add-one on the continuation base keeps OOV words nonzero
        (continuation.getOrElse(r, 0L) + 1.0) / (contTotal + nBigrams)
      def p(l: String, r: String): Double = leftTotals.get(l) match {
        case Some(cl) if cl > 0 =>
          val c = bi.getOrElse((l, r), 0L).toDouble
          math.max(c - discount, 0.0) / cl +
            discount * leftDistinct.getOrElse(l, 0L) / cl * pcont(r)
        case _ => pcont(r)
      }
      if (toks.length < 2) 1.0 / pcont(" ")
      else {
        val bits = toks.sliding(2)
          .map(x => -math.log(p(x(0), x(1))) / math.log(2.0)).sum /
          (toks.length - 1)
        math.pow(2.0, bits)
      }
    }
    df.withColumn(outCol, ppl(col(textCol)))
  }
}
