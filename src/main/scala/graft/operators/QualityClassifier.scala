package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable document-quality classifier — the CCNet / GPT-3-style
  * "does this look like reference text?" filter that sits between raw
  * crawl output and the training mixture: a hashed bag-of-words logistic
  * regression, trained and applied entirely as Spark dataframe passes.
  *
  * Why hashed features: the feature space is fixed at `hashDim` up
  * front (no vocabulary build, no dictionary shuffle, no OOV path), the
  * model is a dense double array that broadcasts, and featurization is a
  * pure projection — the properties a 100 TB corpus needs. Same
  * hash-everything trick as [[TextOps]]'s minhash pipeline.
  *
  * Training is full-batch gradient descent: per epoch, the current
  * weights broadcast to executors, per-doc probabilities and per-feature
  * gradient sums come back through two linear aggregations (groupBy doc,
  * then groupBy feature — both partial->final hash aggregates), and the
  * dense gradient (hashDim + 1 doubles, corpus-size-invariant) is the
  * ONLY thing the driver ever collects. Epochs = full corpus passes;
  * featurization runs once and is checkpointed.
  *
  * Float caveat: gradient sums are parallel double adds, so training is
  * deterministic in structure but not bit-exact across partitionings —
  * like [[Similarity.kmeansRefine]] this is a training step, spec-tested
  * on behavior (separable data converges, scores rank positives first),
  * not oracle-hashed.
  */
object QualityClassifier {

  final case class Model(weights: Array[Double], bias: Double, hashDim: Int)

  /** (doc_id, feat, v): hashed token counts, L1-normalized per doc
    * (tf). One explode + one groupBy(doc, feat) — linear, no corpus
    * sort. Feature ids reuse [[TextOps.hash32Sql]]'s md5-derived hash so
    * featurization is engine-portable if ever oracled.
    */
  def featurize(
      df: DataFrame, idCol: String, textCol: String,
      hashDim: Int): DataFrame = {
    val toks = df
      .select(col(idCol).as("doc_id"),
        expr(TextOps.tokensSql(s"lower($textCol)")).as("toks"))
      .filter(size(col("toks")) > 0)
    toks
      .select(col("doc_id"), size(col("toks")).as("len"),
        explode(col("toks")).as("tok"))
      .select(col("doc_id"), col("len"),
        pmod(expr(TextOps.hash32Sql("tok")), lit(hashDim)).as("feat"))
      .groupBy(col("doc_id"), col("feat"))
      .agg((count(lit(1)) / first(col("len"))).as("v"))
  }

  private def sigmoid(z: Column): Column =
    lit(1.0) / (lit(1.0) + exp(-z))

  /** Train on (doc_id -> label) where label is 1.0 for "reference
    * quality" (wiki/books side) and 0.0 for raw-crawl side. `labels`
    * must have columns (idCol, labelCol). Returns the trained model.
    */
  def train(
      df: DataFrame, idCol: String, textCol: String,
      labels: DataFrame, labelCol: String,
      hashDim: Int, epochs: Int, lr: Double): Model = {
    val spark = df.sparkSession
    val feats = featurize(df, idCol, textCol, hashDim)
      .join(labels.select(col(idCol).as("doc_id"),
        col(labelCol).cast("double").as("y")), Seq("doc_id"))
      .localCheckpoint(true) // featurize once; epochs iterate on this
    val n = math.max(feats.select(countDistinct(col("doc_id")))
      .collect()(0).getLong(0), 1L).toDouble

    var w = new Array[Double](hashDim)
    var b = 0.0
    for (_ <- 1 to epochs) {
      val wDf = spark.createDataFrame(
        w.toSeq.zipWithIndex.map { case (wt, i) => (i.toLong, wt) })
        .toDF("feat", "wt")
      // margin per doc = sum(w[feat] * v) + b; p = sigmoid(margin)
      val perDoc = feats
        .join(broadcast(wDf), Seq("feat"))
        .groupBy(col("doc_id"))
        .agg(sum(col("wt") * col("v")).as("margin"),
          first(col("y")).as("y"))
        .select(col("doc_id"), (sigmoid(col("margin") + lit(b)) - col("y"))
          .as("err"))
      // dense gradient: one row per touched feature + the bias term
      val grad = feats
        .join(perDoc, Seq("doc_id"))
        .groupBy(col("feat"))
        .agg(sum(col("err") * col("v")).as("g"))
        .collect()
      val biasG = perDoc.agg(sum(col("err"))).collect()(0).getDouble(0)
      grad.foreach { r => w(r.getLong(0).toInt) -= lr * r.getDouble(1) / n }
      b -= lr * biasG / n
    }
    Model(w, b, hashDim)
  }

  /** Score documents with a trained model: pure projection (UDF with the
    * broadcast-closure weight array — tokens hashed and folded per row,
    * zero shuffle at any corpus size). Adds `scoreCol` in [0, 1].
    */
  def score(
      df: DataFrame, textCol: String, scoreCol: String,
      model: Model): DataFrame = {
    val w = model.weights; val b = model.bias; val dim = model.hashDim
    val scoreUdf = udf { (text: String) =>
      val toks = Option(text).map(_.trim.toLowerCase)
        .filter(_.nonEmpty).map(_.split("\\s+")).getOrElse(Array.empty[String])
      if (toks.isEmpty) 0.5
      else {
        // same md5-derived 32-bit hash as hash32Sql, folded per token
        val md = java.security.MessageDigest.getInstance("MD5")
        var z = b
        val inv = 1.0 / toks.length
        toks.foreach { t =>
          val d = md.digest(t.getBytes("UTF-8"))
          md.reset()
          // first 8 hex chars = first 4 bytes, big-endian unsigned
          val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
          z += w((h % dim).toInt) * inv
        }
        1.0 / (1.0 + math.exp(-z))
      }
    }
    df.withColumn(scoreCol, scoreUdf(col(textCol)))
  }
}
