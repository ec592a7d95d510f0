package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.plans.VectorExpressions

/** Durable IVF index over a GROWING embedding corpus — the
  * similarity-search twin of [[SignatureIndexStore]] (and the third
  * standing index beside it and [[graft.crawl.FrontierStore]]): a
  * continuous pipeline embeds each accepted batch and needs
  * nearest-neighbor lookups against everything indexed so far, without
  * re-reading or re-assigning the standing corpus per query.
  *
  * Layout under `root`:
  * {{{
  *   _META                          dim / centroids (pinned at build)
  *   centroids/part-*.parquet       (cent_id, cv) — the trained coarse quantizer
  *   _commit_<batchId>              marker: batch fully appended
  *   vecs/batch=<id>/cell=<c>/      (vid, v, n) — partitioned by assigned cell
  * }}}
  *
  * Properties:
  *  - **Append-only**: a batch writes only its own vectors, pre-assigned
  *    to their nearest centroid (broadcast centroids, one narrow pass —
  *    [[Similarity.ivfAssign]]); assignment happens ONCE, at append,
  *    never again at query time. Retried batch ids overwrite their own
  *    dir and re-mark.
  *  - **Cell pruning**: a query ranks centroids driver-free (broadcast),
  *    takes its `nprobe` nearest cells, and the store reads ONLY those
  *    `cell=` partitions across committed batches — k/C of the index for
  *    a point query, the IVF contract made durable.
  *  - **Frozen quantizer**: centroids are pinned at build (re-training
  *    them would strand every already-assigned vector in a stale cell).
  *    The standard IVF practice — train on a representative sample, then
  *    append forever; rebuild the store to re-train.
  *
  * Recall follows the nprobe/centroid geometry measured in RecallBench
  * (km-IVF .956/.995 at nprobe 1/2 on clustered fixtures); with
  * `nprobe = centroids` the search is exhaustive and EXACTLY equals
  * brute-force cosine top-K (spec-pinned).
  */
object AnnIndexStore {

  final case class Meta(dim: Int, centroids: Int)

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def readMeta(spark: SparkSession, root: String): Option[Meta] = {
    val f = fs(spark, root)
    val p = new Path(root, "_META")
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val text = try new String(in.readAllBytes()) finally in.close()
      val kv = text.linesIterator.filter(_.nonEmpty).map { l =>
        val Array(k, v) = l.trim.split(" "); k -> v.toInt
      }.toMap
      Some(Meta(kv("dim"), kv("centroids")))
    }
  }

  def committedBatches(spark: SparkSession, root: String): Seq[Long] = {
    val f = fs(spark, root)
    val p = new Path(root)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith("_commit_"))
      .map(_.stripPrefix("_commit_").toLong).sorted.toSeq
  }

  def centroids(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/centroids")

  /** Train the coarse quantizer (hash-sampled seeds refined by Lloyd
    * rounds — [[Similarity.kmeansRefine]]) and index `corpus` as batch 0.
    */
  def build(
      spark: SparkSession, root: String, corpus: DataFrame,
      idCol: String, vecCol: String, dim: Int, numCentroids: Int,
      lloydRounds: Int = 3): Unit = {
    val n = corpus.count()
    require(n >= numCentroids, s"corpus $n smaller than $numCentroids cells")
    val every = math.max(1L, n / numCentroids)
    val seeds = corpus
      .filter(pmod(xxhash64(col(idCol)), lit(every)) === 0)
      .limit(numCentroids)
      .select(col(idCol), col(vecCol))
    val trained = Similarity.kmeansRefine(
      corpus, seeds, idCol, vecCol, dim, lloydRounds)
    trained.write.mode("overwrite").parquet(s"$root/centroids")
    val f = fs(spark, root)
    val out = f.create(new Path(root, "_META"), true)
    try out.write(s"dim $dim\ncentroids $numCentroids".getBytes)
    finally out.close()
    append(spark, root, corpus, idCol, vecCol, 0L)
  }

  /** Assign `df`'s vectors to their nearest (pinned) centroid and append
    * them as batch `batchId` — one file per cell per batch.
    */
  def append(
      spark: SparkSession, root: String, df: DataFrame,
      idCol: String, vecCol: String, batchId: Long): Unit = {
    val meta = readMeta(spark, root).getOrElse(
      throw new IllegalStateException(s"no ANN store at $root — build first"))
    require(df.schema(vecCol).dataType ==
        ArrayType(FloatType, containsNull = true) ||
      df.schema(vecCol).dataType == ArrayType(FloatType, containsNull = false),
      s"$vecCol must be array<float> (the store's on-disk vector type); " +
        s"got ${df.schema(vecCol).dataType.simpleString} — cast before append")
    // a batch id at or below the compaction horizon would be written but
    // never read (visible() excludes covered ids) — refuse loudly
    compactState(spark, root).foreach { case (_, upTo) =>
      require(batchId > upTo,
        s"store at $root is compacted through batch $upTo; appending " +
          s"batch $batchId would be invisible to every reader")
    }
    Similarity.ivfAssign(df, idCol, vecCol,
        centroids(spark, root), "cent_id", "cv", meta.dim)
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$root/vecs/batch=$batchId")
    val out = fs(spark, root).create(new Path(root, s"_commit_$batchId"), true)
    try out.write(Array.emptyByteArray) finally out.close()
  }

  private val vecsSchema = StructType(Seq(
    StructField("vid", LongType), StructField("v", ArrayType(FloatType)),
    StructField("n", DoubleType), StructField("batch", LongType),
    StructField("cell", LongType)))

  /** Latest compaction state: (generation, coveredUpTo) — same pointer
    * discipline as [[SignatureIndexStore.compactState]].
    */
  def compactState(spark: SparkSession, root: String): Option[(Long, Long)] = {
    val f = fs(spark, root)
    val p = new Path(root, "_COMPACT")
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val text = try new String(in.readAllBytes()).trim finally in.close()
      val Array(gen, upTo) = text.split(" ")
      Some((gen.toLong, upTo.toLong))
    }
  }

  private def visible(
      spark: SparkSession, root: String): (Option[Long], Seq[Long]) = {
    val (gen, upTo) = compactState(spark, root).getOrElse((-1L, -1L))
    val batches = committedBatches(spark, root).filter(_ > upTo)
    (if (gen >= 0) Some(gen) else None, batches)
  }

  /** Read exactly the probed cells' directories as EXPLICIT paths —
    * a basePath read with a partition filter would first list every
    * `cell=` directory of every source (partition discovery is eager),
    * which at thousands of cells costs more than the pruned scan itself
    * (measured: ~1 s of listing at 1024 cells). Existence checks are
    * driver-side and bounded by sources × probed cells.
    */
  private def readVecs(
      spark: SparkSession, root: String, gen: Option[Long],
      batches: Seq[Long], cells: Seq[Long]): DataFrame = {
    val f = fs(spark, root)
    val dataSchema = StructType(vecsSchema.filterNot(_.name == "batch"))
    def readCells(base: String): Option[DataFrame] = {
      val paths = cells.map(c => s"$base/cell=$c")
        .filter(p => f.exists(new Path(p)))
      if (paths.isEmpty) None
      else Some(spark.read.schema(dataSchema)
        .option("basePath", base).parquet(paths: _*)
        .select("vid", "v", "n", "cell"))
    }
    val parts =
      gen.flatMap(k => readCells(s"$root/vecs/c$k")).toSeq ++
        batches.flatMap(b => readCells(s"$root/vecs/batch=$b"))
    if (parts.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(dataSchema.map(x =>
          if (x.name == "cell") x else x.copy())))
        .select("vid", "v", "n", "cell")
    else parts.reduce(_ unionByName _)
  }

  /** Fold all but the newest `keepNewest` batches (and the previous
    * snapshot) into one file per cell — [[SignatureIndexStore.compact]]'s
    * protocol on the vecs table (assignments are immutable, so
    * compaction is a pure file merge; no fence subtleties here because
    * queries have no `belowBatch` — an ANN lookup always wants the whole
    * standing index).
    */
  def compact(
      spark: SparkSession, root: String, keepNewest: Int = 1): Unit = {
    val (prevGen, prevUpTo) = compactState(spark, root).getOrElse((-1L, -1L))
    val all = committedBatches(spark, root).filter(_ > prevUpTo)
    if (all.size <= keepNewest) return
    val cover = all.dropRight(keepNewest)
    val gen = prevGen + 1
    val dataSchema = StructType(vecsSchema.filterNot(_.name == "batch"))
    val parts =
      (if (prevGen >= 0)
        Seq(spark.read.schema(dataSchema)
          .option("basePath", s"$root/vecs/c$prevGen")
          .parquet(s"$root/vecs/c$prevGen")
          .select("vid", "v", "n", "cell"))
      else Seq.empty) ++
        Seq(spark.read.schema(vecsSchema)
          .option("basePath", s"$root/vecs")
          .parquet(cover.map(b => s"$root/vecs/batch=$b"): _*)
          .select("vid", "v", "n", "cell"))
    parts.reduce(_ unionByName _)
      .repartition(col("cell"))
      .sortWithinPartitions("cell", "vid")
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$root/vecs/c$gen")
    val f = fs(spark, root)
    val out = f.create(new Path(root, "_COMPACT"), true)
    try out.write(s"$gen ${cover.last}".getBytes) finally out.close()
    if (prevGen >= 0) f.delete(new Path(s"$root/vecs/c$prevGen"), true)
    cover.foreach(b => f.delete(new Path(s"$root/vecs/batch=$b"), true))
  }

  /** Top-K cosine neighbors from the standing index for each query
    * vector, probing each query's `nprobe` nearest cells — only those
    * `cell=` partitions are read (partition-pruned scan), the IVF cost
    * contract at any index size. Queries whose `vid` equals an indexed
    * id skip themselves (the corpus-member convention of
    * [[Similarity.ivfTopKProbed]]).
    */
  def query(
      spark: SparkSession, root: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame = {
    val meta = readMeta(spark, root).getOrElse(
      throw new IllegalStateException(s"no ANN store at $root — build first"))
    val (gen, batches) = visible(spark, root)
    require(gen.nonEmpty || batches.nonEmpty,
      s"ANN store at $root holds no data")

    val c = centroids(spark, root)
      .select(col("cent_id"), col("cv"),
        VectorExpressions.norm(col("cv")).as("cn"))
    val q0 = queries.select(col(idCol).as("qvid"), col(vecCol).as("qv"),
      VectorExpressions.norm(col(vecCol)).as("qn"))
    val pw = Window.partitionBy(col("qvid"))
      .orderBy(col("cent_cos").desc, col("cent_id").asc)
    val probes = q0.join(broadcast(c))
      .select(col("qvid"), col("qv"), col("qn"), col("cent_id"),
        (VectorExpressions.dot(col("qv"), col("cv")) /
          (col("qn") * col("cn"))).as("cent_cos"))
      .withColumn("prn", row_number().over(pw))
      .filter(col("prn") <= nprobe)
      .select(col("qvid"), col("qv"), col("qn"), col("cent_id").as("cell"))
      .localCheckpoint(true) // pins the prune set the collect reads
    // ≤ queries × nprobe cells — the partition-prune driver set
    val cells = probes.select("cell").distinct()
      .collect().map(_.getLong(0)).toSeq
    val vecs = readVecs(spark, root, gen, batches, cells)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    broadcast(probes.as("q"))
      .join(vecs.as("c"),
        col("q.cell") === col("c.cell") && col("q.qvid") =!= col("c.vid"))
      .select(col("q.qvid").as("query_id"), col("c.vid").as("neighbor_id"),
        (VectorExpressions.dot(col("q.qv"), col("c.v")) /
          (col("q.qn") * col("c.n"))).as("cos"))
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter(col("rn") <= k)
  }
}
