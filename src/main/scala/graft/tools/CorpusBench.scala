package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{NgramLm, TrainingCorpus}

/** Capstone proof for the end-to-end pipeline (PERF_NOTES §"TrainingCorpus
  * at sf1"): run [[TrainingCorpus.build]] with EVERY stage enabled —
  * quality/lang/repetition gates, boilerplate removal, MinHash dedup with
  * transitive clustering, benchmark decontamination, perplexity gate,
  * mixture sampling, split labeling — over the ScaleUp-derived sf1
  * documents table, and record the full audit trail: per-stage survivor
  * counts, per-stage wall, CC round count, and a flat-plan scan (no stage
  * may inherit a corpus-sized window or a cartesian product).
  *
  * The benchmark set and the reference LM derive from the corpus itself
  * (hash-sampled slices) so the run needs no external fixtures and both
  * anti-joins/gates do real work at every SF.
  */
object CorpusBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/bench-sf1")
    // optional second arg: durable stage directory — reruns resume from
    // committed stages (the PERF_NOTES durable-resume experiment)
    val workDir = args.lift(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // durable mode reads every stage back from parquet; at this SF a
    // whole stage is a few MB, which the default 128 MB split packs into
    // 1-2 partitions — collapsing parallelism for the compute-bound
    // stages that follow (measured: repetition gate 4.2 s in-memory vs
    // 30 s read-back before this). Size the split so read-back
    // parallelism ≈ cores, the same data-to-knob sizing
    // shuffle.partitions gets; at production scale stages exceed
    // cores × 128 MB and the default is already right.
    if (workDir.isDefined)
      spark.conf.set("spark.sql.files.maxPartitionBytes", "2m")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .localCheckpoint(true)
    val nDocs = docs.count()

    // benchmark set: ~1% hash-sample of doc texts — decontamination must
    // then drop (at least) the sampled docs themselves
    val benchmark = docs.filter(abs(xxhash64(col("doc_id"))) % 100 === 0)
      .select(col("text"))
    // reference LM: fit on a disjoint ~10% slice; perplexity cut at a
    // level that passes reference-like text and rejects the tail
    val lmSlice = docs.filter(abs(xxhash64(col("doc_id"))) % 100 between(1, 10))
    val lm = NgramLm.fit(lmSlice, "text")

    val weights = (0 until 20).map(i => s"src$i" -> 0.05).toMap

    // perplexity cut: p90 of the corpus's own ppl distribution (the
    // CCNet-style data-derived threshold — a fixed constant would be
    // vocabulary-dependent and either no-op or annihilate at other SFs;
    // the sf1 derived set's rotated copies shift the whole distribution)
    val pplCut = NgramLm.perplexity(docs, "text", "ppl", lm)
      .stat.approxQuantile("ppl", Array(0.9), 0.001).head

    val t0 = System.nanoTime()
    val result = TrainingCorpus.build(
      docs, "doc_id", "text", "source",
      benchmark = Some(benchmark), benchTextCol = "text",
      referenceLm = Some(lm),
      cfg = TrainingCorpus.Config(
        boilerplateMinDfFraction = Some(0.04),
        // CCNet segment keep-first between boilerplate and doc dedup;
        // 5-token segments: wide enough that only genuinely shared
        // passages collide on the synthetic vocabulary
        keepFirstSegTokens = Some(5),
        maxPerplexity = Some(pplCut),
        mixtureWeights = weights,
        budgetTokens = 1500000L,
        splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)),
      workDir = workDir)
    val corpus = result.corpus.localCheckpoint(true)
    val outRows = corpus.count()
    val wall = (System.nanoTime() - t0) / 1e9

    val splitCounts = corpus.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    // flat-plan scan: global windows and cartesian products are the two
    // shapes that do not survive a 100x scale-up (plans print node names
    // without the Exec suffix — PlanChecks owns the detection)
    val flatViolations = result.plans.flatMap { case (name, plan) =>
      graft.plans.PlanChecks.scaleViolations(plan).map(v => s"$name:$v")
    }

    def jmap(kvs: Seq[(String, Any)]): String =
      kvs.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    println(jmap(Seq(
      "sf_dir" -> ("\"" + sfDir + "\""),
      "input_docs" -> nDocs,
      "ppl_cut_p90" -> f"$pplCut%.1f",
      "audit" -> jmap(result.audit.map { case (k, v) => k -> v }),
      "stage_sec" -> jmap(result.timings.map { case (k, v) =>
        k -> f"$v%.2f" }),
      "cc_rounds" -> result.dedupRounds,
      "out_rows" -> outRows,
      "splits" -> jmap(splitCounts.toSeq.map { case (k, v) => k -> v }),
      "flat_plan_violations" ->
        ("\"" + flatViolations.mkString(",") + "\""),
      "cached_stages" ->
        ("\"" + result.cachedStages.mkString(",") + "\""),
      "wall_sec" -> f"$wall%.1f")))
    spark.stop()
  }
}
