package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-call end-to-end training-corpus construction — the composition a
  * pipeline user actually runs, wiring the individual operators in the
  * order the large-corpus literature settled on (C4 → Gopher/RefinedWeb
  * → CCNet ordering: cheap projections first, shuffles on the shrunken
  * survivor set, benchmark decontamination last before mixing):
  *
  *   1. quality + language gate (projection filters; [[TextOps.cleanCorpus]]
  *      semantics) and Gopher repetition gate
  *   2. boilerplate segment removal ([[TextOps.removeBoilerplate]]),
  *      optionally followed by CCNet keep-first segment dedup
  *      ([[TextOps.keepFirstSegmentDedup]])
  *   3. exact + near-duplicate removal (MinHash candidates →
  *      [[Components]] transitive clusters → keep cluster minimum)
  *   4. benchmark decontamination ([[TextOps.decontaminate]] anti-join)
  *   5. optional perplexity gate against a reference LM ([[NgramLm]])
  *   6. mixture sampling ([[MixturePlanner]] rates over the SURVIVOR
  *      token counts — rates solved after filtering, or the mixture
  *      under-delivers by exactly the filtered fraction)
  *
  * Each stage consumes the previous stage's output, so every shuffle
  * after stage 1 runs on the surviving fraction only. Returns the final
  * corpus plus per-stage survival counts (the audit trail a data card
  * needs).
  */
object TrainingCorpus {

  final case class Config(
    minTokens: Long = 5,
    minAlphaRatio: Double = 0.5,
    lang: String = "en",
    maxRepRatio: Double = 0.5,
    /** Optional Gopher §A1.1 repetition ceilings ([[TextOps
      * .gopherRepetition]] fixed-point percents): docs whose single most
      * frequent bigram carries more than `maxTopBigramPct` of bigram
      * mass, or whose duplicated-5-token-window share exceeds
      * `maxDupWindowPct`, drop with the other repetition signals.
      * None = that signal ungated.
      */
    maxTopBigramPct: Option[Long] = None,
    maxDupWindowPct: Option[Long] = None,
    boilerplateSegTokens: Int = 2,
    boilerplateMinDf: Int = 3,
    /** When set, a segment is boilerplate only if its doc frequency also
      * reaches this fraction of the corpus (df >= max(minDf, ceil(f*N))).
      * Small shared vocabularies need this: an absolute df over a corpus
      * with few distinct segments marks nearly everything boilerplate.
      */
    boilerplateMinDfFraction: Option[Double] = None,
    /** When set, run CCNet-style keep-first segment dedup
      * ([[TextOps.keepFirstSegmentDedup]] at this segment width) after
      * boilerplate removal: repeated segments keep only their first
      * corpus occurrence, so syndicated/mirrored passages are priced
      * once before document-level dedup sees them. None = skip.
      */
    keepFirstSegTokens: Option[Int] = None,
    /** Blocklist tolerance when a blocklist is passed to [[build]]:
      * docs with MORE than this many blocklisted tokens drop (0 = the
      * strict C4 any-hit policy).
      */
    blocklistMaxHits: Long = 0,
    shingleK: Int = 3, numHashes: Int = 16, bandSize: Int = 4,
    dedupThreshold: Double = 0.5,
    decontamShingleK: Int = 8,
    maxPerplexity: Option[Double] = None,
    mixtureWeights: Map[String, Double] = Map.empty,
    budgetTokens: Long = Long.MaxValue,
    /** Optional final stage: label every surviving doc train/val/test
      * ([[TextOps.assignSplit]] — salted, so independent of the mixture
      * gate). Empty = no split column.
      */
    splits: Seq[(String, Double)] = Seq.empty)

  final case class Result(
    corpus: DataFrame,
    /** (stage name, docs surviving) in pipeline order. */
    audit: Seq[(String, Long)],
    /** Label-propagation rounds the dedup clustering ran — the iteration
      * budget of the one iterative stage (= candidate-graph diameter;
      * small and corpus-size-independent on LSH graphs).
      */
    dedupRounds: Int = 0,
    /** (stage name, physical plan) per audited stage, captured before the
      * stage's checkpoint truncates lineage — what the flat-plan
      * regression assertions read (no corpus-sized WindowExec, no
      * cartesian product may appear in any stage).
      */
    plans: Seq[(String, String)] = Seq.empty,
    /** (stage name, seconds to materialize) per audited stage. */
    timings: Seq[(String, Double)] = Seq.empty,
    /** Stages whose outputs were READ from `workDir` instead of computed
      * (durable-resume runs only; such stages have no plan/timing entry
      * and don't contribute dedupRounds).
      */
    cachedStages: Seq[String] = Seq.empty)

  def build(
      docs: DataFrame, idCol: String, textCol: String, strataCol: String,
      benchmark: Option[DataFrame], benchTextCol: String,
      referenceLm: Option[NgramLm.Model],
      cfg: Config = Config(),
      /** Optional C4-style banned-wordlist gate, applied with the other
        * cheap gates before any shuffle-heavy stage: (wordlist frame,
        * word column). Tolerance via [[Config.blocklistMaxHits]].
        */
      blocklist: Option[(DataFrame, String)] = None,
      /** When set, every stage output (and the dedup drop-set) is
        * materialized as parquet under this directory, and a stage whose
        * output already exists (committed `_SUCCESS`) is READ instead of
        * recomputed — so a build that dies at stage k resumes from stage
        * k-1's durable output rather than re-running the corpus from the
        * top (at 100 TB, the difference between a retry and a re-run).
        * Stage dirs are indexed (`00_quality…`, `03_dedup`, …), and the
        * workDir is PINNED to its build parameters by a `_MANIFEST` file
        * (Config, column names, input schema, `inputId`): re-invoking
        * with different parameters against an existing workDir throws
        * instead of silently serving stage outputs computed under the
        * old parameters — delete the workDir (or a suffix of it) to
        * rebuild. None = in-memory `localCheckpoint` pinning (the
        * test/iterate mode).
        */
      workDir: Option[String] = None,
      /** Caller-supplied input version tag folded into the workDir
        * manifest: pass a snapshot id / path / date when the SAME
        * workDir may be re-invoked over changing input data, so a stale
        * resume refuses instead of returning the old input's corpus.
        * (The manifest pins Config + columns + schema by itself; input
        * CONTENT is only visible through this tag.)
        */
      inputId: String = ""): Result = {
    val audit = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val plans = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val timings = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    val cached = scala.collection.mutable.ArrayBuffer.empty[String]
    val spark = docs.sparkSession

    // pin the workDir to this build's parameters before any stage can be
    // served from it: resume must mean "same build, continued"
    workDir.foreach { root =>
      val manifest = Seq(
        "cfg=" + cfg.toString,
        s"cols=$idCol,$textCol,$strataCol,bench=$benchTextCol",
        "benchmark=" + benchmark.isDefined,
        "referenceLm=" + referenceLm.map(m =>
          s"${m.bigrams.size}/${m.unigrams.size}/${m.vocabSize}/" +
            s"${m.totalTokens}/${m.lambda}/${m.k}").getOrElse("none"),
        "blocklist=" + blocklist.map(_._2).getOrElse("none"),
        "inputId=" + inputId,
        "schema=" + docs.schema.catalogString).mkString("\n")
      val p = new org.apache.hadoop.fs.Path(root, "_MANIFEST")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) {
        val in = fs.open(p)
        val existing = try new String(in.readAllBytes()) finally in.close()
        if (existing != manifest)
          throw new IllegalStateException(
            s"workDir $root was built with different parameters — " +
              "resuming would serve stage outputs computed under the old " +
              s"config/input. Delete it to rebuild.\n--- stored:\n$existing" +
              s"\n--- requested:\n$manifest")
      } else {
        fs.mkdirs(new org.apache.hadoop.fs.Path(root))
        val out = fs.create(p, true)
        try out.write(manifest.getBytes) finally out.close()
      }
    }
    var stageIdx = -1
    def stageDir(name: String): Option[String] =
      workDir.map(root => f"$root/$stageIdx%02d_$name")
    def committed(dir: String): Boolean = {
      val p = new org.apache.hadoop.fs.Path(dir, "_SUCCESS")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }
    /** Pin a stage: read it back from the workDir when already committed
      * (skipping `df`'s computation entirely — it is by-name), else
      * compute, audit, and (durable mode) materialize.
      */
    def step(name: String, df: => DataFrame): DataFrame = {
      stageIdx += 1
      stageDir(name) match {
        case Some(dir) if committed(dir) =>
          // the thunk is never forced: pair generation / clustering /
          // joins behind a committed stage do not run at all
          cached += name
          val back = spark.read.parquet(dir)
          audit += ((name, back.count()))
          back
        case Some(dir) =>
          val frame = df // force the by-name ONCE
          plans += ((name, frame.queryExecution.executedPlan.toString))
          val t0 = System.nanoTime()
          frame.write.mode("overwrite").parquet(dir)
          val back = spark.read.parquet(dir)
          audit += ((name, back.count()))
          timings += ((name, (System.nanoTime() - t0) / 1e9))
          back
        case None =>
          val frame = df
          plans += ((name, frame.queryExecution.executedPlan.toString))
          val t0 = System.nanoTime()
          val pinned = frame.localCheckpoint(true)
          audit += ((name, pinned.count()))
          timings += ((name, (System.nanoTime() - t0) / 1e9))
          pinned
      }
    }

    val base = docs.select(col(idCol).as("doc_id"),
      col(textCol).as("text"), col(strataCol).as("stratum"))
    audit += (("input", base.count()))

    // 1. projection gates: quality + language + repetition, one pass
    val gated = step("quality_lang_repetition", base
      .withColumn("n_tokens", TextOps.preTokenCount(col("text")))
      .withColumn("pred_lang", TextOps.predictLangUdf(col("text")))
      .filter(col("n_tokens") >= cfg.minTokens &&
        col("pred_lang") === cfg.lang)
      .withColumn("alpha_ratio",
        length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("double") /
          greatest(length(col("text")), lit(1)).cast("double"))
      .filter(col("alpha_ratio") >= cfg.minAlphaRatio)
      .drop("n_tokens", "pred_lang", "alpha_ratio"))
    // 1b. optional banned-wordlist gate (C4): broadcast list, cheap, runs
    //     with the other gates before anything shuffle-heavy
    val unblocked = blocklist match {
      case Some((bl, wordCol)) => step("blocklist_gate",
        TextOps.blocklistGate(gated, "doc_id", "text", bl, wordCol,
          cfg.blocklistMaxHits))
      case None => gated
    }
    val repOk = TextOps.repetitionFeatures(unblocked, "doc_id", "text")
      .filter(col("rep_ratio") <= cfg.maxRepRatio)
      .select(col("doc_id"))
    // optional Gopher ceilings ride the same semi-join set: intersect the
    // survivors of both signal families before touching the corpus rows
    val gopherOk =
      if (cfg.maxTopBigramPct.isEmpty && cfg.maxDupWindowPct.isEmpty) None
      else Some(
        TextOps.gopherRepetition(unblocked, "doc_id", "text")
          .filter(
            col("top_bigram_pct") <= cfg.maxTopBigramPct.getOrElse(100L) &&
              col("dup_window_pct") <= cfg.maxDupWindowPct.getOrElse(100L))
          .select(col("doc_id")))
    val repKeep = gopherOk.fold(repOk)(g => repOk.join(g, Seq("doc_id")))
    val unrepeated = step("repetition_gate",
      unblocked.join(repKeep, Seq("doc_id"), "left_semi"))

    // 2. boilerplate removal rewrites text in place
    val deboiled = step("boilerplate_removal",
      TextOps.removeBoilerplate(unrepeated, "doc_id", "text",
          segTokens = cfg.boilerplateSegTokens,
          minDocFrequency = cfg.boilerplateMinDf,
          minDocFraction = cfg.boilerplateMinDfFraction)
        .select(col("doc_id"), col("clean_text").as("text"))
        .join(unrepeated.select("doc_id", "stratum"), Seq("doc_id"))
        .filter(length(trim(col("text"))) > 0))

    // 2b. optional CCNet-style segment-level keep-first dedup: repeated
    //     segments survive only at their first (doc_id, pos) occurrence
    val segDeduped = cfg.keepFirstSegTokens match {
      case Some(w) =>
        step("segment_keep_first",
          TextOps.keepFirstSegmentDedup(deboiled, "doc_id", "text", w)
            .select(col("doc_id"), col("clean_text").as("text"))
            .join(deboiled.select("doc_id", "stratum"), Seq("doc_id"))
            .filter(length(trim(col("text"))) > 0))
      case None => deboiled
    }

    // 3. exact + near dedup: signature-estimate pairs above the
    //    threshold (the scale default — no second text pass) ->
    //    transitive clusters -> keep each cluster's minimum id.
    //    The whole chain lives inside the step thunk so a durable-resume
    //    run with a committed dedup output skips pair generation AND the
    //    iterative clustering, not just the final anti-join.
    var ccRounds = 0
    val deduped = step("dedup", {
      val pairs = TextOps.minhashDedupPairsApprox(segDeduped, "doc_id",
        "text", cfg.shingleK, cfg.numHashes, cfg.bandSize,
        cfg.dedupThreshold)
      val tCc = System.nanoTime()
      val (ccLabels, rounds) =
        Components.connectedComponentsWithStats(pairs, "id_a", "id_b")
      ccRounds = rounds
      timings += (("dedup_clustering", (System.nanoTime() - tCc) / 1e9))
      val drop = ccLabels
        .filter(col("id") =!= col("component"))
        .select(col("id").as("__drop_id"))
      segDeduped.join(drop, segDeduped("doc_id") === col("__drop_id"),
        "left_anti")
    })

    // 4. benchmark decontamination: drop any doc sharing shingles
    val decontaminated = benchmark match {
      case Some(bm) =>
        step("decontamination", deduped.join(
          TextOps.decontaminate(deduped, "doc_id", "text",
            bm, benchTextCol, cfg.decontamShingleK)
            .select(col("doc_id")),
          Seq("doc_id"), "left_anti"))
      case None => deduped
    }

    // 5. optional perplexity gate
    val fluent = referenceLm match {
      case Some(m) =>
        val maxPpl = cfg.maxPerplexity.getOrElse(Double.MaxValue)
        step("perplexity_gate",
          NgramLm.perplexity(decontaminated, "text", "ppl", m)
            .filter(col("ppl") <= maxPpl).drop("ppl"))
      case None => decontaminated
    }

    // 6. mixture: solve rates over SURVIVOR token counts, then hash-gate
    val mixed =
      if (cfg.mixtureWeights.isEmpty) fluent
      else step("mixture_sample", MixturePlanner.applyPlan(
        fluent, "doc_id", "stratum",
        MixturePlanner.plan(
          MixturePlanner.tokenTotals(fluent, "stratum", "text"),
          cfg.mixtureWeights, cfg.budgetTokens)))

    // 7. optional split labeling — a projection, never drops rows, so it
    //    sits outside the audit trail
    val labeled =
      if (cfg.splits.isEmpty) mixed
      else TextOps.assignSplit(mixed, "doc_id", cfg.splits)

    Result(labeled, audit.toSeq, ccRounds, plans.toSeq, timings.toSeq,
      cached.toSeq)
  }

  /** Corpus-level deletion: propagate ONE delete set through the
    * accepted corpus parquet and every standing index (signature / ANN /
    * label stores) — journal-led and crash-resumable ([[Takedown]] holds
    * the protocol; [[Takedown.resume]] completes a killed run). Returns
    * the journal id.
    */
  def takedown(
      spark: org.apache.spark.sql.SparkSession, ids: DataFrame,
      idCol: String, targets: Takedown.Targets, journalDir: String): Long =
    Takedown.takedown(spark, ids, idCol, targets, journalDir)
}
