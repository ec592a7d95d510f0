package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Bm25, Components, Similarity, TextOps}

/** LLM-training-data pipeline operators over the `documents` and
  * `embeddings` tables: deduplication (exact, n-gram Jaccard, MinHash+LSH,
  * SimHash), similarity search (brute-force cosine, hyperplane-LSH ANN),
  * and text analysis (tokens, quality, language-ID, fingerprints), each
  * with a value-exact DuckDB oracle mirroring the same arithmetic.
  */
object TextQueries {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "documents")
  private def embs(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "embeddings")

  /** Eagerly materialize a fixture-backed result, then reclaim the
    * fixture (temp store dirs, session-catalog tables) — the store-gate
    * queries (q108/q109/q115) build a durable store per invocation, and
    * without this a long-lived JVM sweeping them repeatedly (bench loops,
    * correctness reruns) accumulates temp dirs and catalog entries
    * forever. `localCheckpoint(true)` pins the VALUES into block storage
    * so the cleanup cannot race the read. NOTE (PERF_NOTES): these
    * queries' bench wall time deliberately includes the store's
    * write-path parquet I/O — the build IS the gate.
    */
  private def materializedWithCleanup(df: DataFrame)(
      cleanup: => Unit): DataFrame = {
    val out = df.localCheckpoint(true)
    cleanup
    out
  }

  private def deleteRecursively(path: String): Unit = {
    import java.nio.file.{Files, Path}
    import scala.jdk.CollectionConverters._
    val p = Path.of(path)
    if (Files.exists(p)) {
      val all = Files.walk(p).iterator().asScala.toSeq.reverse
      all.foreach(Files.deleteIfExists(_))
    }
  }

  /** Failure-path reclamation for the temp-dir gates: the success path
    * cleans up via [[materializedWithCleanup]] AFTER pinning values, but
    * a THROW anywhere inside the gate body would strand the fixture —
    * multi-GB at sf1. Guards rethrow after best-effort deletion.
    */
  private[graft] def guardGate[A](base: String)(body: => A): A =
    try body
    catch {
      case t: Throwable =>
        try deleteRecursively(base) catch { case _: Throwable => () }
        throw t
    }

  // DuckDB-dialect builders mirroring TextOps/Similarity formulas
  private val dTokens = """string_split_regex(trim(text), '\s+')"""
  private val dShingles =
    s"""CASE WHEN len($dTokens) >= 3 THEN
       | list_distinct(list_transform(range(0, len($dTokens) - 2),
       |   i -> array_to_string(($dTokens)[i+1:i+3], ' ')))
       | ELSE [] END""".stripMargin.replaceAll("\n", " ")
  private def dHash32(s: String) =
    s"CAST(CONCAT('0x', substr(md5($s), 1, 8)) AS BIGINT)"
  private val dHashedShingles =
    s"list_transform($dShingles, s -> ${dHash32("s")})"
  private val dHashedTokens =
    s"list_transform(list_distinct($dTokens), s -> ${dHash32("s")})"
  private def dMinhash(hs: String, k: Int) =
    s"""list_transform(range(0, $k), j ->
       | list_min(list_transform($hs, h ->
       |   (((j * 2654435761 + 1) % 1000000007) * h + j * 97 + 13) % 1000000007)))"""
      .stripMargin.replaceAll("\n", " ")
  private def dDot(a: String, b: String) =
    s"""list_reduce(list_transform(range(0, 64), d ->
       | CAST($a[d+1] AS DOUBLE) * CAST($b[d+1] AS DOUBLE)), (x, y) -> x + y)"""
      .stripMargin.replaceAll("\n", " ")
  private def dCos(a: String, b: String) =
    s"${dDot(a, b)} / (sqrt(${dDot(a, a)}) * sqrt(${dDot(b, b)}))"
  private val dBucket =
    s"""list_reduce(list_transform(range(0, 16), j ->
       | CASE WHEN list_reduce(list_transform(range(0, 64), d ->
       |     CAST(v[d+1] AS DOUBLE) * (((j * 31 + d * 17) % 7) - 3)),
       |     (x, y) -> x + y) > 0
       |   THEN (1::BIGINT << j) ELSE 0::BIGINT END),
       | (x, y) -> x + y)""".stripMargin.replaceAll("\n", " ")
  private def dLexHits(words: Seq[String]) = {
    val lst = words.map(w => s"'$w'").mkString(", ")
    s"""CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
       | x -> x IN ($lst))) AS BIGINT)""".stripMargin.replaceAll("\n", " ")
  }

  /** The q55 transitive-closure pipeline as a reusable CTE chain:
    * MinHash sigs → band keys → candidate pairs → recursive min-label
    * walk → `cc(doc_id, cluster_id)`. Prepend `WITH RECURSIVE` and
    * compose further CTEs/selects after it.
    */
  private val dClusterCc =
    s"""sigs AS (SELECT doc_id, ${dMinhash(dHashedShingles, 16)} AS sig
       |  FROM documents),
       |bands AS (SELECT DISTINCT doc_id, unnest(list_transform(range(0, 4),
       |    b -> CONCAT(b, '-', array_to_string(sig[b*4+1:b*4+4], ','))))
       |    AS band_key
       |  FROM sigs),
       |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |  FROM bands x JOIN bands y
       |    ON x.band_key = y.band_key AND x.doc_id < y.doc_id),
       |edges AS (SELECT id_a AS u, id_b AS v FROM cand
       |  UNION SELECT id_b, id_a FROM cand),
       |walk(u, label) AS (
       |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
       |  UNION
       |  SELECT e.u, w.label FROM edges e JOIN walk w ON w.u = e.v),
       |cc AS (SELECT u AS doc_id, min(label) AS cluster_id
       |  FROM walk GROUP BY u)""".stripMargin

  /** The q79/q80 fixed-point PageRank iteration as a DuckDB CTE chain:
    * expects an `edges(src, dst)` CTE (distinct, self-loop-free) to be
    * already defined; emits outdeg/nodes/r0 then `iters` rounds of the
    * integer damping update (mirroring [[graft.operators.LinkRank]]'s
    * scale=10⁶, d=85/100 arithmetic exactly — `//` floor division equals
    * Spark's `div` truncation on the non-negative values here). The last
    * CTE is `r<iters>`.
    */
  private def dPageRankRounds(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""c$i AS (SELECT e.dst AS node_id, SUM(r.r // d.deg) AS s
         |  FROM edges e JOIN r${i - 1} r ON r.node_id = e.src
         |  JOIN outdeg d ON d.src = e.src GROUP BY 1),
         |r$i AS (SELECT n.node_id,
         |    CAST(150000 + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS r
         |  FROM nodes n LEFT JOIN c$i c USING (node_id))""".stripMargin
    }.mkString(",\n")
    s"""outdeg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1),
       |nodes AS (SELECT DISTINCT v AS node_id FROM (
       |  SELECT src AS v FROM edges UNION ALL SELECT dst FROM edges)),
       |r0 AS (SELECT node_id, CAST(1000000 AS BIGINT) AS r FROM nodes),
       |$rounds""".stripMargin
  }

  /** Deterministic PII-bearing text: doc text plus a synthesized email,
    * IPv4, and phone derived from doc_id. Engine-portable SQL (concat /
    * cast / %), evaluated identically by Spark and DuckDB so the q53
    * scrub oracle exercises every pattern on every row.
    */
  private val piiProbe: String =
    "concat(text, ' contact user', cast(doc_id as string)," +
      " '@mail.example.com srv 10.0.0.'," +
      " cast(doc_id % 256 as string)," +
      " ' call +1 (555) 123-', cast(1000 + doc_id % 9000 as string))"

  /** DuckDB twin of [[TextOps.scrubPiiSql]]: same patterns (single-escaped
    * — DuckDB string literals don't process backslashes), plus the 'g'
    * flag DuckDB needs for replace-all semantics.
    */
  private def dScrubPii(c: String): String = {
    val email = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
    val ip = """\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"""
    val phone = """\+?[0-9][0-9()\-. ]{7,}[0-9]"""
    s"""regexp_replace(regexp_replace(regexp_replace($c,
       | '$email', '<EMAIL>', 'g'),
       | '$ip', '<IP>', 'g'),
       | '$phone', '<PHONE>', 'g')""".stripMargin.replaceAll("\n", " ")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q18_dedup_exact" -> ((s, d) =>
      TextOps.exactDedup(docs(s, d), "doc_id", "text")),
    "q19_ngram_jaccard" -> ((s, d) =>
      // exact Jaccard over all shingles (oracle parity); the default
      // entry point is the skew-guarded q47 below
      TextOps.ngramJaccardPairs(docs(s, d), "doc_id", "text", k = 3,
        threshold = 0.5, maxDocFrequency = None)),
    "q47_ngram_guarded" -> ((s, d) =>
      // DEFAULT dedup path: stop-phrase shingles (doc frequency above
      // TextOps.DefaultShingleDocFrequency) are dropped before the join,
      // bounding per-shingle pair fan-out at web scale
      TextOps.ngramJaccardPairs(docs(s, d), "doc_id", "text", k = 3,
        threshold = 0.5)),
    "q20_token_count" -> ((s, d) =>
      docs(s, d).select(
        col("doc_id"),
        size(expr(TextOps.tokensSql("text"))).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars_text"))),
    "q21_quality_score" -> ((s, d) =>
      TextOps.qualityFeatures(docs(s, d), "doc_id", "text")),
    "q22_lang_id" -> ((s, d) =>
      TextOps.langIdFeatures(docs(s, d), "doc_id", "text")),
    "q46_parsed_lang" -> ((s, d) =>
      // the SAME Scala function the crawl parse stage stamps on every
      // ParsedUrl (CrawlTopology parse stage), pinned to the SQL argmax —
      // proves the parse-stage language detector against the oracle
      docs(s, d).select(col("doc_id"),
        TextOps.predictLangUdf(col("text")).as("language"))),
    "q23_fingerprint" -> ((s, d) =>
      docs(s, d).select(
        col("doc_id"),
        expr(TextOps.canonicalFingerprintSql("text")).as("fingerprint"))),
    "q50_repetition" -> ((s, d) =>
      // Gopher-style repetitive-document gate: repeated-bigram fraction
      TextOps.repetitionFeatures(docs(s, d), "doc_id", "text")),
    "q51_sample_strata" -> ((s, d) =>
      // mixture weighting: keep 50% of en, all zh, 25% of the rest —
      // deterministic (hash-based), so the oracle reproduces it exactly
      TextOps.sampleByHash(docs(s, d), "doc_id", "lang",
        Map("en" -> 0.5, "zh" -> 1.0), defaultRate = 0.25)
        .select(col("doc_id"), col("lang"))),
    "q52_token_budget" -> ((s, d) =>
      // fill a 1000-token budget per language, longest docs first
      TextOps.packTokenBudget(docs(s, d), "doc_id", "text", "lang",
        budget = 1000)),
    "q53_pii_scrub" -> ((s, d) =>
      // scrub over a deterministic PII probe: every doc gets a synthetic
      // email + IPv4 + phone appended (same SQL on both engines), so all
      // three patterns are exercised on every row, not just on whatever
      // PII the corpus happens to contain
      docs(s, d).select(col("doc_id"),
        expr(TextOps.scrubPiiSql(piiProbe)).as("scrubbed"))),
    "q55_dedup_clusters" -> ((s, d) =>
      // pairs -> clusters: hash-min connected components over the q25
      // LSH candidate pairs; cluster_id = min doc_id in the component
      // (the canonical doc a dedup pass would keep)
      Components.connectedComponents(
        TextOps.minhashCandidates(docs(s, d), "doc_id", "text",
          shingleK = 3, numHashes = 16, bandSize = 4),
        "id_a", "id_b")
        .select(col("id").as("doc_id"), col("component").as("cluster_id"))),
    "q56_decontaminate" -> ((s, d) => {
      // test-set leakage: docs sharing any 3-shingle with the synthetic
      // "benchmark" subset (doc_id % 97 == 0); production uses k=8
      val all = docs(s, d)
      TextOps.decontaminate(all, "doc_id", "text",
        all.filter(col("doc_id") % 97 === 0), "text", k = 3)
    }),
    "q81_contamination" -> ((s, d) => {
      // the q56 leakage check flipped to the EVAL side: per benchmark
      // item, how many corpus docs share a shingle and how many overlaps
      val all = docs(s, d)
      TextOps.contaminationReport(all, "doc_id", "text",
        all.filter(col("doc_id") % 97 === 0), "doc_id", "text", k = 3)
    }),
    "q86_blocklist" -> ((s, d) => {
      // C4-style banned-wordlist stats: per-doc token and hit counts
      // against a broadcast blocklist; blocklistGate thresholds on top
      import s.implicits._
      TextOps.blocklistHits(docs(s, d), "doc_id", "text",
        Seq("slow", "big", "junk").toDF("word"), "word")
    }),
    "q85_nfc_normalize" -> ((s, d) =>
      // Unicode canonicalization through the native codegen expression:
      // a decomposed "e"+combining-acute probe is appended to every doc,
      // NFC composes it to the single-char form (char count drops by 1)
      docs(s, d).select(
        col("doc_id"),
        graft.plans.TextExpressions.nfc_normalize(
          concat(col("text"), lit(" café"))).as("clean"),
        length(concat(col("text"), lit(" café"))).cast("long")
          .as("n_raw"),
        length(graft.plans.TextExpressions.nfc_normalize(
          concat(col("text"), lit(" café")))).cast("long")
          .as("n_nfc"))),
    "q84_continuation" -> ((s, d) =>
      // Kneser-Ney continuation counts (distinct left contexts per word)
      // — the integer KN base; the discounted scoring fold is
      // NgramLm.perplexityKn (spec-tested, q65/q67 split)
      graft.operators.NgramLm.continuationCounts(docs(s, d), "text")),
    "q82_count_min" -> ((s, d) =>
      // constant-memory frequency sketch of the term stream: the whole
      // 4x64 counter grid is the result (deterministic hashing -> the
      // sketch itself oracle-hashes); point estimates = TextOps.cmsLookup
      TextOps.countMinSketch(docs(s, d), "text", depth = 4, width = 64)),
    "q83_hll_registers" -> ((s, d) =>
      // bounded-memory distinct-counting registers (deterministic HLL);
      // the float estimate fold is TextOps.hllEstimate (spec-tested
      // against the exact q42 vocabulary count)
      TextOps.hllRegisters(docs(s, d), "text", buckets = 64)),
    "q57_token_stats" -> ((s, d) =>
      // per-source token-distribution profile: histogram-based exact
      // discrete quantiles (integer arithmetic — hash-exact vs oracle)
      TextOps.tokenStats(docs(s, d), "text", "source")),
    "q59_shard_pack" -> ((s, d) =>
      // training-shard writer pass: 8 shards, 64-token packed sequences
      // (synthetic docs run ~40 tokens, so sequences span 1-2 docs)
      TextOps.shardAndPack(docs(s, d), "doc_id", "text",
        numShards = 8, seqTokens = 64)),
    "q60_dedup_corpus" -> ((s, d) =>
      // the corpus that SURVIVES dedup: q55's clusters reduced to their
      // canonical members, anti-joined against the full table
      Components.dedupedCorpus(docs(s, d), "doc_id",
        TextOps.minhashCandidates(docs(s, d), "doc_id", "text",
          shingleK = 3, numHashes = 16, bandSize = 4),
        "id_a", "id_b")
        .select(col("doc_id"), col("lang"), col("source"))),
    "q61_length_gate" -> ((s, d) =>
      // drop each language's shortest 20% by exact discrete quantile
      TextOps.stratumLengthGate(docs(s, d), "doc_id", "text", "lang",
        pNum = 1, pDen = 5)),
    "q62_incr_dedup" -> ((s, d) => {
      // continuous-crawl shape: odd doc_ids are the "new batch", even the
      // standing corpus; which new docs near-dup something already held
      val all = docs(s, d)
      TextOps.crossDedupPairs(
        all.filter(col("doc_id") % 2 === 1),
        all.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", shingleK = 3, numHashes = 16, bandSize = 4,
        threshold = 0.5)
    }),
    "q58_boilerplate" -> ((s, d) =>
      // corpus-frequent segment removal; 2-token segments + 4%-of-corpus
      // doc-frequency threshold so the synthetic vocabulary produces real
      // boilerplate at every SF (production: 10-token segments, df>=3 abs)
      TextOps.removeBoilerplate(docs(s, d), "doc_id", "text",
        segTokens = 2, minDocFrequency = 3, minDocFraction = Some(0.04))),
    "q68_semantic_dedup" -> ((s, d) => {
      // SemDeDup: near-dup pairs inside k-means cells (here the q34
      // hash-sampled centroid set, so the oracle can reproduce the
      // assignment); pair frame feeds Components like the MinHash path
      val e = embs(s, d)
      Similarity.semanticDedupPairs(
        e, "vec_id", "embedding",
        e.filter(col("vec_id") % 100 === 0), "vec_id", "embedding",
        dim = 64, threshold = 0.3)
    }),
    "q67_bigram_counts" -> ((s, d) =>
      // the perplexity filter's trainable statistic (NgramLm.fit input);
      // interpolated scoring itself is float math, spec-tested
      graft.operators.NgramLm.bigramCounts(docs(s, d), "text")),
    "q74_cluster_sizes" -> ((s, d) =>
      // dedup audit: the cluster-size profile over the q25 candidate
      // graph (a fat tail here means boilerplate/crawler traps, not
      // ordinary duplication)
      Components.clusterSizeProfile(
        TextOps.minhashCandidates(docs(s, d), "doc_id", "text",
          shingleK = 3, numHashes = 16, bandSize = 4),
        "id_a", "id_b")),
    "q73_source_gate" -> ((s, d) =>
      // domain-level gate: drop sources with < 5 docs or mean doc length
      // under 50 tokens (integer cross-multiplied mean — engine-exact)
      TextOps.stratumGate(docs(s, d), "doc_id", "text", "source",
        minDocs = 5, minMeanTokens = 50)),
    "q72_keeper_quality" -> ((s, d) => {
      // quality-aware dedup representative: per cluster keep the LONGEST
      // member (token count, min doc_id tie-break) instead of the
      // min-id default — the "which near-dup survives" policy seam
      val all = docs(s, d)
      Components.dedupClustersBy(
        TextOps.minhashCandidates(all, "doc_id", "text",
          shingleK = 3, numHashes = 16, bandSize = 4),
        "id_a", "id_b",
        all.select(col("doc_id"),
          size(expr(TextOps.tokensSql("text"))).cast("long")
            .as("n_tokens")),
        "doc_id", "n_tokens")
        .select(col("id").as("doc_id"), col("cluster_id"),
          col("n_tokens"), col("keep"))
    }),
    "q71_fixed_sample" -> ((s, d) =>
      // exactly 20 docs per language by salted hash order — fixed-size
      // held-out sets no matter how skewed the strata are
      TextOps.sampleFixedPerStratum(docs(s, d), "doc_id", "lang", n = 20)
        .select(col("doc_id"), col("lang"), col("sample_rank"))),
    "q70_split_assign" -> ((s, d) =>
      // deterministic 90/5/5 train/val/test assignment; salted hash gate
      // so it stays independent of q51's sampling buckets
      TextOps.assignSplit(docs(s, d), "doc_id",
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
        .select(col("doc_id"), col("split"))),
    "q112_leakage_split" -> ((s, d) =>
      // cluster-integral train/val/test: every q55 near-dup cluster lands
      // wholly in ONE split (salted hash of the CLUSTER id) — the
      // doc-level q70 gate can put two near-duplicates on opposite sides
      // of the train/test fence, which is the leakage dedup exists to stop
      Components.leakageSafeSplits(docs(s, d), "doc_id",
        TextOps.minhashCandidates(docs(s, d), "doc_id", "text",
          shingleK = 3, numHashes = 16, bandSize = 4),
        "id_a", "id_b",
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))),
    "q109_label_store" -> ((s, d) => {
      // the DURABLE standing-label store (LabelStore): q107's pair
      // batches folded in sequence as committed store batches, then
      // compacted (batch 1 into a snapshot, batch 2 live) so the
      // labels() read crosses the snapshot/live seam — the oracle pins
      // the full protocol (fold, marker visibility, compaction,
      // min-resolution) against from-scratch recursive CC.
      import s.implicits._
      import graft.operators.LabelStore
      val ids = docs(s, d).select(col("doc_id"))
      val oldPairs = ids.filter(col("doc_id") % 5 =!= 0)
        .select(col("doc_id").as("a"),
          (col("doc_id") - col("doc_id") % 5).as("b"))
      val newPairs = ids.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("a"), (col("doc_id") + 5).as("b"))
        .union(ids.filter(col("doc_id") % 100 === 0)
          .select((col("doc_id") + 1000).as("a"), (col("doc_id") + 1).as("b")))
        .union(Seq((2000L, 2001L)).toDF("a", "b"))
      val base = java.nio.file.Files
        .createTempDirectory("graft_labelstore_q_").toString
      TextQueries.guardGate(base) {
      val root = base + "/store"
      val meta = LabelStore.Meta(buckets = 8)
      graft.util.StageTimer.time("fold_b1")(
        LabelStore.fold(s, root, oldPairs, "a", "b", batchId = 1L, meta))
      graft.util.StageTimer.time("fold_b2")(
        LabelStore.fold(s, root, newPairs, "a", "b", batchId = 2L, meta))
      graft.util.StageTimer.time("compact")(
        LabelStore.compact(s, root, keepNewest = 1))
      materializedWithCleanup(LabelStore.labels(s, root)) {
        deleteRecursively(base)
      }
      }
    }),
    "q108_bucketed_join" -> ((s, d) => {
      // write-once bucketed layout, then an id-keyed join with ZERO
      // exchanges (CorpusLayout): documents and embeddings land bucketed
      // + bucket-sorted on their id into the session catalog, and the
      // doc↔embedding attach join reads matching buckets side by side.
      // The oracle pins the VALUES; the no-Exchange plan shape is pinned
      // in CorpusLayoutSpec (PlanChecks over the executed plan).
      import graft.operators.CorpusLayout
      val tag = java.util.UUID.randomUUID.toString.replace("-", "")
      val base = java.nio.file.Files
        .createTempDirectory("graft_bucketed_").toString
      TextQueries.guardGate(base) {
      val ta = s"graft_docs_$tag"
      val tb = s"graft_embs_$tag"
      CorpusLayout.writeBucketed(
        docs(s, d).select(col("doc_id"), col("n_chars"),
          expr(s"size(${TextOps.tokensSql("text")})").cast("long")
            .as("tok_cnt")),
        ta, s"$base/a", "doc_id", nBuckets = 8, sortCols = Seq("doc_id"))
      CorpusLayout.writeBucketed(
        embs(s, d).select(col("vec_id"),
          col("label").cast("long").as("label")),
        tb, s"$base/b", "vec_id", nBuckets = 8, sortCols = Seq("vec_id"))
      materializedWithCleanup(
        CorpusLayout.bucketedJoin(s, ta, tb, "doc_id", "vec_id")
          .select(col("doc_id"), col("n_chars"), col("tok_cnt"),
            col("label"))) {
        s.sql(s"DROP TABLE IF EXISTS $ta")
        s.sql(s"DROP TABLE IF EXISTS $tb")
        deleteRecursively(base)
      }
      }
    }),
    "q107_incr_components" -> ((s, d) => {
      // INCREMENTAL cluster maintenance (Components.incrementalComponents):
      // standing labels from an "old" pair batch, then a new batch that
      // splices standing clusters together, attaches new nodes to old
      // clusters, and introduces brand-new 2-node clusters. The oracle
      // re-derives full CC over old ∪ new with a recursive min-label
      // walk, so the gate pins that the incremental fold equals the
      // from-scratch batch answer — cross-cluster merges, label
      // downgrades, and untouched-cluster passthrough included.
      import s.implicits._
      val ids = docs(s, d).select(col("doc_id"))
      val oldPairs = ids.filter(col("doc_id") % 5 =!= 0)
        .select(col("doc_id").as("a"),
          (col("doc_id") - col("doc_id") % 5).as("b"))
      // stage attribution (StageTimer; Bench-only): the from-scratch base
      // CC over the old batch is the data-proportional stage; the
      // incremental fold's cost tracks the TOUCHED subgraph, not the
      // corpus — the separation the sf1 scaling number needs
      val standing = graft.util.StageTimer.time("base_cc")(
        Components.connectedComponents(oldPairs, "a", "b"))
      val newPairs = ids.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("a"), (col("doc_id") + 5).as("b"))
        .union(ids.filter(col("doc_id") % 100 === 0)
          .select((col("doc_id") + 1000).as("a"), (col("doc_id") + 1).as("b")))
        .union(Seq((2000L, 2001L)).toDF("a", "b"))
      graft.util.StageTimer.time("incremental")(
        Components.incrementalComponents(
          standing, "id", "component", newPairs, "a", "b"))
    }),
    "q106_hybrid_rrf" -> ((s, d) => {
      // hybrid retrieval: the BM25 integer-core lexical arm (q69
      // machinery) and the brute-force cosine dense arm (q27 machinery)
      // fused per query with fixed-point Reciprocal Rank Fusion — the
      // seed-expansion query a curation pipeline runs against the whole
      // corpus. Queries are the doc_id%50 seeds; their "text" is the
      // document's 5-token lead-in, their vector the doc's embedding
      // (vec_id == doc_id in the driver tables).
      import graft.operators.HybridRetrieval
      val dd = docs(s, d)
      val q = dd.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("query_id"),
          expr("array_join(slice(split(trim(lower(text)), '\\\\s+'), 1, 5), ' ')")
            .as("qtext"))
      val lex = HybridRetrieval.lexicalRank(
        dd, "doc_id", "text", q, "query_id", "qtext",
        k = 20, excludeSelf = true)
      val e = embs(s, d)
      val dense = Similarity.cosineTopK(
        e.filter(col("vec_id") % 50 === 0), e,
        "vec_id", "embedding", dim = 64, k = 20)
      HybridRetrieval.rrfFuse(
        lex, "doc_id", "lex_rn", dense, "neighbor_id", "rn",
        k0 = 60, topK = 10)
    }),
    "q69_bm25_match" -> ((s, d) => {
      // BM25 retrieval's integer candidate statistics (inverted-index
      // join + per-pair aggregates); the float idf/score fold on top is
      // spec-tested (Bm25Spec), same split as q65/q67
      import s.implicits._
      val q = Seq((1L, "spark window agg"), (2L, "hash join merge"),
        (3L, "stream batch vector")).toDF("query_id", "qtext")
      Bm25.matchStats(docs(s, d), "doc_id", "text", q, "query_id", "qtext")
    }),
    "q66_bpe_vocab" -> ((s, d) =>
      // the BPE trainer's input statistic: corpus TERM frequencies
      // (q42 counts DOC frequencies — different measure). Training
      // itself (BpeTrainer.trainMerges) is iterative argmax, spec-tested
      graft.operators.BpeTrainer.wordFrequencies(docs(s, d), "text")),
    "q65_quality_feats" -> ((s, d) =>
      // the quality classifier's featurization (hashed bag-of-words,
      // tf-normalized) — the oracle-checkable half of QualityClassifier;
      // training/scoring are float-GD and spec-tested instead
      graft.operators.QualityClassifier.featurize(
        docs(s, d), "doc_id", "text", hashDim = 4096)),
    "q64_dup_spans" -> ((s, d) =>
      // Lee-et-al-style exact duplicated substring detection: every
      // 5-token window hashed, hashes occurring >=2 times anywhere in
      // the corpus are duplicated spans (within- or cross-doc)
      TextOps.duplicatedWindows(docs(s, d), "doc_id", "text", w = 5)),
    "q75_span_excision" -> ((s, d) =>
      // the rebuild half of q64: every token covered by a duplicated
      // window excised, remaining tokens re-joined positionally
      TextOps.removeDuplicatedSpans(docs(s, d), "doc_id", "text", w = 5)),
    "q76_edit_verified" -> ((s, d) =>
      // near-dup verified by banded edit distance over LSH candidates —
      // the short-document complement of Jaccard verification (q31)
      TextOps.editVerifiedPairs(docs(s, d), "doc_id", "text",
        shingleK = 3, numHashes = 16, bandSize = 4, maxEdits = 20)),
    "q77_keywords" -> ((s, d) =>
      // TF-IDF's integer core: per-doc tf, corpus df, stopword guard,
      // deterministic (tf desc, df asc, term) top-5; the float
      // tf·ln(N/df) fold is TextOps.tfidfKeywords (spec-tested).
      // 0.9 guard: the synthetic 30-word vocabulary puts most terms in
      // most docs, so the production 0.5 default would gate nearly all
      TextOps.keywordCandidates(docs(s, d), "doc_id", "text",
        topK = 5, maxDocFrequencyFrac = 0.9)),
    "q78_keep_first" -> ((s, d) =>
      // CCNet-style segment dedup: repeated segments keep only their
      // first (doc_id, pos) occurrence corpus-wide; 2-token segments so
      // the synthetic vocabulary produces real repeats at every SF
      TextOps.keepFirstSegmentDedup(docs(s, d), "doc_id", "text",
        segTokens = 2)),
    "q79_link_rank" -> ((s, d) => {
      // fixed-point integer PageRank (3 rounds) over a deterministic
      // synthetic outlink graph: doc i links to (31i + 7k) mod N for
      // k = 1..3 — arithmetic both engines evaluate identically
      val dd = docs(s, d)
      val edges = dd.select(col("doc_id"))
        .crossJoin(broadcast(dd.select(count(lit(1)).as("n"))))
        .select(col("doc_id").as("src"),
          explode(expr("array(1L, 2L, 3L)")).as("k"), col("n"))
        .select(col("src"),
          ((col("src") * 31 + col("k") * 7) % col("n")).as("dst"))
      graft.operators.LinkRank.pageRankFixedPoint(edges, "src", "dst",
        iters = 3)
    }),
    "q80_domain_rank" -> ((s, d) => {
      // the crawl integration end-to-end: synthetic page URLs (doc i on
      // site i%40 links to sites (7i+k)%40) -> DomainRank's native-PLD
      // edge derivation -> the q79 fixed-point rank, keyed by domain
      val links = docs(s, d)
        .select(col("doc_id"), explode(expr("array(1L, 2L)")).as("k"))
        .select(
          concat(lit("http://site"), (col("doc_id") % 40).cast("string"),
            lit(".com/p"), col("doc_id").cast("string")).as("src_url"),
          concat(lit("http://site"),
            ((col("doc_id") * 7 + col("k")) % 40).cast("string"),
            lit(".com/q"), col("doc_id").cast("string")).as("dst_url"))
      graft.crawl.DomainRank.domainRank(links, "src_url", "dst_url",
        iters = 3)
    }),
    "q88_dsir_scores" -> ((s, d) => {
      // DSIR importance scores: target = the q56 synthetic "benchmark"
      // slice (doc_id % 97 == 0); fixed-point likelihood ratios over 128
      // hashed-token buckets (the float log-sum fold is spec-tested —
      // the q65/q67 integer/float split)
      val all = docs(s, d)
      TextOps.dsirScores(all, "doc_id", "text",
        all.filter(col("doc_id") % 97 === 0), "text")
    }),
    "q89_temperature_mix" -> ((s, d) =>
      // T=2 temperature-flattened per-source sampling shares, all-integer
      // (isqrt weights, ppm shares) so the plan table oracle-hashes
      graft.operators.MixturePlanner.temperaturePlan(
        docs(s, d), "source", "text")),
    "q90_novelty" -> ((s, d) =>
      // inverse-duplication signal: share of a doc's distinct 3-shingles
      // with corpus document-frequency 1
      TextOps.noveltyScores(docs(s, d), "doc_id", "text", k = 3)),
    "q99_fertility" -> ((s, d) =>
      // tokenizer fertility per language: pre-tokens per 100 whitespace
      // words — the "how much does this language cost to tokenize"
      // statistic behind per-language vocab sizing and byte-premium
      // mixture corrections; one partial->final aggregate to language
      // cardinality, integer fixed-point (q35's PRE-token regex)
      docs(s, d).groupBy(col("lang"))
        .agg(sum(TextOps.preTokenCount(col("text"))).as("n_pretokens"),
          sum(size(expr(TextOps.tokensSql("text"))).cast("long"))
            .as("n_words"))
        .select(col("lang"), col("n_pretokens"), col("n_words"),
          expr("(100 * n_pretokens) div greatest(n_words, 1)")
            .as("fertility_pct"))),
    "q115_sig_retire" -> ((s, d) => {
      // RIGHT-TO-BE-FORGOTTEN through the durable signature store: two
      // data batches, a tombstone batch retiring every 10th doc, a
      // re-append resurrecting half of them, then a compaction that
      // makes the deletes PHYSICAL (applied tombstones + covered dirs
      // reclaimed). The oracle prices the end state from scratch over
      // the survivors (doc_id % 20 <> 10), so merge-on-read exclusion,
      // tombstone recency (re-append wins), and compact-time
      // application all sit behind one hash gate.
      import graft.operators.{CorpusIngest, SignatureIndexStore}
      val cfg = CorpusIngest.Config()
      val all = docs(s, d)
      val base = java.nio.file.Files
        .createTempDirectory("graft-q115").toString
      TextQueries.guardGate(base) {
      val root = base + "/store"
      val meta = SignatureIndexStore.Meta(
        cfg.indexBuckets, cfg.numHashes, cfg.bandSize)
      // ONE signature pass over the corpus; the batches slice it
      val sigs = CorpusIngest.signatureIndex(all, "doc_id", "text", cfg)
        .localCheckpoint(true)
      def sigsOf(f: org.apache.spark.sql.Column) = sigs.filter(f)
      // stage attribution (StageTimer; Bench-only): four store commits
      // + compaction + read behind one timed query
      graft.util.StageTimer.time("append_b0")(
        SignatureIndexStore.append(s, root,
          sigsOf(col("doc_id") % 2 === 0), 0L, meta))
      graft.util.StageTimer.time("append_b1")(
        SignatureIndexStore.append(s, root,
          sigsOf(col("doc_id") % 2 === 1), 1L, meta))
      graft.util.StageTimer.time("retire")(
        SignatureIndexStore.retire(s, root,
          all.filter(col("doc_id") % 10 === 0).select("doc_id"),
          "doc_id", 2L))
      graft.util.StageTimer.time("resurrect_b3")(
        SignatureIndexStore.append(s, root,
          sigsOf(col("doc_id") % 20 === 0), 3L, meta))
      graft.util.StageTimer.time("compact")(
        SignatureIndexStore.compact(s, root, keepNewest = 1))
      materializedWithCleanup(
        SignatureIndexStore.sigsView(s, root)
          .select(col("doc_id"),
            concat_ws(",", col("sig").cast("array<string>")).as("sig"))) {
        deleteRecursively(base)
      }
      }
    }),
    "q116_ann_retire" -> ((s, d) => {
      // retirement through the durable ANN index: grow the store the way
      // the loop grows it, tombstone every 10th vector, re-admit the
      // %3=0 third in a LATER batch (tombstone recency), compact so the
      // retire batch is covered (physical reclamation), then query
      // exhaustively — the result must equal brute-force cosine top-K
      // over exactly the surviving corpus.
      import graft.operators.AnnIndexStore
      val e = embs(s, d)
      val base = java.nio.file.Files
        .createTempDirectory("graft-q116").toString
      TextQueries.guardGate(base) {
      val root = base + "/store"
      graft.util.StageTimer.time("build")(
        AnnIndexStore.build(s, root, e.filter(col("vec_id") % 3 === 1),
          "vec_id", "embedding", dim = 64, numCentroids = 8, lloydRounds = 1))
      graft.util.StageTimer.time("append_b1")(
        AnnIndexStore.append(s, root,
          e.filter(col("vec_id") % 3 === 2), "vec_id", "embedding", 1L))
      graft.util.StageTimer.time("retire")(
        AnnIndexStore.retire(s, root,
          e.filter(col("vec_id") % 10 === 0).select("vec_id"), "vec_id", 2L))
      graft.util.StageTimer.time("resurrect_b3")(
        AnnIndexStore.append(s, root,
          e.filter(col("vec_id") % 3 === 0), "vec_id", "embedding", 3L))
      graft.util.StageTimer.time("compact")(
        AnnIndexStore.compact(s, root, keepNewest = 1))
      materializedWithCleanup(
        AnnIndexStore.query(s, root, e.filter(col("vec_id") % 50 === 0),
          "vec_id", "embedding", k = 5, nprobe = 8)
          .select("query_id", "neighbor_id", "cos", "rn")) {
        deleteRecursively(base)
      }
      }
    }),
    "q117_label_retire" -> ((s, d) => {
      // retirement through the durable label store: retire each
      // 25-block's MINIMUM id (the label itself) — survivors must
      // relabel to the new minimum (invariant 1's carve-out), a fold
      // AFTER the retire must merge against the relabeled clusters, and
      // compaction must preserve it all while reclaiming the applied
      // tombstones. Oracle: full CC over the old pairs, drop the retired
      // set, per-cluster min-survivor relabel, then a second recursive
      // walk folding the post-retire pairs over survivor star edges.
      import graft.operators.LabelStore
      val ids = docs(s, d).select(col("doc_id"))
      val oldPairs = ids.filter(col("doc_id") % 5 =!= 0)
        .select(col("doc_id").as("a"),
          (col("doc_id") - col("doc_id") % 5).as("b"))
      val retired = ids.filter(col("doc_id") % 25 === 0)
        .select(col("doc_id").as("id"))
      val newPairs = ids.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 1).as("a"), (col("doc_id") + 6).as("b"))
      val base = java.nio.file.Files
        .createTempDirectory("graft-q117").toString
      TextQueries.guardGate(base) {
      val root = base + "/store"
      val meta = LabelStore.Meta(buckets = 8)
      graft.util.StageTimer.time("fold_b1")(
        LabelStore.fold(s, root, oldPairs, "a", "b", 1L, meta))
      graft.util.StageTimer.time("retire")(
        LabelStore.retire(s, root, retired, "id", 2L))
      graft.util.StageTimer.time("fold_b3")(
        LabelStore.fold(s, root, newPairs, "a", "b", 3L, meta))
      graft.util.StageTimer.time("compact")(
        LabelStore.compact(s, root, keepNewest = 1))
      materializedWithCleanup(LabelStore.labels(s, root)) {
        deleteRecursively(base)
      }
      }
    }),
    "q120_event_ttl" -> ((s, d) => {
      // EVENT-TIME streaming retention (CorpusIngest.eventTimeFeed)
      // behind an oracle: 8 corpus slices with quadratically-spaced
      // capture times, the feed fired for batches 1..8. The oracle
      // recomputes the full expiry SCHEDULE — clock = newest slice time
      // below the firing batch; a slice fires ONCE, at the first batch
      // whose clock is a TTL past its newest capture. The quadratic
      // spacing makes slices 0-2 fire TOGETHER at batch 4 (time, not
      // count) and slice 7 never fire — both behind the hash.
      import graft.operators.CorpusIngest
      val base = java.nio.file.Files
        .createTempDirectory("graft-q120").toString
      TextQueries.guardGate(base) {
      val dir = base + "/accepted"
      val sliced = docs(s, d).select(col("doc_id"),
        pmod(col("doc_id"), lit(8L)).cast("long").as("src_batch"),
        (pmod(col("doc_id"), lit(8L)) * pmod(col("doc_id"), lit(8L)) * 100L
          + pmod(col("doc_id"), lit(7L))).cast("long").as("t"))
        .localCheckpoint(true)
      // 8 independent slice writes off the SAME pinned frame into
      // disjoint dirs — overlap them (guide §2.6); each is a tiny
      // fixed-cost-bound job, so the wall is committer latency, not data
      graft.util.Par.run((0 until 8).map { k => () =>
        sliced.filter(col("src_batch") === k)
          .select(col("doc_id"), col("t"))
          .write.mode("overwrite").parquet(s"$dir/batch=$k")
      }: _*)
      val feed = CorpusIngest.eventTimeFeed(s, dir, "doc_id", "t",
        ttlMs = 500L)
      // fire in order, pinning each journaled set before the next call
      // reclaims earlier journals
      val pieces = (1 to 8).flatMap { b =>
        feed(b.toLong).map(df => df.select(col("id").as("doc_id"),
          col("srcBatch").as("src_batch"),
          lit(b.toLong).as("fired_at")).localCheckpoint(true))
      }
      val out = pieces.reduceOption(_ unionByName _).getOrElse {
        import org.apache.spark.sql.types._
        s.createDataFrame(
          s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField("doc_id", LongType),
            StructField("src_batch", LongType),
            StructField("fired_at", LongType))))
      }
      materializedWithCleanup(out) { deleteRecursively(base) }
      }
    }),
    "q121_zorder_skip" -> ((s, d) => {
      // Z-order layout + footer-stats file skipping (DataSkipping)
      // behind an oracle: lay the events table out Morton-clustered on
      // (user_id, ts) — 32 files, per-file min/max sidecar from the
      // parquet footers — then answer a 2-D rectangle aggregation
      // through prunedRead. The skip layer decides which files are
      // opened at all; the result must still be value-identical to the
      // oracle's full-scan filter (prune soundness IS the gate — the
      // files-read fraction is pinned in DataSkippingSpec).
      import graft.operators.DataSkipping
      import graft.operators.DataSkipping.ColRange
      val base = java.nio.file.Files
        .createTempDirectory("graft-q121").toString
      TextQueries.guardGate(base) {
      val dir = base + "/events_z"
      DataSkipping.writeZOrdered(
        Tables.events(s, d), dir, Seq("user_id", "ts"), nFiles = 32)
      // 2024-01-08T00:00:00Z .. 2024-01-22T00:00:00Z, epoch micros
      val (df, _) = DataSkipping.prunedRead(s, dir, Seq(
        ColRange("user_id", 3L, 9L),
        ColRange("ts", 1704672000000000L, 1705881600000000L)))
      materializedWithCleanup(
        df.groupBy(col("event_type")).agg(
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("sum_value"))) { deleteRecursively(base) }
      }
    }),
    "q101_store_dedup" -> ((s, d) => {
      // q62's incremental-dedup semantics driven through the DURABLE
      // bucketed SignatureIndexStore (append → bucket-pruned matches)
      // instead of an in-memory index frame — the round-9 production
      // layout behind the driver's own oracle gate. Even doc_ids seed
      // the standing index; odd doc_ids are the incoming batch.
      import graft.operators.{CorpusIngest, SignatureIndexStore}
      val cfg = CorpusIngest.Config()
      val all = docs(s, d)
      val root = java.nio.file.Files
        .createTempDirectory("graft-q101").toString
      TextQueries.guardGate(root) {
      graft.util.StageTimer.time("append_b0")(
        SignatureIndexStore.append(s, root,
          CorpusIngest.signatureIndex(
            all.filter(col("doc_id") % 2 === 0), "doc_id", "text", cfg),
          0L, SignatureIndexStore.Meta(
            cfg.indexBuckets, cfg.numHashes, cfg.bandSize)))
      SignatureIndexStore.matches(s, root,
        CorpusIngest.signatureIndex(
          all.filter(col("doc_id") % 2 === 1), "doc_id", "text", cfg),
        cfg.threshold)
      }
    }),
    "q103_ann_ingest_gate" -> ((s, d) => {
      // the round-10 loop composition: a standing ANN index GROWN the way
      // the ingest loop grows it (build on the first batch, append the
      // second), then the semantic cross-dedup judgment for a new batch —
      // nearest standing neighbor + thresholded verdict (the
      // CorpusIngest.AnnGate semantics). Exhaustive probing makes the
      // store query exactly brute-force top-1 over the standing vectors,
      // so build → append → size-switched query → gate all sit behind
      // this oracle (the q101 discipline, ANN twin).
      import graft.operators.AnnIndexStore
      val e = embs(s, d)
      val root = java.nio.file.Files
        .createTempDirectory("graft-q103").toString
      TextQueries.guardGate(root) {
      // stage attribution (StageTimer; Bench-only): the standing-store
      // BUILD (quantizer + first commit) and APPEND are the
      // data-proportional stages; the residual (total minus stages) is
      // the lazy size-switched query + gate projection
      graft.util.StageTimer.time("build")(
        AnnIndexStore.build(s, root, e.filter(col("vec_id") % 3 === 1),
          "vec_id", "embedding", dim = 64, numCentroids = 8, lloydRounds = 1))
      graft.util.StageTimer.time("append")(
        AnnIndexStore.append(s, root,
          e.filter(col("vec_id") % 3 === 2), "vec_id", "embedding", 1L))
      AnnIndexStore.query(s, root, e.filter(col("vec_id") % 3 === 0),
        "vec_id", "embedding", k = 1, nprobe = 8)
        .select(col("query_id"), col("neighbor_id"), col("cos"),
          (col("cos") >= 0.3).cast("bigint").as("is_dup"))
      }
    }),
    "q104_semantic_keepers" -> ((s, d) => {
      // the within-batch SemDeDup keeper SET (CorpusIngest.annStage's
      // round-11 batch pass, surfaced as a standalone operator): cosine
      // near-dup pairs (q33 machinery) → transitive clusters → keep each
      // cluster's minimum id; every keeper reports how many dups its
      // cluster collapsed. Set semantics incl. transitivity and the
      // min-id tie are what the oracle pins — pair-level gates (q33/q68)
      // cannot catch a broken keeper selection.
      val e = embs(s, d)
      val pairs = Similarity.cosineDedupPairs(
        e, "vec_id", "embedding", dim = 64, numPlanes = 16, threshold = 0.3)
      val cc = Components.connectedComponents(pairs, "id_a", "id_b")
        .localCheckpoint(true) // one label-propagation run feeds both uses
      val sizes = cc.groupBy(col("component")).agg(count(lit(1)).as("__n"))
      e.select(col("vec_id"))
        .join(cc.filter(col("id") =!= col("component"))
            .select(col("id").as("__drop")),
          col("vec_id") === col("__drop"), "left_anti")
        .join(sizes.withColumnRenamed("component", "__comp"),
          col("vec_id") === col("__comp"), "left")
        .select(col("vec_id").as("keeper_id"),
          coalesce(col("__n") - 1, lit(0L)).as("dups_removed"))
    }),
    "q100_fp_tiers" -> ((s, d) =>
      // CCNet-style per-stratum head/middle/tail tiers via the EXACT
      // integer histogram-quantile (TextOps.fixedPointBuckets — the
      // machinery perplexityBuckets assigns tiers with, oracle-gated
      // here on a fixed-point score both engines can derive: milli-chars
      // per whitespace token)
      TextOps.fixedPointBuckets(
        docs(s, d).select(col("doc_id"), col("lang"),
          expr("(length(text) * 1000) div " +
            s"greatest(size(${TextOps.tokensSql("text")}), 1)")
            .cast("long").as("mtl_fp")),
        "mtl_fp", "lang", buckets = 3, "tier")),
    "q92_gopher_rep" -> ((s, d) =>
      // Gopher §A1.1 within-doc repetition: top-bigram mass fraction +
      // duplicated-5-token-window occurrence fraction (integer fixed
      // point); complements q50 (distinct-bigram ratio) and q64
      // (cross-doc spans)
      TextOps.gopherRepetition(docs(s, d), "doc_id", "text", w = 5)),
    "q93_source_overlap" -> ((s, d) =>
      // corpus-composition audit: distinct 3-token lead-in fingerprints
      // shared per source pair (the loose probe — md5-of-text is the
      // strict form, vacuous on the all-distinct synthetic corpus)
      TextOps.sourceOverlapMatrix(docs(s, d),
        md5(expr("concat_ws(' ', slice(" +
          TextOps.tokensSql("text") + ", 1, 3))")),
        "source")),
    "q63_embed_gram" -> ((s, d) =>
      // corpus second-moment (Gram) matrix of globally-int8-quantized
      // embeddings: ONE typed-Aggregator pass, shuffle = one
      // (dim^2+dim+1)-long array per task regardless of corpus size;
      // integer sums are order-independent -> exact oracle parity. This
      // is the distributed half of PCA (Similarity.pcaFitProject)
      Similarity.gramEntries(
        Similarity.quantizeGlobal(embs(s, d), "embedding", "qv"),
        "qv", dim = 64)),
    "q114_embed_outliers" -> ((s, d) =>
      // prototypicality pruning: per label, flag the 5% of embeddings
      // farthest (integer squared-L2 on q63's int8 quantization) from the
      // label's fixed-point centroid — exact histogram quantile fence,
      // ties on the fence stay kept
      Similarity.embeddingOutliers(embs(s, d), "vec_id", "embedding",
        "label", pNum = 1, pDen = 20)),
    "q24_minhash_sig" -> ((s, d) =>
      // sig surfaced as a comma-joined string: the driver's pandas-based
      // comparator cannot hash/sort array cells. nullif: a sub-shingleK
      // doc yields an all-null sig, which concat_ws renders "" but
      // DuckDB's array_to_string renders NULL — canonicalize to NULL
      // (a real sig of 16 longs can never be empty)
      TextOps.minhashSignatures(docs(s, d), "doc_id", "text",
        shingleK = 3, numHashes = 16)
        .select(col("doc_id"),
          nullif(concat_ws(",", col("sig").cast("array<string>")), lit(""))
            .as("sig"))),
    "q25_minhash_lsh_pairs" -> ((s, d) =>
      TextOps.minhashCandidates(docs(s, d), "doc_id", "text",
        shingleK = 3, numHashes = 16, bandSize = 4)),
    "q26_simhash" -> ((s, d) =>
      TextOps.simhashes(docs(s, d), "doc_id", "text")),
    "q27_cosine_topk" -> ((s, d) => {
      val e = embs(s, d)
      Similarity.cosineTopK(
        e.filter(col("vec_id") % 50 === 0), e,
        "vec_id", "embedding", dim = 64, k = 5)
        .select("query_id", "neighbor_id", "cos", "rn")
    }),
    "q102_ann_store" -> ((s, d) => {
      // the DURABLE standing ANN index (AnnIndexStore: train coarse
      // quantizer, cell-partitioned append, cell-pruned query) driven
      // with exhaustive probing (nprobe = cells) — the search then
      // covers every cell, so the result is EXACTLY brute-force cosine
      // top-K regardless of the (float, non-oracle-stable) centroid
      // training, and q27's oracle gates the whole store path
      import graft.operators.AnnIndexStore
      val e = embs(s, d)
      val root = java.nio.file.Files
        .createTempDirectory("graft-q102").toString
      TextQueries.guardGate(root) {
      // one Lloyd round: training quality is irrelevant under
      // exhaustive probing (cells partition candidates, never drop them)
      AnnIndexStore.build(s, root, e, "vec_id", "embedding",
        dim = 64, numCentroids = 8, lloydRounds = 1)
      AnnIndexStore.query(s, root, e.filter(col("vec_id") % 50 === 0),
        "vec_id", "embedding", k = 5, nprobe = 8)
        .select("query_id", "neighbor_id", "cos", "rn")
      }
    }),
    "q28_ann_lsh" -> ((s, d) => {
      val e = embs(s, d)
      Similarity.annTopK(
        e.filter(col("vec_id") % 50 === 0), e,
        "vec_id", "embedding", dim = 64, numPlanes = 16, k = 3)
        .select("query_id", "neighbor_id", "bucket", "cos", "rn")
    }),
    "q29_embed_stats" -> ((s, d) =>
      embs(s, d)
        .select(col("label"),
          graft.plans.VectorExpressions.norm(col("embedding")).as("norm"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          min(col("norm")).as("min_norm"),
          max(col("norm")).as("max_norm"))),
    "q31_minhash_dedup" -> ((s, d) =>
      TextOps.minhashDedupPairs(docs(s, d), "doc_id", "text",
        shingleK = 3, numHashes = 16, bandSize = 4, threshold = 0.5)),
    "q49_minhash_est" -> ((s, d) =>
      // signature-only dedup: jaccard estimated from matching sig
      // positions, no second pass over the raw text (the scale default
      // when a ±1/sqrt(K) tolerance is acceptable)
      TextOps.minhashDedupPairsApprox(docs(s, d), "doc_id", "text",
        shingleK = 3, numHashes = 16, bandSize = 4, threshold = 0.5)),
    "q30_multimodal_meta" -> ((s, d) =>
      // binary-column plumbing: opaque bytes + deterministic fake "decode"
      docs(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("content"))
        .select(
          col("doc_id"),
          length(col("content")).cast("long").as("n_bytes"),
          (length(col("content")).cast("long") % 640).as("width"),
          (length(col("content")).cast("long") % 480).as("height"),
          substring(md5(col("content")), 1, 6).as("format_tag"))),
    "q33_cosine_dedup" -> ((s, d) =>
      Similarity.cosineDedupPairs(embs(s, d), "vec_id", "embedding",
        dim = 64, numPlanes = 16, threshold = 0.3)),
    "q34_ivf_ann" -> ((s, d) => {
      val e = embs(s, d)
      Similarity.ivfTopK(
        e.filter(col("vec_id") % 50 === 0), e,
        e.filter(col("vec_id") % 100 === 0),
        "vec_id", "embedding", "vec_id", "embedding", dim = 64, k = 3)
    }),
    "q48_ivf_nprobe" -> ((s, d) => {
      // multi-probe IVF: nprobe=2 recovers neighbors just across the
      // query's cell boundary (the standard recall/cost dial)
      val e = embs(s, d)
      Similarity.ivfTopKProbed(
        e.filter(col("vec_id") % 50 === 0), e,
        e.filter(col("vec_id") % 100 === 0),
        "vec_id", "embedding", "vec_id", "embedding",
        dim = 64, k = 3, nprobe = 2)
    }),
    "q35_token_bpe" -> ((s, d) =>
      // pre-tokens (GPT-2-style pretokenizer units), not merged BPE —
      // column name kept for oracle stability
      docs(s, d).select(col("doc_id"),
        TextOps.preTokenCount(col("text")).as("n_bpe_tokens"))),
    "q36_rolling_fingerprint" -> ((s, d) =>
      docs(s, d).select(col("doc_id"),
        TextOps.rollingFingerprintUdf(col("text")).as("rhash"))),
    "q37_simhash_dedup" -> ((s, d) =>
      TextOps.simhashDedupPairs(docs(s, d), "doc_id", "text",
        shingleK = 3, maxHamming = 3)),
    "q41_quantize" -> ((s, d) =>
      embs(s, d)
        .select(col("vec_id"),
          Similarity.quantizeUdf(col("embedding")).as("q"))
        .select(col("vec_id"), col("q._1").as("scale"),
          col("q._2").as("qvec"))),
    "q42_vocab" -> ((s, d) =>
      docs(s, d)
        .select(explode(expr(
          s"array_distinct(${TextOps.tokensSql("lower(text)")})")).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("token").asc)
        .limit(100)),
    "q45_corpus_clean" -> ((s, d) =>
      TextOps.cleanCorpus(docs(s, d), "doc_id", "text",
        minTokens = 5, minAlphaRatio = 0.5, lang = "en"))
  )

  val oracleSql: Map[String, String] = Map(
    "q18_dedup_exact" ->
      """SELECT md5(text) AS fingerprint, MIN(doc_id) AS representative,
        |  COUNT(*) AS cluster_size
        |FROM documents GROUP BY 1""".stripMargin,
    "q19_ngram_jaccard" ->
      s"""WITH d AS (SELECT doc_id, $dShingles AS sh FROM documents),
         |e AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n, unnest(sh) AS s FROM d),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS n_a, b.n AS n_b,
         |    COUNT(*) AS inter
         |  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 3, 4)
         |SELECT id_a, id_b, inter, n_a, n_b, jaccard FROM (
         |  SELECT *, inter / (n_a + n_b - inter) AS jaccard FROM p)
         |WHERE jaccard >= 0.5""".stripMargin,
    "q47_ngram_guarded" ->
      // same join as q19 but stop-phrase shingles (doc frequency >
      // max(1, floor(N * 0.1))) dropped first, and set sizes recomputed
      // over the surviving shingles — mirrors the Spark guard arithmetic
      s"""WITH d AS (SELECT doc_id, $dShingles AS sh FROM documents),
         |e0 AS (SELECT doc_id, unnest(sh) AS s FROM d),
         |cap AS (SELECT GREATEST(1, CAST(FLOOR(COUNT(*) * 0.1) AS BIGINT)) AS c
         |  FROM documents),
         |freq AS (SELECT s FROM e0 GROUP BY s
         |  HAVING COUNT(*) > (SELECT c FROM cap)),
         |e AS (SELECT doc_id, s, COUNT(*) OVER (PARTITION BY doc_id) AS n
         |  FROM e0 WHERE s NOT IN (SELECT s FROM freq)),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS n_a, b.n AS n_b,
         |    COUNT(*) AS inter
         |  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 3, 4)
         |SELECT id_a, id_b, inter, n_a, n_b, jaccard FROM (
         |  SELECT *, inter / (n_a + n_b - inter) AS jaccard FROM p)
         |WHERE jaccard >= 0.5""".stripMargin,
    "q20_token_count" ->
      s"""SELECT doc_id, CAST(len($dTokens) AS BIGINT) AS n_tokens,
         |  CAST(length(text) AS BIGINT) AS n_chars_text
         |FROM documents""".stripMargin,
    "q21_quality_score" ->
      s"""SELECT doc_id,
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  CAST(len($dTokens) AS BIGINT) AS n_tokens,
         |  CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT)
         |    / CAST(len($dTokens) AS BIGINT) AS mean_token_len,
         |  CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT)
         |    / CAST(length(text) AS BIGINT) AS alpha_ratio,
         |  ${dLexHits(TextOps.enWords)} / CAST(len($dTokens) AS BIGINT)
         |    AS stopword_ratio
         |FROM documents""".stripMargin,
    "q22_lang_id" ->
      s"""SELECT doc_id, en_hits, de_hits, fr_hits, es_hits,
         |  CASE WHEN en_hits >= greatest(de_hits, fr_hits, es_hits) THEN 'en'
         |       WHEN de_hits >= greatest(fr_hits, es_hits) THEN 'de'
         |       WHEN fr_hits >= es_hits THEN 'fr'
         |       ELSE 'es' END AS pred_lang
         |FROM (SELECT doc_id,
         |  ${dLexHits(TextOps.enWords)} AS en_hits,
         |  ${dLexHits(TextOps.deWords)} AS de_hits,
         |  ${dLexHits(TextOps.frWords)} AS fr_hits,
         |  ${dLexHits(TextOps.esWords)} AS es_hits
         |FROM documents)""".stripMargin,
    "q46_parsed_lang" ->
      s"""SELECT doc_id,
         |  CASE WHEN en_hits >= greatest(de_hits, fr_hits, es_hits) THEN 'en'
         |       WHEN de_hits >= greatest(fr_hits, es_hits) THEN 'de'
         |       WHEN fr_hits >= es_hits THEN 'fr'
         |       ELSE 'es' END AS language
         |FROM (SELECT doc_id,
         |  ${dLexHits(TextOps.enWords)} AS en_hits,
         |  ${dLexHits(TextOps.deWords)} AS de_hits,
         |  ${dLexHits(TextOps.frWords)} AS fr_hits,
         |  ${dLexHits(TextOps.esWords)} AS es_hits
         |FROM documents)""".stripMargin,
    "q23_fingerprint" ->
      """SELECT doc_id,
        |  md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fingerprint
        |FROM documents""".stripMargin,
    "q24_minhash_sig" ->
      s"""SELECT doc_id, array_to_string(${dMinhash(dHashedShingles, 16)}, ',')
         |  AS sig
         |FROM documents""".stripMargin,
    "q25_minhash_lsh_pairs" ->
      s"""WITH sigs AS (SELECT doc_id, ${dMinhash(dHashedShingles, 16)} AS sig
         |  FROM documents),
         |bands AS (SELECT DISTINCT doc_id, unnest(list_transform(range(0, 4),
         |    b -> CONCAT(b, '-', array_to_string(sig[b*4+1:b*4+4], ','))))
         |    AS band_key
         |  FROM sigs)
         |SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |FROM bands x JOIN bands y
         |  ON x.band_key = y.band_key AND x.doc_id < y.doc_id""".stripMargin,
    "q31_minhash_dedup" ->
      s"""WITH sigs AS (SELECT doc_id, ${dMinhash(dHashedShingles, 16)} AS sig
         |  FROM documents),
         |bands AS (SELECT DISTINCT doc_id, unnest(list_transform(range(0, 4),
         |    b -> CONCAT(b, '-', array_to_string(sig[b*4+1:b*4+4], ','))))
         |    AS band_key
         |  FROM sigs),
         |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |  FROM bands x JOIN bands y
         |    ON x.band_key = y.band_key AND x.doc_id < y.doc_id),
         |d AS (SELECT doc_id, $dShingles AS sh FROM documents),
         |e AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n, unnest(sh) AS s FROM d),
         |p AS (SELECT c.id_a, c.id_b, a.n AS n_a, b.n AS n_b, COUNT(*) AS inter
         |  FROM cand c
         |  JOIN e a ON a.doc_id = c.id_a
         |  JOIN e b ON b.doc_id = c.id_b AND b.s = a.s
         |  GROUP BY 1, 2, 3, 4)
         |SELECT id_a, id_b, jaccard FROM (
         |  SELECT id_a, id_b, inter / (n_a + n_b - inter) AS jaccard FROM p)
         |WHERE jaccard >= 0.5""".stripMargin,
    "q51_sample_strata" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE ${dHash32("CAST(doc_id AS VARCHAR)")} % 1000000
         |  < CAST(round((CASE WHEN lang = 'en' THEN 0.5
         |               WHEN lang = 'zh' THEN 1.0
         |               ELSE 0.25 END) * 1000000) AS BIGINT)""".stripMargin,
    "q52_token_budget" ->
      s"""WITH t AS (SELECT doc_id, lang AS stratum,
         |    CAST(len($dTokens) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (SELECT doc_id, stratum, n_tokens,
         |    CAST(SUM(n_tokens) OVER (PARTITION BY stratum
         |      ORDER BY n_tokens DESC, doc_id ASC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum_tokens
         |  FROM t WHERE n_tokens >= 1)
         |SELECT doc_id, stratum, n_tokens, cum_tokens FROM c
         |WHERE cum_tokens <= 1000""".stripMargin,
    "q53_pii_scrub" ->
      s"""SELECT doc_id, ${dScrubPii(piiProbe)} AS scrubbed
         |FROM documents""".stripMargin,
    "q55_dedup_clusters" ->
      // transitive closure via recursive CTE over the q25 candidate
      // pairs; min reachable id == the hash-min fixpoint label
      s"""WITH RECURSIVE
         |sigs AS (SELECT doc_id, ${dMinhash(dHashedShingles, 16)} AS sig
         |  FROM documents),
         |bands AS (SELECT DISTINCT doc_id, unnest(list_transform(range(0, 4),
         |    b -> CONCAT(b, '-', array_to_string(sig[b*4+1:b*4+4], ','))))
         |    AS band_key
         |  FROM sigs),
         |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |  FROM bands x JOIN bands y
         |    ON x.band_key = y.band_key AND x.doc_id < y.doc_id),
         |edges AS (SELECT id_a AS u, id_b AS v FROM cand
         |  UNION SELECT id_b, id_a FROM cand),
         |walk(u, label) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
         |  UNION
         |  SELECT e.u, w.label FROM edges e JOIN walk w ON w.u = e.v)
         |SELECT u AS doc_id, min(label) AS cluster_id
         |FROM walk GROUP BY u""".stripMargin,
    "q56_decontaminate" ->
      s"""WITH bench AS (SELECT DISTINCT unnest($dShingles) AS shingle
         |  FROM documents WHERE doc_id % 97 = 0),
         |d AS (SELECT doc_id, unnest($dShingles) AS shingle FROM documents)
         |SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
         |FROM d JOIN bench USING (shingle)
         |GROUP BY d.doc_id""".stripMargin,
    "q81_contamination" ->
      s"""WITH bench AS (SELECT doc_id AS bench_id, unnest($dShingles)
         |    AS shingle
         |  FROM documents WHERE doc_id % 97 = 0),
         |d AS (SELECT doc_id, unnest($dShingles) AS shingle FROM documents)
         |SELECT b.bench_id,
         |  CAST(COUNT(DISTINCT d.doc_id) AS BIGINT) AS n_docs,
         |  CAST(COUNT(*) AS BIGINT) AS n_shingle_hits
         |FROM d JOIN bench b USING (shingle)
         |GROUP BY 1""".stripMargin,
    "q86_blocklist" ->
      """WITH bl AS (SELECT lower(word) AS tok
        |  FROM (VALUES ('slow'), ('big'), ('junk')) v(word)),
        |t AS (SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |  FROM documents),
        |f AS (SELECT doc_id,
        |    CASE WHEN bl.tok IS NOT NULL THEN 1 ELSE 0 END AS bad
        |  FROM t LEFT JOIN bl ON t.tok = bl.tok
        |  WHERE length(t.tok) > 0)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(SUM(bad) AS BIGINT) AS n_flagged
        |FROM f GROUP BY 1""".stripMargin,
    "q88_dsir_scores" ->
      s"""WITH tb AS (SELECT doc_id,
         |    ${dHash32("tok")} % 128 AS bucket
         |  FROM (SELECT doc_id,
         |      unnest(string_split_regex(trim(text), '\\s+')) AS tok
         |    FROM documents)
         |  WHERE length(tok) > 0),
         |qc AS (SELECT bucket, COUNT(*) AS q_cnt FROM tb GROUP BY 1),
         |pc AS (SELECT bucket, COUNT(*) AS p_cnt FROM tb
         |  WHERE doc_id % 97 = 0 GROUP BY 1),
         |r AS (SELECT COALESCE(qc.bucket, pc.bucket) AS bucket,
         |    ((COALESCE(p_cnt, 0) + 1) * 1000000)
         |      // (COALESCE(q_cnt, 0) + 1) AS ratio
         |  FROM qc FULL OUTER JOIN pc ON qc.bucket = pc.bucket)
         |SELECT tb.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |  CAST(SUM(r.ratio) AS BIGINT) AS dsir_score
         |FROM tb JOIN r USING (bucket) GROUP BY 1""".stripMargin,
    "q89_temperature_mix" ->
      """WITH t AS (SELECT source AS stratum,
        |    CAST(SUM(len(regexp_extract_all(text,
        |      '''(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+')))
        |      AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |w AS (SELECT stratum, n_tokens,
        |    CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS weight
        |  FROM t),
        |s AS (SELECT CAST(SUM(weight) AS BIGINT) AS weight_sum FROM w)
        |SELECT stratum, n_tokens, weight,
        |  (weight * 1000000) // weight_sum AS share_ppm
        |FROM w CROSS JOIN s""".stripMargin,
    "q90_novelty" ->
      s"""WITH sh AS (SELECT doc_id, unnest($dShingles) AS shingle
         |  FROM documents),
         |f AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY 1)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
         |  CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_unique,
         |  (100 * CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT))
         |    // GREATEST(CAST(COUNT(*) AS BIGINT), 1) AS novelty_pct
         |FROM sh JOIN f USING (shingle) GROUP BY 1""".stripMargin,
    "q99_fertility" ->
      """SELECT lang,
        |  CAST(SUM(len(regexp_extract_all(text,
        |    '''(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+')))
        |    AS BIGINT) AS n_pretokens,
        |  CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
        |    AS n_words,
        |  (100 * CAST(SUM(len(regexp_extract_all(text,
        |    '''(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+')))
        |    AS BIGINT))
        |    // GREATEST(CAST(SUM(len(string_split_regex(trim(text), '\s+')))
        |      AS BIGINT), 1) AS fertility_pct
        |FROM documents GROUP BY 1""".stripMargin,
    "q115_sig_retire" ->
      s"""WITH sigs AS (SELECT doc_id, ${dMinhash(dHashedShingles, 16)} AS sig
         |  FROM documents),
         |s AS (SELECT * FROM sigs WHERE sig[1] IS NOT NULL)
         |SELECT doc_id, array_to_string(sig, ',') AS sig
         |FROM s WHERE doc_id % 20 <> 10""".stripMargin,
    "q116_ann_retire" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
         |  FROM embeddings WHERE vec_id % 50 = 0),
         |c AS (SELECT vec_id AS neighbor_id, embedding AS cv
         |  FROM embeddings WHERE vec_id % 3 = 0 OR vec_id % 10 <> 0),
         |j AS (SELECT query_id, neighbor_id, ${dCos("qv", "cv")} AS cos
         |  FROM q, c WHERE query_id <> neighbor_id),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, neighbor_id ASC) AS rn FROM j)
         |SELECT query_id, neighbor_id, cos, rn FROM r WHERE rn <= 5"""
        .stripMargin,
    "q117_label_retire" ->
      """WITH RECURSIVE ids AS (SELECT doc_id FROM documents),
        |oldp AS (SELECT doc_id AS a, doc_id - (doc_id % 5) AS b
        |  FROM ids WHERE doc_id % 5 <> 0),
        |e1 AS (SELECT a AS u, b AS w FROM oldp UNION SELECT b, a FROM oldp),
        |walk1(u, label) AS (
        |  SELECT u, u FROM (SELECT DISTINCT u FROM e1)
        |  UNION
        |  SELECT e.u, wk.label FROM e1 e JOIN walk1 wk ON wk.u = e.w),
        |c1 AS (SELECT u, MIN(label) AS label FROM walk1 GROUP BY u),
        |surv AS (SELECT u, label FROM c1
        |  WHERE u NOT IN (SELECT doc_id FROM ids WHERE doc_id % 25 = 0)),
        |l2 AS (SELECT s.u, m.new_label FROM surv s JOIN
        |  (SELECT label, MIN(u) AS new_label FROM surv GROUP BY label) m
        |  USING (label)),
        |newp AS (SELECT doc_id + 1 AS a, doc_id + 6 AS b FROM ids
        |  WHERE doc_id % 25 = 0),
        |p2 AS (SELECT u AS a, new_label AS b FROM l2
        |  UNION SELECT a, b FROM newp),
        |e2 AS (SELECT a AS u, b AS w FROM p2 UNION SELECT b, a FROM p2),
        |walk2(u, label) AS (
        |  SELECT u, u FROM (SELECT DISTINCT u FROM e2)
        |  UNION
        |  SELECT e.u, wk.label FROM e2 e JOIN walk2 wk ON wk.u = e.w)
        |SELECT u AS id, MIN(label) AS component FROM walk2
        |GROUP BY u""".stripMargin,
    "q120_event_ttl" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         ((doc_id % 8) + 8) % 8 AS src_batch,
        |         (((doc_id % 8) + 8) % 8) * (((doc_id % 8) + 8) % 8) * 100
        |           + ((doc_id % 7) + 7) % 7 AS t
        |  FROM documents),
        |s AS (SELECT src_batch, max(t) AS maxt FROM d GROUP BY src_batch),
        |b AS (SELECT DISTINCT src_batch + 1 AS b FROM s),
        |clock AS (
        |  SELECT b.b AS b, max(s.maxt) AS clk
        |  FROM b JOIN s ON s.src_batch < b.b GROUP BY b.b),
        |fired AS (
        |  SELECT s.src_batch, min(c.b) AS fired_at
        |  FROM s JOIN clock c ON c.b > s.src_batch AND s.maxt <= c.clk - 500
        |  GROUP BY s.src_batch)
        |SELECT d.doc_id AS doc_id, d.src_batch AS src_batch,
        |       f.fired_at AS fired_at
        |FROM d JOIN fired f USING (src_batch)""".stripMargin,
    "q121_zorder_skip" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE user_id BETWEEN 3 AND 9
        |  AND epoch_us(ts) BETWEEN 1704672000000000 AND 1705881600000000
        |GROUP BY 1""".stripMargin,
    "q101_store_dedup" ->
      s"""WITH sigs AS (SELECT doc_id, ${dMinhash(dHashedShingles, 16)} AS sig
         |  FROM documents),
         |s AS (SELECT * FROM sigs WHERE sig[1] IS NOT NULL),
         |nb AS (SELECT DISTINCT doc_id, unnest(list_transform(range(0, 4),
         |    b -> CONCAT(b, '-', array_to_string(sig[b*4+1:b*4+4], ','))))
         |    AS band_key
         |  FROM s WHERE doc_id % 2 = 1),
         |cb AS (SELECT DISTINCT doc_id, unnest(list_transform(range(0, 4),
         |    b -> CONCAT(b, '-', array_to_string(sig[b*4+1:b*4+4], ','))))
         |    AS band_key
         |  FROM s WHERE doc_id % 2 = 0),
         |cand AS (SELECT DISTINCT x.doc_id AS new_id, y.doc_id AS corpus_id
         |  FROM nb x JOIN cb y ON x.band_key = y.band_key),
         |j AS (SELECT c.new_id, c.corpus_id,
         |    CAST(len(list_filter(range(0, 16),
         |      i -> a.sig[i+1] = b.sig[i+1])) AS DOUBLE) / 16.0 AS jaccard_est
         |  FROM cand c
         |  JOIN s a ON a.doc_id = c.new_id
         |  JOIN s b ON b.doc_id = c.corpus_id)
         |SELECT new_id, corpus_id, jaccard_est FROM j
         |WHERE jaccard_est >= 0.5""".stripMargin,
    "q100_fp_tiers" ->
      s"""WITH t AS (SELECT doc_id, lang,
         |    CAST((length(text) * 1000) // GREATEST(len($dTokens), 1)
         |      AS BIGINT) AS mtl_fp FROM documents),
         |h AS (SELECT lang, mtl_fp, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM t GROUP BY 1, 2),
         |c AS (SELECT lang, mtl_fp, n,
         |    CAST(SUM(n) OVER (PARTITION BY lang ORDER BY mtl_fp
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum
         |  FROM h),
         |tot AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS n_docs
         |  FROM h GROUP BY 1),
         |thr AS (SELECT lang,
         |    MIN(CASE WHEN cum * 3 >= n_docs * 1 THEN mtl_fp END) AS f1,
         |    MIN(CASE WHEN cum * 3 >= n_docs * 2 THEN mtl_fp END) AS f2
         |  FROM c JOIN tot USING (lang) GROUP BY 1)
         |SELECT t.doc_id, t.lang, t.mtl_fp,
         |  CAST(CASE WHEN t.mtl_fp > thr.f1 THEN 1 ELSE 0 END
         |    + CASE WHEN t.mtl_fp > thr.f2 THEN 1 ELSE 0 END
         |    AS BIGINT) AS tier
         |FROM t JOIN thr USING (lang)""".stripMargin,
    "q92_gopher_rep" ->
      """WITH tk AS (SELECT doc_id, string_split_regex(trim(text), '\s+')
        |    AS t FROM documents),
        |bg AS (SELECT doc_id, array_to_string(t[i+1:i+2], ' ') AS g
        |  FROM (SELECT doc_id, t, unnest(range(0, len(t) - 1)) AS i
        |    FROM tk WHERE len(t) >= 2)),
        |bgc AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY 1, 2),
        |bstat AS (SELECT doc_id, SUM(c) AS n_bigrams, MAX(c) AS top_bigram
        |  FROM bgc GROUP BY 1),
        |w5 AS (SELECT doc_id, array_to_string(t[i+1:i+5], ' ') AS g
        |  FROM (SELECT doc_id, t, unnest(range(0, len(t) - 4)) AS i
        |    FROM tk WHERE len(t) >= 5)),
        |w5c AS (SELECT doc_id, g, COUNT(*) AS c FROM w5 GROUP BY 1, 2),
        |wstat AS (SELECT doc_id, SUM(c) AS n_windows,
        |    SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup_windows
        |  FROM w5c GROUP BY 1)
        |SELECT tk.doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
        |  CAST(COALESCE(top_bigram, 0) AS BIGINT) AS top_bigram,
        |  (100 * CAST(COALESCE(top_bigram, 0) AS BIGINT))
        |    // GREATEST(CAST(COALESCE(n_bigrams, 0) AS BIGINT), 1)
        |    AS top_bigram_pct,
        |  CAST(COALESCE(dup_windows, 0) AS BIGINT) AS dup_windows,
        |  (100 * CAST(COALESCE(dup_windows, 0) AS BIGINT))
        |    // GREATEST(CAST(COALESCE(n_windows, 0) AS BIGINT), 1)
        |    AS dup_window_pct
        |FROM tk LEFT JOIN bstat USING (doc_id)
        |LEFT JOIN wstat USING (doc_id)""".stripMargin,
    "q93_source_overlap" ->
      """WITH fp AS (SELECT DISTINCT
        |    md5(array_to_string(
        |      string_split_regex(trim(text), '\s+')[1:3], ' ')) AS f,
        |    source FROM documents)
        |SELECT a.source AS source_a, b.source AS source_b,
        |  CAST(COUNT(*) AS BIGINT) AS n_shared
        |FROM fp a JOIN fp b ON a.f = b.f AND a.source < b.source
        |GROUP BY 1, 2""".stripMargin,
    "q85_nfc_normalize" ->
      """SELECT doc_id,
        |  nfc_normalize(text || ' cafe' || chr(769)) AS clean,
        |  CAST(length(text || ' cafe' || chr(769)) AS BIGINT) AS n_raw,
        |  CAST(length(nfc_normalize(text || ' cafe' || chr(769)))
        |    AS BIGINT) AS n_nfc
        |FROM documents""".stripMargin,
    "q84_continuation" ->
      """WITH t AS (SELECT string_split_regex(trim(lower(text)), '\s+')
        |    AS toks FROM documents),
        |w AS (SELECT unnest(range(0, len(toks) - 1)) AS pos, toks
        |  FROM t WHERE len(toks) >= 2),
        |bg AS (SELECT toks[pos+1] AS l, toks[pos+2] AS r FROM w
        |  GROUP BY 1, 2)
        |SELECT r AS word, CAST(COUNT(*) AS BIGINT) AS n_contexts
        |FROM bg GROUP BY 1""".stripMargin,
    "q82_count_min" ->
      s"""WITH tok AS (SELECT unnest($dTokens) AS term FROM documents),
         |h AS (SELECT ${dHash32("term")} AS h FROM tok
         |  WHERE length(term) > 0),
         |e AS (SELECT h, unnest(range(0, 4)) AS j FROM h)
         |SELECT CAST(j AS BIGINT) AS row,
         |  CAST((((j * 2654435761 + 1) % 1000000007) * h + j * 97 + 13)
         |    % 1000000007 % 64 AS BIGINT) AS col,
         |  CAST(COUNT(*) AS BIGINT) AS cnt
         |FROM e GROUP BY 1, 2""".stripMargin,
    "q83_hll_registers" ->
      s"""WITH tok AS (SELECT unnest($dTokens) AS term FROM documents),
         |h AS (SELECT ${dHash32("term")} AS h FROM tok
         |  WHERE length(term) > 0),
         |b AS (SELECT h % 64 AS bucket, h // 64 AS x FROM h),
         |r AS (SELECT bucket, CASE WHEN x = 0 THEN 27
         |    ELSE length(bin(x)) - length(rtrim(bin(x), '0')) + 1 END AS rho
         |  FROM b)
         |SELECT CAST(bucket AS BIGINT) AS bucket,
         |  CAST(MAX(rho) AS BIGINT) AS register
         |FROM r GROUP BY 1""".stripMargin,
    "q57_token_stats" ->
      s"""WITH t AS (SELECT source AS stratum,
         |    CAST(len($dTokens) AS BIGINT) AS n_tokens FROM documents),
         |h AS (SELECT stratum, n_tokens, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM t GROUP BY 1, 2),
         |c AS (SELECT stratum, n_tokens, n,
         |    CAST(SUM(n) OVER (PARTITION BY stratum ORDER BY n_tokens
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum FROM h),
         |tot AS (SELECT stratum, CAST(SUM(n) AS BIGINT) AS n_docs,
         |    CAST(SUM(n * n_tokens) AS BIGINT) AS total_tokens
         |  FROM h GROUP BY 1)
         |SELECT c.stratum, MAX(n_docs) AS n_docs,
         |  MAX(total_tokens) AS total_tokens,
         |  MIN(n_tokens) AS min_tokens, MAX(n_tokens) AS max_tokens,
         |  MIN(CASE WHEN cum * 2 >= n_docs THEN n_tokens END) AS p50_tokens,
         |  MIN(CASE WHEN cum * 20 >= n_docs * 19 THEN n_tokens END)
         |    AS p95_tokens,
         |  CAST(MAX(total_tokens) AS DOUBLE) / MAX(n_docs) AS mean_tokens
         |FROM c JOIN tot USING (stratum)
         |GROUP BY 1""".stripMargin,
    "q59_shard_pack" ->
      s"""WITH t AS (SELECT doc_id,
         |    CAST(len($dTokens) AS BIGINT) AS n_tokens,
         |    ${dHash32("CAST(doc_id AS VARCHAR)")} AS hkey
         |  FROM documents),
         |s AS (SELECT doc_id, n_tokens, hkey, hkey % 8 AS shard FROM t)
         |SELECT doc_id, shard,
         |  CAST(ROW_NUMBER() OVER
         |    (PARTITION BY shard ORDER BY hkey, doc_id) AS BIGINT) AS pos,
         |  CAST(FLOOR((CAST(SUM(n_tokens) OVER
         |      (PARTITION BY shard ORDER BY hkey, doc_id
         |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS DOUBLE) - n_tokens) / 64) AS BIGINT) AS seq_id,
         |  n_tokens
         |FROM s""".stripMargin,
    "q60_dedup_corpus" ->
      // q55's transitive closure, then keep docs that are unclustered or
      // their cluster's minimum id
      s"""WITH RECURSIVE
         |sigs AS (SELECT doc_id, ${dMinhash(dHashedShingles, 16)} AS sig
         |  FROM documents),
         |bands AS (SELECT DISTINCT doc_id, unnest(list_transform(range(0, 4),
         |    b -> CONCAT(b, '-', array_to_string(sig[b*4+1:b*4+4], ','))))
         |    AS band_key
         |  FROM sigs),
         |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |  FROM bands x JOIN bands y
         |    ON x.band_key = y.band_key AND x.doc_id < y.doc_id),
         |edges AS (SELECT id_a AS u, id_b AS v FROM cand
         |  UNION SELECT id_b, id_a FROM cand),
         |walk(u, label) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
         |  UNION
         |  SELECT e.u, w.label FROM edges e JOIN walk w ON w.u = e.v),
         |comp AS (SELECT u AS doc_id, min(label) AS cluster_id
         |  FROM walk GROUP BY u)
         |SELECT d.doc_id, d.lang, d.source FROM documents d
         |WHERE NOT EXISTS (SELECT 1 FROM comp c
         |  WHERE c.doc_id = d.doc_id AND c.cluster_id <> c.doc_id)""".stripMargin,
    "q61_length_gate" ->
      s"""WITH t AS (SELECT doc_id, lang AS stratum,
         |    CAST(len($dTokens) AS BIGINT) AS n_tokens FROM documents),
         |h AS (SELECT stratum, n_tokens, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM t GROUP BY 1, 2),
         |c AS (SELECT stratum, n_tokens, n,
         |    CAST(SUM(n) OVER (PARTITION BY stratum ORDER BY n_tokens
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum
         |  FROM h),
         |tot AS (SELECT stratum, CAST(SUM(n) AS BIGINT) AS n_docs
         |  FROM h GROUP BY 1),
         |thr AS (SELECT stratum,
         |    MIN(CASE WHEN cum * 5 >= n_docs * 1 THEN n_tokens END)
         |      AS min_keep
         |  FROM c JOIN tot USING (stratum) GROUP BY 1)
         |SELECT t.doc_id, t.stratum, t.n_tokens
         |FROM t JOIN thr USING (stratum)
         |WHERE t.n_tokens >= thr.min_keep""".stripMargin,
    "q62_incr_dedup" ->
      s"""WITH sigs AS (SELECT doc_id, ${dMinhash(dHashedShingles, 16)} AS sig
         |  FROM documents),
         |s AS (SELECT * FROM sigs WHERE sig[1] IS NOT NULL),
         |nb AS (SELECT DISTINCT doc_id, unnest(list_transform(range(0, 4),
         |    b -> CONCAT(b, '-', array_to_string(sig[b*4+1:b*4+4], ','))))
         |    AS band_key
         |  FROM s WHERE doc_id % 2 = 1),
         |cb AS (SELECT DISTINCT doc_id, unnest(list_transform(range(0, 4),
         |    b -> CONCAT(b, '-', array_to_string(sig[b*4+1:b*4+4], ','))))
         |    AS band_key
         |  FROM s WHERE doc_id % 2 = 0),
         |cand AS (SELECT DISTINCT x.doc_id AS new_id, y.doc_id AS corpus_id
         |  FROM nb x JOIN cb y ON x.band_key = y.band_key),
         |j AS (SELECT c.new_id, c.corpus_id,
         |    CAST(len(list_filter(range(0, 16),
         |      i -> a.sig[i+1] = b.sig[i+1])) AS DOUBLE) / 16.0 AS jaccard_est
         |  FROM cand c
         |  JOIN s a ON a.doc_id = c.new_id
         |  JOIN s b ON b.doc_id = c.corpus_id)
         |SELECT new_id, corpus_id, jaccard_est FROM j
         |WHERE jaccard_est >= 0.5""".stripMargin,
    "q58_boilerplate" ->
      s"""WITH t AS (SELECT doc_id, $dTokens AS toks FROM documents),
         |sidx AS (SELECT doc_id, toks, unnest(range(0,
         |    CAST(ceil(len(toks) / CAST(2 AS DOUBLE)) AS BIGINT))) AS pos
         |  FROM t),
         |s AS (SELECT doc_id, pos,
         |    array_to_string(toks[pos*2+1 : pos*2+2], ' ') AS seg
         |  FROM sidx),
         |bp AS (SELECT seg, 1 AS bp FROM (
         |    SELECT seg, COUNT(DISTINCT doc_id) AS seg_df FROM s GROUP BY 1)
         |  WHERE seg_df >= GREATEST(3, CAST(ceil(
         |    0.04 * (SELECT COUNT(*) FROM documents)) AS BIGINT)))
         |SELECT s.doc_id,
         |  COALESCE(string_agg(CASE WHEN bp.bp IS NULL THEN s.seg END, ' '
         |    ORDER BY s.pos), '') AS clean_text,
         |  CAST(COUNT(*) AS BIGINT) AS n_segments,
         |  CAST(COALESCE(SUM(bp.bp), 0) AS BIGINT) AS n_removed
         |FROM s LEFT JOIN bp USING (seg)
         |GROUP BY 1""".stripMargin,
    "q68_semantic_dedup" ->
      s"""WITH c AS (SELECT vec_id AS cent_id, embedding AS cv
         |  FROM embeddings WHERE vec_id % 100 = 0),
         |a AS (SELECT e.vec_id AS vid, e.embedding AS ve, c.cent_id,
         |    ${dCos("e.embedding", "c.cv")} AS cent_cos
         |  FROM embeddings e CROSS JOIN c),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vid
         |    ORDER BY cent_cos DESC, cent_id ASC) AS crn FROM a),
         |cells AS (SELECT vid, ve, cent_id AS cell FROM r WHERE crn = 1),
         |p AS (SELECT x.vid AS id_a, y.vid AS id_b,
         |    ${dCos("x.ve", "y.ve")} AS cos
         |  FROM cells x JOIN cells y ON x.cell = y.cell AND x.vid < y.vid)
         |SELECT id_a, id_b, cos FROM p WHERE cos >= 0.3""".stripMargin,
    "q74_cluster_sizes" ->
      s"""WITH RECURSIVE
         |$dClusterCc,
         |sizes AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT)
         |    AS cluster_size FROM cc GROUP BY 1)
         |SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
         |  CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs
         |FROM sizes GROUP BY 1""".stripMargin,
    "q73_source_gate" ->
      s"""WITH t AS (SELECT doc_id, source,
         |    CAST(len($dTokens) AS BIGINT) AS n_tokens FROM documents),
         |s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS stratum_docs,
         |    CAST(SUM(n_tokens) AS BIGINT) AS stratum_tokens
         |  FROM t GROUP BY 1),
         |ok AS (SELECT * FROM s
         |  WHERE stratum_docs >= 5 AND stratum_tokens >= 50 * stratum_docs)
         |SELECT t.doc_id, t.source, t.n_tokens,
         |  ok.stratum_docs, ok.stratum_tokens
         |FROM t JOIN ok USING (source)""".stripMargin,
    "q72_keeper_quality" ->
      s"""WITH RECURSIVE
         |$dClusterCc,
         |t AS (SELECT doc_id, CAST(len($dTokens) AS BIGINT) AS n_tokens
         |  FROM documents)
         |SELECT cc.doc_id, cc.cluster_id, t.n_tokens,
         |  (ROW_NUMBER() OVER (PARTITION BY cc.cluster_id
         |     ORDER BY t.n_tokens DESC, cc.doc_id ASC)) = 1 AS keep
         |FROM cc JOIN t USING (doc_id)""".stripMargin,
    "q71_fixed_sample" ->
      s"""SELECT doc_id, lang, sample_rank FROM (
         |  SELECT doc_id, lang, CAST(ROW_NUMBER() OVER (PARTITION BY lang
         |      ORDER BY ${dHash32("concat(CAST(doc_id AS VARCHAR), ':fix')")}
         |        ASC, doc_id ASC) AS BIGINT) AS sample_rank
         |  FROM documents)
         |WHERE sample_rank <= 20""".stripMargin,
    "q70_split_assign" ->
      s"""SELECT doc_id, CASE
         |    WHEN bucket < 900000 THEN 'train'
         |    WHEN bucket < 950000 THEN 'val'
         |    ELSE 'test' END AS split
         |FROM (SELECT doc_id,
         |    ${dHash32("concat(CAST(doc_id AS VARCHAR), ':split')")}
         |      % 1000000 AS bucket
         |  FROM documents)""".stripMargin,
    "q112_leakage_split" ->
      s"""WITH RECURSIVE
         |$dClusterCc,
         |full_cc AS (SELECT d.doc_id,
         |    COALESCE(cc.cluster_id, d.doc_id) AS cluster_id
         |  FROM documents d LEFT JOIN cc USING (doc_id))
         |SELECT doc_id, cluster_id, CASE
         |    WHEN bucket < 900000 THEN 'train'
         |    WHEN bucket < 950000 THEN 'val'
         |    ELSE 'test' END AS split
         |FROM (SELECT doc_id, cluster_id,
         |    ${dHash32("concat(CAST(cluster_id AS VARCHAR), ':split')")}
         |      % 1000000 AS bucket
         |  FROM full_cc)""".stripMargin,
    "q109_label_store" ->
      """WITH RECURSIVE ids AS (SELECT doc_id FROM documents),
        |oldp AS (SELECT doc_id AS a, doc_id - (doc_id % 5) AS b
        |  FROM ids WHERE doc_id % 5 <> 0),
        |newp AS (SELECT doc_id AS a, doc_id + 5 AS b
        |    FROM ids WHERE doc_id % 50 = 0
        |  UNION ALL SELECT doc_id + 1000, doc_id + 1
        |    FROM ids WHERE doc_id % 100 = 0
        |  UNION ALL SELECT CAST(2000 AS BIGINT), CAST(2001 AS BIGINT)),
        |p AS (SELECT a, b FROM oldp UNION SELECT a, b FROM newp),
        |edges AS (SELECT a AS u, b AS w FROM p UNION SELECT b, a FROM p),
        |walk(u, label) AS (
        |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
        |  UNION
        |  SELECT e.u, wk.label FROM edges e JOIN walk wk ON wk.u = e.w)
        |SELECT u AS id, min(label) AS component FROM walk
        |GROUP BY u""".stripMargin,
    "q108_bucketed_join" ->
      """SELECT d.doc_id, d.n_chars,
        |  CAST(len(string_split_regex(trim(d.text), '\s+')) AS BIGINT)
        |    AS tok_cnt,
        |  CAST(e.label AS BIGINT) AS label
        |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id"""
        .stripMargin,
    "q107_incr_components" ->
      """WITH RECURSIVE ids AS (SELECT doc_id FROM documents),
        |oldp AS (SELECT doc_id AS a, doc_id - (doc_id % 5) AS b
        |  FROM ids WHERE doc_id % 5 <> 0),
        |newp AS (SELECT doc_id AS a, doc_id + 5 AS b
        |    FROM ids WHERE doc_id % 50 = 0
        |  UNION ALL SELECT doc_id + 1000, doc_id + 1
        |    FROM ids WHERE doc_id % 100 = 0
        |  UNION ALL SELECT CAST(2000 AS BIGINT), CAST(2001 AS BIGINT)),
        |p AS (SELECT a, b FROM oldp UNION SELECT a, b FROM newp),
        |edges AS (SELECT a AS u, b AS w FROM p UNION SELECT b, a FROM p),
        |walk(u, label) AS (
        |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
        |  UNION
        |  SELECT e.u, wk.label FROM edges e JOIN walk wk ON wk.u = e.w)
        |SELECT u AS id, min(label) AS component FROM walk
        |GROUP BY u""".stripMargin,
    "q106_hybrid_rrf" ->
      s"""WITH toks AS (SELECT doc_id,
         |    string_split_regex(trim(lower(text)), '\\s+') AS tk
         |  FROM documents),
         |q AS (SELECT doc_id AS query_id,
         |    array_to_string(tk[1:5], ' ') AS qtext
         |  FROM toks WHERE doc_id % 50 = 0),
         |qt AS (SELECT DISTINCT query_id, term FROM
         |  (SELECT query_id, unnest(string_split_regex(trim(lower(qtext)),
         |     '\\s+')) AS term FROM q)),
         |dt AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf,
         |    MAX(len) AS len
         |  FROM (SELECT doc_id, CAST(len(tk) AS BIGINT) AS len,
         |      unnest(tk) AS term FROM toks)
         |  GROUP BY 1, 2),
         |ms AS (SELECT qt.query_id, dt.doc_id,
         |    CAST(SUM(dt.tf) AS BIGINT) AS sum_tf,
         |    CAST(COUNT(*) AS BIGINT) AS n_terms
         |  FROM qt JOIN dt USING (term) WHERE dt.doc_id <> qt.query_id
         |  GROUP BY 1, 2),
         |lex AS (SELECT * FROM (SELECT query_id, doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY n_terms DESC, sum_tf DESC, doc_id ASC) AS lex_rn
         |  FROM ms) WHERE lex_rn <= 20),
         |qv AS (SELECT vec_id AS query_id, embedding AS v
         |  FROM embeddings WHERE vec_id % 50 = 0),
         |cv AS (SELECT vec_id AS neighbor_id, embedding AS v
         |  FROM embeddings),
         |dj AS (SELECT query_id, neighbor_id,
         |    ${dCos("qv.v", "cv.v")} AS cos
         |  FROM qv, cv WHERE query_id <> neighbor_id),
         |dense AS (SELECT * FROM (SELECT query_id, neighbor_id,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cos DESC, neighbor_id ASC) AS dense_rn
         |  FROM dj) WHERE dense_rn <= 20),
         |f AS (SELECT COALESCE(l.query_id, dn.query_id) AS query_id,
         |    COALESCE(l.doc_id, dn.neighbor_id) AS cand_id,
         |    l.lex_rn, dn.dense_rn
         |  FROM lex l FULL OUTER JOIN dense dn
         |    ON l.query_id = dn.query_id AND l.doc_id = dn.neighbor_id),
         |sc AS (SELECT query_id, cand_id, lex_rn, dense_rn,
         |    COALESCE(1000000000000 // (60 + lex_rn), CAST(0 AS BIGINT)) +
         |    COALESCE(1000000000000 // (60 + dense_rn), CAST(0 AS BIGINT))
         |      AS rrf_fp
         |  FROM f),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY rrf_fp DESC, cand_id ASC) AS rn FROM sc)
         |SELECT query_id, cand_id, lex_rn, dense_rn, rrf_fp, rn
         |FROM r WHERE rn <= 10""".stripMargin,
    "q69_bm25_match" ->
      """WITH q(query_id, qtext) AS (VALUES
        |    (CAST(1 AS BIGINT), 'spark window agg'),
        |    (2, 'hash join merge'), (3, 'stream batch vector')),
        |qt AS (SELECT DISTINCT query_id, term FROM
        |  (SELECT query_id, unnest(string_split_regex(trim(lower(qtext)),
        |     '\s+')) AS term FROM q)),
        |dt AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf,
        |    MAX(len) AS len
        |  FROM (SELECT doc_id,
        |      CAST(len(string_split_regex(trim(lower(text)), '\s+'))
        |        AS BIGINT) AS len,
        |      unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |    FROM documents)
        |  GROUP BY 1, 2)
        |SELECT qt.query_id, dt.doc_id, CAST(SUM(dt.tf) AS BIGINT) AS sum_tf,
        |  CAST(COUNT(*) AS BIGINT) AS n_terms, MAX(dt.len) AS doc_len
        |FROM qt JOIN dt USING (term)
        |GROUP BY 1, 2""".stripMargin,
    "q67_bigram_counts" ->
      """WITH t AS (SELECT string_split_regex(trim(lower(text)), '\s+')
        |    AS toks FROM documents),
        |w AS (SELECT unnest(range(0, len(toks) - 1)) AS pos, toks
        |  FROM t WHERE len(toks) >= 2)
        |SELECT toks[pos+1] AS l, toks[pos+2] AS r,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM w GROUP BY l, r""".stripMargin,
    "q66_bpe_vocab" ->
      """SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
        |FROM (SELECT unnest(string_split_regex(trim(lower(text)),
        |    '\s+')) AS word FROM documents)
        |WHERE length(word) > 0
        |GROUP BY word""".stripMargin,
    "q65_quality_feats" ->
      s"""WITH t AS (SELECT doc_id,
         |    string_split_regex(trim(lower(text)), '\\s+') AS toks
         |  FROM documents WHERE len(string_split_regex(trim(lower(text)),
         |    '\\s+')) > 0),
         |e AS (SELECT doc_id, len(toks) AS len, unnest(toks) AS tok FROM t)
         |SELECT doc_id, ${dHash32("tok")} % 4096 AS feat,
         |  CAST(COUNT(*) AS DOUBLE) / MAX(len) AS v
         |FROM e GROUP BY doc_id, feat""".stripMargin,
    "q64_dup_spans" ->
      s"""WITH t AS (SELECT doc_id, $dTokens AS toks FROM documents),
         |w AS (SELECT doc_id, unnest(range(0, len(toks) - 4)) AS pos, toks
         |  FROM t WHERE len(toks) >= 5),
         |h AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         |    md5(array_to_string(toks[pos+1:pos+5], ' ')) AS whash
         |  FROM w),
         |d AS (SELECT whash FROM h GROUP BY whash HAVING COUNT(*) >= 2)
         |SELECT h.doc_id, h.pos, h.whash
         |FROM h JOIN d USING (whash)""".stripMargin,
    "q75_span_excision" ->
      // positional rebuild mirrors q58's string_agg shape: token stream
      // with index, left join the covered-index set, keep uncovered
      s"""WITH t AS (SELECT doc_id, $dTokens AS toks FROM documents),
         |w AS (SELECT doc_id, unnest(range(0, len(toks) - 4)) AS pos, toks
         |  FROM t WHERE len(toks) >= 5),
         |h AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         |    md5(array_to_string(toks[pos+1:pos+5], ' ')) AS whash
         |  FROM w),
         |d AS (SELECT whash FROM h GROUP BY whash HAVING COUNT(*) >= 2),
         |covt AS (SELECT DISTINCT h.doc_id, unnest(range(h.pos, h.pos + 5))
         |    AS ti FROM h JOIN d USING (whash)),
         |tokidx AS (SELECT doc_id, toks, unnest(range(0, len(toks))) AS ti
         |  FROM t),
         |tok AS (SELECT doc_id, CAST(ti AS BIGINT) AS ti, toks[ti+1] AS tok
         |  FROM tokidx)
         |SELECT tok.doc_id,
         |  COALESCE(string_agg(CASE WHEN c.ti IS NULL THEN tok.tok END, ' '
         |    ORDER BY tok.ti), '') AS clean_text,
         |  CAST(COUNT(c.ti) AS BIGINT) AS n_removed_tokens,
         |  CAST(COUNT(*) AS BIGINT) AS n_tokens
         |FROM tok LEFT JOIN covt c ON tok.doc_id = c.doc_id AND tok.ti = c.ti
         |GROUP BY 1""".stripMargin,
    "q76_edit_verified" ->
      s"""WITH sigs AS (SELECT doc_id, ${dMinhash(dHashedShingles, 16)} AS sig
         |  FROM documents),
         |bands AS (SELECT DISTINCT doc_id, unnest(list_transform(range(0, 4),
         |    b -> CONCAT(b, '-', array_to_string(sig[b*4+1:b*4+4], ','))))
         |    AS band_key
         |  FROM sigs),
         |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |  FROM bands x JOIN bands y
         |    ON x.band_key = y.band_key AND x.doc_id < y.doc_id)
         |SELECT c.id_a, c.id_b,
         |  CAST(levenshtein(a.text, b.text) AS BIGINT) AS edits
         |FROM cand c
         |JOIN documents a ON a.doc_id = c.id_a
         |JOIN documents b ON b.doc_id = c.id_b
         |WHERE levenshtein(a.text, b.text) <= 20""".stripMargin,
    "q77_keywords" ->
      s"""WITH t AS (SELECT doc_id, unnest($dTokens) AS term FROM documents),
         |f AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
         |  FROM t WHERE length(term) > 0 GROUP BY 1, 2),
         |d AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM f GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n_docs FROM documents),
         |g AS (SELECT term, df FROM d, n WHERE df <= n.n_docs * 0.9),
         |r AS (SELECT f.doc_id, f.term, f.tf, g.df,
         |    ROW_NUMBER() OVER (PARTITION BY f.doc_id
         |      ORDER BY f.tf DESC, g.df ASC, f.term ASC) AS krank
         |  FROM f JOIN g USING (term))
         |SELECT doc_id, term, tf, df, CAST(krank AS BIGINT) AS kw_rank
         |FROM r WHERE krank <= 5""".stripMargin,
    "q78_keep_first" ->
      s"""WITH t AS (SELECT doc_id, $dTokens AS toks FROM documents),
         |sidx AS (SELECT doc_id, toks, unnest(range(0,
         |    CAST(ceil(len(toks) / CAST(2 AS DOUBLE)) AS BIGINT))) AS pos
         |  FROM t),
         |s AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         |    array_to_string(toks[pos*2+1 : pos*2+2], ' ') AS seg
         |  FROM sidx),
         |m AS (SELECT doc_id, pos, seg, ROW_NUMBER() OVER (
         |    PARTITION BY seg ORDER BY doc_id, pos) AS rn FROM s)
         |SELECT doc_id,
         |  COALESCE(string_agg(CASE WHEN rn = 1 THEN seg END, ' '
         |    ORDER BY pos), '') AS clean_text,
         |  CAST(COUNT(*) AS BIGINT) AS n_segments,
         |  CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         |FROM m GROUP BY 1""".stripMargin,
    "q79_link_rank" ->
      s"""WITH nn AS (SELECT COUNT(*) AS n FROM documents),
         |e0 AS (SELECT doc_id AS src, (doc_id * 31 + k * 7) % nn.n AS dst
         |  FROM documents, nn, (VALUES (1), (2), (3)) t(k)),
         |edges AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
         |${dPageRankRounds(3)}
         |SELECT node_id, r AS rank_fp FROM r3""".stripMargin,
    "q80_domain_rank" ->
      // same fixed-point rank as q79, over a URL-derived DOMAIN graph:
      // the oracle extracts the host from the synthetic URLs by regexp
      // (the engine's native PLD extraction reduces to the host for
      // single-label .com sites by construction)
      s"""WITH l0 AS (SELECT
         |    'http://site' || CAST(doc_id % 40 AS VARCHAR) || '.com/p'
         |      || CAST(doc_id AS VARCHAR) AS src_url,
         |    'http://site' || CAST((doc_id * 7 + k) % 40 AS VARCHAR)
         |      || '.com/q' || CAST(doc_id AS VARCHAR) AS dst_url
         |  FROM documents, (VALUES (1), (2)) t(k)),
         |edges AS (SELECT DISTINCT
         |    regexp_extract(src_url, 'http://([^/]+)/', 1) AS src,
         |    regexp_extract(dst_url, 'http://([^/]+)/', 1) AS dst
         |  FROM l0
         |  WHERE regexp_extract(src_url, 'http://([^/]+)/', 1)
         |    <> regexp_extract(dst_url, 'http://([^/]+)/', 1)),
         |${dPageRankRounds(3)}
         |SELECT node_id AS pld, r AS rank_fp FROM r3""".stripMargin,
    "q114_embed_outliers" ->
      """WITH g AS (SELECT MAX(list_max(list_transform(embedding,
        |    x -> abs(CAST(x AS DOUBLE))))) AS gs FROM embeddings),
        |q AS (SELECT vec_id, label, CASE WHEN g.gs = 0
        |    THEN list_transform(embedding, x -> 0::BIGINT)
        |    ELSE list_transform(embedding, x ->
        |      CAST(floor(CAST(x AS DOUBLE) / g.gs * 127.0 + 0.5) AS BIGINT))
        |    END AS qv
        |  FROM embeddings, g),
        |dims AS (SELECT label, i, CAST(SUM(qv[i]) AS BIGINT) AS s,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM q, generate_series(1, 64) AS g1(i) GROUP BY 1, 2),
        |cent AS (SELECT label, i, (s - ((s % n + n) % n)) // n AS c
        |  FROM dims),
        |dist AS (SELECT q.vec_id, q.label AS stratum,
        |    CAST(SUM((qv[c.i] - c.c) * (qv[c.i] - c.c)) AS BIGINT) AS dist2
        |  FROM q JOIN cent c ON c.label = q.label GROUP BY 1, 2),
        |h AS (SELECT stratum, dist2, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM dist GROUP BY 1, 2),
        |cm AS (SELECT stratum, dist2,
        |    CAST(SUM(n) OVER (PARTITION BY stratum ORDER BY dist2
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum
        |  FROM h),
        |tot AS (SELECT stratum, CAST(SUM(n) AS BIGINT) AS tot
        |  FROM h GROUP BY 1),
        |f AS (SELECT stratum,
        |    MIN(CASE WHEN cum * 20 >= tot * 19 THEN dist2 END) AS fence
        |  FROM cm JOIN tot USING (stratum) GROUP BY 1)
        |SELECT d.vec_id, d.stratum, d.dist2,
        |  d.dist2 > f.fence AS is_outlier
        |FROM dist d JOIN f USING (stratum)""".stripMargin,
    "q63_embed_gram" ->
      """WITH g AS (SELECT MAX(list_max(list_transform(embedding,
        |    x -> abs(CAST(x AS DOUBLE))))) AS gs FROM embeddings),
        |q AS (SELECT CASE WHEN g.gs = 0
        |    THEN list_transform(embedding, x -> 0::BIGINT)
        |    ELSE list_transform(embedding, x ->
        |      CAST(floor(CAST(x AS DOUBLE) / g.gs * 127.0 + 0.5) AS BIGINT))
        |    END AS qv
        |  FROM embeddings, g)
        |SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
        |  CAST(SUM(qv[i] * qv[j]) AS BIGINT) AS s
        |FROM q, generate_series(1, 64) AS g1(i),
        |  generate_series(1, 64) AS g2(j)
        |GROUP BY 1, 2""".stripMargin,
    "q50_repetition" ->
      s"""WITH t AS (SELECT doc_id, $dTokens AS toks FROM documents),
         |f AS (SELECT doc_id,
         |    CAST(greatest(len(toks) - 1, 0) AS BIGINT) AS n_bigrams,
         |    CAST(CASE WHEN len(toks) >= 2 THEN
         |      len(list_distinct(list_transform(range(0, len(toks) - 1),
         |        i -> array_to_string(toks[i+1:i+2], ' '))))
         |      ELSE 0 END AS BIGINT) AS n_distinct
         |  FROM t)
         |SELECT doc_id, n_bigrams, n_distinct,
         |  CASE WHEN n_bigrams = 0 THEN 0.0
         |       ELSE 1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
         |  END AS rep_ratio
         |FROM f""".stripMargin,
    "q49_minhash_est" ->
      s"""WITH sigs AS (SELECT doc_id, ${dMinhash(dHashedShingles, 16)} AS sig
         |  FROM documents),
         |s AS (SELECT * FROM sigs WHERE sig[1] IS NOT NULL),
         |bands AS (SELECT DISTINCT doc_id, unnest(list_transform(range(0, 4),
         |    b -> CONCAT(b, '-', array_to_string(sig[b*4+1:b*4+4], ','))))
         |    AS band_key
         |  FROM s),
         |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |  FROM bands x JOIN bands y
         |    ON x.band_key = y.band_key AND x.doc_id < y.doc_id),
         |j AS (SELECT c.id_a, c.id_b,
         |    CAST(len(list_filter(range(0, 16),
         |      i -> a.sig[i+1] = b.sig[i+1])) AS DOUBLE) / 16.0 AS jaccard_est
         |  FROM cand c
         |  JOIN s a ON a.doc_id = c.id_a
         |  JOIN s b ON b.doc_id = c.id_b)
         |SELECT id_a, id_b, jaccard_est FROM j
         |WHERE jaccard_est >= 0.5""".stripMargin,
    "q26_simhash" ->
      s"""SELECT doc_id, CAST(list_sum(list_transform(range(0, 32), b ->
         |  CASE WHEN list_sum(list_transform($dHashedTokens, h ->
         |      CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
         |    THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT) AS simhash
         |FROM documents""".stripMargin,
    "q27_cosine_topk" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
         |  FROM embeddings WHERE vec_id % 50 = 0),
         |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
         |j AS (SELECT query_id, neighbor_id, ${dCos("qv", "cv")} AS cos
         |  FROM q, c WHERE query_id <> neighbor_id),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, neighbor_id ASC) AS rn FROM j)
         |SELECT query_id, neighbor_id, cos, rn FROM r WHERE rn <= 5""".stripMargin,
    "q102_ann_store" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
         |  FROM embeddings WHERE vec_id % 50 = 0),
         |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
         |j AS (SELECT query_id, neighbor_id, ${dCos("qv", "cv")} AS cos
         |  FROM q, c WHERE query_id <> neighbor_id),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, neighbor_id ASC) AS rn FROM j)
         |SELECT query_id, neighbor_id, cos, rn FROM r WHERE rn <= 5""".stripMargin,
    "q103_ann_ingest_gate" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
         |  FROM embeddings WHERE vec_id % 3 = 0),
         |c AS (SELECT vec_id AS neighbor_id, embedding AS cv
         |  FROM embeddings WHERE vec_id % 3 <> 0),
         |j AS (SELECT query_id, neighbor_id, ${dCos("qv", "cv")} AS cos
         |  FROM q, c),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, neighbor_id ASC) AS rn FROM j)
         |SELECT query_id, neighbor_id, cos,
         |  CAST(cos >= 0.3 AS BIGINT) AS is_dup FROM r WHERE rn = 1"""
        .stripMargin,
    "q104_semantic_keepers" ->
      s"""WITH RECURSIVE v AS (SELECT vec_id, embedding,
         |    (SELECT $dBucket FROM (SELECT e0 AS v)) AS bucket
         |  FROM (SELECT vec_id, embedding, embedding AS e0 FROM embeddings)),
         |p AS (SELECT x.vec_id AS id_a, y.vec_id AS id_b
         |  FROM v x JOIN v y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
         |  WHERE ${dCos("x.embedding", "y.embedding")} >= 0.3),
         |edges AS (SELECT id_a AS u, id_b AS w FROM p
         |  UNION SELECT id_b, id_a FROM p),
         |walk(u, label) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
         |  UNION
         |  SELECT e.u, wk.label FROM edges e JOIN walk wk ON wk.u = e.w),
         |cc AS (SELECT u AS vid, min(label) AS cluster FROM walk GROUP BY u),
         |sz AS (SELECT cluster, COUNT(*) AS n FROM cc GROUP BY 1)
         |SELECT e.vec_id AS keeper_id,
         |  COALESCE(sz.n - 1, 0) AS dups_removed
         |FROM embeddings e
         |LEFT JOIN cc ON cc.vid = e.vec_id
         |LEFT JOIN sz ON sz.cluster = e.vec_id
         |WHERE cc.vid IS NULL OR cc.cluster = e.vec_id""".stripMargin,
    "q28_ann_lsh" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv,
         |    (SELECT $dBucket FROM (SELECT qv0 AS v)) AS bucket
         |  FROM (SELECT vec_id, embedding, embedding AS qv0 FROM embeddings
         |        WHERE vec_id % 50 = 0)),
         |c AS (SELECT vec_id AS neighbor_id, embedding AS cv,
         |    (SELECT $dBucket FROM (SELECT cv0 AS v)) AS bucket
         |  FROM (SELECT vec_id, embedding, embedding AS cv0 FROM embeddings)),
         |j AS (SELECT query_id, neighbor_id, q.bucket AS bucket,
         |    ${dCos("qv", "cv")} AS cos
         |  FROM q JOIN c ON q.bucket = c.bucket
         |  WHERE query_id <> neighbor_id),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, neighbor_id ASC) AS rn FROM j)
         |SELECT query_id, neighbor_id, bucket, cos, rn FROM r
         |WHERE rn <= 3""".stripMargin,
    "q29_embed_stats" ->
      s"""SELECT label, COUNT(*) AS n,
         |  MIN(sqrt(${dDot("embedding", "embedding")})) AS min_norm,
         |  MAX(sqrt(${dDot("embedding", "embedding")})) AS max_norm
         |FROM embeddings GROUP BY label""".stripMargin,
    "q30_multimodal_meta" ->
      // strlen = BYTE length in DuckDB (length() counts characters);
      // Spark's length(binary) counts bytes, so non-ASCII text agrees
      """SELECT doc_id,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  CAST(strlen(text) AS BIGINT) % 640 AS width,
        |  CAST(strlen(text) AS BIGINT) % 480 AS height,
        |  substr(md5(text), 1, 6) AS format_tag
        |FROM documents""".stripMargin,
    "q33_cosine_dedup" ->
      s"""WITH v AS (SELECT vec_id, embedding,
         |    (SELECT $dBucket FROM (SELECT e0 AS v)) AS bucket
         |  FROM (SELECT vec_id, embedding, embedding AS e0 FROM embeddings)),
         |p AS (SELECT x.vec_id AS id_a, y.vec_id AS id_b,
         |    ${dCos("x.embedding", "y.embedding")} AS cos
         |  FROM v x JOIN v y ON x.bucket = y.bucket AND x.vec_id < y.vec_id)
         |SELECT id_a, id_b, cos FROM p WHERE cos >= 0.3""".stripMargin,
    "q34_ivf_ann" ->
      s"""WITH c AS (SELECT vec_id AS cent_id, embedding AS cv
         |  FROM embeddings WHERE vec_id % 100 = 0),
         |a AS (SELECT e.vec_id AS vid, e.embedding AS ve, c.cent_id,
         |    ${dCos("e.embedding", "c.cv")} AS cent_cos
         |  FROM embeddings e CROSS JOIN c),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vid
         |    ORDER BY cent_cos DESC, cent_id ASC) AS crn FROM a),
         |cells AS (SELECT vid, ve, cent_id AS cell FROM r WHERE crn = 1),
         |j AS (SELECT q.vid AS query_id, x.vid AS neighbor_id,
         |    q.cell AS cell, ${dCos("q.ve", "x.ve")} AS cos
         |  FROM cells q JOIN cells x ON q.cell = x.cell AND q.vid <> x.vid
         |  WHERE q.vid % 50 = 0),
         |rr AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, neighbor_id ASC) AS rn FROM j)
         |SELECT query_id, neighbor_id, cell, cos, rn FROM rr
         |WHERE rn <= 3""".stripMargin,
    "q48_ivf_nprobe" ->
      s"""WITH c AS (SELECT vec_id AS cent_id, embedding AS cv
         |  FROM embeddings WHERE vec_id % 100 = 0),
         |a AS (SELECT e.vec_id AS vid, e.embedding AS ve, c.cent_id,
         |    ${dCos("e.embedding", "c.cv")} AS cent_cos
         |  FROM embeddings e CROSS JOIN c),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vid
         |    ORDER BY cent_cos DESC, cent_id ASC) AS crn FROM a),
         |cells AS (SELECT vid, ve, cent_id AS cell FROM r WHERE crn = 1),
         |probes AS (SELECT vid AS qvid, ve AS qv, cent_id AS cell
         |  FROM r WHERE vid % 50 = 0 AND crn <= 2),
         |j AS (SELECT q.qvid AS query_id, x.vid AS neighbor_id,
         |    ${dCos("q.qv", "x.ve")} AS cos
         |  FROM probes q JOIN cells x ON q.cell = x.cell AND q.qvid <> x.vid),
         |rr AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, neighbor_id ASC) AS rn FROM j)
         |SELECT query_id, neighbor_id, cos, rn FROM rr
         |WHERE rn <= 3""".stripMargin,
    "q35_token_bpe" ->
      """SELECT doc_id, CAST(len(regexp_extract_all(text,
        |  '''(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+'))
        |  AS BIGINT) AS n_bpe_tokens
        |FROM documents""".stripMargin,
    "q36_rolling_fingerprint" ->
      """SELECT doc_id, CASE WHEN length(canon) = 0 THEN 0 ELSE
        |  list_reduce(list_transform(string_split(canon, ''),
        |      c -> CAST(ord(c) AS BIGINT)),
        |    (h, c) -> (h * 131 + c) % 1000000007) END AS rhash
        |FROM (SELECT doc_id,
        |  regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS canon
        |  FROM documents)""".stripMargin,
    "q37_simhash_dedup" ->
      s"""WITH hs AS (SELECT doc_id,
         |    list_transform($dShingles, s ->
         |      CAST(CONCAT('0x', substr(md5(s), 1, 15)) AS BIGINT)) AS h
         |  FROM documents),
         |sim AS (SELECT doc_id, CAST(list_sum(list_transform(range(0, 60),
         |    b -> CASE WHEN list_sum(list_transform(h, x ->
         |        CASE WHEN (x >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
         |      THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT) AS sh
         |  FROM hs),
         |bands AS (SELECT DISTINCT doc_id, sh,
         |    unnest(list_transform(range(0, 4),
         |      b -> CONCAT(b, '-', (sh >> (b * 15)) & 32767))) AS bk
         |  FROM sim),
         |cand AS (SELECT DISTINCT x.doc_id AS id_a, x.sh AS sa,
         |    y.doc_id AS id_b, y.sh AS sb
         |  FROM bands x JOIN bands y
         |    ON x.bk = y.bk AND x.doc_id < y.doc_id)
         |SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(sa, sb)) <= 3""".stripMargin,
    "q41_quantize" ->
      """SELECT vec_id, scale,
        |  CASE WHEN scale = 0 THEN array_to_string(
        |      list_transform(embedding, x -> 0::BIGINT), ',')
        |    ELSE array_to_string(list_transform(embedding, x ->
        |      CAST(floor(CAST(x AS DOUBLE) / scale * 127 + 0.5) AS BIGINT)),
        |      ',') END AS qvec
        |FROM (SELECT vec_id, embedding,
        |  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
        |    AS scale
        |  FROM embeddings)""".stripMargin,
    "q42_vocab" ->
      """SELECT token, CAST(COUNT(*) AS BIGINT) AS df
        |FROM (SELECT DISTINCT doc_id, unnest(list_distinct(
        |    string_split_regex(trim(lower(text)), '\s+'))) AS token
        |  FROM documents)
        |GROUP BY token
        |ORDER BY df DESC, token ASC LIMIT 100""".stripMargin,
    "q45_corpus_clean" ->
      s"""WITH f AS (SELECT doc_id, text,
         |    CAST(len($dTokens) AS BIGINT) AS n_tokens,
         |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT)
         |      / CAST(length(text) AS BIGINT) AS alpha_ratio,
         |    ${dLexHits(TextOps.enWords)} AS en_hits,
         |    ${dLexHits(TextOps.deWords)} AS de_hits,
         |    ${dLexHits(TextOps.frWords)} AS fr_hits,
         |    ${dLexHits(TextOps.esWords)} AS es_hits
         |  FROM documents),
         |k AS (SELECT *,
         |    CASE WHEN en_hits >= greatest(de_hits, fr_hits, es_hits) THEN 'en'
         |         WHEN de_hits >= greatest(fr_hits, es_hits) THEN 'de'
         |         WHEN fr_hits >= es_hits THEN 'fr'
         |         ELSE 'es' END AS pred_lang
         |  FROM f)
         |SELECT md5(text) AS fingerprint, MIN(doc_id) AS doc_id,
         |  MIN(n_tokens) AS n_tokens, COUNT(*) AS cluster_size
         |FROM k
         |WHERE n_tokens >= 5 AND alpha_ratio >= 0.5 AND pred_lang = 'en'
         |GROUP BY 1""".stripMargin
  )
}
