package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE merge training — the tokenizer-construction step a
  * training-data pipeline runs over its own corpus (GPT-2/RoBERTa
  * recipe: Sennrich et al. 2016, "Neural Machine Translation of Rare
  * Words with Subword Units"). [[TextOps.preTokenCount]] counts GPT-2
  * pre-tokens; this learns the merge table that turns pre-tokens into
  * actual BPE tokens.
  *
  * The classic trainer is a single-machine frequency loop; the corpus
  * statistics it needs (pair counts) are what distribute. Shape per
  * merge round:
  *   - adjacent-pair counts: one explode over word symbol arrays + one
  *     partial->final hash aggregate, weighted by word frequency — the
  *     shuffle carries distinct pairs, not corpus tokens;
  *   - argmax pair: TakeOrderedAndProject(1) — no global sort;
  *   - applying the merge rewrites the (distinct-word, symbols) table —
  *     a projection; word frequencies never recount.
  * Training runs on the DISTINCT-word table (vocabulary-sized, built
  * with one groupBy from the corpus), so merge rounds never rescan the
  * corpus — the standard trick that makes N merge rounds affordable:
  * round cost scales with |vocab|, not |corpus|.
  *
  * Determinism: counts are exact integers; argmax ties break on the
  * pair's lexicographic order — same corpus, same merges, any cluster.
  */
object BpeTrainer {

  /** (word, freq) vocabulary from a text column: ONE corpus pass. */
  def wordFrequencies(
      df: DataFrame, textCol: String): DataFrame =
    df.select(explode(expr(TextOps.tokensSql(s"lower($textCol)")))
        .as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))

  /** Learn `numMerges` BPE merges from a (word, freq) vocabulary.
    * Returns the ordered merge table Seq((left, right)) — apply with
    * [[encode]]. `</w>` end-of-word marker per the original recipe.
    */
  def trainMerges(
      vocab: DataFrame, numMerges: Int): Seq[(String, String)] = {
    val spark = vocab.sparkSession
    // split(word, '') keeps a trailing '' (Java split with limit -1) —
    // filter it before appending the end-of-word marker
    var words = vocab.select(col("word"), col("freq"),
        expr("concat(filter(split(word, ''), c -> c != ''), " +
          "array('</w>'))").as("syms"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      // pair extraction must be TOTAL on any array size: once a 1-char
      // word fully merges ("x</w>"), a transform over sequence(0, size-2)
      // would run the sequence DESCENDING and fault element_at — and a
      // size>=2 Filter does not save it, because InferFiltersFromGenerate
      // adds a size(pairs)>0 predicate that codegen subexpression
      // elimination evaluates EAGERLY alongside the guard. Zipping the
      // array with its shifted self (null sentinel appended, then
      // filtered) is in-bounds for every size including 0 and 1.
      val top = words
        .select(col("freq"), expr(
          "filter(zip_with(syms, " +
            "concat(slice(syms, 2, size(syms)), " +
            "array(cast(null as string))), " +
            "(l, r) -> struct(l as l, r as r)), " +
            "p -> p.r is not null)").as("pairs"))
        .select(col("freq"), explode(col("pairs")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1)
        .collect()
      if (top.isEmpty || top(0).getLong(2) < 2) exhausted = true
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        merges += ((l, r))
        // merge every adjacent (l, r) occurrence left-to-right; the
        // aggregate-fold carries (acc array, skip flag) so overlapping
        // occurrences ("a a a" under a+a) merge non-overlapping, as the
        // reference implementation does
        val applied = mergeSymsExpr("syms", l, r)
        words = words
          .select(col("word"), col("freq"), expr(applied).as("syms"))
          .localCheckpoint(true)
      }
      round += 1
    }
    merges.toSeq
  }

  /** Driver-local merge loop over the collected (word, freq) vocabulary —
    * the production path for real vocab sizes. [[trainMerges]] runs one
    * Spark job round-trip per merge; per-round cost is vocabulary-sized
    * (right), but a production tokenizer is 30k–50k merges, i.e. 30k–50k
    * scheduled jobs at ~0.3–1 s fixed overhead each — hours of pure
    * scheduling for seconds of compute. The vocabulary is small by
    * construction (distinct words, not corpus tokens: ~1M entries even
    * for web-scale corpora), so collect it ONCE — the only distributed
    * work BPE training actually needs is [[wordFrequencies]]' corpus
    * pass — and run the merge loop in memory with incrementally
    * maintained pair counts (the classic subword-nmt `learn_bpe` shape:
    * only words containing the just-merged pair are touched per round).
    *
    * Produces BYTE-identical merges to [[trainMerges]]: same exact
    * integer counts, same (cnt desc, l asc, r asc) argmax tie-break,
    * same left-to-right non-overlapping apply, same <2-count stop.
    */
  def trainMergesLocal(
      vocab: DataFrame, numMerges: Int): Seq[(String, String)] = {
    val collected = vocab
      .select(col("word"), col("freq").cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainMergesInMemory(collected, numMerges)
  }

  /** Pick the merge-loop venue by vocabulary size: collected loop when
    * the distinct-word table fits on the driver (it virtually always
    * does), per-round Spark jobs otherwise. The crossover is measured in
    * PERF_NOTES: the distributed loop's fixed ~0.4 s/merge scheduling
    * floor dominates for any numMerges over a few hundred.
    */
  def trainMergesAuto(
      vocab: DataFrame, numMerges: Int,
      maxLocalVocab: Long = 4000000L): Seq[(String, String)] =
    if (vocab.limit((maxLocalVocab + 1).toInt).count() <= maxLocalVocab)
      trainMergesLocal(vocab, numMerges)
    else trainMerges(vocab, numMerges)

  private[graft] def trainMergesInMemory(
      vocab: Array[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    import scala.collection.mutable
    val syms: Array[Array[String]] =
      vocab.map { case (w, _) => w.map(_.toString).toArray :+ "</w>" }
    val freqs: Array[Long] = vocab.map(_._2)
    val counts = mutable.HashMap.empty[(String, String), Long]
    // pair -> word ids that have EVER contained it; entries go stale
    // after rewrites (checked on use) but bound per-round work to the
    // words a merge can actually change
    val index = mutable.HashMap.empty[(String, String), mutable.BitSet]
    // lazy-deletion argmax heap: every count CHANGE pushes the pair at
    // its new value; pops discard entries whose value is stale. Replaces
    // the full O(|pairs|) scan per merge (the round-8 loop's dominant
    // cost at 50k merges) with amortized O(log) work per count update.
    // Head order = the distributed loop's exact argmax tie-break:
    // cnt desc, then l asc, then r asc.
    val heapOrd = new Ordering[(Long, String, String)] {
      def compare(a: (Long, String, String), b: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c
        else {
          val lc = b._2.compareTo(a._2) // smaller l wins the tie
          if (lc != 0) lc else b._3.compareTo(a._3)
        }
      }
    }
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](heapOrd)
    var heapLive = false // bulk-seed after the initial tally, not during
    def tally(wi: Int, sign: Long): Unit = {
      val s = syms(wi); val f = freqs(wi) * sign
      var i = 0
      while (i < s.length - 1) {
        val p = (s(i), s(i + 1))
        val c = counts.getOrElse(p, 0L) + f
        if (c == 0L) counts.remove(p) else counts(p) = c
        if (heapLive && c != 0L) heap.enqueue((c, p._1, p._2))
        if (sign > 0L) index.getOrElseUpdate(p, mutable.BitSet.empty) += wi
        i += 1
      }
    }
    syms.indices.foreach(tally(_, 1L))
    counts.foreach { case (p, c) => heap.enqueue((c, p._1, p._2)) }
    heapLive = true
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      // stale entries (value no longer current) drop on pop; the first
      // LIVE head is the true argmax under (cnt desc, l asc, r asc)
      var best: (String, String) = null
      var bestC = Long.MinValue
      while (best == null && heap.nonEmpty) {
        val (c, l, r) = heap.dequeue()
        if (counts.getOrElse((l, r), 0L) == c) { best = (l, r); bestC = c }
      }
      // bound stale buildup: if discards outnumber live pairs badly,
      // rebuild the heap from current counts (rare; keeps memory linear)
      if (heap.size > 4 * counts.size + (1 << 16)) {
        heap.clear()
        counts.foreach { case (p, c) => heap.enqueue((c, p._1, p._2)) }
      }
      if (best == null || bestC < 2L) exhausted = true
      else {
        merges += best
        val (l, r) = best
        index.remove(best).getOrElse(mutable.BitSet.empty).foreach { wi =>
          val s = syms(wi)
          var contains = false
          var i = 0
          while (i < s.length - 1 && !contains) {
            if (s(i) == l && s(i + 1) == r) contains = true
            i += 1
          }
          if (contains) {
            tally(wi, -1L)
            // left-to-right non-overlapping, exactly like mergeSymsExpr
            val out = mutable.ArrayBuffer.empty[String]
            var j = 0
            while (j < s.length) {
              if (j < s.length - 1 && s(j) == l && s(j + 1) == r) {
                out += (l + r); j += 2
              } else { out += s(j); j += 1 }
            }
            syms(wi) = out.toArray
            tally(wi, 1L)
          }
        }
      }
      round += 1
    }
    merges.toSeq
  }

  /** SQL expression merging adjacent (l, r) in a symbol array via a
    * left fold: state = (rebuilt array, just-merged flag).
    */
  private def mergeSymsExpr(symsCol: String, l: String, r: String): String = {
    def q(s: String) = "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    s"""aggregate(
       |  sequence(0, size($symsCol) - 1),
       |  struct(cast(array() as array<string>) as acc, false as merged),
       |  (st, i) -> CASE
       |    WHEN st.merged THEN struct(st.acc as acc, false as merged)
       |    WHEN i < size($symsCol) - 1
       |      AND element_at($symsCol, i + 1) = ${q(l)}
       |      AND element_at($symsCol, i + 2) = ${q(r)}
       |    THEN struct(concat(st.acc, array(${q(l + r)})) as acc,
       |      true as merged)
       |    ELSE struct(concat(st.acc,
       |      array(element_at($symsCol, i + 1))) as acc, false as merged)
       |  END,
       |  st -> st.acc)""".stripMargin.replaceAll("\n", " ")
  }

  /** Encode words with a learned merge table: broadcast-closure UDF
    * applying merges in training order (the standard greedy encode) —
    * pure projection over the corpus, zero shuffle. Returns the BPE
    * symbol array per input word.
    */
  def encodeWordUdf(merges: Seq[(String, String)]) = udf { (word: String) =>
    var syms = word.map(_.toString).toArray :+ "</w>"
    merges.foreach { case (l, r) =>
      if (syms.length >= 2) {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toArray
      }
    }
    syms.toSeq
  }

  /** True merged-BPE token count per document under a learned merge
    * table — the honest version of the count [[TextOps.preTokenCount]]
    * approximates. Distinct words encode once (vocabulary-sized work),
    * then a broadcast join prices every corpus word — the corpus itself
    * is never re-encoded.
    */
  def bpeTokenCounts(
      df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val words = df.select(col(idCol).as("doc_id"),
        explode(expr(TextOps.tokensSql(s"lower($textCol)"))).as("word"))
      .filter(length(col("word")) > 0)
    val lens = words.select(col("word")).distinct()
      .withColumn("n_bpe", size(encodeWordUdf(merges)(col("word")))
        .cast("long"))
    words.join(broadcast(lens), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n_bpe")).as("n_bpe_tokens"))
  }
}
