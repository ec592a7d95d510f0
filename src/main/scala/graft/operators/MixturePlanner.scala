package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus mixture planning — turns "40% web, 30% books, 30% code, 500B
  * tokens total" into per-stratum deterministic sampling rates, closing
  * the loop between the measured corpus ([[TextOps.tokenStats]], q57),
  * hash-gated sampling ([[TextOps.sampleByHash]], q51) and budget
  * packing ([[TextOps.packTokenBudget]], q52).
  *
  * Everything here is driver-side arithmetic over per-stratum aggregates
  * (cardinality = number of sources/languages, never corpus-sized); the
  * corpus-touching pieces stay the existing zero-shuffle operators.
  */
object MixturePlanner {

  final case class StratumPlan(
    stratum: String, available: Long, target: Long, rate: Double,
    /** tokens the rate cannot reach because the stratum is too small
      * (rate capped at maxRate — no silent upsampling). */
    shortfall: Long)

  /** Per-stratum token totals: one partial->final aggregate. */
  def tokenTotals(
      df: DataFrame, strataCol: String, textCol: String): Map[String, Long] =
    df.select(col(strataCol).as("stratum"),
        TextOps.preTokenCount(col(textCol)).as("n"))
      .groupBy(col("stratum"))
      .agg(sum(col("n")).as("total"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Solve rates so stratum s contributes ~weights(s) * budgetTokens.
    * Rates cap at `maxRate` (default 1.0: sample, never duplicate);
    * capped strata report their shortfall instead of silently borrowing
    * from other strata — redistribution is a policy decision the caller
    * makes by re-weighting, not something a planner should hide.
    * Weights normalize to sum 1; strata absent from `weights` get 0.
    */
  def plan(
      tokenCounts: Map[String, Long], weights: Map[String, Double],
      budgetTokens: Long, maxRate: Double = 1.0): Seq[StratumPlan] = {
    require(budgetTokens >= 0, "budget must be non-negative")
    require(weights.values.forall(_ >= 0), "weights must be non-negative")
    val wSum = weights.values.sum
    tokenCounts.toSeq.sortBy(_._1).map { case (s, avail) =>
      val w = if (wSum > 0) weights.getOrElse(s, 0.0) / wSum else 0.0
      val target = math.round(w * budgetTokens)
      val rate =
        if (avail <= 0L || target == 0L) 0.0
        else math.min(target.toDouble / avail, maxRate)
      val got = math.round(rate * avail)
      StratumPlan(s, avail, target, rate, math.max(target - got, 0L))
    }
  }

  /** Apply a plan with the deterministic hash gate: rows survive per
    * their stratum's planned rate. Pure filter — [[TextOps.sampleByHash]]
    * semantics, zero shuffle.
    */
  def applyPlan(
      df: DataFrame, idCol: String, strataCol: String,
      plans: Seq[StratumPlan]): DataFrame =
    TextOps.sampleByHash(df, idCol, strataCol,
      plans.map(p => p.stratum -> p.rate).toMap, defaultRate = 0.0)

  /** Temperature-flattened mixture shares (the multilingual-LM sampling
    * scheme of Conneau & Lample 2019 / mT5: sample source s with
    * probability ∝ share_s^(1/T), T=2 — boosts small sources, damps the
    * head). Computed entirely in integer arithmetic so the plan table
    * oracle-hashes: weight_s = isqrt(token_s) (integer square root =
    * floor of the correctly-rounded IEEE sqrt — exact for counts < 2^52,
    * i.e. any real corpus), share_ppm = weight_s * 1e6 div Σ weights.
    * The integer Σ is order-independent, so no float-summation-order
    * hazard exists anywhere in the plan.
    *
    * Scale shape: one partial->final token aggregate onto ~#sources
    * cells, then a 1-row global-sum broadcast joined back (the q44
    * quota-ratio shape) — the corpus is scanned once, the plan side is
    * source-cardinality-sized. Feed the resulting ppm shares to
    * [[plan]]/[[applyPlan]] (rate = target_s / available_s) to realize
    * the mixture with the deterministic hash gate.
    */
  def temperaturePlan(
      df: DataFrame, strataCol: String, textCol: String): DataFrame = {
    val totals = df.select(col(strataCol).as("stratum"),
        TextOps.preTokenCount(col(textCol)).as("n"))
      .groupBy(col("stratum"))
      .agg(sum(col("n")).as("n_tokens"))
      .select(col("stratum"), col("n_tokens"),
        expr("cast(floor(sqrt(cast(n_tokens as double))) as bigint)")
          .as("weight"))
    totals.crossJoin(
        broadcast(totals.agg(sum(col("weight")).as("weight_sum"))))
      .select(col("stratum"), col("n_tokens"), col("weight"),
        expr("(weight * 1000000) div weight_sum").as("share_ppm"))
  }
}
