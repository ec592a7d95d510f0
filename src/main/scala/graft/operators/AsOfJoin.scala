package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — attach to every left row the LATEST right row with the
  * same key and `right.ts <= left.ts` (inclusive). The temporal lookup
  * every event pipeline needs (an event joins the dimension state in
  * force when it happened: the crawl analogue is "which robots rules /
  * domain score were current at fetch time"), and a classic
  * hard-for-Spark operator: the naive formulation is a range join whose
  * candidate set explodes quadratically per key.
  *
  * Spark-first plan, no range join: tag both inputs, UNION them, and run
  * ONE key-partitioned window ordered by (ts, side) with a running
  * `last(payload, ignoreNulls)` over the unbounded-preceding rows frame
  * — right rows deposit their payload into the running carry, left rows
  * read it. Cost: one shuffle on the key + one in-partition sort,
  * identical asymptotics to the sort-merge ASOF native engines (DuckDB,
  * kdb) run, and it survives 100 TB because the window is per-key (the
  * partition count scales, no global ordering anywhere).
  *
  * Right rows must be unique per (key, ts) — pre-aggregate ties (the
  * q110 gate keeps MAX of the tied payload) or the carried row is
  * sort-nondeterministic.
  */
object AsOfJoin {

  /** `left` columns pass through; `payloadCols` from `right` are
    * appended (null when no right row is at or before the left ts), plus
    * `asofTsCol` = the matched right row's timestamp (null likewise).
    * Equal timestamps match (right sorts before left at the same ts).
    *
    * `tsCol` may be numeric (used as-is) or TimestampType (ordered at
    * MICROsecond precision via `unix_micros` — a bare `cast("long")`
    * would truncate timestamps to whole seconds, wrongly treating a
    * right row later within the same second as at-or-before a left
    * event).
    */
  def lastAtOrBefore(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String,
      payloadCols: Seq[String], asofTsCol: String = "asof_ts"): DataFrame = {
    require(payloadCols.nonEmpty, "payloadCols must be non-empty")
    def isTsType(df: DataFrame) = df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => true
      case _ => false
    }
    require(isTsType(left) == isTsType(right),
      s"$tsCol must be timestamp-typed on BOTH sides or NEITHER " +
        s"(left=${left.schema(tsCol).dataType}, " +
        s"right=${right.schema(tsCol).dataType}) — mixed kinds would " +
        "order on incomparable keys")
    def orderKey(df: DataFrame) =
      if (isTsType(df)) unix_micros(col(tsCol).cast("timestamp"))
      else col(tsCol).cast("long")
    val payload = struct(
      (payloadCols.map(col) :+ col(tsCol).as("__asof_ts")): _*)
    // left rows travel through the union as ONE typed struct column, so
    // arbitrary left schemas pass through bit-exact (no re-encoding)
    val leftRowType = org.apache.spark.sql.types.StructType(left.schema)
    val r = right.select(
      col(keyCol).as("__k"), orderKey(right).as("__ts"),
      payload.as("__p"), lit(0).as("__side"),
      lit(null).cast(leftRowType).as("__row"))
    val payloadType = r.schema("__p").dataType
    val l = left.select(
      col(keyCol).as("__k"), orderKey(left).as("__ts"),
      lit(null).cast(payloadType).as("__p"), lit(1).as("__side"),
      struct(left.columns.map(col): _*).as("__row"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = r.unionByName(l)
      .withColumn("__carry", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    joined.select(
      (left.columns.map(c => col(s"__row.$c").as(c)) ++
        payloadCols.map(c => col(s"__carry.$c").as(c)) :+
        col("__carry.__asof_ts").as(asofTsCol)): _*)
  }
}
