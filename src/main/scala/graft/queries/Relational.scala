package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Relational operator coverage mapped from SURVEY.md §2: every shape the
  * reference topology wires (filter/project, aggregation, top-K global and
  * per-key, count-windowed moving average, recency merge, unions,
  * broadcast/semi/anti joins, time bucketing, status CASE mapping), expressed
  * as deterministic Spark plans over the driver's TPC-H-ish tables, each with
  * a DuckDB oracle.
  *
  * Numeric-parity rules (so the driver's value-hash compare is exact):
  *  - money/quantity doubles are cast per-row to DECIMAL(18,2), summed
  *    exactly, and the exact sum cast to DOUBLE;
  *  - averages of doubles are rounded to 4 decimals;
  *  - timestamps are surfaced as epoch milliseconds (unix_millis /
  *    epoch_ms), never as raw timestamp columns;
  *  - every ranking has a total-order tie-break.
  */
object Relational {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") Tables.events(spark, dir)
    else Tables.table(spark, dir, name)

  private val dec = DecimalType(18, 2)

  /** L3 ValidUrlsFilter shape: predicate + projection, pushed to the scan. */
  def filterProject(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .filter(col("o_orderstatus") === "O" && col("o_totalprice") > 150000.0)
      .select(
        col("o_orderkey"),
        col("o_custkey"),
        col("o_totalprice").cast(dec).cast("double").as("price"))

  /** G2 score-sum merge shape (TPC-H Q1 style aggregation). */
  def aggSum(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(dec)).cast("double").as("sum_price"),
        count(lit(1)).as("n"),
        (sum(col("l_quantity").cast(dec)).cast("double") / count(lit(1)))
          .as("avg_qty"))

  /** U2 FetchQueue: continuous global top-K by score (TakeOrderedAndProject). */
  def topKGlobal(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        col("o_totalprice").cast(dec).cast("double").as("score"))
      .orderBy(col("score").desc, col("o_orderkey").asc)
      .limit(100)

  /** §2.8 outlink top-50-per-page shape: ranked window, K per key. */
  def topKPerKey(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("l_returnflag"))
      .orderBy(
        col("l_extendedprice").desc,
        col("l_orderkey").asc,
        col("l_linenumber").asc)
    t(spark, dir, "lineitem")
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= 5)
      .select(
        col("l_returnflag"),
        col("rn"),
        col("l_orderkey"),
        col("l_linenumber"),
        col("l_extendedprice").cast(dec).cast("double").as("price"))
  }

  /** G1 MovingAverageFunction: per-key running average of the last 10
    * values (count-based sliding window), emitted per input row.
    */
  def movingAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(-9, 0)
    // exact decimal window sum / count -> one deterministic IEEE division
    t(spark, dir, "events")
      .select(
        col("event_id"),
        col("user_id"),
        (sum(col("value").cast(dec)).over(w).cast("double") /
          count(lit(1)).over(w)).as("mavg"))
  }

  /** U3 DefaultUrlStateMerger recency rule: latest record per key wins
    * (max statusTime, deterministic tie-break).
    */
  def mergeRecency(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    t(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("status_time_ms"),
        col("o_orderstatus"))
  }

  /** SO1/SO2 union + dedup (closing the crawl-DB loop). */
  def unionDedup(spark: SparkSession, dir: String): DataFrame = {
    val a = t(spark, dir, "orders").select(col("o_custkey").as("key"))
    val b = t(spark, dir, "customer")
      .select(col("c_custkey").cast(LongType).as("key"))
    a.unionByName(b).distinct()
  }

  /** J1 co-partitioned join with a small dimension: broadcast hash join. */
  def joinBroadcast(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .join(
        broadcast(t(spark, dir, "customer")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(dec)).cast("double").as("revenue"))

  /** Multi-way star join: fact large, dims broadcast; revenue by nation. */
  def joinMultiRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val o = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
    val c = t(spark, dir, "customer")
    val n = t(spark, dir, "nation")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(col("l_extendedprice").cast(dec) *
            (lit(1).cast(dec) - col("l_discount").cast(dec)))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Left-semi join (EXISTS): orders having any heavy line item. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .join(
        t(spark, dir, "lineitem").filter(col("l_quantity") > 45.0),
        col("o_orderkey") === col("l_orderkey"),
        "left_semi")
      .select(col("o_orderkey"), col("o_orderstatus"))

  /** Left-anti join (NOT EXISTS): customers with no orders. */
  def antiJoin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(
        t(spark, dir, "orders"),
        col("c_custkey") === col("o_custkey"),
        "left_anti")
      .select(col("c_custkey"), col("c_name"))

  /** G4 TimedCounter shape: event rate per time bucket (1 h) per type. */
  def eventRate(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(
        expr("unix_timestamp(ts) div 3600").as("bucket"),
        col("event_type"),
        col("value"))
      .groupBy(col("bucket"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(dec)).cast("double").as("sum_value"))

  /** G4 TimedCounter, faithful form: the reference's fetches/sec gauge is a
    * 30-second *sliding* per-second ring buffer (FetchUrlsFunction.java
    * :169-224). Batch equivalent: per-second counts + a RANGE window over
    * the preceding 29 seconds, partitioned by event type. The RANGE frame
    * is on a numeric sort key, so gaps in the second sequence are handled
    * by frame semantics, not by densifying rows.
    */
  def slidingRate(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("sec"))
      .rangeBetween(-29, 0)
    t(spark, dir, "events")
      .select(col("event_type"), unix_timestamp(col("ts")).as("sec"))
      .groupBy(col("event_type"), col("sec"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n_30s", sum(col("n")).over(w))
  }

  /** Bloom-prefiltered semi join (§2.7 note: the reference ships an unused
    * BloomFilter utility; Spark's sketch support makes it a first-class
    * shuffle-volume cutter). Result is exactly the plain semi join, so the
    * oracle is an IN-subquery.
    */
  def bloomSemi(spark: SparkSession, dir: String): DataFrame = {
    val large = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey").cast("string").as("custkey"))
    val small = t(spark, dir, "customer")
      .filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey").cast("string").as("custkey"))
    graft.operators.BloomPrefilter
      .semiJoin(large, small, "custkey", expectedItems = 100000L)
      .select(col("o_orderkey"), col("custkey"))
  }

  val bloomSemiSql: String =
    """SELECT o_orderkey, CAST(o_custkey AS VARCHAR) AS custkey
      |FROM orders
      |WHERE o_custkey IN (
      |  SELECT c_custkey FROM customer WHERE c_custkey % 10 = 0)""".stripMargin

  /** Salted skew join ([[graft.operators.SkewJoin]]): result must equal
    * the plain inner join row-for-row (multiplicity included) — the oracle
    * IS the plain join, so a salting bug (lost/duplicated salt matches)
    * hash-fails. Shape: hot-key frontier ⋈ domain table with the big side
    * scattered over the salt space.
    */
  def skewJoin(spark: SparkSession, dir: String): DataFrame = {
    val skewed = t(spark, dir, "lineitem")
      .select(
        col("l_orderkey").as("okey"),
        col("l_linenumber"),
        col("l_extendedprice").cast(dec).cast("double").as("price"))
    val other = t(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey").as("okey"), col("o_custkey"))
    graft.operators.SkewJoin.saltedInnerJoin(skewed, other, "okey", salts = 8)
      .select(col("okey"), col("l_linenumber"), col("o_custkey"), col("price"))
  }

  /** G1/G3 quota shape (CrawlTopology score-adaptive scheduling): per-key
    * mean scaled against the global mean, with the global mean computed as
    * a broadcast 1-row aggregate (NOT an empty-frame window, which funnels
    * all keys through one partition). Decimal sums keep both means exact;
    * the only doubles are two deterministic IEEE divisions per row.
    */
  def quotaRatio(spark: SparkSession, dir: String): DataFrame = {
    val per = t(spark, dir, "events")
      .select(col("user_id"), col("value").cast(dec).as("v"))
      .groupBy(col("user_id"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
    val global = per.agg(
      sum(col("s")).as("gs"), sum(col("n")).as("gn"))
    per.crossJoin(broadcast(global))
      .select(
        col("user_id"),
        (col("s").cast("double") / col("n")).as("uavg"),
        ((col("s").cast("double") / col("n")) /
          (col("gs").cast("double") / col("gn"))).as("ratio"))
  }

  /** ExceptionUtils HTTP-status CASE mapping shape. */
  def caseStatus(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(
        when(col("event_type") === "error", "HTTP_SERVER_ERROR")
          .when(col("event_type") === "purchase", "FETCHED")
          .when(col("event_type") === "signup", "UNFETCHED")
          .otherwise("SKIPPED_DEFERRED")
          .as("status"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n"))

  /** Temporal AS-OF lookup ([[graft.operators.AsOfJoin]]): every event
    * joins the latest order its user placed AT OR BEFORE the event — the
    * "state in force when it happened" join (the crawl analogue: which
    * robots rules / domain score were current at fetch time). Users
    * ≡ 0 (mod 7) have their orders withheld so the no-match null path is
    * gated too. The oracle is DuckDB's NATIVE `ASOF LEFT JOIN`, so the
    * union+running-carry plan is pinned against an independent
    * sort-merge-asof implementation, not against itself.
    */
  def asofJoinProbe(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events").select(
      col("event_id"), col("user_id"),
      unix_millis(col("ts").cast("timestamp")).as("ets"))
    val ord = t(spark, dir, "orders")
      .filter(col("o_custkey") % 7 =!= 0)
      .groupBy(col("o_custkey").as("user_id"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("ets"))
      .agg(max(col("o_orderkey")).as("okey"))
    graft.operators.AsOfJoin.lastAtOrBefore(
      ev, ord, "user_id", "ets", Seq("okey"), asofTsCol = "order_ts")
  }

  val asofJoinProbeSql: String =
    """WITH r AS (SELECT o_custkey AS user_id,
      |    epoch_ms(o_orderdate) AS rts, MAX(o_orderkey) AS okey
      |  FROM orders WHERE o_custkey % 7 <> 0 GROUP BY 1, 2),
      |e AS (SELECT event_id, user_id, epoch_ms(ts) AS ets FROM events)
      |SELECT e.event_id, e.user_id, e.ets, r.okey, r.rts AS order_ts
      |FROM e ASOF LEFT JOIN r
      |  ON e.user_id = r.user_id AND e.ets >= r.rts""".stripMargin

  /** Gap-based sessionization: consecutive events of a user at most
    * `gapMs` apart belong to one session — a gap of EXACTLY `gapMs`
    * stays in one session (split only on `> gapMs`), matching Structured
    * Streaming's `session_window`, whose merging iterator joins ADJACENT
    * windows (previous end == next start ⇒ merge; empirically pinned by
    * the batch≡stream replay spec in StreamingSpec). Two key-partitioned
    * windows — a lag to flag session starts, a running sum to number
    * them — then one hash aggregate; every column integer epoch millis,
    * so session boundaries are engine-exact.
    */
  def sessionize(
      events: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      gapMs: Long): DataFrame = {
    val order = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    events
      .withColumn("__prev", lag(col(tsCol), 1).over(order))
      .withColumn("__new",
        when(col("__prev").isNull ||
          col(tsCol) - col("__prev") > gapMs, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("__new")).over(
          order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        (max(col(tsCol)) - min(col(tsCol))).as("duration_ms"))
  }

  def sessionizeProbe(spark: SparkSession, dir: String): DataFrame =
    sessionize(
      t(spark, dir, "events").select(
        col("user_id"), unix_millis(col("ts").cast("timestamp")).as("ets"), col("event_id")),
      "user_id", "ets", "event_id", gapMs = 6L * 3600000L)

  val sessionizeProbeSql: String =
    """WITH e AS (SELECT user_id, epoch_ms(ts) AS ets, event_id FROM events),
      |f AS (SELECT user_id, ets, event_id,
      |    lag(ets) OVER (PARTITION BY user_id ORDER BY ets, event_id)
      |      AS prev
      |  FROM e),
      |n AS (SELECT user_id, ets,
      |    CASE WHEN prev IS NULL OR ets - prev > 21600000
      |         THEN 1 ELSE 0 END AS is_new,
      |    event_id
      |  FROM f),
      |s AS (SELECT user_id, ets,
      |    CAST(SUM(is_new) OVER (PARTITION BY user_id
      |      ORDER BY ets, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS session_idx
      |  FROM n)
      |SELECT user_id, session_idx, COUNT(*) AS n_events,
      |  MIN(ets) AS session_start, MAX(ets) AS session_end,
      |  MAX(ets) - MIN(ets) AS duration_ms
      |FROM s GROUP BY 1, 2""".stripMargin

  /** Queries + DuckDB oracles, keyed for SparkEntry. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q110_asof_join" -> (asofJoinProbe _),
    "q111_sessionize" -> (sessionizeProbe _),
    "q01_filter_project" -> (filterProject _),
    "q02_agg_sum" -> (aggSum _),
    "q03_topk_global" -> (topKGlobal _),
    "q04_topk_per_key" -> (topKPerKey _),
    "q05_moving_avg" -> (movingAvg _),
    "q06_merge_recency" -> (mergeRecency _),
    "q07_union_dedup" -> (unionDedup _),
    "q08_join_broadcast" -> (joinBroadcast _),
    "q09_join_multi_revenue" -> (joinMultiRevenue _),
    "q10_semi_join" -> (semiJoin _),
    "q11_anti_join" -> (antiJoin _),
    "q12_event_rate" -> (eventRate _),
    "q13_case_status" -> (caseStatus _),
    "q38_sliding_rate" -> (slidingRate _),
    "q40_bloom_semi" -> (bloomSemi _),
    "q43_skew_join" -> (skewJoin _),
    "q44_quota_ratio" -> (quotaRatio _)
  )

  val oracleSql: Map[String, String] = Map(
    "q110_asof_join" -> asofJoinProbeSql,
    "q111_sessionize" -> sessionizeProbeSql,
    "q01_filter_project" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        |FROM orders
        |WHERE o_orderstatus = 'O' AND o_totalprice > 150000.0""".stripMargin,
    "q02_agg_sum" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q03_topk_global" ->
      """SELECT o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS score
        |FROM orders ORDER BY score DESC, o_orderkey ASC LIMIT 100""".stripMargin,
    "q04_topk_per_key" ->
      """SELECT l_returnflag, rn, l_orderkey, l_linenumber, price FROM (
        |  SELECT l_returnflag,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC) AS BIGINT) AS rn,
        |    l_orderkey, l_linenumber,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        |  FROM lineitem) WHERE rn <= 5""".stripMargin,
    "q05_moving_avg" ->
      """SELECT event_id, user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    / COUNT(*) OVER w AS mavg
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |  ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q06_merge_recency" ->
      """SELECT o_custkey, o_orderkey,
        |  epoch_ms(o_orderdate) AS status_time_ms, o_orderstatus
        |FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) WHERE rn = 1""".stripMargin,
    "q07_union_dedup" ->
      """SELECT DISTINCT key FROM (
        |  SELECT o_custkey AS key FROM orders
        |  UNION ALL SELECT CAST(c_custkey AS BIGINT) FROM customer)""".stripMargin,
    "q08_join_broadcast" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q09_join_multi_revenue" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name""".stripMargin,
    "q10_semi_join" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity > 45.0)""".stripMargin,
    "q11_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q12_event_rate" ->
      """SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS bucket, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q13_case_status" ->
      """SELECT CASE event_type
        |    WHEN 'error' THEN 'HTTP_SERVER_ERROR'
        |    WHEN 'purchase' THEN 'FETCHED'
        |    WHEN 'signup' THEN 'UNFETCHED'
        |    ELSE 'SKIPPED_DEFERRED' END AS status,
        |  COUNT(*) AS n
        |FROM events GROUP BY 1""".stripMargin,
    "q38_sliding_rate" ->
      """WITH s AS (SELECT event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
        |g AS (SELECT event_type, sec, COUNT(*) AS n FROM s GROUP BY 1, 2)
        |SELECT event_type, sec, n,
        |  CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY sec
        |    RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_30s
        |FROM g""".stripMargin,
    "q40_bloom_semi" -> bloomSemiSql,
    "q43_skew_join" ->
      """SELECT l_orderkey AS okey, l_linenumber, o_custkey,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'F'""".stripMargin,
    "q44_quota_ratio" ->
      """WITH p AS (
        |  SELECT user_id, SUM(CAST(value AS DECIMAL(18,2))) AS s,
        |    COUNT(*) AS n
        |  FROM events GROUP BY user_id),
        |g AS (SELECT SUM(s) AS gs, SUM(n) AS gn FROM p)
        |SELECT user_id,
        |  CAST(s AS DOUBLE) / n AS uavg,
        |  (CAST(s AS DOUBLE) / n) / (CAST(gs AS DOUBLE) / gn) AS ratio
        |FROM p, g""".stripMargin
  )
}
