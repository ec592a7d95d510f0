package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

class RelationalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has rows or a deterministic empty result") {
    val counts = SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sf).count()
    }
    // anti-join may legitimately be empty; everything else must produce rows
    counts.foreach { case (name, n) =>
      if (name != "q11_anti_join") assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every query has either an oracle or is explicitly rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // keep this list tight: only genuinely non-SQL-expressible ops belong here
    val rowsOnlyAllowed = Set.empty[String]
    assert((missing -- rowsOnlyAllowed).isEmpty,
      s"queries without oracle: ${missing -- rowsOnlyAllowed}")
  }

  test("suite-wide flat-plan audit: no cartesian or global window anywhere") {
    // every driver-gate query's FINAL adaptive plan passes the
    // scale-killer scan — the per-query pins above catch specific
    // regressions; this catches the ones nobody thought to pin
    val violations = SparkEntry.queries.toSeq.sortBy(_._1)
      .flatMap { case (name, fn) =>
        val df = fn(spark, sf)
        df.collect()
        val s = df.queryExecution.executedPlan.toString
        val fin = s.indexOf("== Final Plan ==")
        val init = s.indexOf("== Initial Plan ==")
        val plan = if (fin >= 0 && init > fin) s.substring(fin, init) else s
        graft.plans.PlanChecks.scaleViolations(plan).map(v => s"$name: $v")
      }
    assert(violations.isEmpty, violations.mkString("\n"))
  }

  test("q02 aggregates all six flag/status groups") {
    val got = SparkEntry.queries("q02_agg_sum")(spark, sf).collect()
    assert(got.length == 6)
  }

  test("q03 top-K is sorted descending and capped") {
    val rows = SparkEntry.queries("q03_topk_global")(spark, sf).collect()
    assert(rows.length == 100)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.sameElements(scores.sorted(Ordering[Double].reverse)))
  }
}
