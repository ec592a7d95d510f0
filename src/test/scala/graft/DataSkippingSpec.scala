package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.DataSkipping
import graft.operators.DataSkipping.{ColRange, PruneInfo}
import graft.plans.ZOrderCodegen

/** Z-order layout + footer-stats file skipping: the Morton kernel's
  * order properties, sidecar-vs-data agreement, prune soundness (pruned
  * reads return EXACTLY the full-scan answer), and the reason the layout
  * exists — a 2-D rectangle must open a small fraction of the files
  * where the same data sorted on ONE column opens all of them for an
  * off-column predicate.
  */
class DataSkippingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_skip").toString

  test("morton kernel: per-dimension monotonicity and bit-exact interleave") {
    // fixing one coordinate, the code is strictly monotone in the other
    val ys = Seq(0L, 1L, 5L, 1000L, 0x7fffffffL)
    for (y <- ys) {
      val codes = (0L to 64L).map(x => ZOrderCodegen.interleave2(x, y))
      assert(codes == codes.sorted && codes.distinct.size == codes.size,
        s"not monotone in x at y=$y")
    }
    // bit-exact spot checks: z(x,y) places bit i of x at 2i, of y at 2i+1
    assert(ZOrderCodegen.interleave2(0L, 0L) == 0L)
    assert(ZOrderCodegen.interleave2(1L, 0L) == 1L)
    assert(ZOrderCodegen.interleave2(0L, 1L) == 2L)
    assert(ZOrderCodegen.interleave2(3L, 3L) == 15L)
    assert(ZOrderCodegen.interleave2(0x7fffffffL, 0x7fffffffL) ==
      0x3fffffffffffffffL)
    // out-of-range clamps to the curve ends instead of wrapping
    assert(ZOrderCodegen.interleave2(-5L, 7L) ==
      ZOrderCodegen.interleave2(0L, 7L))
    assert(ZOrderCodegen.interleave2(Long.MaxValue, 7L) ==
      ZOrderCodegen.interleave2(0x7fffffffL, 7L))
    // 3-D: bit i of each dim lands at 3i + dimIndex
    assert(ZOrderCodegen.interleave3(1L, 0L, 0L) == 1L)
    assert(ZOrderCodegen.interleave3(0L, 1L, 0L) == 2L)
    assert(ZOrderCodegen.interleave3(0L, 0L, 1L) == 4L)
    assert(ZOrderCodegen.interleave3(0x1fffffL, 0x1fffffL, 0x1fffffL) ==
      0x7fffffffffffffffL)
  }

  private def grid(n: Int) =
    spark.range(n.toLong).select(
      (col("id") % 1000L).as("x"),
      expr("(id div 1000) * 7 % 1000").as("y"),
      col("id").as("payload"))

  test("pruned read returns exactly the full-scan answer, reading a small fraction of files") {
    val dir = tmp() + "/zgrid"
    val df = grid(200000)
    DataSkipping.writeZOrdered(df, dir, Seq("x", "y"), nFiles = 64)
    val ranges = Seq(ColRange("x", 100, 149), ColRange("y", 300, 349))
    val (got, info) = DataSkipping.prunedRead(spark, dir, ranges)
    val expect = df.filter(col("x").between(100, 149) &&
      col("y").between(300, 349))
    assert(got.columns.toSet == Set("x", "y", "payload"), "layout column leaked")
    val gotSet = got.select("payload").collect().map(_.getLong(0)).toSet
    val expSet = expect.select("payload").collect().map(_.getLong(0)).toSet
    assert(gotSet == expSet, "pruned read diverged from full scan")
    assert(info.filesTotal == 64)
    // a 5% x 5% rectangle over a Z-clustered 64-file layout: the curve
    // bounds the touched files to the rectangle's neighborhood
    assert(info.filesRead <= 16,
      s"z-order read ${info.filesRead}/64 files for a 5%x5% rectangle")
  }

  test("z-order skips where a single-column sort cannot (off-column predicate)") {
    val dir = tmp()
    val df = grid(200000)
    // same data, sorted on x only — y ranges are wide in every file
    val linear = dir + "/linear"
    df.repartitionByRange(64, col("x")).sortWithinPartitions("x")
      .write.parquet(linear)
    DataSkipping.writeStats(spark, linear, Seq("x", "y"))
    val zdir = dir + "/z"
    DataSkipping.writeZOrdered(df, zdir, Seq("x", "y"), nFiles = 64)
    val yOnly = Seq(ColRange("y", 300, 349))
    val (gotL, infoL) = DataSkipping.prunedRead(spark, linear, yOnly)
    val (gotZ, infoZ) = DataSkipping.prunedRead(spark, zdir, yOnly)
    val exp = df.filter(col("y").between(300, 349))
      .select("payload").collect().map(_.getLong(0)).toSet
    assert(gotL.select("payload").collect().map(_.getLong(0)).toSet == exp)
    assert(gotZ.select("payload").collect().map(_.getLong(0)).toSet == exp)
    assert(infoZ.filesRead < infoL.filesRead,
      s"z ${infoZ.filesRead} vs linear ${infoL.filesRead}: the interleave " +
        "should keep off-column ranges narrow")
    assert(infoZ.filesRead <= 32,
      s"5% band on the second dimension read ${infoZ.filesRead}/64")
  }

  test("sidecar stats agree with the actual per-file min/max") {
    val dir = tmp() + "/zsmall"
    DataSkipping.writeZOrdered(grid(20000), dir, Seq("x", "y"), nFiles = 8)
    val stats = DataSkipping.readStats(spark, dir)
      .collect { case (k, Some(mm)) => k -> mm }
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet"))
    assert(files.length == 8)
    files.foreach { f =>
      val d = spark.read.parquet(f.getAbsolutePath)
      val row = d.agg(min("x"), max("x"), min("y"), max("y")).head()
      assert(stats((f.getName, "x")) == ((row.getLong(0), row.getLong(1))))
      assert(stats((f.getName, "y")) == ((row.getLong(2), row.getLong(3))))
    }
  }

  test("timestamp keys: micros ranges prune and filter consistently") {
    val dir = tmp() + "/zts"
    val base = 1704672000000000L // 2024-01-08T00:00:00Z in micros
    val df = spark.range(50000L).select(
      (col("id") % 500L).as("k"),
      timestamp_micros(col("id") * 60000000L + lit(base)).as("ts"),
      col("id").as("payload"))
    DataSkipping.writeZOrdered(df, dir, Seq("k", "ts"), nFiles = 16)
    val lo = base + 5000L * 60000000L
    val hi = base + 9999L * 60000000L
    val (got, info) = DataSkipping.prunedRead(spark, dir,
      Seq(ColRange("k", 0, 499), ColRange("ts", lo, hi)))
    val exp = df.filter(unix_micros(col("ts")).between(lo, hi))
      .select("payload").collect().map(_.getLong(0)).toSet
    assert(got.select("payload").collect().map(_.getLong(0)).toSet == exp)
    assert(got.count() == 5000L)
    assert(info.filesRead < info.filesTotal,
      s"a 10% time band read every file (${info.filesRead}/${info.filesTotal})")
  }

  test("disjoint range reads zero files and keeps the schema; null keys rank low and stay readable") {
    val dir = tmp() + "/znull"
    val df = spark.range(1000L).select(
      when(col("id") % 10L === 0L, lit(null)).otherwise(col("id") % 100L)
        .cast("long").as("x"),
      (col("id") % 50L).as("y"),
      col("id").as("payload"))
    DataSkipping.writeZOrdered(df, dir, Seq("x", "y"), nFiles = 4)
    val (empty, info) = DataSkipping.prunedRead(spark, dir,
      Seq(ColRange("x", 5000, 6000)))
    assert(info.filesRead == 0 && empty.isEmpty)
    assert(empty.columns.toSet == Set("x", "y", "payload"))
    // the full x-range returns every NON-NULL-x row (range predicates are
    // null-rejecting, same as the equivalent SQL filter)
    val (allX, _) = DataSkipping.prunedRead(spark, dir,
      Seq(ColRange("x", 0, 99)))
    assert(allX.count() == 900L)
  }

  test("the range predicate is pushed to the parquet scan of the survivors") {
    // file-level skipping composes with Spark's own row-group pruning:
    // prunedRead's filter must reach the scan as PushedFilters, not sit
    // above it as a post-scan Filter only
    val dir = tmp() + "/zpush"
    DataSkipping.writeZOrdered(grid(20000), dir, Seq("x", "y"), nFiles = 8)
    // grid(20000) spans y in [0, 133] — the rectangle must intersect it
    val (got, info) = DataSkipping.prunedRead(spark, dir,
      Seq(ColRange("x", 100, 149), ColRange("y", 28, 84)))
    assert(got.collect().nonEmpty && info.filesRead > 0)
    val s = got.queryExecution.executedPlan.toString
    // PushedFilters pins the pushdown; the y bound is asserted through
    // DataFilters because the PushedFilters list renders truncated
    assert(s.contains("PushedFilters: [IsNotNull(x), IsNotNull(y), " +
      "GreaterThanOrEqual(x,100)") && s.contains("<= 84)"),
      s"range filters not pushed to the scan:\n$s")
  }

  test("hashed 64-bit keys spanning the full long range still cluster and prune") {
    // lo ≈ -2^63, hi ≈ 2^63: the span exceeds Long.MaxValue, so the rank
    // normalization must run in the double domain — a long-subtraction
    // overflow would silently collapse the rank to 0 and defeat skipping
    val dir = tmp() + "/zhash"
    val df = spark.range(100000L).select(
      xxhash64(col("id")).as("h"), (col("id") % 100L).as("y"),
      col("id").as("payload"))
    DataSkipping.writeZOrdered(df, dir, Seq("h", "y"), nFiles = 16)
    // a narrow band of the hash space (top ~3%)
    val lo = Long.MaxValue / 32L * 30L
    val (got, info) = DataSkipping.prunedRead(spark, dir,
      Seq(ColRange("h", lo, Long.MaxValue)))
    val exp = df.filter(col("h") >= lo)
      .select("payload").collect().map(_.getLong(0)).toSet
    assert(got.select("payload").collect().map(_.getLong(0)).toSet == exp)
    assert(exp.nonEmpty)
    assert(info.filesRead < info.filesTotal,
      s"full-range keys defeated skipping: $info")
  }

  test("footerMax: exact for integral columns, empty-determined for all-null, fallback-None otherwise") {
    val dir = tmp() + "/fm"
    spark.range(10000L).select(
      col("id").as("t"), (col("id") % 100L).cast("int").as("i"),
      when(lit(true), lit(null)).cast("long").as("allnull"),
      col("id").cast("string").as("s"),
      timestamp_micros(col("id")).as("ts"))
      .repartition(4).write.parquet(dir)
    assert(DataSkipping.footerMax(spark, dir, "t") == Some(Some(9999L)))
    assert(DataSkipping.footerMax(spark, dir, "i") == Some(Some(99L)))
    assert(DataSkipping.footerMax(spark, dir, "allnull") == Some(None))
    // strings: not the cast semantics footerMax promises — undeterminable
    assert(DataSkipping.footerMax(spark, dir, "s").isEmpty)
    // timestamps: footer stats are micros, cast("long") is seconds —
    // the type gate must refuse
    assert(DataSkipping.footerMax(spark, dir, "ts").isEmpty)
    // missing column
    assert(DataSkipping.footerMax(spark, dir, "nope").isEmpty)
  }

  test("an extension-less foreign data file is in the universe and read unpruned") {
    // spark.read.parquet(dir) — the full-scan baseline — reads every
    // non-hidden file regardless of extension; the prune universe must
    // match or a foreign writer's unsuffixed part file is silently DROPPED
    val dir = tmp() + "/znoext"
    val df = spark.range(1000L).select(
      (col("id") % 100L).as("x"), (col("id") % 50L).as("y"),
      col("id").as("payload"))
    DataSkipping.writeZOrdered(df, dir, Seq("x", "y"), nFiles = 4)
    val side = tmp() + "/side"
    spark.range(9000L, 9010L).select(
      (col("id") % 100L + 500L).as("x"), (col("id") % 50L).as("y"),
      col("id").as("payload")).coalesce(1).write.parquet(side)
    val part = new java.io.File(side).listFiles()
      .find(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(dir, "foreign-0000"))
    val (got, info) = DataSkipping.prunedRead(spark, dir,
      Seq(ColRange("x", 500, 599)))
    assert(got.count() == 10L,
      "extension-less sidecar-absent file was dropped from the universe")
    assert(info.filesTotal == 5 && info.filesRead == 1, s"got $info")
    // and the sidecar writer handles it too: refresh makes it prunable
    DataSkipping.writeStats(spark, dir, Seq("x", "y"))
    val (_, info2) = DataSkipping.prunedRead(spark, dir,
      Seq(ColRange("x", 0, 99)))
    assert(info2.filesRead == 4,
      s"refreshed sidecar should prune the foreign file on an off-range: $info2")
  }

  test("writeZOrdered never mutates the caller session's timestamp conf") {
    val tsKey = "spark.sql.parquet.outputTimestampType"
    val prior = spark.conf.getOption(tsKey)
    try {
      // pin the caller's session to the stats-free INT96 form; the write
      // must neither read it back differently nor flip it — yet the
      // written files must still carry INT64-micros footer stats (the
      // cloned-session override), proven by the time band pruning files
      spark.conf.set(tsKey, "INT96")
      val dir = tmp() + "/zconf"
      val base = 1704672000000000L
      val df = spark.range(20000L).select(
        (col("id") % 200L).as("k"),
        timestamp_micros(col("id") * 60000000L + lit(base)).as("ts"),
        col("id").as("payload"))
      DataSkipping.writeZOrdered(df, dir, Seq("k", "ts"), nFiles = 8)
      assert(spark.conf.get(tsKey) == "INT96",
        "writeZOrdered clobbered the shared session conf")
      val (got, info) = DataSkipping.prunedRead(spark, dir, Seq(
        ColRange("ts", base, base + 999L * 60000000L)))
      assert(got.count() == 1000L)
      assert(info.filesRead < info.filesTotal,
        s"no pruning — the micros override did not reach the write: $info")
    } finally prior match {
      case Some(v) => spark.conf.set(tsKey, v)
      case None => spark.conf.unset(tsKey)
    }
  }

  test("a sidecar over zero data files fails loudly, naming the condition") {
    val dir = tmp() + "/zgone"
    val df = spark.range(100L).select(
      (col("id") % 10L).as("x"), (col("id") % 5L).as("y"))
    DataSkipping.writeZOrdered(df, dir, Seq("x", "y"), nFiles = 2)
    new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
      .foreach(f => assert(f.delete()))
    val e = intercept[IllegalStateException] {
      DataSkipping.prunedRead(spark, dir, Seq(ColRange("x", 0, 9)))
    }
    assert(e.getMessage.contains("no data files"), e.getMessage)
  }

  test("prunedRead accepts the *.parquet glob shape (liveReadPath form) end to end") {
    // plain (never-rewritten) slices hand reads around as dir/*.parquet
    // (SliceRewrite.liveReadPath) — the sidecar, the survivor paths, and
    // the empty fallback must all resolve against the plain dir while
    // the universe honors the glob's .parquet restriction
    val dir = tmp() + "/zglob"
    val df = spark.range(2000L).select(
      (col("id") % 100L).as("x"), (col("id") % 50L).as("y"),
      col("id").as("payload"))
    DataSkipping.writeZOrdered(df, dir, Seq("x", "y"), nFiles = 8)
    val glob = s"$dir/*.parquet"
    val (got, info) = DataSkipping.prunedRead(spark, glob,
      Seq(ColRange("x", 0, 9)))
    val exp = df.filter(col("x").between(0, 9))
      .select("payload").collect().map(_.getLong(0)).toSet
    assert(got.select("payload").collect().map(_.getLong(0)).toSet == exp)
    assert(info.filesTotal == 8 && info.filesRead < 8, s"$info")
    // disjoint band through the glob shape: schema-complete empty
    val (empty, zero) = DataSkipping.prunedRead(spark, glob,
      Seq(ColRange("x", 5000, 6000)))
    assert(zero.filesRead == 0 && empty.isEmpty &&
      empty.columns.contains("payload"))
  }

  test("a file appended after writeStats is read unpruned, never dropped") {
    val dir = tmp() + "/zappend"
    val df = spark.range(1000L).select(
      (col("id") % 100L).as("x"), (col("id") % 50L).as("y"),
      col("id").as("payload"))
    DataSkipping.writeZOrdered(df, dir, Seq("x", "y"), nFiles = 4)
    // a foreign appender adds rows OUTSIDE every existing file's range
    // without refreshing the sidecar
    spark.range(5000L, 5010L).select(
      (col("id") % 100L + 200L).as("x"), (col("id") % 50L).as("y"),
      col("id").as("payload"))
      .coalesce(1).write.mode("append").parquet(dir)
    val (got, info) = DataSkipping.prunedRead(spark, dir,
      Seq(ColRange("x", 200, 299)))
    assert(got.count() == 10L,
      "sidecar-absent file was dropped instead of read unpruned")
    assert(info.filesTotal == 5 && info.filesRead == 1,
      s"expected only the appended file to survive, got $info")
  }
}
