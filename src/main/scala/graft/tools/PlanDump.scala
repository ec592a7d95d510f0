package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named SparkEntry queries to files —
  * the before/after plan artifacts for optimization rounds
  * (`plans/r<N>/<query>_<tag>.txt`). Composite store-lifecycle gates
  * return a localCheckpoint of their final read, so their dumped plan is
  * the final view read; their internal evidence is the StageTimer rows
  * in the bench artifact.
  *
  * Args: <outDir> <tag> <queryName>[,<queryName>...]
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default 4).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(outDir, tag, namesCsv) = args
    val names = namesCsv.split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val w = new java.io.PrintWriter(
        new java.io.File(outDir, s"${name}_$tag.txt"), "UTF-8")
      try w.println(plan) finally w.close()
      System.err.println(s"plan-dump $name -> $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
