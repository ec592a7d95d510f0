package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/timing inspection main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[time] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    args.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      time(s"$name count")(df.count())
      println(s"===== $name plan =====")
      println(df.queryExecution.executedPlan.toString
        .linesIterator.take(40).mkString("\n"))
    }
    spark.stop()
  }
}
