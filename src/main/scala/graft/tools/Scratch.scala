package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/timing inspection main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def planOf(name: String): Unit = {
      println(s"===== $name =====")
      val plan = graft.SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      println(plan.linesIterator.take(40).mkString("\n"))
    }
    planOf("q09_join_multi_revenue")
    planOf("q01_filter_project")
    spark.stop()
  }
}
