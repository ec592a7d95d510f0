package graft.tools
import org.apache.spark.sql.SparkSession
/** Ad-hoc SQL expression probe: prints each arg's evaluation (one row). */
object SqlProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach {
      case q if q.startsWith("plan:") =>
        // full query after the prefix: print its executed physical plan
        val df = spark.sql(q.stripPrefix("plan:"))
        df.collect()
        println(s"== plan for ${q.stripPrefix("plan:")} ==")
        println(df.queryExecution.executedPlan.toString)
      case e =>
        println(s"$e => " + spark.sql(s"SELECT $e").collect().head.get(0))
    }
    spark.stop()
  }
}
