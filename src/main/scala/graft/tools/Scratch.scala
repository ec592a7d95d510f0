package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc plan/timing inspection main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    time("warmup")(docs.count())
    val shingleUdf = udf { (text: String) =>
      val toks = text.trim.split("\\s+")
      if (toks.length < 3) Array.empty[String]
      else toks.sliding(3).map(_.mkString(" ")).toArray.distinct
    }
    val sh = docs
      .select(col("doc_id"), shingleUdf(col("text")).as("sh"))
      .select(col("doc_id"), size(col("sh")).cast("long").as("n"),
        explode(col("sh")).as("s"))
    time("udf_sh_count")(sh.count())
    time("udf_sh_again")(sh.count())
    val pairs = sh.as("a").join(sh.as("b"),
      col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", col("inter") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= 0.5)
    time("udf_q19_full")(pairs.count())
    spark.stop()
  }
}
