package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe: which repartition forms survive to the executed task
  * count for a tiny dataset under default AQE (the live-crawl seam
  * collapse investigation).
  */
object PartitionProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val ds = (1 to 400).map(i => (s"d$i", i)).toDS()
    def n(label: String, d: org.apache.spark.sql.Dataset[_]): Unit = {
      val parts = d.rdd.getNumPartitions
      val tasks = d.mapPartitions(it => Iterator(it.size))(
        org.apache.spark.sql.Encoders.scalaInt)
        .collect().count(_ > 0)
      println(s"[probe] $label: rddParts=$parts nonEmptyTasks=$tasks")
    }
    n("repartition(32, col)", ds.repartition(32, col("_1")))
    n("repartition(32)", ds.repartition(32))
    n("repartition(col)", ds.repartition(col("_1")))
    val mp = ds.repartition(32, col("_1"))
      .mapPartitions(it => it.map(_._2))
    println(s"[probe] mapPartitions after repartition(32,col): " +
      s"${mp.rdd.getNumPartitions}")
    val lc = ds.repartition(32, col("_1"))
      .mapPartitions(it => it.map(_._2)).localCheckpoint(true)
    println(s"[probe] localCheckpoint of that: ${lc.rdd.getNumPartitions}")
    // the topology's exact shape: checkpointed upstream -> window ->
    // filter -> as -> repartition(N, col) -> typed mapPartitions ->
    // localCheckpoint
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pld")).orderBy(col("x"))
    val up = ds.toDF("pld", "x").localCheckpoint(true)
    val shaped = up
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .drop("rn")
      .as[(String, Int)]
      .repartition(32, col("pld"))
      .mapPartitions(it => it.map(_._2))
      .localCheckpoint(true)
    println(s"[probe] topology shape: ${shaped.rdd.getNumPartitions}")
    // robots-gate shape: checkpointed upstream, no window in between
    val robots = up.as[(String, Int)]
      .repartition(32, col("pld"))
      .mapPartitions(it => it.map(_._2)).localCheckpoint(true)
    println(s"[probe] robots shape: ${robots.rdd.getNumPartitions}")
    // fetch-shape FIX candidate: repartition on a key DIFFERENT from the
    // window's (url-grained), so the exchange is not removed as redundant
    val fixed = up
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .drop("rn")
      .as[(String, Int)]
      .repartition(32, col("x"))
      .mapPartitions(it => it.map(_._2)).localCheckpoint(true)
    println(s"[probe] fetch-by-other-key shape: ${fixed.rdd.getNumPartitions}")
    spark.stop()
  }
}
