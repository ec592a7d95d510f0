package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition of the q103 composite (ANN store build → append →
  * exhaustive gate query) — which stage owns the sf1 wall, and how the
  * query's size-switch branches behave warm vs cold.
  */
object AnnStageProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/repo/target/bench-sf1")
    import graft.operators.AnnIndexStore
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).localCheckpoint(true)
    println(s"[probe] vectors: ${e.count()}")
    val root = java.nio.file.Files.createTempDirectory("graft-annprobe")
      .toString
    time("build (%3==1)") {
      AnnIndexStore.build(spark, root, e.filter(col("vec_id") % 3 === 1),
        "vec_id", "embedding", dim = 64, numCentroids = 8, lloydRounds = 1)
    }
    time("append (%3==2)") {
      AnnIndexStore.append(spark, root,
        e.filter(col("vec_id") % 3 === 2), "vec_id", "embedding", 1L)
    }
    (1 to 2).foreach { i =>
      time(s"query k=1 nprobe=8 (run $i)") {
        AnnIndexStore.query(spark, root, e.filter(col("vec_id") % 3 === 0),
          "vec_id", "embedding", k = 1, nprobe = 8).count()
      }
    }
    spark.stop()
  }
}
