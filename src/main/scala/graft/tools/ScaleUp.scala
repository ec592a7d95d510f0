package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derive a 10× bench dataset from the largest driver-generated SF — the
  * sf1 scale probe (PERF_NOTES §"sf1 scale probe"). Straight duplication
  * would be pathological for the dedup/join suite (every row with 9 exact
  * clones ⇒ quadratic pair blow-ups that say nothing about real 10× data),
  * so each copy remaps its keys into a disjoint range and mutates text /
  * embeddings deterministically:
  *   - fact/dim keys: += copy × 100M (join fan-out stays 1:1)
  *   - documents.text: per-copy vowel rotation via translate() — token
  *     count, lengths, and whitespace shape survive; shingles don't collide
  *     across copies
  *   - embeddings: deterministic per-(copy, dim) jitter so ANN buckets
  *     spread instead of producing 10-way cosine ties
  * region/nation stay single-copy (dimension tables; nationkey references
  * remain valid). Usage: ScaleUp [srcDir] [dstDir] [copies].
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/root/repo/target/bench-sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val K = 100000000L

    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(name: String): DataFrame =
      // events: TIMESTAMP(NANOS) needs the legacy conf + µs rebuild; the
      // derived copy is then written as standard TIMESTAMP(MICROS), which
      // both Spark (Tables.events) and the DuckDB oracle read natively
      if (name == "events") graft.queries.Tables.events(spark, src)
      else spark.read.parquet(s"$src/$name.parquet")
    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")

    def replicate(name: String, keyCols: Seq[String])(
        mutate: (DataFrame, Int) => DataFrame = (d, _) => d): Unit = {
      val base = read(name)
      val out = (0 until copies).map { i =>
        val shifted = keyCols.foldLeft(base)(
          (d, k) => d.withColumn(k, col(k) + lit(i * K)))
        mutate(shifted, i)
      }.reduce(_ unionByName _)
      write(out, name)
      println(s"[scale-up] $name x$copies -> ${spark.read.parquet(s"$dst/$name.parquet").count()} rows")
    }

    // dims referenced by unshifted int32 keys: copy through once
    write(read("region"), "region")
    write(read("nation"), "nation")

    replicate("customer", Seq("c_custkey"))()
    replicate("supplier", Seq("s_suppkey"))()
    replicate("part", Seq("p_partkey"))()
    replicate("orders", Seq("o_orderkey", "o_custkey"))()
    replicate("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))()
    replicate("events", Seq("event_id", "user_id"))()

    // vowel rotation per copy: copy 0 is the original; each other copy
    // rewrites most words, so cross-copy shingle/minhash/simhash overlap
    // vanishes like it would in genuinely larger data.
    // THREE independent rotations — vowels by i mod 5, one consonant
    // group by i/5 mod 5, a second by i/25 mod 4 — give 100 pairwise-
    // distinct transforms, so even the sf10 derivation (copies=100) never
    // reintroduces jaccard-1.0 clone pairs across copies
    val vowels = "aeiou"
    val cons = "rstln"
    val cons2 = "dmcp"
    require(copies <= 100,
      s"text mutation supports 100 distinct copies, asked for $copies")
    replicate("documents", Seq("doc_id")) { (d, i) =>
      if (i == 0) d
      else {
        val vrot = (vowels + vowels).substring(i % 5, i % 5 + 5)
        val crot = (cons + cons).substring(i / 5 % 5, i / 5 % 5 + 5)
        val c2rot = (cons2 + cons2).substring(i / 25 % 4, i / 25 % 4 + 4)
        d.withColumn("text",
          translate(col("text"), vowels + cons + cons2, vrot + crot + c2rot))
      }
    }

    // deterministic per-(copy, dim) jitter keeps vectors distinct without
    // changing their scale; labels untouched. The (1 + i/100) magnitude
    // factor makes every copy's jitter UNIQUE even where the mod-7
    // residue pattern repeats (copies 7 apart) — no exact-duplicate
    // vectors at any supported copy count
    replicate("embeddings", Seq("vec_id")) { (d, i) =>
      if (i == 0) d
      else {
        // whole jitter cast to float in ONE place: mixing int/float
        // arithmetic inside the lambda promotes to double, silently
        // turning the column into array<double> — which the ANN store's
        // on-disk float contract rejects
        val mag = 1.0 + i / 100.0
        d.withColumn("embedding",
          expr(s"transform(embedding, (x, j) -> x + cast(" +
            s"((j * 31 + $i * 17) % 7 - 3) * 0.01 * $mag as float))"))
      }
    }

    spark.stop()
  }
}
