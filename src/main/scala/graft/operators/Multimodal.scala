package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling: media travel as opaque
  * `binary` columns with typed metadata alongside. Real decode libraries
  * are not available in this environment, so the decode step is a
  * deterministic [[StubDecoder]] behind the [[MediaDecoder]] seam — the
  * Spark-side plumbing (schema, batch shape, partition balancing, frame
  * explosion) is real and tested, and a production decoder drops in
  * without touching any plan.
  *
  * Scale notes: decode runs in `mapPartitions` so a partition amortizes
  * decoder init; media rows are salted into even partitions by byte size
  * before decode so one partition of large videos can't straggle.
  */
object Multimodal {

  final case class MediaMeta(
      width: Int, height: Int, format: String,
      durationMs: Long, nFrames: Int)

  /** The decode seam. Implementations must be serializable (shipped to
    * executors); init-heavy decoders should be `lazy val`s inside.
    */
  trait MediaDecoder extends Serializable {
    def decode(bytes: Array[Byte]): MediaMeta
  }

  /** Deterministic fake decode derived only from the bytes — stands in for
    * an image/audio library (STUB: replace with a real decoder).
    */
  final class StubDecoder extends MediaDecoder {
    override def decode(bytes: Array[Byte]): MediaMeta = {
      val n = bytes.length
      val head = if (n > 0) bytes(0) & 0xff else 0
      MediaMeta(
        width = n % 640,
        height = n % 480,
        format = if (head % 2 == 0) "png" else "jpeg",
        durationMs = n.toLong * 10,
        nFrames = 1 + n % 16)
    }
  }

  final case class MediaRecord(id: Long, content: Array[Byte])
  final case class DecodedRecord(
      id: Long, nBytes: Long, width: Int, height: Int, format: String,
      durationMs: Long, nFrames: Int)
  final case class FrameRecord(id: Long, frameIdx: Int, frameKey: String)

  /** Decode a binary column into typed metadata, one decoder instance per
    * partition. Input columns: (idCol: long, binCol: binary).
    */
  def decodeMeta(
      df: DataFrame, idCol: String, binCol: String,
      decoder: MediaDecoder): Dataset[DecodedRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(binCol).as("content"))
      .as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          val m = decoder.decode(r.content)
          DecodedRecord(r.id, r.content.length.toLong, m.width, m.height,
            m.format, m.durationMs, m.nFrames)
        }
      }
  }

  /** Spread media rows evenly by byte size before decode: salt = hash of
    * (id, size) so the shuffle is uniform even when sizes are skewed.
    */
  def balanceBySize(df: DataFrame, idCol: String, binCol: String,
      partitions: Int): DataFrame =
    df.repartition(partitions,
      hash(col(idCol), length(col(binCol))))

  /** Deterministic frame sampling: every k-th frame index up to the decoded
    * frame count, exploded to one row per sampled frame.
    */
  def sampleFrames(
      decoded: Dataset[DecodedRecord], every: Int): Dataset[FrameRecord] = {
    val spark = decoded.sparkSession
    import spark.implicits._
    decoded.flatMap { r =>
      (0 until r.nFrames by every).map { f =>
        FrameRecord(r.id, f, s"${r.id}#$f")
      }
    }
  }

  final case class FeatureRecord(id: Long, features: Array[Float])
  final case class ResizedRecord(
      id: Long, width: Int, height: Int, content: Array[Byte])

  /** Feature extraction over the binary column: per-media fixed-width
    * float vector, one extractor pass per partition. The stub computes a
    * normalized 16-bin byte histogram (STUB: a production extractor — CLIP
    * embedding, mel spectrogram stats — drops into the same signature);
    * the output column is the same `Array[Float]` shape the similarity
    * operators consume, so decoded media feed straight into cosine / LSH /
    * IVF search (q27/q28/q33/q34).
    */
  def extractFeatures(
      df: DataFrame, idCol: String, binCol: String,
      dim: Int = 16): Dataset[FeatureRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(binCol).as("content"))
      .as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          val hist = new Array[Float](dim)
          r.content.foreach(b => hist((b & 0xff) % dim) += 1f)
          val n = math.max(1, r.content.length).toFloat
          FeatureRecord(r.id, hist.map(_ / n))
        }
      }
  }

  /** Media near-duplicate pairs: [[extractFeatures]] vectors through the
    * embedding cosine-dedup path ([[Similarity.cosineDedupPairs]] —
    * hyperplane-LSH buckets, exact cosine gate, never a cross product).
    * With the stub histogram extractor this catches byte-level
    * re-encodes/crops of the same payload; a real extractor (CLIP, mel
    * stats) drops into the same composition unchanged — this is the
    * image/audio twin of the text MinHash dedup family, one operator
    * call away from the decode seam.
    */
  def mediaNearDupPairs(
      df: DataFrame, idCol: String, binCol: String,
      threshold: Double = 0.95, dim: Int = 16,
      numPlanes: Int = 8): DataFrame =
    Similarity.cosineDedupPairs(
      extractFeatures(df, idCol, binCol, dim).toDF(),
      "id", "features", dim, numPlanes, threshold)

  /** Resize/downsample the media payload (STUB: deterministic byte-stride
    * stand-in for a pixel resampler). The Spark-side contract is the real
    * part: binary in, smaller binary + new dimensions out, partition-
    * batched so a real resampler amortizes its init, output size bounded
    * by `targetWidth x targetHeight` regardless of input skew.
    */
  def resize(
      df: DataFrame, idCol: String, binCol: String,
      targetWidth: Int, targetHeight: Int,
      decoder: MediaDecoder): Dataset[ResizedRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(binCol).as("content"))
      .as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          val m = decoder.decode(r.content)
          val budget = math.max(1, targetWidth * targetHeight)
          // ceil-divide so the output never exceeds the byte budget
          val stride = math.max(1, (r.content.length + budget - 1) / budget)
          val out = new Array[Byte]((r.content.length + stride - 1) / stride)
          var i = 0
          while (i < out.length) { out(i) = r.content(i * stride); i += 1 }
          ResizedRecord(r.id,
            math.min(m.width, targetWidth), math.min(m.height, targetHeight),
            out)
        }
      }
  }
}
