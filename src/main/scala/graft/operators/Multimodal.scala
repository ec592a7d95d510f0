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
}
