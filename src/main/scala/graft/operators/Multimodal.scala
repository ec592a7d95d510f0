package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling: media travel as opaque
  * `binary` columns with typed metadata alongside. IMAGES decode for real
  * ([[ImageIoDecoder]] — JDK `javax.imageio`: PNG/JPEG/GIF/BMP width,
  * height, format, frame count from stream metadata, plus a true pixel
  * resample). AUDIO headers decode for real too ([[AudioDecoder]] — JDK
  * `javax.sound.sampled`: WAV/AIFF/AU sample rate, channels, frame
  * count → duration). Only VIDEO has no JDK codec, so it falls through
  * to the deterministic [[StubDecoder]] behind the same [[MediaDecoder]]
  * seam — the Spark-side plumbing (schema, batch shape, partition
  * balancing, frame explosion) is identical either way, and a production
  * video decoder drops in without touching any plan.
  *
  * Scale notes: decode runs in `mapPartitions` so a partition amortizes
  * decoder init; media rows are salted into even partitions by byte size
  * before decode so one partition of large videos can't straggle.
  */
object Multimodal {

  final case class MediaMeta(
      width: Int, height: Int, format: String,
      durationMs: Long, nFrames: Int,
      // audio axes ([[AudioDecoder]]); 0 for stills/video-stub payloads
      sampleRate: Int = 0, channels: Int = 0)

  /** The decode seam. Implementations must be serializable (shipped to
    * executors); init-heavy decoders should be `lazy val`s inside.
    */
  trait MediaDecoder extends Serializable {
    def decode(bytes: Array[Byte]): MediaMeta

    /** True pixel resample to fit (targetWidth, targetHeight), returning
      * (encodedBytes, outWidth, outHeight) — or None when this decoder
      * cannot resample the payload (then [[Multimodal.resize]] falls back
      * to its deterministic byte-stride downsample).
      */
    def resample(bytes: Array[Byte], targetWidth: Int,
        targetHeight: Int): Option[(Array[Byte], Int, Int)] = None
  }

  /** Deterministic fake decode derived only from the bytes — the seam
    * filler for the formats this environment has no codecs for (STUB:
    * VIDEO only — images decode for real via [[ImageIoDecoder]], audio
    * headers via [[AudioDecoder]]).
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

  /** Real audio METADATA decode on the JDK's `javax.sound.sampled` — no
    * external codec needed for WAV/AIFF(-C)/AU/SND headers: sample rate,
    * channel count and frame length from the file header (no sample
    * decode), duration derived as frameLength / frameRate. Closes the
    * no-dependency half of the A/V gap (VERDICT r16 item 5); only video
    * remains stubbed. Non-audio payloads — video, garbage — delegate to
    * `fallback` (default [[StubDecoder]]), so the chain
    * `new ImageIoDecoder(new AudioDecoder())` serves a fully mixed media
    * column: image → audio → stub, first recognizer wins.
    *
    * Stateless and serializable. `resample` answers None — audio
    * downsampling is a sample-level transform this header decoder does
    * not do; [[Multimodal.resize]]'s stride fallback owns those payloads.
    */
  final class AudioDecoder(
      fallback: MediaDecoder = new StubDecoder) extends MediaDecoder {

    override def decode(bytes: Array[Byte]): MediaMeta =
      try {
        // ByteArrayInputStream supports mark/reset, which the sound API
        // requires for header sniffing; only the header is read
        val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(bytes))
        val fmt = aff.getFormat
        val frames = aff.getFrameLength
        val rate = fmt.getFrameRate
        val durationMs =
          if (frames > 0 && rate > 0)
            math.round(frames.toDouble / rate * 1000.0)
          else 0L
        val name = aff.getType.toString
          .toLowerCase(java.util.Locale.ROOT) match {
          case "wave" => "wav"
          case t => t
        }
        MediaMeta(
          width = 0, height = 0, format = name,
          durationMs = durationMs,
          nFrames = 1,
          sampleRate = math.round(fmt.getSampleRate),
          channels = math.max(0, fmt.getChannels))
      } catch {
        // not audio, or a corrupt/truncated header: the record stays a
        // row through the fallback (the Fetcher.safeFetch discipline)
        case _: javax.sound.sampled.UnsupportedAudioFileException |
             _: java.io.IOException | _: RuntimeException =>
          fallback.decode(bytes)
      }
  }

  /** Real image decode on the JDK's `javax.imageio` — no external codec
    * needed for PNG/JPEG/GIF/BMP(/WBMP): exact width/height from the
    * stream header (no pixel decode), container format name, frame count
    * (animated GIFs report their true frame total). Non-image payloads —
    * audio, video, garbage — delegate to `fallback` (default
    * [[AudioDecoder]], which itself falls through to [[StubDecoder]]),
    * so one decoder instance serves a fully mixed media column.
    *
    * Stateless and serializable; ImageIO's disk cache is disabled
    * JVM-wide (pure in-memory streams — an executor must never write
    * scratch files per record).
    */
  final class ImageIoDecoder(
      fallback: MediaDecoder = new AudioDecoder()) extends MediaDecoder {

    override def decode(bytes: Array[Byte]): MediaMeta = {
      ImageIoDecoder.withReader(bytes) { reader =>
        val w = reader.getWidth(0)
        val h = reader.getHeight(0)
        val fmt = reader.getFormatName
          .toLowerCase(java.util.Locale.ROOT) match {
          case "jpg" => "jpeg"
          case f => f
        }
        // allowSearch=true: exact frame total (scans GIF frame headers,
        // metadata-only; stills answer 1 immediately)
        val frames =
          try math.max(1, reader.getNumImages(true))
          catch { case _: Exception => 1 }
        MediaMeta(w, h, fmt, durationMs = 0L, nFrames = frames)
      }.getOrElse(fallback.decode(bytes))
    }

    /** Aspect-preserving fit inside (targetWidth, targetHeight), bilinear,
      * re-encoded as PNG (lossless, always-available writer). None for
      * non-image payloads — the caller's stride fallback owns those.
      */
    override def resample(bytes: Array[Byte], targetWidth: Int,
        targetHeight: Int): Option[(Array[Byte], Int, Int)] = {
      import java.awt.image.BufferedImage
      require(targetWidth > 0 && targetHeight > 0,
        s"resample target must be positive, got ${targetWidth}x$targetHeight")
      ImageIoDecoder.withReader(bytes) { reader =>
        val src = reader.read(0)
        val scale = math.min(
          math.min(targetWidth.toDouble / src.getWidth,
            targetHeight.toDouble / src.getHeight), 1.0)
        val ow = math.max(1, math.round(src.getWidth * scale).toInt)
        val oh = math.max(1, math.round(src.getHeight * scale).toInt)
        val out = new BufferedImage(ow, oh, BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(src, 0, 0, ow, oh, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        (bos.toByteArray, ow, oh)
      }
    }
  }

  object ImageIoDecoder {
    // in-memory streams only: never a temp-file cache on an executor
    javax.imageio.ImageIO.setUseCache(false)

    /** Run `f` with a positioned ImageReader for `bytes`, or None when no
      * installed reader recognizes the payload or it is corrupt — the
      * caller's fallback path owns those.
      */
    private def withReader[A](bytes: Array[Byte])(
        f: javax.imageio.ImageReader => A): Option[A] = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, false, true)
            Some(f(reader))
          } catch {
            // recognized magic bytes but a corrupt stream: fall back, the
            // record stays a row (same discipline as Fetcher.safeFetch)
            case _: java.io.IOException | _: RuntimeException => None
          } finally reader.dispose()
        }
      } finally iis.close()
    }
  }

  final case class MediaRecord(id: Long, content: Array[Byte])
  final case class DecodedRecord(
      id: Long, nBytes: Long, width: Int, height: Int, format: String,
      durationMs: Long, nFrames: Int, sampleRate: Int, channels: Int)
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
            m.format, m.durationMs, m.nFrames, m.sampleRate, m.channels)
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

  /** Resize/downsample the media payload: the decoder's own
    * [[MediaDecoder.resample]] when it can (a REAL pixel resample for
    * images under [[ImageIoDecoder]]), else the deterministic byte-stride
    * downsample (STUB: the stand-in for formats without a codec here —
    * audio/video). The Spark-side contract is identical either way:
    * binary in, smaller binary + new dimensions out, partition-batched so
    * a resampler amortizes its init, output size bounded by
    * `targetWidth x targetHeight` regardless of input skew.
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
          decoder.resample(r.content, targetWidth, targetHeight) match {
            case Some((out, ow, oh)) => ResizedRecord(r.id, ow, oh, out)
            case None =>
              val m = decoder.decode(r.content)
              val budget = math.max(1, targetWidth * targetHeight)
              // ceil-divide so the output never exceeds the byte budget
              val stride =
                math.max(1, (r.content.length + budget - 1) / budget)
              val out =
                new Array[Byte]((r.content.length + stride - 1) / stride)
              var i = 0
              while (i < out.length) { out(i) = r.content(i * stride); i += 1 }
              ResizedRecord(r.id,
                math.min(m.width, targetWidth),
                math.min(m.height, targetHeight), out)
          }
        }
      }
  }
}
