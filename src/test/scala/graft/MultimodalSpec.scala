package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.{ImageIoDecoder, StubDecoder}

/** Real image decode on the JDK (javax.imageio): exact dimensions and
  * format for PNG/JPEG/GIF/BMP generated in-test (fully deterministic, no
  * binary fixtures), animated-GIF frame counts, audio/video/garbage
  * falling through to the stub, and a true pixel resample feeding the
  * resize operator — dimension-exact, aspect-preserving, never upscaled.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def image(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, format, bos), s"no $format writer installed")
    bos.toByteArray
  }

  private def animatedGif(frames: Int): Array[Byte] = {
    import javax.imageio.stream.MemoryCacheImageOutputStream
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until frames).foreach { i =>
      val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
      img.setRGB(i % 8, i % 8, 0xff0000)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  private val decoder = new ImageIoDecoder()

  test("PNG/JPEG/GIF/BMP decode to exact dimensions and format names") {
    val png = decoder.decode(image(64, 48, "png"))
    assert(png.width == 64 && png.height == 48 && png.format == "png" &&
      png.nFrames == 1)
    val jpg = decoder.decode(image(33, 21, "jpg"))
    assert(jpg.width == 33 && jpg.height == 21 && jpg.format == "jpeg")
    val gif = decoder.decode(image(10, 7, "gif"))
    assert(gif.width == 10 && gif.height == 7 && gif.format == "gif")
    val bmp = decoder.decode(image(5, 9, "bmp"))
    assert(bmp.width == 5 && bmp.height == 9 && bmp.format == "bmp")
  }

  test("animated GIF reports its true frame count") {
    val m = decoder.decode(animatedGif(5))
    assert(m.format == "gif" && m.nFrames == 5, s"got $m")
  }

  test("non-media payloads fall through to the stub (video seam)") {
    // a torn RIFF header: WAV magic but no parseable fmt chunk — the
    // audio layer must REFUSE it (corrupt-payload fallback), landing in
    // the stub like any unrecognized payload
    val fakeAudio = "RIFFxxxxWAVEfmt not really audio".getBytes("UTF-8")
    val viaStub = new StubDecoder().decode(fakeAudio)
    assert(decoder.decode(fakeAudio) == viaStub,
      "unrecognized payload must delegate to the fallback")
    // corrupt image: PNG magic, then garbage — recognized reader, broken
    // stream — must fall back, not throw
    val corrupt = image(16, 16, "png").take(24) ++ Array.fill[Byte](40)(7)
    assert(decoder.decode(corrupt) == new StubDecoder().decode(corrupt))
  }

  /** A real audio file rendered by the JDK itself: `frames` frames of
    * silence at `rate` Hz / `channels` ch / 16-bit PCM, written through
    * `AudioSystem.write` in the given container type.
    */
  private def audio(
      frames: Int, rate: Float, channels: Int,
      typ: javax.sound.sampled.AudioFileFormat.Type): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(rate, 16, channels, true, false)
    val pcm = new Array[Byte](frames * fmt.getFrameSize)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, typ, bos)
    bos.toByteArray
  }

  test("WAV/AIFF headers decode for real: rate, channels, duration") {
    import javax.sound.sampled.AudioFileFormat.Type
    val audioDecoder = new graft.operators.Multimodal.AudioDecoder()
    // 8000 frames at 16 kHz mono = exactly 500 ms
    val wav = audioDecoder.decode(audio(8000, 16000f, 1, Type.WAVE))
    assert(wav.format == "wav" && wav.sampleRate == 16000 &&
      wav.channels == 1 && wav.durationMs == 500L,
      s"got $wav")
    // 22050 frames at 22.05 kHz stereo = exactly 1000 ms, big-endian AIFF
    val aiff = audioDecoder.decode(audio(22050, 22050f, 2, Type.AIFF))
    assert(aiff.format == "aiff" && aiff.sampleRate == 22050 &&
      aiff.channels == 2 && aiff.durationMs == 1000L,
      s"got $aiff")
    // audio carries no pixel axes
    assert(wav.width == 0 && wav.height == 0)
    // the default decode chain (image -> audio -> stub) reaches the same
    // answer for an audio payload handed to the IMAGE decoder
    assert(decoder.decode(audio(8000, 16000f, 1, Type.WAVE)) == wav,
      "ImageIoDecoder's fallback chain must route audio to AudioDecoder")
  }

  test("a mixed image+audio+garbage column decodes through the one seam") {
    import spark.implicits._
    import javax.sound.sampled.AudioFileFormat.Type
    val rows = Seq(
      (1L, image(64, 48, "png")),
      (2L, audio(4000, 8000f, 1, Type.WAVE)),
      (3L, "definitely not media".getBytes("UTF-8")))
    val decoded = Multimodal
      .decodeMeta(rows.toDF("media_id", "content"), "media_id", "content",
        new ImageIoDecoder())
      .collect().map(r => r.id -> r).toMap
    assert(decoded(1L).width == 64 && decoded(1L).format == "png")
    assert(decoded(2L).format == "wav" && decoded(2L).sampleRate == 8000 &&
      decoded(2L).channels == 1 && decoded(2L).durationMs == 500L)
    val stub = new StubDecoder().decode(rows(2)._2)
    assert(decoded(3L).format == stub.format &&
      decoded(3L).sampleRate == 0)
  }

  test("resample: aspect-preserving fit, re-decodable output, no upscale") {
    val Some((bytes, w, h)) = decoder.resample(image(64, 48, "png"), 16, 16)
    assert((w, h) == ((16, 12)), s"aspect fit broke: ${w}x$h")
    val roundTrip = decoder.decode(bytes)
    assert(roundTrip.width == 16 && roundTrip.height == 12 &&
      roundTrip.format == "png")
    // smaller than target: returned as-is dimension-wise (never upscaled)
    val Some((_, sw, sh)) = decoder.resample(image(6, 4, "png"), 100, 100)
    assert((sw, sh) == ((6, 4)))
    // non-image: None — the resize operator's stride fallback owns it
    assert(decoder.resample("not an image".getBytes("UTF-8"), 8, 8).isEmpty)
  }

  test("a mixed media column decodes per-row through the one seam") {
    import spark.implicits._
    val rows = Seq(
      (1L, image(64, 48, "png")),
      (2L, image(20, 30, "jpg")),
      (3L, "not media at all".getBytes("UTF-8")))
    val df = rows.toDF("media_id", "content")
    val decoded = Multimodal
      .decodeMeta(df, "media_id", "content", new ImageIoDecoder())
      .collect().map(r => r.id -> r).toMap
    assert(decoded(1L).width == 64 && decoded(1L).height == 48 &&
      decoded(1L).format == "png")
    assert(decoded(2L).width == 20 && decoded(2L).height == 30 &&
      decoded(2L).format == "jpeg")
    val stub = new StubDecoder().decode(rows(2)._2)
    assert(decoded(3L).width == stub.width &&
      decoded(3L).format == stub.format)
  }

  test("the resize operator resamples images for real, strides the rest") {
    import spark.implicits._
    val df = Seq(
      (1L, image(64, 48, "png")),
      (2L, Array.tabulate[Byte](400)(_.toByte)))
      .toDF("media_id", "content")
    val out = Multimodal
      .resize(df, "media_id", "content", 16, 16, new ImageIoDecoder())
      .collect().map(r => r.id -> r).toMap
    assert(out(1L).width == 16 && out(1L).height == 12)
    assert(decoder.decode(out(1L).content).width == 16,
      "resized image must itself decode")
    // the non-image row took the stride path: byte budget respected
    assert(out(2L).content.length <= 16 * 16)
  }
}
