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

  test("non-image payloads fall through to the stub (audio/video seam)") {
    val fakeAudio = "RIFFxxxxWAVEfmt not really audio".getBytes("UTF-8")
    val viaStub = new StubDecoder().decode(fakeAudio)
    assert(decoder.decode(fakeAudio) == viaStub,
      "unrecognized payload must delegate to the fallback")
    // corrupt image: PNG magic, then garbage — recognized reader, broken
    // stream — must fall back, not throw
    val corrupt = image(16, 16, "png").take(24) ++ Array.fill[Byte](40)(7)
    assert(decoder.decode(corrupt) == new StubDecoder().decode(corrupt))
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
