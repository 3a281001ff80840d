package graft.operators

import graft.SparkSpec
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import org.apache.spark.sql.functions._

/** The javax.imageio production decode path: real-codec metadata,
  * dHash bit-identity with the oracle-replayable BMP byte walk, and
  * cross-codec hash stability (lossless exact, lossy within a small
  * Hamming budget). */
class ImageIoCodecSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic blocky test image: 36×24 so the 9×8 dHash grid
    * samples block origins exactly; adjacent blocks always differ by
    * ≥ 75 luminance so high-quality JPEG noise cannot flip compares. */
  private def blockyImage(): BufferedImage = {
    val img = new BufferedImage(36, 24, BufferedImage.TYPE_3BYTE_BGR)
    for (x <- 0 until 36; y <- 0 until 24) {
      val cx = x / 4; val cy = y / 3
      val v = 30 + ((cx * 3 + cy * 5) % 8) * 25
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def encode(img: BufferedImage, format: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    if (format == "jpeg") {
      val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(0.9f)
      val ios = ImageIO.createImageOutputStream(out)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
      writer.dispose(); ios.close()
    } else ImageIO.write(img, format, out)
    out.toByteArray
  }

  test("decodeImages: real PNG/JPEG/BMP metadata; non-images drop") {
    val img = blockyImage()
    val media = Seq(
      (1L, encode(img, "png")),
      (2L, encode(img, "jpeg")),
      (3L, encode(img, "bmp")),
      (4L, Multimodal.MediaGen.payload(5L, "wav payload")), // WAV: drop
      (5L, Array[Byte](1, 2, 3)))                           // junk: drop
      .toDF("media_id", "content")
    val got = Multimodal.decodeImages(media)
      .collect().map(m => m.media_id -> m).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got.values.forall(m => m.width == 36 && m.height == 24))
    assert(got(1L).format == "png" && got(3L).format == "bmp")
    assert(got(2L).format.startsWith("jp")) // "jpeg" (JRE-dependent case)
  }

  test("BMP: decoded-path dHash is BIT-IDENTICAL to the byte walk") {
    // MediaGen emits 24-bit bottom-up BMPs across dims 1..16 — the
    // decoded path must reproduce the oracle-replayable hash exactly
    val media = Seq(0L, 2L, 4L, 6L, 8L, 10L)
      .map(id => (id, Multimodal.MediaGen.payload(id, "x" * (id.toInt + 3))))
      .toDF("media_id", "content")
    val byteWalk = Multimodal.imageDHash(media)
      .as[(Long, Long)].collect().toMap
    val decoded = Multimodal.imageDHashDecoded(media)
      .as[(Long, Long)].collect().toMap
    assert(byteWalk.nonEmpty && decoded == byteWalk)
  }

  test("cross-codec stability: PNG exact, JPEG within Hamming budget") {
    val img = blockyImage()
    val media = Seq(
      (1L, encode(img, "bmp")),
      (2L, encode(img, "png")),
      (3L, encode(img, "jpeg")))
      .toDF("media_id", "content")
    val h = Multimodal.imageDHashDecoded(media)
      .as[(Long, Long)].collect().toMap
    assert(h(2L) == h(1L), "lossless re-encode must hash identically")
    val d = java.lang.Long.bitCount(h(3L) ^ h(1L))
    assert(d <= 10, s"q=0.9 JPEG drifted $d Hamming bits")
    // both sources produce the schema the chunk-blocked Hamming join
    // machinery consumes — interchangeable by construction
    assert(Multimodal.imageDHashDecoded(media).schema ==
      Multimodal.imageDHash(media).schema)
  }
}
