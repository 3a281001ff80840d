package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq((1L, "hello world"), (2L, "payload-two"))
    .toDF("doc_id", "text")

  test("asMedia produces (media_id, binary content) schema") {
    val m = Multimodal.asMedia(docs, "doc_id", "text")
    assert(m.schema.fieldNames.toSeq == Seq("media_id", "content"))
    assert(m.schema("content").dataType.typeName == "binary")
    assert(m.count() == 2)
  }

  test("withMeta computes size/md5/first-byte without decoding") {
    val out = Multimodal.withMeta(Multimodal.asMedia(docs, "doc_id", "text"))
      .filter($"media_id" === 1)
      .select("n_bytes", "content_md5", "first_byte")
      .as[(Int, String, Int)].head()
    assert(out._1 == 11)
    assert(out._2 == "5eb63bbbe01eeed093cb22bb8f5acdc3") // md5("hello world")
    assert(out._3 == 'h'.toInt)
  }

  // real container payloads (even ids → BMP, odd ids → WAV)
  private lazy val media =
    Seq(2L -> "hello world", 3L -> "payload-two", 4L -> "abc", 7L -> "x")
      .map { case (id, t) => (id, Multimodal.MediaGen.payload(id, t)) }
      .toDF("media_id", "content")

  test("HeaderCodec parses BMP dimensions from real bytes") {
    val bytes = Multimodal.MediaGen.payload(10L, "hello world") // w=6, h=12
    val m = Multimodal.HeaderCodec.decode(10L, bytes)
    assert(m.format == "bmp")
    assert(m.width == 1 + (5 % 16) && m.height == 1 + ("hello world".length % 16))
    assert(m.n_frames == 1 && m.sample_rate == 0 && m.channels == 0)
  }

  test("HeaderCodec parses WAV fmt/data from real bytes") {
    val text = "payload-two" // len 11: rate idx 2 → 44100, frames 8+11
    val m = Multimodal.HeaderCodec.decode(3L, Multimodal.MediaGen.payload(3L, text))
    assert(m.format == "wav")
    assert(m.sample_rate == 44100)
    assert(m.channels == 1 + ((3L / 2) % 2).toInt)
    assert(m.n_frames == 8 + (text.length % 64))
    assert(m.width == 0 && m.height == 0)
  }

  test("HeaderCodec walks non-canonical WAV chunk layouts") {
    // insert a LIST chunk between 'WAVE' and 'fmt ' — a real reader must
    // skip it, not assume the canonical 44-byte header
    val canonical = Multimodal.MediaGen.payload(5L, "abc")
    val list = Array[Byte]('L', 'I', 'S', 'T', 6, 0, 0, 0, 'I', 'N', 'F', 'O', 0, 0)
    val padded = canonical.take(12) ++ list ++ canonical.drop(12)
    val m = Multimodal.HeaderCodec.decode(5L, padded)
    assert(m == Multimodal.HeaderCodec.decode(5L, canonical).copy(media_id = 5L))
  }

  test("HeaderCodec rejects unknown containers") {
    intercept[IllegalArgumentException] {
      Multimodal.HeaderCodec.decode(1L, "not a container".getBytes)
    }
  }

  test("HeaderCodec throws on corrupt negative chunk sizes (no hang)") {
    // RIFF/WAVE preamble + a chunk whose le32 size is -8: a naive walker
    // advances off by 8 + (-8) = 0 and spins forever
    val evil = "RIFF".getBytes ++ Array[Byte](36, 0, 0, 0) ++
      "WAVE".getBytes ++ "junk".getBytes ++
      Array[Byte](-8, -1, -1, -1) ++ Array.fill[Byte](16)(0)
    intercept[IllegalArgumentException] {
      Multimodal.HeaderCodec.decode(9L, evil)
    }
    // near-Int.MaxValue size: must throw the codec's own error, not
    // overflow the offset into an uncontrolled index exception
    val huge = "RIFF".getBytes ++ Array[Byte](36, 0, 0, 0) ++
      "WAVE".getBytes ++ "junk".getBytes ++
      Array[Byte](-16, -1, -1, 127) ++ Array.fill[Byte](16)(0)
    intercept[IllegalArgumentException] {
      Multimodal.HeaderCodec.decode(9L, huge)
    }
  }

  test("HeaderCodec rejects sub-byte WAV sample widths with its own diagnostic") {
    // bits-per-sample in 1..7 passes a naive bits>0 check but makes
    // bits/8 zero — the frame count division must not surface as an
    // ArithmeticException
    val bb = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(52).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16)
      .putShort(1).putShort(1)   // pcm, mono
      .putInt(8000).putInt(4000) // rate, byte rate
      .putShort(1).putShort(4)   // block align, FOUR bits per sample
    bb.put("data".getBytes).putInt(8).put(Array.fill[Byte](8)(0))
    val bytes = java.util.Arrays.copyOf(bb.array, bb.position())
    val e = intercept[IllegalArgumentException] {
      Multimodal.HeaderCodec.decode(5L, bytes)
    }
    assert(e.getMessage.contains("bits=4"))
  }

  test("mediaTable artifact round-trips through parquet and decodes") {
    val base = java.nio.file.Files.createTempDirectory("graft-media").toString
    val table = Multimodal.mediaTable(docs, "doc_id", "text", base)
    assert(table.schema("content").dataType.typeName == "binary")
    val decoded = Multimodal.decodeBatched(table).collect().sortBy(_.media_id)
    assert(decoded.map(_.media_id).toSeq == Seq(1L, 2L))
    assert(decoded.map(_.format).toSeq == Seq("wav", "bmp"))
    // second call reads the artifact, same contents
    val again = Multimodal.mediaTable(docs, "doc_id", "text", base)
    assert(again.count() == 2)
  }

  test("sampleFrames drops zero-frame media instead of crashing") {
    // a WAV with an empty data chunk is valid and decodes to n_frames=0;
    // sequence(0, -1, stride) would throw without the explicit guard
    val d = Seq(
      Multimodal.DecodedMeta(1L, "wav", 0, 0, 0, 8000, 1),
      Multimodal.DecodedMeta(2L, "bmp", 4, 4, 1, 0, 0)).toDS()
    val out = Multimodal.sampleFrames(d, stride = 2)
      .select("media_id").as[Long].collect().toSeq
    assert(out == Seq(2L))
  }

  test("resized clamps image rows to bounding box, skips audio") {
    val out = Multimodal.resized(Multimodal.decodeBatched(media), maxSide = 8)
      .as[(Long, Int, Int)].collect()
    assert(out.map(_._1).sorted.toSeq == Seq(2L, 4L)) // BMP rows only
    out.foreach { case (_, w, h) =>
      assert(w <= 8 && h <= 8 && w > 0 && h > 0)
    }
  }

  test("featureExtract emits deterministic unit-norm float embeddings") {
    val media = Multimodal.asMedia(docs, "doc_id", "text")
    val e1 = Multimodal.featureExtract(media, 16)
      .as[(Long, Seq[Float])].collect().toMap
    val e2 = Multimodal.featureExtract(media, 16)
      .as[(Long, Seq[Float])].collect().toMap
    assert(e1 == e2)
    e1.values.foreach { v =>
      assert(v.length == 16)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-3)
    }
    // feeds the ANN path end-to-end
    val emb = Multimodal.featureExtract(media, 16)
      .withColumn("label", lit(0))
    val q = e1(1L).map(_.toDouble)
    val top = Similarity.bruteForceTopK(emb, "media_id", "embedding", q, 1)
      .as[(Long, Double)].collect()
    assert(top.head._1 == 1L && top.head._2 == 1.0)
  }

  test("decodeBatched is deterministic per payload; sampleFrames explodes") {
    val d1 = Multimodal.decodeBatched(media).collect().sortBy(_.media_id)
    val d2 = Multimodal.decodeBatched(media).collect().sortBy(_.media_id)
    assert(d1.toSeq == d2.toSeq)
    assert(d1.forall(m => m.n_frames >= 1))
    val frames = Multimodal.sampleFrames(Multimodal.decodeBatched(media), stride = 2)
    val perId = frames.groupBy("media_id").count().as[(Long, Long)].collect().toMap
    d1.foreach { m =>
      assert(perId(m.media_id) == (m.n_frames + 1) / 2)
    }
  }

  test("audioFrameEnergy: signed windows match hand computation, BMP rows drop") {
    import spark.implicits._
    // minimal mono WAV: 5 frames of 16-bit PCM with known values,
    // including a negative sample (0x8000 = -32768) and zero
    def wav(samples: Seq[Int]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(44 + 2 * samples.size)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(36 + 2 * samples.size)
        .put("WAVE".getBytes)
        .put("fmt ".getBytes).putInt(16)
        .putShort(1).putShort(1) // PCM, mono
        .putInt(8000).putInt(16000).putShort(2).putShort(16)
        .put("data".getBytes).putInt(2 * samples.size)
      samples.foreach(s => bb.putShort(s.toShort))
      bb.array()
    }
    val media = Seq(
      (1L, wav(Seq(100, -200, 300, -32768, 0))),
      (2L, Multimodal.MediaGen.payload(2L, "bmp payload"))) // even id → BMP
      .toDF("media_id", "content")
    val got = Multimodal.audioFrameEnergy(media, windowFrames = 2)
      .orderBy("media_id", "win")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, 2L, 300L),     // |100| + |-200|
      (1L, 1L, 2L, 33068L),   // |300| + 32768
      (1L, 2L, 1L, 0L)))      // partial tail window
  }

  test("imageChannelStats: pixel walk skips row padding, WAV rows drop") {
    import spark.implicits._
    // 1x2 24-bit BMP: stride 4 -> one pad byte per row that must NOT
    // contribute. Rows bottom-up: (B,G,R, pad) per row.
    val w = 1; val h = 2; val stride = 4
    val bb = java.nio.ByteBuffer.allocate(54 + stride * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
      .putInt(54 + stride * h).putInt(0).putInt(54)
      .putInt(40).putInt(w).putInt(h)
      .putShort(1).putShort(24)
      .putInt(0).putInt(stride * h)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    bb.put(Array[Byte](10, 20, 30, 99.toByte)) // row 0 + poison pad
    bb.put(Array[Byte](1, 2, 3, 77.toByte))    // row 1 + poison pad
    val media = Seq(
      (4L, bb.array()),
      (5L, Multimodal.MediaGen.payload(5L, "wav payload"))) // odd id → WAV
      .toDF("media_id", "content")
    val got = Multimodal.imageChannelStats(media)
      .orderBy("media_id", "channel")
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(got == Seq(
      (4L, 0, 2L, 11L),  // B: 10 + 1
      (4L, 1, 2L, 22L),  // G: 20 + 2
      (4L, 2, 2L, 33L))) // R: 30 + 3
  }

  test("imageDHash: gradient rows hash by hand; duplicates collide; WAV drops") {
    import spark.implicits._
    // 2x1 BMP, pixel 0 dark (lum 6), pixel 1 bright (lum 60):
    // grid cols 0..8 sample px = gx*2/9 → 0 for gx≤4, 1 for gx≥5; so
    // the only rising adjacency is gx=4→5, i.e. bit gx=4 of every row:
    // hash = Σ_y 2^(8y+4)
    val w = 2; val h = 1; val stride = (3 * w + 3) & ~3
    val bb = java.nio.ByteBuffer.allocate(54 + stride * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
      .putInt(54 + stride * h).putInt(0).putInt(54)
      .putInt(40).putInt(w).putInt(h)
      .putShort(1).putShort(24)
      .putInt(0).putInt(stride * h)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    bb.put(Array[Byte](1, 2, 3, 10, 20, 30)) // dark px, bright px
    val expected = (0 until 8).map(y => 1L << (8 * y + 4)).sum
    val media = Seq(
      (4L, bb.array()),
      (6L, bb.array().clone()), // exact duplicate image → same hash
      (5L, Multimodal.MediaGen.payload(5L, "wav payload")))
      .toDF("media_id", "content")
    val got = Multimodal.imageDHash(media)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((4L, expected), (6L, expected)))
  }

  test("hostile BMP headers drop instead of crashing the task") {
    import spark.implicits._
    // Headers a crawled corpus can contain: stride*h wrapping Int
    // (w=1, h=MaxValue), a data offset inside the header, and an
    // offset past the buffer. All must take the Iterator.empty path.
    def bmp(w: Int, h: Int, off: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(64)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put('B'.toByte).put('M'.toByte)
        .putInt(64).putInt(0).putInt(off)
        .putInt(40).putInt(w).putInt(h)
        .putShort(1).putShort(24)
        .putInt(0).putInt(0)
        .putInt(2835).putInt(2835).putInt(0).putInt(0)
      bb.array()
    }
    val media = Seq(
      (0L, bmp(1, Int.MaxValue, 54)), // stride*h wraps negative in Int
      (2L, bmp(1, 1, 12)),            // offset inside the header
      (4L, bmp(1, 1, 1000)))          // offset past the buffer
      .toDF("media_id", "content")
    assert(Multimodal.imageDHash(media).count() == 0L)
    assert(Multimodal.imageChannelStats(media).count() == 0L)
  }
}
