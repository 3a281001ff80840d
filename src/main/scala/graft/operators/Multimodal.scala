package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SaveMode}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (BASELINE north star): image/audio/video
  * payloads ride as opaque `binary` columns with typed metadata, processed
  * in partition-sized batches.
  *
  * The codec is REAL: [[HeaderCodec]] sniffs the container magic and
  * parses BMP (BITMAPINFOHEADER) and WAV (RIFF chunk walk) headers into
  * typed metadata — pure byte arithmetic, so the DuckDB oracle can replay
  * the decode over the same bytes (hex-string arithmetic in SQL). The
  * batch shape is what a heavyweight codec (JPEG/H.264 via FFI) would
  * use: one decoder context per task, rows handed over in bounded batches
  * ([[BatchOps.mapBatchesWithSetup]] — the JVM-native `mapInPandas`).
  *
  * Test payloads come from [[MediaGen]], a deterministic generator
  * (doc id + text → canonical BMP or WAV bytes) materialized once as an
  * on-disk artifact by [[mediaTable]] — same build-once/load-many pattern
  * as [[IvfIndex]] and [[Dedup.pairTable]], and what makes the decode
  * gate hash-checkable end-to-end.
  */
object Multimodal {

  /** Typed decode output. Images fill width/height (n_frames = 1);
    * audio fills n_frames (PCM frames per channel), sample_rate and
    * channels. `format` is the sniffed container. */
  case class DecodedMeta(media_id: Long, format: String, width: Int,
                         height: Int, n_frames: Int, sample_rate: Int,
                         channels: Int)

  /** Wrap any (id, payload-string) frame as a media table:
    * (media_id: long, content: binary). */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("content"))

  /** Pure-function metadata over the binary column — stays in
    * whole-stage codegen, no decode needed. */
  def withMeta(media: DataFrame): DataFrame =
    media
      .withColumn("n_bytes", octet_length(col("content")))
      .withColumn("content_md5", md5(col("content")))
      .withColumn("first_byte", ascii(substring(col("content").cast("string"), 1, 1)))

  /** Real minimal codec: container sniffing + header parse for two actual
    * formats. Little-endian field extraction, exactly what the first step
    * of any image/audio decoder does; pixel/PCM payloads stay opaque
    * (feature extraction is a separate, heavier stage). Unknown magic
    * throws — a decoder that silently invents metadata hides corruption. */
  object HeaderCodec {
    private def u8(c: Array[Byte], i: Int): Int = c(i) & 0xFF
    private def le16(c: Array[Byte], i: Int): Int = u8(c, i) | (u8(c, i + 1) << 8)
    private def le32(c: Array[Byte], i: Int): Int =
      u8(c, i) | (u8(c, i + 1) << 8) | (u8(c, i + 2) << 16) | (u8(c, i + 3) << 24)
    private def fourCC(c: Array[Byte], i: Int): String =
      new String(c, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

    def decode(mediaId: Long, content: Array[Byte]): DecodedMeta = {
      if (content.length >= 26 && content(0) == 'B' && content(1) == 'M') {
        // BMP: BITMAPINFOHEADER width/height at offsets 18/22 (LE i32)
        DecodedMeta(mediaId, "bmp", width = le32(content, 18),
          height = le32(content, 22), n_frames = 1, sample_rate = 0,
          channels = 0)
      } else if (content.length >= 12 && fourCC(content, 0) == "RIFF" &&
                 fourCC(content, 8) == "WAVE") {
        // WAV: walk RIFF chunks (a real reader never assumes canonical
        // layout — fmt/data may be preceded by LIST/fact chunks)
        var off = 12
        var channels, rate, bits = 0
        var dataSize = -1
        while (off + 8 <= content.length && (dataSize < 0 || bits == 0)) {
          val id = fourCC(content, off)
          val size = le32(content, off + 4)
          // corrupt/attacker-controlled sizes: negative would advance off
          // by <= 0 and spin this loop forever; near-Int.MaxValue would
          // overflow the offset into negative indexing. A chunk must fit
          // in the remaining payload — anything else throws.
          require(size >= 0 && size <= content.length - off - 8,
            s"media $mediaId: corrupt chunk size $size at offset $off")
          if (id == "fmt ") {
            channels = le16(content, off + 10)
            rate = le32(content, off + 12)
            bits = le16(content, off + 22)
          } else if (id == "data") dataSize = size
          off += 8 + size + (size & 1) // chunks are word-aligned
        }
        // bits must be a whole number of bytes: a corrupt fmt chunk with
        // bits in 1..7 would make bits/8 zero and turn the frame-count
        // division into an ArithmeticException instead of this diagnostic
        require(bits >= 8 && bits % 8 == 0 && channels > 0 && dataSize >= 0,
          s"media $mediaId: WAV missing/corrupt fmt or data chunk " +
            s"(bits=$bits channels=$channels dataSize=$dataSize)")
        DecodedMeta(mediaId, "wav", width = 0, height = 0,
          n_frames = dataSize / (channels * (bits / 8)),
          sample_rate = rate, channels = channels)
      } else throw new IllegalArgumentException(
        s"media $mediaId: unknown container (${content.length} bytes)")
    }
  }

  /** Deterministic media payload generator: doc id + text → real bytes of
    * a canonical container (even ids: 24-bit BMP, odd ids: 16-bit PCM
    * WAV with the canonical 44-byte header). Dimensions/rates derive from
    * the doc, so every payload decodes to distinct, predictable metadata;
    * pixel/PCM bytes are filled deterministically. Canonical layout is a
    * generator guarantee the SQL oracle relies on; [[HeaderCodec]] itself
    * does not assume it. */
  object MediaGen {
    def payload(docId: Long, text: String): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(1 << 16)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      if (docId % 2 == 0) {
        val w = 1 + ((docId / 2) % 16).toInt
        val h = 1 + (text.length % 16)
        val stride = (3 * w + 3) & ~3 // BMP rows pad to 4 bytes
        val imageSize = stride * h
        bb.put('B'.toByte).put('M'.toByte)
          .putInt(54 + imageSize).putInt(0).putInt(54) // file size, reserved, data offset
          .putInt(40).putInt(w).putInt(h)              // DIB size, width, height
          .putShort(1).putShort(24)                    // planes, bpp
          .putInt(0).putInt(imageSize)                 // compression, image size
          .putInt(2835).putInt(2835).putInt(0).putInt(0) // ppm, palette
        for (i <- 0 until imageSize)
          bb.put(((docId * 31 + i) % 251).toByte)
      } else {
        val channels = 1 + ((docId / 2) % 2).toInt
        val rate = Seq(8000, 16000, 44100)(text.length % 3)
        val bits = 16
        val frames = 8 + (text.length % 64)
        val blockAlign = channels * bits / 8
        val dataSize = frames * blockAlign
        bb.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
          .put("fmt ".getBytes).putInt(16)
          .putShort(1).putShort(channels.toShort)      // PCM, channels
          .putInt(rate).putInt(rate * blockAlign)      // sample rate, byte rate
          .putShort(blockAlign.toShort).putShort(bits.toShort)
          .put("data".getBytes).putInt(dataSize)
        for (i <- 0 until dataSize)
          bb.put(((docId * 17 + i) % 253).toByte)
      }
      java.util.Arrays.copyOf(bb.array(), bb.position())
    }
  }

  /** Build-once / load-many media artifact: (media_id, content binary)
    * parquet under `<basePath>/media`, payloads from [[MediaGen]]. The
    * generation is engine-side, but once on disk the DECODE is pure byte
    * arithmetic any parquet reader can replay — which is what lets the
    * decode gate hash-check against DuckDB (same pattern as
    * [[Dedup.simhashTable]]). */
  def mediaTable(docs: DataFrame, idCol: String, textCol: String,
                 basePath: String): DataFrame = {
    val spark = docs.sparkSession
    val path = s"$basePath/media"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path, "_SUCCESS"))) {
      import spark.implicits._
      docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
        .map { case (id, text) => (id, MediaGen.payload(id, text)) }
        .toDF("media_id", "content")
        .write.mode(SaveMode.Overwrite).parquet(path)
    }
    spark.read.parquet(path)
  }

  /** Batch decode through [[BatchOps.mapBatchesWithSetup]]: one codec
    * context per partition (setup), rows handed to it in bounded batches
    * — the `mapInPandas` contract, JVM-native. Output is a typed Dataset
    * so downstream stays columnar. */
  def decodeBatched(media: DataFrame, batchSize: Int = 1024): Dataset[DecodedMeta] = {
    implicit val enc = Encoders.product[DecodedMeta]
    BatchOps.mapBatchesWithSetup(
        media.select(col("media_id"), col("content")), batchSize)(
        // a heavyweight codec opens its native handle here, once per task
        () => HeaderCodec) { (codec, batch) =>
      batch.map(r => codec.decode(r.getLong(0), r.getAs[Array[Byte]](1)))
    }
  }

  /** Frame sampling: every `stride`-th frame index (video keyframe /
    * audio window sampling shape — one row per sampled frame). */
  def sampleFrames(decoded: Dataset[DecodedMeta], stride: Int): DataFrame = {
    require(stride > 0, s"stride must be positive: $stride")
    decoded.toDF()
      // zero-frame media (a WAV with an empty data chunk is valid and
      // decodes to n_frames = 0) contributes no rows — sequence() with
      // stop < start THROWS rather than returning empty, so the empty
      // case must be explicit
      .withColumn("frame_idx",
        explode(when(col("n_frames") > 0,
          sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .otherwise(array().cast("array<int>"))))
      .select(col("media_id"), col("frame_idx"), col("width"), col("height"))
  }

  /** Resize planning for image rows: clamps decoded dims to a bounding
    * box, preserving aspect (integer arithmetic like a real thumbnailer).
    * Audio rows are passed over — resize is an image transform. */
  def resized(decoded: Dataset[DecodedMeta], maxSide: Int): DataFrame =
    decoded.toDF()
      .filter(col("width") > 0 && col("height") > 0)
      .withColumn("_scale",
        greatest(greatest(col("width"), col("height"))
          .cast("double") / maxSide, lit(1.0)))
      .select(col("media_id"),
        (col("width") / col("_scale")).cast("int").as("out_width"),
        (col("height") / col("_scale")).cast("int").as("out_height"))

  /** Feature-extraction stub: media bytes → dense `array<float>`
    * embedding, deterministic from content (xxhash64-seeded per
    * dimension), unit-normalized COLUMN-SIDE so the output plugs straight
    * into `Similarity`/`Dedup` operators. The per-dim hash is the stub;
    * the schema, determinism, and normalization contract are what a real
    * encoder must satisfy. */
  /** Per-window audio energy over 16-bit PCM WAV media — frame-level
    * feature extraction (the VAD/loudness-profile shape): window w
    * covers `windowFrames` frames across all channels, energy =
    * Σ|sample| as exact integer arithmetic any byte-reading engine
    * replays. The RIFF walk is honest (fmt /data chunks discovered,
    * not assumed); non-WAV media rows drop. Row-local typed flatMap —
    * embarrassingly parallel, output ∝ audio duration / window. */
  def audioFrameEnergy(media: DataFrame, windowFrames: Int): DataFrame = {
    require(windowFrames > 0, s"windowFrames must be positive: $windowFrames")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, c) =>
        def u8(i: Int) = c(i) & 0xFF
        def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
        def le32(i: Int) =
          u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
        if (c.length < 44 || c(0) != 'R' || c(1) != 'I' || c(2) != 'F' ||
          c(3) != 'F') Iterator.empty
        else {
          var pos = 12
          var channels = 1
          var dataStart = -1
          var dataSize = 0
          while (pos + 8 <= c.length && dataStart < 0) {
            val cc = new String(c, pos, 4, "US-ASCII")
            val sz = le32(pos + 4)
            if (cc == "fmt ") channels = le16(pos + 10)
            if (cc == "data") {
              dataStart = pos + 8
              dataSize = math.min(sz, c.length - dataStart)
            }
            pos += 8 + sz + (sz & 1)
          }
          if (dataStart < 0 || channels <= 0) Iterator.empty
          else {
            val nSamp = dataSize / 2
            val span = windowFrames * channels
            val byWin = new scala.collection.mutable.LinkedHashMap[Long, (Long, Long)]
            var i = 0
            while (i < nSamp) {
              val raw = le16(dataStart + 2 * i)
              val sv = if (raw >= 32768) raw - 65536 else raw
              val win = (i / span).toLong
              val (n, e) = byWin.getOrElse(win, (0L, 0L))
              byWin.update(win, (n + 1L, e + math.abs(sv)))
              i += 1
            }
            byWin.iterator.map { case (win, (n, e)) => (id, win, n, e) }
          }
        }
      }.toDF("media_id", "win", "n_samples", "energy")
  }

  /** Per-channel color statistics over 24-bit BMP media — the image
    * featurization sibling of [[audioFrameEnergy]] (mean-color /
    * brightness profiling before dedup or quality filtering): per
    * channel (B,G,R order as stored), Σvalue and the pixel count as
    * exact integers. Honest header use: dims and the 4-byte row stride
    * come from the DIB header, the pixel walk skips row padding. WAV
    * rows drop. */
  def imageChannelStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, c) =>
        def u8(i: Int) = c(i) & 0xFF
        def le32(i: Int) =
          u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
        if (c.length < 54 || c(0) != 'B' || c(1) != 'M') Iterator.empty
        else {
          val off = le32(10)
          val w = le32(18)
          val h = le32(22)
          // Bounds math in Long: hostile headers (e.g. w=1, h=0x7FFFFFFF)
          // overflow Int stride*h to a negative that slips past an Int
          // guard; such rows must fall into the drop path, not crash the
          // task with AIOOBE on a corpus-scale crawl.
          val strideL = (3L * w + 3) & ~3L
          if (w <= 0 || h <= 0 || off < 54 || off >= c.length ||
              off + strideL * h > c.length) Iterator.empty
          else {
            val stride = strideL.toInt
            val sums = new Array[Long](3)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                var ch = 0
                while (ch < 3) {
                  sums(ch) += u8(off + y * stride + 3 * x + ch)
                  ch += 1
                }
                x += 1
              }
              y += 1
            }
            val n = w.toLong * h
            (0 until 3).iterator.map(ch => (id, ch, n, sums(ch)))
          }
        }
      }.toDF("media_id", "channel", "n_pixels", "sum_value")
  }

  /** Perceptual difference-hash (dHash) per BMP image: luminance
    * sampled on a 9×8 nearest-neighbor grid, each bit = "right cell
    * brighter than its left neighbor", 64 bits packed as bit (y·8+x)
    * of one signed long. Near-identical images land within a few
    * Hamming bits, so the hashes plug straight into the SimHash
    * pairing machinery ([[graft.operators.Dedup]]'s chunk-blocked
    * signature joins) for image near-dup at corpus scale — the visual
    * sibling of text SimHash. All arithmetic is exact integers:
    * luminance = b+g+r (no fixed-point gray weights to disagree on),
    * sampling index = floor(x·w/9) / floor(y·h/8) — an external engine
    * replays the hash digit-for-digit (bit 63 folds to two's
    * complement identically). Non-BMP rows drop; row-local flatMap, no
    * shuffle. */
  def imageDHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, c) =>
        def u8(i: Int) = c(i) & 0xFF
        def le32(i: Int) =
          u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
        if (c.length < 54 || c(0) != 'B' || c(1) != 'M') Iterator.empty
        else {
          val off = le32(10)
          val w = le32(18)
          val h = le32(22)
          // Long bounds math + offset sanity: see imageChannelStats — a
          // wrapped Int stride*h must drop the row, never crash the task.
          val strideL = (3L * w + 3) & ~3L
          if (w <= 0 || h <= 0 || off < 54 || off >= c.length ||
              off + strideL * h > c.length) Iterator.empty
          else {
            val stride = strideL.toInt
            def lum(gx: Int, gy: Int): Int = {
              val px = gx * w / 9
              val py = gy * h / 8
              val p = off + py * stride + 3 * px
              u8(p) + u8(p + 1) + u8(p + 2)
            }
            var hash = 0L
            var gy = 0
            while (gy < 8) {
              var gx = 0
              while (gx < 8) {
                if (lum(gx + 1, gy) > lum(gx, gy))
                  hash |= 1L << (gy * 8 + gx)
                gx += 1
              }
              gy += 1
            }
            Iterator.single((id, hash))
          }
        }
      }.toDF("media_id", "dhash")
  }

  /** Real-codec decode via `javax.imageio` — the production path for a
    * crawled multimodal corpus (JPEG/PNG/GIF/BMP), where the byte-walk
    * decoders above stay the oracle-replayable gates. Same batch shape
    * as [[decodeBatched]]: one reader context per task (the setup hook
    * disables ImageIO's temp-FILE cache — a per-row disk write on the
    * hot path otherwise), rows in bounded batches. Rows no installed
    * reader claims (WAV, truncated payloads) DROP — feature-extraction
    * semantics like [[imageChannelStats]], not the strict-gate throw of
    * [[HeaderCodec]]. Only the header is read (`getWidth/getHeight` on
    * the reader), never the full raster — metadata extraction over a
    * 100 TB image corpus must not pay pixel decode. */
  def decodeImages(media: DataFrame, batchSize: Int = 256): Dataset[DecodedMeta] = {
    implicit val enc = Encoders.product[DecodedMeta]
    BatchOps.mapBatchesWithSetup(
        media.select(col("media_id").cast("long"), col("content")), batchSize)(
        () => { javax.imageio.ImageIO.setUseCache(false); () }) { (_, batch) =>
      batch.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis, true, true)
              Some(DecodedMeta(id, reader.getFormatName.toLowerCase,
                width = reader.getWidth(0), height = reader.getHeight(0),
                n_frames = 1, sample_rate = 0, channels = 0))
            } catch { case _: Exception => None } // truncated past header
            finally reader.dispose()
          }
        } finally iis.close()
      }
    }
  }

  /** Perceptual dHash over the `javax.imageio` decode — the same 9×8
    * grid, integer luminance (r+g+b), bit layout, and "right cell
    * brighter" rule as [[imageDHash]], so hashes from BOTH paths feed
    * the SAME chunk-blocked Hamming join ([[Dedup.chunkBlockPairs]])
    * interchangeably. The grid's vertical axis keeps the BMP byte-walk
    * convention (gy = 0 is the BOTTOM row): for a 24-bit BMP the two
    * paths are BIT-IDENTICAL (spec-pinned property), and a lossless
    * re-encode (PNG) of the same pixels hashes identically — the
    * cross-codec stability that makes the hash a near-dup key at all.
    * Undecodable rows drop. Full raster decode, row-local, no shuffle. */
  def imageDHashDecoded(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { case (id, bytes) =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
          if (img == null || img.getWidth < 1 || img.getHeight < 1)
            Iterator.empty
          else {
            val w = img.getWidth; val h = img.getHeight
            def lum(gx: Int, gy: Int): Int = {
              val px = gx * w / 9
              // byte-walk rows count from the BOTTOM of the image
              val py = h - 1 - (gy * h / 8)
              val rgb = img.getRGB(px, py)
              ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
            }
            var hash = 0L
            var gy = 0
            while (gy < 8) {
              var gx = 0
              while (gx < 8) {
                if (lum(gx + 1, gy) > lum(gx, gy))
                  hash |= 1L << (gy * 8 + gx)
                gx += 1
              }
              gy += 1
            }
            Iterator.single((id, hash))
          }
        }
      }.toDF("media_id", "dhash")
  }

  def featureExtract(media: DataFrame, dim: Int): DataFrame = {
    import org.apache.spark.sql.functions.{aggregate => agg_, _}
    val raw = transform(sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(col("content"), i), lit(2000L)) - 1000L)
        .cast("double") / 1000.0)
    val nrm = sqrt(agg_(transform(raw, x => x * x), lit(0.0), (a, v) => a + v))
    media.select(col("media_id"),
      transform(raw, x => (x / nrm).cast("float")).as("embedding"))
  }
}
