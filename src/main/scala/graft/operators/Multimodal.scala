package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (BASELINE north star): image/audio/video
  * payloads ride as opaque `binary` columns with typed metadata, processed
  * in partition-sized batches.
  *
  * The actual codec call is STUBBED — this container has no image/audio
  * libraries — behind `FakeCodec.decode`, a deterministic fake keyed on
  * the payload bytes. Everything around it is real and load-bearing:
  * the binary schema, the metadata extraction (pure codegen'd functions),
  * and the `mapPartitions` batch shape a vectorized decoder would use
  * (one decoder init per partition, streaming over rows — the Scala
  * analog of `mapInPandas` batches).
  */
object Multimodal {

  /** Typed decode output: what a real image decoder would report. */
  case class DecodedMeta(media_id: Long, width: Int, height: Int,
                         format: String, n_frames: Int)

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

  /** STUB codec: deterministic fake decode derived from the payload
    * bytes. A real deployment swaps this object for JNI/FFI bindings —
    * the surrounding plumbing is unchanged. */
  object FakeCodec {
    def decode(mediaId: Long, content: Array[Byte]): DecodedMeta = {
      val h = java.util.Arrays.hashCode(content)
      DecodedMeta(
        media_id = mediaId,
        width = 64 + math.floorMod(h, 1024),
        height = 64 + math.floorMod(h >> 10, 1024),
        format = Seq("jpeg", "png", "webp")(math.floorMod(h >> 20, 3)),
        n_frames = 1 + math.floorMod(h >> 22, 16))
    }
  }

  /** Batch decode through [[BatchOps.mapBatchesWithSetup]]: one codec
    * context per partition (setup), rows handed to it in bounded batches
    * — the `mapInPandas` contract, JVM-native. Output is a typed Dataset
    * so downstream stays columnar. */
  def decodeBatched(media: DataFrame, batchSize: Int = 1024): Dataset[DecodedMeta] = {
    implicit val enc = Encoders.product[DecodedMeta]
    BatchOps.mapBatchesWithSetup(
        media.select(col("media_id"), col("content")), batchSize)(
        // real deployment: open the decoder handle here, once per task
        () => FakeCodec) { (codec, batch) =>
      batch.map(r => codec.decode(r.getLong(0), r.getAs[Array[Byte]](1)))
    }
  }

  /** Frame-sample stub: pick every `stride`-th frame index from the fake
    * decode — demonstrates the explode-to-frames shape video pipelines
    * use (one row per sampled frame). */
  def sampleFrames(decoded: Dataset[DecodedMeta], stride: Int): DataFrame =
    decoded.toDF()
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .select(col("media_id"), col("frame_idx"), col("width"), col("height"))

  /** Resize stub: clamps the fake-decoded dims to a bounding box,
    * preserving aspect (integer arithmetic like a real thumbnailer). The
    * media bytes stay opaque — a real codec swaps in at FakeCodec. */
  def resized(decoded: Dataset[DecodedMeta], maxSide: Int): DataFrame =
    decoded.toDF()
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
