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

  test("resized clamps to bounding box preserving aspect") {
    val media = Multimodal.asMedia(docs, "doc_id", "text")
    val out = Multimodal.resized(Multimodal.decodeBatched(media), maxSide = 64)
      .as[(Long, Int, Int)].collect()
    out.foreach { case (_, w, h) =>
      assert(w <= 64 && h <= 64 && w > 0 && h > 0)
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
    val media = Multimodal.asMedia(docs, "doc_id", "text")
    val d1 = Multimodal.decodeBatched(media).collect().sortBy(_.media_id)
    val d2 = Multimodal.decodeBatched(media).collect().sortBy(_.media_id)
    assert(d1.toSeq == d2.toSeq)
    assert(d1.forall(m => m.width >= 64 && m.height >= 64 && m.n_frames >= 1))
    val frames = Multimodal.sampleFrames(Multimodal.decodeBatched(media), stride = 2)
    val perId = frames.groupBy("media_id").count().as[(Long, Long)].collect().toMap
    d1.foreach { m =>
      assert(perId(m.media_id) == (m.n_frames + 1) / 2)
    }
  }
}
