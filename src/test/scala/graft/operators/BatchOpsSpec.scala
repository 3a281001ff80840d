package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BatchOpsSpec extends SparkSpec {
  import spark.implicits._

  test("mapBatches preserves all rows and respects batch size") {
    val ds = (1 to 1000).toDS().repartition(4)
    val sizes = spark.sparkContext.collectionAccumulator[Int]("sizes")
    val out = BatchOps.mapBatches(ds, 64) { batch =>
      sizes.add(batch.size)
      batch.map(_ * 2)
    }
    assert(out.collect().sorted.toSeq == (1 to 1000).map(_ * 2))
    import scala.jdk.CollectionConverters._
    assert(sizes.value.asScala.forall(_ <= 64))
    assert(sizes.value.asScala.exists(_ == 64)) // real batching happened
  }

  test("mapBatchesWithSetup runs setup once per non-empty partition") {
    val ds = (1 to 100).toDS().repartition(4)
    val setups = spark.sparkContext.longAccumulator("setups")
    val out = BatchOps.mapBatchesWithSetup(ds, 10)(() => {
      setups.add(1); "handle"
    }) { (h, batch) => batch.map(x => s"$h:$x") }
    assert(out.count() == 100)
    assert(setups.value == 4)
  }

  test("mapBatchesWithSetup skips setup on empty partitions") {
    val ds = (1 to 3).toDS().repartition(8) // ≥5 empty partitions
    val setups = spark.sparkContext.longAccumulator("setups2")
    BatchOps.mapBatchesWithSetup(ds, 10)(() => { setups.add(1); () }) {
      (_, batch) => batch
    }.count()
    assert(setups.value <= 3)
  }

  test("decodeBatched through BatchOps matches row-at-a-time decode") {
    val media = (1L to 50L)
      .map(i => (i, Multimodal.MediaGen.payload(i, s"payload_$i")))
      .toDF("media_id", "content")
    val batched = Multimodal.decodeBatched(media, batchSize = 7)
      .collect().sortBy(_.media_id)
    val direct = media.collect().map(r =>
      Multimodal.HeaderCodec.decode(r.getLong(0), r.getAs[Array[Byte]](1)))
      .sortBy(_.media_id)
    assert(batched.toSeq == direct.toSeq)
  }
}
