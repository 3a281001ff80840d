package graft.streaming

import graft.SparkSpec
import graft.operators.Upsert
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class MergeSinkSpec extends SparkSpec {
  import spark.implicits._

  test("streaming merges equal one batch merge of all updates") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("mergesink").toString
    val target = s"$dir/table"
    val mem = MemoryStream[(Long, String, Long)]
    val updates = mem.toDF().toDF("k", "v", "ver")
    val q = MergeSink.start(updates, target, Seq("k"), "ver",
      s"$dir/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      // batch 1 creates the table; in-batch dup on k=1: latest ver wins
      mem.addData((1L, "a0", 1L), (1L, "a1", 2L), (2L, "b0", 1L))
      q.processAllAvailable()
      assert(spark.read.parquet(target).count() == 2)
      assert(spark.read.parquet(target).filter($"k" === 1)
        .select("v").as[String].head() == "a1")
      // batch 2 updates k=2, inserts k=3
      mem.addData((2L, "b1", 5L), (3L, "c0", 1L))
      q.processAllAvailable()
      val fin = spark.read.parquet(target)
        .orderBy("k").as[(Long, String, Long)].collect().toSeq
      assert(fin == Seq((1L, "a1", 2L), (2L, "b1", 5L), (3L, "c0", 1L)))
      // equivalence: the same updates as ONE batch merge into empty
      val all = Seq((1L, "a0", 1L), (1L, "a1", 2L), (2L, "b0", 1L),
        (2L, "b1", 5L), (3L, "c0", 1L)).toDF("k", "v", "ver")
      val empty = all.filter(lit(false))
      val oneShot = Upsert.mergeLatest(empty, all, Seq("k"), "ver")
        .orderBy("k").as[(Long, String, Long)].collect().toSeq
      assert(oneShot == fin)
    } finally q.stop()
  }
}
