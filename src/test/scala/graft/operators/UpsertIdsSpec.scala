package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UpsertIdsSpec extends SparkSpec {
  import spark.implicits._

  test("merge: update wins, unmatched target passes, unmatched update inserts") {
    val target = Seq((1L, "A", 10.0), (2L, "B", 20.0)).toDF("k", "st", "v")
    val updates = Seq((2L, "U", 99.0), (3L, "N", 30.0)).toDF("k", "st", "v")
    val out = Upsert.merge(target, updates, Seq("k"))
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, "A", 10.0), (2L, "U", 99.0), (3L, "N", 30.0)))
  }

  test("merge is idempotent: re-applying the same updates is a no-op") {
    val target = Seq((1L, "A", 10.0), (2L, "B", 20.0)).toDF("k", "st", "v")
    val updates = Seq((2L, "U", 99.0)).toDF("k", "st", "v")
    val once = Upsert.merge(target, updates, Seq("k"))
    val twice = Upsert.merge(once, updates, Seq("k"))
    assert(once.as[(Long, String, Double)].collect().sortBy(_._1).toSeq ==
      twice.as[(Long, String, Double)].collect().sortBy(_._1).toSeq)
  }

  test("mergeLatest dedups update stream to highest version per key") {
    val target = Seq((1L, "A", 0L)).toDF("k", "st", "ver")
    val updates = Seq((1L, "old", 1L), (1L, "new", 2L)).toDF("k", "st", "ver")
    val out = Upsert.mergeLatest(target, updates, Seq("k"), "ver")
      .as[(Long, String, Long)].collect()
    assert(out.toSeq == Seq((1L, "new", 2L)))
  }

  test("withDenseId yields a dense 1-based id in order-key order") {
    val df = spark.range(1, 1001).toDF("k")
      .withColumn("k", col("k") * 7 % 1009) // shuffled but unique
    val out = Ids.withDenseId(df, "id", Seq(col("k")), numPartitions = 8)
      .orderBy("id").as[(Long, Long)].collect()
    val ids = out.map(_._2)
    assert(ids.toSeq == (1L to 1000L))
    // id order must equal k order
    val ks = out.map(_._1)
    assert(ks.toSeq == ks.sorted.toSeq)
  }

  test("withDenseId on single partition still correct") {
    val df = Seq(5L, 3L, 9L).toDF("k")
    val out = Ids.withDenseId(df, "id", Seq(col("k")), numPartitions = 1)
      .orderBy("id").as[(Long, Long)].collect()
    assert(out.toSeq == Seq((3L, 1L), (5L, 2L), (9L, 3L)))
  }
}
