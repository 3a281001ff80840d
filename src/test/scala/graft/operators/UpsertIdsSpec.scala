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

  test("mergeIntoPartitioned replaces only touched partitions") {
    val base = java.nio.file.Files.createTempDirectory("graft_pmerge").toString
    val table = s"$base/t"
    val initial = Seq(
      ("A", 1L, 10.0, 1L), ("A", 2L, 20.0, 1L),
      ("B", 3L, 30.0, 1L), ("C", 4L, 40.0, 1L)
    ).toDF("part", "k", "v", "ver")
    Upsert.mergeIntoPartitioned(spark, table, initial,
      Seq("part", "k"), "part", "ver")

    // record file mtimes of the untouched partition
    def partFiles(p: String) = new java.io.File(s"$table/part=$p")
      .listFiles.filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified)).toSet
    val cFilesBefore = partFiles("C")

    // update A (existing key), insert into B (new key); C untouched
    val updates = Seq(
      ("A", 1L, 99.0, 2L), ("B", 9L, 90.0, 2L)
    ).toDF("part", "k", "v", "ver")
    Upsert.mergeIntoPartitioned(spark, table, updates,
      Seq("part", "k"), "part", "ver")

    val out = spark.read.parquet(table)
      .select("part", "k", "v").as[(String, Long, Double)].collect().toSet
    assert(out == Set(
      ("A", 1L, 99.0), ("A", 2L, 20.0),
      ("B", 3L, 30.0), ("B", 9L, 90.0), ("C", 4L, 40.0)))
    // C's physical files were not rewritten
    assert(partFiles("C") == cFilesBefore)
    // older version never resurrects (LWW on ver)
    val v = spark.read.parquet(table).filter($"part" === "A" && $"k" === 1)
      .select("ver").as[Long].head()
    assert(v == 2L)
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
