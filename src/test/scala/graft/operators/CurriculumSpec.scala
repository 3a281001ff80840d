package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurriculumSpec extends SparkSpec {
  import spark.implicits._

  test("interleave ranks within group by the order and rotates groups") {
    val df = Seq(
      (1L, "a", 30L), (2L, "a", 10L), (3L, "a", 20L),
      (4L, "b", 5L), (5L, "b", 50L)).toDF("id", "grp", "len")
    val out = Curriculum.interleave(df, "id", "grp", Seq(col("len").asc))
      .select("id", "grp", "rank", "order_key")
      .orderBy("order_key", "id")
      .as[(Long, String, Long, Long)].collect().toSeq
    // within-group short-first ranks: a → 2(10),3(20),1(30); b → 4(5),5(50)
    // order keys (G=2): a rank r → (r-1)*2+0, b → (r-1)*2+1
    assert(out == Seq(
      (2L, "a", 1L, 0L),
      (4L, "b", 1L, 1L),
      (3L, "a", 2L, 2L),
      (5L, "b", 2L, 3L),
      (1L, "a", 3L, 4L)))
    // deterministic on re-run
    assert(Curriculum.interleave(df, "id", "grp", Seq(col("len").asc))
      .select("id", "grp", "rank", "order_key")
      .orderBy("order_key", "id")
      .as[(Long, String, Long, Long)].collect().toSeq == out)
  }

  test("ties break on the key, exhausting groups leave monotone gaps") {
    val df = Seq(
      (9L, "x", 1L), (7L, "x", 1L),
      (8L, "y", 1L)).toDF("id", "grp", "len")
    val out = Curriculum.interleave(df, "id", "grp", Seq(col("len").asc))
      .select("id", "rank", "order_key").orderBy("order_key")
      .as[(Long, Long, Long)].collect().toSeq
    // x: 7 then 9 (tie → key asc); y: 8. keys: x=(r-1)*2, y=(r-1)*2+1
    assert(out == Seq((7L, 1L, 0L), (8L, 1L, 1L), (9L, 2L, 2L)))
  }

  test("epochShuffleOrder: dense epoch-major positions, distinct " +
      "per-epoch permutations, deterministic") {
    val n = 100
    val df = (1L to n).toDF("id")
    val out = Curriculum.epochShuffleOrder(df, "id", epochs = 3)
      .as[(Long, Int, Long)].collect()
    assert(out.length == 3 * n)
    // positions are dense 0..3n-1 and epoch-major: epoch e owns
    // [e*n, (e+1)*n)
    assert(out.map(_._3).sorted.toSeq == (0L until 3L * n))
    out.foreach { case (_, e, p) =>
      assert(p >= e.toLong * n && p < (e + 1).toLong * n) }
    // each epoch is a full permutation of the corpus
    val byEpoch = out.groupBy(_._2)
    assert(byEpoch.keySet == Set(0, 1, 2))
    byEpoch.values.foreach(rows =>
      assert(rows.map(_._1).sorted.toSeq == (1L to n)))
    // the permutations DIFFER between epochs (md5 re-keys per epoch)
    def order(e: Int) = byEpoch(e).sortBy(_._3).map(_._1).toSeq
    assert(order(0) != order(1) && order(1) != order(2))
    // and none of them is the identity order
    assert(order(0) != (1L to n).toSeq)
    // deterministic: a fresh invocation lands the identical table
    val again = Curriculum.epochShuffleOrder(df, "id", epochs = 3)
      .as[(Long, Int, Long)].collect()
    assert(again.sortBy(r => (r._2, r._3)).toSeq ==
      out.sortBy(r => (r._2, r._3)).toSeq)
    intercept[IllegalArgumentException] {
      Curriculum.epochShuffleOrder(df, "id", epochs = 0)
    }
  }
}
