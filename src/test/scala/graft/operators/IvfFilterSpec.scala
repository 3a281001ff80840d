package graft.operators

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Filtered ANN over the IVF index: attribute predicates evaluate
  * against the stored rows inside the pruned cell scan, and the
  * adaptive variant widens the probe until the predicate leaves k
  * survivors — the fixed-nprobe recall hole a selective filter opens. */
class IvfFilterSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = {
    val rnd = new scala.util.Random(11)
    (1 to 60).map { i =>
      val base = if (i <= 30) Array(10f, 0f, 0f, 0f) else Array(0f, 10f, 0f, 0f)
      (i.toLong, base.map(_ + rnd.nextFloat() * 0.5f))
    }.toDF("vec_id", "embedding")
  }
  private val query = Seq(10.0, 0.2, 0.0, 0.0) // near cluster 1 (ids <= 30)

  test("fixed-nprobe filtered search misses cross-cell survivors; the " +
      "adaptive probe widens to find them and matches brute force") {
    val base = Files.createTempDirectory("graft_ivff").toString
    val idx = new IvfIndex(spark, base)
    idx.build(emb, "vec_id", "embedding", k = 2, iters = 4)

    // predicate selects ONLY the far cluster: the query's own cell has
    // zero survivors, so nprobe=1 comes back empty — the recall hole
    assert(idx.searchWhere("vec_id", "embedding", query, 5,
      $"vec_id" > 30, nprobe = 1).count() == 0)

    val (adaptive, np) = idx.searchWhereAdaptive(
      "vec_id", "embedding", query, 5, $"vec_id" > 30)
    assert(np == 2) // widened exactly once to cover the far cell
    val brute = Similarity.bruteForceTopK(
        emb.filter($"vec_id" > 30), "vec_id", "embedding", query, 5)
      .as[(Long, Double)].collect().toSeq
    assert(adaptive.as[(Long, Double)].collect().toSeq == brute)

    // a predicate the near cell satisfies terminates at the initial
    // probe — no wasted widening
    val (near, np1) = idx.searchWhereAdaptive(
      "vec_id", "embedding", query, 3, $"vec_id" <= 30)
    assert(np1 == 1)
    assert(near.as[(Long, Double)].collect().toSeq ==
      Similarity.bruteForceTopK(emb.filter($"vec_id" <= 30),
        "vec_id", "embedding", query, 3)
        .as[(Long, Double)].collect().toSeq)

    // filtered search composes with tombstones (both resolve through
    // cells())
    val top = near.select($"vec_id").as[Long].head()
    idx.delete(Seq(top).toDF("vec_id"), "vec_id")
    val after = idx.searchWhere("vec_id", "embedding", query, 3,
      $"vec_id" <= 30, nprobe = 1).select($"vec_id").as[Long].collect()
    assert(!after.contains(top))
  }
}
