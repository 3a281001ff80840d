package graft.operators

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** In-place vector update (VERDICT r16 #3): one packaged op retires
  * the keys' current rows, physically purges them, and files the new
  * vectors — redelivery-idempotent under its salted content token and
  * crash-convergent through the purge seams. */
class IvfUpdateSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = {
    val rnd = new scala.util.Random(11)
    (1 to 60).map { i =>
      val base = if (i <= 30) Array(10f, 0f, 0f, 0f) else Array(0f, 10f, 0f, 0f)
      (i.toLong, base.map(_ + rnd.nextFloat() * 0.5f))
    }.toDF("vec_id", "embedding")
  }
  private val query = Seq(10.0, 0.2, 0.0, 0.0)

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select($"vec_id").as[Long].collect().toSeq

  private def built(): (String, IvfIndex) = {
    val base = Files.createTempDirectory("graft_ivfupd").toString
    val idx = new IvfIndex(spark, base)
    idx.build(emb, "vec_id", "embedding", k = 2, iters = 4)
    (base, idx)
  }

  test("update replaces the keys' vectors in place: the new vectors " +
      "serve, the old are physically gone, untouched rows never move; " +
      "a redelivered update no-ops") {
    val (base, idx) = built()
    // the top hit for `query` moves to the OTHER cluster: its old row
    // must stop serving and its new row must rank for a y-axis query
    val victim = ids(idx.search("vec_id", "embedding", query, 1, 1)).head
    val newVec = Array(0f, 20f, 0f, 0f)
    val upd = Seq((victim, newVec)).toDF("vec_id", "embedding")
    assert(idx.update(upd, "vec_id", "embedding", salt = "b1"))
    assert(idx.cells().count() == 60) // replaced, not duplicated
    assert(!ids(idx.search("vec_id", "embedding", query, 5, 2))
      .contains(victim))
    val yTop = ids(idx.search("vec_id", "embedding",
      Seq(0.0, 10.0, 0.0, 0.0), 1, 2))
    assert(yTop == Seq(victim), s"updated vector should top a y query: $yTop")
    // physically gone, not just masked: no tombstones remain and the
    // raw committed cells hold exactly one row for the key
    assert(!new java.io.File(s"$base/ivf_tombstones").exists)
    assert(StagedCommit.readCommitted(spark, s"$base/ivf_cells")
      .filter($"vec_id" === victim).count() == 1)
    // redelivery (same salt, same content) recognizes itself
    assert(!idx.update(upd, "vec_id", "embedding", salt = "b1"))
    assert(idx.cells().count() == 60)
  }

  test("salt separates a genuine set-back-to-original from a " +
      "redelivery; an update of an absent key degrades to an append") {
    val (_, idx) = built()
    val v5 = emb.filter($"vec_id" === 5).select($"embedding")
      .as[Array[Float]].head()
    val w = Array(0f, 0f, 7f, 0f)
    assert(idx.update(Seq((5L, w)).toDF("vec_id", "embedding"),
      "vec_id", "embedding", salt = "i1"))
    assert(idx.update(Seq((5L, v5)).toDF("vec_id", "embedding"),
      "vec_id", "embedding", salt = "i2"))
    // same content as i1's update, DIFFERENT interval: applies again
    assert(idx.update(Seq((5L, w)).toDF("vec_id", "embedding"),
      "vec_id", "embedding", salt = "i3"))
    assert(idx.cells().count() == 60)
    assert(StagedCommit.readCommitted(spark,
        s"${idx.basePath}/ivf_cells")
      .filter($"vec_id" === 5).select($"embedding").as[Array[Float]]
      .head() sameElements w)
    // absent key: nothing to retire, the new row just files
    assert(idx.update(Seq((999L, Array(1f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding"), "vec_id", "embedding", salt = "i4"))
    assert(idx.cells().count() == 61)
  }

  test("crash inside the update's purge converges on retry (the " +
      "append-token fence skips the retirement only after the append " +
      "committed)") {
    val (_, idx) = built()
    val victim = ids(idx.search("vec_id", "embedding", query, 1, 1)).head
    val upd = Seq((victim, Array(0f, 20f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    // seam 1: purge overwrote cells but the tombstones never cleared
    graft.FailPoint.arm("ivf_purge_before_clear")
    try intercept[graft.FailPoint.Kill] {
      idx.update(upd, "vec_id", "embedding", salt = "c1")
    } finally graft.FailPoint.disarm()
    // retry the SAME update: tombstone no-ops, purge completes, the
    // append lands — converged
    assert(idx.update(upd, "vec_id", "embedding", salt = "c1"))
    assert(idx.cells().count() == 60)
    assert(StagedCommit.readCommitted(spark,
        s"${idx.basePath}/ivf_cells")
      .filter($"vec_id" === victim).count() == 1)
    assert(ids(idx.search("vec_id", "embedding",
      Seq(0.0, 10.0, 0.0, 0.0), 1, 2)) == Seq(victim))
    // and a replay AFTER convergence is a recognized no-op
    assert(!idx.update(upd, "vec_id", "embedding", salt = "c1"))
  }
}
