package graft.operators

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Tombstone deletes on the IVF index: a committed tombstone makes a
  * row invisible through every path that resolves rows via cells() —
  * float probe, quantized rerank — with zero data movement;
  * purgeDeletes later rewrites only the affected cells, and the whole
  * flow is redelivery-proof and crash-convergent at both seams. */
class IvfDeleteSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = {
    val rnd = new scala.util.Random(7)
    (1 to 60).map { i =>
      val base = if (i <= 30) Array(10f, 0f, 0f, 0f) else Array(0f, 10f, 0f, 0f)
      (i.toLong, base.map(_ + rnd.nextFloat() * 0.5f))
    }.toDF("vec_id", "embedding")
  }
  private val query = Seq(10.0, 0.2, 0.0, 0.0)

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select($"vec_id").as[Long].collect().toSeq

  test("a committed tombstone hides the row from float and quantized " +
      "probes immediately; redelivery no-ops; purge rewrites only " +
      "affected cells and drops emptied dirs") {
    val base = Files.createTempDirectory("graft_ivfdel").toString
    val idx = new IvfIndex(spark, base)
    idx.build(emb, "vec_id", "embedding", k = 2, iters = 4)
    idx.ensureSq("vec_id", "embedding")
    val before = ids(idx.search("vec_id", "embedding", query, 5, 1))
    assert(before.nonEmpty)
    val victims = before.take(2)

    assert(idx.delete(emb.filter($"vec_id".isin(victims: _*)), "vec_id"))
    // redelivered delete (same content) no-ops via the token
    assert(!idx.delete(emb.filter($"vec_id".isin(victims: _*)), "vec_id"))

    val afterF = ids(idx.search("vec_id", "embedding", query, 5, 1))
    assert(victims.forall(v => !afterF.contains(v)), afterF.mkString(","))
    // the SQ sibling still holds the dead codes, but they cannot
    // survive the rerank join through cells()
    val afterQ = ids(idx.searchQuantized("vec_id", "embedding", query,
      5, 60, 1))
    assert(victims.forall(v => !afterQ.contains(v)), afterQ.mkString(","))
    assert(afterQ == afterF)
    assert(idx.cells().count() == 58)

    // purge: the victims live in cell A; cell B's files must not move
    val cellOf = StagedCommit.readCommitted(spark, s"$base/ivf_cells")
      .filter($"vec_id" === victims.head)
      .select($"cell").as[Int].head()
    val otherCell = 1 - cellOf
    def filesOf(c: Int): Set[String] = {
      val d = new java.io.File(s"$base/ivf_cells/cell=$c")
      if (!d.exists) Set.empty
      else d.listFiles.map(f => f.getName -> f.lastModified).map(_.toString).toSet
    }
    val otherBefore = filesOf(otherCell)
    assert(idx.purgeDeletes("vec_id") == Seq(cellOf))
    assert(filesOf(otherCell) == otherBefore) // untouched mass unmoved
    assert(!new java.io.File(s"$base/ivf_tombstones").exists)
    assert(idx.cells().count() == 58)
    assert(ids(idx.search("vec_id", "embedding", query, 5, 1)) == afterF)
    // the purge wiped the SQ sibling (its codes held the dead rows)
    intercept[IllegalStateException] {
      idx.searchQuantized("vec_id", "embedding", query, 5, 60, 1)
    }
    idx.ensureSq("vec_id", "embedding")
    assert(ids(idx.searchQuantized("vec_id", "embedding", query,
      5, 60, 1)) == afterF)

    // deleting EVERY row of a cell removes its dir at purge
    val cellBIds = StagedCommit.readCommitted(spark, s"$base/ivf_cells")
      .filter($"cell" === otherCell).select($"vec_id").as[Long].collect()
    idx.delete(cellBIds.toSeq.toDF("vec_id"), "vec_id")
    assert(idx.purgeDeletes("vec_id") == Seq(otherCell))
    assert(!new java.io.File(s"$base/ivf_cells/cell=$otherCell").exists)
    assert(idx.cells().count() == 58 - cellBIds.length)
  }

  test("purge kill windows: after the overwrite and before the clear, " +
      "readers stay correct and the retry converges") {
    val base = Files.createTempDirectory("graft_ivfdel_k").toString
    val idx = new IvfIndex(spark, base)
    idx.build(emb, "vec_id", "embedding", k = 2, iters = 4)
    idx.delete(Seq(1L, 2L, 31L).toDF("vec_id"), "vec_id")
    val expect = ids(idx.search("vec_id", "embedding", query, 5, 2))
    assert(Seq(1L, 2L, 31L).forall(v => !expect.contains(v)))

    graft.FailPoint.arm("ivf_purge_after_overwrite")
    try intercept[graft.FailPoint.Kill] {
      idx.purgeDeletes("vec_id")
    } finally graft.FailPoint.disarm()
    // tombstones still active: rewritten-away rows match nothing
    assert(new java.io.File(s"$base/ivf_tombstones").exists)
    assert(ids(idx.search("vec_id", "embedding", query, 5, 2)) == expect)

    graft.FailPoint.arm("ivf_purge_before_clear")
    try intercept[graft.FailPoint.Kill] {
      idx.purgeDeletes("vec_id")
    } finally graft.FailPoint.disarm()
    assert(ids(idx.search("vec_id", "embedding", query, 5, 2)) == expect)

    // clean retry converges: tombstones cleared, content stable
    idx.purgeDeletes("vec_id")
    assert(!new java.io.File(s"$base/ivf_tombstones").exists)
    assert(ids(idx.search("vec_id", "embedding", query, 5, 2)) == expect)
    assert(idx.cells().count() == 57)
    // purge with no tombstones is a no-op
    assert(idx.purgeDeletes("vec_id").isEmpty)
  }

  test("delete refuses on a never-built index; a killed FIRST delete " +
      "reads as no tombstones") {
    val base = Files.createTempDirectory("graft_ivfdel_g").toString
    val idx = new IvfIndex(spark, base)
    intercept[IllegalStateException] {
      idx.delete(Seq(1L).toDF("vec_id"), "vec_id")
    }
    idx.build(emb, "vec_id", "embedding", k = 2, iters = 4)
    // simulate a killed first delete: stage dir exists, no marker
    val stage = new java.io.File(s"$base/ivf_tombstones/_stage_x")
    assert(stage.mkdirs())
    assert(idx.cells().count() == 60) // reads as "no tombstones"
    assert(idx.purgeDeletes("vec_id").isEmpty)
  }
}
