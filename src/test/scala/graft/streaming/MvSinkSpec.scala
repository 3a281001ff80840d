package graft.streaming

import graft.SparkSpec
import graft.operators.{IncrementalAgg, Upsert}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming MV maintenance: the view converges to a rebuild over the
  * final facts, replayed batches are fenced (the fold is NOT
  * idempotent), and the state-write kill window repairs. */
class MvSinkSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("part", "k")
  private val grp = Seq("part")

  private def rows(t: (Long, String, Double, Long)*) =
    t.toSeq.toDF("k", "part", "v", "ver")

  private def view(stateDir: String) =
    MvSink.readView(spark, stateDir, grp)
      .select($"part", $"n", round($"total", 4).as("t"),
        round($"mean", 6).as("m"))
      .as[(String, Long, Double, Double)].collect().toSet

  test("feed-maintained view == rebuild over the final facts, through " +
      "a REAL feed stream; replayed batches are fenced") {
    val w = java.nio.file.Files.createTempDirectory("graft_mv").toString
    val tbl = s"$w/tbl"; val feed = s"$w/feed"; val st = s"$w/state"
    Upsert.mergeIntoManifested(spark, tbl,
      rows((1, "a", 1.0, 1), (2, "a", 3.0, 1), (3, "b", 5.0, 1)),
      keys, "part", "ver", retain = 8)
    MvSink.seed(Upsert.readManifestedAt(spark, tbl, 0), grp, "v", st)
    assert(view(st) == Set(("a", 2L, 4.0, 2.0), ("b", 1L, 5.0, 5.0)))
    // update wave + delete wave, polled as two intervals
    Upsert.mergeIntoManifested(spark, tbl,
      rows((1, "a", 10.0, 2)), keys, "part", "ver", retain = 8)
    CdfSource.pollOnce(spark, tbl, keys, feed)
    Upsert.deleteKeysFromManifested(spark, tbl,
      Seq(("b", 3L)).toDF("part", "k"), keys, "part", retain = 8)
    CdfSource.pollOnce(spark, tbl, keys, feed)
    val q = MvSink.start(CdfSource.feedStream(spark, tbl, keys, feed),
      grp, "v", st, s"$w/ckpt")
    assert(q.awaitTermination(120000L), "mv stream did not drain")
    // group b fully retracted -> dropped; a reflects the update
    assert(view(st) == Set(("a", 2L, 13.0, 6.5)))
    // rebuild law
    val rebuilt = IncrementalAgg.reportSums(IncrementalAgg.sumState(
        Upsert.readManifested(spark, tbl), grp, "v"), grp)
      .select($"part", $"n", round($"total", 4).as("t"),
        round($"mean", 6).as("m"))
      .as[(String, Long, Double, Double)].collect().toSet
    assert(view(st) == rebuilt)
    // a REPLAYED batch id must be fenced — re-applying the same feed
    // rows would double-retract
    val lastId = MvSink.lastAppliedBatch(spark, st).get
    MvSink.applyBatch(spark,
      graft.operators.StagedCommit.readCommitted(spark, feed),
      lastId, grp, "v", st)
    assert(view(st) == rebuilt)
  }

  test("kill between the state write and its marker: the version is " +
      "invisible; the retry rewrites and lands it once") {
    val w = java.nio.file.Files.createTempDirectory("graft_mvk").toString
    val tbl = s"$w/tbl"; val st = s"$w/state"
    Upsert.mergeIntoManifested(spark, tbl,
      rows((1, "a", 1.0, 1)), keys, "part", "ver", retain = 8)
    MvSink.seed(Upsert.readManifestedAt(spark, tbl, 0), grp, "v", st)
    val batch = Seq(("a", 1L, 1.0, "update_preimage"),
      ("a", 1L, 9.0, "update_postimage"))
      .toDF("part", "k", "v", "_change_type")
    graft.FailPoint.arm("mv_after_state_write")
    try intercept[graft.FailPoint.Kill] {
      MvSink.applyBatch(spark, batch, 0L, grp, "v", st)
    } finally graft.FailPoint.disarm()
    // unmarked version is invisible: the view still serves the seed
    assert(view(st) == Set(("a", 1L, 1.0, 1.0)))
    // retry of the SAME batch id converges exactly once
    MvSink.applyBatch(spark, batch, 0L, grp, "v", st)
    assert(view(st) == Set(("a", 1L, 9.0, 9.0)))
    MvSink.applyBatch(spark, batch, 0L, grp, "v", st)
    assert(view(st) == Set(("a", 1L, 9.0, 9.0)))
  }

  test("multi-measure streaming MV: min/max survive a delete that " +
      "retires the extremum (repair from the live table), through a " +
      "REAL feed stream") {
    val w = java.nio.file.Files.createTempDirectory("graft_mvm").toString
    val tbl = s"$w/tbl"; val feed = s"$w/feed"; val st = s"$w/state"
    val cols = Seq("v")
    Upsert.mergeIntoManifested(spark, tbl,
      rows((1, "a", 1.0, 1), (2, "a", 9.0, 1), (3, "a", 4.0, 1)),
      keys, "part", "ver", retain = 8)
    MvSink.seedMulti(Upsert.readManifestedAt(spark, tbl, 0), grp, cols, st)
    // delete the group max (9.0): the runner-up (4.0) is only
    // recoverable from the table
    Upsert.deleteKeysFromManifested(spark, tbl,
      Seq(("a", 2L)).toDF("part", "k"), keys, "part", retain = 8)
    CdfSource.pollOnce(spark, tbl, keys, feed)
    val q = MvSink.startMulti(
      CdfSource.feedStream(spark, tbl, keys, feed), grp, cols,
      () => Upsert.readManifested(spark, tbl), st, s"$w/ckpt",
      progress = Some((feed, "mvm")))
    assert(q.awaitTermination(120000L), "multi mv stream did not drain")
    val got = MvSink.readViewMulti(spark, st, grp, cols)
      .select($"part", $"n", $"total_v", $"min_v", $"max_v")
      .as[(String, Long, Double, Double, Double)].collect().toSet
    assert(got == Set(("a", 2L, 5.0, 1.0, 4.0)))
    // the progress handshake rode along
    assert(CdfSource.consumerProgress(spark, feed) == Map("mvm" -> 1L))
  }

  test("progress-publish crash window (chaos): a kill between the " +
      "batch marker and the progress publish re-publishes on the " +
      "fenced retry — the fold never re-applies, the feed still " +
      "learns the consumed epoch") {
    val w = java.nio.file.Files.createTempDirectory("graft_mvpw").toString
    val tbl = s"$w/tbl"; val feed = s"$w/feed"; val st = s"$w/state"
    Upsert.mergeIntoManifested(spark, tbl,
      rows((1, "a", 1.0, 1)), keys, "part", "ver", retain = 8)
    MvSink.seed(Upsert.readManifestedAt(spark, tbl, 0), grp, "v", st)
    Upsert.mergeIntoManifested(spark, tbl,
      rows((1, "a", 9.0, 2)), keys, "part", "ver", retain = 8)
    CdfSource.pollOnce(spark, tbl, keys, feed)
    val batch = graft.operators.StagedCommit.readCommitted(spark, feed)
    graft.FailPoint.arm("mv_after_marker")
    try intercept[graft.FailPoint.Kill] {
      MvSink.applyBatch(spark, batch, 0L, grp, "v", st,
        progress = Some((feed, "mvpw")))
    } finally graft.FailPoint.disarm()
    // fold durable, progress LOST in the crash window
    assert(view(st) == Set(("a", 1L, 9.0, 9.0)))
    assert(CdfSource.consumerProgress(spark, feed).isEmpty)
    // the fenced retry must not re-fold — but it MUST re-publish
    MvSink.applyBatch(spark, batch, 0L, grp, "v", st,
      progress = Some((feed, "mvpw")))
    assert(view(st) == Set(("a", 1L, 9.0, 9.0)))
    assert(CdfSource.consumerProgress(spark, feed) == Map("mvpw" -> 1L))
  }

  test("lineage fence: a fresh checkpoint lineage over a stateDir with " +
      "applied batches refuses; a batch-free stateDir adopts it") {
    val w = java.nio.file.Files.createTempDirectory("graft_mvl").toString
    val tbl = s"$w/tbl"; val st = s"$w/state"
    Upsert.mergeIntoManifested(spark, tbl,
      rows((1, "a", 1.0, 1)), keys, "part", "ver", retain = 8)
    MvSink.seed(Upsert.readManifestedAt(spark, tbl, 0), grp, "v", st)
    val batch = Seq(("a", 1L, 2.0, "insert"))
      .toDF("part", "k", "v", "_change_type")
    // seed-only stateDir adopts the first lineage it sees
    MvSink.applyBatch(spark, batch, 0L, grp, "v", st, "lineage-1")
    assert(view(st) == Set(("a", 2L, 3.0, 1.5)))
    // same lineage: replayed id fenced, next id folds
    MvSink.applyBatch(spark, batch, 0L, grp, "v", st, "lineage-1")
    assert(view(st) == Set(("a", 2L, 3.0, 1.5)))
    // a DIFFERENT lineage (fresh/lost checkpoint) renumbers batches
    // from 0 — folding its batch 0 under the old markers would both
    // skip (id collision) and double-apply (feed replay); refuse
    val ex = intercept[IllegalStateException] {
      MvSink.applyBatch(spark, batch, 1L, grp, "v", st, "lineage-2")
    }
    assert(ex.getMessage.contains("lineage"), ex.getMessage)
    assert(view(st) == Set(("a", 2L, 3.0, 1.5)))
    // and the streaming path mints a stable id per checkpoint dir
    val ck = s"$w/ckpt"
    val id1 = MvSink.lineageId(spark, ck)
    assert(MvSink.lineageId(spark, ck) == id1)
    assert(MvSink.lineageId(spark, s"$w/ckpt2") != id1)
  }

  test("mid-RUN rename guard: a rename landing while a LIVE mv tail " +
      "runs fails the query before the fold commits (no null-sum " +
      "corruption); the restarted tail re-pins and converges") {
    val w = java.nio.file.Files.createTempDirectory("graft_mvg").toString
    val tbl = s"$w/tbl"; val feed = s"$w/feed"; val st = s"$w/state"
    Upsert.mergeIntoManifested(spark, tbl,
      rows((1, "a", 1.0, 1), (2, "b", 4.0, 1)),
      keys, "part", "ver", retain = 12)
    MvSink.seed(Upsert.readManifestedAt(spark, tbl, 0), grp, "v", st)
    val q = MvSink.start(
      CdfSource.feedStream(spark, tbl, keys, feed), grp, "v", st,
      s"$w/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("200 milliseconds"),
      guardFeed = Some(feed))
    try {
      Upsert.mergeIntoManifested(spark, tbl,
        rows((1, "a", 5.0, 2)), keys, "part", "ver", retain = 12)
      CdfSource.pollOnce(spark, tbl, keys, feed)
      val deadline = System.currentTimeMillis() + 120000L
      while (!MvSink.readView(spark, st, grp).filter($"part" === "a" &&
          $"total" === 5.0).head(1).nonEmpty) {
        assert(System.currentTimeMillis() < deadline,
          "live mv tail never folded wave 1")
        Thread.sleep(200L)
      }
      // the value column renames while the tail RUNS: its pinned feed
      // projection would fold the next batch's renamed column as null
      // (count moves, sum doesn't — silent corruption); the guard
      // must kill the query with the checkpoint NOT advanced
      Upsert.renameManifestedColumn(spark, tbl, "v", "v2", retain = 12)
      Upsert.mergeIntoManifested(spark, tbl,
        Seq((1L, "a", 9.0, 3L)).toDF("k", "part", "v2", "ver"),
        keys, "part", "ver", retain = 12)
      CdfSource.pollOnce(spark, tbl, keys, feed)
      val ex = intercept[
          org.apache.spark.sql.streaming.StreamingQueryException] {
        q.awaitTermination(120000L)
        ()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e =>
          Option(e.getMessage).toSeq ++ messages(e.getCause))
      assert(messages(ex).exists(_.contains("landed at epoch")),
        messages(ex).mkString(" | "))
    } finally if (q.isActive) q.stop()
    // the restarted tail re-pins the projection (the feed now serves
    // the guarded interval's values under the CURRENT name) and folds
    // the batch it refused
    val q2 = MvSink.start(
      CdfSource.feedStream(spark, tbl, keys, feed), grp, "v2", st,
      s"$w/ckpt", guardFeed = Some(feed))
    assert(q2.awaitTermination(120000L), "restarted mv tail hung")
    assert(view(st) == Set(("a", 1L, 9.0, 9.0), ("b", 1L, 4.0, 4.0)))
  }

  test("a BLANK checkpoint identity file (crash between create and " +
      "write) re-mints instead of silently disabling the lineage fence " +
      "(ADVICE r16)") {
    val w = java.nio.file.Files.createTempDirectory("graft_mvb").toString
    val ck = s"$w/ckpt"
    val p = new org.apache.hadoop.fs.Path(ck, "_graft_mv_app")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(ck))
    fs.create(p, true).close() // the torn artifact: zero bytes
    val id = MvSink.lineageId(spark, ck)
    assert(id.nonEmpty, "blank identity file was honored as a lineage id")
    // healed durably: the re-minted id reads back stable
    assert(MvSink.lineageId(spark, ck) == id)
  }

  test("tailing an unseeded state refuses loudly") {
    val w = java.nio.file.Files.createTempDirectory("graft_mvu").toString
    val batch = Seq(("a", 1L, 1.0, "insert"))
      .toDF("part", "k", "v", "_change_type")
    val ex = intercept[IllegalStateException] {
      MvSink.applyBatch(spark, batch, 0L, grp, "v", s"$w/state")
    }
    assert(ex.getMessage.contains("seed"), ex.getMessage)
  }
}
