package graft.streaming

import graft.SparkSpec
import graft.operators.Upsert
import org.apache.spark.sql.functions._

/** Replication = CDF source ∘ CDC apply: the replica converges to the
  * source under multi-interval batching (the update-then-delete
  * ordering case), and a restarted tail continues from its checkpoint
  * without re-applying or losing intervals. */
class ReplicateSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("part", "k")

  private def rows(t: (Long, String, Double, Long)*) =
    t.toSeq.toDF("k", "part", "v", "ver")

  private def snap(path: String) =
    Upsert.readManifested(spark, path)
      .select($"k", $"part", $"v", $"ver")
      .as[(Long, String, Double, Long)].collect().toSet

  private def drain(q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    assert(q.awaitTermination(120000L), "apply stream did not drain")

  test("replica equals source, including a key updated then deleted " +
      "in intervals that coalesce into ONE apply micro-batch") {
    val w = java.nio.file.Files.createTempDirectory("graft_repl").toString
    val src = s"$w/src"; val feed = s"$w/feed"; val dst = s"$w/dst"
    Upsert.mergeIntoManifested(spark, src,
      rows((1, "a", 1.0, 1), (2, "a", 2.0, 1), (3, "b", 3.0, 1)),
      keys, "part", "ver", retain = 8)
    assert(Replicate.seed(spark, src, dst, keys, "part") == 0L)
    // interval 1: key 2 updated; interval 2: key 2 DELETED, key 4 born.
    // Both polled before the tail starts -> one micro-batch: only the
    // _to_epoch versioning can order the update under the delete (the
    // source's own ver column ties at 2)
    Upsert.mergeIntoManifested(spark, src,
      rows((2, "a", 20.0, 2)), keys, "part", "ver", retain = 8)
    CdfSource.pollOnce(spark, src, keys, feed)
    Upsert.deleteKeysFromManifested(spark, src,
      Seq(("a", 2L)).toDF("part", "k"), keys, "part", retain = 8)
    Upsert.mergeIntoManifested(spark, src,
      rows((4, "c", 4.0, 1)), keys, "part", "ver", retain = 8)
    CdfSource.pollOnce(spark, src, keys, feed)
    drain(Replicate.start(spark, src, feed, dst, keys, "part",
      s"$w/ckpt"))
    assert(snap(dst) == snap(src))
    assert(snap(dst) == Set((1L, "a", 1.0, 1L), (3L, "b", 3.0, 1L),
      (4L, "c", 4.0, 1L)))

    // continuation: more source churn, another poll, a SECOND tail run
    // on the SAME checkpoint — only the new interval applies
    Upsert.mergeIntoManifested(spark, src,
      rows((1, "a", 10.0, 2), (5, "b", 5.0, 1)), keys, "part", "ver",
      retain = 8)
    CdfSource.pollOnce(spark, src, keys, feed)
    drain(Replicate.start(spark, src, feed, dst, keys, "part",
      s"$w/ckpt"))
    assert(snap(dst) == snap(src))
    // re-draining with nothing new is a content no-op
    drain(Replicate.start(spark, src, feed, dst, keys, "part",
      s"$w/ckpt"))
    assert(snap(dst) == snap(src))
  }

  test("schema evolution mid-tail (VERDICT r15 #5): a source rename " +
      "replays onto the replica at the next drain; a source drop " +
      "freezes the replica column (nulls on churn); a poller killed " +
      "between a drop's spans with a drain inside the crash window " +
      "still converges") {
    val w = java.nio.file.Files.createTempDirectory("graft_repl3").toString
    val src = s"$w/src"; val feed = s"$w/feed"; val dst = s"$w/dst"
    def tail() = drain(Replicate.start(spark, src, feed, dst, keys,
      "part", s"$w/ckpt"))
    Upsert.mergeIntoManifested(spark, src,
      rows((1, "a", 1.0, 1), (2, "a", 2.0, 1), (3, "b", 3.0, 1)),
      keys, "part", "ver", retain = 12)
    Replicate.seed(spark, src, dst, keys, "part")
    // churn consumed under the OLD name
    Upsert.mergeIntoManifested(spark, src,
      rows((1, "a", 10.0, 2)), keys, "part", "ver", retain = 12)
    CdfSource.pollOnce(spark, src, keys, feed)
    tail()
    // RENAME v -> w on the source, churn under the new name: the next
    // drain replays the rename onto the replica (one value lineage,
    // one column name, both sides) and lands the new wave under it
    Upsert.renameManifestedColumn(spark, src, "v", "w", retain = 12)
    Upsert.mergeIntoManifested(spark, src,
      Seq((2L, "a", 20.0, 2L)).toDF("k", "part", "w", "ver"),
      keys, "part", "ver", retain = 12)
    CdfSource.pollOnce(spark, src, keys, feed)
    tail()
    val dstCols = Upsert.manifestedSchema(spark, dst).get.fieldNames
    assert(dstCols.contains("w") && !dstCols.contains("v"))
    assert(Upsert.readManifested(spark, dst)
      .select($"k", $"part", $"w", $"ver")
      .as[(Long, String, Double, Long)].collect().toSet ==
      Set((1L, "a", 10.0, 2L), (2L, "a", 20.0, 2L), (3L, "b", 3.0, 1L)))
    // churn under w, then DROP w, then a post-drop wave carrying a NEW
    // column — and the poller dies BETWEEN the drop's two spans while
    // the tail drains inside the crash window
    Upsert.mergeIntoManifested(spark, src,
      Seq((1L, "a", 30.0, 3L)).toDF("k", "part", "w", "ver"),
      keys, "part", "ver", retain = 12)
    Upsert.dropManifestedColumn(spark, src, "w", retain = 12)
    Upsert.mergeIntoManifested(spark, src,
      Seq((3L, "b", "t3", 2L)).toDF("k", "part", "tag", "ver"),
      keys, "part", "ver", retain = 12)
    graft.FailPoint.arm("cdf_between_spans")
    try intercept[graft.FailPoint.Kill] {
      CdfSource.pollOnce(spark, src, keys, feed)
    } finally graft.FailPoint.disarm()
    tail() // consumes span 1 (the pre-drop churn) mid-crash-window
    // span 1 APPLIED (ver 3), but its w value is retired at
    // CONSUMPTION time: the drop already landed before the drain, the
    // feed serves the source's current (w-less) schema, and the
    // source's head no longer holds the value either — the documented
    // consumption-time retirement contract
    assert(Upsert.readManifested(spark, dst)
      .filter($"k" === 1L).select($"w", $"ver")
      .as[(Option[Double], Long)].head() == ((None, 3L)))
    // the resumed poll re-derives the remaining span from the
    // artifact checkpoint; the drained replica converges: tag arrives
    // via add-evolution, the dropped w stays FROZEN — null on churned
    // rows, last PRE-DROP-CONSUMED values elsewhere
    assert(CdfSource.pollOnce(spark, src, keys, feed).isDefined)
    tail()
    val fin = Upsert.readManifested(spark, dst)
      .select($"k", $"part", $"w", $"tag", $"ver")
      .as[(Long, String, Option[Double], Option[String], Long)]
      .collect().toSet
    assert(fin == Set(
      (1L, "a", None, None, 3L),
      (2L, "a", Some(20.0), None, 2L),
      (3L, "b", None, Some("t3"), 2L)))
    // and the replica matches the source on the source's LIVE columns
    val srcNow = Upsert.readManifested(spark, src)
      .select($"k", $"part", $"tag", $"ver")
      .as[(Long, String, Option[String], Long)].collect().toSet
    val dstNow = Upsert.readManifested(spark, dst)
      .select($"k", $"part", $"tag", $"ver")
      .as[(Long, String, Option[String], Long)].collect().toSet
    assert(srcNow == dstNow)
  }

  test("mid-RUN rename guard: a rename landing while a LIVE tail runs " +
      "fails the query before the batch commits (no null-clobber); " +
      "the restarted tail replays the rename and converges") {
    val w = java.nio.file.Files.createTempDirectory("graft_repl4").toString
    val src = s"$w/src"; val feed = s"$w/feed"; val dst = s"$w/dst"
    Upsert.mergeIntoManifested(spark, src,
      rows((1, "a", 1.0, 1)), keys, "part", "ver", retain = 12)
    Replicate.seed(spark, src, dst, keys, "part")
    val q = Replicate.start(spark, src, feed, dst, keys, "part",
      s"$w/ckpt", trigger = org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("200 milliseconds"))
    try {
      Upsert.mergeIntoManifested(spark, src,
        rows((1, "a", 5.0, 2)), keys, "part", "ver", retain = 12)
      CdfSource.pollOnce(spark, src, keys, feed)
      val deadline = System.currentTimeMillis() + 120000L
      while (Upsert.readManifested(spark, dst)
          .filter($"k" === 1L && $"v" === 5.0).isEmpty) {
        assert(System.currentTimeMillis() < deadline,
          "live tail never applied wave 1")
        Thread.sleep(200L)
      }
      // the rename lands while the tail RUNS: its pinned schema would
      // read the next batch's renamed column as null and clobber the
      // replica — the guard must kill the query with the checkpoint
      // NOT advanced
      Upsert.renameManifestedColumn(spark, src, "v", "w", retain = 12)
      Upsert.mergeIntoManifested(spark, src,
        Seq((1L, "a", 9.0, 3L)).toDF("k", "part", "w", "ver"),
        keys, "part", "ver", retain = 12)
      CdfSource.pollOnce(spark, src, keys, feed)
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
    // the restart re-pins the schema, replays the rename onto the
    // replica (syncRenames), and re-processes the guarded batch
    drain(Replicate.start(spark, src, feed, dst, keys, "part",
      s"$w/ckpt"))
    val fin = Upsert.readManifested(spark, dst)
      .select($"k", $"part", $"w", $"ver")
      .as[(Long, String, Double, Long)].collect().toSet
    assert(fin == Set((1L, "a", 9.0, 3L)))
  }

  test("mid-RUN widen guard (VERDICT r17 #4): a type widening landing " +
      "while a LIVE tail runs fails the query before the batch commits " +
      "(the pinned narrow schema cannot read the wider files); the " +
      "restarted tail re-pins wide and converges") {
    val w = java.nio.file.Files.createTempDirectory("graft_repl5").toString
    val src = s"$w/src"; val feed = s"$w/feed"; val dst = s"$w/dst"
    def intRows(t: (Long, String, Int, Long)*) =
      t.toSeq.toDF("k", "part", "v", "ver")
    Upsert.mergeIntoManifested(spark, src,
      intRows((1L, "a", 1, 1L)), keys, "part", "ver", retain = 12)
    Replicate.seed(spark, src, dst, keys, "part")
    val q = Replicate.start(spark, src, feed, dst, keys, "part",
      s"$w/ckpt", trigger = org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("200 milliseconds"))
    try {
      Upsert.mergeIntoManifested(spark, src,
        intRows((1L, "a", 5, 2L)), keys, "part", "ver", retain = 12)
      CdfSource.pollOnce(spark, src, keys, feed)
      val deadline = System.currentTimeMillis() + 120000L
      while (Upsert.readManifested(spark, dst)
          .filter($"k" === 1L && $"v" === 5).isEmpty) {
        assert(System.currentTimeMillis() < deadline,
          "live tail never applied wave 1")
        Thread.sleep(200L)
      }
      // the WIDENING lands while the tail runs: post-widen feed files
      // store int64 the pinned int32 schema cannot read — the guard
      // must fail the query with the checkpoint NOT advanced, before
      // the scan ever hits the unconvertible file
      Upsert.mergeIntoManifested(spark, src,
        Seq((2L, "a", 3000000007L, 3L)).toDF("k", "part", "v", "ver"),
        keys, "part", "ver", retain = 12)
      CdfSource.pollOnce(spark, src, keys, feed)
      val ex = intercept[
          org.apache.spark.sql.streaming.StreamingQueryException] {
        q.awaitTermination(120000L)
        ()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e =>
          Option(e.getMessage).toSeq ++ messages(e.getCause))
      assert(messages(ex).exists(_.contains("widening landed")),
        messages(ex).mkString(" | "))
    } finally if (q.isActive) q.stop()
    // the restart pins the WIDE schema; the replica's merge widens via
    // add-and-widen evolution; pre-widen history upcasts in the scan
    drain(Replicate.start(spark, src, feed, dst, keys, "part",
      s"$w/ckpt"))
    val fin = Upsert.readManifested(spark, dst)
      .select($"k", $"part", $"v", $"ver")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(fin == Set((1L, "a", 5L, 2L), (2L, "a", 3000000007L, 3L)))
    assert(Upsert.manifestedSchema(spark, dst).get("v").dataType ==
      org.apache.spark.sql.types.LongType)
  }

  test("seed-then-tail overlap is harmless: a feed replaying history " +
      "from table creation cannot regress the seeded snapshot") {
    val w = java.nio.file.Files.createTempDirectory("graft_repl2").toString
    val src = s"$w/src"; val feed = s"$w/feed"; val dst = s"$w/dst"
    Upsert.mergeIntoManifested(spark, src,
      rows((1, "a", 1.0, 1)), keys, "part", "ver", retain = 8)
    // interval (0,1) polled BEFORE the later wave exists: its
    // postimage (5.0 at feed epoch 1) is genuinely OLDER data than the
    // epoch-2 snapshot the replica will be seeded with
    Upsert.mergeIntoManifested(spark, src,
      rows((1, "a", 5.0, 2), (2, "a", 2.0, 1)), keys, "part", "ver",
      retain = 8)
    CdfSource.pollOnce(spark, src, keys, feed)
    Upsert.mergeIntoManifested(spark, src,
      rows((1, "a", 9.0, 3)), keys, "part", "ver", retain = 8)
    CdfSource.pollOnce(spark, src, keys, feed)
    assert(CdfSource.lastFedEpoch(spark, feed).contains(2L))
    // seed at the head (epoch 2 -> key 1 = 9.0), then tail the WHOLE
    // feed from creation: the stale (0,1) interval must lose the
    // max-_to_epoch resolution to the seed, never regress key 1 to 5.0
    assert(Replicate.seed(spark, src, dst, keys, "part") == 2L)
    drain(Replicate.start(spark, src, feed, dst, keys, "part",
      s"$w/ckpt"))
    assert(snap(dst) == snap(src))
    assert(snap(dst) == Set((1L, "a", 9.0, 3L), (2L, "a", 2.0, 1L)))
  }
}
