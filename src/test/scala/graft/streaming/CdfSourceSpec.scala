package graft.streaming

import graft.SparkSpec
import graft.operators.Upsert
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The streaming CDF source (VERDICT r14 #2): the feed artifact is its
  * own checkpoint, polls are exactly-once per interval, the crash
  * window self-heals, renames compose mid-stream, drops refuse, and
  * the rate-driven pump feeds without manual polling. */
class CdfSourceSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("part", "k")

  private def rows(t: (Long, String, Double, Long)*) =
    t.toSeq.toDF("k", "part", "v", "ver")

  private def work(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("pollOnce feeds exactly the new interval each time; idle polls " +
      "no-op; the feed equals the batch CDF; redelivered polls are " +
      "once-ever via the interval token") {
    val w = work("graft_cdfs")
    val tbl = s"$w/tbl"; val feed = s"$w/feed"
    // an idle poll against a not-yet-created table is a clean no-op
    assert(CdfSource.pollOnce(spark, tbl, keys, feed).isEmpty)
    Upsert.mergeIntoManifested(spark, tbl,
      rows((1, "a", 1.0, 1), (2, "a", 2.0, 1), (3, "b", 3.0, 1)),
      keys, "part", "ver", retain = 6)
    // epoch 0 is the feed's BASE SNAPSHOT (consumers read it once via
    // readManifestedAt/readManifested): a fresh feed on a table still
    // at epoch 0 is up to date, not a zero-width interval
    assert(CdfSource.pollOnce(spark, tbl, keys, feed).isEmpty)
    assert(CdfSource.lastFedEpoch(spark, feed).isEmpty)
    Upsert.mergeIntoManifested(spark, tbl,
      rows((1, "a", 10.0, 2)), keys, "part", "ver", retain = 6)
    assert(CdfSource.pollOnce(spark, tbl, keys, feed)
      .contains((0L, 1L)))
    Upsert.deleteKeysFromManifested(spark, tbl,
      Seq(("b", 3L)).toDF("part", "k"), keys, "part", retain = 6)
    assert(CdfSource.pollOnce(spark, tbl, keys, feed)
      .contains((1L, 2L)))
    // up to date: poll is None and the checkpoint does not move
    assert(CdfSource.pollOnce(spark, tbl, keys, feed).isEmpty)
    assert(CdfSource.lastFedEpoch(spark, feed).contains(2L))
    val got = graft.operators.StagedCommit.readCommitted(spark, feed)
      .select($"k", $"part", $"v", $"ver", $"_change_type",
        $"_from_epoch", $"_to_epoch")
      .as[(Long, String, Double, Long, String, Long, Long)]
      .collect().toSet
    assert(got == Set(
      (1L, "a", 1.0, 1L, "update_preimage", 0L, 1L),
      (1L, "a", 10.0, 2L, "update_postimage", 0L, 1L),
      (3L, "b", 3.0, 1L, "delete", 1L, 2L)))
    // the fanout cap holds: a one-file interval writes exactly one
    // parquet file, however many shuffle partitions the diff join had
    Upsert.mergeIntoManifested(spark, tbl,
      rows((1, "a", 11.0, 3)), keys, "part", "ver", retain = 6)
    assert(CdfSource.pollOnce(spark, tbl, keys, feed,
      maxFilesPerInterval = 1).contains((2L, 3L)))
    val fs = new org.apache.hadoop.fs.Path(feed)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(new org.apache.hadoop.fs.Path(feed))
      .map(_.getPath.getName)
      .count(n => n.startsWith("delta_cdf_2_3_") && n.endsWith(".parquet"))
    assert(parts == 1, s"expected 1 part file, saw $parts")
  }

  test("the feed drains as a REAL file stream whose sink equals the " +
      "committed feed; a crashed poll's unmarked files are swept and " +
      "never fed") {
    val w = work("graft_cdfs2")
    val tbl = s"$w/tbl"; val feed = s"$w/feed"
    Upsert.mergeIntoManifested(spark, tbl,
      rows((1, "a", 1.0, 1), (3, "b", 3.0, 1)), keys, "part", "ver",
      retain = 6)
    Upsert.mergeIntoManifested(spark, tbl,
      rows((1, "a", 5.0, 2)), keys, "part", "ver", retain = 6)
    // simulate a poller killed mid-append: a committed-NAMED feed file
    // without its marker (content chosen to be visibly wrong)
    val fs = new org.apache.hadoop.fs.Path(feed)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(feed))
    Seq((99L, "zz", 99.0, 9L, "insert", 0L, 9L))
      .toDF("k", "part", "v", "ver", "_change_type", "_from_epoch",
        "_to_epoch")
      .coalesce(1).write.mode("overwrite").parquet(s"$w/ghost")
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(s"$w/ghost"))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    fs.rename(part, new org.apache.hadoop.fs.Path(feed,
      "delta_cdf_0_9_00000.parquet"))
    // the next poll sweeps the ghost, then commits the real interval
    assert(CdfSource.pollOnce(spark, tbl, keys, feed).contains((0L, 1L)))
    val sink = s"$w/sink"
    val q = CdfSource.feedStream(spark, tbl, keys, feed).writeStream
      .option("checkpointLocation", s"$w/ckpt")
      .trigger(Trigger.AvailableNow())
      .format("parquet").option("path", sink).start()
    assert(q.awaitTermination(120000L), "stream did not drain")
    val got = spark.read.parquet(sink)
      .select($"k", $"part", $"v", $"ver", $"_change_type")
      .as[(Long, String, Double, Long, String)].collect().toSet
    assert(got == Set(
      (1L, "a", 1.0, 1L, "update_preimage"),
      (1L, "a", 5.0, 2L, "update_postimage")))
  }

  test("a rename inside a polled interval composes (feed under the new " +
      "name); a drop splits the poll into drop-free spans") {
    val w = work("graft_cdfs3")
    val tbl = s"$w/tbl"; val feed = s"$w/feed"
    Upsert.mergeIntoManifested(spark, tbl,
      rows((1, "a", 1.0, 1)), keys, "part", "ver", retain = 8)
    CdfSource.pollOnce(spark, tbl, keys, feed)
    Upsert.renameManifestedColumn(spark, tbl, "v", "w", retain = 8)
    Upsert.mergeIntoManifested(spark, tbl,
      Seq((1L, "a", 2.0, 2L)).toDF("k", "part", "w", "ver"),
      keys, "part", "ver", retain = 8)
    assert(CdfSource.pollOnce(spark, tbl, keys, feed).contains((0L, 2L)))
    val fed = graft.operators.StagedCommit.readCommitted(spark, feed)
    // pre-rename interval files carry `v`; the composed interval `w` —
    // read each interval under its own columns
    val last = fed.filter($"_to_epoch" === 2L)
      .select($"k", $"w", $"_change_type")
      .as[(Long, Double, String)].collect().toSet
    assert(last == Set((1L, 1.0, "update_preimage"),
      (1L, 2.0, "update_postimage")))
    // drop `w` (epoch 3) then a post-drop wave (epoch 4): the poll's
    // interval crosses the drop and must feed TWO spans — the batch
    // changesBetween refuses this interval (MergeManifestSpec), the
    // pump composes it
    Upsert.dropManifestedColumn(spark, tbl, "w", retain = 8)
    Upsert.mergeIntoManifested(spark, tbl,
      Seq((2L, "a", "fresh", 1L)).toDF("k", "part", "tag", "ver"),
      keys, "part", "ver", retain = 8)
    intercept[IllegalStateException] {
      Upsert.changesBetween(spark, tbl, 2L, 4L, keys)
    }
    assert(CdfSource.pollOnce(spark, tbl, keys, feed).contains((2L, 4L)))
    assert(CdfSource.lastFedEpoch(spark, feed).contains(4L))
    // span 1 (2 -> 2): zero-width, skipped; the drop flip (2 -> 3) is
    // metadata-only; span 2 (3 -> 4) carries the post-drop insert
    val span2 = graft.operators.StagedCommit
      .readDelta(spark, feed, "cdf_3_4").get
      .select($"k", $"tag", $"_change_type")
      .as[(Long, String, String)].collect().toSet
    assert(span2 == Set((2L, "fresh", "insert")))
    // idle again after the split feed
    assert(CdfSource.pollOnce(spark, tbl, keys, feed).isEmpty)
  }

  test("feedStream serves renamed history with VALUES under the new " +
      "name (schema-versioned feed); a drop + re-add of the spelling " +
      "nulls history below the lineage start — retired values never " +
      "resurface") {
    val w = work("graft_cdfs6")
    val tbl = s"$w/tbl"; val feed = s"$w/feed"
    Upsert.mergeIntoManifested(spark, tbl,
      rows((1, "a", 1.0, 1), (2, "a", 2.0, 1)), keys, "part", "ver",
      retain = 12)
    Upsert.mergeIntoManifested(spark, tbl,
      rows((1, "a", 5.0, 2)), keys, "part", "ver", retain = 12)
    CdfSource.pollOnce(spark, tbl, keys, feed) // (0,1] fed under `v`
    Upsert.renameManifestedColumn(spark, tbl, "v", "w", retain = 12) // ep 2
    Upsert.mergeIntoManifested(spark, tbl,
      Seq((2L, "a", 7.0, 2L)).toDF("k", "part", "w", "ver"),
      keys, "part", "ver", retain = 12) // ep 3
    CdfSource.pollOnce(spark, tbl, keys, feed) // (1,3] fed under `w`
    val sink1 = s"$w/sink1"
    val q1 = CdfSource.feedStream(spark, tbl, keys, feed).writeStream
      .option("checkpointLocation", s"$w/ckpt1")
      .trigger(Trigger.AvailableNow())
      .format("parquet").option("path", sink1).start()
    assert(q1.awaitTermination(120000L), "stream 1 did not drain")
    val got1 = spark.read.parquet(sink1)
      .select($"k", $"w", $"ver", $"_change_type", $"_to_epoch")
      .as[(Long, Option[Double], Long, String, Long)].collect().toSet
    // the (0,1] rows live in OLD-name (`v`) files: the pre-r16 pinned
    // read served null here — they must carry their VALUES under `w`
    assert(got1 == Set(
      (1L, Some(1.0), 1L, "update_preimage", 1L),
      (1L, Some(5.0), 2L, "update_postimage", 1L),
      (2L, Some(2.0), 1L, "update_preimage", 3L),
      (2L, Some(7.0), 2L, "update_postimage", 3L)))
    // now DROP `w` (ep 4) and RE-ADD the same spelling (ep 5): the
    // current `w` is a DIFFERENT column, so a fresh drain must null
    // everything below the drop epoch — v/w history would otherwise
    // resurface retired values under the re-added name
    Upsert.dropManifestedColumn(spark, tbl, "w", retain = 12)
    Upsert.mergeIntoManifested(spark, tbl,
      Seq((1L, "a", 100.0, 3L)).toDF("k", "part", "w", "ver"),
      keys, "part", "ver", retain = 12)
    assert(CdfSource.pollOnce(spark, tbl, keys, feed).contains((3L, 5L)))
    val sink2 = s"$w/sink2"
    val q2 = CdfSource.feedStream(spark, tbl, keys, feed).writeStream
      .option("checkpointLocation", s"$w/ckpt2")
      .trigger(Trigger.AvailableNow())
      .format("parquet").option("path", sink2).start()
    assert(q2.awaitTermination(120000L), "stream 2 did not drain")
    val got2 = spark.read.parquet(sink2)
      .select($"k", $"w", $"ver", $"_change_type", $"_to_epoch")
      .as[(Long, Option[Double], Long, String, Long)].collect().toSet
    assert(got2 == Set(
      (1L, None, 1L, "update_preimage", 1L),
      (1L, None, 2L, "update_postimage", 1L),
      (2L, None, 1L, "update_preimage", 3L),
      (2L, None, 2L, "update_postimage", 3L),
      (1L, None, 2L, "update_preimage", 5L),
      (1L, Some(100.0), 3L, "update_postimage", 5L)))
  }

  test("pruneFeed reclaims consumed intervals but never the newest " +
      "token — the checkpoint survives any prune") {
    val w = work("graft_cdfs5")
    val tbl = s"$w/tbl"; val feed = s"$w/feed"
    Upsert.mergeIntoManifested(spark, tbl,
      rows((1, "a", 1.0, 1)), keys, "part", "ver", retain = 8)
    (2 to 4).foreach { v =>
      Upsert.mergeIntoManifested(spark, tbl,
        rows((1, "a", v.toDouble, v.toLong)), keys, "part", "ver",
        retain = 8)
      CdfSource.pollOnce(spark, tbl, keys, feed)
    }
    // three committed intervals: (0,1), (1,2), (2,3)
    assert(CdfSource.lastFedEpoch(spark, feed).contains(3L))
    // consumers durably past epoch 2: intervals ending <= 2 reclaim
    assert(CdfSource.pruneFeed(spark, feed, consumedThrough = 2L) == 2)
    assert(CdfSource.lastFedEpoch(spark, feed).contains(3L))
    val left = graft.operators.StagedCommit.readCommitted(spark, feed)
      .select($"_from_epoch", $"_to_epoch")
      .as[(Long, Long)].collect().toSet
    assert(left == Set((2L, 3L)))
    // over-eager prune: the newest token survives regardless, so the
    // poller's checkpoint never regresses
    assert(CdfSource.pruneFeed(spark, feed, consumedThrough = 99L) == 0)
    assert(CdfSource.lastFedEpoch(spark, feed).contains(3L))
    // the pump keeps feeding cleanly after a prune
    Upsert.mergeIntoManifested(spark, tbl,
      rows((1, "a", 9.0, 9)), keys, "part", "ver", retain = 8)
    assert(CdfSource.pollOnce(spark, tbl, keys, feed).contains((3L, 4L)))
  }

  test("consumer-progress handshake: an eager prune is clamped to the " +
      "slowest registered consumer; the no-arg prune reclaims exactly " +
      "the consumed set") {
    val w = work("graft_cdfs7")
    val tbl = s"$w/tbl"; val feed = s"$w/feed"
    Upsert.mergeIntoManifested(spark, tbl,
      rows((1, "a", 1.0, 1)), keys, "part", "ver", retain = 8)
    (2 to 4).foreach { v =>
      Upsert.mergeIntoManifested(spark, tbl,
        rows((1, "a", v.toDouble, v.toLong)), keys, "part", "ver",
        retain = 8)
      CdfSource.pollOnce(spark, tbl, keys, feed)
    }
    // intervals (0,1),(1,2),(2,3); a no-consumer no-arg prune refuses
    assert(CdfSource.pruneFeed(spark, feed) == 0)
    CdfSource.publishProgress(spark, feed, "fast", 3L)
    CdfSource.publishProgress(spark, feed, "slow", 1L)
    assert(CdfSource.consumerProgress(spark, feed) ==
      Map("fast" -> 3L, "slow" -> 1L))
    // an EAGER prune (caller claims 99) is clamped to the lagging
    // consumer: only (0,1) reclaims; (1,2) stays readable for `slow`
    assert(CdfSource.pruneFeed(spark, feed, consumedThrough = 99L) == 1)
    val left = graft.operators.StagedCommit.readCommitted(spark, feed)
      .select($"_from_epoch", $"_to_epoch")
      .as[(Long, Long)].collect().toSet
    assert(left == Set((1L, 2L), (2L, 3L)))
    // monotone publish: a stale epoch is a no-op
    CdfSource.publishProgress(spark, feed, "slow", 2L)
    CdfSource.publishProgress(spark, feed, "slow", 1L)
    assert(CdfSource.consumerProgress(spark, feed)("slow") == 2L)
    assert(CdfSource.pruneFeed(spark, feed) == 1) // reclaims (1,2)
    // all consumers past the head: the newest token still survives
    CdfSource.publishProgress(spark, feed, "slow", 3L)
    assert(CdfSource.pruneFeed(spark, feed) == 0)
    assert(CdfSource.lastFedEpoch(spark, feed).contains(3L))
  }

  test("the live pump polls on its own ticks: mutations land in the " +
      "feed without manual pollOnce calls") {
    val w = work("graft_cdfs4")
    val tbl = s"$w/tbl"; val feed = s"$w/feed"
    Upsert.mergeIntoManifested(spark, tbl,
      rows((1, "a", 1.0, 1)), keys, "part", "ver", retain = 6)
    val q = CdfSource.start(spark, tbl, keys, feed, s"$w/pumpckpt",
      trigger = Trigger.ProcessingTime("200 milliseconds"))
    try {
      def awaitFed(to: Long): Unit = {
        val deadline = System.currentTimeMillis() + 120000L
        while (!CdfSource.lastFedEpoch(spark, feed).exists(_ >= to)) {
          assert(System.currentTimeMillis() < deadline,
            s"pump never fed epoch $to")
          Thread.sleep(100L)
        }
      }
      Upsert.mergeIntoManifested(spark, tbl,
        rows((1, "a", 7.0, 2)), keys, "part", "ver", retain = 6)
      awaitFed(1L)
    } finally q.stop()
    val got = graft.operators.StagedCommit.readCommitted(spark, feed)
      .filter($"_change_type" =!= "insert")
      .select($"k", $"v", $"ver", $"_change_type")
      .as[(Long, Double, Long, String)].collect().toSet
    assert(got == Set(
      (1L, 1.0, 1L, "update_preimage"),
      (1L, 7.0, 2L, "update_postimage")))
  }

  test("a TORN _cdfmeta file (crash between create and close) heals on " +
      "the retried poll instead of being skipped forever (ADVICE r16)") {
    val w = work("graft_cdfs7")
    val tbl = s"$w/tbl"; val feed = s"$w/feed"
    Upsert.mergeIntoManifested(spark, tbl,
      rows((1, "a", 1.0, 1)), keys, "part", "ver", retain = 8)
    Upsert.renameManifestedColumn(spark, tbl, "v", "w", retain = 8)
    Upsert.mergeIntoManifested(spark, tbl,
      Seq((1L, "a", 2.0, 2L)).toDF("k", "part", "w", "ver"),
      keys, "part", "ver", retain = 8)
    // plant the crash artifact: an EMPTY meta file for the rename's
    // epoch — the pre-fix exists-guard would skip it on the retry,
    // permanently losing the rename from the feed's lineage projection
    val fp = new org.apache.hadoop.fs.Path(feed)
    val fs = fp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(fp)
    fs.create(new org.apache.hadoop.fs.Path(fp, "_cdfmeta_1"), true)
      .close()
    assert(CdfSource.pollOnce(spark, tbl, keys, feed).contains((0L, 2L)))
    val evs = CdfSource.feedEvents(spark, feed)
    assert(evs.exists { case (e, kind, a, b) =>
      e == 1L && kind == "rename" && a.equalsIgnoreCase("v") &&
        b.equalsIgnoreCase("w")
    }, s"torn meta was not rewritten: $evs")
    // and no .tmp staging leftovers linger beside the feed
    assert(!fs.listStatus(fp).exists(_.getPath.getName.endsWith(".tmp")))
  }

  test("the CDF feed rides the SHARDED manifest tree (r19): polls, " +
      "deletes, and the committed feed are identical with the shard " +
      "threshold forced low — the tree is invisible to the feed plane") {
    val saved = Upsert.EpochManifest.shardThreshold
    Upsert.EpochManifest.shardThreshold = 1
    try {
      val w = work("graft_cdfsv2")
      val tbl = s"$w/tbl"; val feed = s"$w/feed"
      Upsert.mergeIntoManifested(spark, tbl,
        rows((1, "a", 1.0, 1), (2, "a", 2.0, 1), (3, "b", 3.0, 1)),
        keys, "part", "ver", retain = 6)
      // sanity: the table really is sharded
      val rootLines = {
        val m = new java.io.File(tbl).listFiles()
          .filter(_.getName.matches("_manifest_\\d+"))
          .maxBy(_.getName.stripPrefix("_manifest_").toInt)
        scala.io.Source.fromFile(m).getLines().toSeq
      }
      assert(rootLines.exists(_.startsWith("#leafn\t")))
      assert(CdfSource.pollOnce(spark, tbl, keys, feed).isEmpty)
      Upsert.mergeIntoManifested(spark, tbl,
        rows((1, "a", 10.0, 2)), keys, "part", "ver", retain = 6)
      assert(CdfSource.pollOnce(spark, tbl, keys, feed)
        .contains((0L, 1L)))
      Upsert.deleteKeysFromManifested(spark, tbl,
        Seq(("b", 3L)).toDF("part", "k"), keys, "part", retain = 6)
      assert(CdfSource.pollOnce(spark, tbl, keys, feed)
        .contains((1L, 2L)))
      assert(CdfSource.pollOnce(spark, tbl, keys, feed).isEmpty)
      val got = graft.operators.StagedCommit.readCommitted(spark, feed)
        .select($"k", $"part", $"v", $"ver", $"_change_type",
          $"_from_epoch", $"_to_epoch")
        .as[(Long, String, Double, Long, String, Long, Long)]
        .collect().toSet
      assert(got == Set(
        (1L, "a", 1.0, 1L, "update_preimage", 0L, 1L),
        (1L, "a", 10.0, 2L, "update_postimage", 0L, 1L),
        (3L, "b", 3.0, 1L, "delete", 1L, 2L)))
    } finally Upsert.EpochManifest.shardThreshold = saved
  }
}
