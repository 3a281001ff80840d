package graft.streaming

import graft.operators.IncrementalAgg
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit, max}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** STREAMING MATERIALIZED-VIEW MAINTENANCE — the last stage of the
  * incremental-report pipeline: source table → CDF source
  * ([[CdfSource.feedStream]]) → this sink folding each feed
  * micro-batch into persistent (count, sum) group state via
  * [[IncrementalAgg.applyChanges]] — or, via [[startMulti]], into
  * multi-measure state (N sums plus min/max with the bounded
  * recompute-on-retirement repair,
  * [[IncrementalAgg.applyChangesMulti]]). The reference rebuilt its report
  * from the whole table per trigger; this maintains it from the
  * changes alone — per batch the cost is O(|state| + |changed
  * groups|), never the fact table.
  *
  * EXACTLY-ONCE is load-bearing here, not a nicety: the fold
  * RETRACTS pre-images, so re-applying a replayed batch (foreachBatch
  * is at-least-once) would double-retract — unlike the merge sinks,
  * content idempotence cannot save us. Each applied batch therefore
  * publishes a fresh state version dir plus an atomic
  * `_mvstate_b<batchId>` marker: a replayed batch id sees its marker
  * and skips; a crash after the dir write but before the marker
  * rewrites the dir on retry (Overwrite) and then lands the marker —
  * the version is invisible until its marker exists. Readers resolve
  * the highest marker. Old versions are swept keeping two (the same
  * lazy-reader retention floor as the manifested tables).
  *
  * LINEAGE FENCE (ADVICE r15): batch ids are only meaningful within
  * ONE checkpoint lineage — a tail restarted against the same stateDir
  * with a fresh (or lost) checkpoint dir renumbers batches from 0, and
  * bare `_mvstate_b<id>` markers would silently SKIP batches carrying
  * new feed rows (a stale-view wrong answer, not a crash; the Delta
  * idempotent-writes pattern pairs version with txnAppId for exactly
  * this reason). [[start]] therefore mints a lineage id persisted IN
  * the checkpoint dir (`_graft_mv_app` — lives and dies with the
  * checkpoint) and [[applyBatch]] records it in the stateDir
  * (`_mvstate_app`): a mismatch against a stateDir that already has
  * applied batches REFUSES loudly — a fresh checkpoint replays the
  * feed from its beginning, so the only sound recovery is a fresh
  * stateDir reseed (or restoring the original checkpoint).
  *
  * Seed the state from a table snapshot with [[seed]] BEFORE starting
  * the tail (the feed carries changes, not the base population); the
  * seed occupies version marker `_mvstate_seed` below every batch. */
object MvSink {

  private def fsOf(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val BatchMarker = "_mvstate_b(\\d+)".r

  /** Highest applied batch id (None = only the seed, or nothing). */
  def lastAppliedBatch(spark: SparkSession, stateDir: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(stateDir)
    val fs = fsOf(spark, stateDir)
    if (!fs.exists(p)) return None
    val ids = fs.listStatus(p).toSeq.map(_.getPath.getName).collect {
      case BatchMarker(n) => n.toLong
    }
    if (ids.isEmpty) None else Some(ids.max)
  }

  /** The current state (highest published version), or None before
    * any seed. */
  def readState(spark: SparkSession, stateDir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(stateDir)
    val fs = fsOf(spark, stateDir)
    if (!fs.exists(p)) return None
    val hasSeed = fs.exists(new org.apache.hadoop.fs.Path(p, "_mvstate_seed"))
    lastAppliedBatch(spark, stateDir) match {
      case Some(b) => Some(spark.read.parquet(s"$stateDir/mv_b$b"))
      case None if hasSeed => Some(spark.read.parquet(s"$stateDir/mv_seed"))
      case None => None
    }
  }

  /** Presentation view of the current state. */
  def readView(spark: SparkSession, stateDir: String,
               grp: Seq[String]): DataFrame =
    IncrementalAgg.reportSums(readState(spark, stateDir).getOrElse(
      throw new IllegalStateException(s"no MV state under $stateDir")),
      grp)

  /** Seed the state from a base snapshot (idempotent: a second seed
    * while the marker exists is a no-op — reseed into a FRESH dir to
    * rebuild). */
  def seed(snapshot: DataFrame, grp: Seq[String], valCol: String,
           stateDir: String): Unit =
    seedWith(snapshot.sparkSession, stateDir,
      IncrementalAgg.sumState(snapshot, grp, valCol))

  /** Multi-measure seed: N sums plus min/max per value column in ONE
    * state dir ([[IncrementalAgg.multiState]]). */
  def seedMulti(snapshot: DataFrame, grp: Seq[String],
                valCols: Seq[String], stateDir: String): Unit =
    seedWith(snapshot.sparkSession, stateDir,
      IncrementalAgg.multiState(snapshot, grp, valCols))

  private def seedWith(spark: SparkSession, stateDir: String,
                       state: DataFrame): Unit = {
    val fs = fsOf(spark, stateDir)
    val marker = new org.apache.hadoop.fs.Path(stateDir, "_mvstate_seed")
    if (fs.exists(marker)) return
    state.write.mode(SaveMode.Overwrite).parquet(s"$stateDir/mv_seed")
    fs.create(marker, true).close()
  }

  /** Presentation view of a multi-measure state dir. */
  def readViewMulti(spark: SparkSession, stateDir: String,
                    grp: Seq[String], valCols: Seq[String]): DataFrame =
    IncrementalAgg.reportMulti(readState(spark, stateDir).getOrElse(
      throw new IllegalStateException(s"no MV state under $stateDir")),
      grp, valCols)

  /** Tail a CDF feed stream into multi-measure state — [[start]]'s
    * sibling over [[IncrementalAgg.applyChangesMulti]]. `base` is the
    * live post-change table reader the min/max retirement repair reads
    * (dirty groups only). */
  def startMulti(feed: DataFrame, grp: Seq[String], valCols: Seq[String],
                 base: () => DataFrame, stateDir: String,
                 checkpointDir: String,
                 trigger: Trigger = Trigger.AvailableNow(),
                 progress: Option[(String, String)] = None)
      : StreamingQuery =
    startMultiPruned(feed, grp, valCols, _ => base(), stateDir,
      checkpointDir, trigger, progress)

  /** [[startMulti]] with a DIRTY-BOUNDED base reader (VERDICT r16 #1):
    * `baseFor` receives the dirty group-key tuples of the batch being
    * repaired (empty = mass-retirement fallback, return the full
    * table) — pass `rows => Upsert.readManifestedPartitions(...)` so
    * the extremum repair's driver-side manifest listing is bounded by
    * the dirty partitions, not the table's total partition count
    * ([[graft.operators.IncrementalAgg.applyChangesMultiPruned]]). */
  def startMultiPruned(feed: DataFrame, grp: Seq[String],
                 valCols: Seq[String],
                 baseFor: Seq[org.apache.spark.sql.Row] => DataFrame,
                 stateDir: String, checkpointDir: String,
                 trigger: Trigger = Trigger.AvailableNow(),
                 progress: Option[(String, String)] = None,
                 guardFeed: Option[String] = None)
      : StreamingQuery = {
    val spark = feed.sparkSession
    val app = lineageId(spark, checkpointDir)
    // mid-run rename guard (CdfSource.renameGuard): without it a
    // rename landing while this tail runs would fold the renamed
    // column as null — corrupted sums, silently
    val guard = guardFeed.map(fd =>
      CdfSource.renameGuard(spark, fd, "MvSink")).getOrElse(() => ())
    feed.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        guard()
        applyBatchMulti(spark, batch, batchId, grp, valCols, baseFor,
          stateDir, app, progress)
      }
      .start()
  }

  /** The checkpoint dir's lineage id: read if present, minted and
    * persisted on first use — it lives exactly as long as the
    * checkpoint does, which is the property the fence needs (a lost
    * checkpoint is a new lineage BECAUSE its batch numbering restarts). */
  private[streaming] def lineageId(spark: SparkSession,
      checkpointDir: String): String = {
    val p = new org.apache.hadoop.fs.Path(checkpointDir, "_graft_mv_app")
    val fs = fsOf(spark, checkpointDir)
    val recorded: Option[String] =
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val s = try scala.io.Source.fromInputStream(in, "UTF-8")
          .mkString.trim finally in.close()
        // a crash between create and write left an EMPTY identity file
        // (ADVICE r16): foldOnce treats a blank appId as "no fence", so
        // honoring it would silently disable double-apply protection
        // for this checkpoint's whole lifetime — re-mint instead
        if (s.isEmpty) None else Some(s)
      }
    recorded.getOrElse {
      val id = java.util.UUID.randomUUID().toString
      // tmp + atomic rename: the identity must never be readable
      // half-written (the blank-file hazard above, made unreachable)
      val tmp = new org.apache.hadoop.fs.Path(checkpointDir,
        "_graft_mv_app.tmp")
      val out = fs.create(tmp, true)
      try out.write(id.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      if (fs.exists(p)) fs.delete(p, false) // blank leftover
      if (!fs.rename(tmp, p) && !fs.exists(p))
        throw new IllegalStateException(
          s"could not persist MV lineage id under $checkpointDir")
      id
    }
  }

  /** Tail a CDF feed stream into the state. `progress` — optional
    * `(feedDir, consumerId)` — publishes the batch's max `_to_epoch`
    * as this consumer's durably-processed-through marker AFTER each
    * batch's state marker lands ([[CdfSource.publishProgress]]), which
    * is what lets [[CdfSource.pruneFeed]] reclaim consumed intervals
    * safely (VERDICT r15 #3): the marker never runs ahead of the fold
    * it certifies. */
  def start(feed: DataFrame, grp: Seq[String], valCol: String,
            stateDir: String, checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow(),
            progress: Option[(String, String)] = None,
            guardFeed: Option[String] = None): StreamingQuery = {
    val spark = feed.sparkSession
    val app = lineageId(spark, checkpointDir)
    val guard = guardFeed.map(fd =>
      CdfSource.renameGuard(spark, fd, "MvSink")).getOrElse(() => ())
    feed.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        guard()
        applyBatch(spark, batch, batchId, grp, valCol, stateDir, app,
          progress)
      }
      .start()
  }

  /** One batch, exactly once per id within one checkpoint lineage.
    * Public for spec-level chaos; `appId = ""` skips the lineage fence
    * for direct batch callers who own their own replay semantics. */
  private[streaming] def applyBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, grp: Seq[String], valCol: String,
      stateDir: String, appId: String = "",
      progress: Option[(String, String)] = None): Unit =
    foldOnce(spark, batch, batchId, stateDir, appId, progress)(
      cur => IncrementalAgg.applyChanges(cur, grp, valCol, batch))

  /** Multi-measure sibling of [[applyBatch]] (VERDICT r15 #4): folds
    * the feed batch into [[IncrementalAgg.multiState]] state — N sums
    * plus min/max with the bounded recompute-on-retirement repair,
    * which is why it takes `base` (the LIVE post-change table reader;
    * resolved lazily, read only for the dirty groups). */
  private[streaming] def applyBatchMulti(spark: SparkSession,
      batch: DataFrame, batchId: Long, grp: Seq[String],
      valCols: Seq[String],
      baseFor: Seq[org.apache.spark.sql.Row] => DataFrame,
      stateDir: String, appId: String = "",
      progress: Option[(String, String)] = None): Unit =
    foldOnce(spark, batch, batchId, stateDir, appId, progress)(
      cur => IncrementalAgg.applyChangesMultiPruned(cur, grp, valCols,
        batch, baseFor))

  /** The exactly-once version machinery shared by the single- and
    * multi-measure folds: lineage fence, batch-id marker, version dir
    * publish, progress handshake, retention sweep. */
  private def foldOnce(spark: SparkSession, batch: DataFrame,
      batchId: Long, stateDir: String, appId: String,
      progress: Option[(String, String)])
      (fold: DataFrame => DataFrame): Unit = {
    val fs = fsOf(spark, stateDir)
    if (appId.nonEmpty) fenceLineage(spark, stateDir, appId)
    // ONE pass over the feed batch serves both the emptiness probe and
    // the progress epoch (r21, guide §1.2: the old isEmpty + separate
    // max(_to_epoch) agg re-read the batch files as two extra jobs per
    // micro-batch — pure fixed overhead on every drain)
    val wantEpoch = progress.isDefined && batch.columns.contains("_to_epoch")
    val statsRow =
      if (wantEpoch)
        batch.agg(count(lit(1)), max(col("_to_epoch"))).head()
      else batch.agg(count(lit(1))).head()
    val nRows = statsRow.getLong(0)
    def publishProgress(): Unit =
      progress.foreach { case (feedDir, consumerId) =>
        if (wantEpoch && !statsRow.isNullAt(1))
          CdfSource.publishProgress(spark, feedDir, consumerId,
            statsRow.getLong(1))
      }
    val marker =
      new org.apache.hadoop.fs.Path(stateDir, s"_mvstate_b$batchId")
    if (fs.exists(marker)) {
      // replayed batch: already folded — but a crash in the
      // marker→publish window may have lost the PROGRESS update, so
      // re-publish (monotone: a stale epoch no-ops) before skipping.
      // Without this the documented "re-publishes on the fenced
      // retry" claim was false: the early return skipped it, and a
      // final batch's progress could lag until the next mutation.
      publishProgress()
      return
    }
    if (nRows == 0L) return // nothing to fold; no version for nothing
    // INVARIANT GUARD (ADVICE r21 low): the unchecked-pointed fold below
    // is safe only because (a) readState resolves a version STRICTLY
    // BELOW batchId — the write never overwrites a dir its own plan
    // reads — and (b) the sweep retains the fold's input version until
    // this batch's write has materialized. Assert (a) here and (b) at
    // the sweep, so a future readState/retention change fails loudly
    // instead of corrupting a lazy self-read of a reclaimed dir.
    val curVer = lastAppliedBatch(spark, stateDir).getOrElse(-1L)
    require(curVer < batchId,
      s"MV fold at $stateDir: input state version $curVer does not " +
        s"precede batch $batchId — folding would read the dir the " +
        "write overwrites; the lineage fence should have caught this")
    val cur = readState(spark, stateDir).getOrElse(
      throw new IllegalStateException(
        s"MV state at $stateDir was never seeded — call MvSink.seed " +
          "with the base snapshot before tailing the feed"))
    // the write below materializes the fold in its one execution; its
    // target dir mv_b<batchId> is never one of the dirs the fold reads
    // (cur = the highest MARKED version < batchId) nor one the sweep
    // below reclaims (it keeps the newest two) — so the old eager
    // localCheckpoint paid a full second materialization of every
    // batch's fold for a hazard this path cannot hit (r21). The
    // multi-measure fold still checkpoints its group-grain `merged`
    // frame internally where reuse is real.
    val next = fold(cur)
    next.write.mode(SaveMode.Overwrite).parquet(s"$stateDir/mv_b$batchId")
    graft.FailPoint.hit("mv_after_state_write")
    fs.create(marker, true).close()
    graft.FailPoint.hit("mv_after_marker")
    // the fold is durable as of the marker — NOW the feed may learn
    // how far this consumer has processed (a crash before this line
    // re-publishes on the replayed batch's fenced retry — the
    // marker-exists path above re-runs exactly this publish; monotone,
    // so out-of-order publishes are no-ops)
    publishProgress()
    // sweep versions older than the previous one (lazy-reader floor)
    val p = new org.apache.hadoop.fs.Path(stateDir)
    val ids = fs.listStatus(p).toSeq.map(_.getPath.getName).collect {
      case BatchMarker(n) => n.toLong
    }.sorted
    // invariant (b): the fold's input version must survive this sweep
    // (keep-newest-2 keeps it by construction — a retention change that
    // would reclaim the version just folded from fails HERE, loudly)
    require(curVer < 0L || !ids.dropRight(2).contains(curVer),
      s"MV sweep at $stateDir would reclaim version $curVer, the very " +
        "state this batch's fold read — retention must keep at least " +
        "the fold input and its result")
    ids.dropRight(2).foreach { old =>
      fs.delete(new org.apache.hadoop.fs.Path(stateDir, s"mv_b$old"), true)
      fs.delete(new org.apache.hadoop.fs.Path(stateDir, s"_mvstate_b$old"),
        false)
    }
  }

  /** The lineage fence: refuse to fold under a checkpoint lineage
    * other than the one whose batches this stateDir already applied.
    * A stateDir with NO applied batches yet adopts the caller's
    * lineage (first tail after seed, or a tail that crashed before
    * batch 0's marker) — nothing fold-order-sensitive has happened, so
    * re-adoption is safe; that also self-heals a partially-written
    * identity file. */
  private def fenceLineage(spark: SparkSession, stateDir: String,
      appId: String): Unit = {
    val fs = fsOf(spark, stateDir)
    val p = new org.apache.hadoop.fs.Path(stateDir, "_mvstate_app")
    val recorded: Option[String] =
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
        finally in.close()
      }
    if (recorded.contains(appId)) return
    if (lastAppliedBatch(spark, stateDir).isDefined)
      throw new IllegalStateException(
        s"MV state at $stateDir was maintained under checkpoint lineage " +
          s"${recorded.getOrElse("<unrecorded>")}, not $appId — a fresh " +
          "or lost checkpoint renumbers batches from 0 and replays the " +
          "feed from its beginning, so folding on would double-apply " +
          "history (the fold retracts; it is not idempotent). Reseed a " +
          "FRESH stateDir, or restore the original checkpoint dir.")
    val out = fs.create(p, true)
    try out.write(appId.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }
}
