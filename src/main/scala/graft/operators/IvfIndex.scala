package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque staleness token for an index and the artifacts derived from
  * it. `buildToken` is fresh per (re)train — a derived artifact recorded
  * under a different token was encoded against a different quantizer;
  * `mods` counts appends AND row-moving maintenance (cell splits) since
  * that build — a lower recorded `mods` means the derived artifact is
  * missing rows or filing them under retired cells; `cv` is the active
  * CENTROID VERSION — maintenance ops ([[IvfIndex.recenter]],
  * [[IvfIndex.splitHotCells]]) publish a fresh immutable centroid dir
  * and flip `cv` here atomically, so a reader never sees a half-written
  * routing table (cv=0 is the plain build-time `ivf_centroids` dir).
  * Residual-coded siblings (IVFPQ) compare the WHOLE epoch: a cv-only
  * change (recenter) moves the centroids their residuals were computed
  * against, so they must refuse exactly like a rebuild. Tokens are
  * random (not a counter) so deleting and rebuilding the parent can
  * never collide with a sibling's stale recording. */
final case class IndexEpoch(buildToken: String, mods: Long, cv: Long = 0L)

private[operators] object IndexEpoch {
  /** None on absence AND on any malformed content: a torn file must
    * read as "no epoch" (parents rebuild, siblings read stale and
    * rebuild — the safe direction), never as a smaller mods count
    * (which would certify stale codes as fresh) or an uncaught parse
    * exception (which would wedge the build-once guard). */
  def read(spark: SparkSession, path: String): Option[IndexEpoch] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      txt.split(' ') match {
        case Array(tok, mods) => scala.util.Try(mods.toLong).toOption
          .map(IndexEpoch(tok, _))
        // three-field form adds the centroid version; two-field files
        // (pre-maintenance builds) read as cv=0, the plain centroid dir
        case Array(tok, mods, cv) => (for {
            m <- scala.util.Try(mods.toLong)
            c <- scala.util.Try(cv.toLong)
          } yield IndexEpoch(tok, m, c)).toOption
        case _ => None
      }
    }
  }

  /** Write-temp-then-rename so a crash can never leave a torn epoch in
    * place — the destination either holds the previous complete value,
    * is briefly absent (reads as stale — safe), or holds the new one. */
  def write(spark: SparkSession, path: String, e: IndexEpoch): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + ".tmp")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(tmp, true)
    try out.write(s"${e.buildToken} ${e.mods} ${e.cv}".getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"could not move epoch into place: $path")
  }
}

/** Persistent IVF (inverted-file) ANN index: the build-once / probe-many
  * scale path for similarity search. `Similarity.ivfTopK` derives cells
  * from a pre-existing label; real corpora have no labels, so this
  * builds the coarse quantizer itself with a declarative Lloyd k-means
  * and materializes BOTH artifacts:
  *
  *   `<base>/ivf_cells`      — the corpus with its assigned cell id,
  *                             parquet partitioned BY cell, so a probe
  *                             reads only `nprobe` partitions;
  *   `<base>/ivf_centroids`  — k centroid vectors (tiny, broadcast).
  *
  * Search cost: rank k centroids against the query (k rows), then scan
  * only the chosen cells — corpus-size-independent candidate selection,
  * the same shape FAISS IVF uses, expressed as partition pruning.
  *
  * K-means notes (all DataFrame ops, no MLlib): assignment broadcasts
  * the centroid TABLE and computes the per-row argmin over k squared-L2
  * distances — dist² = |c|² − 2·x·c (|x|² is row-constant) — as a
  * `min(struct(dist, cell))` aggregate over the broadcast crossJoin.
  * The k-way row replication is collapsed back to one row per id by the
  * PARTIAL aggregate before any exchange, and the plan stays O(1) in k
  * (the centroids travel as broadcast data, not as an O(k·dim)
  * expression tree — the literal-inlining formulation re-planned a
  * k×dim expression every Lloyd round, a driver planning bomb at
  * realistic k). Update is the posexplode/avg used by
  * `Similarity.centroids`. Deterministic: seeded init picks the k
  * hash-smallest rows; ties in argmin break to the lower cell id
  * (struct ordering compares dist, then cell).
  */
final class IvfIndex(spark: SparkSession, val basePath: String) {

  private def cellsPath = s"$basePath/ivf_cells"
  private def centroidsPath = s"$basePath/ivf_centroids"
  private def epochPath = s"$basePath/ivf_epoch"

  /** Immutable per-version centroid dirs: v0 is the plain build-time
    * path (existing layouts — and the oracle replay — keep working);
    * maintenance ops write v>0 dirs and flip [[IndexEpoch.cv]]
    * atomically, so the routing-table swap is never torn. */
  private def centroidsVPath(v: Long): String =
    if (v == 0L) centroidsPath else s"$basePath/ivf_centroids_v$v"

  /** Current epoch, or None when no complete index exists. The epoch
    * file is written LAST in [[build]], so its presence implies the
    * cells and centroids artifacts are complete — callers can use
    * `epoch().isDefined` as the build-once guard. */
  def epoch(): Option[IndexEpoch] = IndexEpoch.read(spark, epochPath)

  /** Broadcastable centroid table. |c|² computed driver-side in array
    * order — identical doubles to an executor-side fold, and k tiny
    * numbers ride the broadcast for free. */
  private def centroidFrame(cents: Seq[(Int, Seq[Double])]): DataFrame = {
    import spark.implicits._
    cents.map { case (i, c) => (i, c, c.map(x => x * x).sum) }
      .toDF("_ccell", "_cvec", "_cn2")
  }

  /** (id, nearest-cell, vec) via broadcast centroid table + argmin
    * aggregate. One shuffle of one row per input row; centroid count
    * only affects per-task compute and broadcast size. */
  private def assignments(emb: DataFrame, idCol: String, vecCol: String,
                          cents: Seq[(Int, Seq[Double])]): DataFrame = {
    val cdf = centroidFrame(cents)
    emb.select(col(idCol).as("_aid"),
        col(vecCol).cast("array<double>").as("_av"))
      .crossJoin(broadcast(cdf))
      .select(col("_aid"), col("_av"),
        struct(
          (col("_cn2") - VectorFunctions.dot(col("_av"), col("_cvec")) * 2)
            .as("dist"),
          col("_ccell").as("idx")).as("_s"))
      .groupBy(col("_aid"))
      .agg(min(col("_s")).as("_best"), first(col("_av")).as("_av"))
      .select(col("_aid"), col("_best.idx").as("_cell"), col("_av"))
  }

  /** Build the index: k-means a bounded deterministic sample into `k`
    * centroids driver-side ([[KMeans]] — the FAISS shape: train is
    * single-node over `trainSample` rows, only the assignment/encode
    * pass touches the full corpus), then assign and persist cells
    * (partitioned by cell) + centroids. At 100 TB the former
    * full-corpus distributed Lloyd loop paid 2·iters corpus shuffles
    * for quantizer training nobody runs at that scale; this pays one
    * TakeOrdered sample collect plus the single assignment pass. */
  def build(emb: DataFrame, idCol: String, vecCol: String, k: Int,
            iters: Int = 5, trainSample: Int = 65536): Unit = {
    val sample = Sampling.exactSample(
        emb.select(col(idCol), col(vecCol)), idCol, trainSample)
      .select(col(vecCol).cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    val cents: Seq[(Int, Seq[Double])] =
      KMeans.lloyd(sample, k, iters).zipWithIndex
        .map { case (c, i) => (i, c.toSeq) }.toSeq

    writeAssigned(emb, idCol, vecCol, cents, SaveMode.Overwrite)
    import spark.implicits._
    cents.map { case (i, c) => (i, c) }.toDF("cell", "centroid")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(centroidsPath)
    invalidateSq() // cell contents changed — a stale sibling would serve wrong candidates
    // fresh token LAST: derived artifacts recorded under the old token
    // now read as stale, and the file's presence certifies a complete
    // build (a crash above leaves no epoch — the next build retries)
    IndexEpoch.write(spark, epochPath,
      IndexEpoch(java.util.UUID.randomUUID().toString, 0L))
  }

  /** Assign every row to its nearest centroid and write to the cell
    * partitions. Carries the ORIGINAL row through the argmin aggregate
    * (struct pass-through) instead of joining assignments back to the
    * corpus — one corpus shuffle, not two, and the stored vector keeps
    * its source type (float) rather than the double working copy.
    * `idCol` must be unique (the aggregate keys on it — duplicate ids
    * would collapse to one arbitrary survivor; an ANN index keyed by a
    * non-unique id is broken regardless of this implementation). */
  private def assignedFrame(emb: DataFrame, idCol: String, vecCol: String,
                            cents: Seq[(Int, Seq[Double])]): DataFrame = {
    val inputCols = emb.columns.toSeq
    val cdf = centroidFrame(cents)
    emb.select(col(idCol).as("_aid"),
        struct(inputCols.map(col): _*).as("_row"),
        col(vecCol).cast("array<double>").as("_av"))
      .crossJoin(broadcast(cdf))
      .select(col("_aid"), col("_row"),
        struct(
          (col("_cn2") - VectorFunctions.dot(col("_av"), col("_cvec")) * 2)
            .as("dist"),
          col("_ccell").as("idx")).as("_s"))
      .groupBy(col("_aid"))
      .agg(min(col("_s")).as("_best"), first(col("_row")).as("_row"))
      .select(inputCols.map(c => col(s"_row.$c")) :+
        col("_best.idx").as("cell"): _*)
      // cluster by cell before the partitioned write: without it every
      // shuffle partition writes a fragment into every cell dir
      // (cells × partitions small files — measured 58 files for 8 cells
      // at sf0.1), and every probe pays the listing + per-file task
      // overhead. One extra build-time shuffle buys minimal files per
      // cell; at real scale spark.sql.files.maxRecordsPerFile re-splits
      // a hot cell into right-sized files.
      .repartition(col("cell"))
  }

  private def writeAssigned(emb: DataFrame, idCol: String, vecCol: String,
                            cents: Seq[(Int, Seq[Double])],
                            mode: SaveMode): Unit =
    assignedFrame(emb, idCol, vecCol, cents)
      .write.mode(mode).partitionBy("cell").parquet(cellsPath)

  /** The ACTIVE routing table: the centroid dir the current epoch's
    * `cv` points at. */
  def centroids(): DataFrame =
    spark.read.parquet(centroidsVPath(epoch().map(_.cv).getOrElse(0L)))

  /** A SPECIFIC centroid version, or None once swept (one generation
    * retained) — lets a derived artifact that recorded an older cv
    * diff the routing tables and refresh incrementally ([[IvfPq
    * .refreshRecentered]]). */
  private[operators] def centroidsAt(v: Long): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(centroidsVPath(v))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(centroidsVPath(v))) else None
  }

  /** Committed-only read of the cell table: the cells path is
    * appendOnce-maintained (see [[append]]), so a probe racing a
    * killed-then-retried append must never see the partial rename —
    * same contract as [[LshIndex.rows]] (StagedCommit.readCommitted).
    * Build part files (non-delta) are always included; delta files
    * only when their `_delta_<token>_SUCCESS` marker exists.
    *
    * Tombstones ([[delete]]) are resolved HERE, the single choke point
    * every consumer shares — probes, the rerank joins of the quantized
    * and PQ pipelines, the SQ rebuild, compaction, cell splits, the
    * semantic-dedup blocking read — so a deleted row is invisible
    * everywhere the moment its tombstone commits, with zero data
    * movement. */
  def cells(): DataFrame = {
    val base = StagedCommit.readCommitted(spark, cellsPath)
    tombstoneFrame().fold(base)(t =>
      base.join(t, Seq(t.columns.head), "left_anti"))
  }

  private def tombstonesPath = s"$basePath/ivf_tombstones"

  /** The committed tombstone set, or None when no delete ever
    * committed ([[StagedCommit.readTombstones]] — marker-gated so a
    * killed first delete reads as "no tombstones", not a throw). */
  private def tombstoneFrame(): Option[DataFrame] =
    StagedCommit.readTombstones(spark, tombstonesPath)

  /** The committed-but-not-yet-purged tombstoned ids, or None — lets a
    * feed consumer decide whether a batch's inserts would be masked by
    * a PREVIOUS batch's delete of the same keys (delete-then-reinsert
    * across batches) and purge first ([[graft.streaming.IndexSink]]). */
  def pendingTombstones(): Option[DataFrame] = tombstoneFrame()

  /** TOMBSTONE DELETE — the right-to-be-forgotten path: record the ids
    * as an exactly-once delta under `ivf_tombstones` (content-derived
    * token, so a redelivered id set no-ops — returns false). No data
    * file moves, no derived artifact is invalidated: their codes still
    * hold the dead ids, but a dead id cannot survive the rerank join
    * through [[cells]] — it only wastes candidate slots until
    * [[purgeDeletes]] rewrites it away. The column name of `idCol` is
    * recorded with the tombstones (it keys the anti-join), so all
    * deletes against one index must use the index's id column. */
  def delete(ids: DataFrame, idCol: String): Boolean = {
    epoch().getOrElse(throw new IllegalStateException(
      s"no complete IVF index at $basePath"))
    StagedCommit.tombstoneOnce(tombstonesPath, ids, idCol)
  }

  /** Physically remove tombstoned rows: rewrite ONLY the cells that
    * hold one (dynamic partition overwrite — the untouched mass never
    * moves, same pattern as [[compact]]), drop any cell dir the purge
    * emptied (dynamic overwrite writes nothing for it, and its dead
    * rows would otherwise resurrect when the tombstones clear), wipe
    * the SQ sibling (its codes hold the dead rows; over-invalidation
    * is the safe direction, exactly as in [[append]]), then clear the
    * tombstones. Crash-convergent at every seam: until the final
    * clear, readers keep filtering through the tombstones — already-
    * rewritten rows simply match nothing — and a retry recomputes the
    * affected set from what is still on disk. Returns the affected
    * cell ids. */
  def purgeDeletes(idCol: String): Seq[Int] = tombstoneFrame() match {
    case None => Seq.empty
    case Some(tomb) =>
      val fs = new org.apache.hadoop.fs.Path(basePath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val raw = StagedCommit.readCommitted(spark, cellsPath)
      val affected = raw
        .join(tomb, raw(idCol) === tomb(tomb.columns.head), "left_semi")
        .select(col("cell")).distinct()
        .collect().map(_.getInt(0)).toSeq.sorted
      if (affected.nonEmpty) {
        invalidateSq()
        val kept = cells().filter(col("cell").isin(affected: _*))
          .repartition(col("cell")).localCheckpoint()
        // crash-safe rewrite (r18): the write-ahead-intent swap
        // replaces exactly the affected cells' files (a kill mid-swap
        // rolls forward at the next committed read), and a cell whose
        // every row was tombstoned folds to EMPTY — old files deleted,
        // dir dropped — replacing the hand-rolled dead-dir sweep the
        // dynamic-overwrite path needed
        StagedCommit.swapFiles(spark, cellsPath, kept, Seq("cell"),
          affected.map(c => s"cell=$c"))
        graft.FailPoint.hit("ivf_purge_after_overwrite")
      }
      graft.FailPoint.hit("ivf_purge_before_clear")
      fs.delete(new org.apache.hadoop.fs.Path(tombstonesPath), true)
      affected
  }

  /** Append-only refresh: assign the delta to the EXISTING stored
    * centroids (no re-training) and add its rows to the cell partitions.
    * The quantizer is frozen — the standard IVF ingestion path (FAISS
    * `add` after `train`): cell quality degrades only as far as the
    * corpus distribution drifts from the training sample, and a periodic
    * full `build` re-trains. Touches only the delta's cell partitions.
    *
    * `salt` (default empty = the classic content-only token) mixes
    * into the commit token: a feed consumer passes its batch span so
    * exactly-once is PER FEED POSITION, not per content — a genuine
    * re-insert of a previously-deleted-and-purged row with an
    * IDENTICAL vector must land, while a replay of the same batch
    * still no-ops ([[graft.streaming.IndexSink]]). */
  def append(emb: DataFrame, idCol: String, vecCol: String,
             salt: String = ""): Unit = {
    // validate BEFORE mutating: appending into a half-built index (no
    // epoch — a crashed build) would add rows no epoch accounts for and
    // wipe the SQ sibling, then throw anyway
    val e = epoch().getOrElse(
      throw new IllegalStateException(s"no complete IVF index at $basePath"))
    // exactly-once delta via StagedCommit (VERDICT r12 next-list #5):
    // the assigned delta stages into a hidden subtree, renames in, and
    // only then gains its _SUCCESS marker — [[cells]] reads committed
    // files only, so a probe never sees a killed append's partial
    // rename, and a redelivered batch (same content token) is a no-op.
    //
    // Invalidation ordering: the SQ wipe and the mods bump run
    // UNCONDITIONALLY, sibling-wipe first — a crash between the
    // marker commit and a conditional invalidation would leave the
    // int8 sibling certified fresh while missing the appended rows
    // FOREVER (the retry would no-op past the `if`). A redelivered
    // no-op append re-wiping the sibling costs one rebuild;
    // over-invalidation is the safe direction.
    invalidateSq()
    StagedCommit.appendOnce(cellsPath,
      appendToken(emb, idCol, vecCol, salt), Seq("cell"),
      assignedFrame(emb, idCol, vecCol, storedCentroids()))
    IndexEpoch.write(spark, epochPath, e.copy(mods = e.mods + 1))
  }

  /** ONE home for the append-token derivation — [[append]] and
    * [[appendCommitted]] must agree or the retry probe silently
    * diverges from what commits (the safeToken lesson, ADVICE r13). */
  private def appendToken(emb: DataFrame, idCol: String,
                          vecCol: String, salt: String): String =
    (if (salt.isEmpty) "" else s"${salt}_") +
      StagedCommit.idToken(emb, idCol, vecCol)

  /** Did an [[append]] of exactly this delta (content + salt) already
    * commit? The retry probe behind the streaming consumer's
    * verifyCdf="fail" crash seam: a batch whose own append landed but
    * whose batch marker did not will see its keys "present" — this
    * distinguishes that self-caused presence from a genuine upstream
    * CDF bug (whose content never committed here). */
  def appendCommitted(emb: DataFrame, idCol: String, vecCol: String,
                      salt: String = ""): Boolean =
    StagedCommit.hasDelta(spark, cellsPath,
      appendToken(emb, idCol, vecCol, salt))

  /** IN-PLACE VECTOR UPDATE (VERDICT r16 #3): retire the keys' current
    * rows and file their new vectors, packaged as ONE crash-convergent,
    * redelivery-idempotent operation — the documented
    * delete → purge → append maintenance path under a single
    * content-derived token. Returns true when the update applied,
    * false for a recognized redelivery.
    *
    * Why the purge must sit in the middle: tombstones are ID-keyed, so
    * a bare delete+append would mask the NEW rows exactly like the old
    * ones — the retired rows have to be physically gone and the
    * tombstones cleared before the replacement vectors land.
    *
    * Replay protocol (the fence is the APPEND token, checked first):
    * the append is the last mutating step, so its committed marker
    * proves the whole retirement half already ran — a redelivered
    * update skips straight past the tombstone step. Without that check
    * the retry would re-tombstone ids whose only remaining rows are
    * the new vectors it itself appended, and the next purge would
    * silently destroy them while the content-keyed re-append no-ops.
    * Crash anywhere earlier converges: a landed-but-unpurged tombstone
    * re-no-ops by content token; a purged-but-unappended retry
    * re-tombstones ids whose rows are already gone (masks nothing) and
    * purges that to a no-op. The SQ wipe and mods bump run
    * UNCONDITIONALLY, exactly like [[append]] — over-invalidation is
    * the safe direction for derived artifacts.
    *
    * `salt` separates two DIFFERENT updates carrying identical content
    * (set-back-to-original) from a redelivery of the SAME update: pass
    * the feed's interval token when driving this from a CDF feed
    * ([[graft.streaming.IndexSink]] does); leave empty for ad-hoc
    * calls where content idempotence is the wanted contract.
    *
    * Note [[purgeDeletes]] applies ALL pending tombstones, not only
    * this update's — always-safe (purge never changes the served
    * view), just possibly more cell rewrites than this batch alone. */
  def update(emb: DataFrame, idCol: String, vecCol: String,
             salt: String = ""): Boolean = {
    epoch().getOrElse(
      throw new IllegalStateException(s"no complete IVF index at $basePath"))
    if (emb.isEmpty) return false
    val token =
      (if (salt.isEmpty) "upd" else s"upd_$salt") + "_" +
        StagedCommit.idToken(emb, idCol, vecCol)
    val fresh = !StagedCommit.hasDelta(spark, cellsPath, token)
    if (fresh) {
      delete(emb.select(col(idCol)), idCol)
      purgeDeletes(idCol)
    }
    invalidateSq()
    val applied = StagedCommit.appendOnce(cellsPath, token, Seq("cell"),
      assignedFrame(emb, idCol, vecCol, storedCentroids()))
    val e = epoch().get
    IndexEpoch.write(spark, epochPath, e.copy(mods = e.mods + 1))
    applied
  }

  private def storedCentroids(): Seq[(Int, Seq[Double])] =
    centroids().collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toSeq)).toSeq
      .sortBy(_._1)

  /** Frozen-quantizer assignment of arbitrary rows against the STORED
    * centroids — the same argmin [[append]] uses, exposed so derived
    * artifacts ([[IvfPq.append]]) can encode a delta into the exact
    * cells the parent filed it under. Output: (`idCol`, cell, vector as
    * array&lt;double&gt;). */
  private[operators] def assignStored(emb: DataFrame, idCol: String,
                                      vecCol: String): DataFrame =
    assignments(emb, idCol, vecCol, storedCentroids())
      .select(col("_aid").as(idCol), col("_cell").as("cell"),
        col("_av").as("_vec"))

  /** `cell` rows → partition-dir relative paths (the
    * [[StagedCommit.swapFiles]] address form; int values, so no
    * escaping subtleties). */
  private def cellDirsOf(keys: DataFrame): Seq[String] =
    keys.select(col("cell").cast("string")).distinct().collect()
      .map(r => s"cell=${r.getString(0)}").toSeq

  /** Compact fragmented cell partitions after appends — the IVF analog
    * of [[LshIndex.compact]] (see there for the lineage-truncation
    * notes; crash-safe through [[StagedCommit.swapFiles]] since r18).
    * Rewrites only cells holding more than `maxFiles` files; returns
    * how many were rewritten. */
  def compact(maxFiles: Int = 1, markerKeep: Int = 64): Long = {
    val frag = cells()
      .select(col("cell"), input_file_name().as("_f"))
      .groupBy(col("cell")).agg(countDistinct(col("_f")).as("_nf"))
      .filter(col("_nf") > maxFiles)
      .select(col("cell"))
      .localCheckpoint()
    val n = frag.count()
    if (n > 0) {
      val compacted = cells()
        .join(broadcast(frag), Seq("cell"), "left_semi")
        .repartition(col("cell"))
        .localCheckpoint()
      // crash-safe rewrite (r18): write-ahead-intent swap of exactly
      // the fragmented cells' files — a kill mid-swap rolls forward
      // at the next committed read (the old dynamic-overwrite
      // job-commit window could lose cells)
      StagedCommit.swapFiles(spark, cellsPath, compacted,
        Seq("cell"), cellDirsOf(frag))
    }
    // marker-growth bound (VERDICT r17 #3): fold old _delta_ markers
    // into the token manifest — the redelivery fence survives, the
    // per-read listing stops growing with append history. markerKeep
    // = the active redelivery window (marker FILES kept for O(1)
    // exists-probes); widen it for consumers that replay deep
    StagedCommit.foldMarkers(spark, cellsPath, markerKeep)
    n
  }

  /** Probe: rank cells by centroid cosine, brute-force only the best
    * `nprobe` cells (partition-pruned scan). */
  def search(idCol: String, vecCol: String, query: Seq[Double], k: Int,
             nprobe: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    val best = probeCells(query, nprobe)
    cells().filter(col("cell").isin(best: _*))
      .select(col(idCol),
        VectorFunctions.cosineRounded(col(vecCol).cast("array<double>"), q).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** FILTERED probe: top-k among the rows satisfying `predicate` —
    * the "similar AND lang='en'" production shape. The index carries
    * every corpus column through the build (see [[assignedFrame]]),
    * so attribute predicates evaluate against the stored rows and
    * push down into the pruned cell scan; tombstones apply as in any
    * [[cells]] read. NOTE a selective predicate can leave fewer than
    * `k` survivors in the probed cells — [[searchWhereAdaptive]] is
    * the variant that widens until it has them. */
  def searchWhere(idCol: String, vecCol: String, query: Seq[Double],
                  k: Int, predicate: org.apache.spark.sql.Column,
                  nprobe: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    val best = probeCells(query, nprobe)
    cells().filter(col("cell").isin(best: _*)).filter(predicate)
      .select(col(idCol),
        VectorFunctions.cosineRounded(col(vecCol).cast("array<double>"), q)
          .as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Selectivity-adaptive filtered probe: geometric `nprobe` doubling
    * until the predicate leaves `k` survivors or every cell is probed
    * — the widening total rescans at most the final probe set once
    * more per doubling, so work stays bounded by a small constant of
    * the terminal probe (vs the unbounded recall loss of a fixed
    * nprobe under a selective filter, the failure mode FAISS solves
    * with selector-aware probing). Returns the result and the probe
    * width it terminated at. */
  def searchWhereAdaptive(idCol: String, vecCol: String,
                          query: Seq[Double], k: Int,
                          predicate: org.apache.spark.sql.Column,
                          initialProbe: Int = 1): (DataFrame, Int) = {
    val total = centroidArray().length
    var np = math.min(total, math.max(1, initialProbe))
    while (np < total &&
        searchWhere(idCol, vecCol, query, k, predicate, np).count() < k)
      np = math.min(total, np * 2)
    (searchWhere(idCol, vecCol, query, k, predicate, np), np)
  }

  /** The centroid table, collected once per build epoch and cached on the
    * driver — the FAISS shape: the coarse quantizer is an in-memory
    * routing table (k centroids, bounded by construction), only cell
    * CONTENTS live distributed. Cache keyed by the epoch file (a raw FS
    * read, no Spark job), so a rebuild or append in another instance is
    * picked up and a same-epoch probe costs zero jobs for cell choice —
    * per-search centroid-ranking jobs were pure fixed overhead. Sorted
    * by cell for deterministic iteration. */
  @volatile private var centroidCache: (String, Array[(Int, Array[Double])]) = null

  private[operators] def centroidArray(): Array[(Int, Array[Double])] = {
    val tok = epoch().map(e => s"${e.buildToken}:${e.mods}:${e.cv}").getOrElse("")
    val cached = centroidCache
    if (cached != null && cached._1 == tok) cached._2
    else {
      val a = centroids().collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1)
      centroidCache = (tok, a)
      a
    }
  }

  /** Cell choice shared by the float and quantized probes: rank the k
    * cached centroids by cosine to the query, driver-side. Arithmetic
    * replicates the previous distributed form bit-for-bit — VecDot's
    * sequential in-order double fold, cosine as dot/(norm·norm), then
    * `round(_, 6)` via the same scala-BigDecimal HALF_UP Spark's Round
    * applies to doubles — so cell choice stays byte-identical and the
    * oracle's SQL replay from the stored centroid table keeps matching. */
  private[operators] def probeCells(query: Seq[Double], nprobe: Int): Seq[Int] = {
    val qa = query.toArray
    def d(x: Array[Double], y: Array[Double]): Double = {
      val n = math.min(x.length, y.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += x(i) * y(i); i += 1 }
      s
    }
    val qn = math.sqrt(d(qa, qa))
    centroidArray()
      .map { case (cell, c) =>
        (cell, BigDecimal(d(c, qa) / (math.sqrt(d(c, c)) * qn))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (cell, cs) => (-cs, cell) }
      .take(nprobe).map(_._1).toSeq
  }

  private def sqCellsPath = s"$basePath/ivf_cells_sq"
  private def sqMetaPath = s"$basePath/ivf_sq_meta"
  // parent epoch the SQ sibling was built/patched at — what makes
  // patchSqAfterSplit's exactly-one-split validity check possible
  private def sqEpochPath = s"$basePath/ivf_sq_epoch"

  /** Drop the quantized sibling so the next [[ensureSq]] rebuilds it —
    * called by [[build]] and [[append]]: the sibling mirrors the cell
    * table, and serving stale int8 candidates after the cells changed
    * would be a silent-wrong-results bug, not a perf bug.
    *
    * Staleness is two-tier BY DESIGN: artifacts this index OWNS (the SQ
    * sibling, stored under its own base path) are deleted directly —
    * the owner knows where they live and deletion is strictly better
    * than refusal; derived artifacts it CANNOT know about (the IVFPQ
    * codes live under an arbitrary caller-chosen path) check the
    * [[IndexEpoch]] stamped here and refuse loudly on mismatch. */
  private def invalidateSq(): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    Seq(sqCellsPath, sqMetaPath, sqEpochPath).foreach { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(conf)
      if (fs.exists(path)) fs.delete(path, true)
    }
  }

  /** Remove ONLY the SQ sibling's completeness guard (`_SUCCESS`) —
    * the split path's alternative to the full wipe: the surviving
    * cells' quantized rows are still exact (raw-vector codes under the
    * GLOBAL stored scale, and a split moves no row within a surviving
    * cell), so [[patchSqAfterSplit]] can repair the sibling touching
    * only the split cells instead of re-quantizing the corpus.
    * Unguarding first has the same crash-safety as the wipe: probes
    * refuse until the guard returns, and [[ensureSq]] falls back to a
    * full rebuild from any crash point. */
  private def unguardSq(): Unit = {
    val p = new org.apache.hadoop.fs.Path(sqCellsPath, "_SUCCESS")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, false)
  }

  /** Cell-scoped SQ repair after EXACTLY ONE [[splitHotCells]]: encode
    * the new sub-cells' rows under the STORED global scale (one
    * partition-pruned pass over the split mass — at scale, the hot
    * percent, not the corpus the full rebuild re-quantizes), drop the
    * retired cells' quantized dirs, restore the guard, and stamp the
    * parent epoch. Validity is epoch-checked: the recorded SQ epoch
    * must be exactly one split behind (same token, mods−1, cv−1) —
    * an append in between wiped the sibling whole, and anything else
    * means the sibling's provenance is unknown: run [[ensureSq]].
    * Idempotent: already-stamped calls return Nil; a crash at any
    * point leaves the guard absent or the state re-derivable, and the
    * full-rebuild fallback always converges. Returns the newly encoded
    * cell ids. */
  def patchSqAfterSplit(idCol: String, vecCol: String): Seq[Int] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val cur = epoch().getOrElse(throw new IllegalStateException(
      s"no complete IVF index at $basePath"))
    val recorded = IndexEpoch.read(spark, sqEpochPath)
    val sqRoot = new org.apache.hadoop.fs.Path(sqCellsPath)
    val fs = sqRoot.getFileSystem(conf)
    def restoreGuard(): Unit = {
      val guard = new org.apache.hadoop.fs.Path(sqRoot, "_SUCCESS")
      if (!fs.exists(guard)) fs.create(guard, true).close()
    }
    if (recorded.contains(cur)) {
      // already stamped current — a split attempt that unguarded and
      // then died BEFORE its epoch flip (or a crash between this
      // method's own stamp and guard restore) leaves a byte-complete
      // sibling refusing probes; the record certifies it, so restore
      // the guard rather than reporting success while probes throw
      restoreGuard()
      return Nil
    }
    if (!recorded.contains(IndexEpoch(cur.buildToken, cur.mods - 1,
        cur.cv - 1)))
      throw new IllegalStateException(
        s"SQ sibling at $basePath is not exactly one split behind " +
          s"(recorded $recorded, parent $cur) — run ensureSq")
    val metaP = new org.apache.hadoop.fs.Path(sqMetaPath)
    if (!fs.exists(metaP))
      throw new IllegalStateException(
        s"SQ sibling meta missing at $basePath — run ensureSq")
    val live = storedCentroids().map(_._1).toSet
    if (!fs.exists(sqRoot))
      throw new IllegalStateException(
        s"SQ sibling cells missing at $basePath — run ensureSq")
    val sqDirs = listCellIds(fs, sqRoot)
    val missing = (live -- sqDirs).toSeq.sorted
    if (missing.nonEmpty) {
      val maxAbs = spark.read.parquet(sqMetaPath).head().getDouble(0)
      writeSqCells(cells().filter(col("cell").isin(missing: _*)),
        idCol, vecCol, maxAbs, dynamic = true)
    }
    // retired quantized dirs: unrouted (their centroids are gone), so
    // deleting them is pure space/listing reclamation
    (sqDirs -- live).foreach { c =>
      fs.delete(new org.apache.hadoop.fs.Path(sqRoot, s"cell=$c"), true)
    }
    IndexEpoch.write(spark, sqEpochPath, cur)
    restoreGuard()
    missing
  }

  /** Build the int8 sibling of the cell table (the FAISS IVF-SQ8 shape):
    * per row (id, q) with symmetrically quantized tinyint components,
    * partitioned by the SAME cell ids — 4× fewer vector bytes than the
    * float column, and the quantized probe's candidate pass reads ONLY
    * this table. Build-once (`_SUCCESS`-guarded); the quantizer scale
    * source (max |component| over the stored corpus) is persisted
    * alongside so probes never rescan the corpus for it. */
  def ensureSq(idCol: String, vecCol: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val done = new org.apache.hadoop.fs.Path(sqCellsPath, "_SUCCESS")
    if (done.getFileSystem(conf).exists(done)) {
      // a guarded sibling is current by invariant (append/build wipe
      // it; a split only unguards) — backfill the epoch record for
      // siblings built before the record existed, so patchSqAfterSplit
      // has a pedigree to check against
      if (IndexEpoch.read(spark, sqEpochPath).isEmpty)
        epoch().foreach(e => IndexEpoch.write(spark, sqEpochPath, e))
    } else {
      val maxAbs = Similarity.sqMaxAbs(cells(), vecCol)
      // meta BEFORE cells: the build-once guard is the cells _SUCCESS,
      // so the last-written artifact must be the guarded one — the
      // reverse order left a crash window where the guard passed but
      // searchQuantized threw forever on the missing meta file
      import spark.implicits._
      Seq(maxAbs).toDF("max_abs").coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(sqMetaPath)
      writeSqCells(cells(), idCol, vecCol, maxAbs)
      // epoch record AFTER the cells write: a record next to a partial
      // (crashed, guard-less) cells dir would let patchSqAfterSplit
      // later certify the incomplete sibling — its missing-dirs scan
      // trusts every dir the record vouches for. A crash between the
      // completed write and this stamp is the backfill branch above.
      epoch().foreach(e => IndexEpoch.write(spark, sqEpochPath, e))
    }
  }

  /** The ONE quantize-and-write pipeline for the SQ sibling — shared
    * by [[ensureSq]] (full rebuild) and [[patchSqAfterSplit]] (cell
    * slice, dynamic overwrite): both paths' codes must stay
    * bit-identical or patched cells stop being comparable with
    * surviving ones (and with the oracle replay). */
  private def writeSqCells(rows: DataFrame, idCol: String, vecCol: String,
                           maxAbs: Double, dynamic: Boolean = false): Unit = {
    val w = rows
      .select(col(idCol), col("cell"),
        Similarity.sqQuantize(col(vecCol), maxAbs)
          .cast("array<tinyint>").as("q"))
      // cluster by cell: same minimal-files-per-partition rationale as
      // writeAssigned — the quantized probe pays file listing too
      .repartition(col("cell"))
      .write.mode(SaveMode.Overwrite)
    (if (dynamic) w.option("partitionOverwriteMode", "dynamic") else w)
      .partitionBy("cell").parquet(sqCellsPath)
  }

  /** Integer cell ids of the `cell=N` dirs under `root`. */
  private def listCellIds(fs: org.apache.hadoop.fs.FileSystem,
                          root: org.apache.hadoop.fs.Path): Set[Int] =
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("cell="))
      .flatMap(st => scala.util.Try(
        st.getPath.getName.stripPrefix("cell=").toInt).toOption)
      .toSet

  /** Drift report: how far each cell's CURRENT mean vector has moved
    * from the stored (training-time) centroid, as cosine similarity.
    * The re-train trigger for the frozen-quantizer append path: appends
    * assign to training-time centroids ([[append]]), so cell quality
    * decays exactly as the corpus distribution drifts — when a cell's
    * drift cosine drops below a threshold, rebuild. One aggregate over
    * the cells (per-(cell, dim) integer sums, map-side combinable),
    * driver-side cosine against the k stored centroids; output is k
    * rows. */
  def drift(vecCol: String, minCosine: Double = 0.99): DataFrame = {
    val current = currentCellMeans(vecCol)
    val rows = storedCentroids().flatMap { case (cell, stored) =>
      current.get(cell).map { cur =>
        val dot = stored.iterator.zip(cur.iterator).map { case (a, b) => a * b }.sum
        val n1 = math.sqrt(stored.map(x => x * x).sum)
        val n2 = math.sqrt(cur.map(x => x * x).sum)
        val cos = BigDecimal(dot / (n1 * n2))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (cell, cos, cos < minCosine)
      }
    }
    import spark.implicits._
    rows.toDF("cell", "drift_cosine", "retrain")
  }

  /** Per-cell CURRENT mean vectors from EXACT integer sums of
    * 1e-6-quantized components: integer addition is order-independent,
    * so the means are bit-identical in any engine and on any
    * partitioning — a live float avg() here made the 6-dp drift cosine
    * (and the retrain flag) hang on partition-order ULP noise. k×dim
    * rows collect driver-side (control-plane sized, like build's
    * centroids); arrays assembled in deterministic dim order. Shared by
    * [[drift]] (report) and [[recenter]] (the fix). */
  private def currentCellMeans(vecCol: String): Map[Int, Array[Double]] = {
    val mRows = cells()
      .select(col("cell"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("_i", "_x")))
      .groupBy(col("cell"), col("_i"))
      .agg(sum(round(col("_x") * 1e6).cast("long")).as("_s"),
        count(lit(1)).as("_n"))
      .collect()
    mRows.groupBy(_.getInt(0)).map { case (cell, rows) =>
      cell -> rows.sortBy(_.getInt(1))
        .map(r => r.getLong(2).toDouble / (r.getLong(3) * 1e6)).toArray
    }
  }

  private def writeCentroids(cents: Seq[(Int, Seq[Double])], v: Long): Unit = {
    import spark.implicits._
    cents.sortBy(_._1).toDF("cell", "centroid")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(centroidsVPath(v))
  }

  /** DRIFT REPAIR without data movement: replace each drifted cell's
    * stored centroid with the cell's CURRENT mean (the [[drift]]
    * report's fix), publish as a fresh centroid version, and flip
    * [[IndexEpoch.cv]] atomically. Rows never move, so the cost is one
    * cells aggregate + a k-row write — corpus-shuffle-free, the cheap
    * half of the re-train flow (frozen-quantizer [[append]]s degrade
    * ROUTING first: the rows are filed where the old centroid put them,
    * but probes rank cells by centroids that no longer describe their
    * contents).
    *
    * Consistency: the SQ sibling quantizes RAW vectors per cell — rows
    * and cells are untouched, so it stays valid across a recenter. The
    * IVFPQ sibling codes RESIDUALS against the centroids — its recorded
    * epoch no longer equals the parent's (cv moved) and it refuses
    * loudly, exactly as it must. A probe concurrent with the flip reads
    * the old complete routing table or the new one, never a torn one;
    * centroid versions older than the immediately-previous one are
    * swept (same one-generation reader retention as the manifest
    * layouts). Returns the recentred cell ids. */
  def recenter(vecCol: String, minCosine: Double = 0.99): Seq[Int] = {
    val e = epoch().getOrElse(throw new IllegalStateException(
      s"no complete IVF index at $basePath"))
    val current = currentCellMeans(vecCol)
    val stored = storedCentroids()
    val drifted = stored.flatMap { case (cell, s) =>
      current.get(cell).flatMap { cur =>
        val dot = s.iterator.zip(cur.iterator).map { case (a, b) => a * b }.sum
        val n1 = math.sqrt(s.map(x => x * x).sum)
        val n2 = math.sqrt(cur.map(x => x * x).sum)
        val cos = BigDecimal(dot / (n1 * n2))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        if (cos < minCosine) Some(cell) else None
      }
    }
    if (drifted.isEmpty) return Nil
    val driftedSet = drifted.toSet
    val newCents = stored.map { case (cell, v) =>
      if (driftedSet(cell)) (cell, current(cell).toSeq) else (cell, v)
    }
    writeCentroids(newCents, e.cv + 1)
    graft.FailPoint.hit("ivf_recenter_after_centroids")
    IndexEpoch.write(spark, epochPath, e.copy(cv = e.cv + 1))
    // the raw-vector SQ sibling stays VALID across a recenter (rows
    // and cells untouched; only routing moved) — carry its epoch
    // record forward, or a later patchSqAfterSplit would see the
    // recenter as an extra cv step and force the full rebuild the
    // patch exists to avoid. Only a record matching this epoch's
    // token+mods is advanced; anything else keeps its (stale)
    // pedigree and the strict checks downstream handle it.
    IndexEpoch.read(spark, sqEpochPath).foreach { r =>
      if (r.buildToken == e.buildToken && r.mods == e.mods)
        IndexEpoch.write(spark, sqEpochPath, r.copy(cv = e.cv + 1))
    }
    sweepCentroidVersions(e.cv + 1)
    drifted.sorted
  }

  /** LOAD REBALANCE for skewed or drifted corpora: split every cell
    * holding more than `maxFraction` of the corpus into local
    * sub-cells, touching ONLY those cells — the incremental alternative
    * to a full [[build]] when appends have piled the new distribution
    * into a few cells. At scale this is the difference between
    * re-encoding 100 TB and re-encoding the hot percent: detection is
    * one per-cell count, sub-quantizer training is a bounded
    * driver-side sample per hot cell (the FAISS train shape), and the
    * only corpus-touching pass is a partition-pruned read + one shuffle
    * of the HOT cells' rows.
    *
    * Protocol (single writer, concurrent probes safe at every point):
    *
    *   1. the hot cells' rows are re-assigned to FRESH sub-cell ids —
    *      past every id ever allocated, live or on disk — via local
    *      argmin against that cell's own sub-centroids, and land in the
    *      cell table via [[StagedCommit.appendOnce]] under a token that
    *      binds the id base: killed-mid-commit is invisible, and a
    *      retry (even with other epoch-moving ops in between) writes to
    *      ids no previous attempt used, so superseded attempts can
    *      never be double-served — their dirs are unreferenced garbage
    *      the sweep reclaims;
    *   2. a fresh centroid version drops the split cells' centroids and
    *      adds the sub-centroids;
    *   3. the epoch flips cv AND mods atomically (rows moved cells —
    *      residual-coded siblings must refuse; the raw-vector SQ
    *      sibling is invalidated up front, same unconditional ordering
    *      as [[append]]);
    *   4. retired cell dirs are swept with one-generation retention
    *      (a probe that resolved the previous cv keeps its cells).
    *
    * Before the epoch flip, probes route by the OLD centroids to the
    * OLD cells — the committed sub-cell rows exist but are unrouted.
    * After it, the split cells' centroids are gone, so their dirs are
    * never probed even before the sweep removes them. Detection counts
    * only LIVE cells (those in the routing table), so a crash-retry
    * between steps 1 and 3 reproduces the original decision. Returns
    * the split cell ids. */
  def splitHotCells(idCol: String, vecCol: String,
                    maxFraction: Double = 0.25, iters: Int = 5,
                    trainSample: Int = 65536): Seq[Int] = {
    require(maxFraction > 0 && maxFraction < 1,
      s"maxFraction must be in (0,1), got $maxFraction")
    val e = epoch().getOrElse(throw new IllegalStateException(
      s"no complete IVF index at $basePath"))
    val live = storedCentroids()
    val liveIds = live.map(_._1)
    val counts: Map[Int, Long] = cells()
      .filter(col("cell").isin(liveIds: _*))
      .groupBy(col("cell")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    val hot = counts.filter { case (_, n) => n > maxFraction * total }
      .keys.toSeq.sorted
    if (hot.isEmpty || total == 0L) return Nil
    // rows are about to move cells: FIRST and unconditionally, take
    // the SQ sibling out of service (same crash reasoning as append —
    // over-invalidation is the safe direction). Unguard rather than
    // wipe: surviving cells' quantized rows stay exact, so
    // patchSqAfterSplit can repair cell-scoped instead of the full
    // rebuild re-quantizing the corpus.
    unguardSq()
    // sub-cell ids start past every id EVER allocated — live ids AND
    // any cell dir already on disk (a previous split attempt killed
    // after its append commit left committed rows under its own ids;
    // reusing those ids would double-serve the hot rows the moment the
    // retry publishes). Each attempt therefore writes to FRESH ids, its
    // id base rides in the commit token, and a superseded attempt's
    // dirs are unreferenced by construction — swept like any retired
    // cell. This is the same fresh-location discipline as the
    // manifested-merge epoch dirs.
    val diskMax = {
      val p = new org.apache.hadoop.fs.Path(cellsPath)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) -1 else (listCellIds(fs, p) + (-1)).max
    }
    // per hot cell: deterministic bounded sample, local 2+-means into
    // enough sub-cells to bring each under the threshold (capped at 8)
    var nextId = math.max(liveIds.max, diskMax) + 1
    val idBase = nextId
    val subCents: Seq[(Int, Int, Seq[Double])] = hot.flatMap { c =>
      val want = math.min(8L,
        math.max(2L, math.ceil(counts(c) / (maxFraction * total)).toLong))
      val sample = Sampling.exactSample(
          cells().filter(col("cell") === c)
            .select(col(idCol), col(vecCol)), idCol, trainSample)
        .select(col(vecCol).cast("array<double>")).collect()
        .map(_.getSeq[Double](0).toArray)
      val ks = KMeans.lloyd(sample, want.toInt, iters)
      val out = ks.zipWithIndex.map { case (v, i) =>
        (c, nextId + i, v.toSeq) }.toSeq
      nextId += ks.length
      out
    }
    // one partition-pruned pass over the hot cells: each row argmins
    // against ITS OWN cell's sub-centroids (broadcast join on the
    // source cell), keeping the pass O(hot mass), not O(corpus)
    import spark.implicits._
    val subDf = subCents.map { case (src, id, v) =>
      (src, id, v, v.map(x => x * x).sum) }
      .toDF("_src", "_ncell", "_cvec", "_cn2")
    val src = cells().filter(col("cell").isin(hot: _*))
    val dataCols = src.columns.toSeq.filterNot(_ == "cell")
    val reassigned = src
      .select(col(idCol).as("_aid"),
        struct(dataCols.map(col): _*).as("_row"),
        col(vecCol).cast("array<double>").as("_av"), col("cell"))
      .join(broadcast(subDf), col("cell") === col("_src"))
      .select(col("_aid"), col("_row"),
        struct(
          (col("_cn2") - VectorFunctions.dot(col("_av"), col("_cvec")) * 2)
            .as("dist"),
          col("_ncell").as("idx")).as("_s"))
      .groupBy(col("_aid"))
      .agg(min(col("_s")).as("_best"), first(col("_row")).as("_row"))
      .select(dataCols.map(c => col(s"_row.$c")) :+
        col("_best.idx").as("cell"): _*)
      .repartition(col("cell"))
    val token = s"split_${e.buildToken}_m${e.mods}_v${e.cv}_b${idBase}_" +
      hot.mkString("-")
    StagedCommit.appendOnce(cellsPath, token, Seq("cell"), reassigned)
    graft.FailPoint.hit("ivf_split_after_append")
    val hotSet = hot.toSet
    writeCentroids(live.filterNot { case (c, _) => hotSet(c) } ++
      subCents.map { case (_, id, v) => (id, v) }, e.cv + 1)
    graft.FailPoint.hit("ivf_split_after_centroids")
    IndexEpoch.write(spark, epochPath,
      IndexEpoch(e.buildToken, e.mods + 1, e.cv + 1))
    sweepRetiredCells(e.cv + 1)
    sweepCentroidVersions(e.cv + 1)
    hot
  }

  /** Best-effort GC after a split: delete `cell=X` dirs referenced by
    * NEITHER the active centroid version nor the immediately-previous
    * one (a probe that resolved the old routing table keeps its cells
    * for one generation — the same retention contract as the manifest
    * layouts; a crash mid-sweep leaves garbage the next maintenance
    * op's sweep reclaims). */
  private def sweepRetiredCells(activeCv: Long): Unit =
    try {
      val conf = spark.sparkContext.hadoopConfiguration
      val root = new org.apache.hadoop.fs.Path(cellsPath)
      val fs = root.getFileSystem(conf)
      if (!fs.exists(root)) return
      def cellsOf(v: Long): Set[Int] = {
        val p = new org.apache.hadoop.fs.Path(centroidsVPath(v))
        if (!fs.exists(p)) Set.empty
        else spark.read.parquet(centroidsVPath(v))
          .select(col("cell")).collect().map(_.getInt(0)).toSet
      }
      val keep = cellsOf(activeCv) ++
        (if (activeCv > 0) cellsOf(activeCv - 1) else Set.empty[Int])
      fs.listStatus(root).foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory && name.startsWith("cell=") &&
            scala.util.Try(name.stripPrefix("cell=").toInt).toOption
              .exists(!keep(_)))
          fs.delete(st.getPath, true)
      }
    } catch { case _: Throwable => () }

  /** Drop centroid version dirs older than `activeCv - 1` (one
    * generation retained for lagging readers; the build-time v0 plain
    * dir is kept — it documents the original quantizer and the replay
    * oracles read it). */
  private def sweepCentroidVersions(activeCv: Long): Unit =
    try {
      val conf = spark.sparkContext.hadoopConfiguration
      val base = new org.apache.hadoop.fs.Path(basePath)
      val fs = base.getFileSystem(conf)
      fs.listStatus(base).foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory && name.startsWith("ivf_centroids_v") &&
            scala.util.Try(name.stripPrefix("ivf_centroids_v").toLong)
              .toOption.exists(_ < activeCv - 1))
          fs.delete(st.getPath, true)
      }
    } catch { case _: Throwable => () }

  /** Quantized probe (IVF × SQ8): cell pruning as in [[search]], then
    * the candidate pass ranks the probed cells by the INT8 dot product
    * over the quantized sibling table (a quarter of the float bytes,
    * same partition pruning), and only the best `rerank` rows are
    * re-ranked at full precision against the float cells. Exact integer
    * arithmetic + total tie-orders keep the whole pipeline
    * deterministic and oracle-replayable. Requires [[ensureSq]]. */
  def searchQuantized(idCol: String, vecCol: String, query: Seq[Double],
                      k: Int, rerank: Int, nprobe: Int = 1): DataFrame = {
    require(rerank >= k, s"rerank ($rerank) must be >= k ($k)")
    // the guard is the completeness certificate: a split UNGUARDS the
    // sibling instead of wiping it (patchSqAfterSplit repairs in
    // place), and serving from an unguarded sibling would rank the
    // split cells' rows from dirs that no longer exist
    val done = new org.apache.hadoop.fs.Path(sqCellsPath, "_SUCCESS")
    if (!done.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(done))
      throw new IllegalStateException(
        s"no complete SQ sibling at $basePath — run ensureSq (full " +
          "rebuild) or patchSqAfterSplit (after exactly one split)")
    val maxAbs = spark.read.parquet(sqMetaPath).head().getDouble(0)
    val q = array(query.map(lit): _*)
    val qq = Similarity.sqQuantize(q, maxAbs)
    val best = probeCells(query, nprobe)
    val cand = spark.read.parquet(sqCellsPath)
      .filter(col("cell").isin(best: _*))
      .select(col(idCol), VectorFunctions.dot(col("q"), qq).as("_qdot"))
      .orderBy(col("_qdot").desc, col(idCol).asc)
      .limit(rerank)
      .select(col(idCol))
    cells().filter(col("cell").isin(best: _*))
      .join(broadcast(cand), idCol)
      .select(col(idCol),
        VectorFunctions.cosineRounded(col(vecCol).cast("array<double>"), q).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }
}
