package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent sign-LSH ANN index: the build-once / probe-many path for
  * `Similarity.lshTopK`, whose bucket predicate otherwise scans the whole
  * corpus. The corpus is written `numTables` times, partitioned by
  * (table, bucket): a probe reads exactly ONE partition per table —
  * bucket membership becomes parquet partition pruning, the same move
  * `IvfIndex` makes for the coarse-quantizer cells.
  *
  * Space-time trade, stated plainly: `numTables`× the corpus on disk
  * buys corpus-size-independent candidate selection (the classic LSH
  * forest layout). Planes are regenerated from the constructor seed, so
  * build and probe always agree; candidates are deduped by id (a row can
  * share the query's bucket in several tables) and exact-cosine
  * re-ranked, so the index affects recall only, never precision.
  */
final class LshIndex(spark: SparkSession, val basePath: String, dim: Int,
                     numTables: Int = 4, bitsPerTable: Int = 8,
                     seed: Long = 42L) {

  private def rowsPath =
    LshIndex.rowsPath(basePath, dim, numTables, bitsPerTable, seed)
  private val planes = Similarity.hyperplanes(dim, numTables, bitsPerTable, seed)

  /** Per-table bucket of a query vector (shared fold with the scan-based
    * `lshTopK`, so index and scan paths cannot diverge). */
  def queryBuckets(query: Seq[Double]): Seq[Long] =
    Similarity.queryBuckets(planes, query)

  private def bucketed(emb: DataFrame, idCol: String,
                       vecCol: String): DataFrame =
    Similarity.lshBuckets(emb, vecCol, planes)
      .select(col(idCol), col(vecCol),
        posexplode(array((0 until numTables).map(i => col(s"_lsh$i")): _*))
          .as(Seq("tbl", "bucket")))
      // cluster rows by their output partition before the partitioned
      // write: without this every task writes a sliver into every
      // (tbl, bucket) dir — numTasks × numTables × 2^bits tiny files
      // (measured 4× slower build AND probe at sf0.1; at corpus scale
      // it's a small-files catastrophe)
      .repartition(col("tbl"), col("bucket"))

  /** Build: attach the per-table buckets, explode to one row per
    * (table, row), write partitioned by (tbl, bucket). `_SUCCESS` guards
    * a killed build like the other artifacts. */
  def build(emb: DataFrame, idCol: String, vecCol: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(rowsPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(rowsPath, "_SUCCESS"))) return
    bucketed(emb, idCol, vecCol)
      .write.mode(SaveMode.Overwrite).partitionBy("tbl", "bucket")
      .parquet(rowsPath)
    invalidate()
  }

  /** Append-only refresh: bucket the delta with the SAME planes and add
    * its rows to the existing (tbl, bucket) partitions. A row's buckets
    * depend only on the row itself, so build(all) and build(old) +
    * append(delta) produce identical index CONTENT — the LSH analog of
    * [[Dedup.refreshPairs]]. Touches only the delta's partitions.
    *
    * Exactly-once via [[StagedCommit]]: the delta stages into a hidden
    * child dir and commits by rename under a content-derived token, so
    * a killed append is repaired by simply RE-RUNNING it (partials of
    * the same token are swept, a completed token no-ops) — recovery is
    * retry, not rebuild. Re-appending an identical delta is likewise a
    * no-op instead of a silent double-append. */
  def append(emb: DataFrame, idCol: String, vecCol: String,
             salt: String = ""): Unit = {
    // salt semantics as [[IvfIndex.append]]: empty = classic content
    // token; a feed consumer passes its batch span so a genuine
    // identical-content re-insert lands while a replay still no-ops
    StagedCommit.appendOnce(rowsPath,
      appendToken(emb, idCol, vecCol, salt), Seq("tbl", "bucket"),
      bucketed(emb, idCol, vecCol))
    invalidate()
  }

  /** ONE home for the append-token derivation — see
    * [[IvfIndex.appendToken]]'s rationale. */
  private def appendToken(emb: DataFrame, idCol: String,
                          vecCol: String, salt: String): String =
    (if (salt.isEmpty) "" else s"${salt}_") +
      StagedCommit.idToken(emb, idCol, vecCol)

  /** [[IvfIndex.appendCommitted]]'s forest twin — the verifyCdf
    * crash-retry probe. */
  def appendCommitted(emb: DataFrame, idCol: String, vecCol: String,
                      salt: String = ""): Boolean =
    StagedCommit.hasDelta(spark, rowsPath,
      appendToken(emb, idCol, vecCol, salt))

  /** Compact fragmented (tbl, bucket) partitions: every [[append]] adds
    * one file per writing task per touched partition, and probe latency
    * degrades with file count (footer reads dominate a pruned scan of
    * small files). Rewrites ONLY partitions holding more than `maxFiles`
    * files — dynamic partition overwrite leaves the rest untouched.
    * Returns the number of partitions rewritten.
    *
    * The fragmented slice is eagerly localCheckpoint'ed before the
    * rewrite (truncating lineage to the materialized blocks is what
    * makes read-then-replace safe, and bounds memory to the
    * fragmented slice, not the index). Crash-safe since r18: the
    * rewrite runs through [[StagedCommit.swapFiles]]'s write-ahead
    * intent — a kill mid-swap rolls forward at the next committed
    * read instead of requiring a rebuild (the old dynamic-overwrite
    * job-commit window could lose partitions). */
  def compact(maxFiles: Int = 1, markerKeep: Int = 64): Long = {
    val frag = rows()
      .select(col("tbl"), col("bucket"), input_file_name().as("_f"))
      .groupBy(col("tbl"), col("bucket"))
      .agg(countDistinct(col("_f")).as("_nf"))
      .filter(col("_nf") > maxFiles)
      .select(col("tbl"), col("bucket"))
      .localCheckpoint()
    val n = frag.count()
    if (n > 0) {
      val compacted = rows()
        .join(broadcast(frag), Seq("tbl", "bucket"), "left_semi")
        .repartition(col("tbl"), col("bucket"))
        .localCheckpoint()
      // invalidate BEFORE the swap: a chaos kill inside it must not
      // leave the cached frame referencing vanished files (the
      // checkpointed slice above is already materialized)
      invalidate()
      StagedCommit.swapFiles(spark, rowsPath, compacted,
        Seq("tbl", "bucket"), partDirsOf(frag))
    }
    // marker-growth bound (VERDICT r17 #3) — see IvfIndex.compact
    StagedCommit.foldMarkers(spark, rowsPath, markerKeep)
    n
  }

  /** (tbl, bucket) rows → partition-dir relative paths, escaped the
    * way Spark writes them — the [[StagedCommit.swapFiles]] address
    * form. String casts so partition-dir type inference never
    * matters. */
  private def partDirsOf(keys: DataFrame): Seq[String] = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName
    keys.select(col("tbl").cast("string"), col("bucket").cast("string"))
      .distinct().collect().map { r =>
        s"tbl=${escapePathName(r.getString(0))}/" +
          s"bucket=${escapePathName(r.getString(1))}"
      }.toSeq
  }

  // resolved once per index instance and invalidated on writes:
  // partition discovery over numTables × 2^bits dirs is the probe's
  // fixed cost, and a long-lived service re-lists it per query without
  // this (a catalog table's file index gives the same amortization)
  @volatile private var rowsDF: DataFrame = null
  private def invalidate(): Unit = rowsDF = null
  def rows(): DataFrame = {
    var df = rowsDF
    // committed-only read: the rows table is appendOnce-maintained, so
    // a probe racing a killed-then-retried delta append must not see
    // the partial rename (StagedCommit.readCommitted). Tombstones
    // ([[delete]]) resolve here too — the cached frame bakes in the
    // set current at resolution, and delete/purge invalidate it.
    if (df == null) {
      val base = StagedCommit.readCommitted(spark, rowsPath)
      df = StagedCommit.readTombstones(spark, tombstonesPath)
        .fold(base)(t => base.join(t, Seq(t.columns.head), "left_anti"))
      rowsDF = df
    }
    df
  }

  private def tombstonesPath = rowsPath + "_tombstones"

  /** TOMBSTONE DELETE: one exactly-once id delta (content token —
    * redelivery no-ops, returns false); every probe path resolves the
    * mask through [[rows]]. A row's index copies live in `numTables`
    * partitions, so the view-level mask is `numTables`× cheaper than
    * a physical delete until [[purgeDeletes]] folds them away. */
  def delete(ids: DataFrame, idCol: String): Boolean = {
    val changed = StagedCommit.tombstoneOnce(tombstonesPath, ids, idCol)
    if (changed) invalidate()
    changed
  }

  /** The committed-but-not-yet-purged tombstoned ids, or None — the
    * [[IvfIndex.pendingTombstones]] twin, for the streaming consumer's
    * delete-then-reinsert seam. */
  def pendingTombstones(): Option[DataFrame] =
    StagedCommit.readTombstones(spark, tombstonesPath)

  /** IN-PLACE VECTOR UPDATE — [[IvfIndex.update]]'s forest twin, same
    * token protocol verbatim: the APPEND token (salted, content-
    * derived) is the redelivery fence, checked FIRST, so a replayed
    * update never re-tombstones the rows it itself appended; a fresh
    * update tombstones the ids (masking all `numTables` copies at
    * once), physically purges them (id-keyed tombstones cannot tell
    * old copies from new — the purge must clear before the
    * replacements land), then appends the new vectors into their
    * bucket partitions. Crash-convergent at every seam for the same
    * reasons as the IVF op; `purgeDeletes` applies ALL pending
    * tombstones, which is always safe. */
  def update(emb: DataFrame, idCol: String, vecCol: String,
             salt: String = ""): Boolean = {
    if (emb.isEmpty) return false
    val token =
      (if (salt.isEmpty) "upd" else s"upd_$salt") + "_" +
        StagedCommit.idToken(emb, idCol, vecCol)
    val fresh = !StagedCommit.hasDelta(spark, rowsPath, token)
    if (fresh) {
      delete(emb.select(col(idCol)), idCol)
      purgeDeletes(idCol)
    }
    val applied = StagedCommit.appendOnce(rowsPath, token,
      Seq("tbl", "bucket"), bucketed(emb, idCol, vecCol))
    invalidate()
    applied
  }

  /** Physically apply the tombstones: rewrite ONLY the (tbl, bucket)
    * partitions holding a tombstoned row (dynamic partition overwrite
    * — the untouched forest never moves), then clear the tombstone
    * dir. Crash-convergent like the IVF purge: until the clear,
    * readers keep filtering; a retry recomputes the affected set from
    * what remains. Returns the number of partitions rewritten. */
  def purgeDeletes(idCol: String): Long = {
    val fs = new org.apache.hadoop.fs.Path(rowsPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    StagedCommit.readTombstones(spark, tombstonesPath) match {
      case None => 0L
      case Some(tomb) =>
        val raw = StagedCommit.readCommitted(spark, rowsPath)
        val hit = raw
          .join(tomb, raw(idCol) === tomb(tomb.columns.head), "left_semi")
          .select(col("tbl"), col("bucket")).distinct()
          .localCheckpoint()
        val n = hit.count()
        if (n > 0) {
          val kept = rows()
            .join(broadcast(hit), Seq("tbl", "bucket"), "left_semi")
            .repartition(col("tbl"), col("bucket"))
            .localCheckpoint()
          // drop the cache FIRST: the swap below replaces files the
          // cached frame references, and a kill inside it must not
          // leave later probes reading vanished paths (caught by
          // LshIndexSpec's pre-clear-kill case; the checkpointed
          // `kept` slice is already materialized)
          invalidate()
          // crash-safe rewrite (r18): the write-ahead-intent swap
          // replaces exactly the hit partitions' files — a kill
          // mid-swap rolls forward at the next committed read, and a
          // partition whose every row was tombstoned folds to EMPTY
          // (old files deleted, dir dropped) so nothing can resurrect
          // when the tombstones clear — the dead-dir sweep the old
          // dynamic-overwrite path hand-rolled
          StagedCommit.swapFiles(spark, rowsPath, kept,
            Seq("tbl", "bucket"), partDirsOf(hit))
        }
        graft.FailPoint.hit("lsh_purge_before_clear")
        fs.delete(new org.apache.hadoop.fs.Path(tombstonesPath), true)
        invalidate()
        n
    }
  }

  /** Per-table multiprobe bucket sets ([[Similarity.probeBuckets]]). */
  def queryProbeBuckets(query: Seq[Double], probes: Int): Seq[Seq[Long]] =
    Similarity.probeBuckets(planes, query, probes)

  /** Probe: read the query's bucket partition in each table (partition
    * pruning on (tbl, bucket)), dedup candidates by id, exact-cosine
    * re-rank — top-k of the candidate set only. `probes` > 1 adds the
    * multiprobe perturbation buckets (smallest-margin bit flips): each
    * extra probe reads one more partition per table — recall rises at a
    * bounded, corpus-size-independent IO cost, the standard alternative
    * to doubling the table count (which doubles the INDEX, not the
    * probe). */
  def search(idCol: String, vecCol: String, query: Seq[Double],
             k: Int, probes: Int = 1): DataFrame = {
    val q = array(query.map(lit): _*)
    val cond = queryProbeBuckets(query, probes).zipWithIndex
      .map { case (qbs, t) => col("tbl") === t && col("bucket").isin(qbs: _*) }
      .reduce(_ || _)
    rows().filter(cond)
      .select(col(idCol), col(vecCol))
      .dropDuplicates(idCol)
      .select(col(idCol),
        VectorFunctions.cosineRounded(col(vecCol).cast("array<double>"), q)
          .as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }
}

object LshIndex {
  /** Artifact path keyed by EVERY parameter that affects index content
    * (same stale-proofing as [[Dedup.pairTable]]): a plane-config change
    * can never silently probe an index built with different planes —
    * which the oracle could not catch, since it reads the same artifact. */
  def rowsPath(basePath: String, dim: Int, numTables: Int,
               bitsPerTable: Int, seed: Long): String =
    s"$basePath/lsh_rows_d${dim}_t${numTables}_b${bitsPerTable}_s$seed"
}
