package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent binary-quantization index — the build-once/probe-many
  * artifact form of [[Similarity.bqTopK]] (which encodes in-plan on
  * every call):
  *
  *   `<base>/bq_rows`   — (id, vector, `_bqw` packed sign-bit code),
  *                        appendOnce-maintained parquet;
  *   `<base>/bq_means`  — the 6-dp-rounded per-dimension centering
  *                        thresholds the codes were cut at (one row
  *                        per dim), written once at build.
  *
  * The 100 TB story is columnar: the candidate pass selects only
  * (id, `_bqw`) — parquet column pruning reads the 1-bit-per-dim code
  * stream (32× less IO than float32 vectors), and only the `rerank`
  * survivors' full vectors are fetched for the exact pass (an id-IN
  * pushdown filter over the same table).
  *
  * Appends FREEZE the quantizer (the stored means — the FAISS
  * `add`-after-`train` shape, same contract as [[IvfIndex.append]]):
  * delta rows are encoded under the build-time thresholds, land
  * exactly-once via [[StagedCommit.appendOnce]], and every read goes
  * through [[StagedCommit.readCommitted]], so a probe racing a
  * killed-then-retried append never sees a partial delta. Code
  * quality degrades only as far as the corpus mean drifts from the
  * training corpus; a periodic [[build]] re-centers. */
final class BqIndex(spark: SparkSession, basePath: String) {

  private def rowsPath = s"$basePath/bq_rows"
  private def meansPath = s"$basePath/bq_means"

  def exists(): Boolean =
    new org.apache.hadoop.fs.Path(meansPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(s"$meansPath/_SUCCESS"))

  /** Train (per-dim means) + encode + persist. Means are written LAST:
    * their `_SUCCESS` is the build-complete certificate [[exists]]
    * probes, so a crashed build is retried whole. */
  def build(emb: DataFrame, idCol: String, vecCol: String): Unit = {
    val means = Similarity.bqMeans(emb, vecCol)
    emb.select(col(idCol), col(vecCol),
        expr(Similarity.bqWordsExpr(vecCol, means)).as("_bqw"))
      .write.mode(SaveMode.Overwrite).parquet(rowsPath)
    import spark.implicits._
    means.zipWithIndex.map { case (m, i) => (i, m) }.toDF("dim", "mean")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(meansPath)
  }

  /** The build-time centering thresholds, dim order. */
  def storedMeans(): Seq[Double] =
    spark.read.parquet(meansPath).orderBy(col("dim"))
      .collect().map(_.getDouble(1)).toSeq

  /** Frozen-quantizer append: encode the delta under the STORED means
    * and land it exactly once per content token. A redelivered batch
    * is a no-op; a killed rename is invisible to [[search]] until the
    * retry completes it. */
  def append(emb: DataFrame, idCol: String, vecCol: String): Unit = {
    require(exists(), s"no complete BQ index at $basePath")
    val means = storedMeans()
    val token = StagedCommit.idToken(emb, idCol, vecCol)
    StagedCommit.appendOnce(rowsPath, token, Nil,
      emb.select(col(idCol), col(vecCol),
        expr(Similarity.bqWordsExpr(vecCol, means)).as("_bqw")))
    ()
  }

  private def tombstonesPath = s"$basePath/bq_tombstones"

  /** Committed-only view of the encoded corpus, with tombstones
    * ([[delete]]) resolved at this single choke point — the candidate
    * pass, the rerank pass, and [[compact]] all read through here, so
    * a deleted row is invisible everywhere the moment its tombstone
    * commits. */
  def rows(): DataFrame = {
    val base = StagedCommit.readCommitted(spark, rowsPath)
    StagedCommit.readTombstones(spark, tombstonesPath).fold(base)(t =>
      base.join(t, Seq(t.columns.head), "left_anti"))
  }

  /** TOMBSTONE DELETE: record the ids as one exactly-once delta
    * (content token — a redelivered id set no-ops, returns false).
    * Zero data movement; [[purgeDeletes]] applies them physically. */
  def delete(ids: DataFrame, idCol: String): Boolean = {
    require(exists(), s"no complete BQ index at $basePath")
    StagedCommit.tombstoneOnce(tombstonesPath, ids, idCol)
  }

  /** Physically apply the tombstones: fold the committed-minus-
    * tombstoned view into fresh base files via the [[compact]]
    * machinery (marker-preserving — redelivered old appends keep
    * no-opping), then clear the tombstone dir. Crash-convergent: until
    * the final clear, readers keep filtering through the tombstones —
    * rows already folded away match nothing, and a retry re-runs the
    * fold over what is still on disk. Returns whether a rewrite
    * happened (false = no tombstones existed). */
  def purgeDeletes(maxFiles: Int = 1): Boolean = {
    val fs = new org.apache.hadoop.fs.Path(basePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (StagedCommit.readTombstones(spark, tombstonesPath).isEmpty)
      return false
    rewriteBase(maxFiles)
    graft.FailPoint.hit("bq_purge_before_clear")
    fs.delete(new org.apache.hadoop.fs.Path(tombstonesPath), true)
    true
  }

  /** Compact append-fragmented committed rows into fresh base files —
    * the unpartitioned analog of [[LshIndex.compact]]. Every [[append]]
    * adds at least one delta file that every probe's listing and scan
    * pays for; past `maxFiles` this folds the committed view into one
    * write. The `_delta_*_SUCCESS` markers are PRESERVED (they live at
    * the table root, next to the data files a plain Overwrite would
    * wipe): a redelivered old batch must keep no-opping after its rows
    * were folded into base files, or compaction would reopen the
    * exactly-once window. Crash-safe since r18: the swap runs through
    * [[StagedCommit.swapBase]]'s write-ahead intent — a kill mid-swap
    * rolls forward at the next committed read instead of requiring a
    * rebuild. Returns whether a rewrite happened. */
  def compact(maxFiles: Int = 1, markerKeep: Int = 64): Boolean = {
    val root = new org.apache.hadoop.fs.Path(rowsPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a prior compact may have died mid-swap: heal before counting
    StagedCommit.recoverSwapAt(spark, rowsPath)
    val dataFiles = fs.listStatus(root).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    if (dataFiles.length <= maxFiles) return false
    rewriteBase(maxFiles)
    // marker-growth bound — family symmetry with IvfIndex/LshIndex
    // .compact: fold old _delta_ markers into the token manifest
    StagedCommit.foldMarkers(spark, rowsPath, markerKeep)
    true
  }

  /** Fold the committed (tombstone-resolved) view into `maxFiles`
    * fresh base files — the shared swap behind [[compact]] and
    * [[purgeDeletes]]. Markers preserved. Crash-safe since r18:
    * [[StagedCommit.swapBase]]'s write-ahead intent means a kill
    * mid-swap rolls forward at the next committed read instead of
    * requiring a rebuild. The snapshot stays lazy — the stage write
    * runs while the old files still exist. Compacted files take base
    * names (never the `delta_` prefix): readCommitted includes them
    * unconditionally. At real scale set `maxFiles` to the file count
    * the probe should pay, not 1. */
  private def rewriteBase(maxFiles: Int): Unit =
    StagedCommit.swapBase(spark, rowsPath, rows(), maxFiles)

  /** Hamming-prefilter + exact-cosine top-k over the stored codes.
    * Candidate pass touches only (id, code) columns; the exact pass
    * re-reads just the `rerank` survivors' vectors. Deterministic:
    * same tie-breaks as [[Similarity.bqTopK]]. */
  def search(idCol: String, vecCol: String, query: Seq[Double], k: Int,
             rerank: Int): DataFrame = {
    require(rerank >= k, s"rerank ($rerank) must be >= k ($k)")
    val means = storedMeans()
    val qWords = Similarity.bqQueryWords(query, means)
    val candIds = rows()
      .select(col(idCol), col("_bqw"))
      .withColumn("_ham", expr(Similarity.bqHammingExpr(qWords)))
      .orderBy(col("_ham").asc, col(idCol).asc)
      .limit(rerank)
      .select(col(idCol)).collect().map(_.get(0))
    val q = array(query.map(lit): _*)
    rows().filter(col(idCol).isin(candIds: _*))
      .select(col(idCol),
        graft.functions.VectorFunctions
          .cosineRounded(col(vecCol).cast("array<double>"), q).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }
}
