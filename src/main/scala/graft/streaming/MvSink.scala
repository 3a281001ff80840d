package graft.streaming

import graft.operators.IncrementalAgg
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** STREAMING MATERIALIZED-VIEW MAINTENANCE — the last stage of the
  * incremental-report pipeline: source table → CDF source
  * ([[CdfSource.feedStream]]) → this sink folding each feed
  * micro-batch into persistent (count, sum) group state via
  * [[IncrementalAgg.applyChanges]]. The reference rebuilt its report
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
           stateDir: String): Unit = {
    val spark = snapshot.sparkSession
    val fs = fsOf(spark, stateDir)
    val marker = new org.apache.hadoop.fs.Path(stateDir, "_mvstate_seed")
    if (fs.exists(marker)) return
    IncrementalAgg.sumState(snapshot, grp, valCol)
      .write.mode(SaveMode.Overwrite).parquet(s"$stateDir/mv_seed")
    fs.create(marker, true).close()
  }

  /** Tail a CDF feed stream into the state. */
  def start(feed: DataFrame, grp: Seq[String], valCol: String,
            stateDir: String, checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val spark = feed.sparkSession
    feed.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(spark, batch, batchId, grp, valCol, stateDir)
      }
      .start()
  }

  /** One batch, exactly once per id. Public for spec-level chaos. */
  private[streaming] def applyBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, grp: Seq[String], valCol: String,
      stateDir: String): Unit = {
    val fs = fsOf(spark, stateDir)
    val marker =
      new org.apache.hadoop.fs.Path(stateDir, s"_mvstate_b$batchId")
    if (fs.exists(marker)) return // replayed batch: already folded
    if (batch.isEmpty) return // nothing to fold; no version for nothing
    val cur = readState(spark, stateDir).getOrElse(
      throw new IllegalStateException(
        s"MV state at $stateDir was never seeded — call MvSink.seed " +
          "with the base snapshot before tailing the feed"))
    // localCheckpoint: the new version must not lazily read the very
    // dirs the sweep below may reclaim, and Overwrite-into-read paths
    // are the classic self-read hazard
    val next = IncrementalAgg.applyChanges(cur, grp, valCol, batch)
      .localCheckpoint(true)
    next.write.mode(SaveMode.Overwrite).parquet(s"$stateDir/mv_b$batchId")
    graft.FailPoint.hit("mv_after_state_write")
    fs.create(marker, true).close()
    // sweep versions older than the previous one (lazy-reader floor)
    val p = new org.apache.hadoop.fs.Path(stateDir)
    val ids = fs.listStatus(p).toSeq.map(_.getPath.getName).collect {
      case BatchMarker(n) => n.toLong
    }.sorted
    ids.dropRight(2).foreach { old =>
      fs.delete(new org.apache.hadoop.fs.Path(stateDir, s"mv_b$old"), true)
      fs.delete(new org.apache.hadoop.fs.Path(stateDir, s"_mvstate_b$old"),
        false)
    }
  }
}
