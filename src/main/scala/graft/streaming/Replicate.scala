package graft.streaming

import graft.operators.Upsert
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** TABLE-TO-TABLE REPLICATION — the capstone composition of the
  * lakehouse surface: a manifested source table's changes flow out
  * through the CDF source ([[CdfSource]]) and into a manifested
  * replica through the CDC apply sink ([[MergeSink.startCdc]]), both
  * halves the same operators every other pipeline uses. Nothing here
  * is new machinery; the object exists because the composition has two
  * load-bearing choices a caller should not have to rediscover:
  *
  *  - **The feed's interval epoch is the replica's version column.**
  *    Within one feed interval a key carries at most ONE change
  *    (endpoint diff), but a file-stream micro-batch can coalesce
  *    SEVERAL intervals — and the source table's own version column
  *    cannot order an update against a later delete of the same key
  *    (the delete pre-image carries the same version it deleted).
  *    `_to_epoch` can: it is strictly monotone over intervals, so the
  *    net-effect window in the apply sink always resolves a key to its
  *    LATEST interval's change, whatever the batching.
  *  - **Seed-then-tail overlap is harmless by construction.** [[seed]]
  *    snapshots the source at its active epoch `e` and stamps every
  *    row `_to_epoch = e`; a feed that (re)plays intervals at or below
  *    `e` loses the max-version resolution to the seed, and intervals
  *    above `e` win — so the seed/tail boundary needs no coordination,
  *    and a feed that started from table creation (epoch 0) simply
  *    re-applies history as no-ops.
  *
  * Replica shape: the source's columns plus `_to_epoch` (replication
  * metadata — drop it on read if unwanted). Schema evolution
  * (VERDICT r15 #5): ADDED source columns arrive via the feed's
  * add-evolution merges. A source RENAME is applied to the REPLICA at
  * the next [[start]] (the feed's `_cdfmeta_` events are the
  * authority — [[syncRenames]]), so the value lineage stays one
  * column on both sides; the schema-versioned feed then serves even
  * not-yet-consumed pre-rename intervals under the new name. A source
  * DROP is NOT replayed (replication replays data changes, not schema
  * retirement): the replica keeps the retired column, and [[start]]
  * pads the events with it as typed nulls — retirement is
  * CONSUMPTION-time: any update consumed after the drop carries null
  * there (even one that OCCURRED before the drop but sat unconsumed
  * in a pre-drop span — the feed serves the source's current schema,
  * and the source's head no longer has the value either), while
  * untouched rows keep their last value. Restart boundary caveat: a streaming
  * schema is pinned at start, so a rename landing while a tail RUNS
  * is only picked up at the next start — with the poll-then-
  * AvailableNow pattern every drain is such a boundary.
  * At-least-once delivery anywhere in the chain lands exactly-once
  * content: every stage is max-version / key-batch idempotent. */
object Replicate {

  /** Apply the source's rename events (recorded beside the feed) to
    * the replica, oldest first, so the replicated value lineage keeps
    * ONE column name on both sides. Skips events the replica already
    * reflects (seeded post-rename) and events whose NEW spelling the
    * replica somehow grew independently (two lineages cannot merge —
    * the add-evolution column stands and the old one freezes). */
  private[streaming] def syncRenames(spark: SparkSession, feedDir: String,
      dstTable: String): Unit =
    CdfSource.feedEvents(spark, feedDir).foreach {
      case (_, "rename", oldName, newName) =>
        Upsert.manifestedSchema(spark, dstTable).foreach { sch =>
          val hasOld = sch.fieldNames.exists(_.equalsIgnoreCase(oldName))
          val hasNew = sch.fieldNames.exists(_.equalsIgnoreCase(newName))
          if (hasOld && !hasNew)
            Upsert.renameManifestedColumn(spark, dstTable, oldName,
              newName)
        }
      case _ => ()
    }

  /** Snapshot the source's ACTIVE epoch into the replica, stamped with
    * that epoch as its version. Returns the seeded epoch. Idempotent:
    * re-seeding merges the same rows at the same version. */
  def seed(spark: SparkSession, srcTable: String, dstTable: String,
           keys: Seq[String], partitionCol: String): Long = {
    val e = Upsert.manifestedEpoch(spark, srcTable).getOrElse(
      throw new IllegalStateException(s"no manifest under $srcTable"))
    // read AT the fetched epoch, not the active one — a concurrent
    // merge between the two calls must not tear the (rows, stamp) pair
    Upsert.mergeIntoManifested(spark, dstTable,
      Upsert.readManifestedAt(spark, srcTable, e)
        .withColumn("_to_epoch", lit(e)),
      keys, partitionCol, "_to_epoch")
    e
  }

  /** Tail the feed into the replica: one streaming query, the CDC
    * apply sink fed by the CDF file stream. Pre-images drop (the apply
    * needs net effects), deletes map to the sink's op protocol, and
    * `_to_epoch` rides as the version column per the ordering argument
    * above. Run [[CdfSource.pollOnce]] (or its live pump) against
    * `feedDir` to keep the feed flowing; this query picks up whatever
    * lands. */
  def start(spark: SparkSession, srcTable: String, feedDir: String,
            dstTable: String, keys: Seq[String], partitionCol: String,
            checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    // schema convergence at the restart boundary: replay the source's
    // renames onto the replica FIRST (the feed serves everything under
    // post-rename names), then pad the events with any replica column
    // the source has since DROPPED — the merge's no-dropped-columns
    // guard would otherwise refuse the batch, and null is the correct
    // post-retirement value for rows the tail still updates
    syncRenames(spark, feedDir, dstTable)
    val events0 = CdfSource.feedStream(spark, srcTable, keys, feedDir)
      .filter(col("_change_type") =!= "update_preimage")
      .withColumn("op",
        when(col("_change_type") === "delete", lit("delete"))
          .otherwise(lit("upsert")))
      .drop("_change_type", "_from_epoch")
    val events = Upsert.manifestedSchema(spark, dstTable)
      .fold(events0)(sch => sch.fields.foldLeft(events0) { (df, f) =>
        if (df.columns.exists(_.equalsIgnoreCase(f.name))) df
        else df.withColumn(f.name, lit(null).cast(f.dataType))
      })
    // MID-RUN RENAME GUARD: this stream's schema (and its lineage
    // projection) is pinned NOW — a rename event recorded after this
    // point means later feed files carry a name the pinned read maps
    // to null, and applying those batches would silently null-clobber
    // replica values. Fail the query BEFORE such a batch commits (the
    // checkpoint does not advance), so the restarted tail — which
    // re-pins the schema and replays the rename via syncRenames —
    // re-processes it correctly. A mid-run DROP needs no guard: the
    // pinned schema still carries the column, post-drop files read it
    // as null, and null IS the freeze semantics.
    // (and a mid-run WIDENING likewise: post-widen feed files store
    // the wider physical type the pinned narrow schema cannot read —
    // same guard, same restart-converges contract; the restarted tail
    // re-pins wide and the replica's merge widens via add-and-widen
    // evolution)
    val eventEpochAtStart = CdfSource.feedEvents(spark, feedDir)
      .collect { case (e, "rename" | "widen", _, _) => e }
      .maxOption.getOrElse(0L)
    val guard = () => {
      val latest = CdfSource.feedEvents(spark, feedDir)
        .collect { case (e, "rename" | "widen", _, _) => e }
        .maxOption.getOrElse(0L)
      if (latest > eventEpochAtStart)
        throw new IllegalStateException(
          s"Replicate: a source rename or type widening landed at " +
            s"epoch $latest while this tail was running — its schema " +
            "was pinned at start, so applying further batches would " +
            "null-clobber the renamed column or fail on the widened " +
            "type. Restart the tail: the restart replays the event " +
            "onto the replica and re-processes this batch correctly " +
            "(the checkpoint did not advance).")
    }
    MergeSink.startCdc(events, dstTable, keys, partitionCol,
      "_to_epoch", "op", checkpointDir, trigger, preBatch = guard)
  }
}
