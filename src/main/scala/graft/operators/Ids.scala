package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P2/W1 (SURVEY §2.2/§2.5): dense 1-based surrogate ids — the reference's
  * `AutoID` column (`3. loading-lambda-for-dynamodb.py:389-393`) — computed
  * WITHOUT a single-partition global window, so it survives 100 TB inputs.
  *
  * Strategy (two light passes, no global sort bottleneck):
  *   1. `repartitionByRange` + `sortWithinPartitions` on the order key —
  *      partitions are globally ordered, each internally sorted.
  *   2. tag rows with `monotonically_increasing_id()` (no shuffle; encodes
  *      (partition, local offset) and is monotonic within a partition).
  *   3. aggregate one row per partition (count + min tag) — the shuffle
  *      moves only `numPartitions` rows — and turn it into cumulative
  *      offsets on the driver (a few KB regardless of data size).
  *   4. broadcast-join the offsets back: id = tag - minTag(pid) + offset + 1.
  *
  * Determinism requires `orderCols` to be a total order (unique key) —
  * duplicates at range boundaries would otherwise be numbered arbitrarily.
  *
  * The tagged frame is persisted before the two dependent jobs:
  * `repartitionByRange` samples boundaries with a seed derived from the
  * physical RDD id, so two independent evaluations of the same plan can
  * pick DIFFERENT ranges — the offset pass and the output pass must share
  * one materialization or ids silently shift at partition boundaries.
  * (Same barrier `RDD.zipWithIndex` needs; disk-spillable, one pass.)
  */
object Ids {
  def withDenseId(df: DataFrame, idCol: String, orderCols: Seq[Column],
                  numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val tagged = df
      .repartitionByRange(parts, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn("_gpid", spark_partition_id())
      .withColumn("_gtag", monotonically_increasing_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // One tiny row per partition: (pid, rowCount, minTag).
    val perPart = tagged.groupBy("_gpid")
      .agg(count(lit(1)).as("_gcnt"), min("_gtag").as("_gmin"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val offsets = perPart.scanLeft(0L)(_ + _._2).zip(perPart).map {
      case (cum, (pid, _, minTag)) => (pid, cum, minTag)
    }
    val offDf = spark.createDataFrame(offsets.toSeq)
      .toDF("_gpid", "_goff", "_gmin")

    tagged.join(broadcast(offDf), "_gpid")
      .withColumn(idCol, col("_gtag") - col("_gmin") + col("_goff") + lit(1L))
      .drop("_gpid", "_gtag", "_goff", "_gmin")
  }
}
