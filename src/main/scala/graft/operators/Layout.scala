package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout optimization: Z-order (Morton-curve) clustering for
  * multi-column scan pruning.
  *
  * A 100 TB table is read through file/row-group min-max statistics: a
  * scan skips a file when the predicate's range cannot intersect the
  * file's [min, max] envelope. Sorting by ONE column gives perfect
  * envelopes for that column and useless (full-range) envelopes for
  * every other; interleaving the bits of two columns into a single sort
  * key (the Morton curve) keeps every file's envelope tight in BOTH
  * dimensions, so box predicates — and, crucially, predicates on the
  * SECOND column alone — still skip most of the table. This is the
  * standard lakehouse layout device (Delta/Iceberg `ZORDER BY`),
  * re-expressed here as plain deterministic column arithmetic plus a
  * range-partitioned sorted write.
  *
  * Everything is built from codegen'd bit expressions (shiftright/and),
  * so the z-value is pushdown-friendly, costs one scan-stage projection,
  * and is reproducible bit-for-bit by any engine with integer shifts —
  * which is what makes the z-value itself oracle-checkable.
  */
object Layout {

  /** Morton (Z-order) value of two integer columns: interleave the low
    * `bits` bits of `x` (even positions) and `y` (odd positions).
    * Values wider than `bits` bits — including negatives, whose low
    * bits are their two's-complement pattern — WRAP into the same key
    * space: the write stays correct (layout never changes content) but
    * wrapped values lose curve locality, so bucket/offset such columns
    * into [0, 2^bits) first.
    *
    * The expression is a flat sum of `2·bits` shift/mask terms — fully
    * codegen'd, no UDF; at the default 16 bits the projected key covers
    * a 65536×65536 grid, far finer than any realistic file count. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31]: $bits")
    val xs = x.cast("long")
    val ys = y.cast("long")
    (0 until bits).map { i =>
      (shiftright(xs, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(ys, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)
  }

  /** Hilbert-curve index of two integer columns — the better-locality
    * alternative to [[zValue]]: every unit step along the curve is a
    * unit step in the plane (Morton has seam jumps), so files covering
    * contiguous curve ranges get tighter (x, y) envelopes. The per-bit
    * state recurrence lives in one native codegen expression
    * ([[graft.functions.HilbertValue]]) because composing it from
    * built-in columns triples the expression tree per level under
    * CollapseProject — 3^bits nodes, a driver planning bomb. Same WRAP
    * contract as `zValue` for values wider than `bits`. */
  def hilbertValue(x: Column, y: Column, bits: Int = 16): Column = {
    import org.apache.spark.sql.GraftBridge.{column => c, expression => e}
    c(graft.functions.HilbertValue(
      e(x.cast("long")), e(y.cast("long")), bits))
  }

  /** Write `df` as parquet clustered on the Morton curve of (`xCol`,
    * `yCol`): range-partition on the z-value into `numFiles` output
    * partitions, sort within each, drop the helper column. Range
    * partitioning (not hash) is what makes file envelopes DISJOINT
    * along the curve — each file owns a contiguous z-range, i.e. a
    * small tile of the (x, y) plane. */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
                    numFiles: Int, bits: Int = 16): Unit =
    writeCurveClustered(df, path, zValue(col(xCol), col(yCol), bits), numFiles)

  /** [[writeZOrdered]] with the Hilbert key. */
  def writeHilbert(df: DataFrame, path: String, xCol: String, yCol: String,
                   numFiles: Int, bits: Int = 16): Unit =
    writeCurveClustered(df, path, hilbertValue(col(xCol), col(yCol), bits),
      numFiles)

  private def writeCurveClustered(df: DataFrame, path: String, key: Column,
                                  numFiles: Int): Unit = {
    require(numFiles >= 1, s"numFiles must be positive: $numFiles")
    df.withColumn("_z", key)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file [min, max] envelopes of two columns — the statistics a
    * stats-based scan planner prunes with, read back from the data
    * itself (one distributed aggregate over `input_file_name`, no
    * footer parsing). Output: (file, x_min, x_max, y_min, y_max). */
  def fileEnvelopes(spark: SparkSession, path: String,
                    xCol: String, yCol: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(xCol)).as("x_min"), max(col(xCol)).as("x_max"),
        min(col(yCol)).as("y_min"), max(col(yCol)).as("y_max"))

  /** How many files a box predicate `x in [x1,x2] AND y in [y1,y2]`
    * must read under the given envelopes (a file is read iff its
    * envelope intersects the box). The pruning-quality metric:
    * z-ordered layouts keep this near the box's area share; single-key
    * layouts degrade to ALL files as soon as the predicate touches the
    * unsorted dimension. */
  def filesIntersectingBox(envelopes: DataFrame,
                           x1: Long, x2: Long, y1: Long, y2: Long): Long =
    envelopes.filter(
      col("x_max") >= x1 && col("x_min") <= x2 &&
        col("y_max") >= y1 && col("y_min") <= y2)
      .count()
}
