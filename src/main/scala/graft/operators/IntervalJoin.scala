package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join via bucket decomposition.
  *
  * Spark has no native range-join operator: `a JOIN b ON pt BETWEEN lo
  * AND hi` plans as BroadcastNestedLoopJoin (one side must fit in
  * memory) or a cartesian product — both quadratic walls at 100 TB.
  * The standard fix (the same device behind Databricks' range-join
  * binning) is to overlay a fixed grid: every point lands in exactly
  * one bucket of width `bucketWidth`, every interval EXPLODES to the
  * buckets it touches, and a plain equi-join on the bucket id meets
  * each qualifying (point, interval) pair exactly once — the residual
  * BETWEEN predicate then filters the within-bucket false positives.
  * Shuffle-wise this is one hash join whose left side is |points| and
  * whose right side is |intervals| · (len/bucketWidth + 1) rows;
  * Catalyst/AQE pick the join strategy and handle hot buckets (a
  * popular time window) with skew-join splitting.
  *
  * `bucketWidth` trades replication against filter selectivity: a
  * width near the median interval length keeps the blow-up ≤ 2× while
  * keeping each bucket's candidate product small. Intervals with
  * `hi < lo` match nothing (standard BETWEEN semantics) and are
  * dropped before the explode — which also guards Spark's `sequence`
  * reversal on descending bounds.
  *
  * Sibling: [[RangeJoin.windowBefore]] covers the KEYED, fixed-width
  * special case ("right rows in the w seconds before each left row per
  * key") with exactly 2× replication; this operator is the general
  * form — key-less containment against intervals of VARIABLE length,
  * replicated per interval to however many grid cells it spans.
  */
object IntervalJoin {

  /** Inner-join `points` rows to every `intervals` row whose closed
    * interval [`loCol`, `hiCol`] contains `ptCol`. All three columns
    * must be integral (days-since-epoch, unix seconds, ids — any
    * monotone integer coordinate). Output: the point row's columns
    * followed by the interval row's (names must not collide apart from
    * the coordinate columns, which both survive).
    *
    * `maxCells` bounds the per-interval replication in-plan
    * (`raise_error`, the refuse-loudly idiom): an interval spanning
    * more cells than that is almost always a unit bug — millisecond
    * bounds against a seconds-sized `bucketWidth` would silently
    * replicate every interval 1000×, the quadratic this operator
    * exists to avoid. Raise it deliberately for genuinely long-lived
    * intervals. */
  def pointInInterval(points: DataFrame, ptCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Long, maxCells: Int = 4096): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    require(maxCells >= 2,
      s"maxCells must allow at least a 2-cell span: $maxCells")
    val overlap = points.columns.toSet
      .intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"points and intervals share column names: ${overlap.mkString(", ")}" +
        " — rename before joining so outputs stay unambiguous")
    val pb = points.withColumn("_bkt",
      floor(col(ptCol) / lit(bucketWidth)).cast("long"))
    val loCell = floor(col(loCol) / lit(bucketWidth)).cast("long")
    val hiCell = floor(col(hiCol) / lit(bucketWidth)).cast("long")
    val hiGuarded = when(hiCell - loCell < maxCells, hiCell)
      .otherwise(raise_error(concat(
        lit(s"pointInInterval: an interval spans more than $maxCells " +
          s"cells of width $bucketWidth (unit mismatch? raise maxCells " +
          "deliberately for long intervals): ["),
        col(loCol).cast("string"), lit(", "), col(hiCol).cast("string"),
        lit("]"))))
    val ib = intervals
      .filter(col(hiCol) >= col(loCol)) // empty intervals match nothing
      .withColumn("_bkt", explode(sequence(loCell, hiGuarded)))
    pb.join(ib, Seq("_bkt"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("_bkt")
  }
}
