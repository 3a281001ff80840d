package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact order statistics without a global sort — the 100 TB answer to
  * "what is the median". `percentile(...)` (and the a12 gate) buffers
  * every group's values; a global exact quantile done that way sorts
  * or collects the whole column. This instead runs histogram-guided
  * selection (the classic distributed k-th-smallest): each round is
  * one combinable equi-width histogram over the surviving rows
  * (shuffle = ≤`buckets` counter cells), the driver walks the
  * cumulative counts to find the bucket holding the k-th value, and
  * the candidate set narrows by ~`buckets`× — so 2-3 rounds pin
  * 100 TB down to a slice small enough to TakeOrdered.
  *
  * Membership across rounds is the ACCUMULATED bucket predicate — the
  * same floor expression that produced the histogram counts — so the
  * k adjustment is exact even where float division rounds a
  * boundary value into the neighboring bucket. A slack value-range
  * conjunct (one bucket width each side, a strict superset of the
  * bucket) rides along purely so parquet min/max statistics can prune
  * row groups in the narrowed rounds.
  */
object Quantiles {

  /** The exact q-quantile of `valueCol` under kth-smallest semantics
    * (k = ⌈q·n⌉ — `percentile_disc`, no interpolation): a value the
    * column actually contains, which is what makes the answer
    * engine-portable where interpolated doubles drift.
    *
    * `maxSelect` caps the final sorted fetch; `buckets` is the
    * histogram width (candidate shrink factor per round). */
  def exactQuantile(df: DataFrame, valueCol: String, q: Double,
                    buckets: Int = 4096,
                    maxSelect: Int = 100000): Double = {
    require(q > 0.0 && q <= 1.0, s"quantile must be in (0,1]: $q")
    require(buckets >= 2 && maxSelect >= 1,
      s"degenerate search dims: buckets=$buckets maxSelect=$maxSelect")
    val vals = df.select(col(valueCol).cast("double").as("_v"))
      .filter(col("_v").isNotNull && !col("_v").isNaN)
    val head = vals.agg(count(lit(1)), min(col("_v")), max(col("_v"))).head()
    val n = head.getLong(0)
    require(n > 0, s"quantile of an empty column: $valueCol")
    var k = math.ceil(q * n).toLong
    var lo = head.getDouble(1)
    var hi = head.getDouble(2)
    var cnt = n
    var pred: Column = lit(true)
    while (lo < hi && cnt > maxSelect) {
      val width = (hi - lo) / buckets
      val bucketExpr = least(
        floor((col("_v") - lit(lo)) / lit(width)).cast("int"),
        lit(buckets - 1))
      val hist = vals.filter(pred)
        .groupBy(bucketExpr.as("_b")).agg(count(lit(1)).as("_n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1))
        .sortBy(_._1)
      var cum = 0L
      var b = Int.MinValue
      var inBucket = 0L
      hist.iterator.takeWhile(_ => b == Int.MinValue)
        .foreach { case (bi, bn) =>
          if (cum + bn >= k) { b = bi; inBucket = bn } else cum += bn
        }
      val nLo = lo + b.toDouble * width
      val nHi = math.min(hi, nLo + width)
      if (nLo == lo && nHi == hi) {
        // float resolution exhausted — the range cannot narrow: sort
        // the survivors as they stand
        cnt = -1L
      } else {
        // exact membership: the bucket expression itself; slack range
        // conjunct (superset of the bucket) only for parquet pruning
        pred = pred && bucketExpr === lit(b) &&
          col("_v") >= lit(nLo - width) &&
          col("_v") <= lit(math.min(hi, nHi + width))
        k -= cum
        cnt = inBucket
        lo = nLo
        hi = nHi
      }
    }
    if (lo == hi) lo
    else {
      require(k <= Int.MaxValue, s"selection k overflows an Int: $k")
      vals.filter(pred).orderBy(col("_v")).limit(k.toInt)
        .agg(max(col("_v"))).head().getDouble(0)
    }
  }
}
