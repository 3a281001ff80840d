package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY §7.4 / 100 TB posture): when one join key
  * carries a disproportionate share of rows, a plain shuffle join lands
  * the whole key on one task. Salting splits the hot key across
  * `saltBuckets` tasks: the skewed side gets a deterministic salt derived
  * from its row content, the small side is replicated once per bucket,
  * and the join key becomes (key, salt).
  *
  * AQE's skew-join handles the sort-merge case adaptively at runtime;
  * explicit salting remains necessary for aggregation-into-join patterns
  * and for engines/paths AQE doesn't cover (e.g. streaming state keyed
  * on the hot column). Aggregations themselves rarely need salting in
  * Spark — partial (map-side) aggregation already absorbs skew unless
  * cardinality explodes; `saltedDistinctCount` shows the two-phase shape
  * for when it does.
  */
object Salting {

  /** Salted inner equi-join: `skewed` is the big/skewed side, `small`
    * the dimension side (replicated `saltBuckets`×). Deterministic salt:
    * a hash of the skewed row's non-key columns (falls back to the key
    * itself for key-only frames), so replays salt identically. */
  def saltedJoin(skewed: DataFrame, small: DataFrame, keys: Seq[String],
                 saltBuckets: Int): DataFrame = {
    val nonKey = skewed.columns.filterNot(keys.contains)
    val saltSrc: Seq[Column] =
      (if (nonKey.nonEmpty) nonKey.toSeq else keys).map(col)
    val l = skewed.withColumn("_salt",
      pmod(xxhash64(saltSrc: _*), lit(saltBuckets.toLong)))
    val r = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1))))
    l.join(r, keys :+ "_salt").drop("_salt")
  }

  /** Two-phase distinct-count: pre-aggregate per (key, salt) then merge —
    * the shape that bounds per-task state when one key dominates. */
  def saltedDistinctCount(df: DataFrame, keys: Seq[String], valueCol: String,
                          saltBuckets: Int): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(col(valueCol)), lit(saltBuckets.toLong)))
    salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(count_distinct(col(valueCol)).as("_partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).as("n_distinct"))
  }
}
