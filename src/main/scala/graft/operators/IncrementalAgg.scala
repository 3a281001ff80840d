package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of a grouped report from mergeable partial
  * state — the pattern that turns the reference's rebuild-the-report
  * jobs (R21 report base, R23 daily summaries) into an append-only
  * daily increment at 100 TB: keep per-group algebraic state
  * (count, decimal sum, min, max), fold each new batch in, and derive
  * the presentation measures (avg = sum/count) only at read time.
  *
  * Scale posture: an increment shuffles ONLY the new batch (aggregated
  * to group grain before it touches the state table) plus the
  * state-table groups — never the historical fact data. `merge` is a
  * union + re-aggregate of two group-grain tables: Catalyst plans one
  * hash aggregate over the union, partial-aggregated on each input, so
  * the cost is O(|state| + |delta groups|). Associativity makes the
  * fold order irrelevant — state(A∪B) == merge(state(A), state(B)) —
  * which is also what the spec and the `a27_incremental_report` gate
  * assert against a from-scratch rebuild.
  */
object IncrementalAgg {

  private val stateCols = Seq("_n", "_sum", "_min", "_max")

  /** Aggregate one batch of fact rows to group-grain mergeable state. */
  def state(batch: DataFrame, keys: Seq[String],
      valCol: String): DataFrame = {
    val v = col(valCol).cast("decimal(18,4)")
    batch.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("_n"), sum(v).as("_sum"),
        min(v).as("_min"), max(v).as("_max"))
  }

  /** Fold a fact-grain delta batch into existing state. */
  def merge(state0: DataFrame, keys: Seq[String], valCol: String,
      delta: DataFrame): DataFrame = {
    require(stateCols.forall(state0.columns.contains),
      s"state is missing mergeable columns $stateCols: " +
        state0.columns.mkString(", "))
    val d = state(delta, keys, valCol)
    state0.unionByName(d)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_n")).cast("long").as("_n"), sum(col("_sum")).as("_sum"),
        min(col("_min")).as("_min"), max(col("_max")).as("_max"))
  }

  /** RETRACTABLE state for CDF-driven maintenance: (count, sum) only —
    * the subtractable subalgebra. min/max are deliberately absent: a
    * delete can retire the current extremum and no incremental state
    * short of a per-group value sketch can recover the runner-up; keep
    * them on the append-only [[state]] path or recompute. */
  def sumState(batch: DataFrame, keys: Seq[String],
      valCol: String): DataFrame =
    batch.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("_n"),
        sum(col(valCol).cast("decimal(18,4)")).as("_sum"))

  /** CDF-DRIVEN incremental view maintenance — the reference's
    * report-building trigger (`2.2 loading-lambda-for-mysql.py:
    * 344-375`) made incremental: fold a change feed
    * ([[Upsert.changesBetween]] / the streaming CDF source's rows —
    * insert / update pre+post images / delete, tagged by `changeCol`)
    * into (count, sum) group state. Post-side rows add, pre-side and
    * delete rows RETRACT; a group whose count nets to zero drops out
    * of the view entirely. Cost is O(|state| + |changed groups|):
    * the feed aggregates to group grain before touching the state —
    * never the fact table, which is the whole point at 100 TB.
    * Associative and replay-order-free across DISJOINT interval feeds
    * (each key change appears in exactly one interval; folding the
    * concatenation equals folding one combined diff — spec-proved).
    * NOTE: replaying the SAME feed twice double-retracts — feed
    * consumption must be exactly-once (the CDF source's interval
    * tokens / Structured Streaming's file checkpoint provide it). */
  def applyChanges(state0: DataFrame, keys: Seq[String], valCol: String,
      feed: DataFrame, changeCol: String = "_change_type"): DataFrame = {
    require(Seq("_n", "_sum").forall(state0.columns.contains),
      s"state is missing (_n, _sum): ${state0.columns.mkString(", ")}")
    val add = col(changeCol).isin("insert", "update_postimage")
    val v = col(valCol).cast("decimal(18,4)")
    // negate the VALUE, not multiply by a sign literal: unary minus
    // keeps decimal(18,4), so the delta's sum type matches the
    // state's and the union below never coerces
    val d = feed.groupBy(keys.map(col): _*)
      .agg(sum(when(add, lit(1L)).otherwise(lit(-1L))).cast("long")
          .as("_n"),
        sum(when(add, v).otherwise(-v)).as("_sum"))
    state0.select((keys.map(col) :+ col("_n") :+ col("_sum")): _*)
      .unionByName(d)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_n")).cast("long").as("_n"),
        sum(col("_sum")).as("_sum"))
      .filter(col("_n") =!= 0)
  }

  /** Presentation view of retractable state. */
  def reportSums(state0: DataFrame, keys: Seq[String]): DataFrame =
    state0.select(
      keys.map(col) ++ Seq(
        col("_n").as("n"),
        col("_sum").cast("double").as("total"),
        (col("_sum").cast("double") / col("_n").cast("double"))
          .as("mean")): _*)

  /** Presentation view of the state: derived measures, no extra pass. */
  def report(state0: DataFrame, keys: Seq[String]): DataFrame =
    state0.select(
      keys.map(col) ++ Seq(
        col("_n").as("n"),
        col("_sum").cast("double").as("total"),
        // double/double, not decimal division: decimal-quotient scale
        // rules differ across engines, the IEEE quotient does not
        (col("_sum").cast("double") / col("_n").cast("double")).as("mean"),
        col("_min").cast("double").as("vmin"),
        col("_max").cast("double").as("vmax")): _*)
}
