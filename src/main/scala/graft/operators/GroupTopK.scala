package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-group top-k as a custom typed [[Aggregator]] (the preference-order
  * "(b) custom TypedColumn/aggregate" extension point).
  *
  * The stock formulation — `row_number().over(partitionBy(g).orderBy(v
  * desc)) <= k` — shuffles and sorts EVERY row of every group. This
  * aggregator keeps a bounded k-element buffer per (task, group) instead:
  * partial aggregation truncates to k on every insert/merge, so the
  * shuffle carries at most k rows' worth of state per group per map task
  * and the reducer merges k-sized lists. For "top 3 of a billion-row
  * group" that is the difference between shuffling the group and
  * shuffling 3 rows per upstream task — same reason `TakeOrderedAndProject`
  * exists for the global case.
  *
  * Ordering is the lexicographic (score, id) pair descending, so results
  * are deterministic under ties. The buffer is a sorted Seq: k is small
  * by design (top-k, not top-k-million), so insertion cost k·log k per
  * batch is noise next to shuffle savings; the merge is a k-bounded
  * sorted merge.
  *
  * Reference context: the reference has no top-k (its scalar fetches are
  * `cur.fetchone()` first-row reads, `2.2 loading-lambda-for-mysql.py:
  * 776-793` — our O2); this operator is part of the LLM-pipeline
  * extension surface (per-group best-k sampling/selection).
  */
object GroupTopK {

  type Entry = (Double, Long) // (score, id), compared lexicographically

  /** Typed aggregator: reduce/merge keep only the k largest entries. */
  final class TopKAggregator(k: Int)
      extends Aggregator[Entry, Seq[Entry], Seq[Entry]] {
    require(k > 0, "k must be positive")
    private val ord = Ordering[Entry].reverse // descending

    override def zero: Seq[Entry] = Vector.empty

    override def reduce(buf: Seq[Entry], e: Entry): Seq[Entry] =
      if (buf.size < k) (buf :+ e).sorted(ord)
      // buf is sorted descending, so buf.last is the current kth best;
      // skip e only when it ranks strictly below it (NATURAL ordering —
      // comparing through the reversed `ord` here flips the test)
      else if (Ordering[Entry].lt(e, buf.last)) buf
      else (buf :+ e).sorted(ord).take(k)

    override def merge(a: Seq[Entry], b: Seq[Entry]): Seq[Entry] =
      (a ++ b).sorted(ord).take(k)

    override def finish(r: Seq[Entry]): Seq[Entry] = r

    override def bufferEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
    override def outputEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
  }

  /** Relational form: top `k` rows per `groupCols` by (`scoreCol` desc,
    * `idCol` desc). Output: group columns + `<scoreCol>`, `<idCol>`,
    * one row per kept entry. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], scoreCol: String,
                   idCol: String, k: Int): DataFrame = {
    val agg = udaf(new TopKAggregator(k), Encoders.tuple(
      Encoders.scalaDouble, Encoders.scalaLong))
    val packed = df
      .groupBy(groupCols.map(col): _*)
      .agg(agg(col(scoreCol), col(idCol)).as("_topk"))
    packed
      .select(groupCols.map(col) :+ explode(col("_topk")).as("_e"): _*)
      .select(groupCols.map(col) :+
        col("_e._1").as(scoreCol) :+ col("_e._2").as(idCol): _*)
  }

  /** The window-based equivalent (for tests/small groups): shuffles and
    * sorts whole groups — correct everywhere, k-efficient nowhere. */
  def topKPerGroupWindow(df: DataFrame, groupCols: Seq[String],
                         scoreCol: String, idCol: String, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col(scoreCol).desc, col(idCol).desc)
    df.select((groupCols ++ Seq(scoreCol, idCol)).map(col): _*)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k).drop("_rn")
  }
}
