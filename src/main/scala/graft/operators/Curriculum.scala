package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-order construction: curriculum ranking within each group
  * (e.g. length-ascending = short-first) interleaved round-robin across
  * groups so consecutive positions rotate sources — the data-ordering
  * pass a training pipeline runs after mixing (curriculum for
  * optimization, interleaving for batch diversity).
  *
  * Scale shape: NO global window. The global rank comes from
  * [[Ids.withDenseId]]'s range-partitioned dense id over
  * (group, order…, key); the per-group rebase is one group-cardinality
  * aggregate joined back broadcast; the interleaved order key is pure
  * arithmetic, (rank−1)·G + groupIdx. Order keys are monotone in the
  * intended order but not dense once short groups exhaust — the
  * ORDERING is the contract, consumers sort by (order_key, key).
  */
object Curriculum {
  def interleave(df: DataFrame, keyCol: String, groupCol: String,
                 order: Seq[Column]): DataFrame = {
    val ids = Ids.withDenseId(df, "_cid",
      Seq(col(groupCol)) ++ order ++ Seq(col(keyCol)))
    val bases = ids.groupBy(col(groupCol)).agg(min(col("_cid")).as("_cmin"))
    // group index + count over the G-row group table — the one place a
    // bare window is right (input is group-cardinality-bounded)
    val gidx = bases.withColumn("_gidx",
      row_number().over(Window.orderBy(col(groupCol))))
    val gcount = gidx.agg(count(lit(1)).as("_gn"))
    ids.join(broadcast(gidx), groupCol)
      .crossJoin(broadcast(gcount))
      .withColumn("rank", col("_cid") - col("_cmin") + lit(1L))
      .withColumn("order_key",
        (col("rank") - lit(1L)) * col("_gn") + col("_gidx") - lit(1L))
      .drop("_cid", "_cmin", "_gidx", "_gn")
  }
}
