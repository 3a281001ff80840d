package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J1/S8 (SURVEY §2.1/§2.3): MERGE-style upsert — the reference's
  * `sp_loading_PriceIndex` temp→permanent "upsert instead of insert"
  * (`2.2 loading-lambda-for-mysql.py:209-217,304-316`) — as a pure-Spark
  * full-outer-join rewrite (no Delta jars in this env).
  *
  * Semantics: whole-row replace on the natural key; an update row wins over
  * the existing target row (MySQL `ON DUPLICATE KEY UPDATE` behavior);
  * target rows with no matching update pass through; update rows with no
  * match are inserts.
  *
  * Scale: a single equi-join on the key — Catalyst/AQE pick broadcast vs
  * sort-merge and handle skew. When the update set is small relative to the
  * target (the common incremental-load case), wrap it in
  * `broadcast(updates)` at the call site to avoid shuffling the target.
  */
object Upsert {
  def merge(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val u = updates.withColumn("_is_upd", lit(true)).alias("u")
    val t = target.alias("t")
    val cond = keys.map(k => col(s"u.$k") <=> col(s"t.$k")).reduce(_ && _)
    val merged = u.join(t, cond, "full_outer")
    val outCols = target.columns.toSeq.map { c =>
      when(col("_is_upd").isNotNull, col(s"u.$c")).otherwise(col(s"t.$c")).as(c)
    }
    merged.select(outCols: _*)
  }

  /** Last-write-wins: dedup `updates` to the latest row per key (by
    * `version`, ties broken arbitrarily — pass a unique version for full
    * determinism) before merging. Mirrors replayed-file idempotence (ST2).
    */
  def mergeLatest(target: DataFrame, updates: DataFrame, keys: Seq[String],
                  version: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(version).desc)
    val latest = updates.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    merge(target, latest, keys)
  }
}
