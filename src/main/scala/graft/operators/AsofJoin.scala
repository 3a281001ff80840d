package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-match) join: for each left row, attach the single
  * right row with the greatest `rightTs <= leftTs` among rows sharing the
  * join keys — the standard point-in-time lookup (trades vs quotes, event
  * vs latest config, purchase vs last click).
  *
  * Spark has no built-in as-of join; the naive encoding is a range join
  * (`l.key = r.key AND r.ts <= l.ts` + a per-row argmax), which Catalyst
  * executes as a join *product* within key groups — O(n·m) per key and
  * quadratic on hot keys. This implementation is the union-sort
  * formulation instead: tag both inputs, union them, and run ONE window
  * (`partitionBy(keys).orderBy(ts, side)`) where `last(<right payload>,
  * ignoreNulls)` over rows `unboundedPreceding → currentRow` carries the
  * latest right values forward onto each left row. Cost is a single hash
  * shuffle + per-partition sort over n+m rows — the same plan shape as
  * `w2_latest_per_key`, linear in data size and skew-bounded only by the
  * hottest key (salt via [[Salting]] if one key dominates).
  *
  * Tie-break: right rows sort BEFORE left rows at equal timestamps
  * (side 0 < side 1), so the match is inclusive (`rightTs <= leftTs`) —
  * ANSI `ASOF JOIN ... ON l.ts >= r.ts` semantics. Among right rows with
  * identical (key, ts) the winner is nondeterministic, as in any as-of
  * engine; pre-dedupe the right side (e.g. the `w2_latest_per_key`
  * shape) when that matters.
  *
  * Reference behavior coverage: the reference joins work items to the
  * most recent audit/status row within a freshness window
  * (`2.2 loading-lambda-for-mysql.py:219-254`) — an as-of join with
  * tolerance, which `toleranceSeconds` reproduces.
  */
object AsofJoin {

  /** Left as-of backward join (all left rows preserved; unmatched get
    * nulls). Output = left columns + `matched_<rightTs>` +
    * `matched_<c>` for each of `rightVals`.
    *
    * @param toleranceSeconds if set, a match older than this many
    *   seconds before the left timestamp is discarded (nulled out). */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, rightVals: Seq[String],
               toleranceSeconds: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val tsType = right.schema(rightTs).dataType
    def rvType(c: String) = right.schema(c).dataType

    // ANSI join semantics: a NULL key matches nothing, and a NULL right
    // timestamp satisfies no `rightTs <= leftTs` comparison. The window
    // formulation would otherwise group null-keyed rows together (SQL
    // window partitioning treats NULLs as one partition) — dropping
    // null-keyed / null-ts right rows restores "no match" for them and
    // for any null-keyed left row (which then finds no carried value).
    val right0 = (rightTs +: keys)
      .foldLeft(right)((df, k) => df.filter(col(k).isNotNull))

    val lSide = left.select(
      leftCols.map(col) ++ Seq(
        lit(1).as("_side"), col(leftTs).as("_ord"),
        lit(null).cast(tsType).as("_rts")) ++
        rightVals.map(c => lit(null).cast(rvType(c)).as(s"_rv_$c")): _*)
    val rSide = right0.select(
      keys.map(col) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(lit(0).as("_side"), col(rightTs).as("_ord"),
          col(rightTs).as("_rts")) ++
        rightVals.map(c => col(c).as(s"_rv_$c")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ord").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Carry the whole matched right row as ONE struct, not one window per
    // column: per-column `last(ignoreNulls)` would fill a NULL value in
    // the matched row from an OLDER right row, stitching the output from
    // different right rows. The struct is non-null exactly for right rows
    // (its _rts field is never null after the filter above), so a single
    // `last(ignoreNulls)` picks the latest right ROW atomically.
    val rowPayload = when(col("_side") === 0,
      struct(col("_rts") +: rightVals.map(c => col(s"_rv_$c")): _*))
    val carried = lSide.unionByName(rSide)
      .withColumn("_rpay", last(rowPayload, ignoreNulls = true).over(w))

    val inTol: Column = toleranceSeconds match {
      case Some(t) =>
        // direct timestamp comparison: exact to the microsecond and
        // TZ-representation-independent (unix_timestamp would truncate
        // to seconds and route TIMESTAMP_NTZ through the session TZ)
        col("_rpay").isNotNull &&
          col("_rpay._rts") >= col("_ord") - expr(s"INTERVAL $t SECOND")
      case None => col("_rpay").isNotNull
    }
    carried
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        ((rightTs, "_rts") +: rightVals.map(c => (c, s"_rv_$c"))).map {
          case (out, in) =>
            when(inTol, col(s"_rpay.$in")).otherwise(lit(null)).as(s"matched_$out")
        }: _*)
  }

  /** Forward as-of join: earliest right row with `rightTs >= leftTs`
    * ("next quote after the trade"). Same union-sort skeleton as
    * [[backward]] mirrored: right rows sort AFTER left rows at equal
    * timestamps (inclusive match) and `first(..., ignoreNulls)` over
    * `currentRow → unboundedFollowing` carries the next right values
    * backward onto each left row. One shuffle, identical scale posture. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTs: String, rightTs: String, rightVals: Seq[String],
              toleranceSeconds: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    def rvType(c: String) = right.schema(c).dataType
    val tsType = right.schema(rightTs).dataType
    val right0 = (rightTs +: keys)
      .foldLeft(right)((df, k) => df.filter(col(k).isNotNull))

    val lSide = left.select(
      leftCols.map(col) ++ Seq(
        lit(0).as("_side"), col(leftTs).as("_ord"),
        lit(null).cast(tsType).as("_rts")) ++
        rightVals.map(c => lit(null).cast(rvType(c)).as(s"_rv_$c")): _*)
    val rSide = right0.select(
      keys.map(col) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(lit(1).as("_side"), col(rightTs).as("_ord"),
          col(rightTs).as("_rts")) ++
        rightVals.map(c => col(c).as(s"_rv_$c")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ord").asc, col("_side").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // single-struct carry — same rationale as in [[backward]]
    val rowPayload = when(col("_side") === 1,
      struct(col("_rts") +: rightVals.map(c => col(s"_rv_$c")): _*))
    val carried = lSide.unionByName(rSide)
      .withColumn("_rpay", first(rowPayload, ignoreNulls = true).over(w))

    // `_ord.isNotNull`: a null left timestamp sorts FIRST under the asc
    // ordering, so the forward frame would otherwise hand it the first
    // right row — ANSI comparison-with-null semantics say no match
    // (backward gets this for free: nulls-first means nothing precedes)
    val inTol: Column = toleranceSeconds match {
      case Some(t) =>
        col("_ord").isNotNull && col("_rpay").isNotNull &&
          col("_rpay._rts") <= col("_ord") + expr(s"INTERVAL $t SECOND")
      case None => col("_ord").isNotNull && col("_rpay").isNotNull
    }
    carried
      .filter(col("_side") === 0)
      .select(leftCols.map(col) ++
        ((rightTs, "_rts") +: rightVals.map(c => (c, s"_rv_$c"))).map {
          case (out, in) =>
            when(inTol, col(s"_rpay.$in")).otherwise(lit(null)).as(s"matched_$out")
        }: _*)
  }

  /** Nearest as-of join: the right row minimizing `|rightTs - leftTs|`
    * (pandas `merge_asof(direction='nearest')`). Ties — a right row
    * equally far on both sides — resolve BACKWARD (the at-or-before row),
    * the conservative "no lookahead unless strictly closer" choice.
    *
    * Single-pass formulation: ONE union-sort (right rows sort before left
    * rows at equal timestamps) carries BOTH direction payloads as two
    * window expressions over the same partition/order — Spark's WindowExec
    * shares the exchange+sort between frames, so the cost stays one
    * shuffle, identical to [[backward]] alone. The forward frame starts at
    * `currentRow` and therefore excludes the equal-timestamp right row
    * (it sorts earlier); that match is distance 0 on the backward side,
    * which tie-preference selects anyway. */
  def nearest(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTs: String, rightTs: String, rightVals: Seq[String],
              toleranceSeconds: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val tsType = right.schema(rightTs).dataType
    def rvType(c: String) = right.schema(c).dataType
    val right0 = (rightTs +: keys)
      .foldLeft(right)((df, k) => df.filter(col(k).isNotNull))

    val lSide = left.select(
      leftCols.map(col) ++ Seq(
        lit(1).as("_side"), col(leftTs).as("_ord"),
        lit(null).cast(tsType).as("_rts")) ++
        rightVals.map(c => lit(null).cast(rvType(c)).as(s"_rv_$c")): _*)
    val rSide = right0.select(
      keys.map(col) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(lit(0).as("_side"), col(rightTs).as("_ord"),
          col(rightTs).as("_rts")) ++
        rightVals.map(c => col(c).as(s"_rv_$c")): _*)

    val base = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ord").asc, col("_side").asc)
    val wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val rowPayload = when(col("_side") === 0,
      struct(col("_rts") +: rightVals.map(c => col(s"_rv_$c")): _*))
    val carried = lSide.unionByName(rSide)
      .withColumn("_bp", last(rowPayload, ignoreNulls = true).over(wb))
      .withColumn("_fp", first(rowPayload, ignoreNulls = true).over(wf))

    def tol(ok: Column, bound: => Column): Column = toleranceSeconds match {
      case Some(_) => col("_ord").isNotNull && ok && bound
      case None => col("_ord").isNotNull && ok
    }
    val bOk = tol(col("_bp").isNotNull,
      col("_bp._rts") >= col("_ord") -
        expr(s"INTERVAL ${toleranceSeconds.getOrElse(0L)} SECOND"))
    val fOk = tol(col("_fp").isNotNull,
      col("_fp._rts") <= col("_ord") +
        expr(s"INTERVAL ${toleranceSeconds.getOrElse(0L)} SECOND"))
    // timestamp differences compare as intervals — microsecond-exact,
    // no unix_timestamp truncation
    val backCloser =
      (col("_ord") - col("_bp._rts")) <= (col("_fp._rts") - col("_ord"))
    val chosen = when(bOk && fOk, when(backCloser, col("_bp")).otherwise(col("_fp")))
      .when(bOk, col("_bp"))
      .when(fOk, col("_fp"))

    carried
      .filter(col("_side") === 1)
      .withColumn("_ch", chosen)
      .select(leftCols.map(col) ++
        ((rightTs, "_rts") +: rightVals.map(c => (c, s"_rv_$c"))).map {
          case (out, in) => col(s"_ch.$in").as(s"matched_$out")
        }: _*)
  }
}
