package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** One-pass data profiling and a declarative constraint suite — the
  * data-quality gate a 100 TB ingest runs BEFORE the expensive
  * pipeline stages (the reference's only QA is a row-count reconcile
  * and a 5-row load-error tolerance, `2.2 loading-lambda-for-mysql
  * .py:776-793,308`; this is that idea promoted to a first-class
  * operator surface).
  *
  * Scale posture, [[profile]]: ALL columns profile in ONE aggregation
  * over ONE scan. Per-column state is two counters, typed min/max, and
  * a k-bounded KMV synopsis ([[Sketches.KmvAggregator]]) for the
  * distinct count — so the map-side state is O(cols·k) and the shuffle
  * is one partial-aggregate row per task. The plan this replaces —
  * `count(DISTINCT c1), count(DISTINCT c2), …` — expands the scan
  * once per counted column (Catalyst's Expand) and shuffles every
  * distinct value of every column; this never does either.
  *
  * Scale posture, [[rowChecks]]: every row-level constraint is a
  * `sum(violation)` in the SAME single aggregation — N checks cost one
  * scan, no joins. Set-level checks ([[uniqueCheck]], [[refCheck]])
  * each cost their one unavoidable keyed shuffle, and their outputs
  * union into the same (check, violations, passed) report.
  */
object Profile {

  /** Per-column profile of `cols`: `column, n_rows, n_nulls, ndv_est,
    * min_str, max_str` — one row per column, from one aggregation.
    * `ndv_est` is the KMV order-statistics estimate (EXACT below `k`
    * distinct values, ≈6% stderr at k=256 above); min/max aggregate in
    * the column's native type and only the final scalar renders as a
    * string, so numeric columns do not compare lexicographically. */
  def profile(df: DataFrame, cols: Seq[String], k: Int = 256): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    val kmv = udaf(new Sketches.KmvAggregator(k), Encoders.scalaLong)
    val numerator = (k - 1).toLong * 4294967296L
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"_nn_$c"),
        min(col(c)).cast("string").as(s"_min_$c"),
        max(col(c)).cast("string").as(s"_max_$c"),
        // −1 is the aggregator's documented null sentinel: nulls drop
        // out of the synopsis instead of hashing as a phantom value
        kmv(coalesce(Sketches.coordinate(col(c)), lit(-1L)))
          .as(s"_kmv_$c"))
    }
    // spread before the per-column md5 coordinates (single-split scans
    // otherwise run the whole one-pass profile on one core); project to
    // the profiled columns so the exchange carries nothing else. The
    // KMV merge is commutative — the profile is placement-independent.
    val wide = graft.Tables.spread(df.select(cols.map(col): _*))
      .agg(count(lit(1)).as("_rows"), aggs: _*)
    val withNdv = cols.foldLeft(wide) { (acc, c) =>
      acc.withColumn(s"_ndv_$c",
        when(size(col(s"_kmv_$c")) < k,
          size(col(s"_kmv_$c")).cast("long"))
          .otherwise(expr(s"$numerator div element_at(_kmv_$c, $k)")))
    }
    val stackArgs = cols.map { c =>
      s"'$c', _rows, _rows - _nn_$c, _ndv_$c, _min_$c, _max_$c"
    }.mkString(", ")
    withNdv.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS " +
        "(column, n_rows, n_nulls, ndv_est, min_str, max_str)")
  }

  /** Row-level constraints counted in one pass: each entry is
    * (check name, VIOLATION predicate). Null predicates count as
    * violations — an unexpectedly-null operand is a data defect, not
    * a pass. Output: `check, violations, passed`. */
  def rowChecks(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "empty check suite")
    val aggs = checks.map { case (name, pred) =>
      sum(when(coalesce(pred, lit(true)), 1L).otherwise(0L)).as(name)
    }
    val stackArgs = checks.map { case (name, _) =>
      s"'$name', coalesce(`$name`, 0)" // empty input: zero violations
    }.mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(
        s"stack(${checks.size}, $stackArgs) AS (check, violations)")
      .withColumn("passed", col("violations") === 0L)
  }

  /** Uniqueness constraint on a key tuple: violations = surplus rows
    * beyond one per key (one keyed count shuffle, map-side partial). */
  def uniqueCheck(df: DataFrame, keyCols: Seq[String],
                  name: String): DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("_n"))
      .agg(coalesce(sum(col("_n") - 1L), lit(0L)).as("violations"))
      .select(lit(name).as("check"), col("violations"),
        (col("violations") === 0L).as("passed"))

  /** Referential-integrity constraint: violations = child rows whose
    * key has no parent (null child keys violate too — use a row check
    * to separate them). A left-anti join, so AQE broadcasts a small
    * parent and the count shuffles only orphans. */
  def refCheck(child: DataFrame, childKey: String,
               parent: DataFrame, parentKey: String,
               name: String): DataFrame =
    child.select(col(childKey).as("_ck"))
      .join(parent.select(col(parentKey).as("_ck")), Seq("_ck"),
        "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(name).as("check"), col("violations"),
        (col("violations") === 0L).as("passed"))

  /** Gate a load on its constraint report — the reference's
    * `maxerrors_allowed` contract (5 tolerated error rows per load,
    * `2.1 leader-lambda-for-mysql.py:112`) promoted to the typed
    * suite: every check's violations must be ≤ `tolerance`, else the
    * load fails loudly BEFORE any sink sees the batch. Returns the
    * report (already materialized — callers log/persist it). */
  def enforce(report: DataFrame, tolerance: Long = 0): Array[org.apache.spark.sql.Row] = {
    val rows = report.collect()
    val bad = rows.filter(_.getAs[Long]("violations") > tolerance)
    if (bad.nonEmpty) {
      val detail = bad.map(r =>
        s"${r.getAs[String]("check")}=${r.getAs[Long]("violations")}")
        .mkString(", ")
      throw new IllegalStateException(
        s"constraint suite failed (tolerance=$tolerance): $detail")
    }
    rows
  }

  /** k-anonymity audit over quasi-identifier columns: the groups an
    * attacker could pin to fewer than `k` individuals. One combinable
    * group-by; output `quasiCols…, n` for each risky group — empty
    * means the table IS k-anonymous on those columns. Pairs with
    * [[graft.functions.TextFunctions.scrubPii]]: scrub removes direct
    * identifiers, this measures the indirect ones. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(k >= 2, s"k-anonymity below 2 is vacuous: $k")
    df.groupBy(quasiCols.map(col): _*).agg(count(lit(1)).as("n"))
      .filter(col("n") < k)
  }

  /** Pairwise Pearson correlation of `cols` in ONE scan: the single
    * aggregation accumulates n, Σx and Σx² per column and Σxy per
    * pair — all as exact decimals (order-independent across engines
    * and partitions, the a14 idiom) — then each pair's scalar formula
    * runs in double over the one-row moment table. k columns cost
    * k + k(k−1)/2 decimal sums in one pass, not k(k−1)/2 scans. */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"corrMatrix needs >= 2 columns: $cols")
    require(cols.distinct.size == cols.size, s"repeated columns: $cols")
    def d(c: String) = col(c).cast("decimal(18,4)")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val aggs =
      cols.flatMap(c => Seq(sum(d(c)).cast("double").as(s"_s_$c"),
        sum(d(c) * d(c)).cast("double").as(s"_ss_$c"))) ++
      pairs.map { case (a, b) =>
        sum(d(a) * d(b)).cast("double").as(s"_sp_${a}_${b}") }
    val m = df.agg(count(lit(1)).cast("double").as("_n"), aggs: _*)
    // all pairs unfold from the ONE moment row (explode of a struct
    // array) — a union of per-pair selects would re-run the scan per
    // branch, k(k−1)/2 passes instead of one
    val pairRows = pairs.map { case (a, b) =>
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        round(
          (col("_n") * col(s"_sp_${a}_${b}") -
            col(s"_s_$a") * col(s"_s_$b")) /
          sqrt((col("_n") * col(s"_ss_$a") - col(s"_s_$a") * col(s"_s_$a")) *
            (col("_n") * col(s"_ss_$b") - col(s"_s_$b") * col(s"_s_$b"))),
          6).as("corr"))
    }
    m.select(explode(array(pairRows: _*)).as("_p")).select(col("_p.*"))
  }

  /** Order-independent content fingerprint per group: `n_rows` plus a
    * `checksum` = Σ over rows of the first-8-hex-digits of
    * md5(col₁|col₂|…) as an int64. Commutative by construction, so it
    * needs NO sort, distributes as an ordinary partial aggregate, and
    * fingerprints of partitions merge by addition — the cheap
    * "did anything change" probe run BEFORE [[Upsert.snapshotDiff]]
    * pays for its full-outer join (the reference reconciles row
    * COUNTS only, `2.2 loading-lambda-for-mysql.py:776-793`; this is
    * content-level reconcile at the same one-scan cost).
    *
    * md5 of the portable string rendering (not a binary hash) is the
    * deliberate choice: every engine renders integers and strings
    * identically, so two independent systems can agree on the
    * checksum without sharing code. NULL renders as a sentinel so
    * (a,NULL)≠(a,"") — callers with a legitimate "<null>" string
    * column should pick different `cols`. Double columns are refused:
    * their decimal rendering is engine-specific. */
  def fingerprint(df: DataFrame, groupCols: Seq[String],
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "fingerprint needs at least one column")
    val bad = cols.filter { c =>
      val dt = df.schema(c).dataType
      dt == org.apache.spark.sql.types.DoubleType ||
        dt == org.apache.spark.sql.types.FloatType
    }
    require(bad.isEmpty,
      s"fingerprint: floating columns have engine-specific renderings: $bad")
    val key = concat_ws("|",
      cols.map(c => coalesce(col(c).cast("string"), lit("<null>"))): _*)
    val rowh = conv(substring(md5(key), 1, 8), 16, 10).cast("long")
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), sum(rowh).as("checksum"))
  }

  /** Population stability index between two snapshots of a bucketed
    * distribution — the standard drift monitor run between corpus
    * refreshes (rule of thumb: Σψ < 0.1 stable, > 0.25 shifted).
    * `bucketCol` must be a bounded integer bucketing (caller supplies
    * the binning — e.g. capped n_chars deciles); the full `spine` of
    * buckets [0, buckets) is materialized so a bucket EMPTY in one
    * snapshot still contributes (that is where drift shows up), and
    * Laplace smoothing (+1 / +buckets) keeps ln finite there. Shares
    * p/q as exact-count double divisions, so any engine replays ψ
    * digit-for-digit at 6 dp. Cost: two bucket-grain aggregates over
    * the snapshots (map-side combinable) + a 10-row join — nothing
    * corpus-sized past the counts. Output: (bucket, n_a, n_b, psi). */
  def psi(a: DataFrame, b: DataFrame, bucketCol: String,
          buckets: Int): DataFrame = {
    require(buckets >= 2 && buckets <= 100000,
      s"buckets out of range: $buckets")
    val spark = a.sparkSession
    val spine = spark.range(buckets)
      .select(col("id").cast("int").as("bucket"))
    def counts(df: DataFrame, as: String) =
      df.select(col(bucketCol).cast("int").as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as(as))
        .persist()
    val ac = counts(a, "n_a")
    val bc = counts(b, "n_b")
    // totals fold out of the ≤`buckets`-row count tables — no second
    // pass over either snapshot
    val na = ac.agg(coalesce(sum(col("n_a")), lit(0L))).head.getLong(0)
    val nb = bc.agg(coalesce(sum(col("n_b")), lit(0L))).head.getLong(0)
    spine
      .join(broadcast(ac), Seq("bucket"), "left")
      .join(broadcast(bc), Seq("bucket"), "left")
      .na.fill(0L, Seq("n_a", "n_b"))
      .withColumn("_p",
        (col("n_a") + 1).cast("double") / lit((na + buckets).toDouble))
      .withColumn("_q",
        (col("n_b") + 1).cast("double") / lit((nb + buckets).toDouble))
      .withColumn("psi", round((col("_p") - col("_q"))
        * log(col("_p") / col("_q")), 6))
      .select(col("bucket"), col("n_a"), col("n_b"), col("psi"))
  }
}
