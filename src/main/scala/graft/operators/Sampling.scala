package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, content-keyed sampling for training-data mixing.
  *
  * `rand()`-based sampling is wrong for a corpus pipeline twice over: a
  * task retry resamples its partition (the output changes under fault
  * recovery), and the sample shifts with partitioning. Keying the
  * keep/drop decision on a HASH of a stable row key fixes both — the
  * same rows are kept on every run, every cluster layout, and every
  * engine, which is what makes train/held-out splits and mixture
  * weights reproducible and auditable.
  *
  * Mechanics: the sampling coordinate is the first 8 hex chars of
  * md5(key) — a uniform 32-bit value as FIXED-WIDTH lowercase hex.
  * Fixed-width lowercase hex compares byte-wise identically to its
  * numeric value, so "coordinate < threshold(rate)" is a pure string
  * comparison portable to any SQL engine with md5 + substring (no
  * 64-bit hex parsing, no engine-specific hash).
  */
object Sampling {

  /** Sampling coordinate of a key: first 8 hex chars of md5(key). */
  def hashHex(key: Column): Column = substring(md5(key.cast("string")), 1, 8)

  /** Threshold hex for a rate in [0,1]: floor(rate·2³²) as %08x.
    * Callers treat rate ≥ 1 as keep-all rather than comparing. */
  def rateThreshold(rate: Double): String = {
    require(rate >= 0 && rate <= 1, s"sampling rate must be in [0,1]: $rate")
    f"${math.min((rate * 4294967296.0).toLong, 4294967295L)}%08x"
  }

  /** Keep-predicate for one rate. */
  private def keep(coord: Column, rate: Double): Column =
    if (rate >= 1.0) lit(true) else coord < lit(rateThreshold(rate))

  /** Bernoulli sample at a single rate, keyed on `keyCol`. */
  def sample(df: DataFrame, keyCol: String, rate: Double): DataFrame =
    df.filter(keep(hashHex(col(keyCol)), rate))

  /** Exactly-k deterministic sample: the k rows with the smallest
    * sampling coordinates (ties broken by the key itself — a total
    * order, so the result is unique). Because the coordinate is fixed
    * per key, samples NEST across sizes: exactSample(k₁) ⊆
    * exactSample(k₂) for k₁ ≤ k₂ — growing a subsample never discards
    * previously selected rows (curriculum/scaling-law runs rely on
    * this). Physical shape is distributed TakeOrdered: per-partition
    * top-k heaps, driver merge of k·partitions rows — no global sort. */
  def exactSample(df: DataFrame, keyCol: String, k: Int): DataFrame =
    df.orderBy(hashHex(col(keyCol)), col(keyCol)).limit(k)

  /** Per-group cap: at most `k` rows per value of `groupCol`, selected
    * deterministically — the k smallest sampling coordinates within the
    * group, ties by key ascending (same total order as [[exactSample]],
    * so caps also NEST across sizes within each group). The standard
    * corpus-shaping op "keep at most N documents per domain/source":
    * a hard cap on any one origin's share of the training mix.
    *
    * Physical shape: [[GroupTopK]]'s k-bounded partial aggregator — the
    * shuffle carries at most k entries per (group, map task), never the
    * group's rows. A window (`row_number() over (partition by group)`)
    * would shuffle and sort EVERY row of the dominant domain — exactly
    * the hot-group quadratic this operator exists to avoid at 100×.
    *
    * The key must be integral (the aggregator's state is `(Double,
    * Long)`); assign a dense surrogate id (graft.operators.Ids) first
    * for string keys. Output: (`groupCol`, `keyCol`) of the survivors —
    * join back to the corpus for payload columns. */
  def capPerGroup(df: DataFrame, keyCol: String, groupCol: String,
                  k: Int): DataFrame = {
    import org.apache.spark.sql.types._
    val keyType = df.schema(keyCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(keyType),
      s"capPerGroup requires an integral key column; '$keyCol' is $keyType — " +
        "assign a dense numeric surrogate id (graft.operators.Ids) first")
    // coordinate as a number: fixed-width hex compares identically to
    // its numeric value, and a 32-bit value is exact in a Double.
    // GroupTopK keeps the LARGEST (score, id) pairs, so both the
    // coordinate and the key ride in negated: smallest-coordinate,
    // then smallest-key, win.
    val coord = conv(hashHex(col(keyCol)), 16, 10).cast("long")
    val directed = df.select(col(groupCol),
      (-coord).cast("double").as("_score"),
      (-col(keyCol).cast("long")).as("_negkey"))
    GroupTopK.topKPerGroup(directed, Seq(groupCol), "_score", "_negkey", k)
      .select(col(groupCol), (-col("_negkey")).as(keyCol))
  }

  /** Stratified (mixture) sample: each stratum keeps its own rate,
    * strata not listed keep `defaultRate`. The per-stratum predicate is
    * a codegen'd CASE chain evaluated in the scan stage — no join, no
    * shuffle; downstream engines reproduce it as a literal CASE WHEN.
    * Deterministic: a doc's fate depends only on (key, stratum, rates). */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
                       rates: Map[String, Double],
                       defaultRate: Double = 1.0): DataFrame = {
    val coord = hashHex(col(keyCol))
    val pred = rates.toSeq.sortBy(_._1).foldLeft(keep(coord, defaultRate)) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, keep(coord, rate)).otherwise(acc)
    }
    df.filter(pred)
  }
}
