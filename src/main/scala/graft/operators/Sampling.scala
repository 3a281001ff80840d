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

  /** Deterministic train/held-out split: tags every row with its side,
    * derived from the SAME md5 coordinate the samplers use — so the
    * held-out side IS `sample(df, key, heldOutRate)` (spec-asserted),
    * the two sides partition the corpus exactly (no row lost, none in
    * both), and the assignment survives retries, repartitioning, and
    * engines. Because the coordinate is fixed per key, growing the
    * held-out rate only MOVES rows train→heldout (nested splits), and
    * — the property that matters for leakage — a document's side never
    * changes run-over-run, so yesterday's train doc can't silently
    * become today's eval doc. Scan-stage CASE, no shuffle. */
  def splitTag(df: DataFrame, keyCol: String, heldOutRate: Double,
               tagCol: String = "split"): DataFrame =
    df.withColumn(tagCol,
      when(keep(hashHex(col(keyCol)), heldOutRate), lit("heldout"))
        .otherwise(lit("train")))

  /** Deterministic k-fold assignment — [[splitTag]]'s cross-validation
    * generalization: fold = md5₃₂(key) mod k. Content-keyed like every
    * sampler here, so folds are stable across runs/retries/engines,
    * rows never migrate when other folds are filtered out, and the
    * same doc lands in the same fold at any scale. A scan-stage
    * projection — no shuffle, no state. Compose with the near-dup
    * cluster labels (the x_pipeline_split_leakfree device) to keep
    * duplicate pairs from straddling folds. */
  def foldTag(df: DataFrame, keyCol: String, k: Int,
              tagCol: String = "fold"): DataFrame = {
    require(k >= 2 && k <= 1000, s"fold count must be in [2, 1000]: $k")
    df.withColumn(tagCol,
      pmod(conv(hashHex(col(keyCol)), 16, 10).cast("long"), lit(k.toLong)))
  }

  /** Weighted exactly-k sample without replacement (Efraimidis &
    * Spirakis 2006, A-ES in its exponential-clock form): each row draws
    * the uniform u = (md5₃₂(key)+1)/2³² and the clock e = −ln(u)/w; the
    * k SMALLEST clocks win, which samples with inclusion probability
    * proportional to `weight` — "prefer high-quality documents, but
    * keep the tail reachable", the soft alternative to a hard quality
    * floor when shaping a training mix. Deterministic for the same
    * reasons as [[exactSample]] (the clock is a pure function of the
    * key) and NESTED across k the same way — growing a weighted
    * subsample never discards previously selected rows.
    *
    * Engine-portable: the clock rounds to 6 dp before ordering, ties
    * break by key — the only float in the pipeline is one ln/division,
    * agreed to well past 6 dp by any IEEE-double engine. Weights must
    * be strictly positive; a zero/negative/null weight is refused
    * in-plan (`raise_error`) rather than silently ranked last.
    *
    * Physical shape: distributed TakeOrdered exactly like
    * [[exactSample]] — per-partition top-k heaps, no global sort. */
  def weightedSample(df: DataFrame, keyCol: String, weight: Column,
                     k: Int): DataFrame = {
    df.orderBy(aesClock(col(keyCol), weight), col(keyCol)).limit(k)
  }

  /** Per-group weighted cap: at most `k` rows per `groupCol`, chosen by
    * the same A-ES clocks as [[weightedSample]] — "keep ≤N docs per
    * domain, preferring the high-quality ones". Same k-bounded
    * [[GroupTopK]] shape (and integral-key contract) as
    * [[capPerGroup]]: the shuffle carries at most k entries per
    * (group, map task), never the dominant domain's rows. Output:
    * (`groupCol`, `keyCol`) survivors — join back for payloads. */
  def weightedCapPerGroup(df: DataFrame, keyCol: String, groupCol: String,
                          weight: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.types._
    val keyType = df.schema(keyCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(keyType),
      s"weightedCapPerGroup requires an integral key column; '$keyCol' is " +
        s"$keyType — assign a dense numeric surrogate id " +
        "(graft.operators.Ids) first")
    // GroupTopK keeps the LARGEST (score, id); negate so the smallest
    // clock, then smallest key, win — same device as capPerGroup.
    val directed = df.select(col(groupCol),
      (-aesClock(col(keyCol), weight)).as("_score"),
      (-col(keyCol).cast("long")).as("_negkey"))
    GroupTopK.topKPerGroup(directed, Seq(groupCol), "_score", "_negkey", k)
      .select(col(groupCol), (-col("_negkey")).as(keyCol))
  }

  /** The A-ES exponential clock of a key under a weight: −ln(u)/w with
    * u = (md5₃₂(key)+1)/2³² ∈ (0, 1], rounded to 6 dp. Shared by the
    * global and per-group weighted samplers so they rank identically. */
  private def aesClock(key: Column, weight: Column): Column = {
    val u = (conv(hashHex(key), 16, 10).cast("double") + 1.0) /
      lit(4294967296.0)
    val w = when(weight.isNotNull && weight > 0, weight.cast("double"))
      .otherwise(raise_error(concat(
        lit("weightedSample: weight must be strictly positive, got: "),
        coalesce(weight.cast("string"), lit("null")))))
    round(-log(u) / w, 6)
  }

  /** Token-budget sample: per stratum, keep documents in coordinate
    * order until a token budget is reached — "give me ≤50M tokens of
    * each language", the unit training mixes are actually specified in.
    *
    * The scale-safe formulation: a per-document cumulative sum would be
    * a corpus-sized window sort per stratum, so the cut is made at
    * COORDINATE-BUCKET granularity instead — the first 4 hex chars of
    * the md5 coordinate (65536 buckets). Token sums aggregate per
    * (stratum, bucket) map-side; the running total then windows over a
    * ≤65536-row table per stratum (bucket-sized, not corpus-sized), and
    * the kept set is every document whose bucket's cumulative total fits
    * the budget. Whole buckets are kept or dropped — deterministic,
    * engine-portable (the bucket key stays a fixed-width hex STRING, so
    * ordering and the cut compare bytewise in any engine), and nested:
    * a larger budget keeps a superset of buckets. A stratum whose FIRST
    * bucket already exceeds the budget keeps nothing (budgets far below
    * one bucket's tokens — ~budget/65536 of the corpus — are below this
    * operator's resolution; use [[exactSample]] for handfuls of rows).
    * Expected overshoot granularity is corpus_tokens/65536 per stratum.
    */
  def sampleToTokenBudget(df: DataFrame, keyCol: String, strataCol: String,
                          tokens: Column, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val bucket = substring(hashHex(col(keyCol)), 1, 4)
    val perBucket = df
      .groupBy(col(strataCol), bucket.as("_bkt"))
      .agg(sum(tokens).as("_t"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(col("_bkt"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cut = perBucket
      .withColumn("_cum", sum(col("_t")).over(w))
      .filter(col("_cum") <= budget)
      .groupBy(col(strataCol)).agg(max(col("_bkt")).as("_maxb"))
    df.join(cut, Seq(strataCol))
      .filter(bucket <= col("_maxb"))
      .drop("_maxb")
  }

  /** Concat-and-slice packing plan — the GPT-style pretraining layout:
    * the corpus is (virtually) concatenated in a deterministic global
    * order and sliced into fixed `windowTokens` context windows; each
    * doc gets its global token offsets and the window ids it lands in
    * (`first_win < last_win` ⟺ the doc straddles a window boundary).
    * The order is (content-keyed md5 coordinate, key) — the samplers'
    * idiom, so packing is stable under retries and across engines and
    * composes with every deterministic sampler upstream.
    *
    * Scale shape: a global running total is the textbook serial
    * bottleneck, so it computes at two levels — per-16-bit-bucket token
    * sums (map-side combinable), ONE ≤65536-row window for bucket base
    * offsets, then within-bucket windows bounded by bucket population
    * (≈ corpus/65536 docs each) — never a corpus-sized sort on one
    * reducer. Output: (key, n_tokens, g_start, g_end, first_win,
    * last_win); token counts < 2⁵³ keep the window-id floor exact. */
  def packOffsets(df: DataFrame, keyCol: String, tokens: Column,
                  windowTokens: Long): DataFrame = {
    require(windowTokens > 0, s"windowTokens must be positive: $windowTokens")
    val w = org.apache.spark.sql.expressions.Window
    val rows = df.select(col(keyCol), hashHex(col(keyCol)).as("_c"),
        tokens.cast("long").as("n_tokens"))
      .withColumn("_b", substring(col("_c"), 1, 4))
    val perBucket = rows.groupBy(col("_b")).agg(sum(col("n_tokens")).as("_bt"))
    val wb = w.orderBy(col("_b"))
      .rowsBetween(w.unboundedPreceding, -1)
    val bases = perBucket
      .withColumn("_base", coalesce(sum(col("_bt")).over(wb), lit(0L)))
      .select(col("_b"), col("_base"))
    val win = w.partitionBy(col("_b")).orderBy(col("_c"), col(keyCol))
      .rowsBetween(w.unboundedPreceding, -1)
    rows.join(bases, Seq("_b"))
      .withColumn("g_start",
        col("_base") + coalesce(sum(col("n_tokens")).over(win), lit(0L)))
      .withColumn("g_end", col("g_start") + col("n_tokens"))
      .withColumn("first_win",
        floor(col("g_start") / windowTokens).cast("long"))
      .withColumn("last_win",
        floor((col("g_end") - 1) / windowTokens).cast("long"))
      .select(col(keyCol), col("n_tokens"), col("g_start"), col("g_end"),
        col("first_win"), col("last_win"))
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

  /** Temperature-flattened mixture (α = 1/2): resample so each group's
    * share of the output follows n^α/Σn^α instead of its raw share —
    * the multilingual-corpus reweighting recipe (upsample the tail,
    * downsample the head; α→0 is uniform-over-groups, α=1 is natural).
    * `budget` is the target output row count; a group whose target
    * exceeds its size keeps everything (rate caps at 1 — this operator
    * never duplicates rows, matching deterministic-sampling semantics;
    * the capped groups' shortfall is accepted, not redistributed).
    *
    * Rates derive CROSS-ENGINE-EXACTLY despite the irrational √n:
    * per-group √n is quantized to an integer (round(√n·10⁶) — IEEE
    * sqrt and one double multiply, correctly rounded everywhere), the
    * normalizer is an exact integer sum of those, and the keep
    * threshold floor(rate·2³²) comes from one exact-integer-ratio
    * double division — no order-dependent float accumulation anywhere.
    * Plan shape: one tiny group-count agg, broadcast back, scan-stage
    * keep predicate on the md5 coordinate — no corpus shuffle. */
  def temperatureMixture(df: DataFrame, keyCol: String, groupCol: String,
                         budget: Long): DataFrame = {
    val counts = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_sq", round(sqrt(col("_n")) * 1e6).cast("long"))
    val norm = counts.agg(sum(col("_sq")).as("_S"))
    val rates = counts.crossJoin(broadcast(norm))
      .withColumn("_rate",
        least(lit(1.0), (lit(budget) * col("_sq")) / (col("_S") * col("_n"))))
      .withColumn("_thr",
        floor(col("_rate") * lit(4294967296.0)).cast("long"))
      .select(col(groupCol), col("_thr"))
    df.join(broadcast(rates), groupCol)
      .filter(conv(hashHex(col(keyCol)), 16, 10).cast("long") < col("_thr"))
      .drop("_thr")
  }
}
