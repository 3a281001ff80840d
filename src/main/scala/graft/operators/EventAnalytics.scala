package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavioral analytics over an append-only event log — the query
  * family the reference's audit-log table exists to answer ("which
  * loads reached which stage, when did a source first appear":
  * `2.2 loading-lambda-for-mysql.py:640-700` reads the log back per
  * target to decide progress), generalized to the funnel / cohort
  * shapes every product event stream runs.
  *
  * Ordering contract: stage order is the integral `orderCol` (event
  * ids), never raw timestamps — event-time carries sub-µs noise that
  * engines truncate differently, while ids are the one total order
  * everything agrees on. Cohort bucketing truncates time to coarse
  * buckets (weeks), where sub-µs noise cannot move a boundary.
  */
object EventAnalytics {

  /** Ordered k-stage funnel: per entity, the FIRST stage-1 event, then
    * the first stage-2 event strictly after it, and so on. Output: one
    * row per entity that reached stage 1 — `userCol, s1_<type>, …,
    * sk_<type> (null = stage not reached), depth`.
    *
    * Scale shape: stage j is a min-aggregation over ONLY the stage-j
    * slice of the log (the type filter pushes to the scan) joined to
    * the previous frontier on the entity key — every shuffle in the
    * chain hash-partitions on that same key, so at 1000 executors the
    * stages co-locate and the widest exchange is the largest single
    * stage slice, never the whole log. No window function touches the
    * unaggregated log.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             orderCol: String, stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, s"a funnel needs at least 2 stages: $stages")
    require(stages.distinct.size == stages.size,
      s"repeated stage types are ambiguous: $stages")
    def sCol(i: Int) = s"s${i + 1}_${stages(i)}"
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol))
      .agg(min(col(orderCol)).as(sCol(0)))
    val chained = stages.indices.tail.foldLeft(first) { (acc, i) =>
      val next = events.filter(col(typeCol) === stages(i))
        .join(acc.select(col(userCol), col(sCol(i - 1))), Seq(userCol))
        .filter(col(orderCol) > col(sCol(i - 1)))
        .groupBy(col(userCol))
        .agg(min(col(orderCol)).as(sCol(i)))
      acc.join(next, Seq(userCol), "left")
    }
    chained.withColumn("depth",
      stages.indices.map(i => when(col(sCol(i)).isNotNull, 1L)
        .otherwise(0L)).reduce(_ + _))
  }

  /** Per-stage reach counts of [[funnel]]'s output: `stage (1-based),
    * stage_type, n_users` — the funnel chart. */
  def funnelCounts(funnelOut: DataFrame, stages: Seq[String]): DataFrame = {
    val aggs = stages.indices.map(i =>
      count(col(s"s${i + 1}_${stages(i)}")).as(s"_n$i"))
    val stackArgs = stages.indices
      .map(i => s"${i + 1}, '${stages(i)}', _n$i").mkString(", ")
    funnelOut.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${stages.size}, $stackArgs) AS " +
        "(stage, stage_type, n_users)")
  }

  /** First-order transition matrix of the event stream: counts and
    * row-normalized probabilities of `prev type → next type` steps per
    * entity history. The lag window partitions by entity — bounded by
    * one user's history, the window-is-right case (same posture as the
    * moving-average gate) — and the probability normalization windows
    * over the AGGREGATED |types|² matrix, never the log. Output:
    * `from_type, to_type, n, p` (p rounded to 6 dp). */
  def transitions(events: DataFrame, userCol: String, typeCol: String,
                  orderCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(orderCol))
    val steps = events
      .select(col(userCol), col(typeCol).as("to_type"),
        lag(col(typeCol), 1).over(w).as("from_type"))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val wf = org.apache.spark.sql.expressions.Window
      .partitionBy(col("from_type"))
    steps.withColumn("p",
      round(col("n").cast("double") / sum(col("n")).over(wf), 6))
  }

  /** Cohort retention: entities bucketed by the `bucket`-truncation of
    * their FIRST event (the cohort), counted in each later bucket they
    * were active. Output: `cohort (string), bucket_offset (buckets
    * since cohort), n_users`.
    *
    * Scale shape: first-seen is one keyed min-aggregation; activity
    * dedupes to one row per (entity, bucket) — both partial-aggregate
    * map-side, both keyed on the entity, so the join back is
    * co-partitioned. The final (cohort, offset) roll-up aggregates a
    * table already shrunk to entity×bucket granularity. The offset
    * divides exact day counts, not float durations.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
                      bucket: String = "week"): DataFrame = {
    val daysPer = bucket match {
      case "week" => 7L
      case "day"  => 1L
      case other =>
        throw new IllegalArgumentException(
          s"unsupported cohort bucket (want day|week): $other")
    }
    val firstSeen = events.groupBy(col(userCol))
      .agg(min(col(tsCol)).as("_first_ts"))
      .select(col(userCol),
        date_trunc(bucket, col("_first_ts")).cast("date").as("_cohort"))
    val active = events
      .select(col(userCol),
        date_trunc(bucket, col(tsCol)).cast("date").as("_bucket"))
      .distinct()
    active.join(firstSeen, Seq(userCol))
      .groupBy(col("_cohort"),
        (datediff(col("_bucket"), col("_cohort")) / daysPer)
          .cast("long").as("bucket_offset"))
      .agg(count(lit(1)).as("n_users"))
      .select(date_format(col("_cohort"), "yyyy-MM-dd").as("cohort"),
        col("bucket_offset"), col("n_users"))
  }

  /** Last-touch revenue attribution: each conversion credits the
    * user's most recent PRECEDING non-conversion event type; a
    * conversion with no preceding touch credits `(direct)`. One
    * ignore-nulls `last` window over each entity's history (bounded by
    * one user's volume — the window-is-right case), then a |types|-row
    * aggregate; conversions keep exact decimal revenue sums. */
  /** RFM segmentation: per entity, Recency (days since last activity,
    * relative to the corpus max date), Frequency (activity count) and
    * Monetary (exact decimal spend), each scored into `buckets`
    * quantile tiles (bigger tile = better on every axis) and
    * concatenated into the classic segment label ("444" = best).
    *
    * Plan shape: one entity-grain aggregate over the fact table (the
    * only fact-sized shuffle), a broadcast of the 1-row corpus max
    * date, then three `ntile` windows over the AGGREGATED entity
    * table — the same aggregate-first-window-after discipline as the
    * vocab ranking: the windows' input is entity-grain, orders of
    * magnitude under the fact grain, so the unpartitioned sort is a
    * deliberate, bounded cost. Tile order is made deterministic with
    * the entity id as tiebreak so results are engine- and
    * partition-order-independent. */
  def rfmSegments(orders: DataFrame, custCol: String, dateCol: String,
      amtCol: String, buckets: Int = 4): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2: $buckets")
    val perCust = orders.groupBy(col(custCol).as("cust"))
      .agg(max(to_date(col(dateCol))).as("_last"),
        count(lit(1)).as("frequency"),
        sum(col(amtCol).cast("decimal(18,4)")).as("_m"))
    val bounds = orders.agg(max(to_date(col(dateCol))).as("_mx"))
    val wr = org.apache.spark.sql.expressions.Window
      .orderBy(col("recency_days").desc, col("cust"))
    val wf = org.apache.spark.sql.expressions.Window
      .orderBy(col("frequency"), col("cust"))
    val wm = org.apache.spark.sql.expressions.Window
      .orderBy(col("_m"), col("cust"))
    perCust.join(broadcast(bounds))
      .withColumn("recency_days", datediff(col("_mx"), col("_last")))
      .withColumn("r", ntile(buckets).over(wr))
      .withColumn("f", ntile(buckets).over(wf))
      .withColumn("m", ntile(buckets).over(wm))
      .select(col("cust"), col("recency_days"), col("frequency"),
        col("_m").cast("double").as("monetary"),
        col("r"), col("f"), col("m"),
        concat(col("r"), col("f"), col("m")).as("segment"))
  }

  def lastTouchAttribution(events: DataFrame, userCol: String,
      typeCol: String, ordCol: String, valueCol: String,
      conversionType: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(ordCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    events
      .withColumn("_ch",
        last(when(col(typeCol) =!= conversionType, col(typeCol)),
          ignoreNulls = true).over(w))
      .filter(col(typeCol) === conversionType)
      .groupBy(coalesce(col("_ch"), lit("(direct)")).as("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(col(valueCol).cast("decimal(18,4)")).as("_rev"))
      .select(col("channel"), col("n_conversions"),
        col("_rev").cast("double").as("revenue"))
  }
}
