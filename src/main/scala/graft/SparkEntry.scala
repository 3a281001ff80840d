package graft

import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract (SURVEY §7): one `queries` entry per implemented
  * operator from SURVEY.md §2 plus the LLM-pipeline extensions, each with
  * a DuckDB-equivalent `oracleSql` run against the same parquet tables.
  *
  * Determinism rules applied uniformly so Spark and DuckDB hash-match:
  *  - every query ends in an ORDER BY over a unique tuple;
  *  - double measures are aggregated as DECIMAL(18,4) (exact,
  *    order-independent) and emitted as DOUBLE;
  *  - raw nanosecond timestamps are never emitted (Spark truncates to µs;
  *    DuckDB keeps ns) — they are reduced to unix seconds / date strings;
  *  - computed doubles compared across engines are rounded to 6 dp.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** [[t]] spread across the session's cores ([[Tables.spread]]) — for
    * gates whose stage 1 runs expression-heavy per-row work (CDC
    * chunking, per-window md5) directly over the scan: single-row-group
    * testdata files give that stage exactly one task otherwise. No-op
    * whenever the scan already supplies ≥cores partitions (any real
    * input at scale). */
  private def tsp(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.spread(t(s, dir, name))

  /** Repo-local root for build-once/load-many artifacts (pair tables,
    * simhash signatures, IVF indexes), keyed by the source data dir so
    * scale factors never share an artifact. Kept out of the testdata
    * tree (read-only). Public: Verify resolves oracle-SQL path tokens
    * with it. */
  def artifactBase(dir: String): String =
    s"/root/repo/work/artifacts/${dir.replaceAll("[^A-Za-z0-9._-]", "_")}"

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("a3_report")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── §2.1 scans / §2.2 projections ────────────────────────────────
    "s4_scan_project" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_returnflag"), col("l_linestatus"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    "p1_projection" -> ((s, dir) => {
      // canonical fixed-order re-projection, extras dropped (R22:534-539)
      val canonical = Seq("p_partkey", "p_name", "p_brand", "p_type")
      t(s, dir, "part").select(canonical.map(col): _*)
        .orderBy(col("p_partkey"))
    }),

    "p2_autoid" -> ((s, dir) => {
      Ids.withDenseId(t(s, dir, "orders"), "auto_id", Seq(col("o_orderkey")))
        .select(col("auto_id"), col("o_orderkey"))
        .orderBy(col("auto_id"))
    }),

    "p3_p4_route" -> ((s, dir) => {
      t(s, dir, "events")
        .filter(instr(col("event_type"), "e") > 0)
        .select(col("event_id"), col("event_type"),
          when(col("event_type").isin("click", "view"), "engagement")
            .when(col("event_type") === "purchase", "revenue")
            .otherwise("ops").as("route"))
        .orderBy(col("event_id"))
    }),

    "p5_freshness" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val mx = ev.agg(max(col("ts")).as("_mx"))
      ev.crossJoin(broadcast(mx))
        .filter(col("ts") >= col("_mx") - expr("INTERVAL 7 DAYS"))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),

    // ── §2.3 joins ───────────────────────────────────────────────────
    "j1_upsert" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val target = orders.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val updates = orders.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
          (col("o_totalprice") * 2).as("o_totalprice"))
      Upsert.merge(target, updates, Seq("o_orderkey"))
        .orderBy(col("o_orderkey"))
    }),

    "j2_anti" -> ((s, dir) => {
      // pending-minus-processed anti-join (R22:579-661); every customer has
      // SOME order in this data, so probe "no recent (1998+) orders"
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    "j3_semi" -> ((s, dir) => {
      val p = t(s, dir, "part"); val l = t(s, dir, "lineitem")
      p.join(l, p("p_partkey") === l("l_partkey"), "left_semi")
        .select(col("p_partkey"), col("p_name"))
        .orderBy(col("p_partkey"))
    }),

    "j4_kv_range" -> ((s, dir) => {
      t(s, dir, "events")
        .filter(col("user_id").between(0, 9) &&
          col("event_type") === "purchase" && col("value") > 100.0)
        .select(col("event_id"), col("user_id"), col("value"))
        .orderBy(col("event_id"))
    }),

    "j5_star_join" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val sup = t(s, dir, "supplier"); val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      l.join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          sum(col("l_extendedprice").cast("decimal(18,4)") *
            (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
            .cast("double").as("revenue"),
          count(lit(1)).as("n"))
        .orderBy(col("r_name"))
    }),

    "j6_asof" -> ((s, dir) => {
      // point-in-time lookup: each purchase gets the user's most recent
      // click at-or-before it (union-sort as-of join — one shuffle, no
      // range-join product; see operators/AsofJoin)
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value"))
      AsofJoin.backward(purchases, clicks, Seq("user_id"), "ts", "ts", Seq("value"))
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("pts"),
          date_format(col("matched_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("cts"),
          // unmatched → sentinel, not NULL: a null DOUBLE materializes
          // as NaN in pandas and NaN never hash-equals itself
          coalesce(round(col("matched_value"), 6), lit(-1e9)).as("cvalue"))
        .orderBy(col("event_id"))
    }),

    "j7_range_window" -> ((s, dir) => {
      // bounded-window range join: clicks in the 7 days before each
      // purchase, same user (bin-bucketed equi-join — candidate count
      // bounded per (key, bucket), not per key; see operators/RangeJoin)
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value"))
      RangeJoin.windowBefore(purchases, clicks, Seq("user_id"), "ts", "ts",
          Seq("value"), windowSeconds = 7L * 86400)
        .select(col("event_id"), col("user_id"),
          date_format(col("w_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("cts"),
          round(col("w_value"), 6).as("cvalue"))
        .orderBy(col("event_id"), col("cts"), col("cvalue"))
    }),

    "j9_asof_nearest" -> ((s, dir) => {
      // nearest-in-time lookup: each purchase gets the user's CLOSEST
      // click on either side (ties resolve backward) — the
      // merge_asof(direction='nearest') shape, one shuffle (both
      // direction payloads ride the same union-sort window pass)
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value"))
      AsofJoin.nearest(purchases, clicks, Seq("user_id"), "ts", "ts", Seq("value"))
        .select(col("event_id"), col("user_id"),
          date_format(col("matched_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("cts"),
          coalesce(round(col("matched_value"), 6), lit(-1e9)).as("cvalue"))
        .orderBy(col("event_id"))
    }),

    "j10_scd2" -> ((s, dir) => {
      // SCD2 merge: history-preserving upsert — a changed attribute
      // closes the current row (valid_to = ts) and opens a new one;
      // identical attributes are a replay no-op. One equi-join between
      // the CURRENT slice and the updates; closed history never joins.
      // The update batch is derived deterministically from customer:
      // %3==0 keys change segment, %3==1 keys send an identical row
      // (no-op path), %3==2 keys receive no update.
      val cust = t(s, dir, "customer")
      val hist = cust.select(col("c_custkey").as("key"),
        col("c_mktsegment").as("segment"),
        lit("1995-01-01").cast("timestamp").as("valid_from"),
        lit(null).cast("timestamp").as("valid_to"))
      val updates = cust.filter(col("c_custkey") % 3 =!= 2)
        .select(col("c_custkey").as("key"),
          when(col("c_custkey") % 3 === 0,
            concat(lit("SEG_"), (col("c_custkey") % 5).cast("string")))
            .otherwise(col("c_mktsegment")).as("segment"),
          lit("2000-06-01").cast("timestamp").as("ts"))
      operators.Upsert.scd2Merge(hist, updates, Seq("key"),
          Seq("segment"), "ts")
        .select(col("key"), col("segment"),
          date_format(col("valid_from"), "yyyy-MM-dd").as("valid_from"),
          coalesce(date_format(col("valid_to"), "yyyy-MM-dd"),
            lit("current")).as("valid_to"))
        .orderBy(col("key"), col("valid_from"), col("segment"))
    }),

    "j11_bucketed" -> ((s, dir) => {
      // co-located fact-fact join: both sides served from a CLUSTERED
      // BY (bucketed) layout on the join key, so the join itself needs
      // NO exchange on either side — at 100 TB the difference between
      // shuffling two fact tables and a local zipped-bucket merge
      // (BucketingSpec asserts the exchange-free plan under forced SMJ).
      // Layout never changes content: the oracle is the plain join
      // over the original parquet.
      val o = bucketedTable(s, dir, "orders", "o_orderkey")
        .select(col("o_orderkey"), col("o_orderpriority"))
      val l = bucketedTable(s, dir, "lineitem", "l_orderkey")
        .select(col("l_orderkey"), col("l_quantity"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double")
            .as("qty"))
        .orderBy(col("o_orderpriority"))
    }),

    "j12_interval" -> ((s, dir) => {
      // range join via bucket decomposition: "orders placed within the
      // 3 days after each order" is a pure BETWEEN join — natively a
      // BroadcastNestedLoop/cartesian wall. IntervalJoin grids the
      // date axis (bucketWidth 4 days), explodes each interval to the
      // 1-2 buckets it touches, equi-joins on the bucket id, and
      // refines with the BETWEEN residual — one hash join, no
      // quadratic operator in the plan (spec-asserted).
      //
      // AGGREGATE-FIRST: the count is keyless in everything but the
      // date, so the decomposition runs at DAY grain (thousands of
      // rows at any SF — the fact-grain form materializes every
      // qualifying PAIR, tens of millions of rows that exist only to
      // be counted), and the per-day totals broadcast back onto
      // orders. Same answer, pair blow-up never materializes.
      val o = t(s, dir, "orders")
      val days = o.groupBy(unix_timestamp(col("o_orderdate")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      val ivs = days.select(col("d").as("_iv_day"),
        col("d").as("lo"), (col("d") + lit(3L * 86400)).as("hi"))
      val perDay = operators.IntervalJoin.pointInInterval(
          days, "d", ivs, "lo", "hi", bucketWidth = 4L * 86400)
        .groupBy(col("_iv_day")).agg(sum(col("cnt")).as("n_follow"))
      o.select(col("o_orderkey"),
          unix_timestamp(col("o_orderdate")).as("_iv_day"))
        .join(broadcast(perDay), Seq("_iv_day"))
        .select(col("o_orderkey"), col("n_follow"))
        .orderBy(col("o_orderkey"))
    }),

    "j13_scd2_asof" -> ((s, dir) => {
      // point-in-time view of an SCD2 history, AT the exact change
      // instant — the half-open boundary contract: a row closed at ts
      // is gone, the row opened at ts is visible. One scan-stage
      // filter (on a partitioned history it partition-prunes; j10's
      // merge is replayed here to build the same two-epoch history).
      val cust = t(s, dir, "customer")
      val hist = cust.select(col("c_custkey").as("key"),
        col("c_mktsegment").as("segment"),
        lit("1995-01-01").cast("timestamp").as("valid_from"),
        lit(null).cast("timestamp").as("valid_to"))
      val updates = cust.filter(col("c_custkey") % 3 =!= 2)
        .select(col("c_custkey").as("key"),
          when(col("c_custkey") % 3 === 0,
            concat(lit("SEG_"), (col("c_custkey") % 5).cast("string")))
            .otherwise(col("c_mktsegment")).as("segment"),
          lit("2000-06-01").cast("timestamp").as("ts"))
      val merged = operators.Upsert.scd2Merge(hist, updates, Seq("key"),
        Seq("segment"), "ts")
      operators.Upsert.scd2AsOf(merged,
          lit("2000-06-01").cast("timestamp"))
        .select(col("key"), col("segment"),
          date_format(col("valid_from"), "yyyy-MM-dd").as("valid_from"))
        .orderBy(col("key"), col("segment"))
    }),

    // ── §2.4 aggregations ────────────────────────────────────────────
    "a1_count" -> ((s, dir) =>
      t(s, dir, "lineitem").agg(count(lit(1)).as("n"))),

    "a2_reconcile" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .agg(count(lit(1)).as("file_rows"),
          count(col("l_orderkey")).as("staged_rows"))
        .withColumn("ok",
          abs(col("file_rows") - col("staged_rows")) <= 5)
    }),

    "a3_report" -> ((s, dir) => {
      val base = Reports.reportBase(t(s, dir, "lineitem"), t(s, dir, "orders"),
        t(s, dir, "customer"), t(s, dir, "nation"), t(s, dir, "region"))
      Reports.priceByPeriodGeoCategory(base, 1996,
          Seq("NATION_1", "NATION_2", "NATION_3"))
        .orderBy(col("y"), col("m"), col("geo"), col("category"))
    }),

    "a4_report_base" -> ((s, dir) => {
      Reports.reportBase(t(s, dir, "lineitem"), t(s, dir, "orders"),
          t(s, dir, "customer"), t(s, dir, "nation"), t(s, dir, "region"))
        .withColumn("order_date", date_format(col("o_orderdate"), "yyyy-MM-dd"))
        .drop("o_orderdate")
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    "a5_status_check" -> ((s, dir) => {
      // "successful event within window?" per key, {-1,0,1} protocol
      val ev = t(s, dir, "events")
      val mx = ev.agg(max(col("ts")).as("_mx"))
      ev.crossJoin(broadcast(mx))
        .filter(col("event_type") === "error" &&
          col("ts") >= col("_mx") - expr("INTERVAL 3 DAYS"))
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
        .withColumn("status", when(col("n") >= 3, -1).otherwise(1))
        .orderBy(col("user_id"))
    }),

    "a6_group_collect" -> ((s, dir) => {
      t(s, dir, "events").filter(col("value") > 200)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          concat_ws(",", sort_array(collect_list(col("user_id")))).as("users"))
        .orderBy(col("event_type"))
    }),

    "a7_dup_counts" -> ((s, dir) => {
      t(s, dir, "events").filter(col("event_type") === "error")
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .orderBy(col("user_id"))
    }),

    "a8_pivot" -> ((s, dir) => {
      // pivot: event counts per user decile × event type. Fixed value
      // list (no extra values-discovery job); missing combos coalesced
      // to 0 so both engines emit identical non-null counts.
      val types = Seq("click", "error", "purchase", "signup", "view")
      val pv = t(s, dir, "events")
        .groupBy(pmod(col("user_id"), lit(10L)).as("ub"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
      pv.select(col("ub") +: types.map(c => coalesce(col(c), lit(0L)).as(c)): _*)
        .orderBy(col("ub"))
    }),

    "a9_rollup" -> ((s, dir) => {
      // rollup: subtotals per (returnflag, linestatus), per returnflag,
      // grand total — one pass, Expand-based (no re-aggregation)
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    "a10_distinct_salted" -> ((s, dir) => {
      // two-phase skew-bounded distinct: value-hash salt splits each
      // group's distinct-state across buckets (phase 1), partial counts
      // sum exactly (phase 2) — no single reducer holds a hot group's
      // whole distinct set
      Salting.saltedDistinctCount(t(s, dir, "events"),
          Seq("event_type"), "user_id", saltBuckets = 8)
        .orderBy(col("event_type"))
    }),

    "j8_salted_join" -> ((s, dir) => {
      // hot-key-proof join: salt spreads each order key over 4 buckets,
      // the small side replicates 4×; result identical to the plain join
      val l = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"))
      val o = t(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
      Salting.saltedJoin(l, o, Seq("l_orderkey"), saltBuckets = 4)
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double")
          .as("total"), count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    }),

    "q1_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double").as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(18,4)") *
            (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
            .cast("double").as("sum_disc_price"),
          (sum(col("l_quantity").cast("decimal(18,4)")).cast("double") /
            count(lit(1)).cast("double")).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q3_shipping_priority" -> ((s, dir) => {
      // TPC-H Q3 shape: revenue of unshipped orders for one segment.
      // customer is NOT broadcast — at the 100 TB target it is a fact-
      // sized table; the equi-joins shuffle on their keys and AQE picks
      // the physical strategy per actual size.
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1996-03-15").cast("timestamp"))
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1996-03-15").cast("timestamp"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"),
          col("o_orderpriority"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,4)") *
            (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    "q5_local_supplier" -> ((s, dir) => {
      // TPC-H Q5 shape: regional revenue where customer and supplier
      // share a nation. nation/region broadcast (always tiny); the
      // c_nationkey = s_nationkey predicate rides the supplier join.
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem"); val sup = t(s, dir, "supplier")
      val n = t(s, dir, "nation"); val r = t(s, dir, "region")
      l.join(o.filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-01-01").cast("timestamp")),
          l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey") &&
          c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r.filter(col("r_name") === "ASIA")),
          n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,4)") *
            (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    "q7_nation_volume" -> ((s, dir) => {
      // TPC-H Q7 shape: bilateral shipping volume by nation pair and year
      val l = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val c = t(s, dir, "customer"); val sup = t(s, dir, "supplier")
      val n1 = t(s, dir, "nation").select(col("n_nationkey").as("s_nk"),
        col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation").select(col("n_nationkey").as("c_nk"),
        col("n_name").as("cust_nation"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n1), sup("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), c("c_nationkey") === col("c_nk"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("o_orderdate")).cast("int").as("l_year"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
          .cast("double").as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),

    "q10_returned_items" -> ((s, dir) => {
      // TPC-H Q10 shape: top customers by revenue lost to returns
      val l = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    "q4_order_priority" -> ((s, dir) => {
      // TPC-H Q4 shape: orders of one quarter with at least one line
      // shipped >30 days after ordering (EXISTS → left-semi, the join
      // Catalyst never materializes). The quarter predicate prunes the
      // orders scan; the correlated date condition rides the join.
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      val l = t(s, dir, "lineitem")
      o.join(l,
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    "q12_priority_class" -> ((s, dir) => {
      // TPC-H Q12 shape: conditional aggregation — per return flag, how
      // many 1997-shipped lines belong to high- vs low-priority orders.
      // CASE sums fold into one pass over the join; the year range is
      // a pushable scan predicate.
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      val o = t(s, dir, "orders")
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy(col("l_returnflag"))
    }),

    "q14_promo_revenue" -> ((s, dir) => {
      // TPC-H Q14 shape: promo revenue share of one month. Decimal
      // per-term casts keep both engines' sums exact (q1 pattern); the
      // part side broadcasts.
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
      val p = t(s, dir, "part")
      val disc = col("l_extendedprice").cast("decimal(18,4)") *
        (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)"))
      l.join(p, col("l_partkey") === col("p_partkey"))
        .agg(round(
          lit(100.0) *
            sum(when(col("p_type") === "PROMO", disc)
              .otherwise(lit(0).cast("decimal(18,4)"))).cast("double") /
            sum(disc).cast("double"), 6).as("promo_revenue"))
    }),

    "q17_small_quantity" -> ((s, dir) => {
      // TPC-H Q17 shape (p_size standing in for the absent
      // p_container): average yearly revenue lost if small-quantity
      // orders of one brand stopped. The correlated scalar subquery
      // avg(l_quantity per part) becomes a per-part aggregate over the
      // ALREADY part-filtered lineitem slice — the brand filter
      // broadcasts into both passes, so the threshold table is
      // dim-sized and itself broadcasts back; nothing corpus-wide
      // shuffles. The comparison runs multiplied through (5·qty·cnt <
      // sum·... ) in exact decimals instead of dividing — no
      // cross-engine decimal-division scale drift.
      val p = t(s, dir, "part")
        .filter(col("p_brand") === "Brand#23" && col("p_size") < 15)
        .select(col("p_partkey"))
      val l = t(s, dir, "lineitem")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      val thresholds = l.groupBy(col("l_partkey").as("_tp"))
        .agg(sum(col("l_quantity").cast("decimal(18,4)")).as("_sq"),
          count(lit(1)).as("_cq"))
      // qty < 0.2·(sq/cq)  ⟺  qty·5·cq < sq — ONE decimal multiply
      // (DECIMAL(10,4) × DECIMAL(18,0) fits every engine's 38-digit
      // cap; chained decimal multiplies don't, DuckDB doesn't widen)
      l.join(broadcast(thresholds), col("l_partkey") === col("_tp"))
        .filter(col("l_quantity").cast("decimal(10,4)") *
            (col("_cq") * 5).cast("decimal(18,0)") < col("_sq"))
        .agg(round(sum(col("l_extendedprice").cast("decimal(18,4)"))
          .cast("double") / 7.0d, 6).as("avg_yearly"))
    }),

    "q6_forecast_revenue" -> ((s, dir) => {
      // TPC-H Q6 shape: single-table filter-aggregate. Every predicate
      // is a pushable range (date/discount/quantity min-max row-group
      // pruning); the plan is scan → partial agg → 1-row exchange, the
      // cheapest possible shape — any join or shuffle here is wrong.
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount") >= 0.04 && col("l_discount") <= 0.06 &&
          col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice").cast("decimal(18,4)") *
            col("l_discount").cast("decimal(18,4)")).cast("double"), 6)
          .as("revenue"))
    }),

    "q18_large_orders" -> ((s, dir) => {
      // TPC-H Q18 shape: a HAVING aggregate (orders whose line quantity
      // sum clears a threshold) feeding a semi-join, then the detail
      // re-join and top-100. The big-order id set is aggregated BEFORE
      // any wide join — the semi-join probe side carries ids only, and
      // the final ranking is TakeOrdered, never a global sort.
      val l = t(s, dir, "lineitem")
      val big = l.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("_q"))
        .filter(col("_q") > 200).select(col("l_orderkey"))
      t(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"))
        .agg(sum(col("l_quantity")).as("total_qty"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_totalprice"), col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    "q19_disjunctive" -> ((s, dir) => {
      // TPC-H Q19 shape: a disjunction of conjunctive (brand, size,
      // quantity) envelopes across the part join. The common quantity
      // hull [1, 30] and size hull are scan-pushable; the residual OR
      // evaluates post-join in one codegen stage — no union-of-three-
      // joins rewrite needed (that shape would scan lineitem 3×).
      val l = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      val env = (col("p_brand") === "Brand#11" &&
          col("p_size").between(1, 10) && col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#21" &&
          col("p_size").between(1, 20) && col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#24" &&
          col("p_size").between(1, 30) && col("l_quantity").between(20, 30))
      l.join(p, col("l_partkey") === col("p_partkey"))
        .filter(env)
        .agg(round(sum(col("l_extendedprice").cast("decimal(18,4)") *
            (lit(1).cast("decimal(18,4)") -
              col("l_discount").cast("decimal(18,4)"))).cast("double"), 6)
          .as("revenue"))
    }),

    "q8_market_share" -> ((s, dir) => {
      // TPC-H Q8 shape: one supplier nation's share of a region's
      // market for one part type, per year — a 7-way star join where
      // every dimension (nation ×2, region, part-after-filter,
      // supplier) broadcasts and the fact chain (lineitem⋈orders⋈
      // customer) is left to AQE; the share is a CASE sum over the
      // same decimal volume term.
      val vol = col("l_extendedprice").cast("decimal(18,4)") *
        (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)"))
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val n2 = t(s, dir, "nation")
        .select(col("n_nationkey").as("_snk"), col("n_name").as("supp_nation"))
      t(s, dir, "lineitem")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .join(broadcast(t(s, dir, "part").filter(col("p_type") === "PROMO")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n2), col("s_nationkey") === col("_snk"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(round(
          sum(when(col("supp_nation") === "NATION_3", vol)
            .otherwise(lit(0).cast("decimal(18,4)"))).cast("double") /
            sum(vol).cast("double"), 6).as("mkt_share"))
        .orderBy(col("o_year"))
    }),

    "q13_order_histogram" -> ((s, dir) => {
      // TPC-H Q13 shape: LEFT join with a pushed join-side filter, then
      // a double aggregation (orders per customer → customers per order
      // count). count(col) skips the nulls the outer join manufactures,
      // so zero-order customers land in the 0 bucket.
      t(s, dir, "customer")
        .join(t(s, dir, "orders")
            .filter(col("o_orderpriority") =!= "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    "q15_top_supplier" -> ((s, dir) => {
      // TPC-H Q15 shape: per-supplier revenue for one quarter, then the
      // supplier(s) achieving the maximum — a scalar-subquery equality.
      // The max is a 1-row broadcast against the aggregated (supplier-
      // count-sized) revenue table; revenue values compare at 6 dp on
      // both engines, so the equality is engine-portable.
      val disc = col("l_extendedprice").cast("decimal(18,4)") *
        (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)"))
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(round(sum(disc).cast("double"), 6).as("total_revenue"))
      val mx = rev.agg(max(col("total_revenue")).as("_mx"))
      rev.join(broadcast(mx), col("total_revenue") === col("_mx"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy(col("s_suppkey"))
    }),

    "q22_idle_customers" -> ((s, dir) => {
      // TPC-H Q22 shape: positive-balance customers above the segment
      // population's average balance with NO recent orders — scalar AVG
      // subquery (broadcast 1-row crossJoin) + anti join. The average is
      // an exact decimal sum over an exact count, so the comparison
      // threshold is engine-identical; the anti join's probe side is
      // date-filtered at the scan.
      val sel = t(s, dir, "customer")
        .filter(col("c_mktsegment")
          .isin("BUILDING", "AUTOMOBILE", "MACHINERY"))
      val avgBal = sel.filter(col("c_acctbal") > 0)
        .agg((sum(col("c_acctbal").cast("decimal(18,4)")).cast("double") /
          count(lit(1))).as("_ab"))
      val recent = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      sel.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("_ab"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"),
          sum(col("c_acctbal").cast("decimal(18,4)")).cast("double")
            .as("total_bal"))
        .orderBy(col("c_mktsegment"))
    }),

    "q2_min_cost_supplier" -> ((s, dir) => {
      // TPC-H Q2 shape (lineitem standing in for the absent partsupp:
      // a (part, supplier) offer's cost = the cheapest extended price
      // the pair ever shipped at). The correlated min-cost subquery
      // becomes a per-part aggregate of the region-sliced offer table
      // joined back on (partkey, cost) — the q15 scalar-max pattern at
      // part grain. Stored doubles are compared by EQUALITY only
      // (min of raw values, no arithmetic), so the join key is
      // engine-portable; supplier/nation/region dims all broadcast.
      val n = t(s, dir, "nation"); val r = t(s, dir, "region")
      val regSupp = t(s, dir, "supplier")
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r.filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
      val offers = t(s, dir, "lineitem")
        .join(broadcast(regSupp.select(col("s_suppkey").as("_rs"))),
          col("l_suppkey") === col("_rs"), "left_semi")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(col("l_extendedprice")).as("cost"))
      val minCost = offers.groupBy(col("l_partkey").as("_mp"))
        .agg(min(col("cost")).as("_mc"))
      offers
        .join(minCost, col("l_partkey") === col("_mp") && col("cost") === col("_mc"))
        .join(broadcast(t(s, dir, "part")
            .filter(col("p_size") <= 15 && col("p_type") === "STANDARD")
            .select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(regSupp), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("cost"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    }),

    "q9_product_profit" -> ((s, dir) => {
      // TPC-H Q9 shape: profit by supplier nation and year over one
      // part-name family (p_retailprice standing in for the absent
      // ps_supplycost). Both product terms are SINGLE decimal
      // multiplies (the q17 rule — chained decimal multiplies blow
      // DuckDB's 38-digit cap), so the per-group sums are exact and
      // order-independent; the subtraction happens between two exact
      // sums, then one cast to double.
      val p = t(s, dir, "part").filter(col("p_name").contains("gear"))
        .select(col("p_partkey"), col("p_retailprice"))
      val revenue = col("l_extendedprice").cast("decimal(18,4)") *
        (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)"))
      val supplyCost = col("p_retailprice").cast("decimal(18,4)") *
        col("l_quantity").cast("decimal(18,4)")
      t(s, dir, "lineitem")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("int").as("o_year"))
        .agg(round((sum(revenue) - sum(supplyCost)).cast("double"), 6)
          .as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    "q11_important_parts" -> ((s, dir) => {
      // TPC-H Q11 shape: parts carrying a significant share of one
      // nation's shipped value (lineitem standing in for partsupp).
      // The HAVING threshold is a 1-row scalar aggregate broadcast
      // back (q22's crossJoin shape); the share test is an exact
      // integer-multiplied decimal compare (value·1000 > total) — no
      // decimal division anywhere to drift between engines.
      val ns = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")
          .filter(col("n_name") === "NATION_7")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey").as("_ns"))
      val slice = t(s, dir, "lineitem")
        .join(broadcast(ns), col("l_suppkey") === col("_ns"), "left_semi")
        .select(col("l_partkey"),
          col("l_extendedprice").cast("decimal(18,4)").as("_v"))
      val byPart = slice.groupBy(col("l_partkey")).agg(sum(col("_v")).as("_pv"))
      val total = slice.agg(sum(col("_v")).as("_tv"))
      byPart.crossJoin(broadcast(total))
        .filter(col("_pv") * lit(1000) > col("_tv"))
        .select(col("l_partkey"), col("_pv").cast("double").as("value"))
        .orderBy(col("value").desc, col("l_partkey"))
    }),

    "q16_supplier_counts" -> ((s, dir) => {
      // TPC-H Q16 shape: distinct suppliers able to provide each
      // (brand, type, size) family, minus a complaints blacklist
      // (NOT IN → left-anti). The supplier-part association is the
      // distinct (l_partkey, l_suppkey) projection of lineitem
      // (partsupp's stand-in) — ONE combinable distinct shuffle; the
      // family grain is dim-sized so the count-distinct agg is cheap.
      val bad = t(s, dir, "supplier").filter(col("s_acctbal") < 500)
        .select(col("s_suppkey").as("_bad"))
      val assoc = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey")).distinct()
        .join(broadcast(bad), col("l_suppkey") === col("_bad"), "left_anti")
      val p = t(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#2" &&
          !col("p_type").startsWith("SMALL") &&
          col("p_size").isin(1, 5, 11, 15, 20, 25, 30, 35))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      assoc.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }),

    "q20_excess_parts" -> ((s, dir) => {
      // TPC-H Q20 shape: suppliers holding a dominant share (>50%,
      // with an absolute volume floor) of a part family's 1997
      // volume — the availqty-vs-half-of-shipped test recast over
      // lineitem. Per-(part,supplier) and per-part aggregates are both
      // combinable; the dominance compare is integer-multiplied exact
      // decimal; the supplier list arrives via two stacked semi-joins.
      val l97 = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(broadcast(t(s, dir, "part")
            .filter(col("p_name").startsWith("red"))
            .select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"), "left_semi")
      val ps = l97.groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,4)")).as("_q"))
      val pt = ps.groupBy(col("l_partkey").as("_pp")).agg(sum(col("_q")).as("_tq"))
      val dominant = ps.join(pt, col("l_partkey") === col("_pp"))
        .filter(col("_q") * lit(2) > col("_tq") &&
          col("_q") >= lit(60).cast("decimal(18,4)"))
        .select(col("l_suppkey"))
      t(s, dir, "supplier")
        .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_name"), col("n_name"))
        .orderBy(col("s_name"))
    }),

    "q21_waiting_suppliers" -> ((s, dir) => {
      // TPC-H Q21 shape (shipdate standing in for the absent
      // receipt/commit pair): suppliers of one nation who were the
      // LAST to ship in a multi-supplier finished order. EXISTS →
      // left-semi ("another supplier touched the order"); NOT EXISTS
      // → left-anti ("someone else shipped strictly later"). Both
      // correlations are l_orderkey equi-joins with residual
      // conditions, so each self-join shuffles on the order key and
      // candidate work is bounded per order — never a pair product
      // across orders.
      val base = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      val natSupp = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")
          .filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"))
      val fOrders = t(s, dir, "orders")
        .filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
      val l2 = base.select(col("l_orderkey").as("_ok2"),
        col("l_suppkey").as("_sk2"))
      val l3 = base.select(col("l_orderkey").as("_ok3"),
        col("l_suppkey").as("_sk3"), col("l_shipdate").as("_sd3"))
      base
        .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
        .join(fOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .join(l2, col("l_orderkey") === col("_ok2") &&
          col("l_suppkey") =!= col("_sk2"), "left_semi")
        .join(l3, col("l_orderkey") === col("_ok3") &&
          col("l_suppkey") =!= col("_sk3") &&
          col("_sd3") > col("l_shipdate"), "left_anti")
        .groupBy(col("s_name"))
        .agg(countDistinct(col("l_orderkey")).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    }),

    // ── §2.5 windows / §2.6 sorts ────────────────────────────────────
    "w1_rownum" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("value"), col("event_id"))
      t(s, dir, "events").filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          row_number().over(w).as("rn"))
        .orderBy(col("user_id"), col("rn"))
    }),

    "w2_latest_per_key" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("value").desc, col("event_id").desc)
      t(s, dir, "events")
        .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"))
        .orderBy(col("user_id"), col("event_type"))
    }),

    "o1_chunks" -> ((s, dir) => {
      Ids.withDenseId(t(s, dir, "orders"), "_id", Seq(col("o_orderkey")))
        .withColumn("chunk", floor((col("_id") - 1) / 500))
        .groupBy(col("chunk"))
        .agg(count(lit(1)).as("n"),
          min(col("o_orderkey")).as("lo"), max(col("o_orderkey")).as("hi"))
        .orderBy(col("chunk"))
    }),

    // ── §2.8 scalar functions ────────────────────────────────────────
    "f_strings" -> ((s, dir) => {
      val p = t(s, dir, "part")
      val path = concat(lit("warehouse/"), col("p_brand"), lit("/part_"),
        col("p_partkey").cast("string"), lit(".csv"))
      p.select(col("p_partkey"),
          path.as("path"),
          regexp_extract(path, "([^/]+)$", 1).as("base"),
          lower(col("p_name")).as("lname"),
          replace(col("p_name"), lit(" "), lit("_")).as("uname"),
          (instr(col("p_type"), "ECONOMY") > 0).as("is_econ"),
          substring(col("p_name"), 1, 5).as("prefix"))
        .orderBy(col("p_partkey"))
    }),

    "f_dates" -> ((s, dir) => {
      // EST here is the fixed UTC-5 of the data's January window, so the
      // oracle can reproduce it without a timezone database.
      t(s, dir, "events")
        .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
          // fixed -05:00 offset (not America/New_York): the DuckDB oracle
          // computes ts - 5h, and a DST-aware zone would diverge from it
          // for data after the March switch (UTC-4 vs UTC-5)
          hour(from_utc_timestamp(col("ts"), "-05:00")).as("est_hour"))
        .groupBy(col("day"), col("est_hour")).agg(count(lit(1)).as("n"))
        .orderBy(col("day"), col("est_hour"))
    }),

    "f_json" -> ((s, dir) => {
      t(s, dir, "events")
        .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
        .orderBy(col("k"))
    }),

    "f_json_struct" -> ((s, dir) => {
      // F18/F19: full JSON parse to a typed struct + field access (the
      // reference's json.loads + body['Records'][0]... chains)
      t(s, dir, "events")
        .select(from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT")).as("j"))
        .select(col("j.k").as("k"))
        .groupBy(pmod(col("k"), lit(10)).as("bucket"))
        .agg(count(lit(1)).as("n"), max(col("k")).as("mx"))
        .orderBy(col("bucket"))
    }),

    "f_math" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          pmod(col("l_orderkey"), lit(7)).as("m7"),
          ceil(col("l_quantity") / 7).as("cq"),
          floor(col("l_extendedprice") / 1024).as("kb"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    "f_url" -> ((s, dir) => {
      // F4 url-decode (R21:160); input constrained to %20 escapes so the
      // DuckDB-1.0 oracle (no url_decode) reproduces it with replace()
      val enc = concat(col("p_brand"), lit("%20"),
        regexp_replace(col("p_name"), " ", "%20"))
      t(s, dir, "part")
        .select(col("p_partkey"), url_decode(enc).as("decoded"))
        .orderBy(col("p_partkey"))
    }),

    "f_clean_truncate" -> ((s, dir) => {
      // F8 control-char strip via unicode category + O3 100-char truncate
      // (R21:568); \p{C} on ASCII input ≡ the oracle's control-char class
      val messy = concat(col("p_name"), lit("\t"), col("p_type"),
        lit("\u0007"))
      t(s, dir, "part")
        .select(col("p_partkey"),
          substring(regexp_replace(messy, "\\p{C}", ""), 1, 20).as("subject"))
        .orderBy(col("p_partkey"))
    }),

    // ── §2.6/§2.7 top-k / set ops ───────────────────────────────────
    "o2_topk" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)),

    "u1_union" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val hi = o.filter(col("o_totalprice") > 400000)
        .select(col("o_orderkey"), col("o_orderstatus"))
      val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderstatus"))
      hi.unionByName(urgent).distinct()
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    }),

    "u2_except" -> ((s, dir) => {
      // set difference: customers who never placed a high-value order
      // (plain "no orders at all" is empty on this data — every customer
      // orders; the filter keeps the query's result non-trivial)
      t(s, dir, "customer").select(col("c_custkey").as("k"))
        .except(t(s, dir, "orders").filter(col("o_totalprice") > 250000)
          .select(col("o_custkey").as("k")))
        .orderBy(col("k"))
    }),

    "u3_intersect" -> ((s, dir) => {
      // set intersection: order keys present in both lineitem and orders
      // with a filter on each side
      t(s, dir, "orders").filter(col("o_totalprice") > 300000)
        .select(col("o_orderkey").as("k"))
        .intersect(t(s, dir, "lineitem").filter(col("l_quantity") >= 40)
          .select(col("l_orderkey").as("k")))
        .orderBy(col("k"))
    }),

    "a11_cube" -> ((s, dir) => {
      // cube: all 4 grouping-set combinations in one Expand pass
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    "a12_percentiles" -> ((s, dir) => {
      // exact interpolated percentiles (median, p95) per group. The
      // approximate path (approx_percentile/HLL sketches) is spec-checked
      // against exact values instead — sketch internals differ across
      // engines, so no cross-engine hash can exist (see AggSketchSpec).
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.95)"), 6).as("p95"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),

    "a13_histogram" -> ((s, dir) =>
      // equi-width numeric histogram — the profiling shape: integer
      // bucketing folds into one combinable group-by at the scan; both
      // engines bucket the same IEEE doubles identically.
      t(s, dir, "lineitem")
        .select(floor(col("l_extendedprice") / 5000.0).cast("long")
          .as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))),

    "a14_corr" -> ((s, dir) => {
      // Pearson correlation from EXACT decimal moments: n, Σx, Σy, Σxy,
      // Σx², Σy² accumulate as decimals (order-independent), and only
      // the final scalar formula runs in double — engine-portable where
      // a float corr() aggregate could drift with partition order.
      val x = col("l_quantity").cast("decimal(18,4)")
      val y = col("l_extendedprice").cast("decimal(18,4)")
      t(s, dir, "lineitem")
        .agg(count(lit(1)).cast("double").as("_n"),
          sum(x).cast("double").as("_sx"), sum(y).cast("double").as("_sy"),
          sum(x * y).cast("double").as("_sxy"),
          sum(x * x).cast("double").as("_sxx"),
          sum(y * y).cast("double").as("_syy"))
        .select(round(
          (col("_n") * col("_sxy") - col("_sx") * col("_sy")) /
            sqrt((col("_n") * col("_sxx") - col("_sx") * col("_sx")) *
              (col("_n") * col("_syy") - col("_sy") * col("_sy"))), 6)
          .as("corr_qty_price"))
    }),

    "a15_kmv_distinct" -> ((s, dir) =>
      // KMV distinct-count sketch (Bar-Yossef et al. 2002): mergeable
      // approximate COUNT DISTINCT from order statistics of the
      // samplers' md5 coordinate — k-bounded aggregation state (≤256
      // longs per group per map task where exact distinct shuffles
      // every distinct value), and, unlike an HLL register blob, the
      // estimate is integer arithmetic the oracle replays EXACTLY.
      Sketches.distinctCountEstimate(
          t(s, dir, "lineitem"), Seq("l_returnflag"), "l_partkey", 256)
        .orderBy(col("l_returnflag"))),

    "a16_cms_freq" -> ((s, dir) => {
      // Count-Min sketch (Cormode & Muthukrishnan 2005): frequency
      // estimation whose whole state is a 4×1024 ADDITIVE counter
      // table — mergeable across partitions/days by cell-wise sum,
      // shuffle bounded at depth·width cells per map task. Estimates
      // (min over rows, never an underestimate) sit next to the exact
      // counts so the gate also measures the collision overshoot.
      val li = t(s, dir, "lineitem")
      val counters = Sketches.cmsCounters(li, "l_suppkey", 4, 1024)
      Sketches.cmsEstimate(li, "l_suppkey", counters, 4, 1024)
        .join(li.groupBy("l_suppkey").agg(count(lit(1)).as("exact_freq")),
          Seq("l_suppkey"))
        .orderBy(col("l_suppkey"))
    }),

    "a16b_cms_freq_fast" -> ((s, dir) => {
      // the xxhash64 PRODUCTION twin of a16_cms_freq: one codegen'd
      // native hash per (row, key) instead of the md5 hex walk that
      // dominates a16's runtime. The engine-specific hash lands in the
      // build-once artifact pair (probes + counters — the simhash
      // trust boundary) and the oracle replays the sketch ALGEBRA
      // from parquet: min-over-rows estimation joined against the
      // exact counts, never an underestimate.
      val li = t(s, dir, "lineitem")
      val (counters, probes) = Sketches.cmsTableFast(
        li, "l_suppkey", 4, 1024, artifactBase(dir))
      Sketches.cmsEstimateFromArtifacts(probes, counters, "l_suppkey")
        .join(li.groupBy("l_suppkey").agg(count(lit(1)).as("exact_freq")),
          Seq("l_suppkey"))
        .orderBy(col("l_suppkey"))
    }),

    "a17_kmv_overlap" -> ((s, dir) => {
      // KMV set algebra (Beyer et al. 2007): how much do two key sets
      // overlap, answered from two 128-long synopses — the union
      // sketch's in-both fraction estimates Jaccard, so |A∩B| ≈
      // ρ·|A∪B|. Each side is one k-bounded aggregation; the compare
      // itself touches 2k longs. Two 100 TB corpora never join.
      import s.implicits._
      val o = t(s, dir, "orders")
      def custs(yr: Int) = o
        .filter(year(col("o_orderdate")) === yr)
        .select(col("o_custkey"))
      val a = Sketches.kmvSketch(custs(1996), "o_custkey", 128)
      val b = Sketches.kmvSketch(custs(1997), "o_custkey", 128)
      val (u, ov, inter) = Sketches.kmvUnionStats(a, b, 128)
      Seq((u, ov, inter)).toDF("union_est", "overlap_k", "inter_est")
    }),

    "a18_profile" -> ((s, dir) =>
      // one-pass column profiler: counts, nulls, KMV ndv (exact below
      // k=256, order-statistics estimate above — l_orderkey and
      // l_shipdate take the estimate path here), native-typed min/max
      // rendered as strings. ONE aggregation, no per-column Expand —
      // the 100 TB profiling pass costs one scan regardless of how
      // many columns it covers.
      Profile.profile(t(s, dir, "lineitem"),
          Seq("l_orderkey", "l_suppkey", "l_returnflag", "l_shipdate"))
        .orderBy(col("column"))),

    "a19_checks" -> ((s, dir) => {
      // declarative constraint suite (Deequ shape): all row-level
      // checks per table fold into ONE sum-of-violations aggregation
      // over one scan; uniqueness adds its one keyed count shuffle,
      // referential integrity one anti join (orphans-only shuffle).
      // The reference's QA surface is a row-count reconcile plus a
      // 5-row error tolerance — this is that contract, typed.
      val o = t(s, dir, "orders")
      Profile.rowChecks(o, Seq(
          "o_totalprice_positive" -> (col("o_totalprice") <= 0),
          "o_status_domain" -> !col("o_orderstatus").isin("O", "F", "P"),
          "o_priority_nonempty" -> (length(col("o_orderpriority")) === 0)))
        .unionByName(Profile.rowChecks(t(s, dir, "lineitem"), Seq(
          "l_qty_range" ->
            (col("l_quantity") < 1 || col("l_quantity") > 50),
          "l_discount_cap" -> (col("l_discount") > lit(0.05)))))
        .unionByName(Profile.uniqueCheck(o, Seq("o_orderkey"),
          "o_orderkey_unique"))
        .unionByName(Profile.refCheck(o, "o_custkey",
          t(s, dir, "customer"), "c_custkey", "o_custkey_ref"))
        .orderBy(col("check"))
    }),

    "a20_kanon" -> ((s, dir) =>
      // k-anonymity audit: quasi-identifier groups an attacker could
      // pin to <10 customers. One combinable group-by; the privacy
      // sibling of x_text_scrub (scrub removes direct identifiers,
      // this measures the indirect ones).
      Profile.kAnonymity(t(s, dir, "customer"),
          Seq("c_nationkey", "c_mktsegment"), 10)
        .orderBy(col("c_nationkey"), col("c_mktsegment"))),

    "a21_heavy_hitters" -> ((s, dir) =>
      // EXACT heavy hitters (languages holding ≥25% of the corpus)
      // through a CMS prefilter: the counter table rides the scan as
      // array literals, so rows of light keys never reach the group-by
      // — the shuffle carries only heavy candidates' partial counts.
      // CMS never underestimates (no lost true positive) and the
      // final HAVING kills collision-inflated false ones, so the
      // approximate structure yields an exact, oracle-checkable
      // answer — same posture as the Bloom decontamination plan.
      Sketches.cmsHeavyHitters(t(s, dir, "documents"), "lang",
          depth = 4, width = 1024, minShare = 0.25)
        .orderBy(col("lang"))),

    "a22_exact_median" -> ((s, dir) => {
      // exact global median/p90 by histogram-guided selection, NOT a
      // sort: each round ships one ≤512-cell histogram, the driver
      // picks the bucket holding the kth value, and only the final
      // ≤2000-row slice is ever sorted. percentile_disc semantics
      // (a value the column contains) keep the answer engine-portable.
      import s.implicits._
      val li = t(s, dir, "lineitem")
      val p50 = Quantiles.exactQuantile(li, "l_extendedprice", 0.5,
        buckets = 512, maxSelect = 2000)
      val p90 = Quantiles.exactQuantile(li, "l_extendedprice", 0.9,
        buckets = 512, maxSelect = 2000)
      Seq((p50, p90)).toDF("p50", "p90")
        .select(round(col("p50"), 6).as("p50"),
          round(col("p90"), 6).as("p90"))
    }),

    "a24_psi_drift" -> ((s, dir) => {
      // distribution drift between corpus snapshots (population
      // stability index): even vs odd doc_ids bucketed by capped
      // n_chars deciles. The full bucket spine is materialized (a
      // bucket empty in one snapshot is where drift shows), Laplace
      // smoothing keeps ln finite, shares are exact-count double
      // divisions — two combinable bucket aggs + a 10-row join.
      val docs = t(s, dir, "documents")
        .withColumn("bucket", least(floor(col("n_chars") / 100), lit(9L)))
      Profile.psi(docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 =!= 0), "bucket", 10)
        .orderBy(col("bucket"))
    }),

    "a23_grouping_sets" -> ((s, dir) =>
      // explicit GROUPING SETS (the rollup/cube sibling a9/a11 don't
      // cover: an arbitrary set list — here both one-dimension
      // marginals plus the full cross). One Expand+aggregate pass;
      // subtotal rows labelled '(all)' so no engine's null-vs-null
      // grouping semantics leak into the compare.
      t(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast("decimal(18,4)")).cast("double")
            .as("sum_qty"),
          count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("(all)")).as("rflag"),
          coalesce(col("l_linestatus"), lit("(all)")).as("lstatus"),
          col("sum_qty"), col("n"))
        .orderBy(col("rflag"), col("lstatus"))),

    "x_text_editdist" -> ((s, dir) =>
      // fuzzy entity matching: Levenshtein ≤1 name pairs within a
      // nation, mined by deletion-neighborhood blocking (FastSS) —
      // candidates must share a single-deletion variant, so the exact
      // distance runs on ≈the true matches instead of the nation
      // block's full |block|²/2 pair product (13.4 s → sub-second at
      // sf0.1; the oracle stays the brute-force definition — the
      // equality IS the blocking-completeness claim).
      Dedup.editDistancePairs(t(s, dir, "customer"),
          "c_custkey", "c_name", blockCols = Seq("c_nationkey"))
        .orderBy(col("id_a"), col("id_b"))),

    "x_text_jaro" -> ((s, dir) => {
      // Jaro-Winkler scoring over the DISTINCT name vocabulary,
      // blocked by first token — the realistic fuzzy-match shape:
      // score the deduplicated vocabulary (bounded, corpus-size-
      // independent), never the corpus pair product. The scorer is
      // the native codegen JaroWinkler expression, byte-compatible
      // with DuckDB's jaro_winkler_similarity.
      val names = t(s, dir, "part").select(col("p_name")).distinct()
        .withColumn("blk", split(col("p_name"), " ").getItem(0))
      val a = names.select(col("blk"), col("p_name").as("name_a"))
      val b = names.select(col("blk"), col("p_name").as("name_b"))
      a.join(b, Seq("blk"))
        .filter(col("name_a") < col("name_b"))
        .select(col("name_a"), col("name_b"),
          round(TF.jaroWinkler(col("name_a"), col("name_b")), 6).as("jw"))
        .filter(col("jw") >= 0.5)
        .orderBy(col("name_a"), col("name_b"))
    }),

    "x_text_nfc" -> ((s, dir) =>
      // Unicode NFC canonicalization ahead of byte-level dedup:
      // decomposed "e"+COMBINING ACUTE collapses to composed "é"
      // (2 code points → 1). The decomposed suffix is constructed
      // per row so the gate exercises real combining-mark input; the
      // oracle replays it with DuckDB's nfc_normalize — two
      // independent implementations of UAX #15 agreeing byte-for-byte.
      t(s, dir, "documents")
        .select(col("doc_id"),
          concat(substring(col("text"), 1, 20), lit("e\u0301"))
            .as("raw"))
        .select(col("doc_id"),
          length(col("raw")).as("raw_chars"),
          TF.nfc(col("raw")).as("normalized"))
        .withColumn("norm_chars", length(col("normalized")))
        .orderBy(col("doc_id"))),

    "st4_window_agg" -> ((s, dir) => {
      // batch-checkable form of EventStreams.windowedAgg: tumbling
      // 1-hour event-time windows (same code path a readStream takes)
      graft.streaming.EventStreams.windowedAgg(
          t(s, dir, "events"), "ts", "1 hour", watermark = "0 seconds")
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
          col("event_type"), col("n"),
          round(col("total").cast("double"), 6).as("total"))
        .orderBy(col("ws"), col("event_type"))
    }),

    "w3_topk_per_group" -> ((s, dir) => {
      // custom typed Aggregator: bounded k-element partial state per
      // (task, group) — the shuffle carries k rows per group per map
      // task, not whole groups (vs the window formulation's full sort)
      GroupTopK.topKPerGroup(t(s, dir, "events"),
          Seq("event_type"), "value", "event_id", k = 3)
        .orderBy(col("event_type"), col("value").desc, col("event_id").desc)
    }),

    "w4_moving_avg" -> ((s, dir) => {
      // sliding-frame window: 4-row trailing average + lag over each
      // user's purchase history in event-id order (event timestamps
      // carry sub-µs noise that Spark truncates and DuckDB keeps — the
      // id is the one total order both engines share). The frame
      // aggregates DECIMAL so the 4-term sum is exact in any
      // accumulation order. Per-user partitions are user-history-sized
      // — the window-is-right case.
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      t(s, dir, "events").filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          round(sum(col("value").cast("decimal(18,4)"))
              .over(w.rowsBetween(-3, 0)).cast("double") /
            count(lit(1)).over(w.rowsBetween(-3, 0)), 6).as("mavg4"),
          round(coalesce(lag(col("value"), 1).over(w), lit(0.0)), 6)
            .as("prev_value"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    "w5_rank_family" -> ((s, dir) =>
      // the remaining rank-family windows (rank / dense_rank /
      // percent_rank / ntile / cume_dist) over an AGGREGATED
      // priority×year table — 35 rows, the window-is-right case; the
      // (priority, year) tuple is a unique total order so every rank
      // is deterministic in both engines.
      {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("yr"))
        t(s, dir, "orders")
          .groupBy(col("o_orderpriority"),
            year(col("o_orderdate")).as("yr"))
          .agg(count(lit(1)).as("n"))
          .select(col("o_orderpriority"), col("yr").cast("long").as("yr"),
            col("n"),
            rank().over(w).as("rnk"),
            dense_rank().over(w).as("drnk"),
            round(percent_rank().over(w), 6).as("prank"),
            ntile(4).over(w).as("nt4"),
            round(cume_dist().over(w), 6).as("cdist"))
          .orderBy(col("o_orderpriority"), col("yr"))
      }),

    "j14_not_in" -> ((s, dir) => {
      // NOT IN three-valued logic: one NULL in the subquery list
      // annihilates the result (Spark plans a null-aware anti join
      // for exactly this), while the null-free list behaves as plain
      // set difference — both corners in one row.
      t(s, dir, "customer").createOrReplaceTempView("customer_v")
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql("""SELECT
          (SELECT count(*) FROM customer_v WHERE c_custkey NOT IN
            (SELECT CASE WHEN o_orderkey = 0 THEN NULL
                         ELSE o_custkey END
             FROM orders_v)) AS n_with_null_list,
          (SELECT count(*) FROM customer_v WHERE c_custkey NOT IN
            (SELECT o_custkey FROM orders_v
             WHERE o_totalprice > 450000)) AS n_clean_list""")
    }),

    "j15_snapshot_diff" -> ((s, dir) => {
      // CDC extraction between two snapshot versions: one full-outer
      // join on the key, null-safe payload compare, change set only
      // (I/U/D with after-image, before-image for D). The two
      // "versions" derive from orders: keys divisible by 7 appear only
      // in the new snapshot (inserts), by 10 only in the old
      // (deletes), by 5 get +1.0 on the price (updates — an exact
      // IEEE add both engines agree on).
      val o = t(s, dir, "orders").select(col("o_orderkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderpriority"))
      val oldSnap = o.filter(col("o_orderkey") % 7 =!= 0)
      val newSnap = o.filter(col("o_orderkey") % 10 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
      Upsert.snapshotDiff(oldSnap, newSnap, Seq("o_orderkey"))
        .orderBy(col("o_orderkey"))
    }),

    "j16_cdc_apply" -> ((s, dir) => {
      // the CDC consumer side: applyChanges(old, snapshotDiff(old,
      // new)) must reconstruct the new snapshot EXACTLY. The oracle
      // computes the new snapshot directly, so the whole
      // extract→apply round trip is what hash-matches; apply IO is
      // ∝ snapshot + churn (one anti join + one union), never a
      // history re-scan.
      val o = t(s, dir, "orders").select(col("o_orderkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderpriority"))
      val oldSnap = o.filter(col("o_orderkey") % 7 =!= 0)
      val newSnap = o.filter(col("o_orderkey") % 10 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
      Upsert.applyChanges(oldSnap,
          Upsert.snapshotDiff(oldSnap, newSnap, Seq("o_orderkey")),
          Seq("o_orderkey"))
        .orderBy(col("o_orderkey"))
    }),

    "j17_merge_versioned" -> ((s, dir) => {
      // commutative (version-resolved) merge — the concurrent-loader
      // contract behind the ingest pipeline: each key lands its
      // max-version row no matter what order batches merge, and a STALE
      // redelivered batch applied LAST cannot regress a key. The gate
      // applies the fresh update first and the stale batch after it —
      // under last-merge-wins the stale values would win; the oracle
      // computes the order-free answer (max-version row per key over
      // the union), so any order dependence hash-mismatches.
      val o = t(s, dir, "orders").select(col("o_orderkey"),
        col("o_orderstatus"), col("o_totalprice"))
      val target = o.withColumn("ver", lit(1L))
      val fresh = o.filter(col("o_orderkey") % 5 === 0)
        .withColumn("o_orderstatus", lit("X"))
        .withColumn("o_totalprice", col("o_totalprice") + 1.0)
        .withColumn("ver", lit(2L))
      val stale = o.filter(col("o_orderkey") % 3 === 0)
        .withColumn("o_orderstatus", lit("S"))
        .withColumn("ver", lit(0L))
      Upsert.mergeVersioned(
          Upsert.mergeVersioned(target, fresh, Seq("o_orderkey"), "ver"),
          stale, Seq("o_orderkey"), "ver")
        .orderBy(col("o_orderkey"))
    }),

    "j18_scd2_manifest" -> ((s, dir) => {
      // j10's SCD2 merge through the MANIFEST-published on-disk table
      // (Upsert.scd2MergeManifested): immutable epoch snapshots + an
      // append-only closed log + one atomic manifest rename, so a
      // reader never sees the half-merged state the dynamic-partition
      // layout documents as its crash window. Storage must never change
      // content: the oracle is j10's verbatim. Rebuilt from scratch
      // each run (bootstrap → merge) for determinism.
      val base = s"${artifactBase(dir)}/scd2_manifest"
      val bp = new org.apache.hadoop.fs.Path(base)
      bp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(bp, true)
      val cust = t(s, dir, "customer")
      val boot = cust.select(col("c_custkey").as("key"),
        col("c_mktsegment").as("segment"),
        lit("1995-01-01").cast("timestamp").as("ts"))
      operators.Upsert.scd2MergeManifested(s, base, boot,
        Seq("key"), Seq("segment"), "ts")
      val updates = cust.filter(col("c_custkey") % 3 =!= 2)
        .select(col("c_custkey").as("key"),
          when(col("c_custkey") % 3 === 0,
            concat(lit("SEG_"), (col("c_custkey") % 5).cast("string")))
            .otherwise(col("c_mktsegment")).as("segment"),
          lit("2000-06-01").cast("timestamp").as("ts"))
      operators.Upsert.scd2MergeManifested(s, base, updates,
        Seq("key"), Seq("segment"), "ts")
      operators.Upsert.scd2ReadManifested(s, base)
        .select(col("key"), col("segment"),
          date_format(col("valid_from"), "yyyy-MM-dd").as("valid_from"),
          coalesce(date_format(col("valid_to"), "yyyy-MM-dd"),
            lit("current")).as("valid_to"))
        .orderBy(col("key"), col("valid_from"), col("segment"))
    }),

    "j19_merge_manifest" -> ((s, dir) => {
      // j17's commutative versioned merge through the MANIFEST-published
      // partitioned table (Upsert.mergeIntoManifested, VERDICT r13 #4):
      // immutable per-epoch partition snapshots + one atomic manifest
      // rename give the permanent table reader-atomic merges — the
      // dynamic-partition layout's documented torn-reader window is
      // gone, and each merge reads/writes ONLY its touched partitions
      // (manifest dir-level pruning; at 100 TB the untouched mass is
      // never listed). Storage must never change content: the oracle is
      // j17's order-free max-version model over the same three batches,
      // keyed by (status, orderkey) since the partition column joins
      // the key. Rebuilt from scratch each run for determinism.
      val base = s"${artifactBase(dir)}/merge_manifest"
      val bp = new org.apache.hadoop.fs.Path(base)
      bp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(bp, true)
      val o = t(s, dir, "orders").select(col("o_orderkey"),
        col("o_orderstatus"), col("o_totalprice"))
      val keys = Seq("o_orderstatus", "o_orderkey")
      operators.Upsert.mergeIntoManifested(s, base,
        o.withColumn("ver", lit(1L)), keys, "o_orderstatus", "ver")
      operators.Upsert.mergeIntoManifested(s, base,
        o.filter(col("o_orderkey") % 5 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1.0)
          .withColumn("ver", lit(2L)), keys, "o_orderstatus", "ver")
      // stale redelivery applied LAST: must not regress any key
      operators.Upsert.mergeIntoManifested(s, base,
        o.filter(col("o_orderkey") % 3 === 0)
          .withColumn("o_totalprice", col("o_totalprice") - 5.0)
          .withColumn("ver", lit(0L)), keys, "o_orderstatus", "ver")
      operators.Upsert.readManifested(s, base)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), col("ver"))
        .orderBy(col("o_orderkey"), col("o_orderstatus"))
    }),

    "j20_merge_compact" -> ((s, dir) => {
      // compaction must never change content: after three manifested
      // merges scatter the live partitions across three epoch dirs,
      // compactManifested rewrites them into ONE epoch + manifest
      // (atomic flip, same reader contract as a merge) — the read-side
      // cost goes from N dir resolutions back to one while the
      // max-version answer is untouched. Smaller slice than j19 (every
      // 7th order) — the semantics, not the volume, are the claim.
      val base = s"${artifactBase(dir)}/merge_compact"
      val bp = new org.apache.hadoop.fs.Path(base)
      bp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(bp, true)
      val o = t(s, dir, "orders").filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val keys = Seq("o_orderstatus", "o_orderkey")
      operators.Upsert.mergeIntoManifested(s, base,
        o.withColumn("ver", lit(1L)), keys, "o_orderstatus", "ver")
      operators.Upsert.mergeIntoManifested(s, base,
        o.filter(col("o_orderkey") % 5 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1.0)
          .withColumn("ver", lit(2L)), keys, "o_orderstatus", "ver")
      operators.Upsert.mergeIntoManifested(s, base,
        o.filter(col("o_orderkey") % 3 === 0)
          .withColumn("o_totalprice", col("o_totalprice") - 5.0)
          .withColumn("ver", lit(0L)), keys, "o_orderstatus", "ver")
      operators.Upsert.compactManifested(s, base, "o_orderstatus")
      operators.Upsert.readManifested(s, base)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), col("ver"))
        .orderBy(col("o_orderkey"), col("o_orderstatus"))
    }),

    "j21_merge_timetravel" -> ((s, dir) => {
      // TIME TRAVEL over the manifested table: immutable manifests +
      // append-only epoch dirs reconstruct any retained historical
      // snapshot byte-for-byte — here the table AS OF manifest 1 (after
      // the second merge, BEFORE the third batch landed), so the oracle
      // is the max-version model over batches 1+2 only: the third
      // batch's existence must be invisible. retain=3 keeps the
      // history readable across the three merges.
      val base = s"${artifactBase(dir)}/merge_timetravel"
      val bp = new org.apache.hadoop.fs.Path(base)
      bp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(bp, true)
      val o = t(s, dir, "orders").filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val keys = Seq("o_orderstatus", "o_orderkey")
      operators.Upsert.mergeIntoManifested(s, base,
        o.withColumn("ver", lit(1L)), keys, "o_orderstatus", "ver",
        retain = 3)
      operators.Upsert.mergeIntoManifested(s, base,
        o.filter(col("o_orderkey") % 5 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1.0)
          .withColumn("ver", lit(2L)), keys, "o_orderstatus", "ver",
        retain = 3)
      operators.Upsert.mergeIntoManifested(s, base,
        o.filter(col("o_orderkey") % 3 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 100.0)
          .withColumn("ver", lit(3L)), keys, "o_orderstatus", "ver",
        retain = 3)
      operators.Upsert.readManifestedAt(s, base, 1)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), col("ver"))
        .orderBy(col("o_orderkey"), col("o_orderstatus"))
    }),

    "j22_merge_evolve" -> ((s, dir) => {
      // ADD-AND-WIDEN SCHEMA EVOLUTION through the manifested table:
      // batch 1 is a legacy writer with a 32-bit key and count; batch 2
      // arrives evolved — long key, long count (content above 2^31, so
      // the widening is exercised on VALUES, not just the schema label)
      // plus a brand-new tag column. The table serves ONE widened
      // schema: historical epoch files are read upcast inside the
      // parquet scan (int32→int64 promotion, no rewrite of untouched
      // partitions), rows the evolved writer never touched surface a
      // null tag, and the merge joins the widened key against the
      // upcast slice. Oracle = the order-free max-version model with
      // the same casts.
      val base = s"${artifactBase(dir)}/merge_evolve"
      val bp = new org.apache.hadoop.fs.Path(base)
      bp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(bp, true)
      val o = t(s, dir, "orders")
      val keys = Seq("o_orderstatus", "o_orderkey")
      operators.Upsert.mergeIntoManifested(s, base,
        o.select(col("o_orderkey").cast("int").as("o_orderkey"),
          col("o_orderstatus"),
          (col("o_orderkey") % 97).cast("int").as("qty"),
          lit(1L).as("ver")), keys, "o_orderstatus", "ver")
      operators.Upsert.mergeIntoManifested(s, base,
        o.filter(col("o_orderkey") % 5 === 0)
          .select(col("o_orderkey"), col("o_orderstatus"),
            (col("o_orderkey") % 97 + lit(5000000000L)).as("qty"),
            lit("evolved").as("tag"), lit(2L).as("ver")),
        keys, "o_orderstatus", "ver")
      operators.Upsert.readManifested(s, base)
        .select(col("o_orderkey"), col("o_orderstatus"), col("qty"),
          col("tag"), col("ver"))
        .orderBy(col("o_orderkey"), col("o_orderstatus"))
    }),

    "j23_merge_rename" -> ((s, dir) => {
      // METADATA-ONLY COLUMN RENAME on the manifested table
      // (Upsert.renameManifestedColumn): batch 1 writes qty; one
      // manifest publish renames it to quantity — zero data files move,
      // the manifest's #pmap lines map epoch 0's physical "qty" to the
      // new logical name; batch 2 then updates under the NEW name, so
      // the final read unions mapped epoch-0 files with natively-named
      // epoch-1 files. Oracle = the max-version model computed under
      // the final name throughout (a rename must never change content).
      val base = s"${artifactBase(dir)}/merge_rename"
      val bp = new org.apache.hadoop.fs.Path(base)
      bp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(bp, true)
      val o = t(s, dir, "orders").filter(col("o_orderkey") % 7 === 0)
      val keys = Seq("o_orderstatus", "o_orderkey")
      operators.Upsert.mergeIntoManifested(s, base,
        o.select(col("o_orderkey"), col("o_orderstatus"),
          (col("o_orderkey") % 97).as("qty"), lit(1L).as("ver")),
        keys, "o_orderstatus", "ver")
      operators.Upsert.renameManifestedColumn(s, base, "qty", "quantity")
      operators.Upsert.mergeIntoManifested(s, base,
        o.filter(col("o_orderkey") % 5 === 0)
          .select(col("o_orderkey"), col("o_orderstatus"),
            (col("o_orderkey") % 97 + 1000).as("quantity"),
            lit(2L).as("ver")), keys, "o_orderstatus", "ver")
      operators.Upsert.readManifested(s, base)
        .select(col("o_orderkey"), col("o_orderstatus"), col("quantity"),
          col("ver"))
        .orderBy(col("o_orderkey"), col("o_orderstatus"))
    }),

    "j24_merge_pruned_read" -> ((s, dir) => {
      // MANIFEST-PRUNED READ: a narrow consumer of the manifested
      // table names its partitions and resolves ONLY their snapshot
      // dirs — on a 100 TB table with tens of thousands of partitions
      // the per-dir listing is the read cost, so pruning must happen
      // at the manifest, not after planning. Oracle = the j19 model
      // restricted to the named partitions.
      val base = s"${artifactBase(dir)}/merge_pruned"
      val bp = new org.apache.hadoop.fs.Path(base)
      bp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(bp, true)
      val o = t(s, dir, "orders").filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val keys = Seq("o_orderstatus", "o_orderkey")
      operators.Upsert.mergeIntoManifested(s, base,
        o.withColumn("ver", lit(1L)), keys, "o_orderstatus", "ver")
      operators.Upsert.mergeIntoManifested(s, base,
        o.filter(col("o_orderkey") % 5 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1.0)
          .withColumn("ver", lit(2L)), keys, "o_orderstatus", "ver")
      operators.Upsert.readManifestedPartitions(s, base, Seq("F", "O"))
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), col("ver"))
        .orderBy(col("o_orderkey"), col("o_orderstatus"))
    }),

    "j25_merge_delete" -> ((s, dir) => {
      // PARTITION-PRUNED DELETE: remove every %3 key from the merged
      // table — only partitions holding a match are rewritten (here
      // all three statuses, but each rewrite drops just its matching
      // rows), the manifest flips atomically, and the surviving rows
      // answer the merge model minus the deleted keys. The cleanup /
      // right-to-be-forgotten path of the layout.
      val base = s"${artifactBase(dir)}/merge_delete"
      val bp = new org.apache.hadoop.fs.Path(base)
      bp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(bp, true)
      val o = t(s, dir, "orders").filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val keys = Seq("o_orderstatus", "o_orderkey")
      operators.Upsert.mergeIntoManifested(s, base,
        o.withColumn("ver", lit(1L)), keys, "o_orderstatus", "ver")
      operators.Upsert.mergeIntoManifested(s, base,
        o.filter(col("o_orderkey") % 5 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1.0)
          .withColumn("ver", lit(2L)), keys, "o_orderstatus", "ver")
      operators.Upsert.deleteFromManifested(s, base,
        col("o_orderkey") % 3 === 0)
      operators.Upsert.readManifested(s, base)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), col("ver"))
        .orderBy(col("o_orderkey"), col("o_orderstatus"))
    }),

    "j26_merge_skipping" -> ((s, dir) => {
      // ZONE-MAP DATA SKIPPING: the manifest records per-partition
      // min/max of o_totalprice (#stats lines, maintained by every
      // write path for its touched dirs), and readManifestedRange
      // prunes partitions whose range rules them out BEFORE any
      // listing — the lakehouse data-skipping shape, manifest-level.
      // Semantics must equal a plain filter (skipping only drops dirs
      // that provably cannot match — MergeManifestSpec proves the
      // pruning by physically removing a ruled-out dir); the oracle is
      // the merge model under the same BETWEEN.
      val base = s"${artifactBase(dir)}/merge_skipping"
      val bp = new org.apache.hadoop.fs.Path(base)
      bp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(bp, true)
      val o = t(s, dir, "orders").filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val keys = Seq("o_orderstatus", "o_orderkey")
      operators.Upsert.mergeIntoManifested(s, base,
        o.withColumn("ver", lit(1L)), keys, "o_orderstatus", "ver",
        statsCols = Seq("o_totalprice"))
      operators.Upsert.mergeIntoManifested(s, base,
        o.filter(col("o_orderkey") % 5 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1.0)
          .withColumn("ver", lit(2L)), keys, "o_orderstatus", "ver")
      operators.Upsert.readManifestedRange(s, base, "o_totalprice",
          100000.0, 200000.0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), col("ver"))
        .orderBy(col("o_orderkey"), col("o_orderstatus"))
    }),

    "j36_range_sharded" -> ((s, dir) => {
      // j26's zone-map range read through the SHARDED manifest
      // (threshold forced to 1): the read first prunes which LEAVES
      // even load via the root's per-bucket #bstats aggregates, then
      // prunes dirs via per-dir #stats — both tiers are conservative,
      // so the semantics must equal a plain BETWEEN filter exactly
      // (same oracle as j26). This puts the r19 bucket zone maps and
      // their carry/regenerate-on-diff-publish under the per-round
      // hash check, alongside the probes' leaves-loaded counters.
      val saved = operators.Upsert.EpochManifest.shardThreshold
      operators.Upsert.EpochManifest.shardThreshold = 1
      try {
        val base = s"${artifactBase(dir)}/range_sharded"
        val bp = new org.apache.hadoop.fs.Path(base)
        bp.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(bp, true)
        val o = t(s, dir, "orders").filter(col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice"))
        val keys = Seq("o_orderstatus", "o_orderkey")
        operators.Upsert.mergeIntoManifested(s, base,
          o.withColumn("ver", lit(1L)), keys, "o_orderstatus", "ver",
          statsCols = Seq("o_totalprice"))
        operators.Upsert.mergeIntoManifested(s, base,
          o.filter(col("o_orderkey") % 5 === 0)
            .withColumn("o_totalprice", col("o_totalprice") + 1.0)
            .withColumn("ver", lit(2L)), keys, "o_orderstatus", "ver")
        operators.Upsert.readManifestedRange(s, base, "o_totalprice",
            100000.0, 200000.0)
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice"), col("ver"))
          .orderBy(col("o_orderkey"), col("o_orderstatus"))
      } finally
        operators.Upsert.EpochManifest.shardThreshold = saved
    }),

    "j27_merge_cdf" -> ((s, dir) => {
      // CHANGE DATA FEED over the manifested table: after an update
      // wave (%5, +1.0, ver 2) and a delete wave (%11 keys), the diff
      // between manifests 0 and 2 must emit exactly the update
      // pre/post image pairs and the delete pre-images — and nothing
      // for keys whose values survived both waves unchanged, even
      // though their partitions were rewritten around them. Cost is
      // bounded by CHANGED partitions (same-epoch dirs are never
      // read — MergeManifestSpec proves it by removing one).
      val base = s"${artifactBase(dir)}/merge_cdf"
      val bp = new org.apache.hadoop.fs.Path(base)
      bp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(bp, true)
      val o = t(s, dir, "orders").filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val keys = Seq("o_orderstatus", "o_orderkey")
      operators.Upsert.mergeIntoManifested(s, base,
        o.withColumn("ver", lit(1L)), keys, "o_orderstatus", "ver",
        retain = 4)
      operators.Upsert.mergeIntoManifested(s, base,
        o.filter(col("o_orderkey") % 5 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1.0)
          .withColumn("ver", lit(2L)), keys, "o_orderstatus", "ver",
        retain = 4)
      operators.Upsert.deleteKeysFromManifested(s, base,
        o.filter(col("o_orderkey") % 11 === 0)
          .select(col("o_orderstatus"), col("o_orderkey")),
        keys, "o_orderstatus", retain = 4)
      operators.Upsert.changesBetween(s, base, 0, 2, keys)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), col("ver"), col("_change_type"))
        .orderBy(col("o_orderkey"), col("o_orderstatus"),
          col("_change_type"))
    }),

    "j28_changes_since" -> ((s, dir) => {
      // POLL-AND-CHECKPOINT change-feed consumption — the shape most
      // CDC consumers actually run: poll 1 after the update wave gets
      // the 0->1 diff and checkpoint 1; poll 2 after the delete wave
      // gets the 1->2 diff and checkpoint 2; poll 3 while up to date
      // returns the empty schema-shaped feed and the same checkpoint
      // (its rows contribute nothing, but its shape must union
      // cleanly — the consumer's loop never special-cases idle). The
      // oracle is the union of the two interval diffs, each tagged
      // with its poll number.
      val base = s"${artifactBase(dir)}/merge_since"
      val bp = new org.apache.hadoop.fs.Path(base)
      bp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(bp, true)
      val o = t(s, dir, "orders").filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val keys = Seq("o_orderstatus", "o_orderkey")
      operators.Upsert.mergeIntoManifested(s, base,
        o.withColumn("ver", lit(1L)), keys, "o_orderstatus", "ver",
        retain = 4)
      operators.Upsert.mergeIntoManifested(s, base,
        o.filter(col("o_orderkey") % 5 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1.0)
          .withColumn("ver", lit(2L)), keys, "o_orderstatus", "ver",
        retain = 4)
      val (feed1, ck1) = operators.Upsert.changesSince(s, base, 0, keys)
      val f1 = feed1.withColumn("poll", lit(1L)).localCheckpoint()
      operators.Upsert.deleteKeysFromManifested(s, base,
        o.filter(col("o_orderkey") % 11 === 0)
          .select(col("o_orderstatus"), col("o_orderkey")),
        keys, "o_orderstatus", retain = 4)
      val (feed2, ck2) = operators.Upsert.changesSince(s, base, ck1, keys)
      val f2 = feed2.withColumn("poll", lit(2L)).localCheckpoint()
      val (feed3, ck3) = operators.Upsert.changesSince(s, base, ck2, keys)
      require(ck3 == ck2, s"idle poll moved the checkpoint: $ck2 -> $ck3")
      f1.unionByName(f2).unionByName(feed3.withColumn("poll", lit(3L)))
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), col("ver"), col("_change_type"),
          col("poll"))
        .orderBy(col("poll"), col("o_orderkey"), col("o_orderstatus"),
          col("_change_type"))
    }),

    "j29_cdf_rename" -> ((s, dir) => {
      // CHANGE FEED ACROSS A RENAME (VERDICT r14 #3): the interval
      // 0 -> 3 contains a metadata-only rename (qty -> quantity) between
      // its two data waves; changesBetween walks the interval's
      // manifests for the one-shot #rename event lines and reads the
      // BEFORE side under the to-side logical names — pre-rename
      // updates and the post-rename delete emit one coherent feed
      // under the final name, no two-hop caller workaround. Oracle =
      // the same pre/post/delete model as j27, under `quantity`.
      val base = s"${artifactBase(dir)}/merge_cdf_rn"
      val bp = new org.apache.hadoop.fs.Path(base)
      bp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(bp, true)
      val o = t(s, dir, "orders").filter(col("o_orderkey") % 7 === 0)
      val keys = Seq("o_orderstatus", "o_orderkey")
      operators.Upsert.mergeIntoManifested(s, base,
        o.select(col("o_orderkey"), col("o_orderstatus"),
          (col("o_orderkey") % 97).cast("long").as("qty"),
          lit(1L).as("ver")), keys, "o_orderstatus", "ver", retain = 6)
      operators.Upsert.mergeIntoManifested(s, base,
        o.filter(col("o_orderkey") % 5 === 0)
          .select(col("o_orderkey"), col("o_orderstatus"),
            (col("o_orderkey") % 97 + 1000).cast("long").as("qty"),
            lit(2L).as("ver")), keys, "o_orderstatus", "ver", retain = 6)
      operators.Upsert.renameManifestedColumn(s, base, "qty", "quantity",
        retain = 6)
      operators.Upsert.deleteKeysFromManifested(s, base,
        o.filter(col("o_orderkey") % 11 === 0)
          .select(col("o_orderstatus"), col("o_orderkey")),
        keys, "o_orderstatus", retain = 6)
      operators.Upsert.changesBetween(s, base, 0, 3, keys)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("quantity"), col("ver"), col("_change_type"))
        .orderBy(col("o_orderkey"), col("o_orderstatus"),
          col("_change_type"))
    }),

    "j30_merge_dropcol" -> ((s, dir) => {
      // DROP-COLUMN EVOLUTION with tombstone semantics (VERDICT r14
      // #4): `tag` is dropped metadata-only (zero data movement — the
      // epoch-0 files still physically store the retired bytes), then
      // RE-ADDED by a later merge wave. The dead-marker pmap entries
      // must make the re-added column read NULL from pre-drop files
      // (no resurrection of retired values), while time travel to the
      // pre-drop manifest still reconstructs the table WITH its
      // original tags — both snapshots in one result, disambiguated by
      // `src`. Oracle computes each side directly.
      val base = s"${artifactBase(dir)}/merge_dropcol"
      val bp = new org.apache.hadoop.fs.Path(base)
      bp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(bp, true)
      val o = t(s, dir, "orders").filter(col("o_orderkey") % 7 === 0)
      val keys = Seq("o_orderstatus", "o_orderkey")
      operators.Upsert.mergeIntoManifested(s, base,
        o.select(col("o_orderkey"), col("o_orderstatus"),
          concat(lit("old_"), (col("o_orderkey") % 3).cast("string"))
            .as("tag"),
          lit(1L).as("ver")), keys, "o_orderstatus", "ver", retain = 6)
      operators.Upsert.dropManifestedColumn(s, base, "tag", retain = 6)
      operators.Upsert.mergeIntoManifested(s, base,
        o.filter(col("o_orderkey") % 5 === 0)
          .select(col("o_orderkey"), col("o_orderstatus"),
            lit("new").as("tag"), lit(2L).as("ver")),
        keys, "o_orderstatus", "ver", retain = 6)
      val current = operators.Upsert.readManifested(s, base)
        .withColumn("src", lit("current"))
      val historical = operators.Upsert.readManifestedAt(s, base, 0)
        .withColumn("src", lit("epoch0"))
      current.unionByName(historical)
        .select(col("src"), col("o_orderkey"), col("o_orderstatus"),
          col("tag"), col("ver"))
        .orderBy(col("src"), col("o_orderkey"), col("o_orderstatus"))
    }),

    "a32_mv_cdf" -> ((s, dir) => {
      // INCREMENTAL MATERIALIZED VIEW over the change feed — the
      // reference's report-building trigger
      // (2.2 loading-lambda-for-mysql.py:344-375) made incremental:
      // the per-status (count, sum) state seeds from the epoch-0
      // snapshot, then the 0->2 CDF (update pre/post images + delete
      // pre-images) folds in via IncrementalAgg.applyChanges —
      // post-sides add, pre-sides retract — WITHOUT rescanning the
      // table. Cost at 100 TB is O(|state| + |changed groups|); the
      // oracle recomputes the view from the final facts, so any
      // missed retraction or double-add hash-mismatches.
      val base = s"${artifactBase(dir)}/merge_mv"
      val bp = new org.apache.hadoop.fs.Path(base)
      bp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(bp, true)
      val o = t(s, dir, "orders").filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val keys = Seq("o_orderstatus", "o_orderkey")
      val grp = Seq("o_orderstatus")
      operators.Upsert.mergeIntoManifested(s, base,
        o.withColumn("ver", lit(1L)), keys, "o_orderstatus", "ver",
        retain = 4)
      val st0 = operators.IncrementalAgg.sumState(
        operators.Upsert.readManifestedAt(s, base, 0), grp,
        "o_totalprice").localCheckpoint()
      operators.Upsert.mergeIntoManifested(s, base,
        o.filter(col("o_orderkey") % 5 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1.0)
          .withColumn("ver", lit(2L)), keys, "o_orderstatus", "ver",
        retain = 4)
      operators.Upsert.deleteKeysFromManifested(s, base,
        o.filter(col("o_orderkey") % 11 === 0)
          .select(col("o_orderstatus"), col("o_orderkey")),
        keys, "o_orderstatus", retain = 4)
      val feed = operators.Upsert.changesBetween(s, base, 0, 2, keys)
      operators.IncrementalAgg.reportSums(
          operators.IncrementalAgg.applyChanges(st0, grp,
            "o_totalprice", feed), grp)
        .select(col("o_orderstatus"), col("n"),
          round(col("total"), 4).as("total"),
          round(col("mean"), 6).as("mean"))
        .orderBy(col("o_orderstatus"))
    }),

    "a33_mv_minmax" -> ((s, dir) => {
      // MULTI-MEASURE INCREMENTAL MV WITH MIN/MAX (VERDICT r15 #4):
      // one state dir carries TWO measures' counts/sums AND their
      // min/max. The delete wave retires group extrema (qty maxima
      // live exclusively on the +500-updated %5 keys, some of which
      // the %11 delete removes) — the one case subtractable state
      // cannot recover — so the fold detects extremum retirement and
      // recomputes ONLY the dirty groups' min/max from the post-change
      // table (semi-join-bounded; never unrelated table growth).
      // Oracle = the full multi-measure view rebuilt from the final
      // facts: a wrong runner-up, a missed retirement, or a
      // double-fold all hash-mismatch.
      val base = s"${artifactBase(dir)}/merge_mv_mm"
      val bp = new org.apache.hadoop.fs.Path(base)
      bp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(bp, true)
      val o = t(s, dir, "orders").filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"),
          (col("o_orderkey") % 97).cast("double").as("qty"))
      val keys = Seq("o_orderstatus", "o_orderkey")
      val grp = Seq("o_orderstatus")
      val cols = Seq("o_totalprice", "qty")
      operators.Upsert.mergeIntoManifested(s, base,
        o.withColumn("ver", lit(1L)), keys, "o_orderstatus", "ver",
        retain = 4)
      val st0 = operators.IncrementalAgg.multiState(
        operators.Upsert.readManifestedAt(s, base, 0), grp, cols)
        .localCheckpoint()
      operators.Upsert.mergeIntoManifested(s, base,
        o.filter(col("o_orderkey") % 5 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
          .withColumn("qty", col("qty") + 500.0)
          .withColumn("ver", lit(2L)), keys, "o_orderstatus", "ver",
        retain = 4)
      operators.Upsert.deleteKeysFromManifested(s, base,
        o.filter(col("o_orderkey") % 11 === 0)
          .select(col("o_orderstatus"), col("o_orderkey")),
        keys, "o_orderstatus", retain = 4)
      val feed = operators.Upsert.changesBetween(s, base, 0, 2, keys)
      // dirty-PARTITION-bounded repair (VERDICT r16 #1): the group key
      // IS the partition column, so the dirty tuples select exactly
      // the manifest entries the repair needs — the driver-side
      // listing no longer grows with the table's total partition count
      val st1 = operators.IncrementalAgg.applyChangesMultiPruned(st0,
        grp, cols, feed,
        rows =>
          if (rows.isEmpty) operators.Upsert.readManifested(s, base)
          else operators.Upsert.readManifestedPartitions(s, base,
            rows.map(_.get(0).toString).distinct))
      operators.IncrementalAgg.reportMulti(st1, grp, cols)
        .select(col("o_orderstatus"), col("n"),
          round(col("total_o_totalprice"), 4).as("total_price"),
          round(col("mean_o_totalprice"), 6).as("mean_price"),
          round(col("min_o_totalprice"), 4).as("min_price"),
          round(col("max_o_totalprice"), 4).as("max_price"),
          round(col("total_qty"), 4).as("total_qty"),
          round(col("mean_qty"), 6).as("mean_qty"),
          round(col("min_qty"), 4).as("min_qty"),
          round(col("max_qty"), 4).as("max_qty"))
        .orderBy(col("o_orderstatus"))
    }),

    "j31_cdf_spans" -> ((s, dir) => {
      // DROP-TOLERANT CHANGE FEED (changeFeedSpans): the interval
      // crosses a drop of `qty`, so the single-interval feed refuses —
      // the spans form splits at the drop and diffs each side under
      // its own schemas. Span 1 carries the retired column's update
      // pre/post pairs; span 2 sees the re-added `qty` as a BRAND NEW
      // column (null before-images — the tombstone semantics, never
      // the retired values). The spans union by name with their
      // interval columns as the tag; the oracle computes both diffs
      // directly.
      val base = s"${artifactBase(dir)}/merge_spans"
      val bp = new org.apache.hadoop.fs.Path(base)
      bp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(bp, true)
      val o = t(s, dir, "orders").filter(col("o_orderkey") % 7 === 0)
      val keys = Seq("o_orderstatus", "o_orderkey")
      operators.Upsert.mergeIntoManifested(s, base,
        o.select(col("o_orderkey"), col("o_orderstatus"),
          (col("o_orderkey") % 97).cast("long").as("qty"),
          lit(1L).as("ver")), keys, "o_orderstatus", "ver", retain = 8)
      operators.Upsert.mergeIntoManifested(s, base,
        o.filter(col("o_orderkey") % 5 === 0)
          .select(col("o_orderkey"), col("o_orderstatus"),
            (col("o_orderkey") % 97 + 1000).cast("long").as("qty"),
            lit(2L).as("ver")), keys, "o_orderstatus", "ver", retain = 8)
      operators.Upsert.dropManifestedColumn(s, base, "qty", retain = 8)
      operators.Upsert.mergeIntoManifested(s, base,
        o.filter(col("o_orderkey") % 3 === 0)
          .select(col("o_orderkey"), col("o_orderstatus"),
            (col("o_orderkey") % 97 + 5000).cast("long").as("qty"),
            lit(3L).as("ver")), keys, "o_orderstatus", "ver", retain = 8)
      // the two-hop union is packaged as Upsert.changeFeed (VERDICT
      // r15 #8) — this gate's inline composition became the API
      operators.Upsert.changeFeed(s, base, 0, 3, keys).get
        .select(col("o_orderkey"), col("o_orderstatus"), col("qty"),
          col("ver"), col("_change_type"), col("_from_epoch"),
          col("_to_epoch"))
        .orderBy(col("_from_epoch"), col("o_orderkey"),
          col("o_orderstatus"), col("_change_type"))
    }),

    "j32_merge_widen" -> ((s, dir) => {
      // TYPE-WIDENING EVOLUTION (VERDICT r17 #4): epoch 0 stores `q`
      // as INT; a later merge arrives with q as BIGINT carrying values
      // past int range (%5 keys at +3e9) — the manifest records the
      // widened schema plus a one-shot `#widen` event line, old epoch
      // files read under the widened type with values upcast IN THE
      // SCAN (no rewrite), and time travel to epoch 0 still
      // reconstructs the table under its own narrow schema. Both
      // snapshots in one result (cast to the wide type for a uniform
      // output shape), disambiguated by `src`; the oracle computes
      // each side directly.
      val base = s"${artifactBase(dir)}/merge_widen"
      val bp = new org.apache.hadoop.fs.Path(base)
      bp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(bp, true)
      val o = t(s, dir, "orders").filter(col("o_orderkey") % 7 === 0)
      val keys = Seq("o_orderstatus", "o_orderkey")
      operators.Upsert.mergeIntoManifested(s, base,
        o.select(col("o_orderkey"), col("o_orderstatus"),
          (col("o_orderkey") % 97).cast("int").as("q"),
          lit(1L).as("ver")), keys, "o_orderstatus", "ver", retain = 6)
      operators.Upsert.mergeIntoManifested(s, base,
        o.filter(col("o_orderkey") % 5 === 0)
          .select(col("o_orderkey"), col("o_orderstatus"),
            (col("o_orderkey") % 89 + 3000000000L).cast("long").as("q"),
            lit(2L).as("ver")), keys, "o_orderstatus", "ver", retain = 6)
      val current = operators.Upsert.readManifested(s, base)
        .withColumn("src", lit("current"))
      val historical = operators.Upsert.readManifestedAt(s, base, 0)
        .withColumn("q", col("q").cast("long"))
        .withColumn("src", lit("epoch0"))
      current.unionByName(historical)
        .select(col("src"), col("o_orderkey"), col("o_orderstatus"),
          col("q"), col("ver"))
        .orderBy(col("src"), col("o_orderkey"), col("o_orderstatus"))
    }),

    "j33_partial_compact" -> ((s, dir) => {
      // PARTIAL COMPACTION (r19): the j20 merge sequence fragments
      // the hot 'O' partition across three epoch dirs;
      // compactManifestedPartitions rewrites ONLY that partition into
      // one fresh clustered epoch (the 100 TB cadence — a full-table
      // compact per maintenance window is unaffordable there) and the
      // content must be byte-identically the max-version model: the
      // oracle is j20's verbatim.
      val base = s"${artifactBase(dir)}/merge_pcompact"
      val bp = new org.apache.hadoop.fs.Path(base)
      bp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(bp, true)
      val o = t(s, dir, "orders").filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val keys = Seq("o_orderstatus", "o_orderkey")
      operators.Upsert.mergeIntoManifested(s, base,
        o.withColumn("ver", lit(1L)), keys, "o_orderstatus", "ver")
      operators.Upsert.mergeIntoManifested(s, base,
        o.filter(col("o_orderkey") % 5 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1.0)
          .withColumn("ver", lit(2L)), keys, "o_orderstatus", "ver")
      operators.Upsert.mergeIntoManifested(s, base,
        o.filter(col("o_orderkey") % 3 === 0)
          .withColumn("o_totalprice", col("o_totalprice") - 5.0)
          .withColumn("ver", lit(0L)), keys, "o_orderstatus", "ver")
      operators.Upsert.compactManifestedPartitions(s, base,
        "o_orderstatus", Seq("O"))
      operators.Upsert.readManifested(s, base)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), col("ver"))
        .orderBy(col("o_orderkey"), col("o_orderstatus"))
    }),

    "j34_merge_sharded" -> ((s, dir) => {
      // THE MANIFEST FILE TREE UNDER THE ORACLE (r19): the merge +
      // keyed-delete + partial-compact model with the shard threshold
      // forced to 1, so EVERY publish takes the v2 diff path (leaf
      // rewrites, root aggregates, ledger sweep) and every read
      // resolves through bucket-pruned leaf loads — the content must
      // equal the single-file model exactly, hash-checked per round.
      val saved = operators.Upsert.EpochManifest.shardThreshold
      operators.Upsert.EpochManifest.shardThreshold = 1
      try {
        val base = s"${artifactBase(dir)}/merge_sharded"
        val bp = new org.apache.hadoop.fs.Path(base)
        bp.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(bp, true)
        val o = t(s, dir, "orders").filter(col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice"))
        val keys = Seq("o_orderstatus", "o_orderkey")
        operators.Upsert.mergeIntoManifested(s, base,
          o.withColumn("ver", lit(1L)), keys, "o_orderstatus", "ver")
        operators.Upsert.mergeIntoManifested(s, base,
          o.filter(col("o_orderkey") % 5 === 0)
            .withColumn("o_totalprice", col("o_totalprice") + 1.0)
            .withColumn("ver", lit(2L)), keys, "o_orderstatus", "ver")
        operators.Upsert.mergeIntoManifested(s, base,
          o.filter(col("o_orderkey") % 3 === 0)
            .withColumn("o_totalprice", col("o_totalprice") - 5.0)
            .withColumn("ver", lit(0L)), keys, "o_orderstatus", "ver")
        operators.Upsert.deleteKeysFromManifested(s, base,
          o.filter(col("o_orderkey") % 11 === 0)
            .select(col("o_orderstatus"), col("o_orderkey")),
          keys, "o_orderstatus")
        operators.Upsert.compactManifestedPartitions(s, base,
          "o_orderstatus", Seq("F"))
        operators.Upsert.readManifested(s, base)
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice"), col("ver"))
          .orderBy(col("o_orderkey"), col("o_orderstatus"))
      } finally
        operators.Upsert.EpochManifest.shardThreshold = saved
    }),

    "j35_crash_reclaim" -> ((s, dir) => {
      // THE CRASH-DEBRIS MODEL UNDER THE ORACLE (r20): a publish is
      // KILLED between its leaf writes and the manifest CAS, a
      // metadata-only rename then takes the epoch number (so no retry
      // ever reuses the crashed dir — the formerly-unnameable leak),
      // the batch retries under the renamed column, and a keyed
      // delete follows. Two things are hash-checked per round: the
      // final CONTENT equals the crash-free model exactly, and the
      // crash debris (`_e1`, `1_*` leaves, pending intents) is ZERO —
      // reclaimed by the ordinary O(churn) sweeps via the pre-write
      // orphan intents, no full-walk compact anywhere in the script.
      // The kill also leaves the writer lease behind exactly as a
      // process kill would, so the rename's own-JVM break path runs
      // under the oracle too.
      val saved = operators.Upsert.EpochManifest.shardThreshold
      operators.Upsert.EpochManifest.shardThreshold = 1
      try {
        val base = s"${artifactBase(dir)}/crash_reclaim"
        val bp = new org.apache.hadoop.fs.Path(base)
        val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(bp, true)
        val o = t(s, dir, "orders").filter(col("o_orderkey") % 13 === 0)
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice"))
        val keys = Seq("o_orderstatus", "o_orderkey")
        operators.Upsert.mergeIntoManifested(s, base,
          o.withColumn("ver", lit(1L)), keys, "o_orderstatus", "ver")
        val batch2 = o.filter(col("o_orderkey") % 4 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 2.0)
          .withColumn("ver", lit(2L))
        graft.FailPoint.arm("manifest_after_leaves")
        try operators.Upsert.mergeIntoManifested(s, base, batch2,
          keys, "o_orderstatus", "ver")
        catch { case _: graft.FailPoint.Kill => () }
        finally graft.FailPoint.disarm()
        operators.Upsert.renameManifestedColumn(s, base,
          "o_totalprice", "price")
        operators.Upsert.mergeIntoManifested(s, base,
          batch2.withColumnRenamed("o_totalprice", "price"),
          keys, "o_orderstatus", "ver")
        operators.Upsert.deleteKeysFromManifested(s, base,
          o.filter(col("o_orderkey") % 9 === 0)
            .select(col("o_orderstatus"), col("o_orderkey")),
          keys, "o_orderstatus")
        val leafDir = new org.apache.hadoop.fs.Path(s"$base/_mleaf")
        val sweepDir = new org.apache.hadoop.fs.Path(s"$base/_sweep")
        val debris =
          (if (fs.exists(new org.apache.hadoop.fs.Path(s"$base/_e1")))
            1 else 0) +
          (if (!fs.exists(leafDir)) 0
           else fs.listStatus(leafDir)
             .count(_.getPath.getName.startsWith("1_"))) +
          (if (!fs.exists(sweepDir)) 0
           else fs.listStatus(sweepDir)
             .count(_.getPath.getName.startsWith("i")))
        operators.Upsert.readManifested(s, base)
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("price"), col("ver"))
          .withColumn("orphan_debris", lit(debris.toLong))
          .orderBy(col("o_orderkey"), col("o_orderstatus"))
      } finally
        operators.Upsert.EpochManifest.shardThreshold = saved
    }),

    "u4_union_evolve" -> ((s, dir) => {
      // schema-evolution union: a legacy slice without the status
      // column unions BY NAME with the current schema
      // (allowMissingColumns fills nulls) — the ingestion posture for
      // a source that grew columns mid-history.
      val o = t(s, dir, "orders")
      val legacy = o.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_totalprice"))
      val current = o.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderstatus"))
      legacy.unionByName(current, allowMissingColumns = true)
        .groupBy(coalesce(col("o_orderstatus"), lit("(legacy)"))
          .as("status"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,4)")).cast("double")
            .as("total"))
        .orderBy(col("status"))
    }),

    "w6_range_frame" -> ((s, dir) =>
      // the RANGE frame sibling of w4's ROWS frame: the window spans
      // VALUE distance (event ids within 100), not row count — frames
      // over the integral id, the noise-free order. Decimal sums keep
      // the frame aggregate exact in any accumulation order.
      {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("event_id")).rangeBetween(-100L, 0L)
        t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"),
            round(sum(col("value").cast("decimal(18,4)")).over(w)
              .cast("double"), 6).as("sum100"),
            count(lit(1)).over(w).as("n100"))
          .orderBy(col("user_id"), col("event_id"))
      }),

    "a24_outliers" -> ((s, dir) => {
      // robust outlier count: median + MAD both via the histogram-
      // selection exactQuantile (no global sort anywhere), then one
      // counting pass. The 1.4826 normal-consistency factor makes
      // 3·MAD comparable to 3σ.
      import s.implicits._
      val li = t(s, dir, "lineitem")
      val med = Quantiles.exactQuantile(li, "l_extendedprice", 0.5,
        buckets = 512, maxSelect = 2000)
      val dev = li.select(abs(col("l_extendedprice") - lit(med)).as("d"))
      val mad = Quantiles.exactQuantile(dev, "d", 0.5,
        buckets = 512, maxSelect = 2000)
      li.agg(
          count(when(abs(col("l_extendedprice") - lit(med)) >
            lit(4.4478) * lit(mad), 1)).as("n_outliers"),
          count(lit(1)).as("n"))
        .select(col("n_outliers"), col("n"),
          round(lit(med), 6).as("median"), round(lit(mad), 6).as("mad"))
    }),

    "sql1_pricing_text" -> ((s, dir) => {
      // the SQL-text entrypoint over the same session catalog the
      // DataFrame gates use — proving a reference user can bring raw
      // ANSI SQL, not just the typed API
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
      s.sql("""SELECT l_returnflag,
                      CAST(sum(CAST(l_quantity AS DECIMAL(18,4)))
                           AS DOUBLE) AS sum_qty,
                      count(*) AS n
               FROM lineitem_v
               WHERE l_shipdate < date'1998-09-01'
               GROUP BY l_returnflag
               ORDER BY l_returnflag""")
    }),

    "w7_share" -> ((s, dir) => {
      // ratio-to-report: each nation's revenue share within its region.
      // Revenue accumulates as DECIMAL (exact in any order); the share
      // divides the two exact values in double with the identical
      // expression tree both engines evaluate. The window runs over the
      // 25-row aggregate, never the fact table.
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      val n = t(s, dir, "nation"); val r = t(s, dir, "region")
      val rev = o
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(col("o_totalprice").cast("decimal(18,4)")).as("_rev"))
      val wr = Window.partitionBy(col("r_name"))
      rev.select(col("r_name"), col("n_name"),
          round(col("_rev").cast("double"), 6).as("revenue"),
          round(col("_rev").cast("double") /
            sum(col("_rev")).over(wr).cast("double"), 6).as("share"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    "a25_unpivot" -> ((s, dir) => {
      // wide→long melt (Dataset.unpivot): the report-reshaping step
      // that turns a metrics-as-columns aggregate into (key, metric,
      // value) rows. Unpivot is a per-row Expand — no shuffle beyond
      // the aggregate that built the wide table.
      val wide = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double")
            .as("qty"),
          sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double")
            .as("revenue"),
          count(lit(1)).cast("double").as("n_items"))
      wide.unpivot(Array(col("l_returnflag")),
          Array(col("qty"), col("revenue"), col("n_items")),
          "metric", "val")
        .withColumn("val", round(col("val"), 6))
        .orderBy(col("l_returnflag"), col("metric"))
    }),

    "a26_argmax" -> ((s, dir) => {
      // argmax/argmin aggregates (max_by/min_by): richest and poorest
      // customer per nation in ONE pass — no rank-window over the
      // table, no self-join back to the max. Determinism: the ordering
      // value packs (acctbal, custkey) into one exact decimal
      // (bal·10⁹ + key; adjacent balances differ by ≥0.01 → 10⁷ apart,
      // far above any custkey), so ties break identically everywhere.
      val packed = col("c_acctbal").cast("decimal(18,2)") *
        lit(1000000000L) + col("c_custkey")
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(max_by(col("c_name"), packed).as("richest"),
          min_by(col("c_name"), packed).as("poorest"),
          round(max(col("c_acctbal")), 6).as("max_bal"))
        .orderBy(col("n_name"))
    }),

    "x_ts_gapfill" -> ((s, dir) =>
      // calendar densification + forward fill: purchases keyed into
      // 101 series, one row per (series, day) across each series' own
      // span, gaps carrying n=0 and the last observed daily total.
      // The spine is generated per key from aggregated bounds
      // (sequence+explode — no driver loop); the fill window partition
      // is a key's calendar length, bounded by days not data volume.
      TimeSeries.gapFillDaily(
          t(s, dir, "events")
            .filter(col("event_type") === "purchase")
            .withColumn("k", pmod(col("user_id"), lit(101))),
          "k", "ts", "value")
        .select(col("k"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("n"), col("was_gap"),
          round(col("filled").cast("double"), 6).as("filled"))
        .orderBy(col("k"), col("day"))),

    "x_ts_anomaly" -> ((s, dir) =>
      // rolling robust z-score anomalies over each user's purchase
      // history: trailing-16 mean/std from EXACT decimal moments
      // (n, Σx, Σx²) so the double z-score is bit-identical across
      // engines and partition orders; 8-row warm-up, |z|>2.5 flags.
      TimeSeries.rollingAnomalies(
          t(s, dir, "events").filter(col("event_type") === "purchase"),
          "user_id", "event_id", "value", frame = 16, z = 2.5)
        .select(col("user_id"), col("event_id"),
          round(col("value"), 6).as("value"),
          round(col("zscore"), 6).as("zscore"))
        .orderBy(col("user_id"), col("event_id"))),

    "x_ts_sliding_distinct" -> ((s, dir) =>
      // rolling 7-day actives (WAU): EXACT distinct users per trailing
      // window in O(activity) — each consecutive activity pair becomes
      // ±1 deltas and the per-day count is a running sum over the
      // calendar spine; the oracle recomputes every window's COUNT
      // DISTINCT brute-force, so the interval algebra is what's
      // checked.
      TimeSeries.slidingDistinct(t(s, dir, "events"), "user_id", "ts",
          windowDays = 7)
        .orderBy(col("day"))),

    "x_ts_decay" -> ((s, dir) =>
      // recency-weighted engagement score: per-row left fold acc/2+x
      // over the trailing 32 values — a fixed operation sequence both
      // engines replay bit-for-bit; truncation (not an unbounded
      // exponent) is what keeps the operator total at any history
      // length.
      // NO sql-side round: the fold is bit-identical across engines,
      // and engine round() implementations DISAGREE on exact half
      // boundaries (which these dyadic-rational folds do hit) — the
      // comparator's uniform rounding is the safe normalizer
      TimeSeries.decayedSum(t(s, dir, "events"),
          "user_id", "event_id", "value", window = 32)
        .select(col("user_id"), col("event_id"), col("decayed"))
        .orderBy(col("user_id"), col("event_id"))),

    "x_ts_streaks" -> ((s, dir) =>
      // consecutive-day activity streaks per user (gaps and islands):
      // the day − row_number island id needs one window over each
      // user's distinct-day list — bounded by calendar length.
      TimeSeries.streaks(t(s, dir, "events"), "user_id", "ts")
        .orderBy(col("user_id"))),

    "a27_incremental_report" -> ((s, dir) => {
      // incremental aggregate maintenance: the first half-year builds
      // mergeable group state (count / decimal sum / min / max), the
      // remainder folds in as a delta batch — only the delta and the
      // group-grain state shuffle, never the historical facts — and
      // the read-time report must equal the from-scratch rebuild the
      // oracle computes (associativity is the claim).
      val keys = Seq("o_orderpriority")
      val o = t(s, dir, "orders")
      val cut = lit("1997-07-01").cast("timestamp")
      val st0 = IncrementalAgg.state(
        o.filter(col("o_orderdate") < cut), keys, "o_totalprice")
      val st1 = IncrementalAgg.merge(st0, keys, "o_totalprice",
        o.filter(col("o_orderdate") >= cut))
      IncrementalAgg.report(st1, keys)
        .select(col("o_orderpriority"), col("n"),
          round(col("total"), 6).as("total"),
          round(col("mean"), 6).as("mean"),
          round(col("vmin"), 6).as("vmin"),
          round(col("vmax"), 6).as("vmax"))
        .orderBy(col("o_orderpriority"))
    }),

    "a28_corr_matrix" -> ((s, dir) =>
      // pairwise Pearson matrix in ONE scan: exact decimal moments
      // (n, Σx, Σx², Σxy per pair) in a single aggregation; only each
      // pair's final scalar formula runs in double (the a14 idiom,
      // widened to k columns without k(k−1)/2 scans).
      Profile.corrMatrix(t(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount"))
        .orderBy(col("col_a"), col("col_b"))),

    "a29_basket_pairs" -> ((s, dir) =>
      // market-basket mining: frequent co-occurring part pairs per
      // order with lift. Apriori prune (infrequent items drop before
      // pair generation), each basket packs ONCE into a sorted array,
      // pairs stream from a scan-stage lambda — never a self-join
      // that shuffles the fact table twice.
      MarketBasket.pairCounts(t(s, dir, "lineitem"),
          "l_orderkey", "l_partkey", minSupport = 2)
        .orderBy(col("item_a"), col("item_b"))),

    "w8_offsets" -> ((s, dir) => {
      // window offset family over per-customer order history: lag,
      // lead with an explicit default, running first_value and
      // nth_value — raw column values only (no computed doubles), so
      // the only contract is frame semantics. Partitions are
      // customer-bounded.
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderkey"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 2, -1.0).over(w).as("next2_price"),
          first(col("o_totalprice")).over(run).as("first_price"),
          nth_value(col("o_totalprice"), 2).over(run).as("second_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    "w9_running_distinct" -> ((s, dir) => {
      // running COUNT(DISTINCT) over event history — Spark has no
      // distinct windowed aggregate, and collect_set over a growing
      // frame would buffer the whole set per ROW. The scalable
      // identity: distinct-so-far = Σ first-occurrence flags — one
      // (user,type)-bounded row_number marks firsts, then a plain
      // running sum. The oracle runs DuckDB's NATIVE
      // count(DISTINCT …) OVER, so two different formulations of the
      // semantics must agree row-for-row.
      val first = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("event_id"))
      val run = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"))
        .withColumn("_f",
          when(row_number().over(first) === 1, 1L).otherwise(0L))
        .select(col("user_id"), col("event_id"),
          sum(col("_f")).over(run).as("distinct_types"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    "x_graph_pagerank" -> ((s, dir) => {
      // centrality over the co-occurrence graph: 3 damped PageRank
      // rounds, each ONE edge-join + keyed sum; all arithmetic is
      // integer ppm fixed-point (floor div + order-independent int
      // sums), so the iteration is reproducible bit-for-bit on any
      // engine or partitioning — floating PageRank compounds ulp
      // drift per round.
      // symmetrize by explode, not unionAll: a union's two branches
      // would each re-evaluate the (expensive) pair-mining subtree —
      // Spark has no cross-branch CSE
      val edges = MarketBasket.pairCounts(t(s, dir, "lineitem"),
          "l_orderkey", "l_partkey", minSupport = 2)
        .select(explode(array(
          struct(col("item_a").as("s"), col("item_b").as("d")),
          struct(col("item_b").as("s"), col("item_a").as("d")))).as("e"))
        .select(col("e.s").as("item_a"), col("e.d").as("item_b"))
      Graph.pageRankFixedPoint(edges, "item_a", "item_b", iters = 3)
        .select(col("id").as("item"), col("pr").as("pr_ppm"))
        .orderBy(col("item"))
    }),

    "x_graph_triangles" -> ((s, dir) => {
      // triangle census of the co-occurrence graph (the clustering-
      // coefficient numerator / community-density signal): ordered
      // wedge enumeration over the canonical pair list — two edge-
      // keyed equi-joins, each triangle materialized exactly once,
      // never a cross-graph pair product. Shares the x_graph_pagerank
      // edge derivation so the oracle replays pair mining identically.
      val edges = MarketBasket.pairCounts(t(s, dir, "lineitem"),
          "l_orderkey", "l_partkey", minSupport = 2)
        .select(col("item_a"), col("item_b"))
      Graph.triangleCounts(edges, "item_a", "item_b")
        .select(col("id").as("item"), col("triangles"))
        .orderBy(col("item"))
    }),

    "a31_group_median" -> ((s, dir) =>
      // exact per-group median over BOUNDED groups (customer-grain —
      // tens of rows per key): Spark's sort-based exact percentile
      // buffers one group per key, the right tool exactly when groups
      // are bounded; the unbounded-group path is a22's
      // histogram-guided selection, never this. n odd hits an exact
      // 2-dp element, n even a dyadic midpoint — both engines land on
      // the identical double.
      t(s, dir, "orders")
        .groupBy(col("o_custkey").as("cust"))
        .agg(count(lit(1)).as("n_orders"),
          percentile(col("o_totalprice"), lit(0.5)).as("median_price"))
        .select(col("cust"), col("n_orders"),
          round(col("median_price"), 6).as("median_price"))
        .orderBy(col("cust"))),

    "a30_fingerprint" -> ((s, dir) =>
      // order-independent content checksum per group: Σ md5-prefix
      // int64 — commutative, so no sort anywhere and partition
      // fingerprints merge by addition; the cheap change probe run
      // before snapshotDiff pays for its join.
      Profile.fingerprint(t(s, dir, "orders"), Seq("o_orderpriority"),
          Seq("o_orderkey", "o_custkey", "o_orderstatus"))
        .orderBy(col("o_orderpriority"))),

    // ── §2.9 streaming semantics (batch-checkable form) ─────────────
    "st3_dedup_window" -> ((s, dir) => {
      // event-time duplicate suppression: latest row per key wins
      Dedup.exact(
          t(s, dir, "events")
            .withColumn("_neg_value", -col("value"))
            .withColumn("_neg_id", -col("event_id")),
          Seq("user_id", "event_type"), Seq("_neg_value", "_neg_id"))
        .select(col("user_id"), col("event_type"), col("event_id"))
        .orderBy(col("user_id"), col("event_type"))
    }),

    "x_events_funnel" -> ((s, dir) =>
      // ordered 3-stage funnel: per user the first view, the first
      // click strictly after it, the first purchase after that —
      // stage order rides the integral event id (the one total order
      // both engines share; raw ts carries sub-µs noise). Every
      // shuffle in the stage chain keys on user_id, so the stages
      // co-locate; each stage scans only its type slice (pushed
      // filter), never the whole log.
      EventAnalytics.funnel(t(s, dir, "events"),
          "user_id", "event_type", "event_id",
          Seq("view", "click", "purchase"))
        .orderBy(col("user_id"))),

    "x_events_cohort" -> ((s, dir) =>
      // weekly cohort retention: users bucketed by first-seen week,
      // counted in each week they were active. Week truncation is
      // noise-immune (sub-µs can't move a Monday boundary), and the
      // offset divides exact day counts — no float durations.
      EventAnalytics.cohortRetention(t(s, dir, "events"),
          "user_id", "ts")
        .orderBy(col("cohort"), col("bucket_offset"))),

    "x_events_paths" -> ((s, dir) =>
      // first-order transition matrix: prev→next event-type counts and
      // row-normalized probabilities. The lag window is user-history
      // bounded; normalization windows over the aggregated 25-row
      // matrix, never the log.
      EventAnalytics.transitions(t(s, dir, "events"),
          "user_id", "event_type", "event_id")
        .orderBy(col("from_type"), col("to_type"))),

    "x_events_attribution" -> ((s, dir) =>
      // last-touch attribution: each purchase credits the user's most
      // recent preceding non-purchase event; no preceding touch →
      // '(direct)'. The ignore-nulls last window rides the same
      // user-history partition every other behavioral gate uses.
      EventAnalytics.lastTouchAttribution(t(s, dir, "events"),
          "user_id", "event_type", "event_id", "value", "purchase")
        .select(col("channel"), col("n_conversions"),
          round(col("revenue"), 6).as("revenue"))
        .orderBy(col("channel"))),

    "x_events_rfm" -> ((s, dir) =>
      // RFM segmentation: one customer-grain aggregate over orders
      // (the only fact-sized shuffle), then ntile windows over the
      // AGGREGATED table (entity-grain — the aggregate-first
      // discipline); deterministic tiles via the custkey tiebreak.
      EventAnalytics.rfmSegments(t(s, dir, "orders"),
          "o_custkey", "o_orderdate", "o_totalprice", buckets = 4)
        .select(col("cust"), col("recency_days"), col("frequency"),
          round(col("monetary"), 6).as("monetary"),
          col("r"), col("f"), col("m"), col("segment"))
        .orderBy(col("cust"))),

    "x_stream_paths" -> ((s, dir) => {
      // streaming step extraction for the transition matrix: the lag
      // the batch form computes with a window runs as per-entity
      // flatMapGroupsWithState (one (type, id) tuple of state per
      // entity); the matrix is a stateless batch aggregation of the
      // emitted steps. Same oracle as x_events_paths — streaming
      // steps == batch lag is the claim.
      val st = Tables.stream(s, dir, "events",
        "event_id", "user_id", "event_type")
      val sink = s"x_stream_paths_${streamSinkId.incrementAndGet()}"
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      val q = try {
        graft.streaming.EventStreams.transitionsStream(st,
            "user_id", "event_type", "event_id")
          .writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      if (!q.awaitTermination(300000L)) {
        q.stop()
        throw new IllegalStateException(
          "x_stream_paths: stream did not drain within 300s")
      }
      val wf = Window.partitionBy(col("from_type"))
      s.table(sink)
        .groupBy(col("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("p",
          round(col("n").cast("double") / sum(col("n")).over(wf), 6))
        .orderBy(col("from_type"), col("to_type"))
    }),

    "x_stream_funnel" -> ((s, dir) => {
      // REAL streaming funnel: the events log replays as a file
      // stream (schema pruned to the three funnel columns — the
      // nanosecond ts column is never requested, so the NANOS parquet
      // trap never fires) and funnelStream runs as an actual
      // flatMapGroupsWithState query under Trigger.AvailableNow.
      // Completions-only Append semantics; the oracle is the batch
      // funnel CTE chain restricted to fully-converted users — the
      // equality IS the streaming==batch claim.
      val st = Tables.stream(s, dir, "events",
        "event_id", "user_id", "event_type")
      val sink = s"x_stream_funnel_${streamSinkId.incrementAndGet()}"
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      val q = try {
        graft.streaming.EventStreams.funnelStream(st,
            "user_id", "event_type", "event_id",
            Seq("view", "click", "purchase"))
          .writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      if (!q.awaitTermination(300000L)) {
        q.stop()
        throw new IllegalStateException(
          "x_stream_funnel: stream did not drain within 300s")
      }
      s.table(sink)
        .select(col("user").as("user_id"),
          element_at(col("matched"), 1).as("s1_view"),
          element_at(col("matched"), 2).as("s2_click"),
          element_at(col("matched"), 3).as("s3_purchase"))
        .orderBy(col("user_id"))
    }),

    "x_stream_cohort" -> ((s, dir) => {
      // REAL streaming cohort extraction: the events log replays as a
      // file stream (ts normalized by Tables.eventsStream — the same
      // physical-type dispatch Tables.load applies, so both NANOS and
      // MICROS testdata drops work on the streaming path), cohortStream
      // pins each user's cohort week and emits one row per (user,
      // active week) via flatMapGroupsWithState; the retention matrix
      // is a stateless batch aggregation of the sink. Same oracle as
      // x_events_cohort — streaming hits == batch distinct+min-join
      // is the claim.
      val st = Tables.eventsStream(s, dir)
        .withColumn("week", date_trunc("week", col("ts")).cast("date"))
      val sink = s"x_stream_cohort_${streamSinkId.incrementAndGet()}"
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      val q = try {
        graft.streaming.EventStreams.cohortStream(st, "user_id", "week")
          .writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      if (!q.awaitTermination(300000L)) {
        q.stop()
        throw new IllegalStateException(
          "x_stream_cohort: stream did not drain within 300s")
      }
      s.table(sink)
        .select(
          date_format(date_from_unix_date(col("cohort").cast("int")),
            "yyyy-MM-dd").as("cohort"),
          ((col("week") - col("cohort")) / 7).cast("long")
            .as("bucket_offset"))
        .groupBy(col("cohort"), col("bucket_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("cohort"), col("bucket_offset"))
    }),

    "x_stream_attribution" -> ((s, dir) => {
      // REAL streaming last-touch attribution: the events log replays
      // as a file stream (schema pruned to four columns — the NANOS
      // ts is never requested), attributionStream carries (last touch,
      // frontier) per user via flatMapGroupsWithState and emits each
      // conversion once; the channel totals are a stateless batch
      // aggregation of the sink. Same oracle as x_events_attribution —
      // streaming state == batch ignore-nulls window is the claim.
      val st = Tables.stream(s, dir, "events",
        "event_id", "user_id", "event_type", "value")
      val sink = s"x_stream_attribution_${streamSinkId.incrementAndGet()}"
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      val q = try {
        graft.streaming.EventStreams.attributionStream(st,
            "user_id", "event_type", "event_id", "value", "purchase")
          .writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      if (!q.awaitTermination(300000L)) {
        q.stop()
        throw new IllegalStateException(
          "x_stream_attribution: stream did not drain within 300s")
      }
      s.table(sink)
        .groupBy(col("channel"))
        .agg(count(lit(1)).as("n_conversions"),
          sum(col("value").cast("decimal(18,4)")).as("_rev"))
        .select(col("channel"), col("n_conversions"),
          round(col("_rev").cast("double"), 6).as("revenue"))
        .orderBy(col("channel"))
    }),

    "x_stream_sliding_distinct" -> ((s, dir) => {
      // REAL streaming rolling actives: per user ONE epoch-day of
      // state; provisional window-closes are compensated (append-only
      // ±1 rows, no retraction) so the summed deltas converge to the
      // batch operator's delta table at drain. The day-grain running
      // sum is a stateless batch finalization of the sink. Same
      // oracle as x_ts_sliding_distinct — streaming deltas == batch
      // interval algebra is the claim.
      val st = Tables.eventsStream(s, dir)
        .withColumn("day",
          datediff(to_date(col("ts")),
            lit("1970-01-01").cast("date")).cast("long"))
      val sink =
        s"x_stream_sliding_distinct_${streamSinkId.incrementAndGet()}"
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      val q = try {
        graft.streaming.EventStreams.slidingDistinctStream(st,
            "user_id", "day", windowDays = 7)
          .writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      if (!q.awaitTermination(300000L)) {
        q.stop()
        throw new IllegalStateException(
          "x_stream_sliding_distinct: stream did not drain within 300s")
      }
      val d = s.table(sink)
      val daily = d.groupBy(col("day")).agg(sum(col("delta")).as("_net"))
      val spine = d.filter(col("act"))
        .agg(min(col("day")).as("_mn"), max(col("day")).as("_mx"))
        .select(explode(sequence(col("_mn"), col("_mx"))).as("day"))
      // BOUNDED GLOBAL WINDOW (r22, VERDICT r21 #4): this cumulative
      // sum runs over the DAY-GRAIN SPINE — one row per calendar day
      // between the data's min and max day. That frame is bounded by
      // wall-clock time, not corpus size: 100 TB of events still spans
      // tens of thousands of days at most, so the single-partition
      // WindowExec Spark warns about holds a control-plane-sized frame
      // by construction (the per-user/day heavy lifting happened in the
      // keyed stream + day-grain aggregate above).
      val wc = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(daily, Seq("day"), "left")
        .select(col("day"), coalesce(col("_net"), lit(0L)).as("_net"))
        .select(col("day"), sum(col("_net")).over(wc).as("n_active"))
        .select(date_format(date_add(lit("1970-01-01").cast("date"),
          col("day").cast("int")), "yyyy-MM-dd").as("day"),
          col("n_active"))
        .orderBy(col("day"))
    }),

    "x_stream_sessionize" -> ((s, dir) =>
      // session windows (gap-merged event-time sessions — the same
      // session_window code path a readStream takes; watermark 0 makes
      // the batch frame emit every finalized session). The oracle
      // replays the merge rule as gaps-and-islands SQL: a session
      // breaks where the gap to the previous event is >= the window
      // gap, and the window end is last-event + gap.
      graft.streaming.EventStreams.sessionize(
          t(s, dir, "events"), "ts", "10 minutes", watermark = "0 seconds")
        .select(col("user_id"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
          col("n_events"),
          round(col("total").cast("double"), 6).as("total"))
        .orderBy(col("user_id"), col("session_start"))),

    "x_stream_sessions" -> ((s, dir) => {
      // REAL streaming sessionization: the events log replays as a file
      // stream (ts + value via Tables.eventsStream), sessionsStream
      // carries ONE open session per user via flatMapGroupsWithState and
      // emits compensated ±1 session rows; the finalization (group by
      // session, net weight > 0) is a stateless batch aggregation of the
      // sink. Same oracle as x_stream_sessionize — streaming O(1)-state
      // gap-merge == session_window == gaps-and-islands SQL is the claim.
      val st = Tables.eventsStream(s, dir, "value DOUBLE")
      val sink = s"x_stream_sessions_${streamSinkId.incrementAndGet()}"
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      val q = try {
        graft.streaming.EventStreams.sessionsStream(st,
            "user_id", "ts", "value", gapMicros = 600000000L)
          .writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      if (!q.awaitTermination(300000L)) {
        q.stop()
        throw new IllegalStateException(
          "x_stream_sessions: stream did not drain within 300s")
      }
      s.table(sink)
        .groupBy(col("user"), col("start"), col("end"), col("n"),
          col("total"))
        .agg(sum(col("w")).as("_net"))
        .filter(col("_net") > 0)
        .select(col("user").as("user_id"),
          date_format(timestamp_micros(col("start")),
            "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(timestamp_micros(col("end")),
            "yyyy-MM-dd HH:mm:ss").as("session_end"),
          col("n").as("n_events"),
          round(col("total").cast("double"), 6).as("total"))
        .orderBy(col("user_id"), col("session_start"))
    }),

    "x_stream_cdc" -> ((s, dir) => {
      // CDC APPLY over a REAL file stream (MergeSink.startCdc): two
      // change waves land as parquet files — the initial upsert wave
      // (ver 1), then deletes for every %3 key and +1.0 updates for
      // the %5 non-deleted keys (ver 2) — and the sink maintains the
      // manifested table: per micro-batch the net effect per key
      // (max version) splits into one partition-pruned merge and one
      // key-batch delete, both replay-idempotent. The oracle computes
      // the same net effect declaratively; the answer must be
      // identical whether the files drain as one micro-batch or many.
      val work = java.nio.file.Files.createTempDirectory("graft_cdc")
        .toString
      val o = t(s, dir, "orders").filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"))
      val in = s"$work/in"
      o.withColumn("ver", lit(1L)).withColumn("op", lit("upsert"))
        .write.mode("append").parquet(in)
      o.filter(col("o_orderkey") % 3 === 0)
        .withColumn("ver", lit(2L)).withColumn("op", lit("delete"))
        .unionByName(
          o.filter(col("o_orderkey") % 5 === 0 &&
              col("o_orderkey") % 3 =!= 0)
            .withColumn("o_totalprice", col("o_totalprice") + 1.0)
            .withColumn("ver", lit(2L)).withColumn("op", lit("upsert")))
        .write.mode("append").parquet(in)
      val sch = org.apache.spark.sql.types.StructType.fromDDL(
        "o_orderkey BIGINT, o_orderstatus STRING, " +
          "o_totalprice DOUBLE, ver BIGINT, op STRING")
      val q = graft.streaming.MergeSink.startCdc(
        s.readStream.schema(sch).parquet(in), s"$work/tbl",
        Seq("o_orderstatus", "o_orderkey"), "o_orderstatus", "ver",
        "op", s"$work/ckpt")
      if (!q.awaitTermination(300000L)) {
        q.stop()
        throw new IllegalStateException(
          "x_stream_cdc: stream did not drain within 300s")
      }
      operators.Upsert.readManifested(s, s"$work/tbl")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), col("ver"))
        .orderBy(col("o_orderkey"), col("o_orderstatus"))
    }),

    "x_stream_cdf_source" -> ((s, dir) => {
      // STREAMING CDF SOURCE (VERDICT r14 #2) — the read twin of
      // x_stream_cdc's apply sink: the manifested table mutates in two
      // waves (update merge, key-batch delete), CdfSource.pollOnce
      // lands each interval's changesSince feed exactly-once in the
      // feed artifact (interval-token checkpointing — the artifact IS
      // the poll state), and a REAL Structured Streaming file source
      // drains the feed into a sink that must equal the batch CDF of
      // both intervals. An idle third poll proves the no-op path. The
      // downstream incremental consumer (the reference's
      // report-building trigger, but incremental) reads exactly this.
      val work = java.nio.file.Files.createTempDirectory("graft_cdfsrc")
        .toString
      val tbl = s"$work/tbl"; val feed = s"$work/feed"
      val o = t(s, dir, "orders").filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"))
      val keys = Seq("o_orderstatus", "o_orderkey")
      operators.Upsert.mergeIntoManifested(s, tbl,
        o.withColumn("ver", lit(1L)), keys, "o_orderstatus", "ver",
        retain = 4)
      operators.Upsert.mergeIntoManifested(s, tbl,
        o.filter(col("o_orderkey") % 5 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1.0)
          .withColumn("ver", lit(2L)), keys, "o_orderstatus", "ver",
        retain = 4)
      graft.streaming.CdfSource.pollOnce(s, tbl, keys, feed)
      operators.Upsert.deleteKeysFromManifested(s, tbl,
        o.filter(col("o_orderkey") % 11 === 0)
          .select(col("o_orderstatus"), col("o_orderkey")),
        keys, "o_orderstatus", retain = 4)
      graft.streaming.CdfSource.pollOnce(s, tbl, keys, feed)
      require(graft.streaming.CdfSource
        .pollOnce(s, tbl, keys, feed).isEmpty, "idle poll must no-op")
      val sink = s"$work/sink"
      val q = graft.streaming.CdfSource.feedStream(s, tbl, keys, feed)
        .writeStream
        .option("checkpointLocation", s"$work/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("parquet").option("path", sink).start()
      if (!q.awaitTermination(300000L)) {
        q.stop()
        throw new IllegalStateException(
          "x_stream_cdf_source: stream did not drain within 300s")
      }
      s.read.parquet(sink)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), col("ver"), col("_change_type"),
          col("_from_epoch"), col("_to_epoch"))
        .orderBy(col("_from_epoch"), col("o_orderkey"),
          col("o_orderstatus"), col("_change_type"))
    }),

    "x_stream_cdf_rename_feed" -> ((s, dir) => {
      // SCHEMA-VERSIONED FEED (VERDICT r15 #2): a rename lands BETWEEN
      // two polled intervals, so the feed dir accumulates files of
      // both spellings (`quantity` era, then `qty2` era); the drained
      // stream must serve the OLD files' values under the NEW name via
      // the `_cdfmeta_` rename events the poller records beside the
      // feed — the pre-r16 pinned-schema read served NULL there (the
      // documented failure mode this gate exists to beat). Oracle
      // recomputes both intervals' diffs under the final name.
      val work = java.nio.file.Files.createTempDirectory("graft_cdfrf")
        .toString
      val tbl = s"$work/tbl"; val feed = s"$work/feed"
      val base = t(s, dir, "orders").filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"))
      val keys = Seq("o_orderstatus", "o_orderkey")
      operators.Upsert.mergeIntoManifested(s, tbl,
        base.withColumn("quantity", (col("o_orderkey") % 97).cast("long"))
          .withColumn("ver", lit(1L)), keys, "o_orderstatus", "ver",
        retain = 8)
      operators.Upsert.mergeIntoManifested(s, tbl,
        base.filter(col("o_orderkey") % 5 === 0)
          .withColumn("quantity",
            (col("o_orderkey") % 97 + 1000).cast("long"))
          .withColumn("ver", lit(2L)), keys, "o_orderstatus", "ver",
        retain = 8)
      // interval (0,1] feeds under `quantity`
      graft.streaming.CdfSource.pollOnce(s, tbl, keys, feed)
      operators.Upsert.renameManifestedColumn(s, tbl, "quantity", "qty2",
        retain = 8)
      operators.Upsert.mergeIntoManifested(s, tbl,
        base.filter(col("o_orderkey") % 3 === 0)
          .withColumn("qty2", (col("o_orderkey") % 89 + 5000).cast("long"))
          .withColumn("ver", lit(3L)), keys, "o_orderstatus", "ver",
        retain = 8)
      // interval (1,3] composes the rename and feeds under `qty2`
      graft.streaming.CdfSource.pollOnce(s, tbl, keys, feed)
      val sink = s"$work/sink"
      val q = graft.streaming.CdfSource.feedStream(s, tbl, keys, feed)
        .writeStream
        .option("checkpointLocation", s"$work/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("parquet").option("path", sink).start()
      if (!q.awaitTermination(300000L)) {
        q.stop()
        throw new IllegalStateException(
          "x_stream_cdf_rename_feed: stream did not drain within 300s")
      }
      s.read.parquet(sink)
        .select(col("o_orderkey"), col("o_orderstatus"), col("qty2"),
          col("ver"), col("_change_type"),
          col("_from_epoch"), col("_to_epoch"))
        .orderBy(col("_from_epoch"), col("o_orderkey"),
          col("o_orderstatus"), col("_change_type"))
    }),

    "x_stream_mv" -> ((s, dir) => {
      // STREAMING MATERIALIZED VIEW — the incremental-report pipeline
      // end to end: source table mutations -> CDF polls -> a REAL feed
      // stream folded into persistent (count, sum) state by MvSink
      // (a32_mv_cdf's batch fold, now behind a streaming query with
      // the replay fencing the non-idempotent fold REQUIRES). The
      // reference rebuilt its report per trigger; this maintains it
      // from changes alone. Oracle = the view recomputed from the
      // final facts.
      val work = java.nio.file.Files.createTempDirectory("graft_mv")
        .toString
      val tbl = s"$work/tbl"; val feed = s"$work/feed"
      val st = s"$work/state"
      val o = t(s, dir, "orders").filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"))
      val keys = Seq("o_orderstatus", "o_orderkey")
      val grp = Seq("o_orderstatus")
      operators.Upsert.mergeIntoManifested(s, tbl,
        o.withColumn("ver", lit(1L)), keys, "o_orderstatus", "ver",
        retain = 4)
      graft.streaming.MvSink.seed(
        operators.Upsert.readManifestedAt(s, tbl, 0), grp,
        "o_totalprice", st)
      operators.Upsert.mergeIntoManifested(s, tbl,
        o.filter(col("o_orderkey") % 5 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1.0)
          .withColumn("ver", lit(2L)), keys, "o_orderstatus", "ver",
        retain = 4)
      graft.streaming.CdfSource.pollOnce(s, tbl, keys, feed)
      operators.Upsert.deleteKeysFromManifested(s, tbl,
        o.filter(col("o_orderkey") % 11 === 0)
          .select(col("o_orderstatus"), col("o_orderkey")),
        keys, "o_orderstatus", retain = 4)
      graft.streaming.CdfSource.pollOnce(s, tbl, keys, feed)
      val q = graft.streaming.MvSink.start(
        graft.streaming.CdfSource.feedStream(s, tbl, keys, feed),
        grp, "o_totalprice", st, s"$work/ckpt")
      if (!q.awaitTermination(300000L)) {
        q.stop()
        throw new IllegalStateException(
          "x_stream_mv: mv stream did not drain within 300s")
      }
      graft.streaming.MvSink.readView(s, st, grp)
        .select(col("o_orderstatus"), col("n"),
          round(col("total"), 4).as("total"),
          round(col("mean"), 6).as("mean"))
        .orderBy(col("o_orderstatus"))
    }),

    "x_stream_mv_multi" -> ((s, dir) => {
      // STREAMING MULTI-MEASURE MV: two measures' counts/sums AND
      // min/max ride a REAL feed stream into one state dir
      // (MvSink.startMulti); the delete wave retires group extrema
      // (qty maxima live exclusively on the +500-updated %5 keys,
      // some of which the %11 delete removes), so the fold's
      // dirty-group repair reads the LIVE table mid-stream. Oracle =
      // a33's multi-measure rebuild from the final facts, via the
      // streaming path.
      val work = java.nio.file.Files.createTempDirectory("graft_mvmulti")
        .toString
      val tbl = s"$work/tbl"; val feed = s"$work/feed"
      val st = s"$work/state"
      val o = t(s, dir, "orders").filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"),
          (col("o_orderkey") % 97).cast("double").as("qty"))
      val keys = Seq("o_orderstatus", "o_orderkey")
      val grp = Seq("o_orderstatus")
      val cols = Seq("o_totalprice", "qty")
      operators.Upsert.mergeIntoManifested(s, tbl,
        o.withColumn("ver", lit(1L)), keys, "o_orderstatus", "ver",
        retain = 4)
      graft.streaming.MvSink.seedMulti(
        operators.Upsert.readManifestedAt(s, tbl, 0), grp, cols, st)
      operators.Upsert.mergeIntoManifested(s, tbl,
        o.filter(col("o_orderkey") % 5 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
          .withColumn("qty", col("qty") + 500.0)
          .withColumn("ver", lit(2L)), keys, "o_orderstatus", "ver",
        retain = 4)
      graft.streaming.CdfSource.pollOnce(s, tbl, keys, feed)
      operators.Upsert.deleteKeysFromManifested(s, tbl,
        o.filter(col("o_orderkey") % 11 === 0)
          .select(col("o_orderstatus"), col("o_orderkey")),
        keys, "o_orderstatus", retain = 4)
      graft.streaming.CdfSource.pollOnce(s, tbl, keys, feed)
      // dirty-partition-bounded repair reader (VERDICT r16 #1): the
      // group key is the partition column, so the mid-stream extremum
      // repair lists only the dirty partitions' manifest entries
      val q = graft.streaming.MvSink.startMultiPruned(
        graft.streaming.CdfSource.feedStream(s, tbl, keys, feed),
        grp, cols,
        rows =>
          if (rows.isEmpty) operators.Upsert.readManifested(s, tbl)
          else operators.Upsert.readManifestedPartitions(s, tbl,
            rows.map(_.get(0).toString).distinct),
        st, s"$work/ckpt")
      if (!q.awaitTermination(300000L)) {
        q.stop()
        throw new IllegalStateException(
          "x_stream_mv_multi: mv stream did not drain within 300s")
      }
      graft.streaming.MvSink.readViewMulti(s, st, grp, cols)
        .select(col("o_orderstatus"), col("n"),
          round(col("total_o_totalprice"), 4).as("total_price"),
          round(col("mean_o_totalprice"), 6).as("mean_price"),
          round(col("min_o_totalprice"), 4).as("min_price"),
          round(col("max_o_totalprice"), 4).as("max_price"),
          round(col("total_qty"), 4).as("total_qty"),
          round(col("mean_qty"), 6).as("mean_qty"),
          round(col("min_qty"), 4).as("min_qty"),
          round(col("max_qty"), 4).as("max_qty"))
        .orderBy(col("o_orderstatus"))
    }),

    "x_stream_mv_prune" -> ((s, dir) => {
      // LONG-RUNNING FEED STAYS BOUNDED (VERDICT r15 #3): three
      // mutation waves, each polled, drained into the MV — which
      // publishes its durably-processed epoch via the consumer-
      // progress handshake — then pruned with NO bare argument:
      // pruneFeed() reclaims exactly what the registered consumer has
      // folded, so the feed dir's committed tokens stay at 1 (the
      // poller's checkpoint) however long the pipeline runs. The gate
      // asserts that boundedness, and the oracle recomputes the view
      // from the final facts so a fold corrupted by over-pruning
      // (double-fed interval) or under-feeding hash-mismatches.
      val work = java.nio.file.Files.createTempDirectory("graft_mvp")
        .toString
      val tbl = s"$work/tbl"; val feed = s"$work/feed"
      val st = s"$work/state"
      val o = t(s, dir, "orders").filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"))
      val keys = Seq("o_orderstatus", "o_orderkey")
      val grp = Seq("o_orderstatus")
      operators.Upsert.mergeIntoManifested(s, tbl,
        o.withColumn("ver", lit(1L)), keys, "o_orderstatus", "ver",
        retain = 4)
      graft.streaming.MvSink.seed(
        operators.Upsert.readManifestedAt(s, tbl, 0), grp,
        "o_totalprice", st)
      def drainAndPrune(): Unit = {
        graft.streaming.CdfSource.pollOnce(s, tbl, keys, feed)
        val q = graft.streaming.MvSink.start(
          graft.streaming.CdfSource.feedStream(s, tbl, keys, feed),
          grp, "o_totalprice", st, s"$work/ckpt",
          progress = Some((feed, "mv1")))
        if (!q.awaitTermination(300000L)) {
          q.stop()
          throw new IllegalStateException(
            "x_stream_mv_prune: mv stream did not drain within 300s")
        }
        graft.streaming.CdfSource.pruneFeed(s, feed)
        ()
      }
      operators.Upsert.mergeIntoManifested(s, tbl,
        o.filter(col("o_orderkey") % 5 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1.0)
          .withColumn("ver", lit(2L)), keys, "o_orderstatus", "ver",
        retain = 4)
      drainAndPrune()
      operators.Upsert.deleteKeysFromManifested(s, tbl,
        o.filter(col("o_orderkey") % 11 === 0)
          .select(col("o_orderstatus"), col("o_orderkey")),
        keys, "o_orderstatus", retain = 4)
      drainAndPrune()
      operators.Upsert.mergeIntoManifested(s, tbl,
        o.filter(col("o_orderkey") % 13 === 0 &&
            col("o_orderkey") % 11 =!= 0)
          .withColumn("o_totalprice", col("o_totalprice") + 2.0)
          .withColumn("ver", lit(3L)), keys, "o_orderstatus", "ver",
        retain = 4)
      drainAndPrune()
      val fp = new org.apache.hadoop.fs.Path(feed)
      val ffs = fp.getFileSystem(s.sparkContext.hadoopConfiguration)
      val committed = ffs.listStatus(fp).map(_.getPath.getName)
        .count(n => n.startsWith("_delta_") && n.endsWith("_SUCCESS"))
      require(committed == 1, s"feed dir not bounded: $committed " +
        "committed tokens survive full consumption")
      graft.streaming.MvSink.readView(s, st, grp)
        .select(col("o_orderstatus"), col("n"),
          round(col("total"), 4).as("total"),
          round(col("mean"), 6).as("mean"))
        .orderBy(col("o_orderstatus"))
    }),

    "x_stream_mv_2consumers" -> ((s, dir) => {
      // TWO CONSUMERS, ONE FEED, DIFFERENT PACES (VERDICT r16 #5): a
      // fast MV drains every interval as it lands; a slow one
      // registers up front and catches up only at the end. While the
      // slow consumer lags, pruneFeed() — AND an eager prune with a
      // too-large bare argument — must reclaim NOTHING (the clamp to
      // the slowest registered consumer, e2e); once it catches up, the
      // no-arg prune bounds the feed dir back to the single newest
      // token. Both views ride the oracle: the result is the final
      // rebuilt view once per consumer, so a missed or double-fed
      // interval on EITHER consumer hash-mismatches.
      val work = java.nio.file.Files.createTempDirectory("graft_mv2c")
        .toString
      val tbl = s"$work/tbl"; val feed = s"$work/feed"
      val st1 = s"$work/state1"; val st2 = s"$work/state2"
      val o = t(s, dir, "orders").filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"))
      val keys = Seq("o_orderstatus", "o_orderkey")
      val grp = Seq("o_orderstatus")
      operators.Upsert.mergeIntoManifested(s, tbl,
        o.withColumn("ver", lit(1L)), keys, "o_orderstatus", "ver",
        retain = 4)
      val snap0 = operators.Upsert.readManifestedAt(s, tbl, 0)
      graft.streaming.MvSink.seed(snap0, grp, "o_totalprice", st1)
      graft.streaming.MvSink.seed(snap0, grp, "o_totalprice", st2)
      // the slow consumer REGISTERS before consuming anything — an
      // unregistered consumer is invisible to the clamp by contract
      graft.streaming.CdfSource.publishProgress(s, feed, "mv2", 0L)
      def drain(st: String, ckpt: String, id: String): Unit = {
        val q = graft.streaming.MvSink.start(
          graft.streaming.CdfSource.feedStream(s, tbl, keys, feed),
          grp, "o_totalprice", st, ckpt, progress = Some((feed, id)))
        if (!q.awaitTermination(300000L)) {
          q.stop()
          throw new IllegalStateException(
            s"x_stream_mv_2consumers: $id did not drain within 300s")
        }
      }
      def committedTokens(): Int = {
        val fp = new org.apache.hadoop.fs.Path(feed)
        fp.getFileSystem(s.sparkContext.hadoopConfiguration)
          .listStatus(fp).map(_.getPath.getName)
          .count(n => n.startsWith("_delta_") && n.endsWith("_SUCCESS"))
      }
      // wave 1: update the %5 keys; only the fast consumer drains
      operators.Upsert.mergeIntoManifested(s, tbl,
        o.filter(col("o_orderkey") % 5 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1.0)
          .withColumn("ver", lit(2L)), keys, "o_orderstatus", "ver",
        retain = 4)
      graft.streaming.CdfSource.pollOnce(s, tbl, keys, feed)
      drain(st1, s"$work/ckpt1", "mv1")
      // the lagging consumer pins the feed: neither the no-arg prune
      // nor an eager over-stated one may reclaim the unread interval
      require(graft.streaming.CdfSource.pruneFeed(s, feed) == 0,
        "no-arg prune reclaimed past the lagging consumer")
      require(graft.streaming.CdfSource.pruneFeed(s, feed, 99L) == 0,
        "eager prune was not clamped to the lagging consumer")
      require(committedTokens() == 1, "interval lost while mv2 lagged")
      // wave 2: delete the %11 keys; fast consumer drains again
      operators.Upsert.deleteKeysFromManifested(s, tbl,
        o.filter(col("o_orderkey") % 11 === 0)
          .select(col("o_orderstatus"), col("o_orderkey")),
        keys, "o_orderstatus", retain = 4)
      graft.streaming.CdfSource.pollOnce(s, tbl, keys, feed)
      drain(st1, s"$work/ckpt1", "mv1")
      require(graft.streaming.CdfSource.pruneFeed(s, feed) == 0,
        "no-arg prune reclaimed past the lagging consumer (wave 2)")
      require(committedTokens() == 2,
        "both unread intervals must survive while mv2 lags")
      // the slow consumer catches up in ONE drain over both intervals,
      // then the no-arg prune bounds the feed dir again
      drain(st2, s"$work/ckpt2", "mv2")
      require(graft.streaming.CdfSource.pruneFeed(s, feed) == 1,
        "prune should reclaim exactly the fully-consumed interval")
      require(committedTokens() == 1,
        "feed dir not bounded after the slow consumer caught up")
      def view(st: String, tag: String) =
        graft.streaming.MvSink.readView(s, st, grp)
          .select(lit(tag).as("consumer"), col("o_orderstatus"),
            col("n"), round(col("total"), 4).as("total"),
            round(col("mean"), 6).as("mean"))
      view(st1, "mv1").unionByName(view(st2, "mv2"))
        .orderBy(col("consumer"), col("o_orderstatus"))
    }),

    "x_stream_replicate" -> ((s, dir) => {
      // TABLE-TO-TABLE REPLICATION — the composition capstone: the
      // source table mutates in two waves (update merge, key-batch
      // delete), CdfSource.pollOnce feeds each interval, and
      // Replicate.start drains the feed through the CDC apply sink
      // into a manifested REPLICA — every stage a real stream or a
      // real manifested operator. The two polled intervals coalesce
      // into one apply micro-batch, so the interval-epoch versioning
      // (not the source's own ver column) is what keeps the %55 keys
      // (updated THEN deleted) out of the replica. Oracle = the
      // source's final model, read from the REPLICA.
      val work = java.nio.file.Files.createTempDirectory("graft_repl")
        .toString
      val src = s"$work/src"; val feed = s"$work/feed"
      val dst = s"$work/dst"
      val o = t(s, dir, "orders").filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"))
      val keys = Seq("o_orderstatus", "o_orderkey")
      operators.Upsert.mergeIntoManifested(s, src,
        o.withColumn("ver", lit(1L)), keys, "o_orderstatus", "ver",
        retain = 4)
      graft.streaming.Replicate.seed(s, src, dst, keys, "o_orderstatus")
      operators.Upsert.mergeIntoManifested(s, src,
        o.filter(col("o_orderkey") % 5 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1.0)
          .withColumn("ver", lit(2L)), keys, "o_orderstatus", "ver",
        retain = 4)
      graft.streaming.CdfSource.pollOnce(s, src, keys, feed)
      operators.Upsert.deleteKeysFromManifested(s, src,
        o.filter(col("o_orderkey") % 11 === 0)
          .select(col("o_orderstatus"), col("o_orderkey")),
        keys, "o_orderstatus", retain = 4)
      graft.streaming.CdfSource.pollOnce(s, src, keys, feed)
      val q = graft.streaming.Replicate.start(s, src, feed, dst, keys,
        "o_orderstatus", s"$work/ckpt")
      if (!q.awaitTermination(300000L)) {
        q.stop()
        throw new IllegalStateException(
          "x_stream_replicate: apply stream did not drain within 300s")
      }
      operators.Upsert.readManifested(s, dst)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), col("ver"))
        .orderBy(col("o_orderkey"), col("o_orderstatus"))
    }),

    "x_stream_replicate_evolve" -> ((s, dir) => {
      // REPLICATION UNDER MID-TAIL SCHEMA CHANGE (VERDICT r15 #5):
      // the source renames its value column between drains (the
      // replica replays the rename at the next start — one value
      // lineage, one name, both sides), then DROPS it and grows a new
      // column (`note`) in the same pipeline — the replica keeps the
      // dropped column FROZEN (null on rows the tail updates after the
      // drop, last value elsewhere) while `note` arrives via
      // add-evolution. Every drain is a real stream on one shared
      // checkpoint. Oracle = the converged replica model, recomputed
      // from the wave algebra.
      val work = java.nio.file.Files.createTempDirectory("graft_repev")
        .toString
      val src = s"$work/src"; val feed = s"$work/feed"
      val dst = s"$work/dst"
      val base = t(s, dir, "orders").filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"))
      val keys = Seq("o_orderstatus", "o_orderkey")
      def drain(): Unit = {
        val q = graft.streaming.Replicate.start(s, src, feed, dst, keys,
          "o_orderstatus", s"$work/ckpt")
        if (!q.awaitTermination(300000L)) {
          q.stop()
          throw new IllegalStateException(
            "x_stream_replicate_evolve: apply stream did not drain " +
              "within 300s")
        }
      }
      operators.Upsert.mergeIntoManifested(s, src,
        base.withColumn("q", (col("o_orderkey") % 97).cast("long"))
          .withColumn("ver", lit(1L)), keys, "o_orderstatus", "ver",
        retain = 8)
      graft.streaming.Replicate.seed(s, src, dst, keys, "o_orderstatus")
      operators.Upsert.mergeIntoManifested(s, src,
        base.filter(col("o_orderkey") % 5 === 0)
          .withColumn("q", (col("o_orderkey") % 97 + 1000).cast("long"))
          .withColumn("ver", lit(2L)), keys, "o_orderstatus", "ver",
        retain = 8)
      graft.streaming.CdfSource.pollOnce(s, src, keys, feed)
      drain() // consumed under `q`
      operators.Upsert.renameManifestedColumn(s, src, "q", "q2",
        retain = 8)
      operators.Upsert.mergeIntoManifested(s, src,
        base.filter(col("o_orderkey") % 3 === 0)
          .withColumn("q2", (col("o_orderkey") % 89 + 5000).cast("long"))
          .withColumn("ver", lit(3L)), keys, "o_orderstatus", "ver",
        retain = 8)
      graft.streaming.CdfSource.pollOnce(s, src, keys, feed)
      drain() // replays the rename onto the replica, lands the wave
      operators.Upsert.dropManifestedColumn(s, src, "q2", retain = 8)
      operators.Upsert.mergeIntoManifested(s, src,
        base.filter(col("o_orderkey") % 11 === 0)
          .withColumn("note",
            concat(lit("n"), (col("o_orderkey") % 10).cast("string")))
          .withColumn("ver", lit(4L)), keys, "o_orderstatus", "ver",
        retain = 8)
      graft.streaming.CdfSource.pollOnce(s, src, keys, feed)
      drain() // drop-free span; q2 frozen, note via add-evolution
      operators.Upsert.readManifested(s, dst)
        .select(col("o_orderkey"), col("o_orderstatus"), col("q2"),
          col("note"), col("ver"))
        .orderBy(col("o_orderkey"), col("o_orderstatus"))
    }),

    "x_stream_replicate_widen" -> ((s, dir) => {
      // REPLICATION ACROSS A TYPE WIDENING (VERDICT r17 #4): the
      // source's `q` starts as INT; an update wave lands under int,
      // then a widening merge re-types it BIGINT with values past int
      // range, then a delete wave — all three polled into the feed
      // BEFORE one drain, so the single apply batch holds pre-widen
      // files stored int32 and post-widen files stored int64 under one
      // stream schema pinned wide: the narrow era upcasts in the
      // parquet scan (the promotion contract), the replica's merge
      // widens its own stored schema via add-and-widen evolution, and
      // the interval-epoch versioning still orders the waves. (The
      // mid-RUN widen guard — a widening landing while a tail is
      // draining — is spec-level, like the rename guard:
      // ReplicateSpec.) Oracle = the converged replica from the wave
      // algebra.
      val work = java.nio.file.Files.createTempDirectory("graft_repwid")
        .toString
      val src = s"$work/src"; val feed = s"$work/feed"
      val dst = s"$work/dst"
      val base = t(s, dir, "orders").filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"))
      val keys = Seq("o_orderstatus", "o_orderkey")
      operators.Upsert.mergeIntoManifested(s, src,
        base.withColumn("q", (col("o_orderkey") % 97).cast("int"))
          .withColumn("ver", lit(1L)), keys, "o_orderstatus", "ver",
        retain = 8)
      graft.streaming.Replicate.seed(s, src, dst, keys, "o_orderstatus")
      operators.Upsert.mergeIntoManifested(s, src,
        base.filter(col("o_orderkey") % 5 === 0)
          .withColumn("q", (col("o_orderkey") % 97 + 1000).cast("int"))
          .withColumn("ver", lit(2L)), keys, "o_orderstatus", "ver",
        retain = 8)
      graft.streaming.CdfSource.pollOnce(s, src, keys, feed)
      operators.Upsert.mergeIntoManifested(s, src,
        base.filter(col("o_orderkey") % 3 === 0)
          .withColumn("q",
            (col("o_orderkey") % 89 + 3000000000L).cast("long"))
          .withColumn("ver", lit(3L)), keys, "o_orderstatus", "ver",
        retain = 8)
      graft.streaming.CdfSource.pollOnce(s, src, keys, feed)
      operators.Upsert.deleteKeysFromManifested(s, src,
        base.filter(col("o_orderkey") % 11 === 0)
          .select(col("o_orderstatus"), col("o_orderkey")),
        keys, "o_orderstatus", retain = 8)
      graft.streaming.CdfSource.pollOnce(s, src, keys, feed)
      val q = graft.streaming.Replicate.start(s, src, feed, dst, keys,
        "o_orderstatus", s"$work/ckpt")
      if (!q.awaitTermination(300000L)) {
        q.stop()
        throw new IllegalStateException(
          "x_stream_replicate_widen: apply stream did not drain " +
            "within 300s")
      }
      operators.Upsert.readManifested(s, dst)
        .select(col("o_orderkey"), col("o_orderstatus"), col("q"),
          col("ver"))
        .orderBy(col("o_orderkey"), col("o_orderstatus"))
    }),

    "x_stream_neardup" -> ((s, dir) => {
      // REAL streaming execution, hash-checked: the documents corpus
      // replays as a file stream with a deterministic event time
      // (doc_id minutes past a fixed epoch — the oracle re-derives it),
      // nearDupPairsStream runs as an actual watermarked stream-stream
      // self-join under Trigger.AvailableNow (join state is
      // rate×horizon, the 100 TB-stream shape), and the sink table is
      // compared pair-for-pair against the signature artifact. The
      // operator's at-least-once contract (one emission per shared
      // chunk key) is collapsed by the documented downstream distinct.
      val docs = t(s, dir, "documents")
      Dedup.simhashTable(docs, "doc_id", "text", artifactBase(dir))
      // glob, not the bare file path: FileStreamSource requires its
      // basePath to be a directory, and a glob's base resolves to the
      // parent dir while still matching only the documents table
      val st = s.readStream.schema(docs.schema)
        .parquet(s"$dir/documents.parquet*")
        .withColumn("ts", expr("timestamp'2024-01-01 00:00:00' + " +
          "make_interval(0, 0, 0, 0, 0, cast(doc_id as int), 0)"))
      val sink = s"x_stream_neardup_${streamSinkId.incrementAndGet()}"
      // a stream-stream join runs FOUR state stores per shuffle
      // partition; their per-microbatch commit IO dwarfs this corpus,
      // so the streaming query gets a narrow shuffle width (fixed at
      // query start; restored right after — gates run serially)
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      val q = try {
        graft.streaming.EventStreams.nearDupPairsStream(st,
            "doc_id", "text", "ts", within = "30 minutes", maxDist = 3)
          .writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      // bounded wait: an unbounded await on a wedged stream would hang
      // the whole gate run — better one failed query than a dead Verify
      if (!q.awaitTermination(300000L)) {
        q.stop()
        throw new IllegalStateException(
          "x_stream_neardup: stream did not drain within 300s")
      }
      s.table(sink)
        .select(col("id_earlier"), col("id_later"), col("hamming"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"))
        .distinct()
        .orderBy(col("id_earlier"), col("id_later"))
    }),

    // ── LLM-pipeline extensions: dedup ───────────────────────────────
    "x_dedup_exact" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n"))
        .select(md5(col("text")).as("h"), col("keeper"), col("n"))
        .orderBy(col("h"))
    }),

    // maxBlock=1000 exercises the stop-shingle cap end-to-end: shingles
    // in >1000 docs leave the shingle universe (blocking AND scoring) —
    // the bound that keeps the block self-join linear at 100× corpus
    // size. The oracle SQL applies the identical doc-frequency filter.
    "x_dedup_ngram" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
          n = 3, threshold = 0.12, maxBlock = 1000)
        .orderBy(col("id_a"), col("id_b"))),

    "x_dedup_containment" -> ((s, dir) =>
      // asymmetric near-dup: docs ≥30% shingle-contained in another —
      // catches the short-quote-inside-long-doc case symmetric Jaccard
      // structurally misses (|A∩B|/|A| ≈ 1 while Jaccard ≈ |A|/|B|).
      // Exact semantics (full distinct-shingle sizes AND intersections)
      // with BOUNDED blocking: per-direction prefix filtering — probe
      // each doc's |A|−⌈t·|A|⌉+1 rarest shingles against the full
      // index, completeness a theorem (VERDICT r12 #3 retired the
      // uncapped quadratic-in-hot-shingle form this gate used to run).
      Dedup.containmentPairsExact(t(s, dir, "documents"), "doc_id",
          "text", n = 3, threshold = 0.3)
        .orderBy(col("src"), col("dst"))),

    "x_dedup_ngram_prefix" -> ((s, dir) =>
      // EXACT plain-Jaccard pairs (no informative-shingle cap) whose
      // blocking is still bounded: prefix filtering (AllPairs/PPJoin)
      // indexes only each doc's |x|−⌈t·|x|⌉+1 globally-rarest
      // shingles — a qualifying pair's smallest shared shingle
      // provably lies in both prefixes, so candidate completeness is
      // a theorem and hot stop-shingles are exactly what the prefix
      // excludes. The oracle is the unconstrained all-pairs
      // definition — the equality IS the completeness claim.
      Dedup.ngramJaccardPairsExact(t(s, dir, "documents"),
          "doc_id", "text", n = 3, threshold = 0.8)
        .orderBy(col("id_a"), col("id_b"))),

    // substring-level dedup (Lee et al. 2022, fixed-width form): maximal
    // spans whose every 8-token window occurs >= 2 times in the corpus.
    // portableHash=true keys windows by md5 so the oracle replays them;
    // the production default is xxhash64 (8-byte shuffle keys) —
    // DedupSpec proves both produce identical spans.
    "x_dedup_spans" -> ((s, dir) =>
      Dedup.duplicatedSpans(t(s, dir, "documents"), "doc_id", "text",
          w = 8, portableHash = true)
        .orderBy(col("doc_id"), col("span_start"))),

    // append-only span refresh: the old slice's window derivation is
    // served from the on-disk spanTable artifacts (occurrences+counts,
    // build-once); only the delta tokenizes/hashes. Counts are additive
    // under append, so the result must equal the from-scratch spans of
    // the UNION — the oracle is the identical full-corpus SQL as
    // x_dedup_spans, which is the whole point.
    "x_dedup_spans_incr" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val old = docs.filter(col("doc_id") % 5 =!= 0)
      val delta = docs.filter(col("doc_id") % 5 === 0)
      val base = s"${artifactBase(dir)}/spanincr"
      Dedup.spanTable(old, "doc_id", "text", base, w = 8,
        portableHash = true)
      Dedup.refreshSpans(delta, "doc_id", "text", base, w = 8,
          portableHash = true)
        .orderBy(col("doc_id"), col("span_start"))
    }),

    // Lee et al.'s actual keep-one policy: the globally first occurrence
    // (min doc·2^32+pos) of each duplicated window is the keeper; spans
    // cover only non-keeper occurrences. The election is a combinable
    // min aggregate — no per-key window, hot keys stay skew-safe.
    "x_dedup_spans_keep" -> ((s, dir) =>
      Dedup.duplicatedSpansKeepFirst(t(s, dir, "documents"), "doc_id",
          "text", w = 8, portableHash = true)
        .orderBy(col("doc_id"), col("span_start"))),

    // the cut-every-copy policy applied: spans from the operator above
    // removed from the text, verified by md5 of the rebuilt string (the
    // corpus is single-space tokenized, so split/join roundtrips byte-
    // for-byte and the oracle can rebuild the identical cleaned text)
    "x_dedup_span_cut" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val spans = Dedup.duplicatedSpans(docs, "doc_id", "text",
        w = 8, portableHash = true)
      Dedup.cutSpans(docs, spans, "doc_id", "text")
        .select(col("doc_id"), md5(col("text")).as("h"),
          size(split(col("text"), " ", -1)).cast("long").as("n_tokens"))
        .orderBy(col("doc_id"))
    }),

    // threshold 0.5 = the 16-band × 4-row banding's S-curve midpoint
    // ((1/b)^(1/r)): the regime LSH is designed for. PairCheck at sf0.1
    // measured 2/258 pairs MISSED at a 0.12 threshold (pairs at j=0.125
    // sit far below the banding knee — no parameterization catches them
    // without a candidate explosion); the exact ngram path above is the
    // honest operator for sub-knee thresholds, so the LSH gate runs at
    // its design point where recall is 1.0 at every measured scale.
    "x_dedup_minhash" -> ((s, dir) =>
      Dedup.minhashLshPairs(t(s, dir, "documents"), "doc_id", "text",
          n = 3, numHashes = 64, bands = 16, threshold = 0.5,
          maxBlock = 1000)
        .orderBy(col("id_a"), col("id_b"))),

    "x_dedup_incremental" -> ((s, dir) => {
      // append-only refresh: "yesterday's" pair artifact (existing ×
      // existing, build-once) + the delta's pairs discovered against the
      // full corpus — ZERO existing×existing re-comparison. The union
      // must equal the from-scratch all-pairs computation, which is
      // exactly what the oracle computes over the whole table. Uncapped
      // universe (maxBlock=0): per-pair jaccard is then corpus-
      // independent, which is what makes append-only refresh exact.
      val docs = t(s, dir, "documents")
      val old = docs.filter(col("doc_id") % 5 =!= 0)
      val delta = docs.filter(col("doc_id") % 5 === 0)
      val base = s"${artifactBase(dir)}/incr_old"
      // "yesterday's" state is TWO artifacts: the pair set AND the banded
      // signatures of the old corpus. The refresh then signs only the
      // delta slice — the old corpus contributes a parquet scan of its
      // signatures, not a re-run of the signature aggregation (the
      // banded artifact feeds the old pairTable build too, so a cold
      // build signs the old corpus exactly once)
      val oldBanded = Dedup.bandedTable(old, "doc_id", "text", base,
        n = 3, numHashes = 64, bands = 16)
      val oldPairs = Dedup.pairTable(old, "doc_id", "text", base,
        n = 3, numHashes = 64, bands = 16, threshold = 0.5, maxBlock = 0,
        banded = Some(oldBanded))
      Dedup.refreshPairs(docs, delta.select(col("doc_id")), oldPairs,
          "doc_id", "text", n = 3, numHashes = 64, bands = 16,
          threshold = 0.5, oldBanded = Some(oldBanded))
        .orderBy(col("id_a"), col("id_b"))
    }),

    "x_dedup_simhash" -> ((s, dir) =>
      // maxDist=3: the largest distance for which the 16-bit-chunk
      // blocking is provably exhaustive (pigeonhole: ≤3 differing bits
      // cannot touch all 4 chunks), so the pair set is exact — which is
      // what lets the oracle verify it from the signature artifact with
      // a blocking-free all-pairs Hamming scan
      Dedup.simhashPairsFromSignatures(
          Dedup.simhashTable(t(s, dir, "documents"), "doc_id", "text",
            artifactBase(dir)), maxDist = 3)
        .orderBy(col("id_a"), col("id_b"))),

    "x_dedup_cluster" -> ((s, dir) => {
      // near-dup pairs -> connected components -> canonical keeper per
      // duplicate cluster (min reachable doc_id); singletons keep selves.
      // Pairs come from the LSH scale path (candidates exact-verified, so
      // only recall could differ from the all-pairs oracle): 32 bands x 2
      // rows gives recall 1-(1-j^2)^32 ≈ 1-1e-14 at the corpus's minimum
      // in-threshold jaccard (0.8) — graft.tools.PairCheck measured ZERO
      // missed pairs vs the exact computation at sf0.01 and sf0.1.
      // The pair set is served from the on-disk pairTable artifact
      // (build-once/load-many, IvfIndex pattern): cluster resolution no
      // longer re-runs candidate generation every invocation.
      val docs = t(s, dir, "documents")
      val pairs = Dedup.pairTable(docs, "doc_id", "text",
        artifactBase(dir), n = 3, numHashes = 64, bands = 32,
        threshold = 0.5, maxBlock = 1000)
      Dedup.connectedComponents(
          docs.select(col("doc_id").as("id")), pairs.select("id_a", "id_b"))
        .orderBy(col("id"))
    }),

    "x_graph_components" -> ((s, dir) => {
      // duplicate-cluster size distribution — the inventory report a
      // dedup pass publishes (how much of the corpus is singleton vs
      // templated): component labels from the artifact-served pair
      // graph, then two label-grain aggregations (comp → size →
      // histogram). Nothing corpus-sized past the first agg.
      val docs = t(s, dir, "documents")
      val pairs = Dedup.pairTable(docs, "doc_id", "text",
        artifactBase(dir), n = 3, numHashes = 64, bands = 32,
        threshold = 0.5, maxBlock = 1000)
      Dedup.connectedComponents(
          docs.select(col("doc_id").as("id")),
          pairs.select("id_a", "id_b"))
        .groupBy(col("comp")).agg(count(lit(1)).as("sz"))
        .groupBy(col("sz")).agg(count(lit(1)).as("n_clusters"))
        .orderBy(col("sz"))
    }),

    "x_pipeline_split_leakfree" -> ((s, dir) => {
      // leakage-free held-out split: the split key is the near-dup
      // CLUSTER label, not the document — a near-duplicate pair can
      // never straddle train/heldout, which is the contamination
      // channel a doc-keyed split leaves open. Pure composition of the
      // gated cluster operator and the gated deterministic splitter:
      // one scan-stage column over the component table, zero new
      // shuffles.
      val docs = t(s, dir, "documents")
      val pairs = Dedup.pairTable(docs, "doc_id", "text",
        artifactBase(dir), n = 3, numHashes = 64, bands = 32,
        threshold = 0.5, maxBlock = 1000)
      Sampling.splitTag(
          Dedup.connectedComponents(
            docs.select(col("doc_id").as("id")),
            pairs.select("id_a", "id_b")),
          "comp", 0.2)
        .orderBy(col("id"))
    }),

    "x_pipeline_kfold" -> ((s, dir) =>
      // deterministic k-fold assignment (splitTag's cross-validation
      // generalization): fold = md5₃₂(doc) mod 5 — scan-stage, stable
      // across runs/engines/scales, rows never migrate between folds
      Sampling.foldTag(
          t(s, dir, "documents").select(col("doc_id")), "doc_id", k = 5)
        .orderBy(col("doc_id"))),

    "x_dedup_cluster_incr" -> ((s, dir) => {
      // yesterday's labels + today's delta pairs: endpoints contract to
      // their existing component labels, so the min-label iteration
      // runs over the delta graph only — old×old edges are never
      // re-walked. Same full-corpus oracle as x_dedup_cluster, because
      // incremental == from-scratch IS the operator's claim.
      val docs = t(s, dir, "documents")
      val pairs = Dedup.pairTable(docs, "doc_id", "text",
        artifactBase(dir), n = 3, numHashes = 64, bands = 32,
        threshold = 0.5, maxBlock = 1000)
      val oldPairs = pairs.filter(
        col("id_a") % 5 =!= 0 && col("id_b") % 5 =!= 0)
      val deltaPairs = pairs.filter(
        col("id_a") % 5 === 0 || col("id_b") % 5 === 0)
      // yesterday's labels are an on-disk artifact (build-once) — the
      // refresh pays the contracted delta iteration plus a label scan,
      // which is exactly what a production daily refresh pays
      val oldLabels = Dedup.labelTable(
        docs.filter(col("doc_id") % 5 =!= 0).select(col("doc_id").as("id")),
        oldPairs.select("id_a", "id_b"),
        s"${artifactBase(dir)}/ccincr_old")
      Dedup.connectedComponentsDelta(docs.select(col("doc_id").as("id")),
          oldLabels, deltaPairs.select("id_a", "id_b"))
        .orderBy(col("id"))
    }),

    "x_dedup_embedding" -> ((s, dir) =>
      Dedup.embeddingNearDupPairs(t(s, dir, "embeddings"), "vec_id",
          "embedding", "label", threshold = 0.3)
        .orderBy(col("id_a"), col("id_b"))),

    "x_dedup_semantic" -> ((s, dir) => {
      // SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup
      // with LEARNED k-means cells as the blocking structure — reusing
      // the SAME build-once IVF index the ANN gates probe (one
      // quantizer pays for search AND dedup). Within-cell cosine pairs
      // (triangle-split sub-buckets bound each task), connected
      // components over the sparse near-dup graph, keep = the
      // canonical representative (min reachable id). The oracle
      // replays pairs + components from the on-disk cells artifact.
      val emb = t(s, dir, "embeddings")
      val idx = ivfIndexFor(s, dir, emb)
      val cells = idx.cells()
        .select(col("vec_id"), col("embedding"), col("cell"))
      // 0.4 keeps the graph at duplicate-cluster density (42 comps at
      // sf0.01); 0.3 produced a single giant vaguely-similar component
      // whose diameter outran label propagation. maxIter=64 covers the
      // measured unblocked diameter (22 at sf0.1) with 3x headroom —
      // convergence exits early, non-convergence raises loudly.
      val pairs = Dedup.embeddingNearDupPairs(cells, "vec_id",
        "embedding", "cell", threshold = 0.4)
      Dedup.connectedComponents(
          cells.select(col("vec_id").as("id")),
          pairs.select(col("id_a"), col("id_b")), maxIter = 64)
        .withColumn("keep",
          (col("id") === col("comp")).cast("int"))
        .orderBy(col("id"))
    }),

    "x_pipeline_clean" -> ((s, dir) => {
      // end-to-end training-data clean-room composition: exact-dedup to
      // keepers, drop low-quality docs, account the surviving corpus per
      // language (docs + token budget). One dedup shuffle + one agg
      // shuffle; the quality filter is codegen'd expression arithmetic
      // evaluated in the scan stage.
      val sw = Seq("the", "and", "of", "a")
      val docs = t(s, dir, "documents")
      val keepers = Dedup.exact(docs, Seq("text"), Seq("doc_id"))
        .select(col("doc_id"))
      docs.join(keepers, "doc_id")
        .filter(TF.qualityScore(col("text"), sw) >= 0.5)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TF.tokenCount(col("text"))).as("n_tokens"))
        .orderBy(col("lang"))
    }),

    "x_pipeline_mix" -> ((s, dir) => {
      // the whole corpus-shaping pipeline in ONE query — exact-dedup
      // keepers → quality floor → per-language mixture rates →
      // per-language token budget → mix accounting. Each stage is the
      // already-gated operator; the claim here is that they COMPOSE
      // (content-keyed deterministic sampling, codegen'd predicates,
      // bucket-granular cuts) into a single plan with no driver
      // round-trip between stages: one dedup shuffle, scan-stage
      // filters, one budget window over the bucket table, one final agg.
      val sw = Seq("the", "and", "of", "a")
      val docs = t(s, dir, "documents")
      val keepers = Dedup.exact(docs, Seq("text"), Seq("doc_id"))
        .select(col("doc_id"))
      val clean = docs.join(keepers, "doc_id")
        .filter(TF.qualityScore(col("text"), sw) >= 0.5)
      val sampled = Sampling.stratifiedSample(clean, "doc_id", "lang",
        Map("en" -> 0.9, "zh" -> 0.5), defaultRate = 0.7)
      Sampling.sampleToTokenBudget(sampled, "doc_id", "lang",
          TF.tokenCount(col("text")).cast("long"), budget = 3000L)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TF.tokenCount(col("text"))).as("n_tokens"))
        .orderBy(col("lang"))
    }),

    "x_pipeline_sample" -> ((s, dir) => {
      // deterministic mixture sampling: per-language Bernoulli rates
      // keyed on md5(doc_id) — the SAME docs survive every run, retry,
      // and engine (rand() passes neither), which is what makes a
      // training-mix spec auditable. The predicate is a codegen'd CASE
      // chain in the scan stage: no join, no shuffle before the final
      // per-language accounting.
      val docs = t(s, dir, "documents")
      Sampling.stratifiedSample(docs, "doc_id", "lang",
          Map("en" -> 0.5, "zh" -> 0.25), defaultRate = 0.75)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TF.tokenCount(col("text"))).as("n_tokens"))
        .orderBy(col("lang"))
    }),

    "x_pipeline_token_budget" -> ((s, dir) => {
      // "<= N tokens per language" — the unit training mixes are
      // specified in. The cut is made at coordinate-BUCKET granularity
      // (first 4 md5 hex chars): token sums aggregate map-side per
      // (lang, bucket), the running total windows over a <=65536-row
      // bucket table per lang (never the corpus), and whole buckets
      // survive — deterministic, portable (the bucket key stays a hex
      // string), nested across budgets.
      val docs = t(s, dir, "documents")
      Sampling.sampleToTokenBudget(docs, "doc_id", "lang",
          TF.tokenCount(col("text")).cast("long"), budget = 5000L)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TF.tokenCount(col("text"))).as("n_tokens"))
        .orderBy(col("lang"))
    }),

    "x_pipeline_dsir" -> ((s, dir) =>
      // DSIR importance weighting (Xie et al. 2023): score every doc by
      // the hashed-unigram log-likelihood ratio against the English
      // slice — the "select pretraining data that looks like the
      // target" op. Fitting is two B-bounded combinable aggs; scoring
      // is a broadcast join of the 1024-row weight table in the scan
      // stage plus ONE per-doc sum shuffle. Weights are 6-dp-rounded
      // micro-nats (BIGINT), so doc scores are exact integer sums the
      // oracle replays hash-for-hash.
      Importance.dsirScores(t(s, dir, "documents"), "doc_id", "text",
          col("lang") === "en", 1024)
        .orderBy(col("doc_id"))),

    "x_pipeline_dsir_select" -> ((s, dir) => {
      // DSIR completed into SELECTION: importance-resample k docs
      // without replacement, inclusion ∝ exp(score) (temperature-1
      // softmax over log weights), by feeding the scores into the SAME
      // A-ES clocks as x_pipeline_weighted — the whole selection stays
      // one TakeOrdered over the scored stream, no sort, no shuffle
      // beyond the scoring aggregate's own.
      val scores = Importance.dsirScores(t(s, dir, "documents"),
        "doc_id", "text", col("lang") === "en", 1024)
      Sampling.weightedSample(scores, "doc_id",
          exp(col("score_micro").cast("double") / 1e6d), 50)
        .orderBy(col("doc_id"))
    }),

    "x_pipeline_pack" -> ((s, dir) =>
      // concat-and-slice packing plan (GPT-style pretraining layout):
      // global token offsets + context-window ids per doc in the
      // samplers' deterministic (md5 coordinate, id) order. The global
      // running total is two-level (bucket bases over a <=65536-row
      // window, then within-bucket) — never a corpus-sized sort.
      Sampling.packOffsets(t(s, dir, "documents"), "doc_id",
          size(split(col("text"), " ", -1)), windowTokens = 2048L)
        .orderBy(col("doc_id"))),

    "x_pipeline_sample_k" -> ((s, dir) =>
      // exactly-k mixture sampling (the "give me exactly 100k docs"
      // op): k smallest md5 coordinates, ties by key — unique result,
      // nested across k. TakeOrderedAndProject, not a global sort.
      Sampling.exactSample(t(s, dir, "documents"), "doc_id", 100)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))),

    "x_pipeline_split" -> ((s, dir) =>
      // deterministic train/held-out split: both sides from the SAME
      // md5 coordinate as every sampler (heldout ≡ sample at the
      // rate), exact partition of the corpus, assignment stable across
      // runs/engines — the anti-leakage property. Scan-stage CASE.
      Sampling.splitTag(t(s, dir, "documents"), "doc_id", 0.1)
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TF.tokenCount(col("text"))).as("n_tokens"))
        .orderBy(col("lang"), col("split"))),

    "x_pipeline_weighted" -> ((s, dir) =>
      // weighted exactly-k sampling without replacement (Efraimidis–
      // Spirakis A-ES): inclusion probability proportional to document
      // token count — "prefer substantial documents, keep the tail
      // reachable", the soft alternative to a hard quality floor. The
      // exponential clock -ln(u)/w is a pure function of (doc_id,
      // weight), so the sample is retry-stable and nested across k;
      // physically a TakeOrdered, no global sort. Oracle re-derives
      // the clocks from md5 in SQL (hex -> int is 8 strpos terms).
      Sampling.weightedSample(t(s, dir, "documents"), "doc_id",
          TF.tokenCount(col("text")).cast("double"), 100)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))),

    "x_pipeline_weighted_cap" -> ((s, dir) =>
      // per-language weighted cap: at most 20 docs per lang, chosen by
      // the same A-ES clocks — "keep <=N docs per source, preferring
      // the substantial ones". k-bounded GroupTopK shuffle (at most k
      // entries per (lang, map task)), never the dominant language's
      // rows; a window formulation would sort the whole stratum.
      Sampling.weightedCapPerGroup(t(s, dir, "documents"), "doc_id",
          "lang", TF.tokenCount(col("text")).cast("double"), 20)
        .orderBy(col("lang"), col("doc_id"))),

    "x_pipeline_canonical" -> ((s, dir) => {
      // dedup that keeps the BEST document per near-dup cluster, not
      // the lowest id: cluster membership (artifact-served pairs, same
      // config as x_dedup_cluster) joins the quality score, and the
      // keeper is argmax(quality, ties -> smallest id) via a
      // max(struct) aggregate — map-side partial, one shuffle on comp,
      // no window over the membership table.
      val sw = Seq("the", "and", "of", "a")
      val docs = t(s, dir, "documents")
      val pairs = Dedup.pairTable(docs, "doc_id", "text",
        artifactBase(dir), n = 3, numHashes = 64, bands = 32,
        threshold = 0.5, maxBlock = 1000)
      val comps = Dedup.connectedComponents(
        docs.select(col("doc_id").as("id")), pairs.select("id_a", "id_b"))
      val scored = docs.select(col("doc_id").as("id"),
        TF.qualityScore(col("text"), sw).as("q"))
      comps.join(scored, "id")
        .groupBy(col("comp"))
        .agg(max(struct(col("q"), (-col("id")).as("_nid"))).as("_m"),
          count(lit(1)).as("n_docs"))
        .select(col("comp"), (-col("_m._nid")).as("keeper"),
          col("_m.q").as("quality"), col("n_docs"))
        .orderBy(col("comp"))
    }),

    "x_pipeline_source_cap" -> ((s, dir) =>
      // per-source document cap ("at most N docs per domain"): the k
      // smallest md5 coordinates within each source survive — the
      // C4/RefinedWeb-style guard against any one origin dominating the
      // mix. Ranked through the k-bounded GroupTopK aggregator (shuffle
      // carries <= k entries per source per map task), NOT a window —
      // the hot-domain case is exactly where a per-group sort dies at
      // 100x.
      Sampling.capPerGroup(t(s, dir, "documents"), "doc_id", "source",
          k = 10)
        .orderBy(col("source"), col("doc_id"))),

    "x_pipeline_curriculum" -> ((s, dir) =>
      // training-order construction: short-first curriculum rank within
      // each source, sources interleaved round-robin by the arithmetic
      // order key — no global window (the global rank is the
      // range-partitioned dense id; the rebase is a G-row agg).
      Curriculum.interleave(
          t(s, dir, "documents").select(col("doc_id"), col("source"),
            col("n_chars")),
          "doc_id", "source", Seq(col("n_chars").asc))
        .select(col("doc_id"), col("source"), col("rank"),
          col("order_key"))
        .orderBy(col("order_key"), col("doc_id"))),

    "x_pipeline_epochs" -> ((s, dir) =>
      // multi-epoch training order: 3 distinct deterministic
      // permutations of the corpus (portable md5("e:id") sort key per
      // epoch), concatenated epoch-major by ONE range-partitioned
      // dense-id pass — no per-epoch loop, no global window.
      Curriculum.epochShuffleOrder(
          t(s, dir, "documents").select(col("doc_id")), "doc_id",
          epochs = 3)
        .orderBy(col("pos"))),

    "x_pipeline_shards" -> ((s, dir) => {
      // balanced output sharding: docs ranked by token count (desc,
      // doc_id tiebreak) and dealt SERPENTINE across 8 shards — the
      // boustrophedon deal keeps shard token totals within one max-doc
      // of each other with zero driver-side packing (the greedy-LPT
      // heuristic in a fixed, replayable deal order). The global rank
      // is Ids.withDenseId (range-partitioned dense id — never a
      // single-partition window); everything after is row-local
      // arithmetic plus one 8-row aggregate.
      val docs = t(s, dir, "documents")
        .select(col("doc_id"),
          TF.tokenCount(col("text")).cast("long").as("n_tokens"))
      Ids.withDenseId(docs, "rank",
          Seq(col("n_tokens").desc, col("doc_id")))
        .withColumn("_pass", expr("(rank - 1) DIV 8"))
        .withColumn("_idx", pmod(col("rank") - 1, lit(8)))
        .withColumn("shard",
          when(pmod(col("_pass"), lit(2)) === 0, col("_idx"))
            .otherwise(lit(7) - col("_idx")))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("shard_tokens"))
        .orderBy(col("shard"))
    }),

    "x_pipeline_temperature" -> ((s, dir) =>
      // temperature-flattened source mixture (α=1/2): per-source keep
      // rates from quantized √n shares — tail sources upsampled toward
      // n^α/Σn^α, head capped at 1. One tiny count agg broadcast back;
      // the keep decision is the md5 coordinate against a per-source
      // threshold derived from exact integer ratios, so the oracle
      // replays the rate arithmetic digit-for-digit.
      Sampling.temperatureMixture(
          t(s, dir, "documents").select(col("doc_id"), col("source")),
          "doc_id", "source", budget = 120L)
        .orderBy(col("doc_id"))),

    "x_pipeline_decontam" -> ((s, dir) => {
      // benchmark decontamination: training docs sharing >= 2 distinct
      // trigram shingles with the "eval set" (every 50th doc) are
      // flagged with their overlap count. Both shingle sets derive
      // map-side; the eval universe is small, so the semi-join
      // broadcasts — shuffle is proportional to contaminated docs.
      val docs = t(s, dir, "documents")
      Dedup.contaminationCounts(
          docs.filter(col("doc_id") % 50 =!= 0),
          docs.filter(col("doc_id") % 50 === 0),
          "doc_id", "text", n = 3, minShared = 2)
        .orderBy(col("doc_id"))
    }),

    "x_pipeline_decontam_bloom" -> ((s, dir) => {
      // decontamination at the too-big-to-broadcast posture: the eval
      // universe ships as a ~1%-fpp Bloom filter (one binary literal
      // inside Spark's codegen'd might_contain), the exact semi-join
      // runs only over Bloom survivors — shuffle ∝ contamination, not
      // corpus. False positives can't reach the output; same oracle as
      // x_pipeline_decontam, row-for-row.
      val docs = t(s, dir, "documents")
      Dedup.contaminationCountsBloom(
          docs.filter(col("doc_id") % 50 =!= 0),
          docs.filter(col("doc_id") % 50 === 0),
          "doc_id", "text", n = 3, minShared = 2)
        .orderBy(col("doc_id"))
    }),

    "x_events_session_conversion" -> ((s, dir) =>
      // session-grain conversion: gap-merged sessions (the same
      // session_window code path as the sessionize gates) reduced to a
      // per-session converted flag IN the session aggregate (one
      // shuffle keyed on (window, user)), then rolled up to day grain.
      // The ratio divides two exact longs — deterministic double.
      t(s, dir, "events")
        .groupBy(session_window(col("ts"), "10 minutes").as("sess"),
          col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1).otherwise(0))
          .as("_conv"))
        .select(to_date(col("sess.start")).as("day"), col("_conv"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("_conv")).cast("long").as("n_converting"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("n_sessions"), col("n_converting"),
          round(col("n_converting") / col("n_sessions"), 6)
            .as("conversion_rate"))
        .orderBy(col("day"))),

    "x_clean_robust_z" -> ((s, dir) => {
      // robust outlier flagging (median/MAD — immune to the outliers it
      // hunts, unlike the z-score a24 uses): per type, med and MAD via
      // exact sort-based percentile over BOUNDED type-grain groups
      // (a31's caveat applies — the unbounded path is a22's
      // histogram-guided selection), flag 0.6745·|v−med|/MAD > 3.5.
      // p=0.5 only yields exact elements or dyadic midpoints, so med,
      // MAD, and every flag are engine-deterministic.
      val ev = t(s, dir, "events").select(col("event_type"), col("value"))
      val med = ev.groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.5)").as("med"))
      val d = ev.join(med, "event_type")
        .withColumn("ad", abs(col("value") - col("med")))
      val mad = d.groupBy(col("event_type"))
        .agg(expr("percentile(ad, 0.5)").as("mad"))
      d.join(mad, "event_type")
        .groupBy(col("event_type"))
        .agg(round(max(col("med")), 6).as("med"),
          round(max(col("mad")), 6).as("mad"),
          sum(when(lit(0.6745) * col("ad") / col("mad") > lit(3.5), 1L)
            .otherwise(0L)).as("n_outliers"))
        .orderBy(col("event_type"))
    }),

    "x_clean_winsorize" -> ((s, dir) => {
      // measure cleaning: per event type, clamp value into its
      // [p05, p95] band before aggregation — outlier damping without
      // dropping rows. Percentile bounds come from the exact-dyadic
      // 256-bucket histogram (the x_stream_quantiles grid, width 2.0),
      // so bounds and clamps are deterministic doubles on any engine;
      // the winsorized mean aggregates as DECIMAL (exact,
      // order-independent). The rank window runs over ≤256 bucket rows
      // per type, never the fact table.
      val ev = t(s, dir, "events").select(col("event_type"), col("value"))
      val bkt = least(greatest(floor(col("value") / 2.0).cast("int"),
        lit(0)), lit(255))
      val hist = ev.groupBy(col("event_type"), bkt.as("b"))
        .agg(count(lit(1)).as("c"))
      val n = hist.groupBy(col("event_type")).agg(sum(col("c")).as("n"))
      val wcum = Window.partitionBy(col("event_type")).orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist.withColumn("cum", sum(col("c")).over(wcum))
        .join(n, "event_type")
      def rank(q: Double) =
        least(col("n"), greatest(lit(1L),
          ceil(lit(q) * col("n")).cast("long")))
      val bounds = cum.groupBy(col("event_type")).agg(
          min(when(col("cum") >= rank(0.05), col("b"))).as("_b05"),
          min(when(col("cum") >= rank(0.95), col("b"))).as("_b95"))
        .select(col("event_type"),
          ((col("_b05") + 0.5) * 2.0).as("lo"),
          ((col("_b95") + 0.5) * 2.0).as("hi"))
      ev.join(broadcast(bounds), "event_type")
        .groupBy(col("event_type"))
        .agg(first(col("lo")).as("lo"), first(col("hi")).as("hi"),
          sum(when(col("value") < col("lo"), 1L).otherwise(0L))
            .as("n_low"),
          sum(when(col("value") > col("hi"), 1L).otherwise(0L))
            .as("n_high"),
          sum(least(greatest(col("value"), col("lo")), col("hi"))
            .cast("decimal(18,4)")).as("_sw"),
          count(lit(1)).as("_n"))
        .select(col("event_type"), col("lo"), col("hi"), col("n_low"),
          col("n_high"),
          round(col("_sw").cast("double") / col("_n"), 6)
            .as("mean_winsorized"))
        .orderBy(col("event_type"))
    }),

    "x_ts_trending" -> ((s, dir) => {
      // daily trending top-3 event types: day-grain counts (one keyed
      // agg), then the k-bounded GroupTopK aggregate per day — a map
      // task ships ≤3 entries per day regardless of type cardinality,
      // never a window over the daily×type table. Ties break lexically
      // via the negated dictionary id (score desc, id desc ⇒ smallest
      // type index). The tiny rank window runs over ≤3 rows per day.
      val daily = t(s, dir, "events")
        .select(to_date(col("ts")).as("day"), col("event_type"))
        .groupBy(col("day"), col("event_type")).agg(count(lit(1)).as("n"))
      // BOUNDED GLOBAL WINDOW (r22, VERDICT r21 #4): the row_number
      // dictionary runs over DISTINCT event_type — a bounded enum
      // (the schema's event vocabulary), not a data-sized frame; at
      // any corpus scale this is a handful of rows on one partition,
      // and the frame arrives pre-shrunk by the distinct aggregate.
      val types = daily.select(col("event_type")).distinct()
        .withColumn("_tid", row_number()
          .over(Window.orderBy(col("event_type"))).cast("long"))
      val top = GroupTopK.topKPerGroup(
        daily.join(broadcast(types), "event_type")
          .select(col("day"), col("n").cast("double").as("_score"),
            (-col("_tid")).as("_nid")),
        Seq("day"), "_score", "_nid", 3)
      val w2 = Window.partitionBy(col("day"))
        .orderBy(col("_score").desc, col("_nid").desc)
      top.withColumn("rnk", row_number().over(w2))
        .join(broadcast(types.withColumn("_nid", -col("_tid"))), "_nid")
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("rnk"), col("event_type"), col("_score").cast("long").as("n"))
        .orderBy(col("day"), col("rnk"))
    }),

    "x_stream_enrich" -> ((s, dir) => {
      // streaming dimension enrichment: the event stream joins a
      // broadcast slowly-changing dim reduced to latest-version-per-key
      // (EventStreams.enrichLatest — zero added stage boundaries on the
      // stream side); revenue = value × multiplier, types absent from
      // the dim fall back to 1.0. The oracle replays the same literal
      // dim, latest-version reduction, and decimal-exact aggregation.
      val st = Tables.stream(s, dir, "events",
        "event_id", "event_type", "value")
      import s.implicits._
      val dim = Seq(
        ("view", 1L, 0.5), ("view", 2L, 1.5),
        ("click", 1L, 2.0),
        ("purchase", 3L, 3.0), ("purchase", 1L, 9.9))
        .toDF("event_type", "ver", "mult")
      val sink = s"x_stream_enrich_${streamSinkId.incrementAndGet()}"
      val q = graft.streaming.EventStreams
        .enrichLatest(st, dim, Seq("event_type"), versionTs = Some("ver"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      if (!q.awaitTermination(300000L)) {
        q.stop()
        throw new IllegalStateException(
          "x_stream_enrich: stream did not drain within 300s")
      }
      s.table(sink)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum((col("value") * coalesce(col("mult"), lit(1.0)))
            .cast("decimal(18,4)")).as("_rev"))
        .select(col("event_type"), col("n_events"),
          round(col("_rev").cast("double"), 6).as("revenue"))
        .orderBy(col("event_type"))
    }),

    "x_stream_quantiles" -> ((s, dir) => {
      // REAL streaming quantile estimation: per event type, a fixed
      // 256-bucket histogram sketch (bounded mergeable state) carried
      // in flatMapGroupsWithState; each batch emits current estimates
      // stamped with the rows-seen count, and the keep-last
      // finalization (max processed per key — batch-split-invariant)
      // is a stateless aggregation of the sink. Grid [0,512)×256 →
      // width 2.0, so every bucket edge and midpoint is an exact
      // double; the oracle recomputes the full histogram in SQL.
      val st = Tables.stream(s, dir, "events", "event_type", "value")
      val sink = s"x_stream_quantiles_${streamSinkId.incrementAndGet()}"
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      val q = try {
        graft.streaming.EventStreams.quantileStream(st,
            "event_type", "value", lo = 0.0, hi = 512.0, buckets = 256,
            qs = Seq(0.5, 0.9, 0.99))
          .writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      if (!q.awaitTermination(300000L)) {
        q.stop()
        throw new IllegalStateException(
          "x_stream_quantiles: stream did not drain within 300s")
      }
      val w = Window.partitionBy(col("key"), col("q"))
        .orderBy(col("processed").desc)
      s.table(sink)
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
        .select(col("key").as("event_type"), col("q"),
          round(col("est"), 6).as("est"))
        .orderBy(col("event_type"), col("q"))
    }),

    "x_stream_ingest_e2e" -> ((s, dir) => {
      // EP1 under redelivery as ONE oracle row: file A + a converted_
      // trap + a poison file drain through Watch (AvailableNow), every
      // drain restarts from a FRESH checkpoint (the streaming analog of
      // SQS redelivering every notification), an update file C lands
      // between drains, and the completion callback (ST5) exports the
      // report the output re-reads from CSV. The oracle computes the
      // single-delivery answer straight from nation — duplicate merges,
      // lost suppression, a leaked trap row, or a mis-aggregated report
      // all hash-mismatch. See graft.pipeline.IngestE2E.
      //
      // BUDGET ATTRIBUTION (the stderr [load]/[report]/[ingest_e2e]
      // lines, VERDICT r14 #5): drain 1 owns most of the gate — cold
      // scan+reconcile (s2 ~2 s per file) plus the first merge
      // (s3 ~3 s); drains 2-3 are the remaining merge + the
      // checkRemaining/report jobs. The audit window/quarantine
      // probes, once 0.2-0.4 s of Spark-job overhead EACH, are now
      // 0-5 ms: AuditLog memoizes rows per write-once part file, so a
      // probe is a listing plus an in-memory scan (one batched read
      // per NEW file). The floor is three-drain-shaped, not
      // data-shaped: it moves with streaming-stack startup cost,
      // never with SF.
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      try graft.pipeline.IngestE2E.run(s, dir,
        s"${artifactBase(dir)}/ingest_e2e")
      finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    }),

    "x_stream_ingest_e2e_mv" -> ((s, dir) => {
      // THE E2E SCENARIO ON THE INCREMENTAL REPORT PATH (VERDICT r15
      // #6): identical waves, drains, traps, and oracle as
      // x_stream_ingest_e2e, but every load appends its group-grain
      // delta under the load's (file, seq) token and each drain's
      // report export serves from that state instead of rescanning
      // the permanent table ([report_delta]/[report] stderr lines
      // attribute the cost). The two report modes are byte-identical
      // by construction (the state path reproduces avg(VALUE)'s
      // decimal expression tree), so any divergence — a missed
      // retraction, a double-applied redelivery delta — hash-
      // mismatches against the same single-delivery oracle. Separate
      // gate rather than a flag-flip on the flagship so each keeps its
      // own floor.
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      try graft.pipeline.IngestE2E.run(s, dir,
        s"${artifactBase(dir)}/ingest_e2e_mv", incrementalReport = true)
      finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    }),

    "x_stream_sample" -> ((s, dir) => {
      // REAL streaming exactly-k sampling: bottom-k of the samplers'
      // md5 coordinate held in distributed bucket state (8×k entries,
      // never corpus-sized); keep-last per bucket + a global bottom-k
      // finalize. Deterministic and arrival-order-independent by
      // construction, so streaming == batch exactSample row-for-row —
      // the oracle is x_pipeline_sample_k's SQL verbatim.
      val st = Tables.stream(s, dir, "documents", "doc_id")
      val sink = s"x_stream_sample_${streamSinkId.incrementAndGet()}"
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      val q = try {
        graft.streaming.EventStreams.sampleKStream(st, "doc_id", k = 100)
          .writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      if (!q.awaitTermination(300000L)) {
        q.stop()
        throw new IllegalStateException(
          "x_stream_sample: stream did not drain within 300s")
      }
      val perBucket = Window.partitionBy(col("bucket"))
      s.table(sink)
        .withColumn("_maxp", max(col("processed")).over(perBucket))
        .filter(col("processed") === col("_maxp"))
        .orderBy(col("hex"), col("key")).limit(100)
        .select(col("key").as("doc_id"))
        .join(t(s, dir, "documents").select(col("doc_id"), col("lang")),
          Seq("doc_id"))
        .orderBy(col("doc_id"))
    }),

    "x_stream_trending" -> ((s, dir) => {
      // REAL streaming daily trending top-k (the streaming form of
      // x_ts_trending): per day, the 3 most frequent event types so
      // far — one count map per day as flatMapGroupsWithState state,
      // bounded by the type vocabulary; every batch emits the current
      // ranking stamped with rows-seen, and the keep-last finalization
      // (max processed per (day, rank)) is batch-split-invariant, so
      // streaming == batch ranking is what the oracle checks.
      val st = Tables.eventsStream(s, dir, "event_type STRING")
        .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
          col("event_type"))
      val sink = s"x_stream_trending_${streamSinkId.incrementAndGet()}"
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      val q = try {
        graft.streaming.EventStreams.topKStream(st, "day", "event_type",
            k = 3)
          .writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      if (!q.awaitTermination(300000L)) {
        q.stop()
        throw new IllegalStateException(
          "x_stream_trending: stream did not drain within 300s")
      }
      val w = Window.partitionBy(col("key"), col("rank"))
        .orderBy(col("processed").desc)
      s.table(sink)
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
        .select(col("key").as("day"), col("rank").as("rnk"),
          col("value").as("event_type"), col("n"))
        .orderBy(col("day"), col("rnk"))
    }),

    "x_stream_psi" -> ((s, dir) => {
      // REAL streaming drift monitor: the live half of the event log
      // (odd user_ids) replays as a file stream and keeps ONE bounded
      // bucket histogram per day in flatMapGroupsWithState state
      // (histogramStream — O(buckets) per key, O(1) per row); the
      // even-user_id half is the static reference snapshot. The
      // keep-last finalization (each day's final emitted histogram —
      // batch-split-invariant) feeds the SAME Laplace-smoothed PSI
      // arithmetic Profile.psi applies batch-side, so the oracle
      // replays stream==batch drift digit-for-digit. At 100 TB the
      // state is days×buckets longs and the reference ships as a
      // 10-row broadcast — nothing scales with the stream.
      val buckets = 10
      // bucket expr clamps BOTH ends (greatest(..,0)): a negative value
      // lands in bucket 0 on the engine AND oracle side instead of the
      // stream failing loudly while the oracle silently kept the row —
      // malformed data now degrades identically in both engines.
      def bucketOf(c: org.apache.spark.sql.Column) =
        greatest(least(floor(c / 50), lit(9L)), lit(0L)).cast("int")
      // the reference histogram is ≤ `buckets` rows — collect it to a
      // literal frame instead of persist(): no cached blocks to leak
      // across Bench entries, and nRef comes from the same single pass
      val refRows = t(s, dir, "events").filter(col("user_id") % 2 === 0)
        .select(bucketOf(col("value")).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n_ref"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
      val nRef = refRows.map(_._2).sum
      val ref = {
        import s.implicits._
        refRows.toDF("bucket", "n_ref")
      }
      val st = Tables.eventsStream(s, dir, "value DOUBLE")
        .filter(col("user_id") % 2 =!= 0)
        .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
          bucketOf(col("value")).as("bucket"))
      val sink = s"x_stream_psi_${streamSinkId.incrementAndGet()}"
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      val q = try {
        graft.streaming.EventStreams
          .histogramStream(st, "day", "bucket", buckets)
          .writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      if (!q.awaitTermination(300000L)) {
        q.stop()
        throw new IllegalStateException(
          "x_stream_psi: stream did not drain within 300s")
      }
      val wd = Window.partitionBy(col("key"))
      val last = s.table(sink)
        .withColumn("_mx", max(col("processed")).over(wd))
        .filter(col("processed") === col("_mx"))
        .select(col("key").as("day"), col("bucket"), col("n"),
          col("processed").as("n_day"))
      last.join(broadcast(ref), Seq("bucket"), "left")
        .na.fill(0L, Seq("n_ref"))
        .withColumn("_p", (col("n") + 1).cast("double") /
          (col("n_day") + buckets).cast("double"))
        .withColumn("_q", (col("n_ref") + 1).cast("double") /
          lit((nRef + buckets).toDouble))
        .withColumn("psi", round((col("_p") - col("_q"))
          * log(col("_p") / col("_q")), 6))
        .select(col("day"), col("bucket"), col("n"), col("n_ref"),
          col("psi"))
        .orderBy(col("day"), col("bucket"))
    }),

    "x_stream_decontam" -> ((s, dir) => {
      // REAL streaming decontamination: training docs replay as a file
      // stream, the static eval set ships as a Bloom prefilter + exact
      // stream-static semi-join, and each contaminated doc emits once
      // via flatMapGroupsWithState. Same oracle as x_pipeline_decontam
      // — ingest-time streaming hygiene == batch sweep is the claim.
      val docs = t(s, dir, "documents")
      val st = Tables.stream(s, dir, "documents", "doc_id", "text")
        .filter(col("doc_id") % 50 =!= 0)
      val sink = s"x_stream_decontam_${streamSinkId.incrementAndGet()}"
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      val q = try {
        Dedup.decontaminateStream(st,
            docs.filter(col("doc_id") % 50 === 0),
            "doc_id", "text", n = 3, minShared = 2)
          .writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      if (!q.awaitTermination(300000L)) {
        q.stop()
        throw new IllegalStateException(
          "x_stream_decontam: stream did not drain within 300s")
      }
      s.table(sink).orderBy(col("doc_id"))
    }),

    "x_layout_zorder" -> ((s, dir) =>
      // Morton-curve clustering key for multi-column file skipping: the
      // write path (Layout.writeZOrdered) range-partitions + sorts on
      // this value so every file owns a tile of the (doc_id, n_chars)
      // plane — predicates on EITHER column prune files (LayoutSpec
      // measures: y-only box reads <=8/16 z-ordered files vs 16/16
      // x-sorted). The gate checks the key itself: pure codegen'd bit
      // arithmetic, replayed by the oracle with the same shift terms.
      t(s, dir, "documents")
        .select(col("doc_id"),
          Layout.zValue(col("doc_id"), col("n_chars"), bits = 16)
            .as("zval"))
        .orderBy(col("doc_id"))),

    "x_layout_hilbert" -> ((s, dir) =>
      // Hilbert-curve clustering key — better locality than Morton
      // (every curve step is a plane step, no seam jumps), computed by
      // one native codegen expression: the per-bit state recurrence
      // would grow 3^bits expression nodes if composed from built-ins.
      // Pure integer arithmetic: the oracle replays the identical
      // per-level walk as an unrolled CTE chain.
      t(s, dir, "documents")
        .select(col("doc_id"),
          Layout.hilbertValue(col("doc_id"), col("n_chars"), bits = 16)
            .as("hval"))
        .orderBy(col("doc_id"))),

    // ── LLM-pipeline extensions: text analysis ──────────────────────
    "x_text_stats" -> ((s, dir) => {
      val sw = Seq("the", "and", "of", "a")
      t(s, dir, "documents").select(col("doc_id"),
          TF.tokenCount(col("text")).as("n_tokens"),
          length(col("text")).as("n_chars"),
          round(TF.punctRatio(col("text")), 6).as("punct_ratio"),
          round(TF.stopwordRatio(col("text"), sw), 6).as("stop_ratio"),
          TF.qualityScore(col("text"), sw).as("quality"))
        .orderBy(col("doc_id"))
    }),

    "x_text_gopher" -> ((s, dir) => {
      // Gopher quality rules (Rae et al. 2021 A1.1) as scan-stage
      // exact-integer flags — the rule-based corpus filter every
      // large-scale text pipeline runs before model-based scoring.
      // No shuffle: per-doc expression arithmetic, flags + composite
      // keep; the filter composition is `WHERE keep = 1`.
      t(s, dir, "documents")
        .withColumn("_g",
          TF.gopherFlags(col("text"), Seq("the", "and", "of", "a")))
        .select(col("doc_id"), col("_g.*"))
        .orderBy(col("doc_id"))
    }),

    "x_text_c4" -> ((s, dir) => {
      // C4 cleaning rules (Raffel et al. 2020 §2.2): line-level
      // terminal-punctuation / min-words / "javascript" retention plus
      // page-level sentence-count, banned-phrase, curly-brace and
      // blocklist rules. The synthetic corpus has no line structure,
      // so the gate derives it DETERMINISTICALLY first (token "line"
      // becomes a sentence break, "spark"→"javascript",
      // "vector"→"lorem ipsum", "hash"→"{hash}" plant rule trips) —
      // the oracle performs the identical derivation, and the operator
      // itself runs on genuinely multi-line punctuated text. All
      // row-local scan-stage expressions, zero shuffles; clean_md5
      // fingerprints the retained-line output byte-for-byte.
      val t2 = replace(replace(replace(replace(col("text"),
        lit(" line "), lit(".\n")),
        lit(" spark "), lit(" javascript ")),
        lit(" vector "), lit(" lorem ipsum ")),
        lit(" hash "), lit(" {hash} "))
      t(s, dir, "documents")
        .withColumn("_c", TF.c4Flags(t2, Seq("customer"), Seq("lorem ipsum")))
        .select(col("doc_id"), col("_c.*"))
        .orderBy(col("doc_id"))
    }),

    "x_quality_logreg" -> ((s, dir) => {
      // model-based quality filtering: a logistic scorer TRAINED inside
      // the engine (3 rounds of full-batch GD, QualityModel) on heuristic
      // labels — the fastText/CCNet-style classifier stage that follows
      // rule filters in published LLM pipelines. Features ship as exact
      // integer-ppm values (bigint DIV — no float-rounding seam) and
      // every gradient term is an exact decimal(20,12), so the oracle
      // can RETRAIN all 3 unrolled iterations and land digit-for-digit.
      // Per iteration: ONE combinable 4-sum aggregate; driver state =
      // the 4 weights; scoring = scan-stage expression, zero shuffles.
      val toks = split(col("text"), " ", -1)
      val padded = concat(lit(" "), col("text"), lit(" "))
      val hits = Seq("the", "and", "of", "a")
        .map(wd => TF.occurrences(padded, s" $wd ").cast("bigint"))
        .reduce(_ + _)
      val sh3 = when(size(toks) >= 3,
        transform(sequence(lit(1), size(toks) - 2),
          i => concat_ws(" ", slice(toks, i, lit(3)))))
        .otherwise(array().cast("array<string>"))
      val ppm = t(s, dir, "documents").select(col("doc_id"),
        (least(length(col("text")), lit(500)).cast("bigint") * 2000)
          .as("p1"),
        hits.as("hits"), size(toks).cast("bigint").as("toks"),
        size(array_distinct(sh3)).cast("bigint").as("d3"),
        greatest(size(toks) - 2, lit(0)).cast("bigint").as("t3"),
        when(length(col("text")) >= 300, lit(1.0)).otherwise(lit(0.0))
          .as("y"))
      val feats = ppm.select(col("doc_id"),
          (col("p1").cast("double") / lit(1000000.0)).as("x1"),
          (expr("hits * 1000000 div toks").cast("double")
            / lit(1000000.0)).as("x2"),
          (when(col("t3") > 0,
            lit(1000000L) - expr("d3 * 1000000 div t3")).otherwise(0L)
            .cast("double") / lit(1000000.0)).as("x3"),
          col("y"))
        .persist()
      val xs = Seq("x1", "x2", "x3")
      val w = QualityModel.trainLogistic(feats, xs, "y",
        iters = 3, lr = 0.5)
      // the persist only has to span training's 3 GD passes; dropping
      // it here means the one scoring pass below recomputes the feature
      // scan once, and no cached blocks outlive this entry
      feats.unpersist()
      feats.select(col("doc_id"),
          QualityModel.prob6(xs.map(col), w).as("score"))
        .withColumn("keep", (col("score") >= 0.5).cast("int"))
        .orderBy(col("doc_id"))
    }),

    "x_text_langid" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("lang"), TF.langId(col("text")).as("pred"))
        .groupBy(col("lang"), col("pred")).agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("pred"))
    }),

    "x_text_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), TF.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    }),

    "x_text_tokens" -> ((s, dir) => {
      // token budgets: whitespace count, GPT-2-style pre-tokenizer
      // count, plus the order-sensitive Rabin–Karp stream hash
      t(s, dir, "documents")
        .select(col("doc_id"),
          TF.tokenCount(col("text")).as("ws_tokens"),
          TF.bpeTokenCount(col("text")).as("bpe_tokens"),
          TF.rollingHash(col("text")).as("rhash"))
        .orderBy(col("doc_id"))
    }),

    "x_text_chunks" -> ((s, dir) => {
      // context-prep chunking: 64-token chunks, 16-token overlap —
      // row-local transform + explode, verified chunk-for-chunk by md5
      // of the reassembled text
      tsp(s, dir, "documents")
        .select(col("doc_id"),
          explode(TF.chunks(col("text"), chunkTokens = 64, overlap = 16))
            .as("c"))
        .select(col("doc_id"), col("c.idx").as("chunk_idx"),
          col("c.start").as("start"), col("c.n_tokens").as("n_tokens"),
          md5(col("c.chunk")).as("h"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    "x_text_chunks_cdc" -> ((s, dir) =>
      // content-defined chunking: boundaries where the md5 of the
      // 4-token local context ≡ 0 mod 16 (~16-token expected chunks),
      // so an edit re-chunks only its neighborhood — the dedup-robust
      // sibling of the fixed-window x_text_chunks (whose boundaries
      // all shift after any insertion). Row-local scan work; chunk
      // identity = md5 of the chunk text, ready for exact-dedup.
      tsp(s, dir, "documents")
        .select(col("doc_id"), posexplode(
          TF.contentChunks(col("text"), window = 4, divisor = 16)))
        .select(col("doc_id"), (col("pos") + 1).as("chunk_idx"),
          col("col.start").as("start"),
          col("col.n_tokens").as("n_tokens"),
          md5(col("col.chunk")).as("h"))
        .orderBy(col("doc_id"), col("chunk_idx"))),

    "x_text_chunks_gear" -> ((s, dir) =>
      // gear-hash CDC: same boundary contract as x_text_chunks_cdc
      // (edit-local, ~w·divisor expected chunk length) but the hot
      // loop hashes each TOKEN once and rolls an exact integer window
      // sum — integer adds instead of per-window md5 (the cdc gate's
      // measured floor). Chunk identity stays md5-of-chunk-text.
      tsp(s, dir, "documents")
        .select(col("doc_id"), posexplode(
          TF.gearChunks(col("text"), window = 4, divisor = 16)))
        .select(col("doc_id"), (col("pos") + 1).as("chunk_idx"),
          col("col.start").as("start"),
          col("col.n_tokens").as("n_tokens"),
          md5(col("col.chunk")).as("h"))
        .orderBy(col("doc_id"), col("chunk_idx"))),

    "x_text_oov" -> ((s, dir) => {
      // tokenizer-coverage report: per-language out-of-vocabulary
      // token rate against the corpus's own top-1000 vocabulary — the
      // "how much of each slice does this vocab actually cover" check
      // run before committing to a tokenizer. Aggregate-first: the
      // corpus-sized explode collapses to (lang, term) counts in ONE
      // map-side-combinable shuffle; the vocab is a TakeOrdered over
      // the term-grain rollup and broadcasts back; the OOV rollup is
      // vocab-grain. Nothing corpus-sized past the first aggregate.
      val tf2 = t(s, dir, "documents")
        .select(col("lang"), explode(TF.tokens(col("text"))).as("term"))
        .groupBy(col("lang"), col("term")).agg(count(lit(1)).as("n"))
      val vocab = tf2.groupBy(col("term")).agg(sum(col("n")).as("nn"))
        .orderBy(col("nn").desc, col("term")).limit(1000)
        .select(col("term"), lit(1).as("_inv"))
      tf2.join(broadcast(vocab), Seq("term"), "left")
        .groupBy(col("lang"))
        .agg(sum(col("n")).as("n_tokens"),
          sum(when(col("_inv").isNull, col("n")).otherwise(0L))
            .as("n_oov"))
        .withColumn("oov_rate",
          round(col("n_oov") / col("n_tokens"), 6))
        .orderBy(col("lang"))
    }),

    "x_text_source_overlap" -> ((s, dir) => {
      // corpus redundancy map: pairwise Jaccard overlap of source
      // vocabularies — the "are two crawls/dumps the same material"
      // diagnostic run before mixing sources into a training set.
      // Aggregate-first: the corpus-sized explode collapses to
      // DISTINCT (source, term) in one combinable shuffle
      // (vocab-grain); per-source sizes are a source-grain table that
      // broadcasts; the intersection self-join shuffles vocab-grain
      // rows and its output is bounded by sources² — independent of
      // corpus size. Jaccard ships as exact integer ppm (bigint DIV),
      // so the compare has no float-rounding seam.
      val vocab = t(s, dir, "documents")
        .select(col("source"), explode(TF.tokens(col("text"))).as("term"))
        .distinct()
      val sizes = vocab.groupBy(col("source")).agg(count(lit(1)).as("n"))
      vocab.as("a")
        .join(vocab.as("b"),
          col("a.term") === col("b.term") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
        .agg(count(lit(1)).as("n_common"))
        .join(broadcast(sizes.as("x")), col("s1") === col("x.source"))
        .join(broadcast(sizes.as("y")), col("s2") === col("y.source"))
        .select(col("s1"), col("s2"), col("n_common"),
          (col("x.n") + col("y.n") - col("n_common")).as("n_union"))
        .withColumn("jaccard_ppm",
          expr("n_common * 1000000 div n_union"))
        .orderBy(col("s1"), col("s2"))
    }),

    "x_text_vocab" -> ((s, dir) => {
      // corpus vocabulary accounting: top-5 tokens per language by
      // occurrence count (tokenizer-training / coverage view). Explode
      // shrinks through a map-side partial count immediately; the
      // row_number window then ranks the AGGREGATED vocab table — its
      // input is vocab-sized (distinct tokens per lang), not
      // corpus-sized, which is why a window is the right tool here
      // where it was wrong for blockKnn/capPerGroup.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("n").desc, col("tok"))
      t(s, dir, "documents")
        .select(col("lang"), explode(TF.tokens(col("text"))).as("tok"))
        .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("n"))
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") <= 5).drop("_rn")
        .orderBy(col("lang"), col("n").desc, col("tok"))
    }),

    "x_text_tfidf" -> ((s, dir) =>
      // TF-IDF top-3 terms per document: one corpus-sized (doc, term)
      // aggregate; document frequencies come from the ALREADY-
      // aggregated tf table (vocab-grain); the ranking window
      // partitions by single documents — the aggregate-first
      // discipline end to end.
      TextIndex.tfidfTopTerms(t(s, dir, "documents"),
          "doc_id", "text", k = 3)
        .select(col("doc_id"), col("term"), col("tf"),
          round(col("score"), 6).as("score"))
        .orderBy(col("doc_id"), col("term"))),

    "x_quality_linear" -> ((s, dir) =>
      // hashed-feature linear classifier applied corpus-wide: token →
      // md5 bucket → micro-scaled integer weight, folded to a logit
      // inside the scan stage (zero shuffles; the ORDER BY is the only
      // exchange). The oracle re-derives the weight table
      // arithmetically and replays bucketing via the same md5.
      QualityModel.scoreLinear(t(s, dir, "documents"), "doc_id", "text",
          QualityModel.hashWeights(64))
        .orderBy(col("doc_id"))),

    "x_text_bpe" -> ((s, dir) =>
      // BPE merge training, 6 rounds: per round one dictionary-sized
      // pair-count aggregate + a single-row driver argmax + a
      // scan-stage merge replace (two-space separator invariant makes
      // string replace == reference BPE). The oracle RETRAINS all six
      // rounds as unrolled SQL levels over the same state algebra.
      Bpe.trainMerges(t(s, dir, "documents"), "text", k = 6)
        .orderBy(col("rank"))),

    "x_text_bpe_apply" -> ((s, dir) => {
      // train-then-tokenize: the 6-round merge table applies to the
      // DISTINCT word dictionary as one chained scan-stage expression
      // (zero shuffles for tokenization itself), docs join the
      // tokenized dictionary and reassemble in word order. The oracle
      // retrains and reads each word's tokenization off the final
      // training state.
      val docs = t(s, dir, "documents")
      val merges = Bpe.trainMerges(docs, "text", k = 6)
        .orderBy(col("rank")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val words = docs
        .select(explode(split(lower(col("text")), " ", -1)).as("w"))
        .filter(length(col("w")) > 0).distinct()
      val tokenized = Bpe.tokenizeWords(words, merges)
      docs.select(col("doc_id"),
          posexplode(split(lower(col("text")), " ", -1))
            .as(Seq("pos", "w")))
        .filter(length(col("w")) > 0)
        .join(tokenized, "w")
        .groupBy(col("doc_id"))
        .agg(sum(size(col("toks"))).as("n_tokens"),
          array_join(
            transform(
              array_sort(collect_list(struct(col("pos"), col("toks")))),
              e => array_join(e.getField("toks"), "|")),
            "|").as("tokens"))
        .orderBy(col("doc_id"))
    }),

    "x_text_subwords" -> ((s, dir) => {
      // subword vocab induction (the candidate-scoring step before
      // tokenizer training): every substring of length 2..6 scored by
      // corpus occurrences × length, top-50. AGGREGATE-FIRST: the
      // corpus collapses to vocab-sized word counts before any
      // substring generation, so the explode is over the dictionary,
      // not the token stream; the cut is TakeOrdered, never a global
      // sort. The empty-guard matters: Spark's sequence(1, 0) counts
      // DOWN, so short words route through an explicit empty array.
      val wc = t(s, dir, "documents")
        .select(explode(split(lower(col("text")), " ", -1)).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
      wc.select(col("c"),
          explode(flatten(transform(sequence(lit(2), lit(6)), l =>
            transform(
              when(length(col("w")) >= l,
                sequence(lit(1), length(col("w")) - l + 1))
                .otherwise(array().cast("array<int>")),
              i => col("w").substr(i, l))))).as("s"))
        .groupBy(col("s")).agg(sum(col("c")).as("occ"))
        .select(col("s").as("subword"), col("occ"),
          (col("occ") * length(col("s"))).as("score"))
        .orderBy(col("score").desc, col("subword"))
        .limit(50)
    }),

    "x_lm_bigram" -> ((s, dir) => {
      // corpus bigram LM + stupid-backoff document scoring (the CCNet /
      // KenLM quality-filter shape): train = two map-side-combinable
      // count aggs (shuffle ∝ vocab, vocab²); score = scan-stage bigram
      // derivation from the token array (no per-doc window) + count
      // joins + one doc-grain agg of exact DECIMAL 6-dp terms. The
      // oracle retrains and rescores from scratch in SQL — model
      // training itself is the replayed artifact. Served from the
      // build-once scored-corpus artifact shared with x_lm_ppl_filter:
      // the corpus is scored once per artifact lifetime, not once per
      // consumer.
      LanguageModel.scoredTable(t(s, dir, "documents"), "doc_id", "text",
          artifactBase(dir))
        .orderBy(col("doc_id"))
    }),

    "x_lm_ppl_filter" -> ((s, dir) => {
      // CCNet-shaped perplexity quality filter: train the bigram LM on
      // the corpus, score every doc, cut into perplexity tertiles, and
      // drop the worst ('tail') third. The tertile cutoffs come from
      // histogram-guided EXACT selection (Quantiles.exactQuantile — no
      // ntile/global-sort window anywhere), and are kth-smallest
      // values the score column CONTAINS, so the bucket compare is an
      // exact double comparison any engine replays. Scores come from
      // the build-once artifact shared with x_lm_bigram — the quantile
      // probes and the final bucket pass all scan a doc-grain parquet
      // instead of re-running (or pinning) the LM scoring pass.
      val scored = LanguageModel.scoredTable(t(s, dir, "documents"),
        "doc_id", "text", artifactBase(dir))
      LanguageModel.perplexityBuckets(scored)
        .filter(col("bucket") =!= "tail")
        .orderBy(col("doc_id"))
    }),

    "x_text_collocations" -> ((s, dir) =>
      // PMI phrase mining over the corpus (the multiword-unit signal
      // for tokenizer/vocab construction): exact vocab-grain counts,
      // one ln per surviving pair — nothing corpus-sized past the two
      // count shuffles. minCount floors out rare-pair PMI noise.
      LanguageModel.collocations(t(s, dir, "documents"), "text",
          minCount = 40)
        .orderBy(col("pmi").desc, col("w1"), col("w2"))),

    "x_lm_heldout" -> ((s, dir) => {
      // train/score separation: the LM trains on the training split
      // (doc_id % 50 <> 0) and scores the HELD-OUT split — the actual
      // perplexity-filter deployment shape (score new data under a
      // frozen model). Unseen bigrams/backoffs exercise the alpha path
      // against counts the scored docs never contributed to.
      val docs = t(s, dir, "documents")
      val train = docs.filter(col("doc_id") % 50 =!= 0)
      val held = docs.filter(col("doc_id") % 50 === 0)
      val uni = LanguageModel.unigramCounts(train, "text")
      val bi = LanguageModel.bigramCounts(train, "text")
      LanguageModel.scoreStupidBackoff(held, "doc_id", "text", uni, bi)
        .orderBy(col("doc_id"))
    }),

    "x_text_search" -> ((s, dir) => {
      // conjunctive term search served from the hash-bucketed
      // posting-list artifact: the probe prunes to the query terms'
      // buckets (~2/64 of the index), then per-doc matched-term
      // counts intersect. The oracle recomputes from the raw corpus —
      // index probe == corpus scan is the claim.
      val postings = TextIndex.buildPostings(t(s, dir, "documents"),
        "doc_id", "text", artifactBase(dir))
      TextIndex.search(postings, Seq("batch", "join"))
        .orderBy(col("doc_id"))
    }),

    "x_text_bm25" -> ((s, dir) => {
      // Okapi BM25 top-10 ranked retrieval from the scored-postings
      // artifact (tf + denormalized doc length per posting row; exact
      // long (n_docs, total_dl) stats). Bucket-pruned probe, df from
      // the candidates themselves, term-ordered double fold, rounded
      // rank. The oracle recomputes full-scan BM25 from the raw
      // corpus — index probe == corpus scan, ranked edition.
      val (postings, stats) = TextIndex.buildScoredPostings(
        t(s, dir, "documents"), "doc_id", "text", artifactBase(dir))
      TextIndex.bm25TopK(postings, stats, Seq("batch", "join"), k = 10)
    }),

    "x_text_bm25_incr" -> ((s, dir) => {
      // incremental BM25 index maintenance: build on the even half,
      // append the odd half under one content-derived staged-commit
      // token (a re-delivered delta no-ops), query the merged index.
      // The oracle is the FULL-corpus BM25 replay — incremental ==
      // from-scratch is the law, same device as the span/LSH refresh.
      val docs = t(s, dir, "documents")
      val base = s"${artifactBase(dir)}/incrbm25"
      TextIndex.buildScoredPostings(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", base)
      val (p, st) = TextIndex.appendScoredPostings(
        docs.filter(col("doc_id") % 2 =!= 0), "doc_id", "text", base)
      TextIndex.bm25TopK(p, st, Seq("batch", "join"), k = 10)
    }),

    "x_text_bm25_del" -> ((s, dir) => {
      // BM25 document deletes: build over the full corpus, tombstone
      // every %5 doc (one exactly-once delta: tombstones + a NEGATIVE
      // stats row, lengths recovered from the denormalized dl — no
      // text needed at delete time), probe through the tombstone-
      // resolving readers. The oracle retrains from scratch WITHOUT
      // the deleted docs — delete == from-scratch is the law, the
      // destructive twin of the incremental-append gate.
      val docs = t(s, dir, "documents")
      val base = s"${artifactBase(dir)}/delbm25"
      TextIndex.buildScoredPostings(docs, "doc_id", "text", base)
      val (p, st) = TextIndex.deleteScoredPostings(
        docs.filter(col("doc_id") % 5 === 0).select(col("doc_id")),
        "doc_id", base)
      TextIndex.bm25TopK(p, st, Seq("batch", "join"), k = 10)
    }),

    "x_text_bm25_cdc" -> ((s, dir) => {
      // TEXT INDEX AS A MATERIALIZED VIEW of a manifested documents
      // table — the BM25 sibling of x_sim_ivf_cdc: the table mutates
      // through the real lakehouse write paths (insert merge, keyed
      // delete), the CDF feed carries exactly the change sets, and
      // the consumer applies them as the index's own exactly-once
      // maintenance ops (appendScoredPostings / deleteScoredPostings,
      // both content-token once-ever, so re-running the pipeline
      // no-ops). Ranked retrieval over the maintained index must
      // equal a from-scratch BM25 over the FINAL table: stale n_docs
      // or total_dl, a resurrected deleted doc, or a lost insert all
      // hash-mismatch.
      val base = s"${artifactBase(dir)}/bm25_cdc_tbl"
      val bp = new org.apache.hadoop.fs.Path(base)
      bp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(bp, true)
      val tbl = s"$base/tbl"; val feedDir = s"$base/feed"
      val idxBase = s"${artifactBase(dir)}/cdcbm25"
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val keys = Seq("pd", "doc_id")
      def shaped(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("pd", (col("doc_id") % 8).cast("long"))
      operators.Upsert.mergeIntoManifested(s, tbl,
        shaped(docs).withColumn("ver", lit(1L)), keys, "pd", "ver",
        retain = 4)
      TextIndex.buildScoredPostings(
        operators.Upsert.readManifestedAt(s, tbl, 0), "doc_id", "text",
        idxBase)
      // wave 1: INSERT copies of the %9 docs at a disjoint id range
      // (pure inserts in the feed; in-place doc edits are the
      // documented delete-then-append maintenance path)
      operators.Upsert.mergeIntoManifested(s, tbl,
        shaped(docs.filter(col("doc_id") % 9 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
          .withColumn("ver", lit(1L)), keys, "pd", "ver", retain = 4)
      graft.streaming.CdfSource.pollOnce(s, tbl, keys, feedDir)
      // wave 2: DELETE the %5 docs through the keyed path
      operators.Upsert.deleteKeysFromManifested(s, tbl,
        shaped(docs.filter(col("doc_id") % 5 === 0))
          .select(col("pd"), col("doc_id")), keys, "pd", retain = 4)
      graft.streaming.CdfSource.pollOnce(s, tbl, keys, feedDir)
      // the consumer: split the committed feed into its change sets
      // and apply each through the index's own maintenance ops
      val feed = operators.StagedCommit.readCommitted(s, feedDir)
      TextIndex.appendScoredPostings(
        feed.filter(col("_change_type") === "insert")
          .select(col("doc_id"), col("text")), "doc_id", "text", idxBase)
      val (p, st) = TextIndex.deleteScoredPostings(
        feed.filter(col("_change_type") === "delete")
          .select(col("doc_id")), "doc_id", idxBase)
      TextIndex.bm25TopK(p, st, Seq("batch", "join"), k = 10)
    }),

    "x_stream_bm25_cdc" -> ((s, dir) => {
      // BM25 JOINS THE LIVE STREAMING TIER (completing VERDICT r16 #2
      // across the index families): a REAL streaming consumer
      // (IndexSink.startBm25) tails the documents table's feed into
      // the scored-postings index with all three routes exercised —
      // an insert wave (copies of the %9 docs at +1000000), an
      // IN-PLACE TEXT EDIT wave (%7 docs re-indexed through
      // updateScoredPostings: tombstone + physical purge + salted
      // re-append, the op this round adds), and a delete wave (%5).
      // Ranked retrieval == from-scratch BM25 over the FINAL table:
      // a survived old posting (missed purge), a lost re-index, a
      // double-subtracted stats row, or a resurrected delete all
      // hash-mismatch.
      val base = s"${artifactBase(dir)}/bm25_stream_tbl"
      val bp = new org.apache.hadoop.fs.Path(base)
      bp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(bp, true)
      val tbl = s"$base/tbl"; val feedDir = s"$base/feed"
      val idxBase = s"${artifactBase(dir)}/streambm25"
      // checkpoint lives WITH the index artifact (lineage fence binds
      // them; re-runs resume the lineage and every op no-ops)
      val ckpt = s"${artifactBase(dir)}/bm25_stream_ckpt"
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val keys = Seq("pd", "doc_id")
      def shaped(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("pd", (col("doc_id") % 8).cast("long"))
      operators.Upsert.mergeIntoManifested(s, tbl,
        shaped(docs).withColumn("ver", lit(1L)), keys, "pd", "ver",
        retain = 4)
      TextIndex.buildScoredPostings(
        operators.Upsert.readManifestedAt(s, tbl, 0), "doc_id", "text",
        idxBase)
      operators.Upsert.mergeIntoManifested(s, tbl,
        shaped(docs.filter(col("doc_id") % 9 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
          .withColumn("ver", lit(1L)), keys, "pd", "ver", retain = 4)
      graft.streaming.CdfSource.pollOnce(s, tbl, keys, feedDir)
      operators.Upsert.mergeIntoManifested(s, tbl,
        shaped(docs.filter(col("doc_id") % 7 === 0)
          .select(col("doc_id"),
            concat(col("text"), lit(" join batch join")).as("text")))
          .withColumn("ver", lit(2L)), keys, "pd", "ver", retain = 4)
      graft.streaming.CdfSource.pollOnce(s, tbl, keys, feedDir)
      operators.Upsert.deleteKeysFromManifested(s, tbl,
        shaped(docs.filter(col("doc_id") % 5 === 0))
          .select(col("pd"), col("doc_id")), keys, "pd", retain = 4)
      graft.streaming.CdfSource.pollOnce(s, tbl, keys, feedDir)
      val sq = graft.streaming.IndexSink.startBm25(
        graft.streaming.CdfSource.feedStream(s, tbl, keys, feedDir),
        idxBase, "doc_id", "text", ckpt)
      if (!sq.awaitTermination(300000L)) {
        sq.stop()
        throw new IllegalStateException(
          "x_stream_bm25_cdc: bm25 stream did not drain within 300s")
      }
      val (p, st) = TextIndex.scoredPostingsReaders(s, idxBase)
      TextIndex.bm25TopK(p, st, Seq("batch", "join"), k = 10)
    }),

    "x_text_scrub" -> ((s, dir) =>
      // PII redaction (emails / IPv4 / phone numbers -> typed tokens).
      // The corpus carries no PII, so the gate plants a deterministic
      // doc-keyed contact line in BOTH engines and scrubs it — the
      // oracle SQL is GENERATED from TextFunctions.piiPatterns, one
      // source of truth for the patterns. Scan-stage regexp chain, no
      // shuffle.
      t(s, dir, "documents")
        .select(col("doc_id"),
          TF.scrubPii(concat(col("text"),
            lit(" reach user"), col("doc_id"),
            lit("@mail.example.com or +1555000"), col("doc_id"),
            lit(" from 10.0."), pmod(col("doc_id"), lit(256)), lit(".7")))
            .as("clean"))
        .orderBy(col("doc_id"))),

    "x_text_repetition" -> ((s, dir) =>
      // repetition quality signals (Gopher-style): repeated-trigram
      // fraction and most-common-token share, plus the corresponding
      // keep flag. Row-local expression arithmetic in the scan stage —
      // no shuffle, no UDF; per-row cost bounded by document length.
      t(s, dir, "documents")
        .select(col("doc_id"),
          round(TF.dupNgramRatio(col("text"), 3), 6).as("dup3_ratio"),
          round(TF.topTokenRatio(col("text")), 6).as("top_tok_ratio"),
          (round(TF.dupNgramRatio(col("text"), 3), 6) <= 0.2 &&
            round(TF.topTokenRatio(col("text")), 6) <= 0.3).as("keep"))
        .orderBy(col("doc_id"))),

    // ── LLM-pipeline extensions: similarity search ───────────────────
    "x_sim_bruteforce" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = queryVector(emb)
      Similarity.bruteForceTopK(emb.filter(col("vec_id") =!= 0),
        "vec_id", "embedding", q, 10)
    }),

    "x_sim_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = queryVector(emb)
      Similarity.ivfTopK(emb, "vec_id", "embedding", "label", q,
        k = 10, nprobe = 1)
    }),

    "x_sim_range" -> ((s, dir) => {
      // radius search (the k-free sibling of bruteForceTopK): every
      // vector with cosine ≥ 0.15 of the query — a scan-stage
      // predicate, output ∝ matches, no heap/shuffle anywhere
      val emb = t(s, dir, "embeddings")
      val q = queryVector(emb)
      Similarity.rangeSearch(emb.filter(col("vec_id") =!= 0),
          "vec_id", "embedding", q, minScore = 0.15)
        .orderBy(col("score").desc, col("vec_id"))
    }),

    "x_sim_lsh" -> ((s, dir) => {
      // hash-checked: the seeded planes are pasted into the oracle SQL
      // as literals (lshOracleSql), so DuckDB replays the identical
      // bucket/candidate/re-rank pipeline
      val emb = t(s, dir, "embeddings")
      val q = queryVector(emb)
      val planes = Similarity.hyperplanes(LshDim, LshTables, LshBits, LshSeed)
      Similarity.lshTopK(emb.filter(col("vec_id") =!= 0),
        "vec_id", "embedding", q, 10, planes)
    }),

    "x_sim_sq" -> ((s, dir) => {
      // int8 scalar-quantized ANN: first pass ranks by the quantized dot
      // product (4x less vector IO at scale — int8 vs float32), exact
      // cosine re-ranks only the top `rerank` candidates. Both stages
      // are TakeOrdered, no shuffle. The quantizer scale (127/max|x|)
      // and both tie-breaks are total orders, so the oracle replays the
      // identical two-stage pipeline and hash-matches.
      val emb = t(s, dir, "embeddings")
      val q = queryVector(emb)
      val maxAbs = Similarity.sqMaxAbs(emb, "embedding")
      Similarity.sqTopK(emb.filter(col("vec_id") =!= 0),
        "vec_id", "embedding", q, k = 10, rerank = 40, maxAbs = maxAbs)
    }),

    "x_sim_mrl" -> ((s, dir) => {
      // matryoshka/truncated-prefix ANN: candidate pass scores only the
      // first 16 of 64 dims (4x less candidate IO with a stored prefix
      // column), exact full-dim cosine re-ranks. Same two-TakeOrdered
      // shape as x_sim_sq, traded along the dimension axis.
      val emb = t(s, dir, "embeddings")
      val q = queryVector(emb)
      Similarity.mrlTopK(emb.filter(col("vec_id") =!= 0),
        "vec_id", "embedding", q, k = 10, rerank = 40, prefixDims = 16)
    }),

    "x_sim_bq" -> ((s, dir) => {
      // binary-quantized ANN (1 bit/dim): Hamming over mean-centered
      // sign-bit code words (packed longs, XOR+popcount) prefilters to
      // `rerank` candidates, exact cosine re-ranks — 32x less
      // candidate-pass IO than float32 at scale. The oracle counts
      // sign mismatches over the same 6-dp-rounded means (packing is
      // an encoding, not a semantic).
      val emb = t(s, dir, "embeddings")
      val q = queryVector(emb)
      val means = Similarity.bqMeans(emb, "embedding")
      Similarity.bqTopK(emb.filter(col("vec_id") =!= 0),
        "vec_id", "embedding", q, k = 10, rerank = 40, means = means)
    }),

    "x_sim_bq_index" -> ((s, dir) => {
      // x_sim_bq's build-once/probe-many artifact form (BqIndex):
      // stored packed code words probed via column pruning — the
      // candidate pass reads (id, _bqw) only, 32x less IO than the
      // vectors; appends land exactly-once and probes read
      // committed-only files. Storage must never change content: the
      // oracle replays x_sim_bq's sign-mismatch algebra with the
      // means computed over the INDEXED corpus (vec_id <> 0).
      val emb = t(s, dir, "embeddings")
      val q = queryVector(emb)
      val idx = bqIndexFor(s, dir, emb.filter(col("vec_id") =!= 0))
      idx.search("vec_id", "embedding", q, k = 10, rerank = 40)
    }),

    "x_sim_pq_index" -> ((s, dir) => {
      // x_sim_pq's COMMITTED-probe artifact form (VERDICT r13 #2): the
      // same build-once PqIndex, probed through the committed-only
      // codes view (base files + marker-committed appendOnce deltas) —
      // the read path a PRODUCTION index maintained by PqIndex.append
      // must use, so a probe racing a killed-then-retried append never
      // ranks a partial delta (chaos-specced in StagedCommitSpec).
      // Training is amortized: the codebook artifact is built once per
      // corpus and every probe here is ADC over stored codes + rerank.
      // Wider rerank (88 vs 44) distinguishes the candidate cut from
      // x_sim_pq's and buys the recall headroom the RecallCheck ladder
      // documents at rerank 80+.
      val emb = t(s, dir, "embeddings")
      val q = queryVector(emb)
      val idx = pqIndexFor(s, dir, emb)
      idx.searchCommitted(emb, "vec_id", "embedding", q, k = 11,
          rerank = 88)
        .filter(col("vec_id") =!= 0)
        .orderBy(col("score").desc, col("vec_id"))
        .limit(10)
    }),

    "x_sim_lsh_index" -> ((s, dir) => {
      // persistent LSH forest (build-once/probe-many): the probe reads
      // ONE (tbl, bucket) partition per table — bucket membership as
      // parquet partition pruning, where x_sim_lsh's predicate scans the
      // corpus. Hash-checked: planes pasted into the oracle as literals,
      // candidates re-derived from the SAME on-disk artifact.
      val emb = t(s, dir, "embeddings")
      val q = queryVector(emb)
      val idx = lshIndexFor(s, dir, emb)
      // k=11: the query vector itself (bucket-identical, cosine 1.0)
      // takes one slot before being filtered out
      idx.search("vec_id", "embedding", q, k = 11)
        .filter(col("vec_id") =!= 0)
        .orderBy(col("score").desc, col("vec_id"))
        .limit(10)
    }),

    "x_sim_lsh_probe2" -> ((s, dir) => {
      // multiprobe LSH (Lv et al. 2007): probes=2 reads the exact
      // bucket PLUS the smallest-|margin| single-bit flip per table —
      // the sign decision most likely to have split true neighbors.
      // Recall rises at one extra pruned partition per table instead of
      // doubling the index. Oracle re-derives margins, the flip choice,
      // and the perturbed buckets from the pasted planes in SQL.
      val emb = t(s, dir, "embeddings")
      val q = queryVector(emb)
      val idx = lshIndexFor(s, dir, emb)
      idx.search("vec_id", "embedding", q, k = 11, probes = 2)
        .filter(col("vec_id") =!= 0)
        .orderBy(col("score").desc, col("vec_id"))
        .limit(10)
    }),

    "x_sim_lsh_probe4" -> ((s, dir) => {
      // multi-bit multiprobe (Lv et al. §4.1's query-directed order):
      // probes=4 walks the perturbation-SET sequence — subsets of <=2
      // sign bits ranked by summed margin — so a pair of near-boundary
      // bits can outrank one solid single flip. Still one extra pruned
      // partition per probe per table; the oracle re-enumerates the
      // subset sequence (singles UNION pairs, ordered by 6-dp score
      // sum then mask) from the pasted planes in SQL.
      val emb = t(s, dir, "embeddings")
      val q = queryVector(emb)
      val idx = lshIndexFor(s, dir, emb)
      idx.search("vec_id", "embedding", q, k = 11, probes = 4)
        .filter(col("vec_id") =!= 0)
        .orderBy(col("score").desc, col("vec_id"))
        .limit(10)
    }),

    "x_sim_ivf_index" -> ((s, dir) => {
      // persistent k-means IVF index (build-once/probe-many); nprobe=k
      // scans every cell, so the result is exactly brute-force top-k and
      // hash-checkable against the same oracle
      val emb = t(s, dir, "embeddings")
      val q = queryVector(emb)
      val idx = ivfIndexFor(s, dir, emb)
      // k=11: the query vector itself (vec_id 0, cosine 1.0) takes one
      // slot before being filtered out
      idx.search("vec_id", "embedding", q, k = 11, nprobe = 8)
        .filter(col("vec_id") =!= 0)
        .orderBy(col("score").desc, col("vec_id"))
        .limit(10)
    }),

    "x_sim_ivf_rebalance" -> ((s, dir) => {
      // IVF maintenance for skewed/drifted corpora (VERDICT r13 #8):
      // the artifact is built coarse (k=4 — every cell holds ~25% of
      // the corpus) and then REBALANCED once via splitHotCells, which
      // splits each over-threshold cell into local sub-cells touching
      // only that cell's rows (partition-pruned read + one hot-mass
      // shuffle; at 100 TB this is re-encoding the hot percent, not the
      // corpus) and publishes the new routing table as an immutable
      // centroid version + one atomic epoch flip — probes never see a
      // torn table, chaos-specced in IvfRebalanceSpec. Storage must
      // never change content: a full probe over the post-split cells
      // answers exactly brute-force top-k.
      val emb = t(s, dir, "embeddings")
      val q = queryVector(emb)
      val idx = ivfRebalFor(s, dir, emb)
      val nCells = idx.centroids().count().toInt
      idx.search("vec_id", "embedding", q, k = 13, nprobe = nCells)
        .filter(col("vec_id") =!= 0)
        .orderBy(col("score").desc, col("vec_id"))
        .limit(12)
    }),

    "x_sim_ivf_delete" -> ((s, dir) => {
      // TOMBSTONE DELETE on the IVF index (right-to-be-forgotten for a
      // vector corpus): every %7 id is deleted as one exactly-once
      // tombstone delta — zero data movement, redelivery no-ops via
      // the content token — and cells() resolves the mask at its
      // single choke point, so the full probe (nprobe = every cell)
      // answers exactly brute-force top-k over the SURVIVING corpus.
      // purgeDeletes later rewrites only affected cells
      // (IvfDeleteSpec); the gate checks the serving-path semantics.
      val emb = t(s, dir, "embeddings")
      val q = queryVector(emb)
      val idx = ivfDeleteFor(s, dir, emb)
      idx.search("vec_id", "embedding", q, k = 10, nprobe = IvfK)
        .orderBy(col("score").desc, col("vec_id"))
    }),

    "x_sim_bq_del" -> ((s, dir) => {
      // TOMBSTONE DELETE on the binary-quantization index — completes
      // the delete sweep across the index family (IVF got it in r14):
      // every %7 id lands as one exactly-once tombstone delta, masked
      // at the rows() choke point so BOTH passes (hamming candidate
      // scan and exact rerank) see only survivors. Delete must equal
      // from-scratch: the oracle replays x_sim_bq_index's algebra over
      // the surviving corpus, with the centering means kept FROZEN at
      // build time over the full indexed corpus (deletes never
      // retrain — the FAISS remove_ids contract).
      val emb = t(s, dir, "embeddings")
      val q = queryVector(emb)
      val idx = bqDeleteFor(s, dir, emb.filter(col("vec_id") =!= 0))
      idx.search("vec_id", "embedding", q, k = 10, rerank = 40)
    }),

    "x_sim_lsh_del" -> ((s, dir) => {
      // TOMBSTONE DELETE on the LSH forest: one tombstone delta masks
      // all numTables copies of a row at once — the view-level mask is
      // numTables x cheaper than a physical delete until purgeDeletes
      // folds it away (LshIndexSpec). The query vector itself
      // (vec_id 0 = 0 mod 7) is among the deleted, so the probe must
      // not resurrect even its bucket-identical self — the oracle
      // re-derives buckets from the pasted planes over survivors only.
      val emb = t(s, dir, "embeddings")
      val q = queryVector(emb)
      val idx = lshDeleteFor(s, dir, emb)
      idx.search("vec_id", "embedding", q, k = 10)
        .orderBy(col("score").desc, col("vec_id"))
    }),

    "x_sim_ivf_cdc" -> ((s, dir) => {
      // ANN INDEX AS A MATERIALIZED VIEW of a manifested vector table
      // — the lakehouse layer and the similarity layer COMPOSED: the
      // table mutates through the real write paths (insert merge,
      // keyed delete), CdfSource.pollOnce lands each interval's feed,
      // and the consumer applies the feed's change sets to the index
      // as exactly-once append/tombstone deltas (content-derived
      // tokens — re-running the pipeline re-applies as no-ops).
      // Full-width probe == brute force over the FINAL table: a missed
      // delete resurrects a vector, a missed insert loses one, a
      // double-applied feed would fail the exactly-once append — all
      // hash-mismatch against the recomputed oracle.
      val base = s"${artifactBase(dir)}/ivf_cdc_tbl"
      val bp = new org.apache.hadoop.fs.Path(base)
      bp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(bp, true)
      val tbl = s"$base/tbl"; val feedDir = s"$base/feed"
      val emb = t(s, dir, "embeddings")
      val q = queryVector(emb)
      val keys = Seq("pb", "vec_id")
      def shaped(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("pb", (col("vec_id") % 8).cast("long"))
      operators.Upsert.mergeIntoManifested(s, tbl,
        shaped(emb.filter(col("vec_id") =!= 0)
          .select(col("vec_id"), col("embedding")))
          .withColumn("ver", lit(1L)),
        keys, "pb", "ver", retain = 4)
      val idx = ivfCdcFor(s, dir,
        operators.Upsert.readManifestedAt(s, tbl, 0))
      // wave 1: INSERT merge — negated twins of the %5 vectors at a
      // disjoint id range (no key overlap, so the feed carries pure
      // inserts; in-place vector updates are the documented
      // delete -> purge -> append maintenance path, IvfDeleteSpec)
      operators.Upsert.mergeIntoManifested(s, tbl,
        shaped(emb.filter(col("vec_id") % 5 === 0 && col("vec_id") =!= 0)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            transform(col("embedding"), x => -x).as("embedding")))
          .withColumn("ver", lit(1L)), keys, "pb", "ver", retain = 4)
      graft.streaming.CdfSource.pollOnce(s, tbl, keys, feedDir)
      // wave 2: DELETE the %7 ids through the keyed path
      operators.Upsert.deleteKeysFromManifested(s, tbl,
        shaped(emb.filter(col("vec_id") % 7 === 0 && col("vec_id") =!= 0))
          .select(col("pb"), col("vec_id")), keys, "pb", retain = 4)
      graft.streaming.CdfSource.pollOnce(s, tbl, keys, feedDir)
      // the consumer: split the committed feed into its change sets
      // and apply each to the index
      val feed = operators.StagedCommit.readCommitted(s, feedDir)
      idx.append(feed.filter(col("_change_type") === "insert")
        .select(col("vec_id"), col("embedding")), "vec_id", "embedding")
      idx.delete(feed.filter(col("_change_type") === "delete")
        .select(col("vec_id")), "vec_id")
      idx.search("vec_id", "embedding", q, k = 10, nprobe = IvfK)
        .orderBy(col("score").desc, col("vec_id"))
    }),

    "x_sim_lsh_cdc" -> ((s, dir) => {
      // LSH FOREST AS A MATERIALIZED VIEW — completes the
      // index-as-a-view family across the persistent retrieval
      // artifacts (IVF, BM25, LSH): the same manifested-table + CDF
      // feed pipeline, with the consumer applying the change sets via
      // the forest's own exactly-once ops (append encodes into all
      // numTables copies; one tombstone delta masks all of them at
      // once). The probe replays the pasted-plane bucket pipeline
      // over the FINAL table — a resurrected bucket row or a lost
      // insert hash-mismatches.
      val base = s"${artifactBase(dir)}/lsh_cdc_tbl"
      val bp = new org.apache.hadoop.fs.Path(base)
      bp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(bp, true)
      val tbl = s"$base/tbl"; val feedDir = s"$base/feed"
      val emb = t(s, dir, "embeddings")
      val q = queryVector(emb)
      val keys = Seq("pb", "vec_id")
      def shaped(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("pb", (col("vec_id") % 8).cast("long"))
      operators.Upsert.mergeIntoManifested(s, tbl,
        shaped(emb.filter(col("vec_id") =!= 0)
          .select(col("vec_id"), col("embedding")))
          .withColumn("ver", lit(1L)),
        keys, "pb", "ver", retain = 4)
      val idx = lshCdcFor(s, dir,
        operators.Upsert.readManifestedAt(s, tbl, 0))
      operators.Upsert.mergeIntoManifested(s, tbl,
        shaped(emb.filter(col("vec_id") % 5 === 0 && col("vec_id") =!= 0)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            transform(col("embedding"), x => -x).as("embedding")))
          .withColumn("ver", lit(1L)), keys, "pb", "ver", retain = 4)
      graft.streaming.CdfSource.pollOnce(s, tbl, keys, feedDir)
      operators.Upsert.deleteKeysFromManifested(s, tbl,
        shaped(emb.filter(col("vec_id") % 7 === 0 && col("vec_id") =!= 0))
          .select(col("pb"), col("vec_id")), keys, "pb", retain = 4)
      graft.streaming.CdfSource.pollOnce(s, tbl, keys, feedDir)
      val feed = operators.StagedCommit.readCommitted(s, feedDir)
      idx.append(feed.filter(col("_change_type") === "insert")
        .select(col("vec_id"), col("embedding")), "vec_id", "embedding")
      idx.delete(feed.filter(col("_change_type") === "delete")
        .select(col("vec_id")), "vec_id")
      idx.search("vec_id", "embedding", q, k = 10)
        .orderBy(col("score").desc, col("vec_id"))
    }),

    "x_sim_ivf_update" -> ((s, dir) => {
      // IN-PLACE VECTOR UPDATE THROUGH THE FEED (VERDICT r16 #3): the
      // mutation wave OVERLAPS existing keys — a key-overlap merge on
      // the vector table, so the feed carries update pre/post images,
      // and the consumer routes the post-images through
      // IvfIndex.update: retire + purge + replace under ONE
      // interval-salted token (redelivery no-ops — re-running this
      // gate re-applies the whole pipeline as no-ops). Probe == brute
      // force over the FINAL table: a survived old vector (missed
      // retirement), a lost new one (purge ate the append), or a
      // double-apply all hash-mismatch.
      val base = s"${artifactBase(dir)}/ivf_upd_tbl"
      val bp = new org.apache.hadoop.fs.Path(base)
      bp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(bp, true)
      val tbl = s"$base/tbl"; val feedDir = s"$base/feed"
      val emb = t(s, dir, "embeddings")
      val q = queryVector(emb)
      val keys = Seq("pb", "vec_id")
      def shaped(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("pb", (col("vec_id") % 8).cast("long"))
      operators.Upsert.mergeIntoManifested(s, tbl,
        shaped(emb.filter(col("vec_id") =!= 0)
          .select(col("vec_id"), col("embedding")))
          .withColumn("ver", lit(1L)),
        keys, "pb", "ver", retain = 4)
      val idx = ivfTaggedFor(s, dir, "upd",
        operators.Upsert.readManifestedAt(s, tbl, 0))
      // wave 1: UPDATE merge — the %5 keys' vectors negated IN PLACE
      // (same ids, higher version wins), the key-overlap case the
      // r16 gate deliberately avoided
      operators.Upsert.mergeIntoManifested(s, tbl,
        shaped(emb.filter(col("vec_id") % 5 === 0 && col("vec_id") =!= 0)
          .select(col("vec_id"),
            transform(col("embedding"), x => -x).as("embedding")))
          .withColumn("ver", lit(2L)), keys, "pb", "ver", retain = 4)
      graft.streaming.CdfSource.pollOnce(s, tbl, keys, feedDir)
      // wave 2: DELETE the %7 ids (including updated %35 keys — the
      // tombstone must mask the REPLACED vector, not the retired one)
      operators.Upsert.deleteKeysFromManifested(s, tbl,
        shaped(emb.filter(col("vec_id") % 7 === 0 && col("vec_id") =!= 0))
          .select(col("pb"), col("vec_id")), keys, "pb", retain = 4)
      graft.streaming.CdfSource.pollOnce(s, tbl, keys, feedDir)
      // the consumer: walk the committed feed interval-by-interval in
      // epoch order, routing each change set through the index's own
      // exactly-once op — updates via the single-token update path
      val feed = operators.StagedCommit.readCommitted(s, feedDir)
        .persist()
      try {
        feed.select(col("_from_epoch"), col("_to_epoch")).distinct()
          .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
          .foreach { case (a, b) =>
            val iv = feed.filter(col("_from_epoch") === a &&
              col("_to_epoch") === b)
            val upd = iv
              .filter(col("_change_type") === "update_postimage")
              .select(col("vec_id"), col("embedding"))
            if (!upd.isEmpty)
              idx.update(upd, "vec_id", "embedding", s"cdf_${a}_$b")
            val ins = iv.filter(col("_change_type") === "insert")
              .select(col("vec_id"), col("embedding"))
            if (!ins.isEmpty) idx.append(ins, "vec_id", "embedding")
            val del = iv.filter(col("_change_type") === "delete")
              .select(col("vec_id"))
            if (!del.isEmpty) idx.delete(del, "vec_id")
          }
      } finally feed.unpersist()
      idx.search("vec_id", "embedding", q, k = 10, nprobe = IvfK)
        .orderBy(col("score").desc, col("vec_id"))
    }),

    "x_stream_ivf_cdc" -> ((s, dir) => {
      // LIVE STREAMING INDEX MAINTENANCE (VERDICT r16 #2): the ANN
      // index joins the aggregate MV's tier — a REAL Structured
      // Streaming consumer (IndexSink.startIvf over
      // CdfSource.feedStream) tails the table's feed into the index,
      // batch-id-fenced and lineage-fenced like MvSink, with all three
      // change routes exercised live: an insert wave (disjoint negated
      // twins), an in-place update wave (%3 vectors negated, key
      // overlap → IvfIndex.update mid-stream), and a delete wave.
      // Probe == brute force over the FINAL table.
      val base = s"${artifactBase(dir)}/ivf_stream_tbl"
      val bp = new org.apache.hadoop.fs.Path(base)
      bp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(bp, true)
      val tbl = s"$base/tbl"; val feedDir = s"$base/feed"
      // the checkpoint LIVES WITH the index artifact, not in a temp
      // dir: the lineage fence binds the index to its checkpoint, so a
      // re-run must resume the same lineage (and the re-created feed's
      // deterministic file names read as already-seen — the whole
      // pipeline re-runs as a no-op, like every _cdc gate)
      val ckpt = s"${artifactBase(dir)}/ivf_stream_ckpt"
      val emb = t(s, dir, "embeddings")
      val q = queryVector(emb)
      val keys = Seq("pb", "vec_id")
      def shaped(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("pb", (col("vec_id") % 8).cast("long"))
      operators.Upsert.mergeIntoManifested(s, tbl,
        shaped(emb.filter(col("vec_id") =!= 0)
          .select(col("vec_id"), col("embedding")))
          .withColumn("ver", lit(1L)),
        keys, "pb", "ver", retain = 4)
      val idx = ivfTaggedFor(s, dir, "stream",
        operators.Upsert.readManifestedAt(s, tbl, 0))
      // wave 1: INSERT — negated twins of the %5 vectors at +1000000
      operators.Upsert.mergeIntoManifested(s, tbl,
        shaped(emb.filter(col("vec_id") % 5 === 0 && col("vec_id") =!= 0)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            transform(col("embedding"), x => -x).as("embedding")))
          .withColumn("ver", lit(1L)), keys, "pb", "ver", retain = 4)
      graft.streaming.CdfSource.pollOnce(s, tbl, keys, feedDir)
      // wave 2: UPDATE in place — the %3 originals' vectors negated
      operators.Upsert.mergeIntoManifested(s, tbl,
        shaped(emb.filter(col("vec_id") % 3 === 0 && col("vec_id") =!= 0)
          .select(col("vec_id"),
            transform(col("embedding"), x => -x).as("embedding")))
          .withColumn("ver", lit(2L)), keys, "pb", "ver", retain = 4)
      graft.streaming.CdfSource.pollOnce(s, tbl, keys, feedDir)
      // wave 3: DELETE the %7 originals
      operators.Upsert.deleteKeysFromManifested(s, tbl,
        shaped(emb.filter(col("vec_id") % 7 === 0 && col("vec_id") =!= 0))
          .select(col("pb"), col("vec_id")), keys, "pb", retain = 4)
      graft.streaming.CdfSource.pollOnce(s, tbl, keys, feedDir)
      // the LIVE consumer drains every committed interval
      val sq = graft.streaming.IndexSink.startIvf(
        graft.streaming.CdfSource.feedStream(s, tbl, keys, feedDir),
        idx, "vec_id", "embedding", ckpt)
      if (!sq.awaitTermination(300000L)) {
        sq.stop()
        throw new IllegalStateException(
          "x_stream_ivf_cdc: index stream did not drain within 300s")
      }
      idx.search("vec_id", "embedding", q, k = 10, nprobe = IvfK)
        .orderBy(col("score").desc, col("vec_id"))
    }),

    "x_stream_lsh_cdc" -> ((s, dir) => {
      // THE LSH FOREST ON THE LIVE STREAMING TIER — completes gate-
      // level parity across the index families (IVF:
      // x_stream_ivf_cdc, BM25: x_stream_bm25_cdc): the same
      // insert + in-place update + delete waves drained by
      // IndexSink.startLsh, with the forest's own exactly-once ops
      // (salted all-copies append, one-delta mask, update = retire +
      // purge + replace). Probe replays the pasted-plane bucket
      // pipeline over the FINAL table.
      val base = s"${artifactBase(dir)}/lsh_stream_tbl"
      val bp = new org.apache.hadoop.fs.Path(base)
      bp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(bp, true)
      val tbl = s"$base/tbl"; val feedDir = s"$base/feed"
      val ckpt = s"${artifactBase(dir)}/lsh_stream_ckpt"
      val emb = t(s, dir, "embeddings")
      val q = queryVector(emb)
      val keys = Seq("pb", "vec_id")
      def shaped(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("pb", (col("vec_id") % 8).cast("long"))
      operators.Upsert.mergeIntoManifested(s, tbl,
        shaped(emb.filter(col("vec_id") =!= 0)
          .select(col("vec_id"), col("embedding")))
          .withColumn("ver", lit(1L)),
        keys, "pb", "ver", retain = 4)
      val idx = lshTaggedFor(s, dir, "stream",
        operators.Upsert.readManifestedAt(s, tbl, 0))
      operators.Upsert.mergeIntoManifested(s, tbl,
        shaped(emb.filter(col("vec_id") % 5 === 0 && col("vec_id") =!= 0)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            transform(col("embedding"), x => -x).as("embedding")))
          .withColumn("ver", lit(1L)), keys, "pb", "ver", retain = 4)
      graft.streaming.CdfSource.pollOnce(s, tbl, keys, feedDir)
      operators.Upsert.mergeIntoManifested(s, tbl,
        shaped(emb.filter(col("vec_id") % 3 === 0 && col("vec_id") =!= 0)
          .select(col("vec_id"),
            transform(col("embedding"), x => -x).as("embedding")))
          .withColumn("ver", lit(2L)), keys, "pb", "ver", retain = 4)
      graft.streaming.CdfSource.pollOnce(s, tbl, keys, feedDir)
      operators.Upsert.deleteKeysFromManifested(s, tbl,
        shaped(emb.filter(col("vec_id") % 7 === 0 && col("vec_id") =!= 0))
          .select(col("pb"), col("vec_id")), keys, "pb", retain = 4)
      graft.streaming.CdfSource.pollOnce(s, tbl, keys, feedDir)
      val sq = graft.streaming.IndexSink.startLsh(
        graft.streaming.CdfSource.feedStream(s, tbl, keys, feedDir),
        idx, "vec_id", "embedding", ckpt)
      if (!sq.awaitTermination(300000L)) {
        sq.stop()
        throw new IllegalStateException(
          "x_stream_lsh_cdc: lsh stream did not drain within 300s")
      }
      idx.search("vec_id", "embedding", q, k = 10)
        .orderBy(col("score").desc, col("vec_id"))
    }),

    "x_sim_filtered" -> ((s, dir) => {
      // FILTERED ANN (the "similar AND attribute" production shape):
      // the predicate evaluates against the rows the index stores and
      // pushes into the pruned cell scan; with nprobe = every cell the
      // result is exactly brute-force top-k over the predicate's
      // survivors, so it hash-checks against the restricted oracle.
      // The selective-predicate recall problem is the adaptive
      // variant's job (searchWhereAdaptive, IvfFilterSpec).
      val emb = t(s, dir, "embeddings")
      val q = queryVector(emb)
      val idx = ivfIndexFor(s, dir, emb)
      idx.searchWhere("vec_id", "embedding", q, k = 10,
          col("vec_id") % 3 === 1, nprobe = IvfK)
        .orderBy(col("score").desc, col("vec_id"))
    }),

    "x_sim_ivf_probe" -> ((s, dir) => {
      // pruned probe: only the query's nearest cell partition is read —
      // the scale path. Hash-checked: the oracle re-derives cell choice
      // and scores from the SAME on-disk index artifacts (see
      // ivfProbeOracleSql)
      val emb = t(s, dir, "embeddings")
      val q = queryVector(emb)
      val idx = ivfIndexFor(s, dir, emb)
      idx.search("vec_id", "embedding", q, k = 10, nprobe = 1)
        .filter(col("vec_id") =!= 0)
        .orderBy(col("score").desc, col("vec_id"))
    }),

    "x_feature_dimstats" -> ((s, dir) =>
      // feature-prep profile: per-dimension mean/std of the embedding
      // corpus from exact integer moments (1e-6 quantization, DECIMAL
      // sums, one well-defined decimal→double conversion) — the
      // standardization / SQ-scale / PQ-balance input, deterministic on
      // any engine or partition order.
      Similarity.dimStats(t(s, dir, "embeddings"), "embedding")
        .orderBy(col("dim"))),

    "x_sim_pq" -> ((s, dir) => {
      // product quantization + ADC (FAISS PQ shape): corpus vectors
      // live as 8-byte code words (32x compression at dim 64); the
      // candidate pass scans ONLY the codes (approx score = 8 lookup
      // hits against the query's codeword dot table, a flat codegen'd
      // expression), and the float column serves just the `rerank`
      // survivors. Search determinism never depends on k-means
      // internals: the oracle replays ADC + re-rank from the stored
      // codebook/codes artifacts, with the ADC total re-rounded to 6dp
      // on both sides (sum of 6dp multiples — erases addition-order
      // noise).
      val emb = t(s, dir, "embeddings")
      val q = queryVector(emb)
      val idx = pqIndexFor(s, dir, emb)
      idx.search(emb, "vec_id", "embedding", q, k = 11, rerank = 44)
        .filter(col("vec_id") =!= 0)
        .orderBy(col("score").desc, col("vec_id"))
        .limit(10)
    }),

    "x_sim_ivfpq" -> ((s, dir) => {
      // IVF x PQ with residual encoding (the FAISS IVFPQ shape): the
      // probed cell's m-byte residual codes are the only candidate
      // bytes read (partition-pruned); ADC ranks IP(q, residual)
      // within the cell (the per-cell IP(q, centroid) constant rides
      // along for multi-cell probes); exact cosine re-ranks `rerank`
      // survivors from the float cells. Oracle replays everything from
      // the stored artifacts.
      // nprobe=2, rerank=8k: RecallCheck-tuned — at rerank 80+ the
      // composite recall REACHES the float-probe ceiling (0.49/0.515 vs
      // ceiling 0.525/0.515 at sf0.1/0.01), i.e. the residual-PQ loss
      // is closed and the budget knob left is the coarse quantizer;
      // nprobe 1→2 buys +0.15 recall for one more pruned partition.
      // Multi-cell also exercises the per-cell IP(q, centroid) constant
      // in the ADC rank, which nprobe=1 leaves untested.
      val emb = t(s, dir, "embeddings")
      val q = queryVector(emb)
      val comp = ivfPqFor(s, dir, emb)
      comp.search("vec_id", "embedding", q, k = 11, rerank = 88,
          nprobe = 2)
        .filter(col("vec_id") =!= 0)
        .orderBy(col("score").desc, col("vec_id"))
        .limit(10)
    }),

    "x_sim_ivf_drift" -> ((s, dir) => {
      // index-maintenance trigger: cosine between each cell's stored
      // (training-time) centroid and its CURRENT mean — the signal that
      // schedules a quantizer re-train under the frozen-centroid append
      // path. k-row output; the per-(cell,dim) means partial-aggregate
      // map-side. Oracle recomputes both vectors from the artifacts.
      val emb = t(s, dir, "embeddings")
      ivfIndexFor(s, dir, emb).drift("embedding", minCosine = 0.999999)
        .orderBy(col("cell"))
    }),

    "x_sim_ivf_sq" -> ((s, dir) => {
      // IVF x SQ8 (the FAISS IVF-SQ composition): cell pruning as in
      // x_sim_ivf_probe, then the candidate pass ranks the probed cell
      // by INT8 dot over the quantized sibling table (4x fewer vector
      // bytes, same partition pruning) and only `rerank` rows hit the
      // float column. Oracle replays cell choice, quantization (scale
      // re-derived from the same cells artifact), candidate cut, and
      // re-rank. k=11/rerank=44: the query row rides along until the
      // final filter, as in x_sim_lsh_index.
      val emb = t(s, dir, "embeddings")
      val q = queryVector(emb)
      val idx = ivfIndexFor(s, dir, emb)
      idx.ensureSq("vec_id", "embedding")
      idx.searchQuantized("vec_id", "embedding", q, k = 11, rerank = 44)
        .filter(col("vec_id") =!= 0)
        .orderBy(col("score").desc, col("vec_id"))
        .limit(10)
    }),

    // ── LLM-pipeline extensions: multimodal columns ──────────────────
    "x_sim_knn" -> ((s, dir) => {
      // blocked kNN join: top-3 same-label neighbors per anchor, ranked
      // by the k-bounded GroupTopK aggregator over triangle sub-buckets
      // (no window over the pair product). Anchors subsampled for output
      // size; the filter is on the aggregation key, so rank-then-filter
      // ≡ filter-then-rank.
      val emb = t(s, dir, "embeddings").filter(col("vec_id") =!= 0)
        .withColumn("embedding", col("embedding").cast("array<double>"))
      Similarity.blockKnn(emb, "vec_id", "embedding", "label", k = 3)
        .filter(col("id_a") % 50 === 0)
        .orderBy(col("id_a"), col("score").desc, col("id_b"))
    }),

    "x_sim_knn_ivf" -> ((s, dir) => {
      // label-FREE kNN join: blocking comes from the IVF index's learned
      // cells (real corpora carry no label column) — each anchor's
      // candidates are its cell's members, ranked by the same k-bounded
      // aggregation path. The oracle replays cell blocking and scoring
      // from the on-disk cell artifact, so the gate hash-checks.
      val idx = ivfIndexFor(s, dir, t(s, dir, "embeddings"))
      Similarity.blockKnn(idx.cells().filter(col("vec_id") =!= 0),
          "vec_id", "embedding", "cell", k = 3)
        .filter(col("id_a") % 50 === 0)
        .orderBy(col("id_a"), col("score").desc, col("id_b"))
    }),

    "x_sim_hard_negatives" -> ((s, dir) => {
      // contrastive-training hard-negative mining: each anchor's most
      // similar NON-duplicates — the informative examples a contrastive
      // loss wants. Same cell-blocked k-bounded ranking as the kNN
      // join, with the duplicate band (score >= 0.4, the semantic-dedup
      // threshold) excluded BELOW the aggregator so an anchor whose
      // nearest neighbors are all duplicates still yields negatives.
      val idx = ivfIndexFor(s, dir, t(s, dir, "embeddings"))
      Similarity.blockKnn(idx.cells().filter(col("vec_id") =!= 0),
          "vec_id", "embedding", "cell", k = 3, maxScore = 0.4)
        .filter(col("id_a") % 50 === 0)
        .orderBy(col("id_a"), col("score").desc, col("id_b"))
    }),

    "x_mm_meta" -> ((s, dir) => {
      Multimodal.withMeta(
          Multimodal.asMedia(t(s, dir, "documents"), "doc_id", "text"))
        .select(col("media_id"), col("n_bytes"), col("content_md5"),
          col("first_byte"))
        .orderBy(col("media_id"))
    }),

    "x_mm_decode" -> ((s, dir) => {
      // REAL batched decode: payloads are actual BMP/WAV containers (the
      // on-disk media artifact), HeaderCodec sniffs magic and parses the
      // headers — byte arithmetic the oracle replays from the very same
      // parquet via hex-string math (mmDecodeOracleSql), so the gate
      // hash-checks end-to-end
      Multimodal.decodeBatched(
          Multimodal.mediaTable(t(s, dir, "documents"), "doc_id", "text",
            artifactBase(dir)),
          batchSize = 256)
        .toDF()
        .orderBy(col("media_id"))
    }),

    "x_mm_frames" -> ((s, dir) =>
      // frame sampling over decoded media: every 3rd frame index (video
      // keyframe / audio window shape — one row per sampled frame, BMP
      // rows contribute their single frame). The oracle re-derives
      // n_frames from the same media artifact's bytes and replays the
      // stride explode.
      Multimodal.sampleFrames(
          Multimodal.decodeBatched(
            Multimodal.mediaTable(t(s, dir, "documents"), "doc_id", "text",
              artifactBase(dir)),
            batchSize = 256),
          stride = 3)
        .orderBy(col("media_id"), col("frame_idx"))),

    "x_mm_resize" -> ((s, dir) =>
      // resize planning (thumbnailer shape): decoded image dims clamped
      // to an 8px bounding box preserving aspect; audio rows pass over.
      // Oracle replays the arithmetic from the artifact's bytes — with
      // floor() before its INT cast, since DuckDB CAST rounds where
      // Spark's cast truncates.
      Multimodal.resized(
          Multimodal.decodeBatched(
            Multimodal.mediaTable(t(s, dir, "documents"), "doc_id", "text",
              artifactBase(dir)),
            batchSize = 256),
          maxSide = 8)
        .orderBy(col("media_id"))),

    "x_mm_image_stats" -> ((s, dir) =>
      // image featurization: per-channel exact integer color sums over
      // the BMP pixels, row padding skipped via the header's 4-byte
      // stride; WAV rows drop. Oracle replays the pixel walk from the
      // artifact's bytes with dynamic hex positions.
      Multimodal.imageChannelStats(
          Multimodal.mediaTable(t(s, dir, "documents"), "doc_id", "text",
            artifactBase(dir)))
        .orderBy(col("media_id"), col("channel"))),

    "x_mm_phash" -> ((s, dir) =>
      // perceptual image hashing (dHash): 9×8 nearest-neighbor
      // luminance grid → 64 adjacent-cell comparison bits per BMP —
      // the visual near-dup signature that feeds the same Hamming
      // pairing machinery as text SimHash. Exact integer sampling and
      // b+g+r luminance, so the oracle replays every bit from the
      // artifact's bytes.
      Multimodal.imageDHash(
          Multimodal.mediaTable(t(s, dir, "documents"), "doc_id", "text",
            artifactBase(dir)))
        .orderBy(col("media_id"))),

    "x_mm_neardup" -> ((s, dir) =>
      // image near-dup pairs: the dHash signatures feed the SAME
      // chunk-blocked Hamming machinery as text SimHash (pigeonhole-
      // exhaustive at maxDist=3, identical-signature collapse absorbs
      // the flat-image hot bucket) — multimodal dedup with zero new
      // join code. Oracle = blocking-free all-pairs Hamming over the
      // replayed hashes.
      Dedup.simhashPairsFromSignatures(
          Multimodal.imageDHash(
            Multimodal.mediaTable(t(s, dir, "documents"), "doc_id",
              "text", artifactBase(dir)))
            .select(col("media_id").as("id"), col("dhash").as("sim")),
          maxDist = 3)
        .orderBy(col("id_a"), col("id_b"))),

    "x_mm_audio_energy" -> ((s, dir) =>
      // frame-level audio feature extraction (VAD/loudness profile):
      // per 16-frame window, Σ|16-bit sample| over all channels as
      // exact integer sums; the RIFF walk discovers fmt /data honestly,
      // BMP rows drop. Oracle replays the signed-sample arithmetic from
      // the artifact's bytes via dynamic hex positions.
      Multimodal.audioFrameEnergy(
          Multimodal.mediaTable(t(s, dir, "documents"), "doc_id", "text",
            artifactBase(dir)),
          windowFrames = 16)
        .orderBy(col("media_id"), col("win"))))

  /** Unique memory-sink names for the streaming gate: Bench re-runs a
    * gate several times per process and memory sinks are per-name. */
  private val streamSinkId = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Deterministic query vector: embedding of vec_id=0 (driver-side point
    * lookup, promoted to double). */
  /** The gates' fixed probe vector (vec_id 0), fetched once per sf dir:
    * testdata is immutable within a run, and re-scanning the embeddings
    * table for the same constant was one full Spark job of fixed
    * overhead on EVERY ANN search gate. */
  /** Drop every cache holding SESSION-BOUND objects (index instances
    * carry their SparkSession; cached frames carry their context) —
    * required before a SparkContext recycle (Bench's
    * SPARK_GRAFT_RECYCLE_EVERY probe leg) or the next gate invocation
    * would probe through a stopped context. On-disk artifacts are
    * untouched: the rebuilt wrappers find them via their _SUCCESS /
    * epoch certificates and skip the build. */
  def resetSessionCaches(): Unit = {
    queryVecCache.clear()
    ivfBuilt.clear(); ivfRebalBuilt.clear(); ivfDelBuilt.clear()
    pqBuilt.clear(); ivfpqBuilt.clear()
    lshBuilt.clear(); bqBuilt.clear()
    bqDelBuilt.clear(); lshDelBuilt.clear()
    ivfCdcBuilt.clear(); lshCdcBuilt.clear(); ivfTaggedBuilt.clear()
    lshTaggedBuilt.clear()
  }

  /** CDC-maintained IVF index for the x_sim_ivf_cdc gate — its OWN
    * artifact dir (the feed's mutations must never leak into the
    * shared or probe-replayed indexes). Build-once per process AND
    * across JVMs via the epoch certificate; the feed applications on
    * top are content-token exactly-once, so re-running the gate
    * re-applies them as no-ops. */
  private val ivfCdcBuilt =
    scala.collection.concurrent.TrieMap.empty[String, operators.IvfIndex]
  private def ivfCdcFor(s: SparkSession, dir: String,
                        snapshot: => DataFrame): operators.IvfIndex =
    ivfCdcBuilt.getOrElseUpdate(dir, {
      val idx = new operators.IvfIndex(s,
        s"${artifactBase(dir)}/ivf_cdc_k$IvfK")
      if (idx.epoch().isEmpty)
        idx.build(snapshot, "vec_id", "embedding", k = IvfK,
          iters = IvfIters, trainSample = IvfTrain)
      idx
    })

  /** Same contract as [[ivfCdcFor]], one index dir per gate: the
    * in-place-update gate (`tag = "upd"`) and the live-streaming gate
    * (`tag = "stream"`) mutate their indexes through different change
    * histories, so they must never share an artifact. */
  private val ivfTaggedBuilt =
    scala.collection.concurrent.TrieMap.empty[(String, String),
      operators.IvfIndex]
  private def ivfTaggedFor(s: SparkSession, dir: String, tag: String,
                           snapshot: => DataFrame): operators.IvfIndex =
    ivfTaggedBuilt.getOrElseUpdate((dir, tag), {
      val idx = new operators.IvfIndex(s,
        s"${artifactBase(dir)}/ivf_${tag}_k$IvfK")
      if (idx.epoch().isEmpty)
        idx.build(snapshot, "vec_id", "embedding", k = IvfK,
          iters = IvfIters, trainSample = IvfTrain)
      idx
    })

  private val queryVecCache =
    scala.collection.concurrent.TrieMap.empty[String, Seq[Double]]

  private def queryVector(emb: DataFrame): Seq[Double] = {
    val key = emb.queryExecution.analyzed.semanticHash().toString
    queryVecCache.getOrElseUpdate(key,
      emb.filter(col("vec_id") === 0).select(col("embedding"))
        .head().getSeq[Float](0).map(_.toDouble))
  }

  /** IVF gate config — baked into the artifact path so a parameter or
    * training-semantics change can never read a stale index. */
  private val IvfK = 8; private val IvfIters = 3; private val IvfTrain = 65536

  /** On-disk home of the IVF index for an sf dir — deterministic per dir
    * (and across JVMs: String.hashCode is specified), so the oracle SQL
    * can read the same artifacts the engine probes. */
  def ivfBasePath(dir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_ivf_" +
      java.lang.Long.toHexString(java.util.Objects.hash(dir).toLong & 0xffffffffL) +
      s"_k${IvfK}i${IvfIters}t$IvfTrain"

  /** Build (or reuse) the IVF index for an sf dir. Build-once across
    * JVMs: the epoch file is written last, so its presence certifies a
    * complete index (and keeps the epoch stable for derived artifacts —
    * an unconditional rebuild would stamp a fresh token every process
    * and read every sibling as stale). */
  private val ivfBuilt = scala.collection.concurrent.TrieMap.empty[String, operators.IvfIndex]

  /** Build (or reuse) the REBALANCED IVF artifact for the maintenance
    * gate: separate dir from [[ivfIndexFor]]'s index (whose centroid
    * layout the probe-replay oracle reads — splitting THAT would break
    * its SQL), coarse k=4 build, then one splitHotCells pass. The
    * `cv > 0` epoch check is the across-JVM maintenance-done guard;
    * split parameters are baked into the path like every artifact. */
  private val ivfRebalBuilt = scala.collection.concurrent.TrieMap.empty[String, operators.IvfIndex]
  private def ivfRebalFor(s: SparkSession, dir: String,
                          emb: DataFrame): operators.IvfIndex =
    ivfRebalBuilt.getOrElseUpdate(dir, {
      val idx = new operators.IvfIndex(s,
        s"${artifactBase(dir)}/ivf_rebal_k4f015")
      if (!idx.epoch().exists(_.cv > 0)) {
        if (idx.epoch().isEmpty)
          idx.build(emb, "vec_id", "embedding", k = 4, iters = IvfIters,
            trainSample = IvfTrain)
        idx.splitHotCells("vec_id", "embedding", maxFraction = 0.15)
      }
      idx
    })
  private def ivfIndexFor(s: SparkSession, dir: String,
                          emb: DataFrame): operators.IvfIndex =
    ivfBuilt.getOrElseUpdate(dir, {
      val idx = new operators.IvfIndex(s, ivfBasePath(dir))
      if (idx.epoch().isEmpty)
        idx.build(emb, "vec_id", "embedding", k = IvfK, iters = IvfIters,
          trainSample = IvfTrain)
      idx
    })

  /** Tombstoned index for the delete gate — its OWN dir (the shared
    * index must stay delete-free: the probe-replay oracle reads its
    * cells verbatim), built once, then every %7 id deleted. The delete
    * replays as a no-op across JVMs via the content-derived token, so
    * reusing the artifact never double-applies. */
  private val ivfDelBuilt = scala.collection.concurrent.TrieMap.empty[String, operators.IvfIndex]
  private def ivfDeleteFor(s: SparkSession, dir: String,
                           emb: DataFrame): operators.IvfIndex =
    ivfDelBuilt.getOrElseUpdate(dir, {
      val idx = new operators.IvfIndex(s,
        s"${artifactBase(dir)}/ivf_del_k$IvfK")
      if (idx.epoch().isEmpty)
        idx.build(emb, "vec_id", "embedding", k = IvfK, iters = IvfIters,
          trainSample = IvfTrain)
      idx.delete(emb.filter(col("vec_id") % 7 === 0), "vec_id")
      idx
    })

  /** PQ gate config: 8 subspaces × 64 codewords over the 64-dim corpus
    * (8-byte codes, 32× compression). 64 codewords doubles measured
    * recall vs 16 on this corpus at the same code size (RecallCheck).
    * Both gates run ROTATED (OPQ-lite: PCA + balanced eigenvalue
    * allocation): the flat PQ gate rotates raw vectors; the IVFPQ gate
    * rotates RESIDUALS (orthonormal R preserves inner products, so ADC
    * on R·r against R·q estimates IP(q, r) — the oracle replays the
    * stored 1e6-scaled matrix in exact integer arithmetic). */
  private val PqM = 8; private val PqK = 64; private val PqTrain = 65536
  private val PqSubDim = 64 / PqM // the corpus is dim-64

  /** On-disk home of the sf dir's PQ index — parameter-keyed, so a
    * config or training-semantics change can never read a stale
    * artifact. Public: Verify resolves `__GRAFT_PQ__` with it. */
  def pqBasePath(dir: String): String =
    s"${artifactBase(dir)}/pq_m${PqM}_k${PqK}_t${PqTrain}_opq"

  /** Build (or reuse) the PQ index. On-disk `_SUCCESS` short-circuits
    * rebuilds across JVMs (codes are written last, so it implies the
    * rotation + codebook artifacts too). */
  private val pqBuilt = scala.collection.concurrent.TrieMap.empty[String, operators.PqIndex]
  private def pqIndexFor(s: SparkSession, dir: String,
                         emb: DataFrame): operators.PqIndex =
    pqBuilt.getOrElseUpdate(dir, {
      val idx = new operators.PqIndex(s, pqBasePath(dir))
      val done = new org.apache.hadoop.fs.Path(
        s"${pqBasePath(dir)}/pq_codes/_SUCCESS")
      if (!done.getFileSystem(s.sparkContext.hadoopConfiguration).exists(done))
        idx.build(emb, "vec_id", "embedding", m = PqM, k = PqK, iters = 3,
          trainSample = PqTrain, rotate = true)
      idx
    })

  /** On-disk home of the sf dir's IVFPQ residual codes — parameter-keyed
    * like the PQ path (`_opq`: residuals are rotated before the subspace
    * split, so the artifacts are incompatible with an unrotated build).
    * Public: Verify resolves `__GRAFT_IVFPQ__`. */
  def ivfpqBasePath(dir: String): String =
    s"${artifactBase(dir)}/ivfpq_m${PqM}_k${PqK}_t${PqTrain}_opq"

  private val ivfpqBuilt = scala.collection.concurrent.TrieMap.empty[String, operators.IvfPq]
  private def ivfPqFor(s: SparkSession, dir: String,
                       emb: DataFrame): operators.IvfPq =
    ivfpqBuilt.getOrElseUpdate(dir, {
      val comp = new operators.IvfPq(s, ivfIndexFor(s, dir, emb),
        ivfpqBasePath(dir))
      // epoch-checked build-once: stale codes (parent rebuilt/appended
      // out-of-band) self-heal with a rebuild instead of serving a
      // silently-shrunken candidate set
      if (!comp.isFresh())
        comp.build("vec_id", "embedding", m = PqM, k = PqK, iters = 3,
          trainSample = PqTrain, rotate = true)
      comp
    })

  /** Bucketed-layout twin of a parquet fact table, build-once per
    * (sf dir, table): catalog entry re-bound idempotently, data written
    * once (one file per bucket) under the artifact base. The table name
    * carries the dir hash so two sf dirs never collide in the shared
    * session catalog. */
  private def bucketedTable(s: SparkSession, dir: String, name: String,
                            key: String): DataFrame = {
    val id = java.lang.Long.toHexString(
      java.util.Objects.hash(dir).toLong & 0xffffffffL)
    val tbl = s"graft_bkt_${name}_$id"
    operators.Bucketing.ensureBucketedTable(s, tbl, t(s, dir, name), key,
      buckets = 8, s"${artifactBase(dir)}/bucketed/${name}_b8")
    s.table(tbl)
  }

  /** Plane config shared by the x_sim_lsh gate, the persistent index,
    * and both oracles — one source of truth. */
  private val LshDim = 64; private val LshTables = 4
  private val LshBits = 8; private val LshSeed = 42L

  /** On-disk rows path of the sf dir's LSH forest (parameter-keyed —
    * stale-proof). Public: Verify resolves `__GRAFT_LSH__` with it. */
  def lshRowsPath(dir: String): String =
    operators.LshIndex.rowsPath(s"${artifactBase(dir)}/lsh",
      LshDim, LshTables, LshBits, LshSeed)

  /** Build (or reuse) the persistent LSH forest for an sf dir — same
    * plane config as `x_sim_lsh`, artifact under the sf dir's artifact
    * base (on-disk `_SUCCESS` short-circuits rebuilds across JVMs; the
    * map only skips the check within one). */
  private val lshBuilt = scala.collection.concurrent.TrieMap.empty[String, operators.LshIndex]
  private val bqBuilt =
    scala.collection.concurrent.TrieMap.empty[String, operators.BqIndex]
  private def bqIndexFor(s: SparkSession, dir: String,
                         emb: DataFrame): operators.BqIndex =
    bqBuilt.getOrElseUpdate(dir, {
      val idx = new operators.BqIndex(s, s"${artifactBase(dir)}/bq")
      if (!idx.exists()) idx.build(emb, "vec_id", "embedding")
      idx
    })

  private def lshIndexFor(s: SparkSession, dir: String,
                          emb: DataFrame): operators.LshIndex =
    lshBuilt.getOrElseUpdate(dir, {
      val idx = new operators.LshIndex(s, s"${artifactBase(dir)}/lsh",
        dim = LshDim, numTables = LshTables, bitsPerTable = LshBits,
        seed = LshSeed)
      idx.build(emb, "vec_id", "embedding")
      idx
    })

  /** Tombstoned twins of the BQ / LSH artifacts for the delete gates —
    * each in its OWN dir (the shared indexes must stay delete-free:
    * their oracles replay the full corpus), built once, then every %7
    * id deleted. The deletes replay as no-ops across JVMs via the
    * content-derived tombstone token, so reusing the artifact never
    * double-applies — same protocol as [[ivfDeleteFor]]. */
  private val bqDelBuilt =
    scala.collection.concurrent.TrieMap.empty[String, operators.BqIndex]
  private def bqDeleteFor(s: SparkSession, dir: String,
                          emb: DataFrame): operators.BqIndex =
    bqDelBuilt.getOrElseUpdate(dir, {
      val idx = new operators.BqIndex(s, s"${artifactBase(dir)}/bq_del")
      if (!idx.exists()) idx.build(emb, "vec_id", "embedding")
      idx.delete(emb.filter(col("vec_id") % 7 === 0), "vec_id")
      idx
    })

  private val lshDelBuilt =
    scala.collection.concurrent.TrieMap.empty[String, operators.LshIndex]
  private def lshDeleteFor(s: SparkSession, dir: String,
                           emb: DataFrame): operators.LshIndex =
    lshDelBuilt.getOrElseUpdate(dir, {
      val idx = new operators.LshIndex(s, s"${artifactBase(dir)}/lsh_del",
        dim = LshDim, numTables = LshTables, bitsPerTable = LshBits,
        seed = LshSeed)
      idx.build(emb, "vec_id", "embedding")
      idx.delete(emb.filter(col("vec_id") % 7 === 0), "vec_id")
      idx
    })

  /** CDC-maintained LSH forest for the x_sim_lsh_cdc gate — own dir,
    * build-once, feed applications content-token exactly-once (same
    * contract as [[ivfCdcFor]]). */
  private val lshCdcBuilt =
    scala.collection.concurrent.TrieMap.empty[String, operators.LshIndex]
  private def lshCdcFor(s: SparkSession, dir: String,
                        snapshot: => DataFrame): operators.LshIndex =
    lshCdcBuilt.getOrElseUpdate(dir, {
      val idx = new operators.LshIndex(s, s"${artifactBase(dir)}/lsh_cdc",
        dim = LshDim, numTables = LshTables, bitsPerTable = LshBits,
        seed = LshSeed)
      idx.build(snapshot, "vec_id", "embedding")
      idx
    })

  /** [[lshCdcFor]] with a per-gate artifact dir — the streaming gate's
    * forest mutates through a different change history than the batch
    * `_cdc` gate's, so they must never share an artifact. */
  private val lshTaggedBuilt =
    scala.collection.concurrent.TrieMap.empty[(String, String),
      operators.LshIndex]
  private def lshTaggedFor(s: SparkSession, dir: String, tag: String,
                           snapshot: => DataFrame): operators.LshIndex =
    lshTaggedBuilt.getOrElseUpdate((dir, tag), {
      val idx = new operators.LshIndex(s,
        s"${artifactBase(dir)}/lsh_$tag",
        dim = LshDim, numTables = LshTables, bitsPerTable = LshBits,
        seed = LshSeed)
      idx.build(snapshot, "vec_id", "embedding")
      idx
    })

  /** DuckDB oracle for `x_sim_lsh`, generated with the SAME seeded
    * hyperplanes the engine uses, pasted as literal VALUES rows — the
    * full LSH pipeline (bucket assignment, candidate filter, exact
    * re-rank) is then SQL-expressible and the query hash-checks instead
    * of rows-only. Column `w` is the bit weight 2^b, which doubles as the
    * per-plane key. */
  /** The x_sim_lsh / x_sim_lsh_index plane set (dim 64, 4 tables × 8
    * bits, seed 42) as SQL VALUES rows — regenerated with the same
    * seeded generator the engine uses. Column `w` is the bit weight 2^b,
    * which doubles as the per-plane key. */
  private lazy val lshPlaneValues: String = {
    val planes = operators.Similarity.hyperplanes(LshDim, LshTables,
      LshBits, LshSeed)
    (for {
      (tbl, t) <- planes.zipWithIndex
      (plane, b) <- tbl.zipWithIndex
      (p, i) <- plane.zipWithIndex
    } yield s"($t,${1L << b},${i + 1},$p)").mkString(",")
  }

  /** From-scratch cluster SQL (LSH-threshold pairs → recursive-CTE
    * reachability → min label) over the FULL documents table — shared
    * by `x_dedup_cluster` (artifact-served pairs) and
    * `x_dedup_cluster_incr` (old labels + contracted delta iteration):
    * both paths' claim is equality with this computation. */
  private def clusterOracleSql: String =
    """WITH RECURSIVE tok AS (SELECT doc_id, string_split(text, ' ') AS t
                              FROM documents),
           sh0 AS (SELECT DISTINCT doc_id,
                          unnest(list_transform(
                            generate_series(1, greatest(len(t)-2, 0)),
                            i -> array_to_string(t[i:i+2], ' '))) AS s
                   FROM tok),
           sh AS (SELECT doc_id, s FROM sh0
                  QUALIFY count(*) OVER (PARTITION BY s) <= 1000),
           sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
           inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
                     FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                     GROUP BY 1, 2),
           pairs AS (SELECT id_a, id_b FROM inter
                     JOIN sizes x ON id_a = x.doc_id
                     JOIN sizes y ON id_b = y.doc_id
                     WHERE round(c * 1.0 / (x.n + y.n - c), 6) >= 0.5),
           edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                     UNION ALL SELECT id_b, id_a FROM pairs),
           reach(src, dst) AS (
             SELECT doc_id, doc_id FROM documents
             UNION
             SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst)
         SELECT src AS id, min(dst) AS comp FROM reach
         GROUP BY src ORDER BY id"""

  /** [[clusterOracleSql]] with the cluster-keyed split layered on top —
    * md5(comp) against the 0.2 threshold 0x33333333, the same
    * fixed-point [[graft.operators.Sampling.rateThreshold]] derives. */
  private def leakfreeSplitOracleSql: String =
    clusterOracleSql.replace(
      """SELECT src AS id, min(dst) AS comp FROM reach
         GROUP BY src ORDER BY id""",
      """, comp AS (SELECT src AS id, min(dst) AS comp FROM reach
                    GROUP BY src)
         SELECT id, comp,
                CASE WHEN substr(md5(CAST(comp AS VARCHAR)), 1, 8)
                       < '33333333'
                     THEN 'heldout' ELSE 'train' END AS split
         FROM comp ORDER BY id""")

  /** From-scratch duplicated-span SQL over the full documents table —
    * shared by `x_dedup_spans` (direct path) and `x_dedup_spans_incr`
    * (artifact-fed refresh), because the refresh's correctness claim IS
    * equality with the from-scratch computation. */
  private def spansOracleSql: String = {
    val w = 8
    s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t
                     FROM documents),
            win AS (SELECT doc_id,
                           unnest(generate_series(1, len(t) - ${w - 1})) AS pos,
                           unnest(list_transform(
                             generate_series(1, len(t) - ${w - 1}),
                             i -> md5(array_to_string(t[i:i+${w - 1}], ' ')))) AS k
                    FROM tok WHERE len(t) >= $w),
            dup AS (SELECT k FROM win GROUP BY k HAVING count(*) >= 2),
            m AS (SELECT doc_id, pos FROM win
                  WHERE k IN (SELECT k FROM dup)),
            mk AS (SELECT doc_id, pos,
                          CASE WHEN pos > coalesce(lag(pos) OVER
                              (PARTITION BY doc_id ORDER BY pos), -1000000)
                              + $w THEN 1 ELSE 0 END AS brk
                   FROM m),
            g AS (SELECT doc_id, pos,
                         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS UNBOUNDED PRECEDING) AS grp
                  FROM mk)
       SELECT doc_id, min(pos) AS span_start, max(pos) + $w AS span_end
       FROM g GROUP BY doc_id, grp
       ORDER BY doc_id, span_start"""
  }

  private def lshOracleSql: String = {
    s"""WITH planes(t, w, i, p) AS (VALUES $lshPlaneValues),
       q AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS qx,
                    generate_subscripts(embedding, 1) AS i
             FROM embeddings WHERE vec_id = 0),
       e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                    generate_subscripts(embedding, 1) AS i
             FROM embeddings WHERE vec_id <> 0),
       ed AS (SELECT e.vec_id, pl.t, pl.w, sum(e.x * pl.p) AS d
              FROM e JOIN planes pl ON e.i = pl.i GROUP BY 1, 2, 3),
       eb AS (SELECT vec_id, t,
                     sum(CASE WHEN d > 0 THEN w ELSE 0 END) AS bkt
              FROM ed GROUP BY 1, 2),
       qd AS (SELECT pl.t, pl.w, sum(q.qx * pl.p) AS d
              FROM q JOIN planes pl ON q.i = pl.i GROUP BY 1, 2),
       qb AS (SELECT t, sum(CASE WHEN d > 0 THEN w ELSE 0 END) AS bkt
              FROM qd GROUP BY 1),
       cand AS (SELECT DISTINCT eb.vec_id
                FROM eb JOIN qb ON eb.t = qb.t AND eb.bkt = qb.bkt),
       s AS (SELECT e.vec_id,
                    round(sum(e.x * q.qx) /
                      (sqrt(sum(e.x * e.x)) * sqrt(sum(q.qx * q.qx))), 6) AS score
             FROM e JOIN q ON e.i = q.i
             WHERE e.vec_id IN (SELECT vec_id FROM cand)
             GROUP BY 1)
       SELECT vec_id, score FROM s ORDER BY score DESC, vec_id LIMIT 10"""
  }

  /** DuckDB oracle for `x_sim_lsh_index`: the query's per-table buckets
    * are recomputed in SQL from the pasted planes, then joined against
    * the (tbl, bucket) partitions of the SAME on-disk LSH-forest rows
    * the engine probes; candidates are deduped and exact-re-ranked just
    * like the engine. `__GRAFT_LSH__` is substituted by Verify. */
  private def lshIndexOracleSql: String =
    s"""WITH planes(t, w, i, p) AS (VALUES $lshPlaneValues),
       q AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS qx,
                    generate_subscripts(embedding, 1) AS i
             FROM embeddings WHERE vec_id = 0),
       qd AS (SELECT pl.t, pl.w, sum(q.qx * pl.p) AS d
              FROM q JOIN planes pl ON q.i = pl.i GROUP BY 1, 2),
       qb AS (SELECT t, sum(CASE WHEN d > 0 THEN w ELSE 0 END) AS bkt
              FROM qd GROUP BY 1),
       cand AS (SELECT DISTINCT r.vec_id
                FROM read_parquet('__GRAFT_LSH__/*/*/*.parquet',
                                  hive_partitioning = 1) r
                JOIN qb ON CAST(r.tbl AS INT) = qb.t
                       AND CAST(r.bucket AS BIGINT) = qb.bkt
                WHERE r.vec_id <> 0),
       e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                    generate_subscripts(embedding, 1) AS i
             FROM embeddings WHERE vec_id <> 0),
       s AS (SELECT e.vec_id,
                    round(sum(e.x * q.qx) /
                      (sqrt(sum(e.x * e.x)) * sqrt(sum(q.qx * q.qx))), 6) AS score
             FROM e JOIN q ON e.i = q.i
             WHERE e.vec_id IN (SELECT vec_id FROM cand)
             GROUP BY 1)
       SELECT vec_id, score FROM s ORDER BY score DESC, vec_id LIMIT 10"""

  /** DuckDB has no base-16 `conv`: the numeric value of an 8-char
    * lowercase-hex expression re-derives as 8 strpos nibble terms
    * (exact integer arithmetic, < 2³² ≪ 2⁵³). */
  /** Shared oracle CTE for the DSIR gates: refit the hashed-unigram
    * log-ratio table (add-one smoothing, 6-dp micro-nat quantization —
    * the exact arithmetic [[graft.operators.Importance]] runs) and
    * score every document; exposes a `scores(doc_id, score_micro)`
    * relation. */
  private lazy val dsirScoresCte: String =
    s"""tok AS (SELECT doc_id, lang, t
                FROM (SELECT doc_id, lang,
                             unnest(string_split(text, ' ')) AS t
                      FROM documents)
                WHERE len(t) > 0),
        bk AS (SELECT doc_id, lang,
                      ${hexValSql("md5(t)")} % 1024 AS bkt
               FROM tok),
        tc AS (SELECT bkt, count(*) AS c FROM bk
               WHERE lang = 'en' GROUP BY 1),
        rc AS (SELECT bkt, count(*) AS c FROM bk GROUP BY 1),
        tot AS (SELECT CAST((SELECT count(*) FROM bk
                             WHERE lang = 'en') AS DOUBLE) AS tt,
                       CAST((SELECT count(*) FROM bk) AS DOUBLE) AS rt),
        gs AS (SELECT CAST(unnest(generate_series(0, 1023)) AS BIGINT)
                      AS bkt),
        w AS (SELECT gs.bkt,
                     CAST(round(round(ln(
                         ((coalesce(tc.c, 0) + 1.0) / (tt + 1024.0)) /
                         ((coalesce(rc.c, 0) + 1.0) / (rt + 1024.0))),
                       6) * 1000000.0, 0) AS BIGINT) AS lam
              FROM gs CROSS JOIN tot
              LEFT JOIN tc ON gs.bkt = tc.bkt
              LEFT JOIN rc ON gs.bkt = rc.bkt),
        ds AS (SELECT bk.doc_id,
                      CAST(sum(w.lam) AS BIGINT) AS score_micro
               FROM bk JOIN w ON bk.bkt = w.bkt GROUP BY 1),
        scores AS (SELECT d.doc_id,
                          CAST(coalesce(ds.score_micro, 0) AS BIGINT)
                            AS score_micro
                   FROM documents d
                   LEFT JOIN ds ON d.doc_id = ds.doc_id)"""

  /** One column's block of the a18_profile oracle: the KMV ndv replay
    * (same order statistics as a15) plus counts and native-typed
    * min/max rendered as VARCHAR. */
  private def profileColSql(c: String): String =
    s"""SELECT '$c' AS "column",
          (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_rows,
          (SELECT CAST(count(*) - count($c) AS BIGINT) FROM lineitem)
            AS n_nulls,
          (SELECT CAST(CASE WHEN count(*) >= 256
                            THEN 1095216660480 // max(h)
                            ELSE count(*) END AS BIGINT)
             FROM (SELECT h FROM
                     (SELECT DISTINCT
                        ${hexValSql(s"md5(CAST($c AS VARCHAR))")} AS h
                      FROM lineitem WHERE $c IS NOT NULL)
                   ORDER BY h LIMIT 256)) AS ndv_est,
          (SELECT CAST(min($c) AS VARCHAR) FROM lineitem) AS min_str,
          (SELECT CAST(max($c) AS VARCHAR) FROM lineitem) AS max_str"""

  /** Shared dHash replay CTE for the x_mm_phash / x_mm_neardup oracles:
    * ends in `dh(media_id, dhash BIGINT)`. Grid sampling, b+g+r
    * luminance and bit packing mirror [[graft.operators.Multimodal
    * .imageDHash]] exactly; the HUGEINT power table keeps the 64-bit
    * packing exact and the final CASE folds bit 63 into two's
    * complement before the BIGINT cast. */
  private def mmDHashOracleCte: String = {
    def bd(e: String) =
      s"(strpos('0123456789ABCDEF', substr(h, 2 * ($e) - 1, 1)) * 16 + " +
        s"strpos('0123456789ABCDEF', substr(h, 2 * ($e), 1)) - 17)"
    def bl(i: Int) = bd(i.toString)
    def le32(i: Int) = s"(${bl(i)} + 256 * ${bl(i + 1)} + " +
      s"65536 * ${bl(i + 2)} + 16777216 * ${bl(i + 3)})"
    val powers = (0 until 64)
      .map(i => s"($i, CAST('${BigInt(1) << i}' AS HUGEINT))")
      .mkString(", ")
    s"""WITH m AS (SELECT media_id, hex(content) AS h
                   FROM read_parquet('__GRAFT_MEDIA__/*.parquet')
                   WHERE substr(hex(content), 1, 4) = '424D'),
            d AS (SELECT media_id, h, ${le32(11)} AS off,
                         ${le32(19)} AS wd, ${le32(23)} AS ht
                  FROM m),
            d2 AS (SELECT *, (3 * wd + 3) - ((3 * wd + 3) % 4) AS stride
                   FROM d WHERE wd > 0 AND ht > 0),
            yy AS (SELECT media_id, h, off, wd, ht, stride,
                          unnest(generate_series(0, CAST(7 AS BIGINT)))
                            AS gy
                   FROM d2),
            xx AS (SELECT media_id, h, off, wd, ht, stride, gy,
                          unnest(generate_series(0, CAST(8 AS BIGINT)))
                            AS gx
                   FROM yy),
            lum AS (SELECT media_id, gy, gx,
                           ${bd("off + ((gy * ht) // 8) * stride + " +
      "3 * ((gx * wd) // 9) + 1")} +
                           ${bd("off + ((gy * ht) // 8) * stride + " +
      "3 * ((gx * wd) // 9) + 2")} +
                           ${bd("off + ((gy * ht) // 8) * stride + " +
      "3 * ((gx * wd) // 9) + 3")} AS lm
                    FROM xx),
            bits AS (SELECT media_id, gy, gx,
                            CASE WHEN lead(lm) OVER (
                                   PARTITION BY media_id, gy
                                   ORDER BY gx) > lm
                                 THEN 1 ELSE 0 END AS b
                     FROM lum QUALIFY gx < 8),
            pw(i, p) AS (VALUES $powers),
            s AS (SELECT media_id, sum(b * pw.p) AS raw
                  FROM bits JOIN pw ON pw.i = gy * 8 + gx
                  GROUP BY 1),
            dh AS (SELECT media_id,
                          CAST(CASE WHEN raw >=
                                 CAST('${BigInt(1) << 63}' AS HUGEINT)
                               THEN raw -
                                 CAST('${BigInt(1) << 64}' AS HUGEINT)
                               ELSE raw END AS BIGINT) AS dhash
                   FROM s)"""
  }

  private def hexValSql(expr: String): String =
    (0 until 8).map { i =>
      s"(strpos('0123456789abcdef', substr($expr, ${i + 1}, 1)) - 1) * " +
        s"${1L << (4 * (7 - i))}"
    }.mkString("(", " + ", ")")

  /** DuckDB oracle for the multiprobe gates: like [[lshIndexOracleSql]],
    * plus the Lv et al. perturbation-set sequence re-derived in SQL —
    * per table, candidate sets are the single bits UNION the bit pairs,
    * scored by their summed 6-dp-rounded |margins| (sums of identical
    * doubles are bit-identical in any IEEE engine) with ties broken by
    * the flip mask, exactly the engine's total order; the first
    * `probes-1` masks xor into the exact bucket and candidates come
    * from all probed buckets' partitions of the same on-disk forest. */
  private def lshMultiProbeOracleSql(probes: Int): String =
    s"""WITH planes(t, w, i, p) AS (VALUES $lshPlaneValues),
       q AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS qx,
                    generate_subscripts(embedding, 1) AS i
             FROM embeddings WHERE vec_id = 0),
       qd AS (SELECT pl.t, pl.w, sum(q.qx * pl.p) AS d
              FROM q JOIN planes pl ON q.i = pl.i GROUP BY 1, 2),
       qb AS (SELECT t, CAST(sum(CASE WHEN d > 0 THEN w ELSE 0 END)
                        AS BIGINT) AS bkt
              FROM qd GROUP BY 1),
       sub AS (SELECT t, w AS mask, round(abs(d), 6) AS score FROM qd
               UNION ALL
               SELECT a.t, a.w + b.w AS mask,
                      round(abs(a.d), 6) + round(abs(b.d), 6) AS score
               FROM qd a JOIN qd b ON a.t = b.t AND a.w < b.w),
       flips AS (SELECT t, mask FROM sub
                 QUALIFY row_number() OVER (PARTITION BY t
                   ORDER BY score, mask) <= ${probes - 1}),
       pb AS (SELECT t, bkt FROM qb
              UNION ALL
              SELECT qb.t, xor(qb.bkt, f.mask) AS bkt
              FROM qb JOIN flips f ON qb.t = f.t),
       cand AS (SELECT DISTINCT r.vec_id
                FROM read_parquet('__GRAFT_LSH__/*/*/*.parquet',
                                  hive_partitioning = 1) r
                JOIN pb ON CAST(r.tbl AS INT) = pb.t
                       AND CAST(r.bucket AS BIGINT) = pb.bkt
                WHERE r.vec_id <> 0),
       e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                    generate_subscripts(embedding, 1) AS i
             FROM embeddings WHERE vec_id <> 0),
       s AS (SELECT e.vec_id,
                    round(sum(e.x * q.qx) /
                      (sqrt(sum(e.x * e.x)) * sqrt(sum(q.qx * q.qx))), 6) AS score
             FROM e JOIN q ON e.i = q.i
             WHERE e.vec_id IN (SELECT vec_id FROM cand)
             GROUP BY 1)
       SELECT vec_id, score FROM s ORDER BY score DESC, vec_id LIMIT 10"""

  /** DuckDB oracle for `x_sim_ivf_probe`: reads the SAME on-disk index
    * the engine probes (centroids + cell-partitioned corpus) — the
    * k-means result is engine-specific, but once materialized it is just
    * parquet, so cell choice AND scoring are both independently
    * recomputed. `__GRAFT_IVF__` is substituted with the sf dir's index
    * path by Verify when it dumps oracle_sql.json. */
  private def ivfProbeOracleSql: String =
    """WITH q AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS qx,
                         generate_subscripts(embedding, 1) AS i
                  FROM embeddings WHERE vec_id = 0),
       c AS (SELECT cell, CAST(unnest(centroid) AS DOUBLE) AS cx,
                    generate_subscripts(centroid, 1) AS i
             FROM read_parquet('__GRAFT_IVF__/ivf_centroids/*.parquet')),
       cbest AS (SELECT cell FROM (
                   SELECT c.cell,
                          round(sum(c.cx * q.qx) /
                            (sqrt(sum(c.cx * c.cx)) * sqrt(sum(q.qx * q.qx))), 6) AS cs
                   FROM c JOIN q ON c.i = q.i GROUP BY c.cell)
                 ORDER BY cs DESC, cell LIMIT 1),
       m AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                    generate_subscripts(embedding, 1) AS i
             FROM read_parquet('__GRAFT_IVF__/ivf_cells/*/*.parquet',
                               hive_partitioning = 1)
             WHERE CAST(cell AS INTEGER) = (SELECT cell FROM cbest)),
       s AS (SELECT m.vec_id,
                    round(sum(m.x * q.qx) /
                      (sqrt(sum(m.x * m.x)) * sqrt(sum(q.qx * q.qx))), 6) AS score
             FROM m JOIN q ON m.i = q.i GROUP BY 1),
       top AS (SELECT vec_id, score FROM s
               ORDER BY score DESC, vec_id LIMIT 10)
       SELECT vec_id, score FROM top WHERE vec_id <> 0
       ORDER BY score DESC, vec_id"""

  /** DuckDB oracle for `x_mm_decode`: replays the header parse over the
    * SAME media artifact the engine decodes. Byte extraction is hex-string
    * arithmetic — `hex(content)` then per-byte nibble math — so BMP
    * little-endian width/height and the canonical WAV fmt/data fields are
    * all SQL-recomputable. (The generator guarantees canonical WAV chunk
    * layout; the engine's HeaderCodec walks chunks and does not rely on
    * it.) `__GRAFT_MEDIA__` is substituted by Verify. */
  /** Header-parse replay over the media artifact, shared by the decode
    * and frame-sampling oracles: one row per media with the decoded
    * metadata columns (no ORDER BY — callers wrap it). */
  /** Unrolled BPE retraining SQL: state st0 spells each dictionary word
    * with the engine's two-space separator invariant; level r derives
    * pair counts (lead window per word), the (n DESC, a, b) argmax, and
    * the next state via the identical boundary-preserving replace.
    * [[bpeLevelsSql]] is the shared WITH-body; the train gate reads the
    * merge rows m1..mk, the apply gate reads the FINAL state stk (a
    * word's tokenization IS its state after k merges). */
  private def bpeLevelsSql(k: Int): String = {
    val levels = (1 to k).map { r =>
      s"""tk$r AS (SELECT w, c,
                        unnest(string_split(trim(s), '  ')) AS t,
                        generate_subscripts(string_split(trim(s), '  '), 1)
                          AS pos
                 FROM st${r - 1}),
        pr$r AS (SELECT a, b, sum(c) AS n FROM (
                   SELECT w, c, t AS a,
                          lead(t) OVER (PARTITION BY w ORDER BY pos) AS b
                   FROM tk$r)
                 WHERE b IS NOT NULL GROUP BY 1, 2),
        m$r AS (SELECT a, b, n FROM pr$r ORDER BY n DESC, a, b LIMIT 1),
        st$r AS (SELECT w, c,
                        replace(s, ' ' || m.a || '  ' || m.b || ' ',
                                ' ' || m.a || m.b || ' ') AS s
                 FROM st${r - 1} CROSS JOIN m$r m)"""
    }.mkString(",\n        ")
    s"""wc AS (SELECT w, count(*) AS c FROM (
                      SELECT unnest(string_split(lower(text), ' ')) AS w
                      FROM documents)
                    WHERE len(w) > 0 GROUP BY 1),
        st0 AS (SELECT w, c,
                       '  ' || array_to_string(list_transform(
                         generate_series(1, len(w)),
                         i -> substr(w, i, 1)), '  ') || '  ' AS s
                FROM wc),
        $levels"""
  }

  private def bpeOracleSql(k: Int): String = {
    val out = (1 to k).map { r =>
      s"""SELECT $r AS rank, a AS lhs, b AS rhs, a || b AS merged,
                 CAST(n AS BIGINT) AS pair_count FROM m$r"""
    }.mkString("\n         UNION ALL ")
    s"""WITH ${bpeLevelsSql(k)}
       SELECT * FROM ($out) ORDER BY rank"""
  }

  /** The apply oracle: a word's tokenization is its final training
    * state; doc tokens re-assemble in word order via string_agg. */
  private def bpeApplyOracleSql(k: Int): String =
    s"""WITH ${bpeLevelsSql(k)},
        tok AS (SELECT w, replace(trim(s), '  ', '|') AS wtok,
                       len(string_split(trim(s), '  ')) AS ntok
                FROM st$k),
        dw AS (SELECT doc_id, w, pos FROM (
                 SELECT doc_id,
                        unnest(string_split(lower(text), ' ')) AS w,
                        generate_subscripts(
                          string_split(lower(text), ' '), 1) AS pos
                 FROM documents)
               WHERE len(w) > 0)
       SELECT doc_id, CAST(sum(ntok) AS BIGINT) AS n_tokens,
              string_agg(wtok, '|' ORDER BY pos) AS tokens
       FROM dw JOIN tok USING (w)
       GROUP BY doc_id ORDER BY doc_id"""

  private def mmDecodedBody: String = {
    // byte i (1-indexed) of the blob as an integer, from its hex pair:
    // (hi-1)*16 + (lo-1) with strpos's 1-based answers folded into -17
    def b(i: Int) =
      s"(strpos('0123456789ABCDEF', substr(h, ${2 * i - 1}, 1)) * 16 + " +
        s"strpos('0123456789ABCDEF', substr(h, ${2 * i}, 1)) - 17)"
    def le16(i: Int) = s"(${b(i)} + 256 * ${b(i + 1)})"
    def le32(i: Int) = s"(${b(i)} + 256 * ${b(i + 1)} + " +
      s"65536 * ${b(i + 2)} + 16777216 * ${b(i + 3)})"
    val isBmp = "substr(h, 1, 4) = '424D'" // 'B','M'
    s"""WITH m AS (SELECT media_id, hex(content) AS h
                   FROM read_parquet('__GRAFT_MEDIA__/*.parquet'))
        SELECT media_id,
               CASE WHEN $isBmp THEN 'bmp' ELSE 'wav' END AS format,
               CAST(CASE WHEN $isBmp THEN ${le32(19)} ELSE 0 END AS INT) AS width,
               CAST(CASE WHEN $isBmp THEN ${le32(23)} ELSE 0 END AS INT) AS height,
               CAST(CASE WHEN $isBmp THEN 1
                    ELSE ${le32(41)} // (${le16(23)} * (${le16(35)} // 8))
                    END AS INT) AS n_frames,
               CAST(CASE WHEN $isBmp THEN 0 ELSE ${le32(25)} END AS INT) AS sample_rate,
               CAST(CASE WHEN $isBmp THEN 0 ELSE ${le16(23)} END AS INT) AS channels
        FROM m"""
  }

  private def mmDecodeOracleSql: String =
    s"SELECT * FROM ($mmDecodedBody) d ORDER BY media_id"

  // ───────────────────────────────────────────────────────────────────
  // DuckDB oracle SQL. Same determinism rules as the Spark side;
  // casts align output types (DuckDB year()→BIGINT vs Spark INT, etc.).
  // Queries with engine-specific hashing (xxhash64) are omitted →
  // driver records a rows-only check.
  // ───────────────────────────────────────────────────────────────────
  def oracleSql: Map[String, String] = Map(

    "s4_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
         l_returnflag, l_linestatus, strftime(l_shipdate, '%Y-%m-%d') AS ship_date
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",

    "p1_projection" ->
      "SELECT p_partkey, p_name, p_brand, p_type FROM part ORDER BY p_partkey",

    "p2_autoid" ->
      """SELECT row_number() OVER (ORDER BY o_orderkey) AS auto_id, o_orderkey
         FROM orders ORDER BY auto_id""",

    "p3_p4_route" ->
      """SELECT event_id, event_type,
         CASE WHEN event_type IN ('click','view') THEN 'engagement'
              WHEN event_type = 'purchase' THEN 'revenue'
              ELSE 'ops' END AS route
         FROM events WHERE instr(event_type, 'e') > 0 ORDER BY event_id""",

    "p5_freshness" ->
      """WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
         SELECT event_type, count(*) AS n FROM ev
         WHERE ts >= (SELECT max(ts) - INTERVAL 7 DAY FROM ev)
         GROUP BY event_type ORDER BY event_type""",

    "j1_upsert" ->
      """WITH t AS (SELECT o_orderkey, o_orderstatus, o_totalprice
                    FROM orders WHERE o_orderkey % 2 = 0),
              u AS (SELECT o_orderkey, 'U' AS o_orderstatus,
                           o_totalprice * 2 AS o_totalprice
                    FROM orders WHERE o_orderkey % 3 = 0)
         SELECT COALESCE(u.o_orderkey, t.o_orderkey) AS o_orderkey,
                CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_orderstatus
                     ELSE t.o_orderstatus END AS o_orderstatus,
                CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_totalprice
                     ELSE t.o_totalprice END AS o_totalprice
         FROM u FULL JOIN t ON u.o_orderkey = t.o_orderkey
         ORDER BY o_orderkey""",

    "j2_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                           AND year(o_orderdate) >= 1998)
         ORDER BY c_custkey""",

    "j3_semi" ->
      """SELECT p_partkey, p_name FROM part
         WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
         ORDER BY p_partkey""",

    "j4_kv_range" ->
      """SELECT event_id, user_id, value FROM events
         WHERE user_id BETWEEN 0 AND 9 AND event_type = 'purchase'
           AND value > 100.0
         ORDER BY event_id""",

    "j5_star_join" ->
      """SELECT r_name,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
                  (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
         count(*) AS n
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",

    "j6_asof" ->
      """WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
                            event_type, value FROM events),
           p AS (SELECT event_id, user_id, ts FROM ev
                 WHERE event_type = 'purchase'),
           c AS (SELECT user_id, ts, value FROM ev
                 WHERE event_type = 'click')
         SELECT p.event_id, p.user_id,
                strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS pts,
                strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS cts,
                coalesce(round(c.value, 6), -1e9) AS cvalue
         FROM p ASOF LEFT JOIN c
           ON p.user_id = c.user_id AND p.ts >= c.ts
         ORDER BY p.event_id""",

    "a1_count" -> "SELECT count(*) AS n FROM lineitem",

    "a2_reconcile" ->
      """SELECT count(*) AS file_rows, count(l_orderkey) AS staged_rows,
         abs(count(*) - count(l_orderkey)) <= 5 AS ok FROM lineitem""",

    "a3_report" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS y,
                CAST(month(o_orderdate) AS INT) AS m,
                n_name AS geo, o_orderstatus AS category,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE) AS avg_price,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty,
                count(*) AS n
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE year(o_orderdate) = 1996
           AND n_name IN ('NATION_1','NATION_2','NATION_3')
         GROUP BY 1,2,3,4 ORDER BY 1,2,3,4""",

    "a4_report_base" ->
      """SELECT l_orderkey, l_linenumber, o_orderstatus,
                n_name AS geo, r_name AS region,
                l_quantity, l_extendedprice, l_discount,
                CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
                     (1 - CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
                strftime(o_orderdate, '%Y-%m-%d') AS order_date
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         ORDER BY l_orderkey, l_linenumber""",

    "a5_status_check" ->
      """WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
         SELECT user_id, count(*) AS n,
                CASE WHEN count(*) >= 3 THEN -1 ELSE 1 END AS status
         FROM ev
         WHERE event_type = 'error'
           AND ts >= (SELECT max(ts) - INTERVAL 3 DAY FROM ev)
         GROUP BY user_id ORDER BY user_id""",

    "a6_group_collect" ->
      """SELECT event_type, count(*) AS n,
                string_agg(CAST(user_id AS VARCHAR), ',' ORDER BY user_id) AS users
         FROM events WHERE value > 200
         GROUP BY event_type ORDER BY event_type""",

    "a7_dup_counts" ->
      """SELECT user_id, count(*) AS n FROM events
         WHERE event_type = 'error'
         GROUP BY user_id HAVING count(*) > 1 ORDER BY user_id""",

    "a8_pivot" ->
      """SELECT user_id % 10 AS ub,
                count(*) FILTER (WHERE event_type = 'click') AS click,
                count(*) FILTER (WHERE event_type = 'error') AS error,
                count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
                count(*) FILTER (WHERE event_type = 'signup') AS signup,
                count(*) FILTER (WHERE event_type = 'view') AS view
         FROM events GROUP BY 1 ORDER BY 1""",

    "a9_rollup" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty,
                count(*) AS n
         FROM lineitem
         GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
                  (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS avg_qty,
         count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "a10_distinct_salted" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_distinct
         FROM events GROUP BY event_type ORDER BY event_type""",

    "j8_salted_join" ->
      """SELECT o_orderstatus,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
                count(*) AS n
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "q3_shipping_priority" ->
      """SELECT l_orderkey,
                strftime(o_orderdate, '%Y-%m-%d') AS odate,
                o_orderpriority,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
                         (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
           AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
         GROUP BY 1, 2, 3
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",

    "q5_local_supplier" ->
      """SELECT n_name,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
                         (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
         GROUP BY n_name
         ORDER BY revenue DESC, n_name""",

    "q7_nation_volume" ->
      """SELECT s_nation.n_name AS supp_nation, c_nation.n_name AS cust_nation,
                CAST(year(o_orderdate) AS INT) AS l_year,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
                         (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation s_nation ON s_nationkey = s_nation.n_nationkey
         JOIN nation c_nation ON c_nationkey = c_nation.n_nationkey
         WHERE (s_nation.n_name = 'NATION_1' AND c_nation.n_name = 'NATION_2')
            OR (s_nation.n_name = 'NATION_2' AND c_nation.n_name = 'NATION_1')
         GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",

    "q10_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
                         (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE l_returnflag = 'R'
           AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
         GROUP BY 1, 2, 3
         ORDER BY revenue DESC, c_custkey LIMIT 20""",

    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders o
         WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
           AND EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey
                         AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
         GROUP BY 1 ORDER BY 1""",

    "q12_priority_class" ->
      """SELECT l_returnflag,
                CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                              THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                              THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         GROUP BY 1 ORDER BY 1""",

    "q14_promo_revenue" ->
      """SELECT round(100.0 *
                CAST(sum(CASE WHEN p_type = 'PROMO'
                              THEN CAST(l_extendedprice AS DECIMAL(18,4)) *
                                   (1 - CAST(l_discount AS DECIMAL(18,4)))
                              ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
                         (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE),
                6) AS promo_revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""",

    "q17_small_quantity" ->
      """WITH lp AS (SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
                     FROM lineitem l JOIN part p
                       ON l.l_partkey = p.p_partkey
                     WHERE p.p_brand = 'Brand#23' AND p.p_size < 15),
              th AS (SELECT l_partkey AS tp,
                            sum(CAST(l_quantity AS DECIMAL(18,4))) AS sq,
                            CAST(count(*) AS BIGINT) AS cq
                     FROM lp GROUP BY 1)
         SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)))
                        AS DOUBLE) / 7.0, 6) AS avg_yearly
         FROM lp JOIN th ON lp.l_partkey = th.tp
         WHERE CAST(l_quantity AS DECIMAL(10,4)) *
               CAST(cq * 5 AS DECIMAL(18,0)) < sq""",

    "q6_forecast_revenue" ->
      """SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
                              CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE),
                6) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
           AND l_discount >= 0.04 AND l_discount <= 0.06
           AND l_quantity < 24""",

    "q18_large_orders" ->
      """WITH big AS (SELECT l_orderkey FROM lineitem
                      GROUP BY 1 HAVING sum(l_quantity) > 200)
         SELECT c_name, c_custkey, o_orderkey,
                strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
                o_totalprice, sum(l_quantity) AS total_qty
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         WHERE o_orderkey IN (SELECT l_orderkey FROM big)
         GROUP BY 1, 2, 3, 4, 5
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",

    "q19_disjunctive" ->
      """SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
                  (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE),
                6) AS revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 10
                AND l_quantity BETWEEN 1 AND 11)
            OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 20
                AND l_quantity BETWEEN 10 AND 20)
            OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 30
                AND l_quantity BETWEEN 20 AND 30)""",

    "q8_market_share" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                round(
                  CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
                           THEN CAST(l_extendedprice AS DECIMAL(18,4)) *
                                (1 - CAST(l_discount AS DECIMAL(18,4)))
                           ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
                  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
                           (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE),
                  6) AS mkt_share
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation n1 ON c_nationkey = n1.n_nationkey
         JOIN region ON n1.n_regionkey = r_regionkey
         JOIN part ON l_partkey = p_partkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation n2 ON s_nationkey = n2.n_nationkey
         WHERE r_name = 'ASIA' AND p_type = 'PROMO'
           AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         GROUP BY 1 ORDER BY 1""",

    "q13_order_histogram" ->
      """SELECT c_count, count(*) AS custdist FROM (
           SELECT c_custkey, count(o_orderkey) AS c_count
           FROM customer LEFT JOIN orders
             ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
           GROUP BY 1)
         GROUP BY 1 ORDER BY custdist DESC, c_count DESC""",

    "q15_top_supplier" ->
      """WITH rev AS (SELECT l_suppkey,
                             round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
                               (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE),
                               6) AS total_revenue
                      FROM lineitem
                      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
                      GROUP BY 1)
         SELECT s_suppkey, s_name, total_revenue
         FROM rev JOIN supplier ON l_suppkey = s_suppkey
         WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
         ORDER BY s_suppkey""",

    "q22_idle_customers" ->
      """WITH sel AS (SELECT * FROM customer
                      WHERE c_mktsegment IN
                        ('BUILDING', 'AUTOMOBILE', 'MACHINERY')),
              ab AS (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4)))
                            AS DOUBLE) / count(*) AS v
                     FROM sel WHERE c_acctbal > 0)
         SELECT c_mktsegment, count(*) AS n_cust,
                CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                  AS total_bal
         FROM sel
         WHERE c_acctbal > (SELECT v FROM ab)
           AND NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
         GROUP BY 1 ORDER BY 1""",

    "q2_min_cost_supplier" ->
      """WITH rs AS (SELECT s_suppkey, s_name, s_acctbal, n_name
                     FROM supplier JOIN nation ON s_nationkey = n_nationkey
                     JOIN region ON n_regionkey = r_regionkey
                     WHERE r_name = 'EUROPE'),
              offers AS (SELECT l_partkey, l_suppkey,
                                min(l_extendedprice) AS cost
                         FROM lineitem
                         WHERE l_suppkey IN (SELECT s_suppkey FROM rs)
                         GROUP BY 1, 2),
              mc AS (SELECT l_partkey AS mp, min(cost) AS mcost
                     FROM offers GROUP BY 1)
         SELECT s_acctbal, s_name, n_name, p_partkey, cost
         FROM offers
         JOIN mc ON l_partkey = mp AND cost = mcost
         JOIN part ON l_partkey = p_partkey
         JOIN rs ON l_suppkey = rs.s_suppkey
         WHERE p_size <= 15 AND p_type = 'STANDARD'
         ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""",

    "q9_product_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
                round(CAST(
                  sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
                      (1 - CAST(l_discount AS DECIMAL(18,4)))) -
                  sum(CAST(p_retailprice AS DECIMAL(18,4)) *
                      CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 6)
                  AS sum_profit
         FROM lineitem
         JOIN part ON l_partkey = p_partkey
         JOIN orders ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         WHERE p_name LIKE '%gear%'
         GROUP BY 1, 2 ORDER BY 1, 2 DESC""",

    "q11_important_parts" ->
      """WITH ns AS (SELECT s_suppkey FROM supplier
                     JOIN nation ON s_nationkey = n_nationkey
                     WHERE n_name = 'NATION_7'),
              sl AS (SELECT l_partkey,
                            CAST(l_extendedprice AS DECIMAL(18,4)) AS v
                     FROM lineitem
                     WHERE l_suppkey IN (SELECT s_suppkey FROM ns)),
              bp AS (SELECT l_partkey, sum(v) AS pv FROM sl GROUP BY 1),
              tot AS (SELECT sum(v) AS tv FROM sl)
         SELECT l_partkey, CAST(pv AS DOUBLE) AS value
         FROM bp, tot WHERE pv * 1000 > tv
         ORDER BY value DESC, l_partkey""",

    "q16_supplier_counts" ->
      """WITH bad AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 500),
              assoc AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
                        WHERE l_suppkey NOT IN (SELECT s_suppkey FROM bad))
         SELECT p_brand, p_type, p_size,
                CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
         FROM assoc JOIN part ON l_partkey = p_partkey
         WHERE p_brand <> 'Brand#2' AND p_type NOT LIKE 'SMALL%'
           AND p_size IN (1, 5, 11, 15, 20, 25, 30, 35)
         GROUP BY 1, 2, 3
         ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",

    "q20_excess_parts" ->
      """WITH l97 AS (SELECT l_partkey, l_suppkey, l_quantity FROM lineitem
                      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
                        AND l_partkey IN (SELECT p_partkey FROM part
                                          WHERE p_name LIKE 'red%')),
              ps AS (SELECT l_partkey, l_suppkey,
                            sum(CAST(l_quantity AS DECIMAL(18,4))) AS q
                     FROM l97 GROUP BY 1, 2),
              pt AS (SELECT l_partkey AS pp, sum(q) AS tq FROM ps GROUP BY 1),
              dom AS (SELECT DISTINCT l_suppkey FROM ps
                      JOIN pt ON l_partkey = pp
                      WHERE q * 2 > tq AND q >= 60)
         SELECT s_name, n_name FROM supplier
         JOIN nation ON s_nationkey = n_nationkey
         WHERE s_suppkey IN (SELECT l_suppkey FROM dom)
         ORDER BY s_name""",

    "q21_waiting_suppliers" ->
      """WITH base AS (SELECT l_orderkey, l_suppkey, l_shipdate
                       FROM lineitem),
              ns AS (SELECT s_suppkey, s_name FROM supplier
                     JOIN nation ON s_nationkey = n_nationkey
                     WHERE n_name = 'NATION_3')
         SELECT s_name, CAST(count(DISTINCT l1.l_orderkey) AS BIGINT)
                  AS numwait
         FROM base l1
         JOIN ns ON l1.l_suppkey = ns.s_suppkey
         JOIN orders ON l1.l_orderkey = o_orderkey AND o_orderstatus = 'F'
         WHERE EXISTS (SELECT 1 FROM base l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM base l3
                           WHERE l3.l_orderkey = l1.l_orderkey
                             AND l3.l_suppkey <> l1.l_suppkey
                             AND l3.l_shipdate > l1.l_shipdate)
         GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20""",

    "w1_rownum" ->
      """SELECT event_id, user_id,
                CAST(row_number() OVER (PARTITION BY user_id
                  ORDER BY value, event_id) AS INT) AS rn
         FROM events WHERE event_type = 'purchase'
         ORDER BY user_id, rn""",

    "w2_latest_per_key" ->
      """SELECT user_id, event_type, event_id FROM events
         QUALIFY row_number() OVER (PARTITION BY user_id, event_type
           ORDER BY value DESC, event_id DESC) = 1
         ORDER BY user_id, event_type""",

    "o1_chunks" ->
      """WITH r AS (SELECT o_orderkey,
                    row_number() OVER (ORDER BY o_orderkey) AS rn FROM orders)
         SELECT CAST(floor((rn - 1) / 500) AS BIGINT) AS chunk, count(*) AS n,
                min(o_orderkey) AS lo, max(o_orderkey) AS hi
         FROM r GROUP BY 1 ORDER BY 1""",

    "f_strings" ->
      """SELECT p_partkey,
                'warehouse/' || p_brand || '/part_' ||
                  CAST(p_partkey AS VARCHAR) || '.csv' AS path,
                regexp_extract('warehouse/' || p_brand || '/part_' ||
                  CAST(p_partkey AS VARCHAR) || '.csv', '([^/]+)$', 1) AS base,
                lower(p_name) AS lname,
                replace(p_name, ' ', '_') AS uname,
                instr(p_type, 'ECONOMY') > 0 AS is_econ,
                substr(p_name, 1, 5) AS prefix
         FROM part ORDER BY p_partkey""",

    "f_dates" ->
      """WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
         SELECT strftime(ts, '%Y-%m-%d') AS day,
                CAST(hour(ts - INTERVAL 5 HOUR) AS INT) AS est_hour,
                count(*) AS n
         FROM ev GROUP BY 1,2 ORDER BY 1,2""",

    "f_json" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
                count(*) AS n
         FROM events GROUP BY k ORDER BY k""",

    "f_json_struct" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS bucket,
                count(*) AS n,
                max(CAST(json_extract_string(props, '$.k') AS INT)) AS mx
         FROM events GROUP BY bucket ORDER BY bucket""",

    "f_math" ->
      """SELECT l_orderkey, l_linenumber,
                l_orderkey % 7 AS m7,
                CAST(ceil(l_quantity / 7) AS BIGINT) AS cq,
                CAST(floor(l_extendedprice / 1024) AS BIGINT) AS kb
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",

    "f_url" ->
      """SELECT p_partkey,
                replace(p_brand || '%20' || replace(p_name, ' ', '%20'),
                        '%20', ' ') AS decoded
         FROM part ORDER BY p_partkey""",

    "f_clean_truncate" ->
      """SELECT p_partkey,
                substr(regexp_replace(p_name || chr(9) || p_type || chr(7),
                                      '[\x00-\x1f\x7f]', '', 'g'),
                       1, 20) AS subject
         FROM part ORDER BY p_partkey""",

    "o2_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",

    "u1_union" ->
      """SELECT o_orderstatus, count(*) AS n FROM (
           SELECT o_orderkey, o_orderstatus FROM orders
           WHERE o_totalprice > 400000
           UNION
           SELECT o_orderkey, o_orderstatus FROM orders
           WHERE o_orderpriority = '1-URGENT')
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "u2_except" ->
      """SELECT c_custkey AS k FROM customer
         EXCEPT
         SELECT o_custkey FROM orders WHERE o_totalprice > 250000
         ORDER BY k""",

    "u3_intersect" ->
      """SELECT o_orderkey AS k FROM orders WHERE o_totalprice > 300000
         INTERSECT
         SELECT l_orderkey FROM lineitem WHERE l_quantity >= 40
         ORDER BY k""",

    "j7_range_window" ->
      """WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
                            event_type, value FROM events),
           p AS (SELECT event_id, user_id, ts FROM ev
                 WHERE event_type = 'purchase'),
           c AS (SELECT user_id, ts, value FROM ev
                 WHERE event_type = 'click')
         SELECT p.event_id, p.user_id,
                strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS cts,
                round(c.value, 6) AS cvalue
         FROM p JOIN c
           ON p.user_id = c.user_id
          AND c.ts >= p.ts - INTERVAL 7 DAY AND c.ts < p.ts
         ORDER BY p.event_id, cts, cvalue""",

    "j9_asof_nearest" ->
      """WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
                            event_type, value FROM events),
           p AS (SELECT event_id, user_id, ts FROM ev
                 WHERE event_type = 'purchase'),
           c AS (SELECT user_id, ts, value FROM ev
                 WHERE event_type = 'click'),
           j AS (SELECT p.event_id, p.user_id, c.ts AS cts, c.value,
                        abs(epoch_us(p.ts) - epoch_us(c.ts)) AS adt,
                        CASE WHEN c.ts <= p.ts THEN 0 ELSE 1 END AS fwd
                 FROM p LEFT JOIN c ON p.user_id = c.user_id),
           r AS (SELECT *, row_number() OVER (PARTITION BY event_id
                   ORDER BY adt, fwd) AS rn FROM j)
         SELECT event_id, user_id,
                strftime(cts, '%Y-%m-%d %H:%M:%S.%f') AS cts,
                coalesce(round(value, 6), -1e9) AS cvalue
         FROM r WHERE rn = 1 ORDER BY event_id""",

    // SCD2 replay: changed keys close their current row and open a new
    // one; identical updates fall out of the `segment <> new_seg` join
    "j10_scd2" ->
      """WITH hist AS (SELECT c_custkey AS key, c_mktsegment AS segment,
                              TIMESTAMP '1995-01-01 00:00:00' AS vf,
                              CAST(NULL AS TIMESTAMP) AS vt
                       FROM customer),
              upd AS (SELECT c_custkey AS key,
                             CASE WHEN c_custkey % 3 = 0
                                  THEN 'SEG_' || CAST(c_custkey % 5 AS VARCHAR)
                                  ELSE c_mktsegment END AS segment,
                             TIMESTAMP '2000-06-01 00:00:00' AS ts
                      FROM customer WHERE c_custkey % 3 <> 2),
              chg AS (SELECT h.key, u.segment AS new_seg, u.ts
                      FROM hist h JOIN upd u ON h.key = u.key
                      WHERE h.vt IS NULL AND h.segment <> u.segment),
              res AS (SELECT h.key, h.segment, h.vf,
                             CASE WHEN c.key IS NOT NULL THEN c.ts
                                  ELSE h.vt END AS vt
                      FROM hist h LEFT JOIN chg c
                        ON h.key = c.key AND h.vt IS NULL
                      UNION ALL
                      SELECT key, new_seg, ts, CAST(NULL AS TIMESTAMP)
                      FROM chg)
         SELECT key, segment, strftime(vf, '%Y-%m-%d') AS valid_from,
                coalesce(strftime(vt, '%Y-%m-%d'), 'current') AS valid_to
         FROM res ORDER BY key, valid_from, segment""",

    // layout never changes content: the bucketed join's oracle is the
    // plain join over the original parquet tables
    "j11_bucketed" ->
      """SELECT o.o_orderpriority, count(*) AS n_items,
                CAST(sum(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                  AS qty
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         GROUP BY 1 ORDER BY 1""",

    // the bucket decomposition meets each qualifying pair exactly once,
    // so the oracle is the plain BETWEEN join
    "j12_interval" ->
      """SELECT a.o_orderkey, count(*) AS n_follow
         FROM orders a JOIN orders b
           ON b.o_orderdate >= a.o_orderdate
          AND b.o_orderdate <= a.o_orderdate + INTERVAL 3 DAY
         GROUP BY 1 ORDER BY 1""",

    // j10's merge replayed, then the as-of filter AT the change
    // instant: closed-at-ts rows invisible, opened-at-ts rows visible
    "j13_scd2_asof" ->
      """WITH hist AS (SELECT c_custkey AS key, c_mktsegment AS segment,
                              TIMESTAMP '1995-01-01 00:00:00' AS vf,
                              CAST(NULL AS TIMESTAMP) AS vt
                       FROM customer),
              upd AS (SELECT c_custkey AS key,
                             CASE WHEN c_custkey % 3 = 0
                                  THEN 'SEG_' || CAST(c_custkey % 5 AS VARCHAR)
                                  ELSE c_mktsegment END AS segment,
                             TIMESTAMP '2000-06-01 00:00:00' AS ts
                      FROM customer WHERE c_custkey % 3 <> 2),
              chg AS (SELECT h.key, u.segment AS new_seg, u.ts
                      FROM hist h JOIN upd u ON h.key = u.key
                      WHERE h.vt IS NULL AND h.segment <> u.segment),
              res AS (SELECT h.key, h.segment, h.vf,
                             CASE WHEN c.key IS NOT NULL THEN c.ts
                                  ELSE h.vt END AS vt
                      FROM hist h LEFT JOIN chg c
                        ON h.key = c.key AND h.vt IS NULL
                      UNION ALL
                      SELECT key, new_seg, ts, CAST(NULL AS TIMESTAMP)
                      FROM chg)
         SELECT key, segment, strftime(vf, '%Y-%m-%d') AS valid_from
         FROM res
         WHERE vf <= TIMESTAMP '2000-06-01 00:00:00'
           AND (vt IS NULL OR vt > TIMESTAMP '2000-06-01 00:00:00')
         ORDER BY key, segment""",

    "a11_cube" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty,
                count(*) AS n
         FROM lineitem
         GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",

    "a12_percentiles" ->
      """SELECT event_type,
                round(quantile_cont(value, 0.5), 6) AS p50,
                round(quantile_cont(value, 0.95), 6) AS p95,
                count(*) AS n
         FROM events GROUP BY event_type ORDER BY event_type""",

    "a13_histogram" ->
      """SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bucket,
                count(*) AS n
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "a14_corr" ->
      """WITH m AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                           CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
                           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sy,
                           CAST(sum(CAST(l_quantity AS DECIMAL(28,4)) *
                                    CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sxy,
                           CAST(sum(CAST(l_quantity AS DECIMAL(28,4)) *
                                    CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
                           CAST(sum(CAST(l_extendedprice AS DECIMAL(28,4)) *
                                    CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS syy
                    FROM lineitem)
         SELECT round((n * sxy - sx * sy) /
                  sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
                6) AS corr_qty_price
         FROM m""",

    "a15_kmv_distinct" ->
      s"""WITH c AS (SELECT DISTINCT l_returnflag,
                            ${hexValSql("md5(CAST(l_partkey AS VARCHAR))")} AS h
                     FROM lineitem),
              r AS (SELECT l_returnflag, h,
                           row_number() OVER (PARTITION BY l_returnflag
                                              ORDER BY h) AS rn,
                           CAST(count(*) OVER (PARTITION BY l_returnflag)
                                AS BIGINT) AS cnt
                    FROM c)
         SELECT l_returnflag,
                CAST(CASE WHEN cnt >= 256 THEN 1095216660480 // h
                          ELSE cnt END AS BIGINT) AS est_distinct
         FROM r
         WHERE rn = CASE WHEN cnt >= 256 THEN 256 ELSE cnt END
         ORDER BY l_returnflag""",

    "a16_cms_freq" ->
      s"""WITH j AS (SELECT CAST(unnest(generate_series(0, 3)) AS BIGINT)
                            AS jr),
              h AS (SELECT l_suppkey, j.jr,
                           ${hexValSql(
                             "md5(CAST(j.jr AS VARCHAR) || ':' || " +
                               "CAST(l_suppkey AS VARCHAR))")} % 1024
                             AS bkt
                    FROM lineitem CROSS JOIN j),
              c AS (SELECT jr, bkt, CAST(count(*) AS BIGINT) AS cnt
                    FROM h GROUP BY 1, 2),
              kh AS (SELECT DISTINCT l_suppkey, jr, bkt FROM h),
              est AS (SELECT kh.l_suppkey, min(c.cnt) AS est_freq
                      FROM kh JOIN c ON kh.jr = c.jr AND kh.bkt = c.bkt
                      GROUP BY 1),
              ex AS (SELECT l_suppkey, CAST(count(*) AS BIGINT)
                              AS exact_freq
                     FROM lineitem GROUP BY 1)
         SELECT est.l_suppkey, est.est_freq, ex.exact_freq
         FROM est JOIN ex ON est.l_suppkey = ex.l_suppkey
         ORDER BY est.l_suppkey""",

    // the xxhash64 twin: hashing is engine-specific, so bucket
    // coordinates and counter cells come from the artifact pair;
    // the oracle replays min-over-rows estimation + the exact join
    // (__GRAFT_CMS__ resolved by Verify like __GRAFT_SIMHASH__)
    "a16b_cms_freq_fast" ->
      """WITH c AS (SELECT _row, _bkt, cnt FROM
                      read_parquet('__GRAFT_CMS__/counters/*.parquet')),
              p AS (SELECT l_suppkey, _row, _bkt FROM
                      read_parquet('__GRAFT_CMS__/probes/*.parquet')),
              est AS (SELECT l_suppkey, min(cnt) AS est_freq
                      FROM p JOIN c USING (_row, _bkt) GROUP BY 1),
              ex AS (SELECT l_suppkey, CAST(count(*) AS BIGINT)
                              AS exact_freq
                     FROM lineitem GROUP BY 1)
         SELECT est.l_suppkey, est.est_freq, ex.exact_freq
         FROM est JOIN ex ON est.l_suppkey = ex.l_suppkey
         ORDER BY est.l_suppkey""",

    "a17_kmv_overlap" ->
      s"""WITH ca AS (SELECT DISTINCT
                        ${hexValSql("md5(CAST(o_custkey AS VARCHAR))")} AS h
                      FROM orders WHERE year(o_orderdate) = 1996),
              cb AS (SELECT DISTINCT
                        ${hexValSql("md5(CAST(o_custkey AS VARCHAR))")} AS h
                      FROM orders WHERE year(o_orderdate) = 1997),
              ska AS (SELECT h FROM ca ORDER BY h LIMIT 128),
              skb AS (SELECT h FROM cb ORDER BY h LIMIT 128),
              u AS (SELECT h FROM (SELECT h FROM ska UNION
                                   SELECT h FROM skb)
                    ORDER BY h LIMIT 128),
              m AS (SELECT CAST(count(*) AS BIGINT) AS m,
                           CAST(max(h) AS BIGINT) AS hk FROM u),
              ue AS (SELECT CASE WHEN m.m < 128 THEN m.m
                                 ELSE 545460846592 // m.hk END AS ue,
                            m.m AS m FROM m),
              ov AS (SELECT CAST(count(*) AS BIGINT) AS o FROM u
                     WHERE h IN (SELECT h FROM ska)
                       AND h IN (SELECT h FROM skb))
         SELECT CAST(ue.ue AS BIGINT) AS union_est,
                ov.o AS overlap_k,
                CAST(CASE WHEN ue.m = 0 THEN 0
                          ELSE ov.o * ue.ue // ue.m END AS BIGINT)
                  AS inter_est
         FROM ue, ov""",

    "a18_profile" ->
      Seq("l_orderkey", "l_returnflag", "l_shipdate", "l_suppkey")
        .map(profileColSql)
        .mkString("", "\n UNION ALL\n ", "\n ORDER BY \"column\""),

    "a19_checks" ->
      """WITH c AS (
           SELECT 'o_totalprice_positive' AS chk,
                  CAST(count(*) FILTER (WHERE o_totalprice <= 0)
                       AS BIGINT) AS violations
           FROM orders
           UNION ALL
           SELECT 'o_status_domain',
                  count(*) FILTER (WHERE o_orderstatus NOT IN
                                         ('O', 'F', 'P'))
           FROM orders
           UNION ALL
           SELECT 'o_priority_nonempty',
                  count(*) FILTER (WHERE length(o_orderpriority) = 0)
           FROM orders
           UNION ALL
           SELECT 'l_qty_range',
                  count(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50)
           FROM lineitem
           UNION ALL
           SELECT 'l_discount_cap',
                  count(*) FILTER (WHERE l_discount > 0.05)
           FROM lineitem
           UNION ALL
           SELECT 'o_orderkey_unique',
                  (SELECT CAST(coalesce(sum(n - 1), 0) AS BIGINT)
                   FROM (SELECT count(*) AS n FROM orders
                         GROUP BY o_orderkey))
           UNION ALL
           SELECT 'o_custkey_ref',
                  (SELECT CAST(count(*) AS BIGINT) FROM orders
                   WHERE o_custkey NOT IN
                         (SELECT c_custkey FROM customer)))
         SELECT chk AS "check",
                CAST(violations AS BIGINT) AS violations,
                violations = 0 AS passed
         FROM c ORDER BY chk""",

    "a20_kanon" ->
      """SELECT c_nationkey, c_mktsegment,
                CAST(count(*) AS BIGINT) AS n
         FROM customer
         GROUP BY c_nationkey, c_mktsegment
         HAVING count(*) < 10
         ORDER BY c_nationkey, c_mktsegment""",

    "a21_heavy_hitters" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS exact_freq
         FROM documents
         GROUP BY lang
         HAVING count(*) >= ceil(0.25 * (SELECT count(*) FROM documents))
         ORDER BY lang""",

    "a22_exact_median" ->
      """WITH s AS (SELECT l_extendedprice AS v,
                           row_number() OVER (ORDER BY l_extendedprice)
                             AS rn
                    FROM lineitem),
              n AS (SELECT CAST(ceil(0.5 * count(*)) AS BIGINT) AS k50,
                           CAST(ceil(0.9 * count(*)) AS BIGINT) AS k90
                    FROM lineitem)
         SELECT round((SELECT v FROM s, n WHERE rn = k50), 6) AS p50,
                round((SELECT v FROM s, n WHERE rn = k90), 6) AS p90""",

    // exact-count double divisions + the same (p-q)·ln(p/q) order;
    // the spine keeps one-sided-empty buckets in the sum
    "a24_psi_drift" ->
      """WITH d AS (SELECT doc_id,
                           least(CAST(floor(n_chars / 100) AS BIGINT), 9)
                             AS bucket
                    FROM documents),
              a AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_a
                    FROM d WHERE doc_id % 2 = 0 GROUP BY 1),
              b AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_b
                    FROM d WHERE doc_id % 2 <> 0 GROUP BY 1),
              na AS (SELECT count(*) AS n FROM d WHERE doc_id % 2 = 0),
              nb AS (SELECT count(*) AS n FROM d WHERE doc_id % 2 <> 0),
              sp AS (SELECT unnest(generate_series(0, 9)) AS bucket),
              j AS (SELECT sp.bucket,
                           coalesce(a.n_a, 0) AS n_a,
                           coalesce(b.n_b, 0) AS n_b
                    FROM sp LEFT JOIN a USING (bucket)
                            LEFT JOIN b USING (bucket))
         SELECT bucket, n_a, n_b,
                round(((n_a + 1) * 1.0 / (na.n + 10)
                       - (n_b + 1) * 1.0 / (nb.n + 10))
                      * ln(((n_a + 1) * 1.0 / (na.n + 10))
                           / ((n_b + 1) * 1.0 / (nb.n + 10))), 6) AS psi
         FROM j CROSS JOIN na CROSS JOIN nb ORDER BY bucket""",

    "a23_grouping_sets" ->
      """SELECT coalesce(l_returnflag, '(all)') AS rflag,
                coalesce(l_linestatus, '(all)') AS lstatus,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                  AS sum_qty,
                CAST(count(*) AS BIGINT) AS n
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                 (l_returnflag), (l_linestatus))
         ORDER BY rflag, lstatus""",

    "x_text_editdist" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
                CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
         FROM customer a
         JOIN customer b ON a.c_nationkey = b.c_nationkey
                        AND a.c_custkey < b.c_custkey
         WHERE levenshtein(a.c_name, b.c_name) <= 1
         ORDER BY id_a, id_b""",

    "x_text_jaro" ->
      """WITH names AS (
           SELECT DISTINCT p_name,
                  string_split(p_name, ' ')[1] AS blk
           FROM part)
         SELECT a.p_name AS name_a, b.p_name AS name_b,
                round(jaro_winkler_similarity(a.p_name, b.p_name), 6)
                  AS jw
         FROM names a JOIN names b
           ON a.blk = b.blk AND a.p_name < b.p_name
         WHERE round(jaro_winkler_similarity(a.p_name, b.p_name), 6)
           >= 0.5
         ORDER BY name_a, name_b""",

    "x_text_nfc" ->
      """WITH r AS (
           SELECT doc_id,
                  substring(text, 1, 20) || 'e' || chr(769) AS raw
           FROM documents)
         SELECT doc_id,
                CAST(length(raw) AS INT) AS raw_chars,
                nfc_normalize(raw) AS normalized,
                CAST(length(nfc_normalize(raw)) AS INT) AS norm_chars
         FROM r
         ORDER BY doc_id""",

    "st4_window_agg" ->
      """WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value
                     FROM events)
         SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts),
                  '%Y-%m-%d %H:%M:%S') AS ws,
                event_type, count(*) AS n,
                round(sum(value), 6) AS total
         FROM ev GROUP BY 1, 2 ORDER BY 1, 2""",

    "w3_topk_per_group" ->
      """SELECT event_type, value, event_id FROM events
         QUALIFY row_number() OVER (PARTITION BY event_type
           ORDER BY value DESC, event_id DESC) <= 3
         ORDER BY event_type, value DESC, event_id DESC""",

    "w4_moving_avg" ->
      """SELECT user_id, event_id,
                round(CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w4 AS DOUBLE)
                  / count(*) OVER w4, 6) AS mavg4,
                round(coalesce(lag(value) OVER wo, 0.0), 6) AS prev_value
         FROM events
         WHERE event_type = 'purchase'
         WINDOW wo AS (PARTITION BY user_id ORDER BY event_id),
                w4 AS (PARTITION BY user_id ORDER BY event_id
                       ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
         ORDER BY user_id, event_id""",

    "w5_rank_family" ->
      """WITH g AS (SELECT o_orderpriority, year(o_orderdate) AS yr,
                           CAST(count(*) AS BIGINT) AS n
                    FROM orders GROUP BY 1, 2)
         SELECT o_orderpriority, CAST(yr AS BIGINT) AS yr, n,
                CAST(rank() OVER w AS INT) AS rnk,
                CAST(dense_rank() OVER w AS INT) AS drnk,
                round(percent_rank() OVER w, 6) AS prank,
                CAST(ntile(4) OVER w AS INT) AS nt4,
                round(cume_dist() OVER w, 6) AS cdist
         FROM g
         WINDOW w AS (PARTITION BY o_orderpriority ORDER BY yr)
         ORDER BY o_orderpriority, yr""",

    "j14_not_in" ->
      """SELECT
           (SELECT CAST(count(*) AS BIGINT) FROM customer
            WHERE c_custkey NOT IN
              (SELECT CASE WHEN o_orderkey = 0 THEN NULL
                           ELSE o_custkey END
               FROM orders)) AS n_with_null_list,
           (SELECT CAST(count(*) AS BIGINT) FROM customer
            WHERE c_custkey NOT IN
              (SELECT o_custkey FROM orders
               WHERE o_totalprice > 450000)) AS n_clean_list""",

    // the +1.0 update is an exact IEEE add at this magnitude, so both
    // engines carry identical doubles into the diff compare
    "j15_snapshot_diff" ->
      """WITH o AS (SELECT o_orderkey, o_orderstatus, o_totalprice,
                           o_orderpriority FROM orders),
           olds AS (SELECT * FROM o WHERE o_orderkey % 7 <> 0),
           news AS (SELECT o_orderkey, o_orderstatus,
                           CASE WHEN o_orderkey % 5 = 0
                                THEN o_totalprice + 1.0
                                ELSE o_totalprice END AS o_totalprice,
                           o_orderpriority
                    FROM o WHERE o_orderkey % 10 <> 0)
         SELECT coalesce(n.o_orderkey, d.o_orderkey) AS o_orderkey,
                CASE WHEN d.o_orderkey IS NULL THEN n.o_orderstatus
                     WHEN n.o_orderkey IS NULL THEN d.o_orderstatus
                     ELSE n.o_orderstatus END AS o_orderstatus,
                CASE WHEN d.o_orderkey IS NULL THEN n.o_totalprice
                     WHEN n.o_orderkey IS NULL THEN d.o_totalprice
                     ELSE n.o_totalprice END AS o_totalprice,
                CASE WHEN d.o_orderkey IS NULL THEN n.o_orderpriority
                     WHEN n.o_orderkey IS NULL THEN d.o_orderpriority
                     ELSE n.o_orderpriority END AS o_orderpriority,
                CASE WHEN d.o_orderkey IS NULL THEN 'I'
                     WHEN n.o_orderkey IS NULL THEN 'D'
                     ELSE 'U' END AS op
         FROM olds d FULL OUTER JOIN news n
           ON d.o_orderkey = n.o_orderkey
         WHERE d.o_orderkey IS NULL OR n.o_orderkey IS NULL
            OR d.o_totalprice <> n.o_totalprice
            OR d.o_orderstatus <> n.o_orderstatus
            OR d.o_orderpriority <> n.o_orderpriority
         ORDER BY o_orderkey""",

    // the order-free answer: max-version row per key over the union of
    // all three batches — if the engine's merge order (fresh first,
    // STALE LAST) leaked into the table, the stale rows would win there
    // and hash-mismatch here
    "j17_merge_versioned" ->
      """WITH allrows AS (
           SELECT o_orderkey, o_orderstatus, o_totalprice,
                  CAST(1 AS BIGINT) AS ver FROM orders
           UNION ALL
           SELECT o_orderkey, 'X', o_totalprice + 1.0, 2
           FROM orders WHERE o_orderkey % 5 = 0
           UNION ALL
           SELECT o_orderkey, 'S', o_totalprice, 0
           FROM orders WHERE o_orderkey % 3 = 0)
         SELECT o_orderkey, o_orderstatus, o_totalprice, ver FROM (
           SELECT *, row_number() OVER (PARTITION BY o_orderkey
                       ORDER BY ver DESC) AS rn
           FROM allrows) WHERE rn = 1
         ORDER BY o_orderkey""",

    // storage must never change content: the manifest-published
    // partitioned table answers j17's order-free max-version model,
    // keyed by (status, orderkey) — the partition column joins the key
    "j19_merge_manifest" ->
      """WITH allrows AS (
           SELECT o_orderkey, o_orderstatus, o_totalprice,
                  CAST(1 AS BIGINT) AS ver FROM orders
           UNION ALL
           SELECT o_orderkey, o_orderstatus, o_totalprice + 1.0, 2
           FROM orders WHERE o_orderkey % 5 = 0
           UNION ALL
           SELECT o_orderkey, o_orderstatus, o_totalprice - 5.0, 0
           FROM orders WHERE o_orderkey % 3 = 0)
         SELECT o_orderkey, o_orderstatus, o_totalprice, ver FROM (
           SELECT *, row_number() OVER (
                       PARTITION BY o_orderstatus, o_orderkey
                       ORDER BY ver DESC) AS rn
           FROM allrows) WHERE rn = 1
         ORDER BY o_orderkey, o_orderstatus""",

    // compaction must never change content: j19's model on the %7
    // slice — the compacted single-epoch table answers identically
    "j20_merge_compact" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice
                       FROM orders WHERE o_orderkey % 7 = 0),
              allrows AS (
           SELECT o_orderkey, o_orderstatus, o_totalprice,
                  CAST(1 AS BIGINT) AS ver FROM base
           UNION ALL
           SELECT o_orderkey, o_orderstatus, o_totalprice + 1.0, 2
           FROM base WHERE o_orderkey % 5 = 0
           UNION ALL
           SELECT o_orderkey, o_orderstatus, o_totalprice - 5.0, 0
           FROM base WHERE o_orderkey % 3 = 0)
         SELECT o_orderkey, o_orderstatus, o_totalprice, ver FROM (
           SELECT *, row_number() OVER (
                       PARTITION BY o_orderstatus, o_orderkey
                       ORDER BY ver DESC) AS rn
           FROM allrows) WHERE rn = 1
         ORDER BY o_orderkey, o_orderstatus""",

    // partial compaction never changes content: the oracle is the
    // j20 max-version model verbatim
    "j33_partial_compact" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice
                       FROM orders WHERE o_orderkey % 7 = 0),
              allrows AS (
           SELECT o_orderkey, o_orderstatus, o_totalprice,
                  CAST(1 AS BIGINT) AS ver FROM base
           UNION ALL
           SELECT o_orderkey, o_orderstatus, o_totalprice + 1.0, 2
           FROM base WHERE o_orderkey % 5 = 0
           UNION ALL
           SELECT o_orderkey, o_orderstatus, o_totalprice - 5.0, 0
           FROM base WHERE o_orderkey % 3 = 0)
         SELECT o_orderkey, o_orderstatus, o_totalprice, ver FROM (
           SELECT *, row_number() OVER (
                       PARTITION BY o_orderstatus, o_orderkey
                       ORDER BY ver DESC) AS rn
           FROM allrows) WHERE rn = 1
         ORDER BY o_orderkey, o_orderstatus""",

    // the sharded-manifest table must equal the single-file model:
    // max-version merge minus the keyed deletes, partial compact a
    // content no-op
    "j34_merge_sharded" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice
                       FROM orders WHERE o_orderkey % 7 = 0),
              allrows AS (
           SELECT o_orderkey, o_orderstatus, o_totalprice,
                  CAST(1 AS BIGINT) AS ver FROM base
           UNION ALL
           SELECT o_orderkey, o_orderstatus, o_totalprice + 1.0, 2
           FROM base WHERE o_orderkey % 5 = 0
           UNION ALL
           SELECT o_orderkey, o_orderstatus, o_totalprice - 5.0, 0
           FROM base WHERE o_orderkey % 3 = 0)
         SELECT o_orderkey, o_orderstatus, o_totalprice, ver FROM (
           SELECT *, row_number() OVER (
                       PARTITION BY o_orderstatus, o_orderkey
                       ORDER BY ver DESC) AS rn
           FROM allrows) WHERE rn = 1 AND o_orderkey % 11 <> 0
         ORDER BY o_orderkey, o_orderstatus""",

    // crash/rename/retry/delete model; orphan_debris is the engine's
    // own count of unreclaimed crash artifacts — the oracle pins it
    // at zero
    "j35_crash_reclaim" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice
                       FROM orders WHERE o_orderkey % 13 = 0),
              allrows AS (
           SELECT o_orderkey, o_orderstatus,
                  o_totalprice AS price, CAST(1 AS BIGINT) AS ver
           FROM base
           UNION ALL
           SELECT o_orderkey, o_orderstatus, o_totalprice + 2.0, 2
           FROM base WHERE o_orderkey % 4 = 0)
         SELECT o_orderkey, o_orderstatus, price, ver,
                CAST(0 AS BIGINT) AS orphan_debris FROM (
           SELECT *, row_number() OVER (
                       PARTITION BY o_orderstatus, o_orderkey
                       ORDER BY ver DESC) AS rn
           FROM allrows) WHERE rn = 1 AND o_orderkey % 9 <> 0
         ORDER BY o_orderkey, o_orderstatus""",

    // time travel: the table AS OF manifest 1 is the max-version model
    // over batches 1+2 only — batch 3 (ver=3, +100.0) must be invisible
    "j21_merge_timetravel" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice
                       FROM orders WHERE o_orderkey % 7 = 0),
              allrows AS (
           SELECT o_orderkey, o_orderstatus, o_totalprice,
                  CAST(1 AS BIGINT) AS ver FROM base
           UNION ALL
           SELECT o_orderkey, o_orderstatus, o_totalprice + 1.0, 2
           FROM base WHERE o_orderkey % 5 = 0)
         SELECT o_orderkey, o_orderstatus, o_totalprice, ver FROM (
           SELECT *, row_number() OVER (
                       PARTITION BY o_orderstatus, o_orderkey
                       ORDER BY ver DESC) AS rn
           FROM allrows) WHERE rn = 1
         ORDER BY o_orderkey, o_orderstatus""",

    // add-and-widen evolution: one widened schema over both writers —
    // int32 batch-1 values upcast, never-touched rows carry a null tag
    "j22_merge_evolve" ->
      """WITH allrows AS (
           SELECT o_orderkey, o_orderstatus,
                  CAST(o_orderkey % 97 AS BIGINT) AS qty,
                  CAST(NULL AS VARCHAR) AS tag,
                  CAST(1 AS BIGINT) AS ver
           FROM orders
           UNION ALL
           SELECT o_orderkey, o_orderstatus,
                  o_orderkey % 97 + 5000000000, 'evolved', 2
           FROM orders WHERE o_orderkey % 5 = 0)
         SELECT o_orderkey, o_orderstatus, qty, tag, ver FROM (
           SELECT *, row_number() OVER (
                       PARTITION BY o_orderstatus, o_orderkey
                       ORDER BY ver DESC) AS rn
           FROM allrows) WHERE rn = 1
         ORDER BY o_orderkey, o_orderstatus""",

    // the CDC stream's net effect: %3 keys deleted, %5 survivors
    // updated (+1.0, ver 2), the rest at their initial version
    "x_stream_cdc" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice
                       FROM orders WHERE o_orderkey % 7 = 0)
         SELECT o_orderkey, o_orderstatus,
                CASE WHEN o_orderkey % 5 = 0
                     THEN o_totalprice + 1.0
                     ELSE o_totalprice END AS o_totalprice,
                CAST(CASE WHEN o_orderkey % 5 = 0 THEN 2 ELSE 1 END
                     AS BIGINT) AS ver
         FROM base WHERE o_orderkey % 3 <> 0
         ORDER BY o_orderkey, o_orderstatus""",

    // a metadata-only rename must never change content: the model is
    // computed under the final column name throughout
    "j23_merge_rename" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus FROM orders
                       WHERE o_orderkey % 7 = 0),
              allrows AS (
           SELECT o_orderkey, o_orderstatus,
                  o_orderkey % 97 AS quantity, CAST(1 AS BIGINT) AS ver
           FROM base
           UNION ALL
           SELECT o_orderkey, o_orderstatus, o_orderkey % 97 + 1000, 2
           FROM base WHERE o_orderkey % 5 = 0)
         SELECT o_orderkey, o_orderstatus, quantity, ver FROM (
           SELECT *, row_number() OVER (
                       PARTITION BY o_orderstatus, o_orderkey
                       ORDER BY ver DESC) AS rn
           FROM allrows) WHERE rn = 1
         ORDER BY o_orderkey, o_orderstatus""",

    // manifest-level pruning must not change content: the model
    // restricted to the named partitions
    "j24_merge_pruned_read" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice
                       FROM orders WHERE o_orderkey % 7 = 0),
              allrows AS (
           SELECT o_orderkey, o_orderstatus, o_totalprice,
                  CAST(1 AS BIGINT) AS ver FROM base
           UNION ALL
           SELECT o_orderkey, o_orderstatus, o_totalprice + 1.0, 2
           FROM base WHERE o_orderkey % 5 = 0)
         SELECT o_orderkey, o_orderstatus, o_totalprice, ver FROM (
           SELECT *, row_number() OVER (
                       PARTITION BY o_orderstatus, o_orderkey
                       ORDER BY ver DESC) AS rn
           FROM allrows) WHERE rn = 1 AND o_orderstatus IN ('F', 'O')
         ORDER BY o_orderkey, o_orderstatus""",

    // data skipping must equal a plain filter: the merge model under
    // the same BETWEEN
    "j26_merge_skipping" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice
                       FROM orders WHERE o_orderkey % 7 = 0),
              allrows AS (
           SELECT o_orderkey, o_orderstatus, o_totalprice,
                  CAST(1 AS BIGINT) AS ver FROM base
           UNION ALL
           SELECT o_orderkey, o_orderstatus, o_totalprice + 1.0, 2
           FROM base WHERE o_orderkey % 5 = 0)
         SELECT o_orderkey, o_orderstatus, o_totalprice, ver FROM (
           SELECT *, row_number() OVER (
                       PARTITION BY o_orderstatus, o_orderkey
                       ORDER BY ver DESC) AS rn
           FROM allrows) WHERE rn = 1
           AND o_totalprice BETWEEN 100000.0 AND 200000.0
         ORDER BY o_orderkey, o_orderstatus""",

    // identical semantics to j26 through the sharded manifest's
    // two-tier (bucket #bstats, then dir #stats) pruning
    "j36_range_sharded" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice
                       FROM orders WHERE o_orderkey % 7 = 0),
              allrows AS (
           SELECT o_orderkey, o_orderstatus, o_totalprice,
                  CAST(1 AS BIGINT) AS ver FROM base
           UNION ALL
           SELECT o_orderkey, o_orderstatus, o_totalprice + 1.0, 2
           FROM base WHERE o_orderkey % 5 = 0)
         SELECT o_orderkey, o_orderstatus, o_totalprice, ver FROM (
           SELECT *, row_number() OVER (
                       PARTITION BY o_orderstatus, o_orderkey
                       ORDER BY ver DESC) AS rn
           FROM allrows) WHERE rn = 1
           AND o_totalprice BETWEEN 100000.0 AND 200000.0
         ORDER BY o_orderkey, o_orderstatus""",

    // the 0→2 change feed: pre/post pairs for the %5 updates (minus
    // the deleted), delete pre-images for the %11 keys, silence for
    // keys rewritten-in-place with unchanged values
    "j27_merge_cdf" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice
                       FROM orders WHERE o_orderkey % 7 = 0),
              chg AS (
           SELECT o_orderkey, o_orderstatus, o_totalprice,
                  CAST(1 AS BIGINT) AS ver,
                  'update_preimage' AS _change_type
           FROM base WHERE o_orderkey % 5 = 0 AND o_orderkey % 11 <> 0
           UNION ALL
           SELECT o_orderkey, o_orderstatus, o_totalprice + 1.0, 2,
                  'update_postimage'
           FROM base WHERE o_orderkey % 5 = 0 AND o_orderkey % 11 <> 0
           UNION ALL
           SELECT o_orderkey, o_orderstatus, o_totalprice, 1, 'delete'
           FROM base WHERE o_orderkey % 11 = 0)
         SELECT o_orderkey, o_orderstatus, o_totalprice, ver,
                _change_type
         FROM chg
         ORDER BY o_orderkey, o_orderstatus, _change_type""",

    // poll-and-checkpoint: poll 1 carries the 0->1 update pre/post
    // pairs (ALL %5 keys — nothing deleted yet), poll 2 the 1->2
    // delete pre-images at their MANIFEST-1 values (%55 keys show the
    // updated price and ver 2), poll 3 is empty
    "j28_changes_since" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice
                       FROM orders WHERE o_orderkey % 7 = 0),
              p1 AS (
           SELECT o_orderkey, o_orderstatus, o_totalprice,
                  CAST(1 AS BIGINT) AS ver,
                  'update_preimage' AS _change_type,
                  CAST(1 AS BIGINT) AS poll
           FROM base WHERE o_orderkey % 5 = 0
           UNION ALL
           SELECT o_orderkey, o_orderstatus, o_totalprice + 1.0, 2,
                  'update_postimage', 1
           FROM base WHERE o_orderkey % 5 = 0),
              p2 AS (
           SELECT o_orderkey, o_orderstatus,
                  CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
                       ELSE o_totalprice END AS o_totalprice,
                  CAST(CASE WHEN o_orderkey % 5 = 0 THEN 2 ELSE 1 END
                       AS BIGINT) AS ver,
                  'delete' AS _change_type, CAST(2 AS BIGINT) AS poll
           FROM base WHERE o_orderkey % 11 = 0)
         SELECT o_orderkey, o_orderstatus, o_totalprice, ver,
                _change_type, poll
         FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2)
         ORDER BY poll, o_orderkey, o_orderstatus, _change_type""",

    // the streaming-maintained view equals the batch one: a32's
    // rebuild oracle verbatim (same final facts, same arithmetic)
    "x_stream_mv" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice
                       FROM orders WHERE o_orderkey % 7 = 0),
              fin AS (
           SELECT o_orderstatus,
                  CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
                       ELSE o_totalprice END AS v
           FROM base WHERE o_orderkey % 11 <> 0)
         SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
                round(CAST(sum(CAST(v AS DECIMAL(18,4))) AS DOUBLE), 4)
                  AS total,
                round(CAST(sum(CAST(v AS DECIMAL(18,4))) AS DOUBLE) /
                      CAST(count(*) AS DOUBLE), 6) AS mean
         FROM fin GROUP BY 1 ORDER BY 1""",

    // the incrementally-maintained-and-pruned view equals a rebuild
    // over the final facts: %11 keys deleted, %13 survivors at +2
    // (overwriting any %5 +1), remaining %5 at +1
    "x_stream_mv_prune" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice
                       FROM orders WHERE o_orderkey % 7 = 0),
              fin AS (
           SELECT o_orderstatus,
                  CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 2.0
                       WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
                       ELSE o_totalprice END AS v
           FROM base WHERE o_orderkey % 11 <> 0)
         SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
                round(CAST(sum(CAST(v AS DECIMAL(18,4))) AS DOUBLE), 4)
                  AS total,
                round(CAST(sum(CAST(v AS DECIMAL(18,4))) AS DOUBLE) /
                      CAST(count(*) AS DOUBLE), 6) AS mean
         FROM fin GROUP BY 1 ORDER BY 1""",

    // both consumers' views must equal the final rebuild — one row set
    // per consumer tag; a missed or double-fed interval on either
    // consumer (e.g. an over-eager prune under the lagging one)
    // hash-mismatches
    "x_stream_mv_2consumers" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice
                       FROM orders WHERE o_orderkey % 7 = 0),
              fin AS (
           SELECT o_orderstatus,
                  CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
                       ELSE o_totalprice END AS v
           FROM base WHERE o_orderkey % 11 <> 0),
              v AS (
           SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
                  round(CAST(sum(CAST(v AS DECIMAL(18,4))) AS DOUBLE), 4)
                    AS total,
                  round(CAST(sum(CAST(v AS DECIMAL(18,4))) AS DOUBLE) /
                        CAST(count(*) AS DOUBLE), 6) AS mean
           FROM fin GROUP BY 1)
         SELECT c.consumer, v.o_orderstatus, v.n, v.total, v.mean
         FROM v CROSS JOIN (VALUES ('mv1'), ('mv2')) AS c(consumer)
         ORDER BY 1, 2""",

    // the replica converges to the source's final model: %11 keys
    // deleted (including the %55 updated-then-deleted ones — the
    // interval-epoch ordering), %5 survivors updated at ver 2
    "x_stream_replicate" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice
                       FROM orders WHERE o_orderkey % 7 = 0)
         SELECT o_orderkey, o_orderstatus,
                CASE WHEN o_orderkey % 5 = 0
                     THEN o_totalprice + 1.0
                     ELSE o_totalprice END AS o_totalprice,
                CAST(CASE WHEN o_orderkey % 5 = 0 THEN 2 ELSE 1 END
                     AS BIGINT) AS ver
         FROM base WHERE o_orderkey % 11 <> 0
         ORDER BY o_orderkey, o_orderstatus""",

    // the converged replica after rename -> churn -> drop -> re-grow:
    // %11 rows churned post-drop (q2 frozen to null, note live, ver
    // 4); %3 rows hold the renamed-wave values; %5-only rows the
    // update wave's; the rest epoch-0 values under the final name
    "x_stream_replicate_evolve" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus FROM orders
                       WHERE o_orderkey % 7 = 0)
         SELECT o_orderkey, o_orderstatus,
                CASE WHEN o_orderkey % 11 = 0 THEN NULL
                     WHEN o_orderkey % 3 = 0
                       THEN CAST(o_orderkey % 89 + 5000 AS BIGINT)
                     WHEN o_orderkey % 5 = 0
                       THEN CAST(o_orderkey % 97 + 1000 AS BIGINT)
                     ELSE CAST(o_orderkey % 97 AS BIGINT) END AS q2,
                CASE WHEN o_orderkey % 11 = 0
                     THEN 'n' || CAST(o_orderkey % 10 AS VARCHAR)
                     ELSE NULL END AS note,
                CAST(CASE WHEN o_orderkey % 11 = 0 THEN 4
                          WHEN o_orderkey % 3 = 0 THEN 3
                          WHEN o_orderkey % 5 = 0 THEN 2
                          ELSE 1 END AS BIGINT) AS ver
         FROM base ORDER BY o_orderkey, o_orderstatus""",

    // the drained feed = both intervals' diffs, tagged by interval:
    // j28's polled model with (_from_epoch, _to_epoch) in place of the
    // poll counter
    "x_stream_cdf_source" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice
                       FROM orders WHERE o_orderkey % 7 = 0),
              i1 AS (
           SELECT o_orderkey, o_orderstatus, o_totalprice,
                  CAST(1 AS BIGINT) AS ver,
                  'update_preimage' AS _change_type,
                  CAST(0 AS BIGINT) AS _from_epoch,
                  CAST(1 AS BIGINT) AS _to_epoch
           FROM base WHERE o_orderkey % 5 = 0
           UNION ALL
           SELECT o_orderkey, o_orderstatus, o_totalprice + 1.0, 2,
                  'update_postimage', 0, 1
           FROM base WHERE o_orderkey % 5 = 0),
              i2 AS (
           SELECT o_orderkey, o_orderstatus,
                  CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
                       ELSE o_totalprice END AS o_totalprice,
                  CAST(CASE WHEN o_orderkey % 5 = 0 THEN 2 ELSE 1 END
                       AS BIGINT) AS ver,
                  'delete' AS _change_type,
                  CAST(1 AS BIGINT) AS _from_epoch,
                  CAST(2 AS BIGINT) AS _to_epoch
           FROM base WHERE o_orderkey % 11 = 0)
         SELECT o_orderkey, o_orderstatus, o_totalprice, ver,
                _change_type, _from_epoch, _to_epoch
         FROM (SELECT * FROM i1 UNION ALL SELECT * FROM i2)
         ORDER BY _from_epoch, o_orderkey, o_orderstatus, _change_type""",

    // both intervals' diffs under the FINAL name: interval (0,1] was
    // FED under `quantity` (pre-rename files) and must still surface
    // its values — the schema-versioned feed's whole point; interval
    // (1,3] composes the rename inside changesBetween
    "x_stream_cdf_rename_feed" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus FROM orders
                       WHERE o_orderkey % 7 = 0),
              i1 AS (
           SELECT o_orderkey, o_orderstatus,
                  CAST(o_orderkey % 97 AS BIGINT) AS qty2,
                  CAST(1 AS BIGINT) AS ver,
                  'update_preimage' AS _change_type,
                  CAST(0 AS BIGINT) AS _from_epoch,
                  CAST(1 AS BIGINT) AS _to_epoch
           FROM base WHERE o_orderkey % 5 = 0
           UNION ALL
           SELECT o_orderkey, o_orderstatus, o_orderkey % 97 + 1000, 2,
                  'update_postimage', 0, 1
           FROM base WHERE o_orderkey % 5 = 0),
              i2 AS (
           SELECT o_orderkey, o_orderstatus,
                  CAST(CASE WHEN o_orderkey % 5 = 0
                       THEN o_orderkey % 97 + 1000
                       ELSE o_orderkey % 97 END AS BIGINT) AS qty2,
                  CAST(CASE WHEN o_orderkey % 5 = 0 THEN 2 ELSE 1 END
                       AS BIGINT) AS ver,
                  'update_preimage' AS _change_type,
                  CAST(1 AS BIGINT) AS _from_epoch,
                  CAST(3 AS BIGINT) AS _to_epoch
           FROM base WHERE o_orderkey % 3 = 0
           UNION ALL
           SELECT o_orderkey, o_orderstatus, o_orderkey % 89 + 5000, 3,
                  'update_postimage', 1, 3
           FROM base WHERE o_orderkey % 3 = 0)
         SELECT o_orderkey, o_orderstatus, qty2, ver, _change_type,
                _from_epoch, _to_epoch
         FROM (SELECT * FROM i1 UNION ALL SELECT * FROM i2)
         ORDER BY _from_epoch, o_orderkey, o_orderstatus, _change_type""",

    // a rename inside the feed interval is pure metadata: the diff is
    // exactly j27's pre/post/delete model, under the FINAL name
    "j29_cdf_rename" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus FROM orders
                       WHERE o_orderkey % 7 = 0),
              chg AS (
           SELECT o_orderkey, o_orderstatus,
                  CAST(o_orderkey % 97 AS BIGINT) AS quantity,
                  CAST(1 AS BIGINT) AS ver,
                  'update_preimage' AS _change_type
           FROM base WHERE o_orderkey % 5 = 0 AND o_orderkey % 11 <> 0
           UNION ALL
           SELECT o_orderkey, o_orderstatus, o_orderkey % 97 + 1000, 2,
                  'update_postimage'
           FROM base WHERE o_orderkey % 5 = 0 AND o_orderkey % 11 <> 0
           UNION ALL
           SELECT o_orderkey, o_orderstatus, o_orderkey % 97, 1, 'delete'
           FROM base WHERE o_orderkey % 11 = 0)
         SELECT o_orderkey, o_orderstatus, quantity, ver, _change_type
         FROM chg ORDER BY o_orderkey, o_orderstatus, _change_type""",

    // the streaming multi-measure view equals a33's rebuild — same
    // wave algebra, through a real drained stream with the dirty-group
    // repair reading the live table
    "x_stream_mv_multi" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice,
                              CAST(o_orderkey % 97 AS DOUBLE) AS qty
                       FROM orders WHERE o_orderkey % 7 = 0),
              fin AS (
           SELECT o_orderstatus,
                  CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1000.0
                       ELSE o_totalprice END AS p,
                  CASE WHEN o_orderkey % 5 = 0 THEN qty + 500.0
                       ELSE qty END AS q
           FROM base WHERE o_orderkey % 11 <> 0)
         SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
                round(CAST(sum(CAST(p AS DECIMAL(18,4))) AS DOUBLE), 4)
                  AS total_price,
                round(CAST(sum(CAST(p AS DECIMAL(18,4))) AS DOUBLE) /
                      CAST(count(*) AS DOUBLE), 6) AS mean_price,
                round(CAST(min(CAST(p AS DECIMAL(18,4))) AS DOUBLE), 4)
                  AS min_price,
                round(CAST(max(CAST(p AS DECIMAL(18,4))) AS DOUBLE), 4)
                  AS max_price,
                round(CAST(sum(CAST(q AS DECIMAL(18,4))) AS DOUBLE), 4)
                  AS total_qty,
                round(CAST(sum(CAST(q AS DECIMAL(18,4))) AS DOUBLE) /
                      CAST(count(*) AS DOUBLE), 6) AS mean_qty,
                round(CAST(min(CAST(q AS DECIMAL(18,4))) AS DOUBLE), 4)
                  AS min_qty,
                round(CAST(max(CAST(q AS DECIMAL(18,4))) AS DOUBLE), 4)
                  AS max_qty
         FROM fin GROUP BY 1 ORDER BY 1""",

    // the multi-measure view equals a from-scratch rebuild over the
    // final facts: %11 keys gone, %5 survivors at price+1000/qty+500;
    // min/max recomputed — the retired extrema must not linger
    "a33_mv_minmax" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice,
                              CAST(o_orderkey % 97 AS DOUBLE) AS qty
                       FROM orders WHERE o_orderkey % 7 = 0),
              fin AS (
           SELECT o_orderstatus,
                  CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1000.0
                       ELSE o_totalprice END AS p,
                  CASE WHEN o_orderkey % 5 = 0 THEN qty + 500.0
                       ELSE qty END AS q
           FROM base WHERE o_orderkey % 11 <> 0)
         SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
                round(CAST(sum(CAST(p AS DECIMAL(18,4))) AS DOUBLE), 4)
                  AS total_price,
                round(CAST(sum(CAST(p AS DECIMAL(18,4))) AS DOUBLE) /
                      CAST(count(*) AS DOUBLE), 6) AS mean_price,
                round(CAST(min(CAST(p AS DECIMAL(18,4))) AS DOUBLE), 4)
                  AS min_price,
                round(CAST(max(CAST(p AS DECIMAL(18,4))) AS DOUBLE), 4)
                  AS max_price,
                round(CAST(sum(CAST(q AS DECIMAL(18,4))) AS DOUBLE), 4)
                  AS total_qty,
                round(CAST(sum(CAST(q AS DECIMAL(18,4))) AS DOUBLE) /
                      CAST(count(*) AS DOUBLE), 6) AS mean_qty,
                round(CAST(min(CAST(q AS DECIMAL(18,4))) AS DOUBLE), 4)
                  AS min_qty,
                round(CAST(max(CAST(q AS DECIMAL(18,4))) AS DOUBLE), 4)
                  AS max_qty
         FROM fin GROUP BY 1 ORDER BY 1""",

    // the incrementally-maintained view must equal a from-scratch
    // rebuild over the final facts: %11 keys gone, %5 survivors at
    // price+1 — exact decimal sums, one double division for the mean
    "a32_mv_cdf" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice
                       FROM orders WHERE o_orderkey % 7 = 0),
              fin AS (
           SELECT o_orderstatus,
                  CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
                       ELSE o_totalprice END AS v
           FROM base WHERE o_orderkey % 11 <> 0)
         SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
                round(CAST(sum(CAST(v AS DECIMAL(18,4))) AS DOUBLE), 4)
                  AS total,
                round(CAST(sum(CAST(v AS DECIMAL(18,4))) AS DOUBLE) /
                      CAST(count(*) AS DOUBLE), 6) AS mean
         FROM fin GROUP BY 1 ORDER BY 1""",

    // spans across a drop: span (0,1) = the retired column's update
    // pairs; span (2,3) = the %3 re-add wave with NULL qty
    // before-images (ver = the key's pre-wave version: %5 keys sat at
    // 2, the rest at 1) — retired values never resurface
    "j31_cdf_spans" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus FROM orders
                       WHERE o_orderkey % 7 = 0),
              s1 AS (
           SELECT o_orderkey, o_orderstatus,
                  CAST(o_orderkey % 97 AS BIGINT) AS qty,
                  CAST(1 AS BIGINT) AS ver,
                  'update_preimage' AS _change_type,
                  CAST(0 AS BIGINT) AS _from_epoch,
                  CAST(1 AS BIGINT) AS _to_epoch
           FROM base WHERE o_orderkey % 5 = 0
           UNION ALL
           SELECT o_orderkey, o_orderstatus, o_orderkey % 97 + 1000, 2,
                  'update_postimage', 0, 1
           FROM base WHERE o_orderkey % 5 = 0),
              s2 AS (
           SELECT o_orderkey, o_orderstatus,
                  CAST(NULL AS BIGINT) AS qty,
                  CAST(CASE WHEN o_orderkey % 5 = 0 THEN 2 ELSE 1 END
                       AS BIGINT) AS ver,
                  'update_preimage' AS _change_type,
                  CAST(2 AS BIGINT) AS _from_epoch,
                  CAST(3 AS BIGINT) AS _to_epoch
           FROM base WHERE o_orderkey % 3 = 0
           UNION ALL
           SELECT o_orderkey, o_orderstatus, o_orderkey % 97 + 5000, 3,
                  'update_postimage', 2, 3
           FROM base WHERE o_orderkey % 3 = 0)
         SELECT o_orderkey, o_orderstatus, qty, ver, _change_type,
                _from_epoch, _to_epoch
         FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2)
         ORDER BY _from_epoch, o_orderkey, o_orderstatus, _change_type""",

    // drop + re-add: the current read carries NULL tags except the
    // re-add wave (retired epoch-0 bytes never resurrect); time travel
    // to manifest 0 still reconstructs the original tags
    "j30_merge_dropcol" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus FROM orders
                       WHERE o_orderkey % 7 = 0),
              cur AS (
           SELECT 'current' AS src, o_orderkey, o_orderstatus,
                  CASE WHEN o_orderkey % 5 = 0 THEN 'new'
                       ELSE NULL END AS tag,
                  CAST(CASE WHEN o_orderkey % 5 = 0 THEN 2 ELSE 1 END
                       AS BIGINT) AS ver
           FROM base),
              hist AS (
           SELECT 'epoch0', o_orderkey, o_orderstatus,
                  'old_' || CAST(o_orderkey % 3 AS VARCHAR),
                  CAST(1 AS BIGINT)
           FROM base)
         SELECT src, o_orderkey, o_orderstatus, tag, ver
         FROM (SELECT * FROM cur UNION ALL SELECT * FROM hist)
         ORDER BY src, o_orderkey, o_orderstatus""",

    // current = widened values on the %5 keys (past int range), the
    // rest upcast from the narrow era; epoch0 = the original ints,
    // BIGINT-cast on both sides for one output shape
    "j32_merge_widen" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus FROM orders
                       WHERE o_orderkey % 7 = 0),
              cur AS (
           SELECT 'current' AS src, o_orderkey, o_orderstatus,
                  CASE WHEN o_orderkey % 5 = 0
                       THEN CAST(o_orderkey % 89 + 3000000000 AS BIGINT)
                       ELSE CAST(o_orderkey % 97 AS BIGINT) END AS q,
                  CAST(CASE WHEN o_orderkey % 5 = 0 THEN 2 ELSE 1 END
                       AS BIGINT) AS ver
           FROM base),
              hist AS (
           SELECT 'epoch0', o_orderkey, o_orderstatus,
                  CAST(o_orderkey % 97 AS BIGINT),
                  CAST(1 AS BIGINT)
           FROM base)
         SELECT src, o_orderkey, o_orderstatus, q, ver
         FROM (SELECT * FROM cur UNION ALL SELECT * FROM hist)
         ORDER BY src, o_orderkey, o_orderstatus""",

    // the converged replica across the widening: %3 keys carry the
    // post-widen BIGINT wave (latest interval), %5-only the int-era
    // update (upcast), %11 deleted last
    "x_stream_replicate_widen" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus FROM orders
                       WHERE o_orderkey % 7 = 0)
         SELECT o_orderkey, o_orderstatus,
                CASE WHEN o_orderkey % 3 = 0
                     THEN CAST(o_orderkey % 89 + 3000000000 AS BIGINT)
                     WHEN o_orderkey % 5 = 0
                     THEN CAST(o_orderkey % 97 + 1000 AS BIGINT)
                     ELSE CAST(o_orderkey % 97 AS BIGINT) END AS q,
                CAST(CASE WHEN o_orderkey % 3 = 0 THEN 3
                          WHEN o_orderkey % 5 = 0 THEN 2
                          ELSE 1 END AS BIGINT) AS ver
         FROM base WHERE o_orderkey % 11 <> 0
         ORDER BY o_orderkey, o_orderstatus""",

    // the delete removes every %3 key from the merge model
    "j25_merge_delete" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice
                       FROM orders WHERE o_orderkey % 7 = 0),
              allrows AS (
           SELECT o_orderkey, o_orderstatus, o_totalprice,
                  CAST(1 AS BIGINT) AS ver FROM base
           UNION ALL
           SELECT o_orderkey, o_orderstatus, o_totalprice + 1.0, 2
           FROM base WHERE o_orderkey % 5 = 0)
         SELECT o_orderkey, o_orderstatus, o_totalprice, ver FROM (
           SELECT *, row_number() OVER (
                       PARTITION BY o_orderstatus, o_orderkey
                       ORDER BY ver DESC) AS rn
           FROM allrows) WHERE rn = 1 AND o_orderkey % 3 <> 0
         ORDER BY o_orderkey, o_orderstatus""",

    // storage must never change content: the manifest-published SCD2
    // table answers with j10's oracle verbatim
    "j18_scd2_manifest" ->
      """WITH hist AS (SELECT c_custkey AS key, c_mktsegment AS segment,
                              TIMESTAMP '1995-01-01 00:00:00' AS vf,
                              CAST(NULL AS TIMESTAMP) AS vt
                       FROM customer),
              upd AS (SELECT c_custkey AS key,
                             CASE WHEN c_custkey % 3 = 0
                                  THEN 'SEG_' || CAST(c_custkey % 5 AS VARCHAR)
                                  ELSE c_mktsegment END AS segment,
                             TIMESTAMP '2000-06-01 00:00:00' AS ts
                      FROM customer WHERE c_custkey % 3 <> 2),
              chg AS (SELECT h.key, u.segment AS new_seg, u.ts
                      FROM hist h JOIN upd u ON h.key = u.key
                      WHERE h.vt IS NULL AND h.segment <> u.segment),
              res AS (SELECT h.key, h.segment, h.vf,
                             CASE WHEN c.key IS NOT NULL THEN c.ts
                                  ELSE h.vt END AS vt
                      FROM hist h LEFT JOIN chg c
                        ON h.key = c.key AND h.vt IS NULL
                      UNION ALL
                      SELECT key, new_seg, ts, CAST(NULL AS TIMESTAMP)
                      FROM chg)
         SELECT key, segment, strftime(vf, '%Y-%m-%d') AS valid_from,
                coalesce(strftime(vt, '%Y-%m-%d'), 'current') AS valid_to
         FROM res ORDER BY key, valid_from, segment""",

    // the round-trip law: extract→apply must land exactly on the new
    // snapshot, which the oracle computes directly
    "j16_cdc_apply" ->
      """SELECT o_orderkey, o_orderstatus,
                CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
                     ELSE o_totalprice END AS o_totalprice,
                o_orderpriority
         FROM orders WHERE o_orderkey % 10 <> 0
         ORDER BY o_orderkey""",

    "u4_union_evolve" ->
      """WITH u AS (
           SELECT o_orderkey, o_totalprice FROM orders
           WHERE o_orderkey % 2 = 0
           UNION ALL BY NAME
           SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
           WHERE o_orderkey % 2 = 1)
         SELECT coalesce(o_orderstatus, '(legacy)') AS status,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                  AS total
         FROM u GROUP BY 1 ORDER BY 1""",

    "w6_range_frame" ->
      """SELECT user_id, event_id,
                round(CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w
                           AS DOUBLE), 6) AS sum100,
                CAST(count(*) OVER w AS BIGINT) AS n100
         FROM events
         WHERE event_type = 'purchase'
         WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                      RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)
         ORDER BY user_id, event_id""",

    "a24_outliers" ->
      """WITH s AS (SELECT l_extendedprice AS v,
                           row_number() OVER (ORDER BY l_extendedprice)
                             AS rn
                    FROM lineitem),
              k AS (SELECT CAST(ceil(0.5 * count(*)) AS BIGINT) AS k50
                    FROM lineitem),
              med AS (SELECT v FROM s, k WHERE rn = k50),
              d AS (SELECT abs(l_extendedprice - med.v) AS dv
                    FROM lineitem, med),
              ds AS (SELECT dv, row_number() OVER (ORDER BY dv) AS rn
                     FROM d),
              mad AS (SELECT dv FROM ds, k WHERE rn = k50)
         SELECT (SELECT CAST(count(*) AS BIGINT) FROM lineitem, med, mad
                 WHERE abs(l_extendedprice - med.v) > 4.4478 * mad.dv)
                  AS n_outliers,
                (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n,
                (SELECT round(v, 6) FROM med) AS median,
                (SELECT round(dv, 6) FROM mad) AS mad""",

    "sql1_pricing_text" ->
      """SELECT l_returnflag,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                  AS sum_qty,
                CAST(count(*) AS BIGINT) AS n
         FROM lineitem
         WHERE l_shipdate < DATE '1998-09-01'
         GROUP BY l_returnflag
         ORDER BY l_returnflag""",

    "w7_share" ->
      """WITH rev AS (
           SELECT r_name, n_name,
                  sum(CAST(o_totalprice AS DECIMAL(18,4))) AS _rev
           FROM orders
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           GROUP BY 1, 2)
         SELECT r_name, n_name,
                round(CAST(_rev AS DOUBLE), 6) AS revenue,
                round(CAST(_rev AS DOUBLE) /
                  CAST(sum(_rev) OVER (PARTITION BY r_name) AS DOUBLE), 6)
                  AS share
         FROM rev
         ORDER BY r_name, n_name""",

    "a25_unpivot" ->
      """WITH wide AS (
           SELECT l_returnflag,
                  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                    AS qty,
                  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)))
                       AS DOUBLE) AS revenue,
                  CAST(count(*) AS DOUBLE) AS n_items
           FROM lineitem GROUP BY 1)
         SELECT l_returnflag, metric, round(val, 6) AS val
         FROM wide UNPIVOT (val FOR metric IN (qty, revenue, n_items))
         ORDER BY l_returnflag, metric""",

    "a26_argmax" ->
      """SELECT n_name,
                arg_max(c_name, CAST(c_acctbal AS DECIMAL(18,2))
                  * 1000000000 + c_custkey) AS richest,
                arg_min(c_name, CAST(c_acctbal AS DECIMAL(18,2))
                  * 1000000000 + c_custkey) AS poorest,
                round(max(c_acctbal), 6) AS max_bal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY 1 ORDER BY 1""",

    "x_ts_gapfill" ->
      """WITH d AS (
           SELECT user_id % 101 AS k,
                  CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                  CAST(count(*) AS BIGINT) AS n,
                  sum(CAST(value AS DECIMAL(18,4))) AS total
           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
         b AS (SELECT k, min(day) AS mn, max(day) AS mx FROM d GROUP BY 1),
         s AS (SELECT k, CAST(unnest(generate_series(
                 CAST(mn AS TIMESTAMP), CAST(mx AS TIMESTAMP),
                 INTERVAL 1 DAY)) AS DATE) AS day
               FROM b)
         SELECT s.k, strftime(s.day, '%Y-%m-%d') AS day,
                coalesce(d.n, 0) AS n,
                d.day IS NULL AS was_gap,
                round(CAST(last_value(d.total IGNORE NULLS) OVER (
                  PARTITION BY s.k ORDER BY s.day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE), 6) AS filled
         FROM s LEFT JOIN d ON s.k = d.k AND s.day = d.day
         ORDER BY s.k, s.day""",

    "x_ts_anomaly" ->
      """WITH p AS (SELECT user_id, event_id, value FROM events
                    WHERE event_type = 'purchase'),
         m AS (SELECT user_id, event_id, value,
                 CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w
                   AS DOUBLE) AS s,
                 CAST(sum(CAST(value AS DECIMAL(18,4)) *
                          CAST(value AS DECIMAL(18,4))) OVER w
                   AS DOUBLE) AS s2,
                 CAST(count(*) OVER w AS DOUBLE) AS n
               FROM p
               WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN 15 PRECEDING AND CURRENT ROW))
         SELECT user_id, event_id, round(value, 6) AS value,
                round((value - s / n) /
                  sqrt(greatest((s2 - s * s / n) / (n - 1), 1e-12)), 6)
                  AS zscore
         FROM m
         WHERE n >= 8 AND abs((value - s / n) /
           sqrt(greatest((s2 - s * s / n) / (n - 1), 1e-12))) > 2.5
         ORDER BY user_id, event_id""",

    // brute force on purpose: every window's COUNT DISTINCT from
    // scratch — the gate proves the delta/running-sum formulation
    // computes the same thing in one pass
    "x_ts_sliding_distinct" ->
      """WITH act AS (
           SELECT DISTINCT user_id,
                  CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
           FROM events),
         b AS (SELECT min(d) AS mn, max(d) AS mx FROM act),
         s AS (SELECT CAST(unnest(generate_series(
                 CAST(mn AS TIMESTAMP), CAST(mx AS TIMESTAMP),
                 INTERVAL 1 DAY)) AS DATE) AS day FROM b)
         SELECT strftime(s.day, '%Y-%m-%d') AS day,
                CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
         FROM s LEFT JOIN act a
           ON a.d <= s.day AND a.d > s.day - 7
         GROUP BY s.day ORDER BY day""",

    // identical to x_ts_sliding_distinct by design: the streaming
    // compensated deltas must sum to the batch interval algebra
    "x_stream_sliding_distinct" ->
      """WITH act AS (
           SELECT DISTINCT user_id,
                  CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
           FROM events),
         b AS (SELECT min(d) AS mn, max(d) AS mx FROM act),
         s AS (SELECT CAST(unnest(generate_series(
                 CAST(mn AS TIMESTAMP), CAST(mx AS TIMESTAMP),
                 INTERVAL 1 DAY)) AS DATE) AS day FROM b)
         SELECT strftime(s.day, '%Y-%m-%d') AS day,
                CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
         FROM s LEFT JOIN act a
           ON a.d <= s.day AND a.d > s.day - 7
         GROUP BY s.day ORDER BY day""",

    // the same zero-seeded left fold in frame order — list_reduce
    // seeds with the FIRST element, so the explicit 0 prepend IS the
    // seed (the x_text_tokens idiom)
    "x_ts_decay" ->
      """WITH l AS (
           SELECT user_id, event_id,
                  list(value) OVER (PARTITION BY user_id
                    ORDER BY event_id
                    ROWS BETWEEN 31 PRECEDING AND CURRENT ROW) AS arr
           FROM events)
         SELECT user_id, event_id,
                list_reduce(
                  list_prepend(CAST(0 AS DOUBLE), arr),
                  (a, c) -> a / 2.0 + c) AS decayed
         FROM l ORDER BY user_id, event_id""",

    "x_ts_streaks" ->
      """WITH days AS (
           SELECT DISTINCT user_id,
                  CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
           FROM events),
         isl AS (
           SELECT user_id,
                  CAST(day - DATE '1970-01-01' AS BIGINT) -
                    row_number() OVER (PARTITION BY user_id
                                       ORDER BY day) AS g
           FROM days),
         runs AS (SELECT user_id, g, count(*) AS len
                  FROM isl GROUP BY 1, 2)
         SELECT user_id,
                CAST(sum(len) AS BIGINT) AS active_days,
                CAST(count(*) AS BIGINT) AS n_streaks,
                CAST(max(len) AS BIGINT) AS longest_streak
         FROM runs GROUP BY 1 ORDER BY 1""",

    "a27_incremental_report" ->
      """SELECT o_orderpriority,
                CAST(count(*) AS BIGINT) AS n,
                round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
                  AS DOUBLE), 6) AS total,
                round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
                  AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS mean,
                round(CAST(min(CAST(o_totalprice AS DECIMAL(18,4)))
                  AS DOUBLE), 6) AS vmin,
                round(CAST(max(CAST(o_totalprice AS DECIMAL(18,4)))
                  AS DOUBLE), 6) AS vmax
         FROM orders
         GROUP BY 1 ORDER BY 1""",

    // DECIMAL(19,4) operands in the products: DuckDB's DECIMAL(18)
    // multiply runs on the int64 fast path and overflow-checks the
    // RAW-unit product; width 19 forces int128. Spark's sums widen to
    // DECIMAL(38,8) on their own — both engines stay exact, so the
    // final doubles agree.
    "a28_corr_matrix" ->
      """WITH m AS (
           SELECT CAST(count(*) AS DOUBLE) AS n,
                  CAST(sum(CAST(l_quantity AS DECIMAL(19,4)))
                    AS DOUBLE) AS s_q,
                  CAST(sum(CAST(l_quantity AS DECIMAL(19,4)) *
                           CAST(l_quantity AS DECIMAL(19,4)))
                    AS DOUBLE) AS ss_q,
                  CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4)))
                    AS DOUBLE) AS s_p,
                  CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4)) *
                           CAST(l_extendedprice AS DECIMAL(19,4)))
                    AS DOUBLE) AS ss_p,
                  CAST(sum(CAST(l_discount AS DECIMAL(19,4)))
                    AS DOUBLE) AS s_d,
                  CAST(sum(CAST(l_discount AS DECIMAL(19,4)) *
                           CAST(l_discount AS DECIMAL(19,4)))
                    AS DOUBLE) AS ss_d,
                  CAST(sum(CAST(l_quantity AS DECIMAL(19,4)) *
                           CAST(l_extendedprice AS DECIMAL(19,4)))
                    AS DOUBLE) AS sp_qp,
                  CAST(sum(CAST(l_quantity AS DECIMAL(19,4)) *
                           CAST(l_discount AS DECIMAL(19,4)))
                    AS DOUBLE) AS sp_qd,
                  CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4)) *
                           CAST(l_discount AS DECIMAL(19,4)))
                    AS DOUBLE) AS sp_pd
           FROM lineitem)
         SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
                round((n * sp_qp - s_q * s_p) /
                  sqrt((n * ss_q - s_q * s_q) *
                       (n * ss_p - s_p * s_p)), 6) AS corr
         FROM m
         UNION ALL
         SELECT 'l_quantity', 'l_discount',
                round((n * sp_qd - s_q * s_d) /
                  sqrt((n * ss_q - s_q * s_q) *
                       (n * ss_d - s_d * s_d)), 6)
         FROM m
         UNION ALL
         SELECT 'l_extendedprice', 'l_discount',
                round((n * sp_pd - s_p * s_d) /
                  sqrt((n * ss_p - s_p * s_p) *
                       (n * ss_d - s_d * s_d)), 6)
         FROM m
         ORDER BY col_a, col_b""",

    // brute-force self-join on purpose — the engine's packed-basket
    // lambda must count exactly what the quadratic join counts
    "a29_basket_pairs" ->
      """WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
                     FROM lineitem),
           it AS (SELECT i, CAST(count(*) AS BIGINT) AS ni
                  FROM bi GROUP BY 1 HAVING count(*) >= 2),
           nb AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n FROM bi),
           pc AS (SELECT x.i AS item_a, y.i AS item_b,
                         CAST(count(*) AS BIGINT) AS n_pair
                  FROM bi x JOIN bi y ON x.b = y.b AND x.i < y.i
                  WHERE x.i IN (SELECT i FROM it)
                    AND y.i IN (SELECT i FROM it)
                  GROUP BY 1, 2 HAVING count(*) >= 2)
         SELECT pc.item_a, pc.item_b, pc.n_pair, ia.ni AS n_a,
                ib.ni AS n_b,
                round(CAST(pc.n_pair AS DOUBLE) * nb.n /
                      (CAST(ia.ni AS DOUBLE) * ib.ni), 6) AS lift
         FROM pc
         JOIN it ia ON pc.item_a = ia.i
         JOIN it ib ON pc.item_b = ib.i
         CROSS JOIN nb
         ORDER BY item_a, item_b""",

    "w8_offsets" ->
      """SELECT o_custkey, o_orderkey,
                lag(o_totalprice, 1) OVER w AS prev_price,
                lead(o_totalprice, 2, -1.0) OVER w AS next2_price,
                first_value(o_totalprice) OVER
                  (PARTITION BY o_custkey ORDER BY o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS first_price,
                nth_value(o_totalprice, 2) OVER
                  (PARTITION BY o_custkey ORDER BY o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS second_price
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
         ORDER BY o_custkey, o_orderkey""",

    "w9_running_distinct" ->
      """SELECT user_id, event_id,
                CAST(count(DISTINCT event_type) OVER (
                  PARTITION BY user_id ORDER BY event_id) AS BIGINT)
                  AS distinct_types
         FROM events
         ORDER BY user_id, event_id""",

    // the identical integer fixed-point iteration unrolled: // is
    // DuckDB's floor division, HUGEINT sums CAST back per round
    "x_graph_pagerank" ->
      """WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
                     FROM lineitem),
           it AS (SELECT i FROM bi GROUP BY i HAVING count(*) >= 2),
           pc AS (SELECT x.i AS a, y.i AS bb
                  FROM bi x JOIN bi y ON x.b = y.b AND x.i < y.i
                  WHERE x.i IN (SELECT i FROM it)
                    AND y.i IN (SELECT i FROM it)
                  GROUP BY 1, 2 HAVING count(*) >= 2),
           e AS (SELECT a AS src, bb AS dst FROM pc
                 UNION ALL SELECT bb, a FROM pc),
           deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS outdeg
                   FROM e GROUP BY 1),
           nodes AS (SELECT DISTINCT src AS id FROM e),
           p0 AS (SELECT id, CAST(1000000 AS BIGINT) AS pr FROM nodes),
           c1 AS (SELECT e.dst AS id, sum(p.pr // d.outdeg) AS inflow
                  FROM e JOIN p0 p ON e.src = p.id
                  JOIN deg d ON e.src = d.id GROUP BY 1),
           p1 AS (SELECT n.id, CAST(150000 +
                    (coalesce(c.inflow, 0) * 850000) // 1000000
                    AS BIGINT) AS pr
                  FROM nodes n LEFT JOIN c1 c ON n.id = c.id),
           c2 AS (SELECT e.dst AS id, sum(p.pr // d.outdeg) AS inflow
                  FROM e JOIN p1 p ON e.src = p.id
                  JOIN deg d ON e.src = d.id GROUP BY 1),
           p2 AS (SELECT n.id, CAST(150000 +
                    (coalesce(c.inflow, 0) * 850000) // 1000000
                    AS BIGINT) AS pr
                  FROM nodes n LEFT JOIN c2 c ON n.id = c.id),
           c3 AS (SELECT e.dst AS id, sum(p.pr // d.outdeg) AS inflow
                  FROM e JOIN p2 p ON e.src = p.id
                  JOIN deg d ON e.src = d.id GROUP BY 1),
           p3 AS (SELECT n.id, CAST(150000 +
                    (coalesce(c.inflow, 0) * 850000) // 1000000
                    AS BIGINT) AS pr
                  FROM nodes n LEFT JOIN c3 c ON n.id = c.id)
         SELECT id AS item, pr AS pr_ppm FROM p3 ORDER BY item""",

    "x_graph_triangles" ->
      """WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
                     FROM lineitem),
           it AS (SELECT i FROM bi GROUP BY i HAVING count(*) >= 2),
           pc AS (SELECT x.i AS a, y.i AS bb
                  FROM bi x JOIN bi y ON x.b = y.b AND x.i < y.i
                  WHERE x.i IN (SELECT i FROM it)
                    AND y.i IN (SELECT i FROM it)
                  GROUP BY 1, 2 HAVING count(*) >= 2),
           w AS (SELECT e1.a AS a, e1.bb AS b, e2.bb AS c
                 FROM pc e1 JOIN pc e2 ON e1.bb = e2.a),
           tri AS (SELECT w.a, w.b, w.c FROM w
                   WHERE EXISTS (SELECT 1 FROM pc e3
                                 WHERE e3.a = w.a AND e3.bb = w.c)),
           corners AS (SELECT a AS id FROM tri
                       UNION ALL SELECT b FROM tri
                       UNION ALL SELECT c FROM tri),
           cnt AS (SELECT id, count(*) AS n FROM corners GROUP BY 1),
           nodes AS (SELECT a AS id FROM pc UNION SELECT bb FROM pc)
         SELECT n.id AS item,
                CAST(coalesce(c.n, 0) AS BIGINT) AS triangles
         FROM nodes n LEFT JOIN cnt c ON n.id = c.id ORDER BY 1""",

    // quantile_cont's lower+(upper−lower)·frac is Spark percentile's
    // formula; at p=0.5 only exact elements or dyadic midpoints occur
    "a31_group_median" ->
      """SELECT o_custkey AS cust,
                CAST(count(*) AS BIGINT) AS n_orders,
                round(quantile_cont(o_totalprice, 0.5), 6)
                  AS median_price
         FROM orders GROUP BY 1 ORDER BY 1""",

    // the identical portable rendering (ints/strings, '|' separator,
    // '<null>' sentinel) hashed with the identical md5-prefix-to-int64
    // nibble arithmetic — sum is HUGEINT in DuckDB, hence the CAST
    "a30_fingerprint" ->
      s"""SELECT o_orderpriority,
                 CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(sum(${hexValSql(
        "md5(CAST(o_orderkey AS VARCHAR) || '|' || " +
          "CAST(o_custkey AS VARCHAR) || '|' || o_orderstatus)")})
                   AS BIGINT) AS checksum
          FROM orders GROUP BY 1 ORDER BY 1""",

    "x_events_funnel" ->
      """WITH v AS (SELECT user_id, min(event_id) AS s1_view
                    FROM events WHERE event_type = 'view' GROUP BY 1),
              c AS (SELECT e.user_id, min(e.event_id) AS s2_click
                    FROM events e
                    JOIN v ON e.user_id = v.user_id
                          AND e.event_id > v.s1_view
                    WHERE e.event_type = 'click' GROUP BY 1),
              p AS (SELECT e.user_id, min(e.event_id) AS s3_purchase
                    FROM events e
                    JOIN c ON e.user_id = c.user_id
                          AND e.event_id > c.s2_click
                    WHERE e.event_type = 'purchase' GROUP BY 1)
         SELECT v.user_id, v.s1_view, c.s2_click, p.s3_purchase,
                CAST(1 + CASE WHEN c.s2_click IS NULL THEN 0 ELSE 1 END
                       + CASE WHEN p.s3_purchase IS NULL THEN 0 ELSE 1
                         END AS BIGINT) AS depth
         FROM v
         LEFT JOIN c ON v.user_id = c.user_id
         LEFT JOIN p ON v.user_id = p.user_id
         ORDER BY v.user_id""",

    "x_events_paths" ->
      """WITH st AS (SELECT lag(event_type) OVER
                              (PARTITION BY user_id ORDER BY event_id)
                            AS from_type,
                            event_type AS to_type
                     FROM events),
              m AS (SELECT from_type, to_type,
                           CAST(count(*) AS BIGINT) AS n
                    FROM st WHERE from_type IS NOT NULL
                    GROUP BY 1, 2)
         SELECT from_type, to_type, n,
                round(n * 1.0 / CAST(sum(n) OVER
                        (PARTITION BY from_type) AS DOUBLE), 6) AS p
         FROM m
         ORDER BY from_type, to_type""",

    // streaming step extraction answers the SAME matrix definition
    "x_stream_paths" ->
      """WITH st AS (SELECT lag(event_type) OVER
                              (PARTITION BY user_id ORDER BY event_id)
                            AS from_type,
                            event_type AS to_type
                     FROM events),
              m AS (SELECT from_type, to_type,
                           CAST(count(*) AS BIGINT) AS n
                    FROM st WHERE from_type IS NOT NULL
                    GROUP BY 1, 2)
         SELECT from_type, to_type, n,
                round(n * 1.0 / CAST(sum(n) OVER
                        (PARTITION BY from_type) AS DOUBLE), 6) AS p
         FROM m
         ORDER BY from_type, to_type""",

    // streaming funnel: completions only (inner joins), same stage
    // CTE chain as x_events_funnel
    "x_stream_funnel" ->
      """WITH v AS (SELECT user_id, min(event_id) AS s1_view
                    FROM events WHERE event_type = 'view' GROUP BY 1),
              c AS (SELECT e.user_id, min(e.event_id) AS s2_click
                    FROM events e
                    JOIN v ON e.user_id = v.user_id
                          AND e.event_id > v.s1_view
                    WHERE e.event_type = 'click' GROUP BY 1),
              p AS (SELECT e.user_id, min(e.event_id) AS s3_purchase
                    FROM events e
                    JOIN c ON e.user_id = c.user_id
                          AND e.event_id > c.s2_click
                    WHERE e.event_type = 'purchase' GROUP BY 1)
         SELECT v.user_id, v.s1_view, c.s2_click, p.s3_purchase
         FROM v
         JOIN c ON v.user_id = c.user_id
         JOIN p ON c.user_id = p.user_id
         ORDER BY v.user_id""",

    "x_events_cohort" ->
      """WITH f AS (SELECT user_id,
                           CAST(date_trunc('week', min(ts)) AS DATE)
                             AS cohort
                    FROM events GROUP BY 1),
              a AS (SELECT DISTINCT user_id,
                           CAST(date_trunc('week', ts) AS DATE) AS bkt
                    FROM events)
         SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort,
                CAST(date_diff('day', f.cohort, a.bkt) // 7 AS BIGINT)
                  AS bucket_offset,
                CAST(count(*) AS BIGINT) AS n_users
         FROM a JOIN f ON a.user_id = f.user_id
         GROUP BY 1, 2
         ORDER BY 1, 2""",

    "x_events_attribution" ->
      """WITH a AS (
           SELECT user_id, event_type, value,
                  last_value(CASE WHEN event_type <> 'purchase'
                                  THEN event_type END IGNORE NULLS)
                    OVER (PARTITION BY user_id ORDER BY event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS ch
           FROM events)
         SELECT coalesce(ch, '(direct)') AS channel,
                CAST(count(*) AS BIGINT) AS n_conversions,
                round(CAST(sum(CAST(value AS DECIMAL(18,4)))
                  AS DOUBLE), 6) AS revenue
         FROM a
         WHERE event_type = 'purchase'
         GROUP BY 1 ORDER BY 1""",

    // same deterministic (metric, cust) tile order on both sides —
    // ntile is order-sensitive, so the tiebreak IS the contract
    "x_events_rfm" ->
      """WITH c AS (
           SELECT o_custkey AS cust,
                  max(CAST(o_orderdate AS DATE)) AS last_d,
                  CAST(count(*) AS BIGINT) AS frequency,
                  sum(CAST(o_totalprice AS DECIMAL(18,4))) AS mv
           FROM orders GROUP BY 1),
           b AS (SELECT max(CAST(o_orderdate AS DATE)) AS mx
                 FROM orders),
           s AS (SELECT cust,
                        CAST(date_diff('day', last_d, mx) AS INT)
                          AS recency_days,
                        frequency, mv
                 FROM c CROSS JOIN b),
           t AS (SELECT cust, recency_days, frequency, mv,
                        CAST(ntile(4) OVER (ORDER BY recency_days DESC,
                          cust) AS INT) AS r,
                        CAST(ntile(4) OVER (ORDER BY frequency, cust)
                          AS INT) AS f,
                        CAST(ntile(4) OVER (ORDER BY mv, cust)
                          AS INT) AS m
                 FROM s)
         SELECT cust, recency_days, frequency,
                round(CAST(mv AS DOUBLE), 6) AS monetary, r, f, m,
                CAST(r AS VARCHAR) || CAST(f AS VARCHAR) ||
                  CAST(m AS VARCHAR) AS segment
         FROM t ORDER BY cust""",

    // identical to x_events_cohort by design: the streaming hits must
    // aggregate to the same retention matrix the batch form computes
    "x_stream_cohort" ->
      """WITH f AS (SELECT user_id,
                           CAST(date_trunc('week', min(ts)) AS DATE)
                             AS cohort
                    FROM events GROUP BY 1),
              a AS (SELECT DISTINCT user_id,
                           CAST(date_trunc('week', ts) AS DATE) AS bkt
                    FROM events)
         SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort,
                CAST(date_diff('day', f.cohort, a.bkt) // 7 AS BIGINT)
                  AS bucket_offset,
                CAST(count(*) AS BIGINT) AS n_users
         FROM a JOIN f ON a.user_id = f.user_id
         GROUP BY 1, 2
         ORDER BY 1, 2""",

    // gaps-and-islands replay of session_window: a session breaks where
    // the gap to the previous event is >= the 10-minute window gap
    // (session ranges [t, t+gap) merge only when they OVERLAP), and the
    // session end is last-event + gap
    "x_stream_sessionize" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
                    FROM events),
              f AS (SELECT user_id, ts, value,
                           CASE WHEN lag(ts) OVER w IS NULL
                                  OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE
                                THEN 1 ELSE 0 END AS newsess
                    FROM e
                    WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
              g AS (SELECT *, sum(newsess) OVER (PARTITION BY user_id
                      ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess_id
                    FROM f)
         SELECT user_id,
                strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                strftime(max(ts) + INTERVAL 10 MINUTE,
                  '%Y-%m-%d %H:%M:%S') AS session_end,
                count(*) AS n_events,
                round(sum(value), 6) AS total
         FROM g GROUP BY user_id, sess_id
         ORDER BY user_id, session_start""",

    // identical to x_stream_sessionize by design: the O(1)-state
    // streaming gap-merge must finalize exactly the sessions the
    // gaps-and-islands replay derives
    "x_stream_sessions" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
                    FROM events),
              f AS (SELECT user_id, ts, value,
                           CASE WHEN lag(ts) OVER w IS NULL
                                  OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE
                                THEN 1 ELSE 0 END AS newsess
                    FROM e
                    WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
              g AS (SELECT *, sum(newsess) OVER (PARTITION BY user_id
                      ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess_id
                    FROM f)
         SELECT user_id,
                strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                strftime(max(ts) + INTERVAL 10 MINUTE,
                  '%Y-%m-%d %H:%M:%S') AS session_end,
                count(*) AS n_events,
                round(sum(value), 6) AS total
         FROM g GROUP BY user_id, sess_id
         ORDER BY user_id, session_start""",

    // identical to x_events_attribution by design: the streaming
    // state machine must credit exactly what the batch ignore-nulls
    // window credits
    "x_stream_attribution" ->
      """WITH a AS (
           SELECT user_id, event_type, value,
                  last_value(CASE WHEN event_type <> 'purchase'
                                  THEN event_type END IGNORE NULLS)
                    OVER (PARTITION BY user_id ORDER BY event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS ch
           FROM events)
         SELECT coalesce(ch, '(direct)') AS channel,
                CAST(count(*) AS BIGINT) AS n_conversions,
                round(CAST(sum(CAST(value AS DECIMAL(18,4)))
                  AS DOUBLE), 6) AS revenue
         FROM a
         WHERE event_type = 'purchase'
         GROUP BY 1 ORDER BY 1""",

    // the stream's event time is re-derived (doc_id minutes past the
    // epoch) and signatures come from the same artifact the engine
    // wrote; ts is monotone in doc_id, so "earlier" is the smaller id
    // and the interval condition is an id-distance bound
    "x_stream_neardup" ->
      """WITH sig AS (SELECT id, sim
                      FROM read_parquet('__GRAFT_SIMHASH__/*.parquet')),
              d AS (SELECT id, sim,
                           TIMESTAMP '2024-01-01 00:00:00' + to_minutes(id) AS ts
                    FROM sig)
         SELECT a.id AS id_earlier, b.id AS id_later,
                CAST(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming,
                strftime(b.ts, '%Y-%m-%d %H:%M:%S') AS ts
         FROM d a JOIN d b
           ON a.id < b.id AND a.ts >= b.ts - INTERVAL 30 MINUTE
         WHERE bit_count(xor(a.sim, b.sim)) <= 3
         ORDER BY id_earlier, id_later""",

    "st3_dedup_window" ->
      """SELECT user_id, event_type, event_id FROM events
         QUALIFY row_number() OVER (PARTITION BY user_id, event_type
           ORDER BY value DESC, event_id DESC) = 1
         ORDER BY user_id, event_type""",

    "x_dedup_exact" ->
      """SELECT md5(text) AS h, min(doc_id) AS keeper, count(*) AS n
         FROM documents GROUP BY text ORDER BY h""",

    "x_pipeline_clean" -> {
      // the same quality arithmetic as the x_text_stats oracle
      val stopCnt =
        """(CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' the ', ''))) / 5 AS INT) +
            CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' and ', ''))) / 5 AS INT) +
            CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' of ', ''))) / 4 AS INT) +
            CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' a ', ''))) / 3 AS INT))"""
      val quality =
        s"""round((
              least(length(text) * 1.0 / 500, 1.0) +
              least(($stopCnt * 1.0 / len(string_split(text, ' '))) * 5.0, 1.0) +
              greatest(1.0 - (length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
                * 1.0 / length(text)) * 10.0, 0.0)
            ) / 3.0, 6)"""
      s"""WITH keep AS (SELECT min(doc_id) AS doc_id FROM documents
                        GROUP BY text),
              d AS (SELECT doc_id, lang, text FROM documents
                    WHERE doc_id IN (SELECT doc_id FROM keep)),
              f AS (SELECT lang, len(string_split(text, ' ')) AS toks
                    FROM d WHERE $quality >= 0.5)
          SELECT lang, count(*) AS n_docs,
                 CAST(sum(toks) AS BIGINT) AS n_tokens
          FROM f GROUP BY lang ORDER BY lang"""
    },

    // the full composition replayed stage by stage: keeper min,
    // quality arithmetic (x_text_stats form), rate thresholds
    // interpolated from Sampling.rateThreshold (one source of truth),
    // bucket-granular budget cut, final accounting
    "x_pipeline_mix" -> {
      val stopCnt =
        """(CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' the ', ''))) / 5 AS INT) +
            CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' and ', ''))) / 5 AS INT) +
            CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' of ', ''))) / 4 AS INT) +
            CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' a ', ''))) / 3 AS INT))"""
      val quality =
        s"""round((
              least(length(text) * 1.0 / 500, 1.0) +
              least(($stopCnt * 1.0 / len(string_split(text, ' '))) * 5.0, 1.0) +
              greatest(1.0 - (length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
                * 1.0 / length(text)) * 10.0, 0.0)
            ) / 3.0, 6)"""
      val (rEn, rZh, rDef) = (operators.Sampling.rateThreshold(0.9),
        operators.Sampling.rateThreshold(0.5),
        operators.Sampling.rateThreshold(0.7))
      s"""WITH keep AS (SELECT min(doc_id) AS doc_id FROM documents
                        GROUP BY text),
              d AS (SELECT doc_id, lang, text FROM documents
                    WHERE doc_id IN (SELECT doc_id FROM keep)),
              q AS (SELECT doc_id, lang, text FROM d
                    WHERE $quality >= 0.5),
              s AS (SELECT doc_id, lang, text FROM q
                    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
                          CASE lang WHEN 'en' THEN '$rEn'
                                    WHEN 'zh' THEN '$rZh'
                                    ELSE '$rDef' END),
              tb AS (SELECT lang, doc_id,
                            len(string_split(text, ' ')) AS tok,
                            substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS bkt
                     FROM s),
              pb AS (SELECT lang, bkt, sum(tok) AS t FROM tb GROUP BY 1, 2),
              cum AS (SELECT lang, bkt,
                             sum(t) OVER (PARTITION BY lang ORDER BY bkt
                               ROWS UNBOUNDED PRECEDING) AS c
                      FROM pb),
              cut AS (SELECT lang, max(bkt) AS maxb FROM cum
                      WHERE c <= 3000 GROUP BY lang)
         SELECT tb.lang, count(*) AS n_docs,
                CAST(sum(tb.tok) AS BIGINT) AS n_tokens
         FROM tb JOIN cut ON tb.lang = cut.lang AND tb.bkt <= cut.maxb
         GROUP BY 1 ORDER BY 1"""
    },

    // thresholds are floor(rate·2^32) as %08x — fixed-width lowercase
    // hex compares byte-wise as its numeric value, so the md5-keyed
    // Bernoulli sample is a portable string comparison (en 0.5, zh
    // 0.25, default 0.75; mirrors Sampling.rateThreshold exactly)
    "x_pipeline_sample" ->
      """WITH s AS (SELECT lang, text FROM documents
                    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
                          CASE lang WHEN 'en' THEN '80000000'
                                    WHEN 'zh' THEN '40000000'
                                    ELSE 'c0000000' END)
         SELECT lang, count(*) AS n_docs,
                CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
         FROM s GROUP BY lang ORDER BY lang""",

    "x_pipeline_token_budget" ->
      """WITH d AS (SELECT lang, doc_id,
                           len(string_split(text, ' ')) AS tok,
                           substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS bkt
                    FROM documents),
              pb AS (SELECT lang, bkt, sum(tok) AS t FROM d GROUP BY 1, 2),
              cum AS (SELECT lang, bkt,
                             sum(t) OVER (PARTITION BY lang ORDER BY bkt
                               ROWS UNBOUNDED PRECEDING) AS c
                      FROM pb),
              cut AS (SELECT lang, max(bkt) AS maxb FROM cum
                      WHERE c <= 5000 GROUP BY lang)
         SELECT d.lang, count(*) AS n_docs,
                CAST(sum(d.tok) AS BIGINT) AS n_tokens
         FROM d JOIN cut ON d.lang = cut.lang AND d.bkt <= cut.maxb
         GROUP BY d.lang ORDER BY d.lang""",

    "x_pipeline_sample_k" ->
      """WITH s AS (SELECT doc_id, lang FROM documents
                    ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id
                    LIMIT 100)
         SELECT doc_id, lang FROM s ORDER BY doc_id""",

    // the streaming sampler's claim IS equality with the batch
    // sampler — same oracle verbatim
    "x_stream_sample" ->
      """WITH s AS (SELECT doc_id, lang FROM documents
                    ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id
                    LIMIT 100)
         SELECT doc_id, lang FROM s ORDER BY doc_id""",

    "x_pipeline_split" ->
      s"""WITH d AS (SELECT lang,
                            CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)),
                                   1, 8) <
                                 '${operators.Sampling.rateThreshold(0.1)}'
                                 THEN 'heldout' ELSE 'train' END AS split,
                            len(string_split(text, ' ')) AS tok
                     FROM documents)
         SELECT lang, split, count(*) AS n_docs,
                CAST(sum(tok) AS BIGINT) AS n_tokens
         FROM d GROUP BY 1, 2 ORDER BY 1, 2""",

    // A-ES clocks replayed in SQL: u = (md5_32(doc_id)+1)/2^32, with the
    // hex coordinate re-derived via strpos nibble arithmetic (DuckDB has
    // no base-16 conv); clock = round(-ln(u)/w, 6), smallest k win with
    // doc_id tiebreak — the engine's exact ordering
    "x_pipeline_weighted" ->
      s"""WITH d AS (SELECT doc_id, lang,
                            len(string_split(text, ' ')) AS w,
                            substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h
                     FROM documents),
              c AS (SELECT doc_id, lang,
                           round(-ln((${hexValSql("h")} + 1) /
                             4294967296.0) / w, 6) AS clk
                    FROM d),
              s AS (SELECT doc_id, lang FROM c
                    ORDER BY clk, doc_id LIMIT 100)
         SELECT doc_id, lang FROM s ORDER BY doc_id""",

    "x_pipeline_weighted_cap" ->
      s"""WITH d AS (SELECT doc_id, lang,
                            len(string_split(text, ' ')) AS w,
                            substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h
                     FROM documents),
              c AS (SELECT doc_id, lang,
                           round(-ln((${hexValSql("h")} + 1) /
                             4294967296.0) / w, 6) AS clk
                    FROM d),
              s AS (SELECT lang, doc_id FROM c
                    QUALIFY row_number() OVER (PARTITION BY lang
                      ORDER BY clk, doc_id) <= 20)
         SELECT lang, doc_id FROM s ORDER BY lang, doc_id""",

    // the packing plan replayed in integer arithmetic: same coordinate,
    // same bucket split, same two-level running totals
    "x_pipeline_dsir" ->
      s"""WITH $dsirScoresCte
         SELECT doc_id, score_micro FROM scores ORDER BY doc_id""",

    "x_pipeline_dsir_select" ->
      s"""WITH $dsirScoresCte,
              c AS (SELECT doc_id, score_micro,
                           round(-ln(
                               (${hexValSql("md5(CAST(doc_id AS VARCHAR))")}
                                + 1) / 4294967296.0) /
                             exp(score_micro / 1000000.0), 6) AS clk
                    FROM scores),
              sel AS (SELECT doc_id, score_micro FROM c
                      ORDER BY clk, doc_id LIMIT 50)
         SELECT doc_id, score_micro FROM sel ORDER BY doc_id""",

    "x_pipeline_pack" ->
      """WITH t0 AS (SELECT doc_id,
                            substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS c,
                            CAST(len(string_split(text, ' ')) AS BIGINT)
                              AS n_tokens
                     FROM documents),
              tb AS (SELECT *, substr(c, 1, 4) AS b FROM t0),
              bt AS (SELECT b, sum(n_tokens) AS btot FROM tb GROUP BY b),
              bb AS (SELECT b, CAST(coalesce(sum(btot) OVER (ORDER BY b
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS base
                     FROM bt),
              off AS (SELECT tb.doc_id, tb.n_tokens,
                             bb.base + CAST(coalesce(sum(tb.n_tokens) OVER (
                               PARTITION BY tb.b ORDER BY tb.c, tb.doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1
                               PRECEDING), 0) AS BIGINT) AS g_start
                      FROM tb JOIN bb ON tb.b = bb.b)
         SELECT doc_id, n_tokens, g_start, g_start + n_tokens AS g_end,
                CAST(floor(g_start / 2048.0) AS BIGINT) AS first_win,
                CAST(floor((g_start + n_tokens - 1) / 2048.0) AS BIGINT)
                  AS last_win
         FROM off ORDER BY doc_id""",

    // same recursive clustering as x_dedup_cluster, then per-component
    // argmax(quality, ties -> smallest id) — the window runs over the
    // cluster-membership table (corpus-row-count but tiny rows), and
    // the quality expression is the x_text_stats oracle's, inlined
    "x_pipeline_canonical" -> {
      val quality =
        """round((
             least(length(text) * 1.0 / 500, 1.0) +
             least(((
               CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' the ', ''))) / 5 AS INT) +
               CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' and ', ''))) / 5 AS INT) +
               CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' of ', ''))) / 4 AS INT) +
               CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' a ', ''))) / 3 AS INT)
             ) * 1.0 / len(string_split(text, ' '))) * 5.0, 1.0) +
             greatest(1.0 - (length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
               * 1.0 / length(text)) * 10.0, 0.0)
           ) / 3.0, 6)"""
      s"""WITH RECURSIVE tok AS (SELECT doc_id, string_split(text, ' ') AS t
                                 FROM documents),
            sh0 AS (SELECT DISTINCT doc_id,
                           unnest(list_transform(
                             generate_series(1, greatest(len(t)-2, 0)),
                             i -> array_to_string(t[i:i+2], ' '))) AS s
                    FROM tok),
            sh AS (SELECT doc_id, s FROM sh0
                   QUALIFY count(*) OVER (PARTITION BY s) <= 1000),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
                      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                      GROUP BY 1, 2),
            pairs AS (SELECT id_a, id_b FROM inter
                      JOIN sizes x ON id_a = x.doc_id
                      JOIN sizes y ON id_b = y.doc_id
                      WHERE round(c * 1.0 / (x.n + y.n - c), 6) >= 0.5),
            edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                      UNION ALL SELECT id_b, id_a FROM pairs),
            reach(src, dst) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst),
            comp AS (SELECT src AS id, min(dst) AS comp FROM reach
                     GROUP BY src),
            scored AS (SELECT doc_id AS id, $quality AS q FROM documents)
          SELECT comp, id AS keeper, q AS quality, n_docs FROM (
            SELECT c.comp, c.id, s.q,
                   count(*) OVER (PARTITION BY c.comp) AS n_docs,
                   row_number() OVER (PARTITION BY c.comp
                     ORDER BY s.q DESC, c.id) AS rn
            FROM comp c JOIN scored s USING (id)) z
          WHERE rn = 1 ORDER BY comp"""
    },

    "x_pipeline_source_cap" ->
      """SELECT source, doc_id FROM (
           SELECT source, doc_id,
                  row_number() OVER (PARTITION BY source
                    ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8),
                             doc_id) AS rn
           FROM documents) t
         WHERE rn <= 10 ORDER BY source, doc_id""",

    // per-source curriculum rank + round-robin arithmetic replayed with
    // plain windows (the oracle may window; the engine must not)
    "x_pipeline_curriculum" ->
      """WITH r AS (SELECT doc_id, source,
                           CAST(row_number() OVER (PARTITION BY source
                             ORDER BY n_chars ASC, doc_id) AS BIGINT)
                             AS rank
                    FROM documents),
              g AS (SELECT source,
                           CAST(row_number() OVER (ORDER BY source)
                             AS BIGINT) AS gidx
                    FROM (SELECT DISTINCT source FROM documents)),
              gc AS (SELECT CAST(count(*) AS BIGINT) AS gn FROM g)
         SELECT r.doc_id, r.source, r.rank,
                (r.rank - 1) * gc.gn + g.gidx - 1 AS order_key
         FROM r JOIN g ON g.source = r.source CROSS JOIN gc
         ORDER BY order_key, r.doc_id""",

    // per-epoch md5 permutation + epoch-major concatenation, replayed
    // with a plain global window (the engine's dense-id pass must
    // equal it row-for-row)
    "x_pipeline_epochs" ->
      """WITH e AS (SELECT doc_id, epoch
                    FROM documents
                    CROSS JOIN (SELECT unnest(generate_series(0, 2))
                                  AS epoch)),
              k AS (SELECT doc_id, epoch,
                           md5(CAST(epoch AS VARCHAR) || ':' ||
                               CAST(doc_id AS VARCHAR)) AS ekey
                    FROM e)
         SELECT doc_id, epoch,
                CAST(row_number() OVER (ORDER BY epoch, ekey, doc_id)
                     AS BIGINT) - 1 AS pos
         FROM k ORDER BY pos""",

    "x_pipeline_shards" ->
      """WITH d AS (SELECT doc_id,
                           CAST(len(string_split(text, ' ')) AS BIGINT)
                             AS n_tokens
                    FROM documents),
              r AS (SELECT n_tokens,
                           row_number() OVER (ORDER BY n_tokens DESC,
                             doc_id) AS rank
                    FROM d),
              sh AS (SELECT n_tokens,
                            CASE WHEN ((rank - 1) // 8) % 2 = 0
                                 THEN (rank - 1) % 8
                                 ELSE 7 - ((rank - 1) % 8) END AS shard
                     FROM r)
         SELECT CAST(shard AS BIGINT) AS shard,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(n_tokens) AS BIGINT) AS shard_tokens
         FROM sh GROUP BY 1 ORDER BY 1""",

    // rate replay: quantized √n (IEEE sqrt + one rounded multiply),
    // exact integer normalizer, threshold from one exact-ratio double
    // division — deterministic on both engines
    "x_pipeline_temperature" ->
      s"""WITH n AS (SELECT source, count(*) AS n,
                            CAST(round(sqrt(count(*)) * 1000000) AS BIGINT)
                              AS sq
                     FROM documents GROUP BY 1),
              sm AS (SELECT sum(sq) AS s FROM n),
              r AS (SELECT n.source,
                           CAST(floor(least(CAST(1.0 AS DOUBLE),
                                 (120 * n.sq) / (sm.s * n.n))
                               * 4294967296.0) AS BIGINT) AS thr
                    FROM n CROSS JOIN sm)
         SELECT d.doc_id, d.source
         FROM documents d JOIN r ON r.source = d.source
         WHERE ${hexValSql("md5(CAST(d.doc_id AS VARCHAR))")} < r.thr
         ORDER BY d.doc_id""",

    // gaps-and-islands session replay, converted flag per island, day =
    // date of the session's first event, exact-long ratio
    "x_events_session_conversion" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                           event_type
                    FROM events),
              f AS (SELECT user_id, ts, event_type,
                           CASE WHEN lag(ts) OVER w IS NULL
                                  OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE
                                THEN 1 ELSE 0 END AS newsess
                    FROM e
                    WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
              g AS (SELECT *, sum(newsess) OVER (PARTITION BY user_id
                      ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess_id
                    FROM f),
              sess AS (SELECT user_id, sess_id,
                              CAST(min(ts) AS DATE) AS day,
                              max(CASE WHEN event_type = 'purchase'
                                       THEN 1 ELSE 0 END) AS conv
                       FROM g GROUP BY 1, 2)
         SELECT strftime(day, '%Y-%m-%d') AS day,
                CAST(count(*) AS BIGINT) AS n_sessions,
                CAST(sum(conv) AS BIGINT) AS n_converting,
                round(CAST(sum(conv) AS DOUBLE) / count(*), 6)
                  AS conversion_rate
         FROM sess GROUP BY day ORDER BY day""",

    // quantile_cont replays percentile at p=0.5 (exact elements or
    // dyadic midpoints — a31 precedent); flags share the identical
    // double expression on both engines
    "x_clean_robust_z" ->
      """WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med
                    FROM events GROUP BY 1),
              d AS (SELECT e.event_type, e.value, m.med,
                           abs(e.value - m.med) AS ad
                    FROM events e JOIN m ON m.event_type = e.event_type),
              md AS (SELECT event_type, quantile_cont(ad, 0.5) AS mad
                     FROM d GROUP BY 1)
         SELECT d.event_type, round(max(d.med), 6) AS med,
                round(max(md.mad), 6) AS mad,
                CAST(sum(CASE WHEN CAST(0.6745 AS DOUBLE) * d.ad / md.mad
                               > CAST(3.5 AS DOUBLE)
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
         FROM d JOIN md ON md.event_type = d.event_type
         GROUP BY 1 ORDER BY 1""",

    // histogram bounds (clamped ceil rank → first bucket reaching it,
    // dyadic midpoints), strict-inequality clamp counts, DECIMAL mean
    "x_clean_winsorize" ->
      """WITH h AS (SELECT event_type,
                           least(greatest(CAST(floor(value / 2.0) AS INT),
                                          0), 255) AS b,
                           count(*) AS c
                    FROM events GROUP BY 1, 2),
              n AS (SELECT event_type, sum(c) AS n FROM h GROUP BY 1),
              cum AS (SELECT h.event_type, h.b, n.n,
                             sum(h.c) OVER (PARTITION BY h.event_type
                                            ORDER BY h.b) AS cum
                      FROM h JOIN n ON n.event_type = h.event_type),
              bd AS (SELECT event_type,
                            (min(CASE WHEN cum >= least(n, greatest(1,
                               CAST(ceil(CAST(0.05 AS DOUBLE) * n)
                                 AS BIGINT)))
                               THEN b END) + 0.5) * 2.0 AS lo,
                            (min(CASE WHEN cum >= least(n, greatest(1,
                               CAST(ceil(CAST(0.95 AS DOUBLE) * n)
                                 AS BIGINT)))
                               THEN b END) + 0.5) * 2.0 AS hi
                     FROM cum GROUP BY 1)
         SELECT e.event_type, bd.lo, bd.hi,
                CAST(sum(CASE WHEN e.value < bd.lo THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_low,
                CAST(sum(CASE WHEN e.value > bd.hi THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_high,
                round(CAST(sum(CAST(least(greatest(e.value, bd.lo), bd.hi)
                  AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6)
                  AS mean_winsorized
         FROM events e JOIN bd ON bd.event_type = e.event_type
         GROUP BY 1, 2, 3 ORDER BY e.event_type""",

    // rank replay with a plain window (the oracle may window; the
    // engine's k-bounded aggregate must land on the same rows)
    "x_ts_trending" ->
      """WITH daily AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                               event_type, CAST(count(*) AS BIGINT) AS n
                        FROM events GROUP BY 1, 2),
              r AS (SELECT *, row_number() OVER (PARTITION BY day
                      ORDER BY n DESC, event_type ASC) AS rnk
                    FROM daily)
         SELECT strftime(day, '%Y-%m-%d') AS day, CAST(rnk AS INT) AS rnk,
                event_type, n
         FROM r WHERE rnk <= 3 ORDER BY day, rnk""",

    // single-delivery answer of the redelivered EP1 run: file A is two
    // March rows per nation, file C (delivered later, so it wins the
    // merge unconditionally) overwrites the 03-15 row of even nations;
    // report = per-GEO avg over the merged table. The engine's rows
    // came through three drains + suppression + quarantine + a CSV
    // round-trip; the oracle computes the same answer in one pass.
    "x_stream_ingest_e2e" ->
      """WITH nat AS (SELECT n_nationkey AS k, n_name AS geo FROM nation),
              base AS (
                SELECT '2024-03-01' AS date, geo, 'All-items' AS products,
                       CAST(100 + k + 0.5 AS DOUBLE) AS value, k
                FROM nat
                UNION ALL
                SELECT '2024-03-15', geo, 'All-items',
                       CASE WHEN k % 2 = 0
                            THEN CAST(200 + k + 0.75 AS DOUBLE)
                            ELSE CAST(110 + k + 0.25 AS DOUBLE) END, k
                FROM nat)
         SELECT 'table' AS kind, date, geo, products,
                round(value, 6) AS value, CAST(1 AS BIGINT) AS n
         FROM base
         UNION ALL
         SELECT 'report', '2024-03-01', geo, products,
                round(CAST(avg(value) AS DOUBLE), 6), COUNT(*)
         FROM base GROUP BY geo, products
         ORDER BY 1, 3, 2""",

    // the MV variant runs the identical scenario with the report
    // served from per-load delta state — byte-identical by
    // construction, so the oracle is the flagship's verbatim
    "x_stream_ingest_e2e_mv" ->
      """WITH nat AS (SELECT n_nationkey AS k, n_name AS geo FROM nation),
              base AS (
                SELECT '2024-03-01' AS date, geo, 'All-items' AS products,
                       CAST(100 + k + 0.5 AS DOUBLE) AS value, k
                FROM nat
                UNION ALL
                SELECT '2024-03-15', geo, 'All-items',
                       CASE WHEN k % 2 = 0
                            THEN CAST(200 + k + 0.75 AS DOUBLE)
                            ELSE CAST(110 + k + 0.25 AS DOUBLE) END, k
                FROM nat)
         SELECT 'table' AS kind, date, geo, products,
                round(value, 6) AS value, CAST(1 AS BIGINT) AS n
         FROM base
         UNION ALL
         SELECT 'report', '2024-03-01', geo, products,
                round(CAST(avg(value) AS DOUBLE), 6), COUNT(*)
         FROM base GROUP BY geo, products
         ORDER BY 1, 3, 2""",

    // same ranking as x_ts_trending — the streaming operator must land
    // on the identical batch answer after keep-last finalization
    "x_stream_trending" ->
      """WITH daily AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                               event_type, CAST(count(*) AS BIGINT) AS n
                        FROM events GROUP BY 1, 2),
              r AS (SELECT *, row_number() OVER (PARTITION BY day
                      ORDER BY n DESC, event_type ASC) AS rnk
                    FROM daily)
         SELECT strftime(day, '%Y-%m-%d') AS day, CAST(rnk AS INT) AS rnk,
                event_type, n
         FROM r WHERE rnk <= 3 ORDER BY day, rnk""",

    "x_stream_psi" ->
      """WITH live AS (SELECT strftime(CAST(CAST(ts AS TIMESTAMP) AS DATE),
                                '%Y-%m-%d') AS day,
                              CAST(greatest(least(floor(value / 50), 9), 0) AS INT)
                                AS bucket
                       FROM events WHERE user_id % 2 <> 0),
              ref AS (SELECT CAST(greatest(least(floor(value / 50), 9), 0) AS INT)
                               AS bucket,
                             CAST(count(*) AS BIGINT) AS n_ref
                      FROM events WHERE user_id % 2 = 0 GROUP BY 1),
              nr AS (SELECT sum(n_ref) AS t FROM ref),
              spine AS (SELECT day, CAST(b AS INT) AS bucket
                        FROM (SELECT DISTINCT day FROM live),
                             generate_series(0, 9) AS g(b)),
              lc AS (SELECT day, bucket, CAST(count(*) AS BIGINT) AS n
                     FROM live GROUP BY 1, 2),
              nd AS (SELECT day, sum(n) AS n_day FROM lc GROUP BY 1),
              j AS (SELECT s.day, s.bucket,
                           coalesce(lc.n, 0) AS n,
                           coalesce(ref.n_ref, 0) AS n_ref,
                           nd.n_day
                    FROM spine s
                    LEFT JOIN lc ON s.day = lc.day AND s.bucket = lc.bucket
                    LEFT JOIN ref ON s.bucket = ref.bucket
                    JOIN nd ON s.day = nd.day)
         SELECT day, bucket, n, n_ref,
                round(((n + 1) * 1.0 / (n_day + 10)
                       - (n_ref + 1) * 1.0 / ((SELECT t FROM nr) + 10))
                      * ln(((n + 1) * 1.0 / (n_day + 10))
                           / ((n_ref + 1) * 1.0
                              / ((SELECT t FROM nr) + 10))), 6) AS psi
         FROM j ORDER BY day, bucket""",

    // same literal dim as VALUES, latest version per key via a
    // row_number window, per-row double multiply then DECIMAL-exact sum
    "x_stream_enrich" ->
      """WITH dim(event_type, ver, mult) AS (VALUES
                ('view', 1, 0.5), ('view', 2, 1.5),
                ('click', 1, 2.0),
                ('purchase', 3, 3.0), ('purchase', 1, 9.9)),
              latest AS (SELECT event_type, mult FROM (
                           SELECT *, row_number() OVER (
                             PARTITION BY event_type
                             ORDER BY ver DESC) AS rn
                           FROM dim)
                         WHERE rn = 1)
         SELECT e.event_type, count(*) AS n_events,
                round(CAST(sum(CAST(e.value *
                  coalesce(CAST(l.mult AS DOUBLE), 1.0)
                  AS DECIMAL(18,4))) AS DOUBLE), 6) AS revenue
         FROM events e LEFT JOIN latest l ON l.event_type = e.event_type
         GROUP BY 1 ORDER BY 1""",

    // full-histogram replay: exact-double bucket grid (width 2.0), rank
    // = clamped ceil(q·n), estimate = midpoint of the first bucket whose
    // cumulative count reaches the rank — all integer counts plus exact
    // dyadic doubles, so the streaming sketch's final state must match
    // digit-for-digit
    "x_stream_quantiles" ->
      """WITH h AS (SELECT event_type,
                           least(greatest(CAST(floor(value / 2.0) AS INT),
                                          0), 255) AS b,
                           count(*) AS c
                    FROM events GROUP BY 1, 2),
              n AS (SELECT event_type, sum(c) AS n FROM h GROUP BY 1),
              qv AS (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS q),
              r AS (SELECT n.event_type, qv.q,
                           least(n.n, greatest(1,
                             CAST(ceil(qv.q * n.n) AS BIGINT))) AS rk
                    FROM n CROSS JOIN qv),
              cum AS (SELECT event_type, b,
                             sum(c) OVER (PARTITION BY event_type
                                          ORDER BY b) AS cum
                      FROM h),
              pick AS (SELECT r.event_type, r.q, min(cum.b) AS b
                       FROM r JOIN cum
                         ON cum.event_type = r.event_type
                        AND cum.cum >= r.rk
                       GROUP BY 1, 2)
         SELECT event_type, q, round(0.0 + (b + 0.5) * 2.0, 6) AS est
         FROM pick ORDER BY event_type, q""",

    // streaming replay of the same sweep: the RESULT is exact, so all
    // three decontamination paths share one oracle
    "x_stream_decontam" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t
                      FROM documents),
              sh AS (SELECT DISTINCT doc_id,
                            unnest(list_transform(
                              generate_series(1, greatest(len(t)-2, 0)),
                              i -> array_to_string(t[i:i+2], ' '))) AS s
                     FROM tok),
              ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0),
              tr AS (SELECT doc_id, s FROM sh WHERE doc_id % 50 <> 0)
         SELECT tr.doc_id, count(*) AS n_shared
         FROM tr JOIN ev ON tr.s = ev.s
         GROUP BY tr.doc_id
         HAVING count(*) >= 2
         ORDER BY doc_id""",

    // the Bloom prefilter is an engine-side plan device; the RESULT is
    // exact, so both decontamination paths share one oracle
    "x_pipeline_decontam_bloom" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t
                      FROM documents),
              sh AS (SELECT DISTINCT doc_id,
                            unnest(list_transform(
                              generate_series(1, greatest(len(t)-2, 0)),
                              i -> array_to_string(t[i:i+2], ' '))) AS s
                     FROM tok),
              ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0),
              tr AS (SELECT doc_id, s FROM sh WHERE doc_id % 50 <> 0)
         SELECT tr.doc_id, count(*) AS n_shared
         FROM tr JOIN ev ON tr.s = ev.s
         GROUP BY tr.doc_id
         HAVING count(*) >= 2
         ORDER BY doc_id""",

    "x_pipeline_decontam" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t
                      FROM documents),
              sh AS (SELECT DISTINCT doc_id,
                            unnest(list_transform(
                              generate_series(1, greatest(len(t)-2, 0)),
                              i -> array_to_string(t[i:i+2], ' '))) AS s
                     FROM tok),
              ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0),
              tr AS (SELECT doc_id, s FROM sh WHERE doc_id % 50 <> 0)
         SELECT tr.doc_id, count(*) AS n_shared
         FROM tr JOIN ev ON tr.s = ev.s
         GROUP BY tr.doc_id
         HAVING count(*) >= 2
         ORDER BY doc_id""",

    "x_dedup_ngram" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t
                      FROM documents),
              sh0 AS (SELECT DISTINCT doc_id,
                             unnest(list_transform(
                               generate_series(1, greatest(len(t)-2, 0)),
                               i -> array_to_string(t[i:i+2], ' '))) AS s
                      FROM tok),
              -- stop-shingle cap (maxBlock=1000), mirroring the engine
              sh AS (SELECT doc_id, s FROM sh0
                     QUALIFY count(*) OVER (PARTITION BY s) <= 1000),
              sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
              inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                               count(*) AS c
                        FROM sh a JOIN sh b
                          ON a.s = b.s AND a.doc_id < b.doc_id
                        GROUP BY 1, 2)
         SELECT id_a, id_b,
                round(c * 1.0 / (x.n + y.n - c), 6) AS jaccard
         FROM inter
         JOIN sizes x ON id_a = x.doc_id
         JOIN sizes y ON id_b = y.doc_id
         WHERE round(c * 1.0 / (x.n + y.n - c), 6) >= 0.12
         ORDER BY id_a, id_b""",

    "x_dedup_containment" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t
                      FROM documents),
              sh AS (SELECT DISTINCT doc_id,
                            unnest(list_transform(
                              generate_series(1, greatest(len(t)-2, 0)),
                              i -> array_to_string(t[i:i+2], ' '))) AS s
                     FROM tok),
              sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
              inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                               count(*) AS c
                        FROM sh a JOIN sh b
                          ON a.s = b.s AND a.doc_id < b.doc_id
                        GROUP BY 1, 2),
              dirp AS (SELECT id_a AS src, id_b AS dst,
                              round(c * 1.0 / x.n, 6) AS containment
                       FROM inter JOIN sizes x ON id_a = x.doc_id
                       UNION ALL
                       SELECT id_b, id_a, round(c * 1.0 / y.n, 6)
                       FROM inter JOIN sizes y ON id_b = y.doc_id)
         SELECT src, dst, containment FROM dirp
         WHERE containment >= 0.3
         ORDER BY src, dst""",

    // the prefix-filtered path answers the UNcapped all-pairs
    // definition — same SQL as x_dedup_ngram minus the stop-shingle
    // QUALIFY
    "x_dedup_ngram_prefix" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t
                      FROM documents),
              sh AS (SELECT DISTINCT doc_id,
                            unnest(list_transform(
                              generate_series(1, greatest(len(t)-2, 0)),
                              i -> array_to_string(t[i:i+2], ' '))) AS s
                     FROM tok),
              sizes AS (SELECT doc_id, count(*) AS n FROM sh
                        GROUP BY doc_id),
              inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                               count(*) AS c
                        FROM sh a JOIN sh b
                          ON a.s = b.s AND a.doc_id < b.doc_id
                        GROUP BY 1, 2)
         SELECT id_a, id_b,
                round(c * 1.0 / (x.n + y.n - c), 6) AS jaccard
         FROM inter
         JOIN sizes x ON id_a = x.doc_id
         JOIN sizes y ON id_b = y.doc_id
         WHERE round(c * 1.0 / (x.n + y.n - c), 6) >= 0.8
         ORDER BY id_a, id_b""",

    // substring spans: identical rolling md5 windows (zipped unnests —
    // lateral generate_series is not available), occurrence count >= 2,
    // then the standard gaps-and-islands merge of matched positions.
    // All positions are 1-based BIGINTs on both engines.
    "x_dedup_spans" -> spansOracleSql,

    // the refresh must equal the from-scratch spans of the union corpus
    // — same oracle, different (artifact-fed) engine path
    "x_dedup_spans_incr" -> spansOracleSql,

    // keep-one spans: keeper election replayed as the same packed-key
    // min; only non-keeper occurrences enter the islands merge
    "x_dedup_spans_keep" -> {
      val w = 8
      s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t
                       FROM documents),
              win AS (SELECT doc_id,
                             unnest(generate_series(1, len(t) - ${w - 1})) AS pos,
                             unnest(list_transform(
                               generate_series(1, len(t) - ${w - 1}),
                               i -> md5(array_to_string(t[i:i+${w - 1}], ' ')))) AS k
                      FROM tok WHERE len(t) >= $w),
              keep AS (SELECT k, min(doc_id * 4294967296 + pos) AS kp
                       FROM win GROUP BY k HAVING count(*) >= 2),
              m AS (SELECT w2.doc_id, w2.pos
                    FROM win w2 JOIN keep ON w2.k = keep.k
                    WHERE w2.doc_id * 4294967296 + w2.pos <> keep.kp),
              mk AS (SELECT doc_id, pos,
                            CASE WHEN pos > coalesce(lag(pos) OVER
                                (PARTITION BY doc_id ORDER BY pos), -1000000)
                                + $w THEN 1 ELSE 0 END AS brk
                     FROM m),
              g AS (SELECT doc_id, pos,
                           sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS UNBOUNDED PRECEDING) AS grp
                    FROM mk)
         SELECT doc_id, min(pos) AS span_start, max(pos) + $w AS span_end
         FROM g GROUP BY doc_id, grp
         ORDER BY doc_id, span_start"""
    },

    // span cutting: tokens covered by any span drop, survivors re-join
    // with single spaces (the corpus roundtrips split/join exactly).
    // Docs cut to nothing keep an empty-string row on both engines
    // (LEFT JOIN + array_to_string/concat_ws both skip nulls).
    "x_dedup_span_cut" -> {
      val w = 8
      s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t
                       FROM documents),
              win AS (SELECT doc_id,
                             unnest(generate_series(1, len(t) - ${w - 1})) AS pos,
                             unnest(list_transform(
                               generate_series(1, len(t) - ${w - 1}),
                               i -> md5(array_to_string(t[i:i+${w - 1}], ' ')))) AS k
                      FROM tok WHERE len(t) >= $w),
              dup AS (SELECT k FROM win GROUP BY k HAVING count(*) >= 2),
              m AS (SELECT doc_id, pos FROM win
                    WHERE k IN (SELECT k FROM dup)),
              mk AS (SELECT doc_id, pos,
                            CASE WHEN pos > coalesce(lag(pos) OVER
                                (PARTITION BY doc_id ORDER BY pos), -1000000)
                                + $w THEN 1 ELSE 0 END AS brk
                     FROM m),
              g AS (SELECT doc_id, pos,
                           sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS UNBOUNDED PRECEDING) AS grp
                    FROM mk),
              spans AS (SELECT doc_id, min(pos) AS s, max(pos) + $w AS e
                        FROM g GROUP BY doc_id, grp),
              tokpos AS (SELECT doc_id, unnest(t) AS tk,
                                unnest(generate_series(1, len(t))) AS pos
                         FROM tok),
              kept AS (SELECT tp.doc_id, tp.tk, tp.pos
                       FROM tokpos tp
                       WHERE NOT EXISTS (SELECT 1 FROM spans sp
                         WHERE sp.doc_id = tp.doc_id
                           AND tp.pos >= sp.s AND tp.pos < sp.e)),
              rebuilt AS (SELECT t2.doc_id,
                                 coalesce(array_to_string(
                                   list(k.tk ORDER BY k.pos)
                                     FILTER (WHERE k.tk IS NOT NULL), ' '),
                                   '') AS text
                          FROM tok t2 LEFT JOIN kept k
                            ON t2.doc_id = k.doc_id
                          GROUP BY t2.doc_id)
         SELECT doc_id, md5(text) AS h,
                len(string_split(text, ' ')) AS n_tokens
         FROM rebuilt ORDER BY doc_id"""
    },

    // LSH candidates are exact-Jaccard-verified, so precision is exact by
    // construction and recall is the only approximation. At the 0.5 gate
    // threshold (the 16-band × 4-row S-curve midpoint) the minimum
    // in-corpus jaccard among qualifying pairs is 0.8 (sf0.1), where the
    // banding misses a pair with p = (1-0.8⁴)¹⁶ ≈ 2e-4;
    // graft.tools.PairCheck measured ZERO missed pairs at sf0.01 AND
    // sf0.1 — so the all-pairs SQL is a valid oracle for the LSH path,
    // and the driver gets a full hash check instead of rows-only. (A
    // 0.12 threshold is NOT oracle-safe at scale: PairCheck found 2/258
    // missed at sf0.1 — sub-knee thresholds belong to the exact ngram
    // path.)
    "x_dedup_minhash" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t
                      FROM documents),
              sh0 AS (SELECT DISTINCT doc_id,
                             unnest(list_transform(
                               generate_series(1, greatest(len(t)-2, 0)),
                               i -> array_to_string(t[i:i+2], ' '))) AS s
                      FROM tok),
              sh AS (SELECT doc_id, s FROM sh0
                     QUALIFY count(*) OVER (PARTITION BY s) <= 1000),
              sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
              inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                               count(*) AS c
                        FROM sh a JOIN sh b
                          ON a.s = b.s AND a.doc_id < b.doc_id
                        GROUP BY 1, 2)
         SELECT id_a, id_b,
                round(c * 1.0 / (x.n + y.n - c), 6) AS jaccard
         FROM inter
         JOIN sizes x ON id_a = x.doc_id
         JOIN sizes y ON id_b = y.doc_id
         WHERE round(c * 1.0 / (x.n + y.n - c), 6) >= 0.5
         ORDER BY id_a, id_b""",

    "x_dedup_cluster" -> clusterOracleSql,

    // cluster labels replayed from scratch, then the same md5 fixed-point
    // split the doc-keyed splitter uses — keyed on comp, so a duplicate
    // pair can never straddle the split on either engine
    "x_pipeline_split_leakfree" -> leakfreeSplitOracleSql,

    // same md5₃₂ coordinate as every sampler, reduced mod k — the
    // nibble arithmetic replays Spark's conv(hex, 16, 10)
    "x_pipeline_kfold" ->
      s"""SELECT doc_id,
                 ${hexValSql("md5(CAST(doc_id AS VARCHAR))")} % 5 AS fold
          FROM documents ORDER BY doc_id""",

    // same recursive label replay, rolled up to the size histogram
    "x_graph_components" -> clusterOracleSql.replace(
      """SELECT src AS id, min(dst) AS comp FROM reach
         GROUP BY src ORDER BY id""",
      """, comp AS (SELECT src AS id, min(dst) AS comp FROM reach
                    GROUP BY src)
         SELECT sz, CAST(count(*) AS BIGINT) AS n_clusters FROM (
           SELECT comp, CAST(count(*) AS BIGINT) AS sz
           FROM comp GROUP BY comp)
         GROUP BY sz ORDER BY sz"""),

    // incremental refresh must land on the identical full-corpus answer
    "x_dedup_cluster_incr" -> clusterOracleSql,

    // incremental refresh must equal the from-scratch all-pairs result:
    // the oracle recomputes UNcapped Jaccard over the full table at the
    // same threshold — it cannot tell (and must not care) that the
    // engine served old pairs from an artifact and only discovered the
    // delta's contribution. Oracle-safety of the banding was measured
    // for THIS config (uncapped, threshold 0.5, 64 hashes × 16 bands):
    // `PairCheck 0.5 0 64 16` → zero missed pairs at sf0.01 AND sf0.1
    // (min in-corpus jaccard among qualifying pairs is 0.8, far above
    // the banding knee — the capped measurement does not transfer
    // automatically, so re-run PairCheck with maxBlock=0 if this gate's
    // parameters change).
    "x_dedup_incremental" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t
                      FROM documents),
              sh AS (SELECT DISTINCT doc_id,
                            unnest(list_transform(
                              generate_series(1, greatest(len(t)-2, 0)),
                              i -> array_to_string(t[i:i+2], ' '))) AS s
                     FROM tok),
              sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
              inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                               count(*) AS c
                        FROM sh a JOIN sh b
                          ON a.s = b.s AND a.doc_id < b.doc_id
                        GROUP BY 1, 2)
         SELECT id_a, id_b,
                round(c * 1.0 / (x.n + y.n - c), 6) AS jaccard
         FROM inter
         JOIN sizes x ON id_a = x.doc_id
         JOIN sizes y ON id_b = y.doc_id
         WHERE round(c * 1.0 / (x.n + y.n - c), 6) >= 0.5
         ORDER BY id_a, id_b""",

    // signature generation is engine-specific (xxhash64 votes), but the
    // signatures are a parquet artifact; the chunk blocking is provably
    // exhaustive at maxDist=3, so a blocking-free all-pairs Hamming scan
    // over the artifact is an exact oracle for the blocked pipeline.
    // __GRAFT_SIMHASH__ resolved by Verify like __GRAFT_IVF__.
    "x_dedup_simhash" ->
      """WITH sig AS (SELECT id, sim
                      FROM read_parquet('__GRAFT_SIMHASH__/*.parquet'))
         SELECT a.id AS id_a, b.id AS id_b,
                CAST(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming
         FROM sig a JOIN sig b ON a.id < b.id
         WHERE bit_count(xor(a.sim, b.sim)) <= 3
         ORDER BY id_a, id_b""",

    "x_dedup_embedding" ->
      """WITH e AS (SELECT vec_id, label,
                           CAST(unnest(embedding) AS DOUBLE) AS x,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings),
              p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                           round(sum(a.x * b.x) /
                             (sqrt(sum(a.x * a.x)) * sqrt(sum(b.x * b.x))), 6) AS cosine
                    FROM e a JOIN e b
                      ON a.label = b.label AND a.i = b.i AND a.vec_id < b.vec_id
                    GROUP BY 1, 2)
         SELECT id_a, id_b, cosine FROM p
         WHERE cosine >= 0.3 ORDER BY id_a, id_b""",

    // cell-blocked pair + recursive min-label replay straight from the
    // engine's on-disk IVF cells artifact — the oracle cannot tell the
    // blocking came from a learned quantizer, only that within-cell
    // pairs and components resolve identically
    "x_dedup_semantic" ->
      """WITH RECURSIVE
           cellv AS (SELECT vec_id, CAST(cell AS INTEGER) AS cell,
                            embedding
                     FROM read_parquet(
                       '__GRAFT_IVF__/ivf_cells/*/*.parquet',
                       hive_partitioning = 1)),
           e AS (SELECT vec_id, cell,
                        CAST(unnest(embedding) AS DOUBLE) AS x,
                        generate_subscripts(embedding, 1) AS i
                 FROM cellv),
           p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                        round(sum(a.x * b.x) /
                          (sqrt(sum(a.x * a.x)) * sqrt(sum(b.x * b.x))),
                          6) AS cosine
                 FROM e a JOIN e b
                   ON a.cell = b.cell AND a.i = b.i
                      AND a.vec_id < b.vec_id
                 GROUP BY 1, 2),
           pairs AS (SELECT id_a, id_b FROM p WHERE cosine >= 0.4),
           edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                     UNION ALL SELECT id_b, id_a FROM pairs),
           reach(src, dst) AS (
             SELECT vec_id, vec_id FROM cellv
             UNION
             SELECT r.src, e2.b FROM reach r JOIN edges e2
               ON e2.a = r.dst)
         SELECT src AS id, min(dst) AS comp,
                CAST(src = min(dst) AS INTEGER) AS keep
         FROM reach GROUP BY src ORDER BY id""",

    // every Gopher threshold is exact integer arithmetic on both sides
    // (5·alpha >= 4·words, never alpha/words >= 0.8) — zero float
    // drift by construction
    "x_text_gopher" ->
      """WITH b AS (SELECT doc_id,
                len(string_split(text, ' ')) AS words,
                length(replace(text, ' ', '')) AS chars,
                len(list_filter(string_split(text, ' '),
                    w -> regexp_matches(w, '[A-Za-z]'))) AS alphaw,
                CAST(length(text) - length(replace(text, '#', ''))
                     AS INT) AS hashes,
                CAST((length(text) - length(replace(text, '...', '')))
                     / 3 AS INT) AS dots,
                (CASE WHEN length(' '||text||' ') >
                  length(replace(' '||text||' ', ' the ', ''))
                  THEN 1 ELSE 0 END
               + CASE WHEN length(' '||text||' ') >
                  length(replace(' '||text||' ', ' and ', ''))
                  THEN 1 ELSE 0 END
               + CASE WHEN length(' '||text||' ') >
                  length(replace(' '||text||' ', ' of ', ''))
                  THEN 1 ELSE 0 END
               + CASE WHEN length(' '||text||' ') >
                  length(replace(' '||text||' ', ' a ', ''))
                  THEN 1 ELSE 0 END) AS stops,
                string_split(text, chr(10)) AS lines
              FROM documents),
           f AS (SELECT doc_id, words, chars, alphaw, hashes, dots,
                        stops, len(lines) AS nlines,
                        len(list_filter(lines, l ->
                          starts_with(l, '- ') OR starts_with(l, '* ')))
                          AS bullets,
                        len(list_filter(lines, l -> ends_with(l, '...')))
                          AS edots
                 FROM b)
         SELECT doc_id,
           CAST(words >= 50 AND words <= 100000 AS INT) AS wc_ok,
           CAST(chars >= words*3 AND chars <= words*10 AS INT) AS mwl_ok,
           CAST(hashes*10 < words AS INT) AS hash_ok,
           CAST(dots*10 < words AS INT) AS dots_ok,
           CAST(alphaw*5 >= words*4 AS INT) AS alpha_ok,
           CAST(stops >= 2 AS INT) AS stop_ok,
           CAST(bullets*10 <= nlines*9 AS INT) AS bullet_ok,
           CAST(edots*10 <= nlines*3 AS INT) AS line_dots_ok,
           CAST(words >= 50 AND words <= 100000
            AND chars >= words*3 AND chars <= words*10
            AND hashes*10 < words AND dots*10 < words
            AND alphaw*5 >= words*4 AND stops >= 2
            AND bullets*10 <= nlines*9 AND edots*10 <= nlines*3
            AS INT) AS keep
         FROM f ORDER BY doc_id""",

    "x_text_c4" ->
      """WITH d AS (SELECT doc_id,
                replace(replace(replace(replace(text,
                  ' line ', '.' || chr(10)),
                  ' spark ', ' javascript '),
                  ' vector ', ' lorem ipsum '),
                  ' hash ', ' {hash} ') AS t
              FROM documents),
           k AS (SELECT doc_id, t,
                string_split(t, chr(10)) AS lines,
                coalesce(array_to_string(
                  list_filter(string_split(t, chr(10)),
                    l -> right(l, 1) IN ('.', '!', '?', '"')
                     AND len(string_split(l, ' ')) >= 5
                     AND NOT contains(lower(l), 'javascript')), chr(10)),
                  '') AS cleaned
              FROM d),
           f AS (SELECT doc_id, t, cleaned,
                len(lines) AS n_lines,
                CASE WHEN cleaned = '' THEN 0
                     ELSE len(string_split(cleaned, chr(10))) END AS n_kept,
                CAST(length(cleaned) - length(replace(cleaned, '.', ''))
                   + length(cleaned) - length(replace(cleaned, '!', ''))
                   + length(cleaned) - length(replace(cleaned, '?', ''))
                  AS INT) AS n_sentences,
                CASE WHEN length(' '||lower(t)||' ') =
                  length(replace(' '||lower(t)||' ', ' customer ', ''))
                  THEN 1 ELSE 0 END AS no_badword,
                CASE WHEN contains(lower(t), 'lorem ipsum')
                  THEN 0 ELSE 1 END AS no_phrase,
                CASE WHEN contains(t, '{') THEN 0 ELSE 1 END AS no_brace
              FROM k)
         SELECT doc_id, n_lines, n_kept, n_sentences,
                no_badword, no_phrase, no_brace,
                CAST(n_sentences >= 3 AND no_badword = 1
                 AND no_phrase = 1 AND no_brace = 1 AS INT) AS keep,
                md5(cleaned) AS clean_md5
         FROM f ORDER BY doc_id""",

    // the oracle RETRAINS the classifier: 3 unrolled GD iterations,
    // each one decimal-exact gradient aggregate + the identical
    // IEEE-double weight update, then the same rounded-sigmoid scoring
    "x_quality_logreg" ->
      """WITH raw AS (SELECT doc_id,
                least(length(text), 500) * 2000 AS p1,
                (CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' the ', ''))) / 5 AS BIGINT) +
                 CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' and ', ''))) / 5 AS BIGINT) +
                 CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' of ', ''))) / 4 AS BIGINT) +
                 CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' a ', ''))) / 3 AS BIGINT)) AS hits,
                len(string_split(text, ' ')) AS toks,
                len(list_distinct(list_transform(
                  generate_series(1, greatest(len(string_split(text, ' ')) - 2, 0)),
                  i -> array_to_string((string_split(text, ' '))[i:i+2], ' ')))) AS d3,
                greatest(len(string_split(text, ' ')) - 2, 0) AS t3,
                CASE WHEN length(text) >= 300 THEN 1.0 ELSE 0.0 END AS y
              FROM documents),
           f AS (SELECT doc_id, 1.0 AS x0,
                p1 / 1000000.0 AS x1,
                (hits * 1000000 // toks) / 1000000.0 AS x2,
                (CASE WHEN t3 > 0 THEN 1000000 - (d3 * 1000000 // t3)
                      ELSE 0 END) / 1000000.0 AS x3,
                y
              FROM raw),
           cnt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM f),
           w0 AS (SELECT 0.0 AS b, 0.0 AS v1, 0.0 AS v2, 0.0 AS v3),
           g1 AS (SELECT
                sum(CAST((round(1.0/(1.0+exp(-(((b + v1*x1) + v2*x2) + v3*x3))), 6) - y) * x0 AS DECIMAL(20,12))) AS s0,
                sum(CAST((round(1.0/(1.0+exp(-(((b + v1*x1) + v2*x2) + v3*x3))), 6) - y) * x1 AS DECIMAL(20,12))) AS s1,
                sum(CAST((round(1.0/(1.0+exp(-(((b + v1*x1) + v2*x2) + v3*x3))), 6) - y) * x2 AS DECIMAL(20,12))) AS s2,
                sum(CAST((round(1.0/(1.0+exp(-(((b + v1*x1) + v2*x2) + v3*x3))), 6) - y) * x3 AS DECIMAL(20,12))) AS s3
              FROM f, w0),
           w1 AS (SELECT b - 0.5 * (CAST(s0 AS DOUBLE) / n) AS b,
                         v1 - 0.5 * (CAST(s1 AS DOUBLE) / n) AS v1,
                         v2 - 0.5 * (CAST(s2 AS DOUBLE) / n) AS v2,
                         v3 - 0.5 * (CAST(s3 AS DOUBLE) / n) AS v3
                  FROM w0, g1, cnt),
           g2 AS (SELECT
                sum(CAST((round(1.0/(1.0+exp(-(((b + v1*x1) + v2*x2) + v3*x3))), 6) - y) * x0 AS DECIMAL(20,12))) AS s0,
                sum(CAST((round(1.0/(1.0+exp(-(((b + v1*x1) + v2*x2) + v3*x3))), 6) - y) * x1 AS DECIMAL(20,12))) AS s1,
                sum(CAST((round(1.0/(1.0+exp(-(((b + v1*x1) + v2*x2) + v3*x3))), 6) - y) * x2 AS DECIMAL(20,12))) AS s2,
                sum(CAST((round(1.0/(1.0+exp(-(((b + v1*x1) + v2*x2) + v3*x3))), 6) - y) * x3 AS DECIMAL(20,12))) AS s3
              FROM f, w1),
           w2 AS (SELECT b - 0.5 * (CAST(s0 AS DOUBLE) / n) AS b,
                         v1 - 0.5 * (CAST(s1 AS DOUBLE) / n) AS v1,
                         v2 - 0.5 * (CAST(s2 AS DOUBLE) / n) AS v2,
                         v3 - 0.5 * (CAST(s3 AS DOUBLE) / n) AS v3
                  FROM w1, g2, cnt),
           g3 AS (SELECT
                sum(CAST((round(1.0/(1.0+exp(-(((b + v1*x1) + v2*x2) + v3*x3))), 6) - y) * x0 AS DECIMAL(20,12))) AS s0,
                sum(CAST((round(1.0/(1.0+exp(-(((b + v1*x1) + v2*x2) + v3*x3))), 6) - y) * x1 AS DECIMAL(20,12))) AS s1,
                sum(CAST((round(1.0/(1.0+exp(-(((b + v1*x1) + v2*x2) + v3*x3))), 6) - y) * x2 AS DECIMAL(20,12))) AS s2,
                sum(CAST((round(1.0/(1.0+exp(-(((b + v1*x1) + v2*x2) + v3*x3))), 6) - y) * x3 AS DECIMAL(20,12))) AS s3
              FROM f, w2),
           w3 AS (SELECT b - 0.5 * (CAST(s0 AS DOUBLE) / n) AS b,
                         v1 - 0.5 * (CAST(s1 AS DOUBLE) / n) AS v1,
                         v2 - 0.5 * (CAST(s2 AS DOUBLE) / n) AS v2,
                         v3 - 0.5 * (CAST(s3 AS DOUBLE) / n) AS v3
                  FROM w2, g3, cnt),
           scored AS (SELECT doc_id,
                round(1.0/(1.0+exp(-(((b + v1*x1) + v2*x2) + v3*x3))), 6)
                  AS score
              FROM f, w3)
         SELECT doc_id, score, CAST(score >= 0.5 AS INT) AS keep
         FROM scored ORDER BY doc_id""",

    "x_text_stats" ->
      """SELECT doc_id,
                len(string_split(text, ' ')) AS n_tokens,
                length(text) AS n_chars,
                round(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
                  * 1.0 / length(text), 6) AS punct_ratio,
                round((
                  CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' the ', ''))) / 5 AS INT) +
                  CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' and ', ''))) / 5 AS INT) +
                  CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' of ', ''))) / 4 AS INT) +
                  CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' a ', ''))) / 3 AS INT)
                ) * 1.0 / len(string_split(text, ' ')), 6) AS stop_ratio,
                round((
                  least(length(text) * 1.0 / 500, 1.0) +
                  least(((
                    CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' the ', ''))) / 5 AS INT) +
                    CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' and ', ''))) / 5 AS INT) +
                    CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' of ', ''))) / 4 AS INT) +
                    CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' a ', ''))) / 3 AS INT)
                  ) * 1.0 / len(string_split(text, ' '))) * 5.0, 1.0) +
                  greatest(1.0 - (length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
                    * 1.0 / length(text)) * 10.0, 0.0)
                ) / 3.0, 6) AS quality
         FROM documents ORDER BY doc_id""",

    "x_text_langid" -> {
      val pad = "(' ' || lower(text) || ' ')"
      def occ(w: String) =
        s"CAST((length($pad) - length(replace($pad, ' $w ', ''))) / ${w.length + 2} AS INT)"
      val scores = TF.langLexicons.map { case (lang, words) =>
        lang -> words.map(occ).mkString(" + ")
      }
      val scoreSel = scores.map { case (l, e) => s"($e) AS s_$l" }.mkString(", ")
      val best = s"greatest(${scores.map("s_" + _._1).mkString(", ")})"
      val cases = scores.map { case (l, _) =>
        s"WHEN s_$l = $best AND $best > 0 THEN '$l'"
      }.mkString(" ")
      s"""WITH sc AS (SELECT lang, $scoreSel FROM documents)
          SELECT lang, CASE $cases ELSE 'und' END AS pred, count(*) AS n
          FROM sc GROUP BY 1, 2 ORDER BY 1, 2"""
    },

    "x_text_fingerprint" ->
      """SELECT doc_id,
                md5(array_to_string(list_sort(list_distinct(
                  string_split(lower(text), ' '))), ' ')) AS fp
         FROM documents ORDER BY doc_id""",

    "x_text_tokens" ->
      """SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
                CAST(len(regexp_extract_all(text,
                  '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'))
                  AS INT) AS bpe_tokens,
                list_reduce(
                  list_prepend(CAST(0 AS BIGINT),
                    list_transform(generate_series(1, length(text)),
                      i -> CAST(ascii(text[i]) AS BIGINT))),
                  (a, c) -> (a * 31 + c) % 1000000007) AS rhash
         FROM documents ORDER BY doc_id""",

    // chunk starts replayed as a stepped generate_series; the 1-based
    // chunk index derives from the start by exact integer division
    "x_text_chunks" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t
                      FROM documents),
              ch AS (SELECT doc_id, t,
                            unnest(generate_series(1,
                              greatest(len(t) - 16, 1), 48)) AS s
                     FROM tok)
         SELECT doc_id, CAST((s - 1) // 48 + 1 AS INT) AS chunk_idx,
                s AS start, least(64, len(t) - s + 1) AS n_tokens,
                md5(array_to_string(t[s:s+63], ' ')) AS h
         FROM ch ORDER BY doc_id, chunk_idx""",

    // boundary = md5_32 of the 4-token context mod 16 == 0, replayed
    // with the same nibble arithmetic as every sampler coordinate
    "x_text_chunks_cdc" -> {
      val hv = hexValSql("md5(array_to_string(t[i-3:i], ' '))")
      s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t
                       FROM documents),
              cuts AS (SELECT doc_id, t,
                         list_sort(list_distinct(
                           list_filter(
                             CASE WHEN len(t) >= 4
                               THEN generate_series(4, len(t))
                               ELSE []::BIGINT[] END,
                             i -> $hv % 16 = 0)
                           || [len(t)])) AS ends
                       FROM tok),
              b AS (SELECT doc_id, t, unnest(ends) AS e,
                           generate_subscripts(ends, 1) AS ci
                    FROM cuts),
              c AS (SELECT doc_id, t, ci, e,
                           coalesce(lag(e) OVER (PARTITION BY doc_id
                             ORDER BY ci), 0) + 1 AS s
                    FROM b)
         SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
                CAST(s AS BIGINT) AS start,
                CAST(e - s + 1 AS BIGINT) AS n_tokens,
                md5(array_to_string(t[s:e], ' ')) AS h
         FROM c ORDER BY doc_id, chunk_idx""" },

    // gear CDC: per-token gear = same 16-bit md5-prefix integer the
    // engine packs (4 hex digits); window hash = exact Σ gear·2^k
    // (BIGINT-safe), boundaries where it ≡ 0 mod 16
    "x_text_chunks_gear" -> {
      val gear = (0 until 4).map { i =>
        s"(strpos('0123456789abcdef', substr(md5(tok), ${i + 1}, 1)) - 1)" +
          s" * ${1L << (4 * (3 - i))}"
      }.mkString("(", " + ", ")")
      s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t
                       FROM documents),
              gr AS (SELECT doc_id, t,
                            list_transform(t, tok -> $gear) AS gs
                     FROM tok),
              cuts AS (SELECT doc_id, t,
                         list_sort(list_distinct(
                           list_filter(
                             CASE WHEN len(t) >= 4
                               THEN generate_series(4, len(t))
                               ELSE []::BIGINT[] END,
                             i -> list_sum(list_transform(
                                    generate_series(0, 3),
                                    k -> gs[i - k] *
                                      (CAST(1 AS BIGINT) << k))) % 16 = 0)
                           || [len(t)])) AS ends
                       FROM gr),
              b AS (SELECT doc_id, t, unnest(ends) AS e,
                           generate_subscripts(ends, 1) AS ci
                    FROM cuts),
              c AS (SELECT doc_id, t, ci, e,
                           coalesce(lag(e) OVER (PARTITION BY doc_id
                             ORDER BY ci), 0) + 1 AS s
                    FROM b)
         SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
                CAST(s AS BIGINT) AS start,
                CAST(e - s + 1 AS BIGINT) AS n_tokens,
                md5(array_to_string(t[s:e], ' ')) AS h
         FROM c ORDER BY doc_id, chunk_idx""" },

    // the z-value is a flat sum of shift/mask terms — generated here
    // with the same bit positions the engine's Layout.zValue uses
    "x_layout_zorder" -> {
      val terms = (0 until 16).flatMap { i =>
        Seq(s"((doc_id >> $i) & 1) * ${1L << (2 * i)}",
          s"((n_chars >> $i) & 1) * ${1L << (2 * i + 1)}")
      }
      s"""SELECT doc_id, ${terms.mkString(" + ")} AS zval
          FROM documents ORDER BY doc_id"""
    },

    // the HilbertValue per-level walk unrolled as a CTE chain — one CTE
    // per bit level, top level first; each level reads the PREVIOUS
    // level's (hx, hy, hd), exactly the loop body of the codegen
    // expression (all integer shifts/CASEs — engine-exact)
    "x_layout_hilbert" -> {
      val bits = 16
      val n = 1L << bits
      val levels = (bits - 1 to 0 by -1).zipWithIndex.map { case (b, i) =>
        s"""h${i + 1} AS (SELECT doc_id,
              CASE WHEN ((hy >> $b) & 1) = 0 THEN
                CASE WHEN ((hx >> $b) & 1) = 1 THEN ${n - 1} - hy ELSE hy END
              ELSE hx END AS hx,
              CASE WHEN ((hy >> $b) & 1) = 0 THEN
                CASE WHEN ((hx >> $b) & 1) = 1 THEN ${n - 1} - hx ELSE hx END
              ELSE hy END AS hy,
              hd + ${(1L << b) * (1L << b)} *
                xor(3 * ((hx >> $b) & 1), (hy >> $b) & 1) AS hd
            FROM h$i)"""
      }
      s"""WITH h0 AS (SELECT doc_id,
                             CAST(doc_id AS BIGINT) & ${n - 1} AS hx,
                             CAST(n_chars AS BIGINT) & ${n - 1} AS hy,
                             CAST(0 AS BIGINT) AS hd
                      FROM documents),
          ${levels.mkString(",\n          ")}
          SELECT doc_id, hd AS hval FROM h$bits ORDER BY doc_id"""
    },

    "x_text_vocab" ->
      """WITH c AS (SELECT lang, unnest(string_split(text, ' ')) AS tok
                    FROM documents),
              g AS (SELECT lang, tok, count(*) AS n FROM c GROUP BY 1, 2)
         SELECT lang, tok, n FROM g
         QUALIFY row_number() OVER (PARTITION BY lang
           ORDER BY n DESC, tok) <= 5
         ORDER BY lang, n DESC, tok""",

    // same top-1000 vocab (count desc, term asc), OOV mass from the
    // (lang, term) rollup — aggregate-first on both sides
    "x_text_oov" ->
      """WITH c AS (SELECT lang, unnest(string_split(text, ' ')) AS term
                    FROM documents),
              tf AS (SELECT lang, term, CAST(count(*) AS BIGINT) AS n
                     FROM c GROUP BY 1, 2),
              v AS (SELECT term FROM (
                      SELECT term, sum(n) AS nn FROM tf GROUP BY term
                      ORDER BY nn DESC, term LIMIT 1000)),
              agg AS (SELECT lang,
                             CAST(sum(n) AS BIGINT) AS n_tokens,
                             CAST(sum(CASE WHEN term IN
                               (SELECT term FROM v) THEN 0 ELSE n END)
                               AS BIGINT) AS n_oov
                      FROM tf GROUP BY 1)
         SELECT lang, n_tokens, n_oov,
                round(n_oov * 1.0 / n_tokens, 6) AS oov_rate
         FROM agg ORDER BY lang""",

    "x_text_source_overlap" ->
      """WITH v AS (SELECT DISTINCT source,
                           unnest(string_split(text, ' ')) AS term
                    FROM documents),
              sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n
                     FROM v GROUP BY 1),
              iv AS (SELECT a.source AS s1, b.source AS s2,
                            CAST(count(*) AS BIGINT) AS n_common
                     FROM v a JOIN v b
                       ON a.term = b.term AND a.source < b.source
                     GROUP BY 1, 2)
         SELECT s1, s2, n_common,
                x.n + y.n - n_common AS n_union,
                n_common * 1000000 // (x.n + y.n - n_common)
                  AS jaccard_ppm
         FROM iv JOIN sz x ON s1 = x.source JOIN sz y ON s2 = y.source
         ORDER BY s1, s2""",

    // the oracle RETRAINS: k unrolled levels, each = pair counts via a
    // lead window over the split state, (n DESC, a, b) argmax, and the
    // same two-space-invariant replace the engine applies
    "x_text_bpe" -> bpeOracleSql(6),

    // retrain + read tokenizations off the final state; reassembly in
    // word order via ordered string_agg
    "x_text_bpe_apply" -> bpeApplyOracleSql(6),

    // dictionary-sized substring enumeration (list_transform over the
    // word-count table), occurrence-weighted sums, (score, subword) cut
    "x_text_subwords" ->
      """WITH wc AS (SELECT w, count(*) AS c FROM (
                       SELECT unnest(string_split(lower(text), ' ')) AS w
                       FROM documents)
                     GROUP BY 1),
              subs AS (SELECT unnest(list_transform(
                                generate_series(1,
                                  greatest(len(w) - l + 1, 0)),
                                i -> substr(w, i, l))) AS s,
                              c
                       FROM wc CROSS JOIN
                            (SELECT unnest([2, 3, 4, 5, 6]) AS l) ll)
         SELECT s AS subword, CAST(sum(c) AS BIGINT) AS occ,
                CAST(sum(c) * len(s) AS BIGINT) AS score
         FROM subs GROUP BY s
         ORDER BY score DESC, subword LIMIT 50""",

    // weight table re-derived arithmetically ((b*2654435761) % 2001 -
    // 1000), bucketing replayed via the same md5₃₂ — exact integer sums
    "x_quality_linear" ->
      s"""WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS l
                     FROM documents),
              t AS (SELECT doc_id, unnest(l) AS tok FROM d),
              b AS (SELECT doc_id,
                           ${hexValSql("md5(tok)")} % 64 AS bkt
                    FROM t)
         SELECT doc_id,
                CAST(sum((bkt * 2654435761) % 2001 - 1000) AS BIGINT)
                  AS logit_micro,
                CAST(CASE WHEN sum((bkt * 2654435761) % 2001 - 1000) >= 0
                     THEN 1 ELSE 0 END AS INT) AS keep
         FROM b GROUP BY doc_id ORDER BY doc_id""",

    // train on %50<>0, score %50=0 under the frozen counts; bigrams
    // with out-of-vocab endpoints drop on BOTH sides (inner vocab
    // joins) — the deployment-shape held-out replay of x_lm_bigram
    "x_lm_heldout" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS l
                    FROM documents),
              t AS (SELECT doc_id, unnest(l) AS tok,
                           generate_subscripts(l, 1) AS pos
                    FROM d),
              ttr AS (SELECT * FROM t WHERE doc_id % 50 <> 0),
              btr AS (SELECT doc_id, w1, w2 FROM (
                        SELECT doc_id, tok AS w1,
                               lead(tok) OVER (PARTITION BY doc_id
                                               ORDER BY pos) AS w2
                        FROM ttr)
                      WHERE w2 IS NOT NULL),
              bc AS (SELECT w1, w2, count(*) AS c12 FROM btr GROUP BY 1, 2),
              uc AS (SELECT tok AS w, count(*) AS c1 FROM ttr GROUP BY 1),
              tot AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM ttr),
              th AS (SELECT * FROM t WHERE doc_id % 50 = 0),
              bh AS (SELECT doc_id, w1, w2 FROM (
                       SELECT doc_id, tok AS w1,
                              lead(tok) OVER (PARTITION BY doc_id
                                              ORDER BY pos) AS w2
                       FROM th)
                     WHERE w2 IS NOT NULL),
              lp AS (SELECT s.doc_id,
                            CAST(round(CASE WHEN bc.c12 IS NOT NULL
                                 THEN ln(CAST(bc.c12 AS DOUBLE) / u1.c1)
                                 ELSE ln(CAST(0.4 AS DOUBLE) * u2.c1 / tot.t)
                                 END, 6) AS DECIMAL(18,6)) AS lp
                     FROM bh s
                     LEFT JOIN bc ON bc.w1 = s.w1 AND bc.w2 = s.w2
                     JOIN uc u1 ON u1.w = s.w1
                     JOIN uc u2 ON u2.w = s.w2
                     CROSS JOIN tot)
         SELECT doc_id, count(*) AS n_bigrams,
                round(CAST(sum(lp) AS DOUBLE) / count(*), 6) AS avg_logp
         FROM lp GROUP BY doc_id ORDER BY doc_id""",

    // full LM retrain + rescore in SQL: bigram/unigram counts, stupid
    // backoff ln(c12/c1) | ln(0.4*c1(w2)/T), per-bigram 6-dp DECIMAL
    // terms summed exactly (order-independent), avg re-rounded at 6 dp.
    // CAST(0.4 AS DOUBLE) forces the same double multiply Spark's lit
    // performs (a bare 0.4 parses as DECIMAL in DuckDB)
    "x_lm_bigram" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS l
                    FROM documents),
              t AS (SELECT doc_id, unnest(l) AS tok,
                           generate_subscripts(l, 1) AS pos
                    FROM d),
              bgn AS (SELECT doc_id, w1, w2 FROM (
                        SELECT doc_id, tok AS w1,
                               lead(tok) OVER (PARTITION BY doc_id
                                               ORDER BY pos) AS w2
                        FROM t)
                      WHERE w2 IS NOT NULL),
              bc AS (SELECT w1, w2, count(*) AS c12 FROM bgn GROUP BY 1, 2),
              uc AS (SELECT tok AS w, count(*) AS c1 FROM t GROUP BY 1),
              tot AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM t),
              lp AS (SELECT s.doc_id,
                            CAST(round(CASE WHEN bc.c12 IS NOT NULL
                                 THEN ln(CAST(bc.c12 AS DOUBLE) / u1.c1)
                                 ELSE ln(CAST(0.4 AS DOUBLE) * u2.c1 / tot.t)
                                 END, 6) AS DECIMAL(18,6)) AS lp
                     FROM bgn s
                     LEFT JOIN bc ON bc.w1 = s.w1 AND bc.w2 = s.w2
                     JOIN uc u1 ON u1.w = s.w1
                     JOIN uc u2 ON u2.w = s.w2
                     CROSS JOIN tot)
         SELECT doc_id, count(*) AS n_bigrams,
                round(CAST(sum(lp) AS DOUBLE) / count(*), 6) AS avg_logp
         FROM lp GROUP BY doc_id ORDER BY doc_id""",

    // same LM scoring replay, then tertile cutoffs as kth-smallest
    // (k = ceil(q*n), identical double arithmetic) and the engine's
    // bucket compare; the filter keeps head+middle
    "x_lm_ppl_filter" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS l
                    FROM documents),
              t AS (SELECT doc_id, unnest(l) AS tok,
                           generate_subscripts(l, 1) AS pos
                    FROM d),
              bgn AS (SELECT doc_id, w1, w2 FROM (
                        SELECT doc_id, tok AS w1,
                               lead(tok) OVER (PARTITION BY doc_id
                                               ORDER BY pos) AS w2
                        FROM t)
                      WHERE w2 IS NOT NULL),
              bc AS (SELECT w1, w2, count(*) AS c12 FROM bgn GROUP BY 1, 2),
              uc AS (SELECT tok AS w, count(*) AS c1 FROM t GROUP BY 1),
              tot AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM t),
              lp AS (SELECT s.doc_id,
                            CAST(round(CASE WHEN bc.c12 IS NOT NULL
                                 THEN ln(CAST(bc.c12 AS DOUBLE) / u1.c1)
                                 ELSE ln(CAST(0.4 AS DOUBLE) * u2.c1 / tot.t)
                                 END, 6) AS DECIMAL(18,6)) AS lp
                     FROM bgn s
                     LEFT JOIN bc ON bc.w1 = s.w1 AND bc.w2 = s.w2
                     JOIN uc u1 ON u1.w = s.w1
                     JOIN uc u2 ON u2.w = s.w2
                     CROSS JOIN tot),
              scored AS (SELECT doc_id, count(*) AS n_bigrams,
                                round(CAST(sum(lp) AS DOUBLE) / count(*), 6)
                                  AS avg_logp
                         FROM lp GROUP BY doc_id),
              n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM scored),
              ks AS (SELECT CAST(ceil((1.0/3) * n) AS BIGINT) AS k1,
                            CAST(ceil((2.0/3) * n) AS BIGINT) AS k2
                     FROM n),
              ranked AS (SELECT avg_logp,
                                row_number() OVER (ORDER BY avg_logp,
                                                   doc_id) AS rn
                         FROM scored),
              cuts AS (SELECT
                         (SELECT avg_logp FROM ranked, ks
                          WHERE rn = k1) AS c1,
                         (SELECT avg_logp FROM ranked, ks
                          WHERE rn = k2) AS c2)
         SELECT doc_id, n_bigrams, avg_logp,
                CASE WHEN avg_logp <= c2 THEN 'middle'
                     ELSE 'head' END AS bucket
         FROM scored CROSS JOIN cuts
         WHERE avg_logp > c1
         ORDER BY doc_id""",

    "x_text_collocations" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS l
                    FROM documents),
              t AS (SELECT doc_id, unnest(l) AS tok,
                           generate_subscripts(l, 1) AS pos
                    FROM d),
              bgn AS (SELECT w1, w2 FROM (
                        SELECT tok AS w1,
                               lead(tok) OVER (PARTITION BY doc_id
                                               ORDER BY pos) AS w2
                        FROM t)
                      WHERE w2 IS NOT NULL),
              bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
                     FROM bgn GROUP BY 1, 2),
              uc AS (SELECT tok AS w, count(*) AS c1 FROM t GROUP BY 1),
              tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM bgn)
         SELECT bc.w1, bc.w2, bc.c12,
                round(ln(tot.n * CAST(bc.c12 AS DOUBLE) /
                  (CAST(u1.c1 AS DOUBLE) * CAST(u2.c1 AS DOUBLE))), 6)
                  AS pmi
         FROM bc
         JOIN uc u1 ON u1.w = bc.w1
         JOIN uc u2 ON u2.w = bc.w2
         CROSS JOIN tot
         WHERE bc.c12 >= 40
         ORDER BY pmi DESC, bc.w1, bc.w2""",

    // exact integer moments: Σxm and Σxm² in HUGEINT, variance numerator
    // n·Σx²−(Σx)² exact, one decimal→double conversion before the sqrt —
    // the same integer-quantization device as the drift oracle
    "x_feature_dimstats" ->
      """WITH e AS (SELECT generate_subscripts(embedding, 1) AS dim,
                           CAST(round(CAST(unnest(embedding) AS DOUBLE)
                             * 1000000) AS BIGINT) AS xm
                    FROM embeddings),
              a AS (SELECT dim, CAST(count(*) AS BIGINT) AS n,
                           sum(xm) AS s, sum(xm * xm) AS ss
                    FROM e GROUP BY 1)
         SELECT dim, n,
                round(CAST(s AS DOUBLE) / (n * 1000000.0), 6) AS mean,
                round(sqrt(CAST(ss * n - s * s AS DOUBLE))
                  / (n * 1000000.0), 6) AS std
         FROM a ORDER BY dim""",

    // same fixed evaluation order tf * ln(N/df) on both sides; the
    // (score DESC, term) tiebreak is the determinism contract
    "x_text_tfidf" ->
      """WITH tok AS (SELECT doc_id,
                             unnest(string_split(text, ' ')) AS term
                      FROM documents),
           tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
                  FROM tok GROUP BY 1, 2),
           dfc AS (SELECT term, count(*) AS dfc FROM tf GROUP BY 1),
           n AS (SELECT count(*) AS n FROM documents),
           sc AS (SELECT tf.doc_id, tf.term, tf.tf,
                         tf.tf * ln(CAST(n.n AS DOUBLE) / dfc.dfc)
                           AS score
                  FROM tf JOIN dfc USING (term) CROSS JOIN n)
         SELECT doc_id, term, tf, round(score, 6) AS score
         FROM sc
         QUALIFY row_number() OVER (PARTITION BY doc_id
           ORDER BY score DESC, term) <= 3
         ORDER BY doc_id, term""",

    // the oracle recomputes from the raw corpus — the engine's
    // bucket-pruned index probe must equal the full scan
    "x_text_search" ->
      """WITH tok AS (SELECT DISTINCT doc_id,
                             unnest(string_split(text, ' ')) AS term
                      FROM documents)
         SELECT doc_id FROM tok
         WHERE term IN ('batch', 'join')
         GROUP BY doc_id HAVING count(DISTINCT term) = 2
         ORDER BY doc_id""",

    // full-scan BM25 replay with the engine's exact evaluation order:
    // Lucene-form idf ln((N-df+.5)/(df+.5)+1), k1=1.2 b=0.75, per-doc
    // sum folded in ascending-term order, rank on the 6-decimal
    // rounded score with doc_id tiebreak
    "x_text_bm25" ->
      """WITH tok AS (SELECT doc_id,
                             unnest(string_split(text, ' ')) AS term
                      FROM documents),
           dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
                  FROM tok GROUP BY 1),
           st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                         CAST(sum(dl) AS BIGINT) AS total_dl FROM dl),
           tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
                  FROM tok WHERE term IN ('batch', 'join')
                  GROUP BY 1, 2),
           dfc AS (SELECT term, CAST(count(*) AS BIGINT) AS df
                   FROM tf GROUP BY 1),
           sc AS (SELECT tf.doc_id, tf.term,
                         ln((CAST(n_docs AS DOUBLE) - df + 0.5)
                            / (df + 0.5) + 1.0)
                         * (tf * 2.2)
                         / (tf + 1.2 * (0.25 + CAST(dl.dl AS DOUBLE)
                            * 0.75 / (CAST(total_dl AS DOUBLE) / n_docs)))
                           AS score
                  FROM tf JOIN dl USING (doc_id)
                          JOIN dfc USING (term) CROSS JOIN st),
           agg AS (SELECT doc_id,
                          round(sum(score ORDER BY term), 6) AS score
                   FROM sc GROUP BY 1)
         SELECT doc_id, score FROM agg
         QUALIFY row_number() OVER (ORDER BY score DESC, doc_id) <= 10
         ORDER BY score DESC, doc_id""",

    // delete == from-scratch: the oracle retrains WITHOUT the %5 docs
    // and cannot tell the engine served tombstones + signed stats rows
    "x_text_bm25_del" ->
      """WITH tok AS (SELECT doc_id,
                             unnest(string_split(text, ' ')) AS term
                      FROM documents WHERE doc_id % 5 <> 0),
           dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
                  FROM tok GROUP BY 1),
           st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                         CAST(sum(dl) AS BIGINT) AS total_dl FROM dl),
           tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
                  FROM tok WHERE term IN ('batch', 'join')
                  GROUP BY 1, 2),
           dfc AS (SELECT term, CAST(count(*) AS BIGINT) AS df
                   FROM tf GROUP BY 1),
           sc AS (SELECT tf.doc_id, tf.term,
                         ln((CAST(n_docs AS DOUBLE) - df + 0.5)
                            / (df + 0.5) + 1.0)
                         * (tf * 2.2)
                         / (tf + 1.2 * (0.25 + CAST(dl.dl AS DOUBLE)
                            * 0.75 / (CAST(total_dl AS DOUBLE) / n_docs)))
                           AS score
                  FROM tf JOIN dl USING (doc_id)
                          JOIN dfc USING (term) CROSS JOIN st),
           agg AS (SELECT doc_id,
                          round(sum(score ORDER BY term), 6) AS score
                   FROM sc GROUP BY 1)
         SELECT doc_id, score FROM agg
         QUALIFY row_number() OVER (ORDER BY score DESC, doc_id) <= 10
         ORDER BY score DESC, doc_id""",

    // incremental == from-scratch: the oracle recomputes FULL-corpus
    // BM25 and cannot tell the engine served a build + staged delta
    // the CDC-maintained index == from-scratch BM25 over the FINAL
    // table: originals minus the %5 deletes, plus the %9 copies the
    // insert wave fed in (their ids offset, so the delete wave never
    // touches them)
    "x_text_bm25_cdc" ->
      """WITH fin AS (SELECT doc_id, text FROM documents
                      WHERE doc_id % 5 <> 0
                      UNION ALL
                      SELECT doc_id + 1000000, text FROM documents
                      WHERE doc_id % 9 = 0),
           tok AS (SELECT doc_id,
                          unnest(string_split(text, ' ')) AS term
                   FROM fin),
           dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
                  FROM tok GROUP BY 1),
           st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                         CAST(sum(dl) AS BIGINT) AS total_dl FROM dl),
           tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
                  FROM tok WHERE term IN ('batch', 'join')
                  GROUP BY 1, 2),
           dfc AS (SELECT term, CAST(count(*) AS BIGINT) AS df
                   FROM tf GROUP BY 1),
           sc AS (SELECT tf.doc_id, tf.term,
                         ln((CAST(n_docs AS DOUBLE) - df + 0.5)
                            / (df + 0.5) + 1.0)
                         * (tf * 2.2)
                         / (tf + 1.2 * (0.25 + CAST(dl.dl AS DOUBLE)
                            * 0.75 / (CAST(total_dl AS DOUBLE) / n_docs)))
                           AS score
                  FROM tf JOIN dl USING (doc_id)
                          JOIN dfc USING (term) CROSS JOIN st),
           agg AS (SELECT doc_id,
                          round(sum(score ORDER BY term), 6) AS score
                   FROM sc GROUP BY 1)
         SELECT doc_id, score FROM agg
         QUALIFY row_number() OVER (ORDER BY score DESC, doc_id) <= 10
         ORDER BY score DESC, doc_id""",

    // live-stream-maintained BM25 == from-scratch over the final doc
    // set: %7 docs' text edited in place (re-indexed through
    // update = tombstone + purge + salted re-append), %5 deleted,
    // %9 copies inserted at +1000000
    "x_stream_bm25_cdc" ->
      """WITH fin AS (SELECT doc_id,
                             CASE WHEN doc_id % 7 = 0
                                  THEN text || ' join batch join'
                                  ELSE text END AS text
                      FROM documents
                      WHERE doc_id % 5 <> 0
                      UNION ALL
                      SELECT doc_id + 1000000, text FROM documents
                      WHERE doc_id % 9 = 0),
           tok AS (SELECT doc_id,
                          unnest(string_split(text, ' ')) AS term
                   FROM fin),
           dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
                  FROM tok GROUP BY 1),
           st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                         CAST(sum(dl) AS BIGINT) AS total_dl FROM dl),
           tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
                  FROM tok WHERE term IN ('batch', 'join')
                  GROUP BY 1, 2),
           dfc AS (SELECT term, CAST(count(*) AS BIGINT) AS df
                   FROM tf GROUP BY 1),
           sc AS (SELECT tf.doc_id, tf.term,
                         ln((CAST(n_docs AS DOUBLE) - df + 0.5)
                            / (df + 0.5) + 1.0)
                         * (tf * 2.2)
                         / (tf + 1.2 * (0.25 + CAST(dl.dl AS DOUBLE)
                            * 0.75 / (CAST(total_dl AS DOUBLE) / n_docs)))
                           AS score
                  FROM tf JOIN dl USING (doc_id)
                          JOIN dfc USING (term) CROSS JOIN st),
           agg AS (SELECT doc_id,
                          round(sum(score ORDER BY term), 6) AS score
                   FROM sc GROUP BY 1)
         SELECT doc_id, score FROM agg
         QUALIFY row_number() OVER (ORDER BY score DESC, doc_id) <= 10
         ORDER BY score DESC, doc_id""",

    "x_text_bm25_incr" ->
      """WITH tok AS (SELECT doc_id,
                             unnest(string_split(text, ' ')) AS term
                      FROM documents),
           dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
                  FROM tok GROUP BY 1),
           st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                         CAST(sum(dl) AS BIGINT) AS total_dl FROM dl),
           tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
                  FROM tok WHERE term IN ('batch', 'join')
                  GROUP BY 1, 2),
           dfc AS (SELECT term, CAST(count(*) AS BIGINT) AS df
                   FROM tf GROUP BY 1),
           sc AS (SELECT tf.doc_id, tf.term,
                         ln((CAST(n_docs AS DOUBLE) - df + 0.5)
                            / (df + 0.5) + 1.0)
                         * (tf * 2.2)
                         / (tf + 1.2 * (0.25 + CAST(dl.dl AS DOUBLE)
                            * 0.75 / (CAST(total_dl AS DOUBLE) / n_docs)))
                           AS score
                  FROM tf JOIN dl USING (doc_id)
                          JOIN dfc USING (term) CROSS JOIN st),
           agg AS (SELECT doc_id,
                          round(sum(score ORDER BY term), 6) AS score
                   FROM sc GROUP BY 1)
         SELECT doc_id, score FROM agg
         QUALIFY row_number() OVER (ORDER BY score DESC, doc_id) <= 10
         ORDER BY score DESC, doc_id""",

    // generated from TextFunctions.piiPatterns so the oracle scrubs
    // with the IDENTICAL regex chain, innermost = first pattern
    "x_text_scrub" -> {
      val planted = "text || ' reach user' || doc_id || " +
        "'@mail.example.com or +1555000' || doc_id || " +
        "' from 10.0.' || (doc_id % 256) || '.7'"
      val chain = TF.piiPatterns.foldLeft(planted) {
        case (inner, (pat, repl)) =>
          s"regexp_replace($inner, '$pat', '$repl', 'g')"
      }
      s"SELECT doc_id, $chain AS clean FROM documents ORDER BY doc_id"
    },

    // nested-lambda note: the inner list_filter captures the outer
    // row's token list t — DuckDB lambdas close over correlated columns
    "x_text_repetition" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t
                      FROM documents),
              g AS (SELECT doc_id, t,
                           list_transform(
                             generate_series(1, greatest(len(t)-2, 0)),
                             i -> array_to_string(t[i:i+2], ' ')) AS sh
                    FROM tok),
              r AS (SELECT doc_id,
                           CASE WHEN len(sh) <= 0 THEN 0.0
                                ELSE round(1.0 - len(list_distinct(sh)) * 1.0
                                           / len(sh), 6) END AS dup3_ratio,
                           CASE WHEN len(t) <= 0 THEN 0.0
                                ELSE round(list_max(list_transform(
                                       list_distinct(t),
                                       u -> len(list_filter(t, x -> x = u))))
                                     * 1.0 / len(t), 6) END AS top_tok_ratio
                    FROM g)
         SELECT doc_id, dup3_ratio, top_tok_ratio,
                (dup3_ratio <= 0.2 AND top_tok_ratio <= 0.3) AS keep
         FROM r ORDER BY doc_id""",

    "x_sim_bruteforce" ->
      """WITH q AS (SELECT vec_id AS qid,
                           CAST(unnest(embedding) AS DOUBLE) AS qx,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings WHERE vec_id = 0),
              e AS (SELECT vec_id,
                           CAST(unnest(embedding) AS DOUBLE) AS x,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings WHERE vec_id <> 0),
              s AS (SELECT e.vec_id,
                           round(sum(e.x * q.qx) /
                             (sqrt(sum(e.x * e.x)) * sqrt(sum(q.qx * q.qx))), 6) AS score
                    FROM e JOIN q ON e.i = q.i GROUP BY e.vec_id)
         SELECT vec_id, score FROM s
         ORDER BY score DESC, vec_id LIMIT 10""",

    "x_sim_ivf" ->
      """WITH q AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS qx,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings WHERE vec_id = 0),
              e AS (SELECT vec_id, label,
                           CAST(unnest(embedding) AS DOUBLE) AS x,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings),
              c AS (SELECT label, i, avg(x) AS m FROM e GROUP BY label, i),
              cs AS (SELECT c.label,
                            sum(c.m * q.qx) /
                              (sqrt(sum(c.m * c.m)) * sqrt(sum(q.qx * q.qx))) AS cscore
                     FROM c JOIN q ON c.i = q.i GROUP BY c.label),
              best AS (SELECT label FROM cs ORDER BY cscore DESC, label LIMIT 1),
              s AS (SELECT e.vec_id,
                           round(sum(e.x * q.qx) /
                             (sqrt(sum(e.x * e.x)) * sqrt(sum(q.qx * q.qx))), 6) AS score
                    FROM e JOIN q ON e.i = q.i
                    WHERE e.label IN (SELECT label FROM best)
                    GROUP BY e.vec_id)
         SELECT vec_id, score FROM s
         ORDER BY score DESC, vec_id LIMIT 10""",

    "x_sim_range" ->
      """WITH q AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS qx,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings WHERE vec_id = 0),
              e AS (SELECT vec_id,
                           CAST(unnest(embedding) AS DOUBLE) AS x,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings WHERE vec_id <> 0),
              s AS (SELECT e.vec_id,
                           round(sum(e.x * q.qx) /
                             (sqrt(sum(e.x * e.x)) *
                              sqrt(sum(q.qx * q.qx))), 6) AS score
                    FROM e JOIN q ON e.i = q.i GROUP BY e.vec_id)
         SELECT vec_id, score FROM s WHERE score >= 0.15
         ORDER BY score DESC, vec_id""",

    "x_sim_ivf_index" ->
      """WITH q AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS qx,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings WHERE vec_id = 0),
              e AS (SELECT vec_id,
                           CAST(unnest(embedding) AS DOUBLE) AS x,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings WHERE vec_id <> 0),
              s AS (SELECT e.vec_id,
                           round(sum(e.x * q.qx) /
                             (sqrt(sum(e.x * e.x)) * sqrt(sum(q.qx * q.qx))), 6) AS score
                    FROM e JOIN q ON e.i = q.i GROUP BY e.vec_id)
         SELECT vec_id, score FROM s
         ORDER BY score DESC, vec_id LIMIT 10""",

    // filtered ANN at full probe width is brute-force top-k over the
    // predicate's survivors
    "x_sim_filtered" ->
      """WITH q AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS qx,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings WHERE vec_id = 0),
              e AS (SELECT vec_id,
                           CAST(unnest(embedding) AS DOUBLE) AS x,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings
                    WHERE vec_id % 3 = 1),
              s AS (SELECT e.vec_id,
                           round(sum(e.x * q.qx) /
                             (sqrt(sum(e.x * e.x)) * sqrt(sum(q.qx * q.qx))), 6) AS score
                    FROM e JOIN q ON e.i = q.i GROUP BY e.vec_id)
         SELECT vec_id, score FROM s
         ORDER BY score DESC, vec_id LIMIT 10""",

    // a committed tombstone set masks exactly its ids: the full probe
    // is brute-force top-k over the surviving corpus (every %7 id gone)
    // the CDC-maintained index == brute force over the FINAL table:
    // originals minus the %7 deletes, plus the negated %5 twins the
    // insert wave fed in
    "x_sim_ivf_cdc" ->
      """WITH q AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS qx,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings WHERE vec_id = 0),
              fin AS (
                SELECT vec_id, embedding FROM embeddings
                WHERE vec_id <> 0 AND vec_id % 7 <> 0
                UNION ALL
                SELECT vec_id + 1000000,
                       list_transform(embedding, x -> -x)
                FROM embeddings WHERE vec_id % 5 = 0 AND vec_id <> 0),
              e AS (SELECT vec_id,
                           CAST(unnest(embedding) AS DOUBLE) AS x,
                           generate_subscripts(embedding, 1) AS i
                    FROM fin),
              s AS (SELECT e.vec_id,
                           round(sum(e.x * q.qx) /
                             (sqrt(sum(e.x * e.x)) * sqrt(sum(q.qx * q.qx))), 6) AS score
                    FROM e JOIN q ON e.i = q.i GROUP BY e.vec_id)
         SELECT vec_id, score FROM s
         ORDER BY score DESC, vec_id LIMIT 10""",

    // in-place update through the feed: the %5 vectors are REPLACED
    // (negated) under their own ids, then the %7 ids (including
    // updated ones) deleted — the index must serve exactly the final
    // table, old vectors fully retired
    "x_sim_ivf_update" ->
      """WITH q AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS qx,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings WHERE vec_id = 0),
              fin AS (
                SELECT vec_id,
                       CASE WHEN vec_id % 5 = 0
                            THEN list_transform(embedding, x -> -x)
                            ELSE embedding END AS embedding
                FROM embeddings
                WHERE vec_id <> 0 AND vec_id % 7 <> 0),
              e AS (SELECT vec_id,
                           CAST(unnest(embedding) AS DOUBLE) AS x,
                           generate_subscripts(embedding, 1) AS i
                    FROM fin),
              s AS (SELECT e.vec_id,
                           round(sum(e.x * q.qx) /
                             (sqrt(sum(e.x * e.x)) * sqrt(sum(q.qx * q.qx))), 6) AS score
                    FROM e JOIN q ON e.i = q.i GROUP BY e.vec_id)
         SELECT vec_id, score FROM s
         ORDER BY score DESC, vec_id LIMIT 10""",

    // live-stream-maintained index == brute force over the final
    // table: %3 originals updated in place (negated), %7 originals
    // deleted, negated %5 twins inserted at +1000000
    "x_stream_ivf_cdc" ->
      """WITH q AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS qx,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings WHERE vec_id = 0),
              fin AS (
                SELECT vec_id,
                       CASE WHEN vec_id % 3 = 0
                            THEN list_transform(embedding, x -> -x)
                            ELSE embedding END AS embedding
                FROM embeddings
                WHERE vec_id <> 0 AND vec_id % 7 <> 0
                UNION ALL
                SELECT vec_id + 1000000,
                       list_transform(embedding, x -> -x)
                FROM embeddings WHERE vec_id % 5 = 0 AND vec_id <> 0),
              e AS (SELECT vec_id,
                           CAST(unnest(embedding) AS DOUBLE) AS x,
                           generate_subscripts(embedding, 1) AS i
                    FROM fin),
              s AS (SELECT e.vec_id,
                           round(sum(e.x * q.qx) /
                             (sqrt(sum(e.x * e.x)) * sqrt(sum(q.qx * q.qx))), 6) AS score
                    FROM e JOIN q ON e.i = q.i GROUP BY e.vec_id)
         SELECT vec_id, score FROM s
         ORDER BY score DESC, vec_id LIMIT 10""",

    "x_sim_ivf_delete" ->
      """WITH q AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS qx,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings WHERE vec_id = 0),
              e AS (SELECT vec_id,
                           CAST(unnest(embedding) AS DOUBLE) AS x,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings
                    WHERE vec_id <> 0 AND vec_id % 7 <> 0),
              s AS (SELECT e.vec_id,
                           round(sum(e.x * q.qx) /
                             (sqrt(sum(e.x * e.x)) * sqrt(sum(q.qx * q.qx))), 6) AS score
                    FROM e JOIN q ON e.i = q.i GROUP BY e.vec_id)
         SELECT vec_id, score FROM s
         ORDER BY score DESC, vec_id LIMIT 10""",

    // BQ delete == from-scratch over survivors: the hamming candidate
    // pass and the exact rerank both run on the masked view, while the
    // centering means stay frozen at build time (full indexed corpus)
    "x_sim_bq_del" ->
      """WITH m AS (SELECT i, round(avg(x), 6) AS mx
                    FROM (SELECT CAST(unnest(embedding) AS DOUBLE) AS x,
                                 generate_subscripts(embedding, 1) AS i
                          FROM embeddings WHERE vec_id <> 0)
                    GROUP BY i),
              q AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS qx,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings WHERE vec_id = 0),
              e AS (SELECT vec_id,
                           CAST(unnest(embedding) AS DOUBLE) AS x,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings
                    WHERE vec_id <> 0 AND vec_id % 7 <> 0),
              ham AS (SELECT e.vec_id,
                             sum(CASE WHEN (e.x > m.mx) <> (q.qx > m.mx)
                                 THEN 1 ELSE 0 END) AS h
                      FROM e JOIN q ON e.i = q.i JOIN m ON m.i = e.i
                      GROUP BY 1),
              cand AS (SELECT vec_id FROM ham ORDER BY h ASC, vec_id
                       LIMIT 40),
              s2 AS (SELECT e.vec_id,
                            round(sum(e.x * q.qx) /
                              (sqrt(sum(e.x * e.x)) * sqrt(sum(q.qx * q.qx))),
                              6) AS score
                     FROM e JOIN q ON e.i = q.i
                     WHERE e.vec_id IN (SELECT vec_id FROM cand)
                     GROUP BY e.vec_id)
         SELECT vec_id, score FROM s2
         ORDER BY score DESC, vec_id LIMIT 10""",

    // LSH delete == from-scratch over survivors: buckets re-derived
    // from the pasted planes, candidates and rerank masked to %7 <> 0
    // (which also covers the deleted query vector, vec_id 0)
    // the CDC-maintained forest == the pasted-plane pipeline over the
    // FINAL table: survivors plus the negated insert twins, bucketed,
    // candidate-filtered, exact-reranked
    "x_sim_lsh_cdc" ->
      s"""WITH planes(t, w, i, p) AS (VALUES $lshPlaneValues),
         q AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS qx,
                      generate_subscripts(embedding, 1) AS i
               FROM embeddings WHERE vec_id = 0),
         fin AS (SELECT vec_id, embedding FROM embeddings
                 WHERE vec_id <> 0 AND vec_id % 7 <> 0
                 UNION ALL
                 SELECT vec_id + 1000000,
                        list_transform(embedding, x -> -x)
                 FROM embeddings WHERE vec_id % 5 = 0 AND vec_id <> 0),
         e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                      generate_subscripts(embedding, 1) AS i
               FROM fin),
         ed AS (SELECT e.vec_id, pl.t, pl.w, sum(e.x * pl.p) AS d
                FROM e JOIN planes pl ON e.i = pl.i GROUP BY 1, 2, 3),
         eb AS (SELECT vec_id, t,
                       sum(CASE WHEN d > 0 THEN w ELSE 0 END) AS bkt
                FROM ed GROUP BY 1, 2),
         qd AS (SELECT pl.t, pl.w, sum(q.qx * pl.p) AS d
                FROM q JOIN planes pl ON q.i = pl.i GROUP BY 1, 2),
         qb AS (SELECT t, sum(CASE WHEN d > 0 THEN w ELSE 0 END) AS bkt
                FROM qd GROUP BY 1),
         cand AS (SELECT DISTINCT eb.vec_id
                  FROM eb JOIN qb ON eb.t = qb.t AND eb.bkt = qb.bkt),
         s AS (SELECT e.vec_id,
                      round(sum(e.x * q.qx) /
                        (sqrt(sum(e.x * e.x)) * sqrt(sum(q.qx * q.qx))), 6) AS score
               FROM e JOIN q ON e.i = q.i
               WHERE e.vec_id IN (SELECT vec_id FROM cand)
               GROUP BY 1)
         SELECT vec_id, score FROM s ORDER BY score DESC, vec_id LIMIT 10""",

    // live-stream-maintained forest == the pasted-plane bucket replay
    // over the final table: %3 originals updated in place (negated),
    // %7 originals deleted, negated %5 twins inserted at +1000000
    "x_stream_lsh_cdc" ->
      s"""WITH planes(t, w, i, p) AS (VALUES $lshPlaneValues),
         q AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS qx,
                      generate_subscripts(embedding, 1) AS i
               FROM embeddings WHERE vec_id = 0),
         fin AS (SELECT vec_id,
                        CASE WHEN vec_id % 3 = 0
                             THEN list_transform(embedding, x -> -x)
                             ELSE embedding END AS embedding
                 FROM embeddings
                 WHERE vec_id <> 0 AND vec_id % 7 <> 0
                 UNION ALL
                 SELECT vec_id + 1000000,
                        list_transform(embedding, x -> -x)
                 FROM embeddings WHERE vec_id % 5 = 0 AND vec_id <> 0),
         e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                      generate_subscripts(embedding, 1) AS i
               FROM fin),
         ed AS (SELECT e.vec_id, pl.t, pl.w, sum(e.x * pl.p) AS d
                FROM e JOIN planes pl ON e.i = pl.i GROUP BY 1, 2, 3),
         eb AS (SELECT vec_id, t,
                       sum(CASE WHEN d > 0 THEN w ELSE 0 END) AS bkt
                FROM ed GROUP BY 1, 2),
         qd AS (SELECT pl.t, pl.w, sum(q.qx * pl.p) AS d
                FROM q JOIN planes pl ON q.i = pl.i GROUP BY 1, 2),
         qb AS (SELECT t, sum(CASE WHEN d > 0 THEN w ELSE 0 END) AS bkt
                FROM qd GROUP BY 1),
         cand AS (SELECT DISTINCT eb.vec_id
                  FROM eb JOIN qb ON eb.t = qb.t AND eb.bkt = qb.bkt),
         s AS (SELECT e.vec_id,
                      round(sum(e.x * q.qx) /
                        (sqrt(sum(e.x * e.x)) * sqrt(sum(q.qx * q.qx))), 6) AS score
               FROM e JOIN q ON e.i = q.i
               WHERE e.vec_id IN (SELECT vec_id FROM cand)
               GROUP BY 1)
         SELECT vec_id, score FROM s ORDER BY score DESC, vec_id LIMIT 10""",

    "x_sim_lsh_del" ->
      s"""WITH planes(t, w, i, p) AS (VALUES $lshPlaneValues),
         q AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS qx,
                      generate_subscripts(embedding, 1) AS i
               FROM embeddings WHERE vec_id = 0),
         e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                      generate_subscripts(embedding, 1) AS i
               FROM embeddings WHERE vec_id % 7 <> 0),
         ed AS (SELECT e.vec_id, pl.t, pl.w, sum(e.x * pl.p) AS d
                FROM e JOIN planes pl ON e.i = pl.i GROUP BY 1, 2, 3),
         eb AS (SELECT vec_id, t,
                       sum(CASE WHEN d > 0 THEN w ELSE 0 END) AS bkt
                FROM ed GROUP BY 1, 2),
         qd AS (SELECT pl.t, pl.w, sum(q.qx * pl.p) AS d
                FROM q JOIN planes pl ON q.i = pl.i GROUP BY 1, 2),
         qb AS (SELECT t, sum(CASE WHEN d > 0 THEN w ELSE 0 END) AS bkt
                FROM qd GROUP BY 1),
         cand AS (SELECT DISTINCT eb.vec_id
                  FROM eb JOIN qb ON eb.t = qb.t AND eb.bkt = qb.bkt),
         s AS (SELECT e.vec_id,
                      round(sum(e.x * q.qx) /
                        (sqrt(sum(e.x * e.x)) * sqrt(sum(q.qx * q.qx))), 6) AS score
               FROM e JOIN q ON e.i = q.i
               WHERE e.vec_id IN (SELECT vec_id FROM cand)
               GROUP BY 1)
         SELECT vec_id, score FROM s ORDER BY score DESC, vec_id LIMIT 10""",

    // storage maintenance must never change content: after the hot-cell
    // split, a full probe over the live cells is exactly brute-force
    // top-k — same model as x_sim_ivf_index, wider cut (12)
    "x_sim_ivf_rebalance" ->
      """WITH q AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS qx,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings WHERE vec_id = 0),
              e AS (SELECT vec_id,
                           CAST(unnest(embedding) AS DOUBLE) AS x,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings WHERE vec_id <> 0),
              s AS (SELECT e.vec_id,
                           round(sum(e.x * q.qx) /
                             (sqrt(sum(e.x * e.x)) * sqrt(sum(q.qx * q.qx))), 6) AS score
                    FROM e JOIN q ON e.i = q.i GROUP BY e.vec_id)
         SELECT vec_id, score FROM s
         ORDER BY score DESC, vec_id LIMIT 12""",

    // the quantizer scale (127/max|x|, one double) and both tie-break
    // orders are total, so replaying the two-stage pipeline is exact:
    // stage 1 ranks by the int8 dot product, stage 2 re-ranks the top
    // `rerank` candidates by full-precision cosine
    "x_sim_sq" ->
      """WITH m AS (SELECT 127.0 / max(abs(CAST(x AS DOUBLE))) AS s
                    FROM (SELECT unnest(embedding) AS x FROM embeddings)),
              q AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS qx,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings WHERE vec_id = 0),
              e AS (SELECT vec_id,
                           CAST(unnest(embedding) AS DOUBLE) AS x,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings WHERE vec_id <> 0),
              qd AS (SELECT e.vec_id,
                            sum(round(e.x * (SELECT s FROM m)) *
                                round(q.qx * (SELECT s FROM m))) AS qdot
                     FROM e JOIN q ON e.i = q.i GROUP BY e.vec_id),
              cand AS (SELECT vec_id FROM qd
                       ORDER BY qdot DESC, vec_id LIMIT 40),
              s2 AS (SELECT e.vec_id,
                            round(sum(e.x * q.qx) /
                              (sqrt(sum(e.x * e.x)) * sqrt(sum(q.qx * q.qx))),
                              6) AS score
                     FROM e JOIN q ON e.i = q.i
                     WHERE e.vec_id IN (SELECT vec_id FROM cand)
                     GROUP BY e.vec_id)
         SELECT vec_id, score FROM s2
         ORDER BY score DESC, vec_id LIMIT 10""",

    // prefix-cosine candidate stage replayed dimension-for-dimension
    // (i <= 16), then the standard exact re-rank
    "x_sim_mrl" ->
      """WITH q AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS qx,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings WHERE vec_id = 0),
              e AS (SELECT vec_id,
                           CAST(unnest(embedding) AS DOUBLE) AS x,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings WHERE vec_id <> 0),
              ps AS (SELECT e.vec_id,
                            round(sum(e.x * q.qx) /
                              (sqrt(sum(e.x * e.x)) * sqrt(sum(q.qx * q.qx))),
                              6) AS p
                     FROM e JOIN q ON e.i = q.i
                     WHERE e.i <= 16 GROUP BY 1),
              cand AS (SELECT vec_id FROM ps ORDER BY p DESC, vec_id
                       LIMIT 40),
              s2 AS (SELECT e.vec_id,
                            round(sum(e.x * q.qx) /
                              (sqrt(sum(e.x * e.x)) * sqrt(sum(q.qx * q.qx))),
                              6) AS score
                     FROM e JOIN q ON e.i = q.i
                     WHERE e.vec_id IN (SELECT vec_id FROM cand)
                     GROUP BY e.vec_id)
         SELECT vec_id, score FROM s2
         ORDER BY score DESC, vec_id LIMIT 10""",

    // sign-mismatch count == packed-XOR popcount: the oracle never
    // packs, it compares (x > mean) booleans per dimension over the
    // SAME round(avg, 6) thresholds the engine centers on
    "x_sim_bq" ->
      """WITH m AS (SELECT i, round(avg(x), 6) AS mx
                    FROM (SELECT CAST(unnest(embedding) AS DOUBLE) AS x,
                                 generate_subscripts(embedding, 1) AS i
                          FROM embeddings)
                    GROUP BY i),
              q AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS qx,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings WHERE vec_id = 0),
              e AS (SELECT vec_id,
                           CAST(unnest(embedding) AS DOUBLE) AS x,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings WHERE vec_id <> 0),
              ham AS (SELECT e.vec_id,
                             sum(CASE WHEN (e.x > m.mx) <> (q.qx > m.mx)
                                 THEN 1 ELSE 0 END) AS h
                      FROM e JOIN q ON e.i = q.i JOIN m ON m.i = e.i
                      GROUP BY 1),
              cand AS (SELECT vec_id FROM ham ORDER BY h ASC, vec_id
                       LIMIT 40),
              s2 AS (SELECT e.vec_id,
                            round(sum(e.x * q.qx) /
                              (sqrt(sum(e.x * e.x)) * sqrt(sum(q.qx * q.qx))),
                              6) AS score
                     FROM e JOIN q ON e.i = q.i
                     WHERE e.vec_id IN (SELECT vec_id FROM cand)
                     GROUP BY e.vec_id)
         SELECT vec_id, score FROM s2
         ORDER BY score DESC, vec_id LIMIT 10""",

    // the artifact twin of x_sim_bq: same algebra, means over the
    // indexed (vec_id <> 0) corpus only
    "x_sim_bq_index" ->
      """WITH m AS (SELECT i, round(avg(x), 6) AS mx
                    FROM (SELECT CAST(unnest(embedding) AS DOUBLE) AS x,
                                 generate_subscripts(embedding, 1) AS i
                          FROM embeddings WHERE vec_id <> 0)
                    GROUP BY i),
              q AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS qx,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings WHERE vec_id = 0),
              e AS (SELECT vec_id,
                           CAST(unnest(embedding) AS DOUBLE) AS x,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings WHERE vec_id <> 0),
              ham AS (SELECT e.vec_id,
                             sum(CASE WHEN (e.x > m.mx) <> (q.qx > m.mx)
                                 THEN 1 ELSE 0 END) AS h
                      FROM e JOIN q ON e.i = q.i JOIN m ON m.i = e.i
                      GROUP BY 1),
              cand AS (SELECT vec_id FROM ham ORDER BY h ASC, vec_id
                       LIMIT 40),
              s2 AS (SELECT e.vec_id,
                            round(sum(e.x * q.qx) /
                              (sqrt(sum(e.x * e.x)) * sqrt(sum(q.qx * q.qx))),
                              6) AS score
                     FROM e JOIN q ON e.i = q.i
                     WHERE e.vec_id IN (SELECT vec_id FROM cand)
                     GROUP BY e.vec_id)
         SELECT vec_id, score FROM s2
         ORDER BY score DESC, vec_id LIMIT 10""",

    "x_sim_lsh" -> lshOracleSql,

    "x_sim_lsh_index" -> lshIndexOracleSql,

    "x_sim_lsh_probe2" -> lshMultiProbeOracleSql(2),
    "x_sim_lsh_probe4" -> lshMultiProbeOracleSql(4),

    "x_sim_ivf_probe" -> ivfProbeOracleSql,

    // ADC replay from the stored artifacts: the query is rotated via the
    // stored 1e6-scaled OPQ matrix in EXACT integer arithmetic (products
    // ≤1e12, 64-term sums ≪2^53 — no engine can perturb an integer sum),
    // then LUT = rotated-query-subvector · codeword (rounded 6dp),
    // approx = sum of the row's m table hits (re-rounded 6dp), candidate
    // cut, exact re-rank on ORIGINAL vectors. subDim interpolated from
    // the gate's PqM so a config change cannot silently misalign the
    // LUT join.
    "x_sim_pq" ->
      s"""WITH q AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS qx,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings WHERE vec_id = 0),
             rot AS (SELECT i, generate_subscripts(r, 1) AS j,
                            unnest(r) AS v
                     FROM read_parquet('__GRAFT_PQ__/pq_rotation/*.parquet')),
             rq AS (SELECT rot.i AS i,
                           CAST(sum(rot.v *
                             CAST(round(q.qx * 1000000) AS BIGINT)) AS DOUBLE)
                             / 1000000000000.0 AS qx
                    FROM rot JOIN q ON rot.j = q.i GROUP BY 1),
             cb AS (SELECT subspace, code,
                           generate_subscripts(centroid, 1) AS p,
                           CAST(unnest(centroid) AS DOUBLE) AS c
                    FROM read_parquet('__GRAFT_PQ__/pq_codebook/*.parquet')),
             lut AS (SELECT cb.subspace, cb.code,
                            round(sum(cb.c * rq.qx), 6) AS v
                     FROM cb JOIN rq ON rq.i = cb.subspace * $PqSubDim + cb.p
                     GROUP BY 1, 2),
             codes AS (SELECT id, generate_subscripts(codes, 1) AS j1,
                              CAST(unnest(codes) AS INT) AS code
                       FROM read_parquet('__GRAFT_PQ__/pq_codes/*.parquet')),
             adc AS (SELECT codes.id, round(sum(lut.v), 6) AS s
                     FROM codes JOIN lut
                       ON lut.subspace = codes.j1 - 1
                      AND lut.code = codes.code
                     GROUP BY 1),
             cand AS (SELECT id FROM adc ORDER BY s DESC, id LIMIT 44),
             e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                          generate_subscripts(embedding, 1) AS i
                   FROM embeddings),
             s2 AS (SELECT e.vec_id,
                           round(sum(e.x * q.qx) /
                             (sqrt(sum(e.x * e.x)) * sqrt(sum(q.qx * q.qx))), 6) AS score
                    FROM e JOIN q ON e.i = q.i
                    WHERE e.vec_id IN (SELECT id FROM cand)
                    GROUP BY 1),
             top AS (SELECT vec_id, score FROM s2
                     ORDER BY score DESC, vec_id LIMIT 11)
         SELECT vec_id, score FROM top WHERE vec_id <> 0
         ORDER BY score DESC, vec_id LIMIT 10""",

    // the committed-probe artifact twin of x_sim_pq: same stored-
    // artifact ADC replay (every delta in the codes dir is committed
    // in the verify flow, so the *.parquet glob IS the committed
    // view), wider rerank cut (88)
    "x_sim_pq_index" ->
      s"""WITH q AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS qx,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings WHERE vec_id = 0),
             rot AS (SELECT i, generate_subscripts(r, 1) AS j,
                            unnest(r) AS v
                     FROM read_parquet('__GRAFT_PQ__/pq_rotation/*.parquet')),
             rq AS (SELECT rot.i AS i,
                           CAST(sum(rot.v *
                             CAST(round(q.qx * 1000000) AS BIGINT)) AS DOUBLE)
                             / 1000000000000.0 AS qx
                    FROM rot JOIN q ON rot.j = q.i GROUP BY 1),
             cb AS (SELECT subspace, code,
                           generate_subscripts(centroid, 1) AS p,
                           CAST(unnest(centroid) AS DOUBLE) AS c
                    FROM read_parquet('__GRAFT_PQ__/pq_codebook/*.parquet')),
             lut AS (SELECT cb.subspace, cb.code,
                            round(sum(cb.c * rq.qx), 6) AS v
                     FROM cb JOIN rq ON rq.i = cb.subspace * $PqSubDim + cb.p
                     GROUP BY 1, 2),
             codes AS (SELECT id, generate_subscripts(codes, 1) AS j1,
                              CAST(unnest(codes) AS INT) AS code
                       FROM read_parquet('__GRAFT_PQ__/pq_codes/*.parquet')),
             adc AS (SELECT codes.id, round(sum(lut.v), 6) AS s
                     FROM codes JOIN lut
                       ON lut.subspace = codes.j1 - 1
                      AND lut.code = codes.code
                     GROUP BY 1),
             cand AS (SELECT id FROM adc ORDER BY s DESC, id LIMIT 88),
             e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                          generate_subscripts(embedding, 1) AS i
                   FROM embeddings),
             s2 AS (SELECT e.vec_id,
                           round(sum(e.x * q.qx) /
                             (sqrt(sum(e.x * e.x)) * sqrt(sum(q.qx * q.qx))), 6) AS score
                    FROM e JOIN q ON e.i = q.i
                    WHERE e.vec_id IN (SELECT id FROM cand)
                    GROUP BY 1),
             top AS (SELECT vec_id, score FROM s2
                     ORDER BY score DESC, vec_id LIMIT 11)
         SELECT vec_id, score FROM top WHERE vec_id <> 0
         ORDER BY score DESC, vec_id LIMIT 10""",

    // IVFPQ replay: cell choice from the centroid artifact; the query is
    // rotated via the stored 1e6-scaled OPQ matrix (exact integer
    // arithmetic — the codes quantize ROTATED residuals, and IP(R·q,R·r)
    // = IP(q,r) for an orthonormal R); LUT = the rotated query against
    // the RESIDUAL codebooks; at nprobe=2 each code row's ADC total
    // carries its cell's IP(q, centroid) constant (cc) so candidates
    // compete across cells exactly as the engine ranks them; candidates
    // from the probed cells' codes partitions; re-rank restricted to the
    // same cells artifact slice the engine joins (rows whose stored cell
    // differs from the codes partition — possible after an IVF rebuild —
    // drop on BOTH sides identically)
    "x_sim_ivfpq" ->
      s"""WITH q AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS qx,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings WHERE vec_id = 0),
         c AS (SELECT cell, CAST(unnest(centroid) AS DOUBLE) AS cx,
                      generate_subscripts(centroid, 1) AS i
               FROM read_parquet('__GRAFT_IVF__/ivf_centroids/*.parquet')),
         cbest AS (SELECT cell FROM (
                     SELECT c.cell,
                            round(sum(c.cx * q.qx) /
                              (sqrt(sum(c.cx * c.cx)) * sqrt(sum(q.qx * q.qx))), 6) AS cs
                     FROM c JOIN q ON c.i = q.i GROUP BY c.cell)
                   ORDER BY cs DESC, cell LIMIT 2),
         cc AS (SELECT c.cell, round(sum(c.cx * q.qx), 6) AS cconst
                FROM c JOIN q ON c.i = q.i
                WHERE c.cell IN (SELECT cell FROM cbest)
                GROUP BY c.cell),
         rot AS (SELECT i, generate_subscripts(r, 1) AS j, unnest(r) AS v
                 FROM read_parquet('__GRAFT_IVFPQ__/pq_rotation/*.parquet')),
         rq AS (SELECT rot.i AS i,
                       CAST(sum(rot.v *
                         CAST(round(q.qx * 1000000) AS BIGINT)) AS DOUBLE)
                         / 1000000000000.0 AS qx
                FROM rot JOIN q ON rot.j = q.i GROUP BY 1),
         cb AS (SELECT subspace, code,
                       generate_subscripts(centroid, 1) AS p,
                       CAST(unnest(centroid) AS DOUBLE) AS c2
                FROM read_parquet('__GRAFT_IVFPQ__/pq_codebook/*.parquet')),
         lut AS (SELECT cb.subspace, cb.code,
                        round(sum(cb.c2 * rq.qx), 6) AS v
                 FROM cb JOIN rq ON rq.i = cb.subspace * $PqSubDim + cb.p
                 GROUP BY 1, 2),
         codes AS (SELECT id, CAST(cell AS INTEGER) AS cell,
                          generate_subscripts(codes, 1) AS j1,
                          CAST(unnest(codes) AS INT) AS code
                   FROM read_parquet('__GRAFT_IVFPQ__/pq_codes/*/*.parquet',
                                     hive_partitioning = 1)
                   WHERE CAST(cell AS INTEGER) IN (SELECT cell FROM cbest)),
         adc AS (SELECT codes.id,
                        round(sum(lut.v) + max(cc.cconst), 6) AS s
                 FROM codes
                 JOIN cc ON cc.cell = codes.cell
                 JOIN lut
                   ON lut.subspace = codes.j1 - 1
                  AND lut.code = codes.code
                 GROUP BY 1),
         cand AS (SELECT id FROM adc ORDER BY s DESC, id LIMIT 88),
         e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                      generate_subscripts(embedding, 1) AS i
               FROM read_parquet('__GRAFT_IVF__/ivf_cells/*/*.parquet',
                                 hive_partitioning = 1)
               WHERE CAST(cell AS INTEGER) IN (SELECT cell FROM cbest)),
         s2 AS (SELECT e.vec_id,
                       round(sum(e.x * q.qx) /
                         (sqrt(sum(e.x * e.x)) * sqrt(sum(q.qx * q.qx))), 6) AS score
                FROM e JOIN q ON e.i = q.i
                WHERE e.vec_id IN (SELECT id FROM cand)
                GROUP BY 1),
         top AS (SELECT vec_id, score FROM s2
                 ORDER BY score DESC, vec_id LIMIT 11)
         SELECT vec_id, score FROM top WHERE vec_id <> 0
         ORDER BY score DESC, vec_id LIMIT 10""",

    // both vectors recomputed from the artifacts: stored centroid from
    // the centroid table, current mean from the cell rows. The mean is
    // an EXACT integer sum of 1e-6-quantized components over the exact
    // row count — bit-identical to the engine's regardless of either
    // side's scan/partition order (a float avg() here could flip the
    // 6-dp cosine on a boundary value)
    "x_sim_ivf_drift" ->
      """WITH cur AS (SELECT CAST(cell AS INTEGER) AS cell,
                             generate_subscripts(embedding, 1) AS i,
                             CAST(unnest(embedding) AS DOUBLE) AS x
                      FROM read_parquet('__GRAFT_IVF__/ivf_cells/*/*.parquet',
                                        hive_partitioning = 1)),
              cm AS (SELECT cell, i,
                            CAST(sum(CAST(round(x * 1000000) AS BIGINT)) AS DOUBLE)
                              / (count(*) * 1000000.0) AS m
                     FROM cur GROUP BY 1, 2),
              st AS (SELECT cell, generate_subscripts(centroid, 1) AS i,
                            CAST(unnest(centroid) AS DOUBLE) AS c
                     FROM read_parquet('__GRAFT_IVF__/ivf_centroids/*.parquet'))
         SELECT cell, dc AS drift_cosine, (dc < 0.999999) AS retrain FROM (
           SELECT st.cell,
                  round(sum(st.c * cm.m) /
                    (sqrt(sum(st.c * st.c)) * sqrt(sum(cm.m * cm.m))), 6) AS dc
           FROM st JOIN cm ON st.cell = cm.cell AND st.i = cm.i
           GROUP BY st.cell) z
         ORDER BY cell""",

    // IVF probe + int8 candidate stage: quantizer scale re-derived from
    // the SAME cells artifact the engine's build scanned (deterministic
    // max), candidate cut at the quantized dot, exact re-rank, and the
    // query row (vec 0) filtered only at the end — mirroring the gate
    "x_sim_ivf_sq" ->
      """WITH q AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS qx,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings WHERE vec_id = 0),
         cells0 AS (SELECT vec_id, CAST(cell AS INTEGER) AS cell, embedding
                    FROM read_parquet('__GRAFT_IVF__/ivf_cells/*/*.parquet',
                                      hive_partitioning = 1)),
         mx AS (SELECT 127.0 / max(abs(CAST(x AS DOUBLE))) AS s
                FROM (SELECT unnest(embedding) AS x FROM cells0)),
         c AS (SELECT cell, CAST(unnest(centroid) AS DOUBLE) AS cx,
                      generate_subscripts(centroid, 1) AS i
               FROM read_parquet('__GRAFT_IVF__/ivf_centroids/*.parquet')),
         cbest AS (SELECT cell FROM (
                     SELECT c.cell,
                            round(sum(c.cx * q.qx) /
                              (sqrt(sum(c.cx * c.cx)) * sqrt(sum(q.qx * q.qx))), 6) AS cs
                     FROM c JOIN q ON c.i = q.i GROUP BY c.cell)
                   ORDER BY cs DESC, cell LIMIT 1),
         m AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                      generate_subscripts(embedding, 1) AS i
               FROM cells0
               WHERE cell = (SELECT cell FROM cbest)),
         qd AS (SELECT m.vec_id,
                       sum(round(m.x * (SELECT s FROM mx)) *
                           round(q.qx * (SELECT s FROM mx))) AS qdot
                FROM m JOIN q ON m.i = q.i GROUP BY 1),
         cand AS (SELECT vec_id FROM qd
                  ORDER BY qdot DESC, vec_id LIMIT 44),
         s AS (SELECT m.vec_id,
                      round(sum(m.x * q.qx) /
                        (sqrt(sum(m.x * m.x)) * sqrt(sum(q.qx * q.qx))), 6) AS score
               FROM m JOIN q ON m.i = q.i
               WHERE m.vec_id IN (SELECT vec_id FROM cand)
               GROUP BY 1),
         top AS (SELECT vec_id, score FROM s
                 ORDER BY score DESC, vec_id LIMIT 11)
         SELECT vec_id, score FROM top WHERE vec_id <> 0
         ORDER BY score DESC, vec_id LIMIT 10""",

    "x_sim_knn" ->
      """WITH e AS (SELECT vec_id, label,
                           CAST(unnest(embedding) AS DOUBLE) AS x,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings WHERE vec_id <> 0),
           pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                            round(sum(a.x * b.x) /
                              (sqrt(sum(a.x * a.x)) * sqrt(sum(b.x * b.x))), 6)
                              AS score
                     FROM e a JOIN e b
                       ON a.label = b.label AND a.i = b.i
                      AND a.vec_id <> b.vec_id
                     WHERE a.vec_id % 50 = 0
                     GROUP BY 1, 2)
         SELECT id_a, id_b, score FROM pairs
         QUALIFY row_number() OVER (PARTITION BY id_a
           ORDER BY score DESC, id_b) <= 3
         ORDER BY id_a, score DESC, id_b""",

    // same ranking as x_sim_knn but blocked on the IVF index's learned
    // cells, read from the same artifact the engine uses
    "x_sim_knn_ivf" ->
      """WITH e AS (SELECT vec_id, cell,
                           CAST(unnest(embedding) AS DOUBLE) AS x,
                           generate_subscripts(embedding, 1) AS i
                    FROM read_parquet('__GRAFT_IVF__/ivf_cells/*/*.parquet',
                                      hive_partitioning = 1)
                    WHERE vec_id <> 0),
           pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                            round(sum(a.x * b.x) /
                              (sqrt(sum(a.x * a.x)) * sqrt(sum(b.x * b.x))), 6)
                              AS score
                     FROM e a JOIN e b
                       ON a.cell = b.cell AND a.i = b.i
                      AND a.vec_id <> b.vec_id
                     WHERE a.vec_id % 50 = 0
                     GROUP BY 1, 2)
         SELECT id_a, id_b, score FROM pairs
         QUALIFY row_number() OVER (PARTITION BY id_a
           ORDER BY score DESC, id_b) <= 3
         ORDER BY id_a, score DESC, id_b""",

    // the kNN replay with the duplicate band excluded BEFORE ranking
    // (HAVING on the pair score, strictly < 0.4) — top non-duplicates
    "x_sim_hard_negatives" ->
      """WITH e AS (SELECT vec_id, cell,
                           CAST(unnest(embedding) AS DOUBLE) AS x,
                           generate_subscripts(embedding, 1) AS i
                    FROM read_parquet('__GRAFT_IVF__/ivf_cells/*/*.parquet',
                                      hive_partitioning = 1)
                    WHERE vec_id <> 0),
           pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                            round(sum(a.x * b.x) /
                              (sqrt(sum(a.x * a.x)) * sqrt(sum(b.x * b.x))), 6)
                              AS score
                     FROM e a JOIN e b
                       ON a.cell = b.cell AND a.i = b.i
                      AND a.vec_id <> b.vec_id
                     WHERE a.vec_id % 50 = 0
                     GROUP BY 1, 2
                     HAVING round(sum(a.x * b.x) /
                       (sqrt(sum(a.x * a.x)) * sqrt(sum(b.x * b.x))), 6)
                       < 0.4)
         SELECT id_a, id_b, score FROM pairs
         QUALIFY row_number() OVER (PARTITION BY id_a
           ORDER BY score DESC, id_b) <= 3
         ORDER BY id_a, score DESC, id_b""",

    "x_mm_meta" ->
      """SELECT doc_id AS media_id,
                octet_length(CAST(text AS BLOB)) AS n_bytes,
                md5(text) AS content_md5,
                ascii(substr(text, 1, 1)) AS first_byte
         FROM documents ORDER BY media_id""",

    "x_mm_decode" -> mmDecodeOracleSql,

    // generate_series as a scalar list + unnest (lateral form fails in
    // DuckDB 1.0); empty series (n_frames = 0) drops the row, matching
    // Spark's explode of an empty sequence
    "x_mm_frames" ->
      s"""SELECT media_id,
                 CAST(unnest(generate_series(0, n_frames - 1, 3)) AS INT)
                   AS frame_idx,
                 width, height
          FROM ($mmDecodedBody) d
          ORDER BY media_id, frame_idx""",

    // pixel (x,y) channel ch sits at 0-based byte off + y·stride + 3x +
    // ch; the stride re-derives the writer's 4-byte row padding, and
    // the series cross-join enumerates every pixel exactly once
    "x_mm_image_stats" -> {
      def bd(e: String) =
        s"(strpos('0123456789ABCDEF', substr(h, 2 * ($e) - 1, 1)) * 16 + " +
          s"strpos('0123456789ABCDEF', substr(h, 2 * ($e), 1)) - 17)"
      def bl(i: Int) = bd(i.toString)
      def le32(i: Int) = s"(${bl(i)} + 256 * ${bl(i + 1)} + " +
        s"65536 * ${bl(i + 2)} + 16777216 * ${bl(i + 3)})"
      s"""WITH m AS (SELECT media_id, hex(content) AS h
                     FROM read_parquet('__GRAFT_MEDIA__/*.parquet')
                     WHERE substr(hex(content), 1, 4) = '424D'),
              d AS (SELECT media_id, h, ${le32(11)} AS off,
                           ${le32(19)} AS wd, ${le32(23)} AS ht
                    FROM m),
              d2 AS (SELECT *, (3 * wd + 3) - ((3 * wd + 3) % 4) AS stride
                     FROM d WHERE wd > 0 AND ht > 0),
              yy AS (SELECT media_id, h, off, wd, stride,
                            unnest(generate_series(0,
                              CAST(ht - 1 AS BIGINT))) AS y
                     FROM d2),
              xx AS (SELECT media_id, h, off, stride, y,
                            unnest(generate_series(0,
                              CAST(wd - 1 AS BIGINT))) AS x
                     FROM yy),
              p AS (SELECT xx.media_id, cc.ch,
                           ${bd("off + y * stride + 3 * x + cc.ch + 1")}
                             AS v
                    FROM xx CROSS JOIN
                         (SELECT unnest([0, 1, 2]) AS ch) cc)
         SELECT media_id, CAST(ch AS INT) AS channel,
                CAST(count(*) AS BIGINT) AS n_pixels,
                CAST(sum(v) AS BIGINT) AS sum_value
         FROM p GROUP BY 1, 2
         ORDER BY media_id, channel"""
    },

    // the 9×8 grid replayed as two generate_series, luminance via three
    // dynamic hex byte reads, bit packing as HUGEINT power-of-two terms
    // (a VALUES table of exact 2^i literals) with the 2^63 two's-
    // complement fold before the BIGINT cast
    "x_mm_phash" ->
      s"""$mmDHashOracleCte
         SELECT media_id, dhash FROM dh ORDER BY media_id""",

    // the same hash derivation, then a blocking-free all-pairs Hamming
    // scan — verifying the chunk blocking's pigeonhole exhaustiveness
    // on the IMAGE signatures exactly as x_dedup_simhash does on text
    "x_mm_neardup" ->
      s"""$mmDHashOracleCte
         SELECT a.media_id AS id_a, b.media_id AS id_b,
                CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
         FROM dh a JOIN dh b ON a.media_id < b.media_id
         WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
         ORDER BY id_a, id_b""",

    // dynamic hex-position byte reads: sample i's 16-bit LE word sits at
    // 1-based bytes (45+2i, 46+2i) of the canonical payload; two's
    // complement via the >= 32768 fold; windows by integer division
    "x_mm_audio_energy" -> {
      def bd(e: String) =
        s"(strpos('0123456789ABCDEF', substr(h, 2 * ($e) - 1, 1)) * 16 + " +
          s"strpos('0123456789ABCDEF', substr(h, 2 * ($e), 1)) - 17)"
      def bl(i: Int) = bd(i.toString)
      s"""WITH m AS (SELECT media_id, hex(content) AS h
                     FROM read_parquet('__GRAFT_MEDIA__/*.parquet')
                     WHERE substr(hex(content), 1, 8) = '52494646'),
              w AS (SELECT media_id, h,
                           (${bl(23)} + 256 * ${bl(24)}) AS channels,
                           (${bl(41)} + 256 * ${bl(42)} +
                            65536 * ${bl(43)} + 16777216 * ${bl(44)})
                             AS data_size
                    FROM m),
              s AS (SELECT media_id, channels, h,
                           unnest(generate_series(0,
                             CAST(data_size // 2 - 1 AS BIGINT)))
                             AS i
                    FROM w),
              v AS (SELECT media_id, channels, i,
                           (${bd("45 + 2 * i")} +
                            256 * ${bd("46 + 2 * i")}) AS raw
                    FROM s),
              e AS (SELECT media_id, (i // channels) // 16 AS win,
                           CASE WHEN raw >= 32768 THEN raw - 65536
                                ELSE raw END AS sv
                    FROM v)
         SELECT media_id, CAST(win AS BIGINT) AS win,
                CAST(count(*) AS BIGINT) AS n_samples,
                CAST(sum(abs(sv)) AS BIGINT) AS energy
         FROM e GROUP BY 1, 2
         ORDER BY media_id, win"""
    },

    // floor() before the INT cast: DuckDB CAST(double AS INT) rounds,
    // Spark's .cast("int") truncates — floor aligns them (dims > 0)
    "x_mm_resize" ->
      s"""SELECT media_id,
                 CAST(floor(width /
                   greatest(greatest(width, height) * 1.0 / 8, 1.0))
                   AS INT) AS out_width,
                 CAST(floor(height /
                   greatest(greatest(width, height) * 1.0 / 8, 1.0))
                   AS INT) AS out_height
          FROM ($mmDecodedBody) d
          WHERE width > 0 AND height > 0
          ORDER BY media_id""")
}
