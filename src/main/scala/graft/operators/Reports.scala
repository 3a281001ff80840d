package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A3/A4 (SURVEY §2.4): the reference's report-building stored procedures,
  * re-expressed as declarative DataFrame builds.
  *
  *  - `reportBase` ≈ `sp_reporting_50_general_table_for_report_building`
  *    (`2.2 loading-lambda-for-mysql.py:381-414`): denormalize the fact
  *    table against its dimensions into one wide report-ready frame.
  *  - `priceByPeriodGeoCategory` ≈
  *    `sp_reporting_1_price_by_year_month_geo_category`
  *    (`R22:416-447`): filter by year/month/geo-list/category, group, and
  *    average the measure. Multi-value params arrive comma-joined in the
  *    reference; here they are Seq[String].
  *
  * Scale: dimensions (nation/region/customer at TPC-H ratios) are tiny
  * next to the fact table — broadcast them so the fact side never
  * shuffles; aggregation is partial (map-side combine) by construction.
  * Measures are summed as DECIMAL (exact, order-independent) and emitted
  * as DOUBLE, so results are bit-identical across engines and runs.
  */
object Reports {

  /** Wide denormalized report base over the TESTDATA star schema. */
  def reportBase(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                 nation: DataFrame, region: DataFrame): DataFrame =
    lineitem
      .join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
      .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("o_orderdate"), col("o_orderstatus"),
        col("n_name").as("geo"), col("r_name").as("region"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        (col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
          .cast("double").as("revenue"))

  /** Parameterized report: average measure by (year, month, geo, category).
    * `geos` empty ⟹ no geo filter (reference passes 'Canada' or a
    * comma-list). */
  def priceByPeriodGeoCategory(base: DataFrame, yearParam: Int,
                               geos: Seq[String]): DataFrame = {
    // year(col)=Y as a half-open range: identical semantics, but the
    // range predicate pushes into the parquet scan (min/max row-group
    // pruning) where a function-wrapped column cannot
    val filtered = base
      .filter(col("o_orderdate") >= lit(s"$yearParam-01-01").cast("timestamp") &&
        col("o_orderdate") < lit(s"${yearParam + 1}-01-01").cast("timestamp"))
      .filter(if (geos.isEmpty) lit(true) else col("geo").isin(geos: _*))
    filtered
      .groupBy(year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        col("geo"), col("o_orderstatus").as("category"))
      .agg(
        (sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double") /
          count(lit(1)).cast("double")).as("avg_price"),
        sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("total_qty"),
        count(lit(1)).as("n"))
  }
}
