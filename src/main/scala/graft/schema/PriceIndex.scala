package graft.schema

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's canonical dataset: the StatCan CPI extract — 15 columns,
  * fixed order, enforced twice in the loader (`2.2
  * loading-lambda-for-mysql.py:501,538`). SURVEY §1.2/§1.3.
  *
  * The reference loads everything stringly; we type the columns whose
  * semantics are visible at the call sites: `Date` is month-granularity
  * (report filters by year/month, `R22:421-424`), `VALUE` is the measure
  * (`R22:424`), `UOM_ID/SCALAR_ID/DECIMALS` are StatCan int ids.
  */
object PriceIndex {

  /** Fixed column order (`R22:538`). */
  val columnList: Seq[String] = Seq(
    "Date", "GEO", "DGUID", "Products", "UOM", "UOM_ID", "SCALAR_FACTOR",
    "SCALAR_ID", "VECTOR", "COORDINATE", "VALUE", "STATUS", "SYMBOL",
    "TERMINATED", "DECIMALS")

  /** Natural key: the DynamoDB pre-surrogate PK (`3.
    * loading-lambda-for-dynamodb.py:190-194`) — upserts merge on it. */
  val naturalKey: Seq[String] = Seq("Date", "GEO", "Products")

  /** Raw-ingest schema: everything string (the CSV is stringly), plus a
    * corrupt-record column for `maxerrors_allowed`-style accounting. */
  val corruptCol = "_corrupt_record"

  val rawSchema: StructType = StructType(
    columnList.map(StructField(_, StringType, nullable = true)) :+
      StructField(corruptCol, StringType, nullable = true))

  /** Typed schema after `typed()`. */
  val typedSchema: StructType = StructType(Seq(
    StructField("Date", DateType),
    StructField("GEO", StringType),
    StructField("DGUID", StringType),
    StructField("Products", StringType),
    StructField("UOM", StringType),
    StructField("UOM_ID", IntegerType),
    StructField("SCALAR_FACTOR", StringType),
    StructField("SCALAR_ID", IntegerType),
    StructField("VECTOR", StringType),
    StructField("COORDINATE", StringType),
    StructField("VALUE", DecimalType(18, 4)),
    StructField("STATUS", StringType),
    StructField("SYMBOL", StringType),
    StructField("TERMINATED", StringType),
    StructField("DECIMALS", IntegerType)))

  /** P1: re-project to canonical order, dropping extra columns; missing
    * columns surface as nulls only if `strict` is false, else error —
    * mirrors the loader's defensive `data[column_list]` (`R22:534-539`). */
  def project(df: DataFrame, strict: Boolean = true): DataFrame = {
    val present = df.columns.toSet
    val missing = columnList.filterNot(present)
    if (strict)
      require(missing.isEmpty, s"missing canonical columns: $missing")
    df.select(columnList.map(c =>
      if (present(c)) col(c) else lit(null).cast(StringType).as(c)): _*)
  }

  /** Parse the stringly frame into the typed schema. `Date` accepts
    * `yyyy-MM` (StatCan month granularity → first of month) and full
    * `yyyy-MM-dd`. Unparseable ints/decimals/dates become null (the
    * STATUS/SYMBOL columns exist precisely because StatCan suppresses
    * values) — `try_to_date`/`try_cast`, because under ANSI mode (the
    * Spark 4 default) the plain forms THROW on the first suppressed or
    * day-granularity value instead of honoring this contract. */
  def typed(df: DataFrame): DataFrame =
    df.select(
      coalesce(try_to_date(col("Date"), "yyyy-MM"),
        try_to_date(col("Date"), "yyyy-MM-dd")).as("Date"),
      col("GEO"), col("DGUID"), col("Products"), col("UOM"),
      col("UOM_ID").try_cast(IntegerType).as("UOM_ID"),
      col("SCALAR_FACTOR"),
      col("SCALAR_ID").try_cast(IntegerType).as("SCALAR_ID"),
      col("VECTOR"), col("COORDINATE"),
      col("VALUE").try_cast(DecimalType(18, 4)).as("VALUE"),
      col("STATUS"), col("SYMBOL"), col("TERMINATED"),
      col("DECIMALS").try_cast(IntegerType).as("DECIMALS"))
}
