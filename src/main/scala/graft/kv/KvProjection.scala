package graft.kv

import graft.operators.Ids
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** EP2 (SURVEY §3): the reference's DynamoDB import path — add a dense
  * 1-based `AutoID` surrogate (`3. loading-lambda-for-dynamodb.py:389-393`),
  * write the primary layout, and maintain the GSI
  * ((`Date` HASH, `GEO` RANGE) projecting `Products,VALUE,STATUS`,
  * `R3:243-269`) as a second sorted, column-pruned copy.
  *
  * Spark reading of "GSI": there is no index object — the secondary copy
  * IS the index. It is repartitioned by the hash key and sorted by
  * (hash, range) within files, so a point/range query prunes on the
  * `Date` partition and range-scans `GEO` inside it; only the projected
  * columns are stored, so the scan reads nothing else.
  */
final class KvProjection(spark: SparkSession, basePath: String) {

  private def mainPath = s"$basePath/kv_main"
  private def gsiPath = s"$basePath/kv_gsi"

  /** Drop-and-recreate import (`R3:517-569` semantics, synchronous in
    * Spark): primary keyed by AutoID, GSI keyed (Date, GEO). */
  def importTable(df: DataFrame, dateCol: String = "Date",
                  geoCol: String = "GEO",
                  projection: Seq[String] = Seq("Products", "VALUE", "STATUS")): Unit = {
    val withId = Ids.withDenseId(df, "AutoID",
      Seq(col(dateCol), col(geoCol)) ++
        df.columns.filterNot(c => c == dateCol || c == geoCol).map(col).take(1))
    withId.write.mode(SaveMode.Overwrite).parquet(mainPath)
    spark.read.parquet(mainPath)
      .select((Seq(dateCol, geoCol) ++ projection).map(col): _*)
      .repartition(col(dateCol))
      .sortWithinPartitions(col(dateCol), col(geoCol))
      .write.mode(SaveMode.Overwrite).parquet(gsiPath)
  }

  def main(): DataFrame = spark.read.parquet(mainPath)
  def gsi(): DataFrame = spark.read.parquet(gsiPath)

  /** J4: point lookup by surrogate key. */
  def pointLookup(autoId: Long): DataFrame =
    main().filter(col("AutoID") === autoId)

  /** J4: GSI query — equi on hash key, range on sort key (`R3:243-269`). */
  def gsiQuery(date: String, geoFrom: String, geoTo: String): DataFrame =
    gsi().filter(col("Date") === date && col("GEO").between(geoFrom, geoTo))
}
