package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Co-located joins via bucketing (SCALE.md "minimize shuffles"): two
  * tables bucketed and sorted on their join key with the same bucket
  * count join with NO exchange on either side — the shuffle is paid once
  * at write time and amortized over every subsequent join/aggregation on
  * that key. At 100 TB this converts the recurring fact-fact shuffle
  * (the single largest cost in the report-base build) into a local merge
  * per bucket.
  *
  * Plain-parquet Spark keeps bucket metadata in the session catalog
  * (`saveAsTable`) — paths alone cannot carry it.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
                    numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(tableName)

  /** True iff the executed plan of `df` contains no shuffle exchange —
    * the assertion that bucketing actually short-circuited the shuffle. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange")
}
