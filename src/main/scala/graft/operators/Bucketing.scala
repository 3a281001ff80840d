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

  /** Like [[isShuffleFree]] but tolerant of BroadcastExchange: broadcast
    * dim joins ship the dim to every executor (O(dims), intended), while
    * a shuffle exchange repartitions the fact table (O(data), the thing
    * bucketing exists to eliminate). */
  def isShuffleExchangeFree(df: DataFrame): Boolean = {
    // match any shuffle exchange generically (hash, range, round-robin
    // from repartition(n), single-partition) and carve out only the
    // broadcast variant — enumerating shuffle kinds silently passes the
    // ones not listed
    val p = df.queryExecution.executedPlan.toString
    p.linesIterator.filter(_.contains("Exchange"))
      .forall(_.contains("BroadcastExchange"))
  }

  /** Materialize the star-schema fact tables co-bucketed on the order
    * key: `lineitem ⋈ orders` is the report base's only non-broadcast
    * join, so after this one-time layout the whole report build runs
    * with ZERO fact-side shuffles (see BucketingSpec). At 100 TB this is
    * the difference between re-shuffling ~70 TB of lineitem per report
    * run and a per-bucket local merge. */
  def writeStarLayout(lineitem: DataFrame, orders: DataFrame,
                      numBuckets: Int,
                      lineitemTable: String = "bkt_lineitem",
                      ordersTable: String = "bkt_orders"): Unit = {
    writeBucketed(lineitem, lineitemTable, "l_orderkey", numBuckets)
    writeBucketed(orders, ordersTable, "o_orderkey", numBuckets)
  }
}
