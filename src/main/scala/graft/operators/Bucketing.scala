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

  /** [[writeBucketed]] with a DURABLE, cross-session layout: Spark
    * keeps bucket metadata only in the catalog entry, so a fresh
    * session reading the files by path loses the co-location; this
    * variant expresses the layout as idempotent DDL (`CLUSTERED BY …
    * SORTED BY … LOCATION`) that any session can re-issue to re-bind
    * the catalog entry to the files already on disk. Build-once, same
    * contract as the index artifacts: the catalog entry is (re)created
    * if absent, the data written only when the location lacks a
    * `_SUCCESS`. Rows are repartitioned INTO the bucket count on write
    * (Spark's own bucket hash, so each task owns exactly one bucket):
    * one file per bucket is precisely the condition under which Spark
    * trusts the sort metadata and can skip join-side sorts too. The
    * bucket function is Spark Murmur3 — NOT portable; other engines
    * read the files as plain parquet (content is engine-neutral, only
    * the co-location is Spark's). */
  def ensureBucketedTable(spark: org.apache.spark.sql.SparkSession,
                          table: String, src: => DataFrame,
                          bucketCol: String, buckets: Int,
                          path: String): Unit = {
    require(buckets >= 1, s"buckets must be positive: $buckets")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val loaded = fs.exists(new org.apache.hadoop.fs.Path(path, "_SUCCESS"))
    if (!spark.catalog.tableExists(table)) {
      val ddl = src.schema.toDDL
      spark.sql(
        s"""CREATE TABLE $table ($ddl) USING parquet
            CLUSTERED BY ($bucketCol) SORTED BY ($bucketCol)
            INTO $buckets BUCKETS
            LOCATION '$path'""")
    } else {
      // refuse loudly on a layout mismatch: a pre-existing entry with a
      // different bucket spec or location would silently serve the
      // WRONG co-location (joins "work" but shuffle, or read another
      // table's files) — the silent-wrong-results class this repo
      // guards everywhere else
      val shown = spark.sql(s"SHOW CREATE TABLE $table")
        .head().getString(0)
      val clusterOk = shown.contains(s"CLUSTERED BY ($bucketCol)") ||
        shown.contains(s"CLUSTERED BY (`$bucketCol`)")
      require(shown.contains(s"INTO $buckets BUCKETS") && clusterOk,
        s"table $table exists with a different bucket layout than " +
          s"requested (CLUSTERED BY ($bucketCol) INTO $buckets BUCKETS)" +
          s" — drop it or use a new name:\n$shown")
      require(shown.contains(path),
        s"table $table exists bound to a different location than " +
          s"'$path' — drop it or use a new name:\n$shown")
    }
    if (!loaded)
      src.repartition(buckets, org.apache.spark.sql.functions.col(bucketCol))
        .write.mode("overwrite").insertInto(table)
  }

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
