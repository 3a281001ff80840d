package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TESTDATA table loader (TESTDATA.md): one parquet file per table under a
  * scale-factor dir. Scans stay fully declarative so Catalyst pushes filters
  * and prunes columns into the parquet reader (`PushedFilters`/`ReadSchema`
  * visible in `.explain("formatted")`).
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects
      // outright; read it as a nanos-since-epoch long and truncate to a
      // microsecond TimestampType with integer arithmetic (the ns epoch
      // ~1.7e18 overflows double's 2^53 mantissa — no float division).
      // The DuckDB oracle applies the identical truncation via
      // CAST(ts AS TIMESTAMP) (TIMESTAMP_NS -> µs TIMESTAMP).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
}
