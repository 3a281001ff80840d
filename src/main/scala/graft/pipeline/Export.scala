package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** S2/S9/O1 (SURVEY §2.1/§2.6): export sinks.
  *
  *  - `writeDatePartitioned`: the reference's `data/<today>/<file>` and
  *    `backup/<date>/` layouts (`R1:30-52`, `R21:592-598`) as a
  *    partitioned parquet write — partition pruning replaces directory
  *    convention.
  *  - `writeChunked`: the reference's manual 5 MiB file splitting
  *    (`R21:432-482`) is obsolete under a splittable format; what remains
  *    meaningful at scale is bounding output file size, which is the
  *    writer-level `maxRecordsPerFile` — no extra shuffle, each task
  *    rolls files at the limit.
  *  - `exportReportCsv`: EP3 — single-header CSV like
  *    `mysql --batch --quick > /tmp/x.csv` (`R23:113-123`). coalesce(1)
  *    is intentional: a report is small by construction; do NOT use for
  *    data-scale frames.
  */
object Export {

  def writeDatePartitioned(df: DataFrame, path: String, dateCol: String): Unit =
    df.withColumn("ingest_date", to_date(col(dateCol)))
      .write.mode(SaveMode.Append).partitionBy("ingest_date").parquet(path)

  def writeChunked(df: DataFrame, path: String, maxRecordsPerFile: Long): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)

  def exportReportCsv(report: DataFrame, path: String): Unit =
    report.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(path)
}
