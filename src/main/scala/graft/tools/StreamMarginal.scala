package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** STREAM FIXED-COST PROBE (r22, VERDICT r21 #1 "measure first"): the
  * x_stream family is the board's largest floor block (68.8 s across
  * 29 gates) and was adjudicated startup-dominated without a measured
  * curve. This probe times real Structured-Streaming drains over a
  * synthetic parquet backlog at a grid of (files-per-drain,
  * rows-per-file) and separates:
  *
  *   - per-DRAIN startup: query start/stop, checkpoint+WAL init,
  *     source dir listing (the files=1, rows=minimal corner);
  *   - per-BATCH fixed cost: offset log + commit log write, microbatch
  *     planning (slope along the files axis at fixed rows);
  *   - per-ROW cost: slope along the rows axis at fixed files.
  *
  * Two consumer shapes: `noop` (foreachBatch counts the batch — pure
  * streaming machinery) and `merge` (foreachBatch runs the manifested
  * CDC apply, the substrate most x_stream gates drain through) — the
  * difference attributes gate cost to Spark's streaming fixed overhead
  * vs the repo's own merge substrate.
  *
  * Each (shape, files, rows) cell: 1 untimed warmup drain (fresh dirs)
  * then median of 3 timed drains, each on FRESH input/checkpoint/sink
  * dirs — a drain is the unit the gates pay, so every sample carries
  * the full startup. Prints one JSON line.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.StreamMarginal"
  */
object StreamMarginal {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftExtensions.install(spark)
    val root = java.nio.file.Files
      .createTempDirectory("graft_stream_marginal").toString
    var caseId = 0

    def mkInput(dir: String, files: Int, rows: Int): Unit =
      (0 until files).foreach { f =>
        spark.range(rows.toLong)
          .select((col("id") + f.toLong * rows).as("k"),
            (col("id") % 97).cast("double").as("v"),
            lit(1L).as("ver"), lit("upsert").as("op"),
            (col("id") % 5).cast("string").as("part"))
          .coalesce(1).write.mode("append").parquet(dir)
      }

    val sch = org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, v DOUBLE, ver BIGINT, op STRING, part STRING")

    def drainOnce(shape: String, files: Int, rows: Int): Double = {
      caseId += 1
      val work = s"$root/c$caseId"
      val in = s"$work/in"
      mkInput(in, files, rows)
      val stream = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1).parquet(in)
      val t0 = System.nanoTime()
      val q = shape match {
        case "noop" =>
          stream.writeStream
            .option("checkpointLocation", s"$work/ckpt")
            .trigger(Trigger.AvailableNow())
            .foreachBatch { (b: DataFrame, _: Long) =>
              b.agg(count(lit(1))).head(); ()
            }.start()
        case "merge" =>
          graft.streaming.MergeSink.startCdc(stream, s"$work/tbl",
            Seq("part", "k"), "part", "ver", "op", s"$work/ckpt")
      }
      if (!q.awaitTermination(300000L)) {
        q.stop(); throw new IllegalStateException("probe drain hung")
      }
      val sec = (System.nanoTime() - t0) / 1e9
      rmTree(work)
      sec
    }

    def cell(shape: String, files: Int, rows: Int): Double = {
      drainOnce(shape, files, rows) // warmup (JIT, codegen, footers)
      val ss = (1 to 3).map(_ => drainOnce(shape, files, rows)).sorted
      ss(1)
    }

    val grid = for {
      shape <- Seq("noop", "merge")
      files <- Seq(1, 4, 8)
      rows <- Seq(1000, 4000, 10000)
    } yield {
      val sec = cell(shape, files, rows)
      System.err.println(
        f"[stream_marginal] $shape files=$files rows=$rows sec=$sec%.3f")
      (shape, files, rows, sec)
    }
    // derived marginals per shape, at the grid edges
    def m(shape: String, f: Int, r: Int): Double =
      grid.find(g => g._1 == shape && g._2 == f && g._3 == r).get._4
    def fit(shape: String): String = {
      val startup = m(shape, 1, 1000)
      val perBatch = (m(shape, 8, 1000) - m(shape, 1, 1000)) / 7.0
      val perRow10k = (m(shape, 1, 10000) - m(shape, 1, 1000)) / 9000.0
      f""""$shape":{"startup_sec":$startup%.3f,"per_batch_sec":$perBatch%.3f,"per_krow_sec":${perRow10k * 1000}%.4f}"""
    }
    val cells = grid.map { case (s, f, r, sec) =>
      f""""${s}_f${f}_r$r":$sec%.3f""" }.mkString(",")
    println(s"""{"cells":{$cells},${fit("noop")},${fit("merge")},"cpus":$cpus}""")
    rmTree(root)
    spark.stop()
  }

  private def rmTree(p: String): Unit = {
    val f = java.nio.file.Paths.get(p)
    if (java.nio.file.Files.isDirectory(f,
        java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      val children = java.nio.file.Files.list(f)
      try children.forEach(c => rmTree(c.toString))
      finally children.close()
    }
    java.nio.file.Files.deleteIfExists(f)
  }
}
