package graft.tools

import graft.Tables
import graft.operators.Upsert
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** MANIFEST-PLANE scale probe (VERDICT r16 #6): manifest lines grow
  * O(epochs + partitions·stats-cols) and are parsed DRIVER-side per
  * read; resolution additionally lists every referenced partition dir.
  * This probe separates the three read-side legs at x1/x10/x100
  * partition count (~80 → ~8000 dirs):
  *
  *   - `manifestParse` — read + parse the active manifest's lines
  *     ([[Upsert.manifestedEpoch]]: the pure metadata-plane cost every
  *     manifested read pays before any file is touched);
  *   - `resolveFull` — [[Upsert.readManifested]] DataFrame
  *     construction: parse + list ALL referenced dirs. Expected to
  *     grow with dir count — a full-table read resolves every
  *     partition in ANY table format; the question is the constant.
  *   - `resolvePruned` / `readPruned` — [[Upsert.readManifestedPartitions]]
  *     for ONE partition value, resolution and a count() action.
  *     Claim: FLAT in total partition count — the narrow-consumer path
  *     (and, since r17, the MV extremum repair's) never lists the
  *     unrelated mass.
  *
  * Table shape mirrors CdfMvProbe: month partitions, `factor` replicas
  * with distinct months, THREE epochs (initial + two touched-month
  * merges) and a stats column so the manifest carries realistic
  * pmap/stats line volume.
  *
  * Usage: `runMain graft.tools.ManifestScaleProbe <sfDir> [factor] [runs]`. */
object ManifestScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val factor = if (args.length > 1) args(1).toInt else 1
    val runs = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        col("o_totalprice"))
    val maxKey = base.agg(max(col("o_orderkey"))).head().getLong(0)
    val orders =
      if (factor <= 1) base
      else (0 until factor).map { i =>
        if (i == 0) base
        else base.select(
          (col("o_orderkey") + lit(i * (maxKey + 1))).as("o_orderkey"),
          concat(lit(s"r$i-"), col("ym")).as("ym"),
          col("o_totalprice"))
      }.reduce(_ unionByName _)
    val keys = Seq("ym", "o_orderkey")
    def timed[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    (1 to runs).foreach { run =>
      val work = java.nio.file.Files
        .createTempDirectory("graft_manifestprobe").toString
      val path = s"$work/tbl"
      Upsert.mergeIntoManifested(spark, path,
        orders.withColumn("ver", lit(1L)), keys, "ym", "ver",
        retain = 4, statsCols = Seq("o_totalprice"))
      val oneMonth = orders.select(col("ym")).orderBy(col("ym"))
        .head().getString(0)
      // two touched-month merges: epochs 1 and 2, so entry lines
      // reference MIXED epochs and the pmap/stats planes are real.
      // The SECOND one is timed: the PUBLISH-side cost of a one-
      // partition merge against a table of `months` live partitions —
      // the leg that decides whether the manifest's O(live files)
      // text (carried forward verbatim per publish) ever needs the
      // Iceberg-style tree escalation
      var mergeOneMonthSecs = 0.0
      (2 to 3).foreach { v =>
        // materialize the batch FIRST: the factor-replica union scan
        // that produces it is probe scaffolding, not publish cost —
        // timing it inside the merge would misattribute O(factor)
        // input construction to the manifest plane
        val batch = orders.filter(col("ym") === oneMonth)
          .withColumn("o_totalprice", col("o_totalprice") + lit(v * 1.0))
          .withColumn("ver", lit(v.toLong)).localCheckpoint()
        val secs = timed {
          Upsert.mergeIntoManifested(spark, path, batch, keys, "ym",
            "ver", retain = 4, statsCols = Seq("o_totalprice"))
        }
        if (v == 3) mergeOneMonthSecs = secs
      }
      val months = orders.select(col("ym")).distinct().count()
      val manifestBytes = {
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.listStatus(new org.apache.hadoop.fs.Path(path)).toSeq
          .filter(_.getPath.getName.startsWith("_manifest_"))
          .map(_.getLen).max
      }
      val parseSecs = timed {
        assert(Upsert.manifestedEpoch(spark, path).contains(2L))
      }
      val resolveFullSecs = timed {
        Upsert.readManifested(spark, path)
      }
      val resolvePrunedSecs = timed {
        Upsert.readManifestedPartitions(spark, path, Seq(oneMonth))
      }
      val readPrunedSecs = timed {
        Upsert.readManifestedPartitions(spark, path, Seq(oneMonth)).count()
      }
      println(f"[manifestprobe] run$run factor=$factor months=$months " +
        f"manifestParse=$parseSecs%.3f resolveFull=$resolveFullSecs%.3f " +
        f"resolvePruned=$resolvePrunedSecs%.3f readPruned=$readPrunedSecs%.3f " +
        f"mergeOneMonth=$mergeOneMonthSecs%.2f manifestBytes=$manifestBytes")
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(work))
    }
    spark.stop()
  }
}
