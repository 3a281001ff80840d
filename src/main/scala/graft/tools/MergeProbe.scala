package graft.tools

import graft.Tables
import graft.operators.Upsert
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for [[Upsert.mergeIntoManifested]]: the claim is that
  * an incremental merge's cost tracks its TOUCHED partitions, not the
  * table — manifest dir-level pruning means the untouched mass is
  * never listed, let alone read. Measures, per corpus: the initial
  * full-table build merge (every partition touched — the honest
  * corpus-scaling cost), then a one-month merge (single partition of
  * ~1/80th the rows), then a snapshot read. Run at 1x and 10x: the
  * build scales with the corpus, the touched merge should not.
  *
  * Partitioning: month(o_orderdate) as `ym` (~80 values), key
  * (ym, o_orderkey), max-version-wins on `ver`.
  *
  * Scaling is inline (`factor` replicas with DISTINCT month values and
  * offset keys — the scaleprobe corpora do not scale orders): the
  * table and its partition count grow with the factor while the
  * touched month keeps its original ~1/80th row count, which is
  * exactly the claim's shape.
  *
  * Usage: `runMain graft.tools.MergeProbe <sfDir> [factor] [runs]`. */
object MergeProbe {
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
    val n = orders.count()
    val months = orders.select(col("ym")).distinct().count()
    val oneMonth = orders.select(col("ym")).orderBy(col("ym")).head().getString(0)
    def timed[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val keys = Seq("ym", "o_orderkey")
    (1 to runs).foreach { run =>
      val path = java.nio.file.Files
        .createTempDirectory("graft_mergeprobe").toString + "/tbl"
      val buildSecs = timed {
        Upsert.mergeIntoManifested(spark, path,
          orders.withColumn("ver", lit(1L)), keys, "ym", "ver")
      }
      // materialize the incoming batch: an incremental merge's input
      // arrives as its own small file set, not as a live plan over the
      // whole corpus — without this, every action inside the merge
      // would re-scan the full union and the probe would time the
      // input pipeline, not the merge
      val batchPath = s"${new java.io.File(path).getParent}/batch"
      orders.filter(col("ym") === oneMonth).write.parquet(batchPath)
      val touched = spark.read.parquet(batchPath)
      val touchedRows = touched.count()
      val mergeSecs = timed {
        Upsert.mergeIntoManifested(spark, path,
          touched.withColumn("o_totalprice", col("o_totalprice") + 1.0)
            .withColumn("ver", lit(2L)), keys, "ym", "ver")
      }
      val readSecs = timed {
        assert(Upsert.readManifested(spark, path).count() == n)
      }
      // CHANGE DATA FEED over the merge interval: cost must be bounded
      // by the CHANGED partitions (one month here) — same-epoch dirs
      // are never read — so this leg must stay flat at 10x alongside
      // the touched merge, while build/read/predDelete scale. Timed
      // BEFORE the deletes: they advance the manifest chain and the
      // default retain would sweep epoch 0 out of the interval.
      val cdfSecs = timed {
        Upsert.changesBetween(spark, path, 0, 1, keys).count()
      }
      // KEYED delete (the CDC shape): touched partitions come straight
      // from the key batch — cost must stay flat as the table grows
      val delKeys = touched.filter(col("o_orderkey") % 2 === 0)
        .select(col("ym"), col("o_orderkey"))
      val delKeyRows = delKeys.count()
      val keyedDeleteSecs = timed {
        Upsert.deleteKeysFromManifested(spark, path, delKeys, keys, "ym")
      }
      // PREDICATE delete: must SCAN to find its partitions — honest
      // contrast, scales with the table even for a tiny match set
      val predDeleteSecs = timed {
        Upsert.deleteFromManifested(spark, path,
          col("ym") === oneMonth && col("o_orderkey") % 3 === 0)
      }
      println(f"[mergeprobe] run$run n=$n months=$months " +
        f"build=$buildSecs%.3f touchedRows=$touchedRows " +
        f"oneMonthMerge=$mergeSecs%.3f read=$readSecs%.3f " +
        f"cdf01=$cdfSecs%.3f " +
        f"keyedDelete($delKeyRows)=$keyedDeleteSecs%.3f " +
        f"predDelete=$predDeleteSecs%.3f")
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(path).getParentFile)
    }
    spark.stop()
  }
}
