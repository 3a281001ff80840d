package graft.tools

import graft.operators.Upsert
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SHARDED-MANIFEST scale probe (VERDICT r18 #1): with the manifest
  * file tree, BOTH manifest-plane sides must stay near-flat in live
  * partition count — the publish of a one-partition merge rewrites
  * O(touched buckets) leaf files plus a root of O(256) lines (never
  * the O(live partitions) text the single-file form rewrote), and
  * resolution parses the same sharded mass it always logically did,
  * but a pruned read now loads only its buckets.
  *
  * Legs per dir count (default 8000 and 100000):
  *   - `setup` — initial full merge creating N one-row partitions
  *     (table construction, not the measured plane; reported for
  *     context);
  *   - `mergeOne` — a one-partition merge against the N-partition
  *     table: THE criterion leg (r18 measured 1.19 s at 8000 dirs on
  *     the single-file form, with ~170 MB text projected at 10⁶);
  *   - `manifestParse` / `resolveFull` / `resolvePruned` /
  *     `readPruned` — the r18 probe's read legs, unchanged meaning;
  *   - `rootBytes` / `leaves` / `leafBytes` / `leavesRewritten` —
  *     tree shape evidence: the one-partition merge must rewrite
  *     exactly its touched bucket's leaf (leavesRewritten ≈ 1).
  *
  * Usage: `runMain graft.tools.ManifestTreeProbe [dirs,dirs,...]`. */
object ManifestTreeProbe {
  def main(args: Array[String]): Unit = {
    val dirCounts =
      if (args.nonEmpty) args(0).split(",").toSeq.map(_.trim.toInt)
      else Seq(8000, 100000)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val keys = Seq("pt", "k")
    dirCounts.foreach { n =>
      val work = java.nio.file.Files
        .createTempDirectory(s"graft_mtreeprobe_$n").toString
      val path = s"$work/tbl"
      val df = spark.range(n.toLong).select(
        concat(lit("p"), lpad(col("id").cast("string"), 7, "0")).as("pt"),
        col("id").as("k"),
        (col("id") % 97).cast("double").as("v"))
        .withColumn("ver", lit(1L))
      val setupSecs = timed {
        Upsert.mergeIntoManifested(spark, path, df, keys, "pt", "ver",
          retain = 4, statsCols = Seq("v"))
      }
      val onePt = "p" + "0" * 6 + "7"
      var mergeOneSecs = 0.0
      (2 to 3).foreach { v =>
        val batch = df.filter(col("pt") === onePt)
          .withColumn("v", col("v") + lit(v * 1.0))
          .withColumn("ver", lit(v.toLong)).localCheckpoint()
        val secs = timed {
          Upsert.mergeIntoManifested(spark, path, batch, keys, "pt",
            "ver", retain = 4, statsCols = Seq("v"))
        }
        if (v == 3) mergeOneSecs = secs
      }
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val rootFile = fs.listStatus(new org.apache.hadoop.fs.Path(path))
        .filter(_.getPath.getName.matches("_manifest_\\d+"))
        .maxBy(_.getPath.getName.stripPrefix("_manifest_").toInt)
      val rootLines = {
        val in = fs.open(rootFile.getPath)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSeq
        finally in.close()
      }
      require(rootLines.exists(_.startsWith("#leafn\t")),
        s"expected a sharded manifest at $n dirs")
      val curEpoch = rootFile.getPath.getName.stripPrefix("_manifest_")
        .toLong
      val leavesRewritten = rootLines.count(l =>
        l.startsWith("#leaf\t") && l.endsWith(s"\t$curEpoch"))
      val leafDir = new org.apache.hadoop.fs.Path(path, "_mleaf")
      val leafFiles = fs.listStatus(leafDir).toSeq
      val parseSecs = timed {
        assert(Upsert.manifestedEpoch(spark, path).contains(2L))
      }
      val resolveFullSecs = timed {
        Upsert.readManifested(spark, path)
      }
      val resolvePrunedSecs = timed {
        Upsert.readManifestedPartitions(spark, path, Seq(onePt))
      }
      val readPrunedSecs = timed {
        Upsert.readManifestedPartitions(spark, path, Seq(onePt)).count()
      }
      println(f"[mtreeprobe] dirs=$n setup=$setupSecs%.1f " +
        f"mergeOne=$mergeOneSecs%.2f manifestParse=$parseSecs%.3f " +
        f"resolveFull=$resolveFullSecs%.3f " +
        f"resolvePruned=$resolvePrunedSecs%.3f " +
        f"readPruned=$readPrunedSecs%.3f rootBytes=${rootFile.getLen} " +
        f"leaves=${leafFiles.size} leafBytes=${leafFiles.map(_.getLen).sum} " +
        f"leavesRewritten=$leavesRewritten")
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(work))
    }
    spark.stop()
  }
}
