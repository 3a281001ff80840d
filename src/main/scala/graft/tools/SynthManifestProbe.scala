package graft.tools

import graft.operators.Upsert
import org.apache.spark.sql.SparkSession

/** METADATA-PLANE probe at 10⁶ dirs (the width the r18 verdict named
  * as "first thing a real 100 TB deployment hits"): manifested-table
  * RESOLUTION never stats a data file — `#files` inventories feed
  * `ManifestFileIndex` directly — so a manifest tree with FABRICATED
  * inventories measures the true metadata cost at widths where
  * materializing real data would take hours. Publishes a sharded
  * manifest of N synthetic (entry, #stats, #files) triples through
  * the real `EpochManifest.publish` (so leaf sharding, root
  * aggregates, and the CAS are all the production path), then times:
  *
  *   - `parse` — `manifestedEpoch` (root-only);
  *   - `resolveFull` — `readManifested` DataFrame construction
  *     (root + ALL leaves, parallel reads + O(N) line parse — the one
  *     inherently O(N) leg);
  *   - `resolvePruned` — `readManifestedPartitions` for one value
  *     (root + one bucket).
  *
  * Usage: `runMain graft.tools.SynthManifestProbe [dirs,dirs,...]`. */
object SynthManifestProbe {
  def main(args: Array[String]): Unit = {
    val dirCounts =
      if (args.nonEmpty) args(0).split(",").toSeq.map(_.trim.toInt)
      else Seq(100000, 1000000)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    dirCounts.foreach { n =>
      val work = java.nio.file.Files
        .createTempDirectory(s"graft_synthman_$n").toString
      val path = s"$work/tbl"
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val lines = Seq("#ddl\tpt STRING,k BIGINT,v DOUBLE,ver BIGINT") ++
        (0 until n).iterator.flatMap { i =>
          val d = f"pt=p$i%07d"
          Seq(s"$d\t0",
            s"#stats\t$d\tv\t$i\t$i",
            s"#files\t$d\t0\tpart-00000-synthetic.c000.snappy.parquet:4096")
        }.toSeq
      val publishSecs = timed {
        Upsert.EpochManifest.publish(fs, root, 0, lines)
      }
      val rootLen = fs.getFileStatus(
        new org.apache.hadoop.fs.Path(path, "_manifest_0")).getLen
      val parseSecs = timed {
        assert(Upsert.manifestedEpoch(spark, path).contains(0L))
      }
      val resolveFullSecs = timed {
        Upsert.readManifested(spark, path)
      }
      val resolvePrunedSecs = timed {
        Upsert.readManifestedPartitions(spark, path, Seq("p0000007"))
      }
      println(f"[synthman] dirs=$n publish=$publishSecs%.2f " +
        f"parse=$parseSecs%.3f resolveFull=$resolveFullSecs%.3f " +
        f"resolvePruned=$resolvePrunedSecs%.3f rootBytes=$rootLen")
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(work))
    }
    spark.stop()
  }
}
