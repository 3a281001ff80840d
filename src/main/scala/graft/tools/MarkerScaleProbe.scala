package graft.tools

import graft.operators.StagedCommit
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** MARKER-GROWTH probe (VERDICT r17 #3): `_delta_*_SUCCESS` markers
  * accumulate O(total appends ever) per artifact — compaction folds
  * DATA files but deliberately preserves markers (they are the
  * redelivery fence) — and every [[StagedCommit.readCommitted]] pays
  * one `listStatus` of the artifact root that enumerates them. Is
  * that listing cost material at 10⁴ markers, or is the named
  * escalation (fold old markers into a committed-token manifest file
  * keeping the newest K) unnecessary bookkeeping?
  *
  * Synthetic artifact: a small committed parquet table plus N planted
  * marker files (the exact shape a long-tailed compacted index
  * reaches). Legs at N = 100 / 1,000 / 10,000:
  *   - `resolve` — readCommitted DataFrame construction (the listing
  *     + token-set probe every committed read pays);
  *   - `read` — resolve + count() action.
  *
  * Usage: `runMain graft.tools.MarkerScaleProbe [runs]`. */
object MarkerScaleProbe {
  def main(args: Array[String]): Unit = {
    val runs = if (args.length > 0) args(0).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def timed[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    (1 to runs).foreach { run =>
      Seq(100, 1000, 10000).foreach { n =>
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft_markerprobe_$n").toString
        val p = new org.apache.hadoop.fs.Path(dir)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        (1L to 50L).map(i => (i, s"row $i")).toDF("k", "v")
          .coalesce(2).write.mode("overwrite").parquet(dir)
        // plant N committed-token markers (each with one tiny delta
        // file so readCommitted's keep-set stays realistic)
        (1 to n).foreach { i =>
          fs.create(new org.apache.hadoop.fs.Path(p,
            s"_delta_tok${i}_SUCCESS"), true).close()
        }
        StagedCommit.appendOnce(dir, "tok1_real", Seq.empty,
          Seq((999L, "delta row")).toDF("k", "v"))
        val resolveSecs = timed { StagedCommit.readCommitted(spark, dir) }
        val readSecs = timed {
          StagedCommit.readCommitted(spark, dir).count()
        }
        println(f"[markerprobe] run$run markers=$n " +
          f"resolve=$resolveSecs%.4f read=$readSecs%.3f")
        org.apache.commons.io.FileUtils
          .deleteDirectory(new java.io.File(dir))
      }
    }
    spark.stop()
  }
}
