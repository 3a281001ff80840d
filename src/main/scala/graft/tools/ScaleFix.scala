package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, IvfIndex}

/** Measures the scale-probe's one confirmed super-linear family and its
  * fix (SCALE.md "Scale probe"): pairwise embedding dedup blocked by a
  * FIXED set of blocks (the 10 corpus labels — per-block population
  * grows with the corpus, so work grows ~quadratically) versus blocked
  * by LEARNED k-means cells with k ∝ √n (per-cell population stays
  * ~constant, so work stays ~linear — the SemDeDup blocking and the
  * FAISS cell-count rule). Prints one JSON line with both timings so
  * the numbers in SCALE.md are reproducible:
  * `runmain.sh graft.tools.ScaleFix <sfDir> [threshold]`.
  */
object ScaleFix {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ScaleFix <sfDir> [threshold]")
    val dir = args(0)
    val threshold = if (args.length > 1) args(1).toDouble else 0.3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = graft.Tables.load(spark, dir, "embeddings")
    val n = emb.count()
    val k = math.max(8, math.ceil(math.sqrt(n.toDouble)).toInt)

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = f
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    // fixed-block baseline: the 10 labels, however big the corpus
    val (tLabel, nLabel) = time {
      Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", "label",
        threshold).count()
    }

    // learned cells, k ~ sqrt(n): build cost charged to the build-once
    // index (reported separately), pair cost per-cell-bounded
    val base = java.nio.file.Files
      .createTempDirectory("graft_scalefix").toString
    val idx = new IvfIndex(spark, base)
    val (tBuild, _) = time {
      idx.build(emb, "vec_id", "embedding", k = k, iters = 3); 0L
    }
    val cells = idx.cells().select(col("vec_id"), col("embedding"),
      col("cell"))
    val (tCell, nCell) = time {
      Dedup.embeddingNearDupPairs(cells, "vec_id", "embedding", "cell",
        threshold).count()
    }
    println(s"""{"dir":"$dir","n":$n,"k":$k,"threshold":$threshold,""" +
      s""""label_blocked_sec":${f"$tLabel%.3f"},"label_pairs":$nLabel,""" +
      s""""cell_build_sec":${f"$tBuild%.3f"},""" +
      s""""cell_blocked_sec":${f"$tCell%.3f"},"cell_pairs":$nCell}""")
    spark.stop()
  }
}
