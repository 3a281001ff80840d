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
  * Round-20 legs (VERDICT r19 #2 — the two unprobed r19 claims,
  * measured by the LEAVES-LOADED counter, not wall time alone):
  *   - `cdfLeaves` / `cdfSecs` — a CDF poll (`changesBetween`) across
  *     a one-bucket-churned interval must read two roots + the
  *     churned bucket's leaf on each side (counter = 2), never
  *     2×O(width);
  *   - `rangeLeaves` / `rangeSecs` vs `rangeLeavesNoB` /
  *     `rangeSecsNoB` — a selective range read (`readManifestedRange`
  *     on a per-dir-unique stats column, top-5 window: the "recent
  *     data" shape) must load only the buckets whose `#bstats`
  *     aggregate intersects the range; the NoB variant re-runs with
  *     the `#bstats` lines stripped from the root, which loads every
  *     referenced leaf — the counter gap IS the pruning.
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
        (col("id") % 97).cast("double").as("v"),
        // per-dir-unique range column: a top-5 window then matches 5
        // dirs, so at most 5 of 256 bucket aggregates intersect it —
        // the "recent data" selectivity the leaf-tier zone maps exist
        // to exploit (hash bucketing is value-agnostic; only queries
        // empty in most BUCKETS can prune, i.e. ones matching few
        // DIRS)
        col("id").cast("double").as("r"))
        .withColumn("ver", lit(1L))
      val setupSecs = timed {
        Upsert.mergeIntoManifested(spark, path, df, keys, "pt", "ver",
          retain = 4, statsCols = Seq("v", "r"))
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
      val counter = Upsert.EpochManifest.leafReadCount
      // CDF poll across the one-bucket-churned interval (mergeOne
      // touched one partition): two roots + the churned bucket's leaf
      // per side — counter must read 2 regardless of width
      counter.set(0)
      val cdfSecs = timed {
        Upsert.changesBetween(spark, path, curEpoch - 1, curEpoch,
          keys).count()
      }
      val cdfLeaves = counter.get()
      // selective range read with leaf-tier zone maps: top-5 window on
      // the per-dir-unique column. One untimed warmup first — the
      // first range call pays plan/JIT warmup that would bias the
      // pruned-vs-NoB wall comparison (the counter is the criterion
      // either way)
      Upsert.readManifestedRange(spark, path, "r",
        (n - 5).toDouble, n.toDouble).count()
      counter.set(0)
      val rangeSecs = timed {
        assert(Upsert.readManifestedRange(spark, path, "r",
          (n - 5).toDouble, n.toDouble).count() == 5)
      }
      val rangeLeaves = counter.get()
      // the same read with #bstats stripped from the root: every
      // referenced leaf loads (the pre-r19 cost) — rewrite the root
      // text in place (probe table, throwaway)
      val noB = rootLines.filterNot(_.startsWith("#bstats\t"))
      val out = fs.create(rootFile.getPath, true)
      try out.write((noB.mkString("\n") + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      counter.set(0)
      val rangeSecsNoB = timed {
        assert(Upsert.readManifestedRange(spark, path, "r",
          (n - 5).toDouble, n.toDouble).count() == 5)
      }
      val rangeLeavesNoB = counter.get()
      println(f"[mtreeprobe] dirs=$n setup=$setupSecs%.1f " +
        f"mergeOne=$mergeOneSecs%.2f manifestParse=$parseSecs%.3f " +
        f"resolveFull=$resolveFullSecs%.3f " +
        f"resolvePruned=$resolvePrunedSecs%.3f " +
        f"readPruned=$readPrunedSecs%.3f rootBytes=${rootFile.getLen} " +
        f"leaves=${leafFiles.size} leafBytes=${leafFiles.map(_.getLen).sum} " +
        f"leavesRewritten=$leavesRewritten " +
        f"cdfSecs=$cdfSecs%.3f cdfLeaves=$cdfLeaves " +
        f"rangeSecs=$rangeSecs%.3f rangeLeaves=$rangeLeaves " +
        f"rangeSecsNoB=$rangeSecsNoB%.3f rangeLeavesNoB=$rangeLeavesNoB")
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(work))
    }
    spark.stop()
  }
}
