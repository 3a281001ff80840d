package graft.tools

import graft.pipeline.IngestPipeline
import graft.operators.StagedCommit
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** INCREMENTAL-REPORT scale probe (VERDICT r16 #7): the per-load
  * delta state claims O(loads × changed groups) storage with
  * per-operation costs that must NOT grow with the fact table — and
  * whose load-count growth is exactly what [[IngestPipeline
  * .compactReportState]] folds away. Legs at x1/x10/x30 accumulated
  * load count (fixed delta shape):
  *
  *   - `marginalLoad` — one REAL `load()` (CSV → stage → merge →
  *     report delta) on top of L accumulated state deltas. Claim:
  *     FLAT in L — a load's delta derives from its staged rows and
  *     the permanent table's touched slice, never the state dir.
  *   - `reportFromState` — the parameterized report served from L
  *     deltas. Expected ∝ L file-open cost (why compaction exists).
  *   - `compact` — fold L deltas into one snapshot. Expected ∝ L.
  *   - `reportPostCompact` — the same report after the fold. Claim:
  *     FLAT, back to O(groups).
  *
  * State is accumulated by planting synthetic committed deltas of the
  * exact state schema (the content appendOnce would write), so the
  * probe isolates the state-plane legs instead of paying L real loads
  * per leg; two real loads bracket the plant so the census and merge
  * paths stay honest.
  *
  * Usage: `runMain graft.tools.ReportStateProbe <sfDir> [loads] [runs]`
  * (`sfDir` is unused data-wise — fixtures are synthetic — but kept
  * for CLI symmetry with the other probes). */
object ReportStateProbe {
  def main(args: Array[String]): Unit = {
    val loads = if (args.length > 1) args(1).toInt else 16
    val runs = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val header = graft.schema.PriceIndex.columnList.mkString(",")
    def csvRow(date: String, geo: String, k: Long, v: String) =
      s"$date,$geo,2016A0001,All-items,Units,300,units,0,v$k,1.$k,$v,,,,1"
    def timed[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    (1 to runs).foreach { run =>
      val work = java.nio.file.Files
        .createTempDirectory("graft_reportprobe")
      val wh = work.resolve("wh").toString
      val pipeline = new IngestPipeline(spark, wh,
        incrementalReport = true, reportCompactEvery = 0)
      def writeLoad(name: String, geos: Seq[String]): String = {
        val p = work.resolve(name)
        java.nio.file.Files.writeString(p,
          (header +: geos.zipWithIndex.flatMap { case (g, i) => Seq(
            csvRow("2024-03-01", g, i.toLong, s"${100 + i}.5"),
            csvRow("2024-03-15", g, i.toLong, s"${110 + i}.25")) })
            .mkString("\n"))
        p.toString
      }
      val geos = (1 to 25).map(i => f"G$i%02d")
      // a real first load seeds the permanent table + one real delta
      assert(pipeline.load(writeLoad("priceindex_seed.csv", geos))
        .status == 1)
      // plant L committed synthetic deltas of the exact state schema —
      // fixed group grain (the same 25 geos), values irrelevant to the
      // flatness claims
      val synth = spark.range(25).select(
        lit(2024).as("y"), lit(3).as("m"),
        format_string("G%02d", col("id") + 1).as("geo"),
        lit("All-items").as("category"),
        lit(1L).as("_n"), lit(1L).as("_nv"),
        lit(java.math.BigDecimal.valueOf(100.0)).cast("decimal(38,4)")
          .as("_sum")).coalesce(1).localCheckpoint(true)
      (1 to loads).foreach { i =>
        StagedCommit.appendOnce(s"$wh/report_state", s"synth_$i",
          Seq.empty, synth)
      }
      // leg 1: the marginal real load on top of L accumulated deltas
      val marginalSecs = timed {
        assert(pipeline.load(writeLoad("priceindex_marginal.csv", geos))
          .status == 1)
      }
      val reportDir = work.resolve("report").toString
      val reportSecs = timed {
        pipeline.buildAndExportReport(2024, 3, Seq.empty, "", reportDir)
          .count()
      }
      val compactSecs = timed(pipeline.compactReportState())
      val reportPostSecs = timed {
        pipeline.buildAndExportReport(2024, 3, Seq.empty, "",
          work.resolve("report2").toString).count()
      }
      println(f"[reportprobe] run$run loads=$loads " +
        f"marginalLoad=$marginalSecs%.3f reportFromState=$reportSecs%.3f " +
        f"compact=$compactSecs%.3f reportPostCompact=$reportPostSecs%.3f")
      org.apache.commons.io.FileUtils
        .deleteDirectory(work.toFile)
    }
    spark.stop()
  }
}
