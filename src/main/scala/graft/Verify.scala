package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.install(spark)
    new java.io.File(outDir).mkdirs()
    // comma-separated allowlist for iterating on a few queries locally
    // (mirrors Bench's SPARK_GRAFT_BENCH_ONLY; the driver never sets it)
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      spark.catalog.clearCache() // per-query persists must not accumulate
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Path tokens mark oracle SQL that reads the engine's on-disk
    // artifacts (IVF index for x_sim_ivf_probe, simhash signatures for
    // x_dedup_simhash): resolve them to this run's sf-dir-keyed paths so
    // DuckDB reads the same artifacts the engine just built
    val json = SparkEntry.oracleSql
      .map { case (k, v) =>
        val sql = v
          .replace("__GRAFT_IVF__", SparkEntry.ivfBasePath(sfDir))
          .replace("__GRAFT_SIMHASH__", s"${SparkEntry.artifactBase(sfDir)}/simhash")
          .replace("__GRAFT_MEDIA__", s"${SparkEntry.artifactBase(sfDir)}/media")
          .replace("__GRAFT_LSH__", SparkEntry.lshRowsPath(sfDir))
          .replace("__GRAFT_CMS__",
            s"${SparkEntry.artifactBase(sfDir)}/cms_d4w1024")
          .replace("__GRAFT_PQ__", SparkEntry.pqBasePath(sfDir))
          .replace("__GRAFT_IVFPQ__", SparkEntry.ivfpqBasePath(sfDir))
        s"${q(k)}: ${q(sql)}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
