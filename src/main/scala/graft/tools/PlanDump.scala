package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named gates to plans/<tag>/ files —
  * the before/after plan evidence the optimization rounds commit
  * (guide §1: capture the plan shape, Exchange count, join strategy,
  * PushedFilters/ReadSchema, for every touched query).
  *
  * Usage: SPARK_GRAFT_PLAN_TAG=r21/_before \
  *   sbt "runMain graft.tools.PlanDump x_text_chunks_cdc a16_cms_freq"
  * writes plans/r21/x_text_chunks_cdc_before.txt etc. (tag splits on
  * the last '/': directory prefix + filename suffix).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "r21/_plan")
    val (dirPart, suffix) = {
      val i = tag.lastIndexOf('/')
      if (i < 0) ("plans", "_" + tag)
      else ("plans/" + tag.substring(0, i), tag.substring(i + 1))
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.install(spark)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dirPart))
    args.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown gate $name"))
      val df = fn(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dirPart/$name$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] wrote $dirPart/$name$suffix.txt")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
