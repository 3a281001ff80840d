package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for headline queries so scan
  * pruning (ReadSchema/PushedFilters), broadcast choices and
  * whole-stage-codegen spans can be audited. Not part of the driver
  * contract. Usage: runMain graft.Plans <sfDir> [query ...] */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q1_pricing_summary", "j5_star_join", "a3_report",
        "s4_scan_project", "j2_anti", "x_sim_ivf", "x_dedup_minhash")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
