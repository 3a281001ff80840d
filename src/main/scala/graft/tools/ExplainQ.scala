package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of named `SparkEntry.queries`
  * entries — the feedback loop for "explain and iterate until it's the
  * plan you'd want". Not part of the engine surface; run with
  * `sbt "runMain graft.tools.ExplainQ <sfDir> <q1,q2,...>"`. */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.lift(1).map(_.split(",").map(_.trim).toSeq)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftExtensions.install(spark)
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
