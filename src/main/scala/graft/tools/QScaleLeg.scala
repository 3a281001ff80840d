package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 SCALE LEG for the data-shaped TPC-H-style q-family (VERDICT
  * r19 #8): the streaming spine is probe-proven startup-dominated, but
  * q1/q2/q3/q9 are real scan/join/agg gates whose cost is the DATA —
  * and q2/q3 were the official r19 bench's only multi-second
  * isolation survivors. Time them at sf0.1 and at a synthetic 10×
  * (sf1-equivalent) and demand near-linear-or-better scaling; a
  * super-linear gate names a plan problem (a broadcast that stopped
  * fitting, a shuffle that skewed), not machine weather.
  *
  * The 10× corpus under `work/sf1synthq` replicates EVERY table the
  * gates touch with CONSISTENTLY SHIFTED keys per key domain
  * (orderkey/custkey/partkey/suppkey each shifted by
  * `i × (maxKey+1)` in replica i, on both fact and dimension sides),
  * so join selectivities and group cardinalities scale exactly as a
  * real sf1 would: 10× lineitem/orders mass AND 10× customer/part/
  * supplier cardinality, never duplicate keys that would inflate join
  * fan-out. nation/region copy verbatim (fixed at every TPC-H SF).
  *
  * Protocol per gate and scale: 1 untimed warmup, then median of 3 —
  * the ratio is data-shaped cost, not JIT or parquet-footer warmup.
  *
  * Usage: `runMain graft.tools.QScaleLeg [gates,comma-sep]`. */
object QScaleLeg {
  def main(args: Array[String]): Unit = {
    val gates =
      if (args.nonEmpty) args(0).split(",").toSeq.map(_.trim)
      else Seq("q1_pricing_summary", "q2_min_cost_supplier",
        "q3_shipping_priority", "q9_product_profit")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    val synth = new java.io.File("work/sf1synthq").getAbsolutePath
    val factor = 10
    val allTables = Seq("lineitem", "orders", "customer", "part",
      "supplier", "nation", "region")
    // guard on EVERY table's COMPLETION marker, not bare dir
    // existence (ADVICE r20): Spark creates the output dir before the
    // minutes-long write completes, so a crashed generation leaves
    // existing-but-partial dirs — `_SUCCESS` only lands when that
    // table's write committed, so a torn corpus always regenerates
    if (!allTables.forall(tn =>
        new java.io.File(s"$synth/$tn.parquet/_SUCCESS").exists())) {
      // one shift unit per key DOMAIN, shared by every table that
      // stores the key — replica i's orders join replica i's lineitem
      // and nobody else's
      def maxOf(table: String, c: String): Long =
        graft.Tables.load(spark, src, table)
          .agg(max(col(c).cast("long"))).head().getLong(0) + 1
      val unit = Map(
        "order" -> maxOf("orders", "o_orderkey"),
        "cust" -> maxOf("customer", "c_custkey"),
        "part" -> maxOf("part", "p_partkey"),
        "supp" -> maxOf("supplier", "s_suppkey"))
      def replicate(table: String, shifts: Map[String, String]): Unit = {
        val base = graft.Tables.load(spark, src, table)
        val types = base.schema.fields.map(f => f.name -> f.dataType).toMap
        (0 until factor).map { i =>
          shifts.foldLeft(base) { case (df, (c, dom)) =>
            df.withColumn(c, (col(c) + lit(i * unit(dom)))
              .cast(types(c)))
          }
        }.reduce(_ unionByName _)
          .write.mode("overwrite").parquet(s"$synth/$table.parquet")
      }
      replicate("lineitem", Map("l_orderkey" -> "order",
        "l_partkey" -> "part", "l_suppkey" -> "supp"))
      replicate("orders", Map("o_orderkey" -> "order",
        "o_custkey" -> "cust"))
      replicate("customer", Map("c_custkey" -> "cust"))
      replicate("part", Map("p_partkey" -> "part"))
      replicate("supplier", Map("s_suppkey" -> "supp"))
      Seq("nation", "region").foreach { tname =>
        graft.Tables.load(spark, src, tname)
          .write.mode("overwrite").parquet(s"$synth/$tname.parquet")
      }
    }
    def timeGate(name: String, dir: String): Double = {
      def once(): Double = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup
      val ss = (1 to 3).map(_ => once()).sorted
      ss(1)
    }
    gates.foreach { g =>
      val t01 = timeGate(g, src)
      val t1 = timeGate(g, synth)
      println(f"[qscaleleg] gate=$g sf01=$t01%.2f sf1x10=$t1%.2f " +
        f"ratio=${t1 / t01}%.2f perdata=${t1 / t01 / factor}%.3f")
    }
    spark.stop()
  }
}
