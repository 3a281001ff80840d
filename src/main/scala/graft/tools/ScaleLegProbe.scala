package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** sf1 SCALE LEG for the streaming e2e spine (VERDICT r18 #5): the
  * top-floor gates are claimed startup-dominated at sf0.1 — prove it
  * at 10× the data, or name the data-shaped hotspot.
  *
  * Builds a synthetic 10× directory under `work/sf1synth` from
  * sf0.1 — `orders` and `embeddings` replicated with id-shifted keys
  * (real cardinality growth, not duplicate keys a merge would dedup
  * away), `nation` copied (fixed 25 rows at every TPC-H SF — which
  * already tells us `x_stream_ingest_e2e_mv`'s INPUT is SF-invariant
  * by gate construction: its waves are synthesized from nations) —
  * then times three gates at sf0.1 vs the 10× dir:
  *
  *   - `x_stream_ingest_e2e_mv`   (input SF-invariant; expect flat)
  *   - `x_stream_replicate_evolve` (orders-derived; the real leg)
  *   - `x_sim_lsh_cdc`             (embeddings-derived; the real leg)
  *
  * Usage: `runMain graft.tools.ScaleLegProbe [gates,comma-sep]`. */
object ScaleLegProbe {
  def main(args: Array[String]): Unit = {
    val gates =
      if (args.nonEmpty) args(0).split(",").toSeq.map(_.trim)
      else Seq("x_stream_ingest_e2e_mv", "x_stream_replicate_evolve",
        "x_sim_lsh_cdc")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    val synth = new java.io.File("work/sf1synth").getAbsolutePath
    val factor = 10
    if (!new java.io.File(s"$synth/orders.parquet").exists()) {
      def shifted(table: String, idCol: String): Unit = {
        val base = graft.Tables.load(spark, src, table)
        val maxId = base.agg(max(col(idCol))).head().getLong(0)
        (0 until factor).map { i =>
          base.withColumn(idCol, col(idCol) + lit(i * (maxId + 1)))
        }.reduce(_ unionByName _)
          .write.mode("overwrite").parquet(s"$synth/$table.parquet")
      }
      shifted("orders", "o_orderkey")
      shifted("embeddings", "vec_id")
      graft.Tables.load(spark, src, "nation")
        .write.mode("overwrite").parquet(s"$synth/nation.parquet")
    }
    def timeGate(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.count()
      (System.nanoTime() - t0) / 1e9
    }
    gates.foreach { g =>
      val t01 = timeGate(g, src)
      val t1 = timeGate(g, synth)
      println(f"[scaleleg] gate=$g sf01=$t01%.2f sf1x10=$t1%.2f " +
        f"ratio=${t1 / t01}%.2f")
    }
    spark.stop()
  }
}
