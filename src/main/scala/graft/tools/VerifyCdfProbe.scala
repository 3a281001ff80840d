package graft.tools

import graft.operators.IvfIndex
import graft.streaming.IndexSink
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cost probe for the defensive CDF-contract check (VERDICT r17 #6,
  * HANDOFF r18 "consider a sampled mode cheap enough to default on"):
  * what does `verifyCdf` add to a feed batch's apply cost, and does
  * `sample:N` amortize it to near-`off`?
  *
  * The check is one semi-join of the batch's insert keys against the
  * index's served id column — its cost scales with the INDEX (an
  * id-column scan), not the batch, which is exactly why it is a flag
  * and not the default. The sampled mode's claim: an upstream CDF bug
  * is systematic, so checking every Nth batch still catches it within
  * N batches at ~1/N the overhead. This probe measures all three
  * postures at two index sizes over the same batch stream
  * (direct [[IndexSink.applyIvfBatch]] applies — no stream startup
  * noise, the marginal check cost is the signal).
  *
  * Usage: `runMain graft.tools.VerifyCdfProbe [batches] [rowsPerBatch]`.
  * One line per (size, mode) leg with total/avg apply seconds. */
object VerifyCdfProbe {
  def main(args: Array[String]): Unit = {
    val batches = if (args.length > 0) args(0).toInt else 20
    val perBatch = if (args.length > 1) args(1).toInt else 25
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val rnd = new scala.util.Random(11)
    def vecRows(ids: Seq[Long]) =
      ids.map(i => (i, Array.fill(8)(rnd.nextFloat())))
        .toDF("vec_id", "embedding")

    def leg(size: Int, mode: String): Double = {
      val w = java.nio.file.Files
        .createTempDirectory(s"graft_vcdf_${size}_${mode.replace(':', '_')}")
        .toString
      val idx = new IvfIndex(spark, s"$w/idx")
      idx.build(vecRows(1L to size.toLong), "vec_id", "embedding",
        k = 16, iters = 2)
      var total = 0.0
      (1 to batches).foreach { i =>
        // genuinely-new keys: the check passes, so we measure the
        // VERIFICATION cost itself, not violation handling
        val lo = size + (i - 1).toLong * perBatch + 1
        val batch = vecRows(lo until lo + perBatch)
          .withColumn("_change_type", lit("insert"))
          .withColumn("_from_epoch", lit(i.toLong))
          .withColumn("_to_epoch", lit(i.toLong + 1))
        val t0 = System.nanoTime()
        IndexSink.applyIvfBatch(spark, batch, i.toLong, idx,
          "vec_id", "embedding", verifyCdf = mode)
        total += (System.nanoTime() - t0) / 1e9
      }
      println(f"[vcdfprobe] size=$size mode=$mode batches=$batches " +
        f"total=$total%.2f avg=${total / batches}%.3f")
      total / batches
    }

    Seq(2000, 20000).foreach { size =>
      Seq("off", "sample:64", "sample:8", "reroute").foreach(m =>
        leg(size, m))
    }
    spark.stop()
  }
}
