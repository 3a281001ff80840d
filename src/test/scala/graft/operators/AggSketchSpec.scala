package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Approximate-aggregate accuracy: sketches (HLL++, percentile digest)
  * are the scale path for distinct counts / quantiles over 100 TB —
  * fixed-size partial state, one shuffle. Their internals are
  * engine-specific, so no DuckDB hash-oracle can exist; this spec bounds
  * them against the exact computations instead. */
class AggSketchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = {
    val rnd = new scala.util.Random(5)
    (1 to 20000).map(i =>
      (s"g${i % 4}", s"u${rnd.nextInt(3000)}", rnd.nextGaussian() * 50 + 200))
      .toDF("g", "u", "v").repartition(8)
      .persist()
  }

  test("approx_count_distinct within its rsd bound of exact") {
    val exact = df.groupBy("g").agg(count_distinct($"u").as("n"))
      .as[(String, Long)].collect().toMap
    val approx = df.groupBy("g").agg(approx_count_distinct($"u", 0.02).as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (g, n) =>
      val a = approx(g)
      assert(math.abs(a - n).toDouble / n < 0.06, // 3x rsd margin
        s"group $g: approx $a vs exact $n")
    }
  }

  test("approx_percentile tracks exact percentile") {
    val rows = df.groupBy("g").agg(
        expr("percentile(v, 0.5)").as("exact_p50"),
        expr("approx_percentile(v, 0.5, 1000)").as("approx_p50"))
      .as[(String, Double, Double)].collect()
    rows.foreach { case (g, e, a) =>
      assert(math.abs(a - e) / math.abs(e) < 0.02, s"group $g: $a vs $e")
    }
  }
}
