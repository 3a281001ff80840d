package graft.operators

import graft.SparkSpec

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  private def kth(xs: Seq[Double], q: Double): Double =
    xs.sorted.apply(math.ceil(q * xs.size).toInt - 1)

  test("histogram-guided selection equals the sorted kth smallest") {
    // deterministic, duplicate-heavy, non-uniform values; tiny
    // maxSelect forces several narrowing rounds
    val xs = (0 until 10007).map(i => ((i * 2654435761L) % 9973).toDouble / 7.0)
    val df = xs.toDF("v")
    for (q <- Seq(0.01, 0.25, 0.5, 0.9, 0.999, 1.0)) {
      val got = Quantiles.exactQuantile(df, "v", q,
        buckets = 16, maxSelect = 50)
      assert(got == kth(xs, q), s"q=$q")
    }
  }

  test("all-equal and two-point columns") {
    val flat = Seq.fill(5000)(3.25).toDF("v")
    assert(Quantiles.exactQuantile(flat, "v", 0.5,
      buckets = 8, maxSelect = 10) == 3.25)
    val two = (Seq.fill(400)(1.0) ++ Seq.fill(600)(2.0)).toDF("v")
    assert(Quantiles.exactQuantile(two, "v", 0.4,
      buckets = 8, maxSelect = 10) == 1.0)
    assert(Quantiles.exactQuantile(two, "v", 0.41,
      buckets = 8, maxSelect = 10) == 2.0)
  }

  test("nulls and NaNs are excluded from the order statistics") {
    val df = (Seq.fill(10)(Some(5.0)) ++ Seq(None) ++
      Seq.fill(10)(Some(1.0)) :+ Some(Double.NaN)).toDF("v")
    assert(Quantiles.exactQuantile(df, "v", 0.5,
      buckets = 4, maxSelect = 3) == 1.0)
  }

  test("refuses bad quantiles and empty input") {
    val df = Seq(1.0).toDF("v")
    intercept[IllegalArgumentException] {
      Quantiles.exactQuantile(df, "v", 0.0)
    }
    intercept[IllegalArgumentException] {
      Quantiles.exactQuantile(df.filter($"v" > 2), "v", 0.5)
    }
  }
}
