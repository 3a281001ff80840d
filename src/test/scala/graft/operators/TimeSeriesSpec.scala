package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")

  test("gapFillDaily densifies each key's span and forward-fills") {
    val df = Seq(
      ("a", ts(1), 10.0), ("a", ts(1), 5.0), ("a", ts(4), 2.0),
      ("b", ts(2), 1.0), ("b", ts(3), 7.0)
    ).toDF("k", "t", "v")
    val out = TimeSeries.gapFillDaily(df, "k", "t", "v")
      .select(col("k"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n"), col("was_gap"), col("filled").cast("double"))
      .as[(String, String, Long, Boolean, Double)]
      .collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      ("a", "2024-01-01", 2L, false, 15.0),
      ("a", "2024-01-02", 0L, true, 15.0),   // gap: carries day-1 total
      ("a", "2024-01-03", 0L, true, 15.0),
      ("a", "2024-01-04", 1L, false, 2.0),
      ("b", "2024-01-02", 1L, false, 1.0),   // b's spine starts at ITS min
      ("b", "2024-01-03", 1L, false, 7.0)))
  }

  test("gapFillDaily refuses a span beyond maxSpanDays loudly") {
    val df = Seq(("a", ts(1), 1.0),
      ("a", java.sql.Timestamp.valueOf("2031-01-01 00:00:00"), 1.0))
      .toDF("k", "t", "v")
    val ex = intercept[Exception] {
      TimeSeries.gapFillDaily(df, "k", "t", "v", maxSpanDays = 365).collect()
    }
    assert(ex.getMessage.contains("spans more than 365 days") ||
      ex.getCause != null &&
        ex.getCause.getMessage.contains("spans more than 365 days"))
  }

  test("rollingAnomalies flags the spike and honors warm-up") {
    // 16 steady readings then one spike: only the spike flags, and
    // nothing inside the minObs warm-up can flag. The frame must be
    // wide enough that the spike can't mask itself — a single outlier
    // inside its own trailing window is bounded by |z| ≤ (n-1)/√n
    // (≈3.75 at n=16), so a frame of 8 could never reach z=3.
    val vals = Seq.fill(16)(10.0) ++ Seq(100.0) ++ Seq.fill(3)(10.0)
    val df = vals.zipWithIndex
      .map { case (v, i) => ("u", i.toLong, v + (i % 3) * 0.1) }
      .toDF("k", "i", "v")
    val out = TimeSeries
      .rollingAnomalies(df, "k", "i", "v", frame = 16, z = 3.0)
      .select(col("i")).as[Long].collect()
    assert(out.toSeq == Seq(16L))
  }

  test("slidingDistinct equals brute-force window recount, zeros kept") {
    // u1 active days 1,3,10; u2 active day 2; trailing 3-day window
    val df = Seq(("u1", 1), ("u1", 3), ("u1", 3), ("u1", 10), ("u2", 2))
      .map { case (u, d) => (u, ts(d)) }.toDF("u", "t")
    val out = TimeSeries.slidingDistinct(df, "u", "t", windowDays = 3)
      .as[(String, Long)].collect().sortBy(_._1)
    val expected = (1 to 10).map { d =>
      val active = Seq("u1" -> Seq(1, 3, 10), "u2" -> Seq(2))
        .count { case (_, ds) => ds.exists(a => a <= d && a > d - 3) }
      (f"2024-01-$d%02d", active.toLong)
    }
    assert(out.toSeq == expected)
    assert(out.map(_._2).toSeq == Seq(1L, 2L, 2L, 2L, 1L, 0L, 0L, 0L, 0L, 1L))
  }

  test("decayedSum folds acc/2+x over the trailing window only") {
    val df = Seq(("u", 1L, 1.0), ("u", 2L, 2.0), ("u", 3L, 3.0),
      ("v", 1L, 8.0)).toDF("k", "o", "x")
    val w2 = TimeSeries.decayedSum(df, "k", "o", "x", window = 2)
      .as[(String, Long, Double, Double)].collect().sortBy(r => (r._1, r._2))
    // u@3 with window 2 sees [2,3]: (0/2+2)/2+3 = 4.0 (1.0 truncated)
    assert(w2.map(_._4).toSeq == Seq(1.0, 2.5, 4.0, 8.0))
    val w3 = TimeSeries.decayedSum(df, "k", "o", "x", window = 3)
      .as[(String, Long, Double, Double)].collect().sortBy(r => (r._1, r._2))
    // u@3 with window 3 sees [1,2,3]: ((0/2+1)/2+2)/2+3 = 4.25
    assert(w3.map(_._4).toSeq == Seq(1.0, 2.5, 4.25, 8.0))
  }

  test("streaks groups consecutive calendar days into islands") {
    val df = Seq(
      ("a", ts(1)), ("a", ts(2)), ("a", ts(2)), ("a", ts(3)), // island of 3
      ("a", ts(5)),                                           // island of 1
      ("b", ts(4))
    ).map { case (k, t) => (k, t, 1.0) }.toDF("k", "t", "v")
    val out = TimeSeries.streaks(df, "k", "t")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out == Set(("a", 4L, 2L, 3L), ("b", 1L, 1L, 1L)))
  }

  test("rollingAnomalies is empty on a flat series") {
    val df = (0 until 20).map(i => ("u", i.toLong, 5.0)).toDF("k", "i", "v")
    assert(TimeSeries.rollingAnomalies(df, "k", "i", "v", 8, 2.0).count() == 0)
  }
}
