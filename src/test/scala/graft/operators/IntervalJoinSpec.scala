package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points = Seq(
    (1L, 0L), (2L, 5L), (3L, 10L), (4L, 17L), (5L, 99L)
  ).toDF("p_id", "p")
  private lazy val intervals = Seq(
    (10L, 0L, 4L),    // catches p=0
    (11L, 4L, 10L),   // catches p=5, p=10 (closed on both ends)
    (12L, 10L, 10L),  // degenerate single-point interval: p=10
    (13L, 20L, 30L),  // catches nothing
    (14L, 8L, 3L),    // hi < lo: matches nothing, must not crash
    (15L, 0L, 99L)    // spans many buckets: catches every point
  ).toDF("i_id", "lo", "hi")

  test("pointInInterval equals the naive BETWEEN join for every edge case") {
    val out = IntervalJoin.pointInInterval(points, "p", intervals,
        "lo", "hi", bucketWidth = 4L)
      .select($"p_id", $"i_id").as[(Long, Long)].collect().toSet
    val naive = points.join(intervals,
        $"p" >= $"lo" && $"p" <= $"hi")
      .select($"p_id", $"i_id").as[(Long, Long)].collect().toSet
    assert(out == naive)
    // spot-check the edges: closed ends, degenerate, reversed, spanning
    assert(out.contains((2L, 11L)) && out.contains((3L, 11L)))
    assert(out.contains((3L, 12L)))
    assert(!out.exists(_._2 == 13L) && !out.exists(_._2 == 14L))
    assert(out.count(_._2 == 15L) == 5)
    // each qualifying pair appears exactly ONCE (a point lives in one
    // bucket, so a pair can only meet at that bucket)
    val all = IntervalJoin.pointInInterval(points, "p", intervals,
        "lo", "hi", bucketWidth = 4L)
      .select($"p_id", $"i_id").as[(Long, Long)].collect()
    assert(all.length == all.distinct.length)
  }

  test("bucket width does not change the result") {
    val w4 = IntervalJoin.pointInInterval(points, "p", intervals,
        "lo", "hi", 4L).select($"p_id", $"i_id")
      .as[(Long, Long)].collect().toSet
    Seq(1L, 7L, 100L).foreach { w =>
      assert(IntervalJoin.pointInInterval(points, "p", intervals,
          "lo", "hi", w).select($"p_id", $"i_id")
        .as[(Long, Long)].collect().toSet == w4, s"width $w")
    }
  }

  test("plans as an equi-join — no nested-loop or cartesian operator") {
    val j = IntervalJoin.pointInInterval(points, "p", intervals,
      "lo", "hi", 4L)
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // the naive formulation DOES hit the quadratic operator — the
    // comparison that motivates the decomposition
    val naive = points.join(intervals, $"p" >= $"lo" && $"p" <= $"hi")
    naive.collect()
    val naivePlan = naive.queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin") ||
      naivePlan.contains("CartesianProduct"), naivePlan)
  }

  test("maxCells refuses a cell-blowup in-plan; raising it deliberately works") {
    val wide = Seq((20L, 0L, 5000L)).toDF("i_id", "lo", "hi")
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val err = intercept[Exception] {
      IntervalJoin.pointInInterval(points, "p", wide, "lo", "hi",
        bucketWidth = 1L, maxCells = 100).count()
    }
    assert(msgs(err).exists(_.contains("spans more than 100 cells")))
    // deliberate raise: same query completes and matches the naive join
    val out = IntervalJoin.pointInInterval(points, "p", wide, "lo", "hi",
        bucketWidth = 1L, maxCells = 10000)
      .select($"p_id", $"i_id").as[(Long, Long)].collect().toSet
    assert(out == points.as[(Long, Long)].collect()
      .map(p => (p._1, 20L)).toSet)
  }

  test("refuses colliding column names and non-positive widths") {
    intercept[IllegalArgumentException] {
      IntervalJoin.pointInInterval(points, "p",
        intervals.withColumnRenamed("i_id", "p_id"), "lo", "hi", 4L)
    }
    intercept[IllegalArgumentException] {
      IntervalJoin.pointInInterval(points, "p", intervals, "lo", "hi", 0L)
    }
  }
}
