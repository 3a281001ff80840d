package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private val log = Seq(
    // u1 completes view->click->purchase in order
    (1, "view", 10L), (1, "click", 20L), (1, "purchase", 30L),
    // u2 clicks BEFORE the first view: click must not count until
    // a later one follows the view (none does)
    (2, "click", 5L), (2, "view", 6L), (2, "purchase", 7L),
    // u3 views only
    (3, "view", 40L),
    // u4 never views (excluded from the funnel entirely)
    (4, "purchase", 50L),
    // u5: multiple candidates — earliest valid at each stage wins
    (5, "view", 1L), (5, "view", 2L), (5, "click", 3L), (5, "click", 4L),
    (5, "purchase", 9L))
    .toDF("user_id", "etype", "eid")

  test("funnel: strict in-order stage matching, first-match semantics") {
    val out = EventAnalytics.funnel(log, "user_id", "etype", "eid",
        Seq("view", "click", "purchase"))
      .collect()
      .map(r => r.getInt(0) -> (
        Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
        r.getLong(4)))
      .toMap
    assert(out.keySet == Set(1, 2, 3, 5)) // u4 never entered
    assert(out(1) == ((Some(10L), Some(20L), Some(30L), 3L)))
    // u2's click at 5 precedes the view at 6 — stage 2 unreached, and
    // the purchase at 7 must NOT match without a click before it
    assert(out(2) == ((Some(6L), None, None, 1L)))
    assert(out(3) == ((Some(40L), None, None, 1L)))
    assert(out(5) == ((Some(1L), Some(3L), Some(9L), 3L)))
  }

  test("funnelCounts: per-stage reach") {
    val f = EventAnalytics.funnel(log, "user_id", "etype", "eid",
      Seq("view", "click", "purchase"))
    val counts = EventAnalytics.funnelCounts(f,
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(counts == Map(1 -> 4L, 2 -> 2L, 3 -> 2L))
  }

  test("funnel refuses degenerate stage lists") {
    intercept[IllegalArgumentException] {
      EventAnalytics.funnel(log, "user_id", "etype", "eid", Seq("view"))
    }
    intercept[IllegalArgumentException] {
      EventAnalytics.funnel(log, "user_id", "etype", "eid",
        Seq("view", "view"))
    }
  }

  test("transitions: per-user steps, row-normalized probabilities") {
    val ev = Seq(
      (1, "a", 1L), (1, "b", 2L), (1, "a", 3L), (1, "b", 4L),
      (2, "a", 1L), (2, "c", 2L),
      (3, "z", 9L)) // single-event history: no transition
      .toDF("user_id", "etype", "eid")
    val out = EventAnalytics.transitions(ev, "user_id", "etype", "eid")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3)))
      .toMap
    // from a: a->b twice (u1), a->c once (u2)
    assert(out == Map(
      ("a", "b") -> ((2L, 0.666667)), ("a", "c") -> ((1L, 0.333333)),
      ("b", "a") -> ((1L, 1.0))))
  }

  test("cohortRetention: weekly cohorts with exact offsets") {
    val ev = Seq(
      // u1 first seen Mon 2024-01-01 week; active weeks 0, 1, 3
      (1, "2024-01-02 10:00:00"), (1, "2024-01-03 11:00:00"),
      (1, "2024-01-08 09:00:00"), (1, "2024-01-24 09:00:00"),
      // u2 first seen same week; active week 0 only
      (2, "2024-01-05 23:59:59"),
      // u3 first seen the next week
      (3, "2024-01-10 00:00:00"), (3, "2024-01-15 00:00:00"))
      .toDF("user_id", "ts_s")
      .select(col("user_id"), col("ts_s").cast("timestamp").as("ts"))
    val out = EventAnalytics.cohortRetention(ev, "user_id", "ts")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("2024-01-01", 0L) -> 2L, ("2024-01-01", 1L) -> 1L,
      ("2024-01-01", 3L) -> 1L,
      ("2024-01-08", 0L) -> 1L, ("2024-01-08", 1L) -> 1L))
    intercept[IllegalArgumentException] {
      EventAnalytics.cohortRetention(ev, "user_id", "ts", "month")
    }
  }

  test("rfmSegments: deterministic tiles, bigger tile = better on every axis") {
    def d(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")
    val orders = Seq(
      (1L, d(8), 100.0), (1L, d(10), 50.0),            // freq 2, m 150, rec 0
      (2L, d(5), 10.0),                                // freq 1, m 10,  rec 5
      (3L, d(10), 200.0),                              // freq 1, m 200, rec 0
      (4L, d(1), 10.0), (4L, d(2), 10.0), (4L, d(3), 10.0) // freq 3, m 30, rec 7
    ).toDF("cust_id", "odate", "amt")
    val out = EventAnalytics.rfmSegments(orders, "cust_id", "odate",
        "amt", buckets = 2)
      .select("cust", "recency_days", "frequency", "monetary", "segment")
      .as[(Long, Int, Long, Double, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 0, 2L, 150.0, "222"),
      (2L, 5, 1L, 10.0, "111"),
      (3L, 0, 1L, 200.0, "212"),
      (4L, 7, 3L, 30.0, "121")))
  }

  test("lastTouchAttribution: latest preceding touch wins, direct falls back") {
    val ev = Seq(
      // u1: view then click then purchase -> click credited
      (1L, "view", 1L, 0.0), (1L, "click", 2L, 0.0),
      (1L, "purchase", 3L, 10.0),
      // u1 again: purchase right after another purchase -> still click
      (1L, "purchase", 4L, 5.0),
      // u2: purchase with no preceding touch -> (direct)
      (2L, "purchase", 1L, 7.0),
      // u2: view AFTER the purchase must not attribute backwards
      (2L, "view", 2L, 0.0)
    ).toDF("user_id", "event_type", "event_id", "value")
    val out = EventAnalytics.lastTouchAttribution(ev, "user_id",
        "event_type", "event_id", "value", "purchase")
      .as[(String, Long, Double)].collect().toSet
    assert(out == Set(("click", 2L, 15.0), ("(direct)", 1L, 7.0)))
  }
}
