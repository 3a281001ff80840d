package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // quotes per symbol; trades probe them
  private def quotes = Seq(
    ("A", ts("2024-01-01 10:00:00"), 100.0),
    ("A", ts("2024-01-01 10:00:10"), 101.0),
    ("A", ts("2024-01-01 10:00:20"), 102.0),
    ("B", ts("2024-01-01 10:00:05"), 50.0)
  ).toDF("sym", "qts", "px")

  private def trades = Seq(
    (1L, "A", ts("2024-01-01 10:00:15")), // between quotes 2 and 3 -> 101.0
    (2L, "A", ts("2024-01-01 10:00:10")), // exactly on quote 2 -> inclusive
    (3L, "A", ts("2024-01-01 09:59:59")), // before any quote -> null
    (4L, "B", ts("2024-01-01 10:01:00")), // only B quote -> 50.0
    (5L, "C", ts("2024-01-01 10:00:00"))  // no quotes for key -> null
  ).toDF("trade_id", "sym", "tts")

  test("backward picks latest right row at-or-before each left row") {
    val out = AsofJoin.backward(trades, quotes, Seq("sym"), "tts", "qts", Seq("px"))
      .select($"trade_id", $"matched_px")
      .as[(Long, Option[Double])].collect().toMap
    assert(out == Map(
      1L -> Some(101.0), 2L -> Some(101.0), 3L -> None,
      4L -> Some(50.0), 5L -> None))
  }

  test("all left rows preserved (left-outer), left columns untouched") {
    val out = AsofJoin.backward(trades, quotes, Seq("sym"), "tts", "qts", Seq("px"))
    assert(out.count() == 5)
    assert(out.columns.toSeq ==
      Seq("trade_id", "sym", "tts", "matched_qts", "matched_px"))
  }

  test("tolerance nulls out matches older than the window") {
    // trade 4 is 55 s after B's only quote — a 30 s tolerance rejects it,
    // while trade 1 (5 s gap) survives
    val out = AsofJoin.backward(trades, quotes, Seq("sym"), "tts", "qts",
        Seq("px"), toleranceSeconds = Some(30L))
      .select($"trade_id", $"matched_px")
      .as[(Long, Option[Double])].collect().toMap
    assert(out(4L).isEmpty)
    assert(out(1L).contains(101.0))
    assert(out(2L).contains(101.0))
  }

  test("matches the naive range-join argmax formulation") {
    val naive = trades.as("t")
      .join(quotes.as("q"), $"t.sym" === $"q.sym" && $"q.qts" <= $"t.tts", "left")
      .groupBy($"trade_id")
      .agg(max(struct($"qts", $"px")).as("m"))
      .select($"trade_id", $"m.px".as("px"))
      .as[(Long, Option[Double])].collect().toMap
    val fast = AsofJoin.backward(trades, quotes, Seq("sym"), "tts", "qts", Seq("px"))
      .select($"trade_id", $"matched_px")
      .as[(Long, Option[Double])].collect().toMap
    assert(fast == naive)
  }

  test("forward picks earliest right row at-or-after each left row") {
    val out = AsofJoin.forward(trades, quotes, Seq("sym"), "tts", "qts", Seq("px"))
      .select($"trade_id", $"matched_px")
      .as[(Long, Option[Double])].collect().toMap
    assert(out == Map(
      1L -> Some(102.0), // next after 10:00:15 is the 10:00:20 quote
      2L -> Some(101.0), // equal timestamps match inclusively
      3L -> Some(100.0), // before all quotes -> first one
      4L -> None,        // after B's only quote
      5L -> None))       // no quotes for key
  }

  test("forward matches the naive min-struct formulation") {
    val naive = trades.as("t")
      .join(quotes.as("q"), $"t.sym" === $"q.sym" && $"q.qts" >= $"t.tts", "left")
      .groupBy($"trade_id")
      .agg(min(struct($"qts", $"px")).as("m"))
      .select($"trade_id", $"m.px".as("px"))
      .as[(Long, Option[Double])].collect().toMap
    val fast = AsofJoin.forward(trades, quotes, Seq("sym"), "tts", "qts", Seq("px"))
      .select($"trade_id", $"matched_px")
      .as[(Long, Option[Double])].collect().toMap
    assert(fast == naive)
  }

  test("null keys never match (ANSI join semantics)") {
    val l = Seq((1L, Option(9L), ts("2024-01-01 12:00:00")),
      (2L, Option.empty[Long], ts("2024-01-01 12:00:00")))
      .toDF("lid", "k", "lts")
    val r = Seq((Option(9L), ts("2024-01-01 11:00:00"), 1.0),
      (Option.empty[Long], ts("2024-01-01 11:30:00"), 2.0))
      .toDF("k", "rts", "v")
    val out = AsofJoin.backward(l, r, Seq("k"), "lts", "rts", Seq("v"))
      .select($"lid", $"matched_v").as[(Long, Option[Double])]
      .collect().toMap
    assert(out == Map(1L -> Some(1.0), 2L -> None))
  }

  test("property: equals naive argmax formulation across random seeds") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed * 77L)
      // distinct right timestamps per key (as-of contract: callers
      // pre-dedupe ties), overlapping left timestamps allowed
      def randTs(n: Int) = ts(f"2024-03-${1 + n % 25}%02d ${n % 24}%02d:00:00")
      val left = (1 to 60).map(i => (i.toLong, rnd.nextInt(4).toLong,
        randTs(rnd.nextInt(600)))).toDF("lid", "k", "lts")
      val right = rnd.shuffle((0 until 600).toList).take(60).zipWithIndex
        .map { case (n, i) => (n % 4L, randTs(n), i.toDouble) }
        .distinctBy(r => (r._1, r._2))
        .toDF("k", "rts", "v")
      val fast = AsofJoin.backward(left, right, Seq("k"), "lts", "rts", Seq("v"))
        .select($"lid", $"matched_v").as[(Long, Option[Double])]
        .collect().toMap
      val naive = left.as("t")
        .join(right.as("q"), $"t.k" === $"q.k" && $"q.rts" <= $"t.lts", "left")
        .groupBy($"lid").agg(max(struct($"rts", $"v")).as("m"))
        .select($"lid", $"m.v".as("v")).as[(Long, Option[Double])]
        .collect().toMap
      assert(fast == naive, s"seed=$seed")
    }
  }

  test("single window plan: no join, one shuffle exchange") {
    val out = AsofJoin.backward(trades, quotes, Seq("sym"), "tts", "qts", Seq("px"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of should not plan a join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly one shuffle, got $exchanges:\n$plan")
  }
}
