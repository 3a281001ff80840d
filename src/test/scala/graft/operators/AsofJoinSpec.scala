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

  test("matched row's nulls stay null — no per-column fill from older rows") {
    // the 10:00:10 quote has a NULL px but a real venue: a probe at
    // 10:00:15 matches THAT row, so matched_px must be null and
    // matched_venue "arca" — not px backfilled from the 10:00:00 row
    // (which a per-column last(ignoreNulls) carry would do)
    val q = Seq(
      (1L, ts("2024-01-01 10:00:00"), Option(100.0), Option("nyse")),
      (1L, ts("2024-01-01 10:00:10"), Option.empty[Double], Option("arca"))
    ).toDF("k", "rts", "px", "venue")
    val l = Seq((1L, ts("2024-01-01 10:00:15"))).toDF("k", "lts")
    val b = AsofJoin.backward(l, q, Seq("k"), "lts", "rts", Seq("px", "venue"))
      .select($"matched_px", $"matched_venue")
      .as[(Option[Double], Option[String])].head()
    assert(b == (None, Some("arca")))
    // forward: probe at 10:00:05 matches the 10:00:10 row — same rule
    val lf = Seq((1L, ts("2024-01-01 10:00:05"))).toDF("k", "lts")
    val f = AsofJoin.forward(lf, q, Seq("k"), "lts", "rts", Seq("px", "venue"))
      .select($"matched_px", $"matched_venue")
      .as[(Option[Double], Option[String])].head()
    assert(f == (None, Some("arca")))
  }

  test("null right timestamps never match") {
    val q = Seq(
      (1L, Option(ts("2024-01-01 10:00:00")), 1.0),
      (1L, Option.empty[java.sql.Timestamp], 99.0)
    ).toDF("k", "rts", "px")
    val l = Seq((1L, ts("2024-01-01 10:00:05"))).toDF("k", "lts")
    val b = AsofJoin.backward(l, q, Seq("k"), "lts", "rts", Seq("px"))
      .select($"matched_px").as[Option[Double]].head()
    assert(b.contains(1.0)) // the null-ts row is not "latest", it is absent
  }

  test("sub-second tolerance boundary is exact (no whole-second truncation)") {
    val q = Seq((1L, ts("2024-01-01 10:00:00.000000"), 7.0)).toDF("k", "rts", "px")
    // probe 30.9 s after the quote: a 30 s tolerance must reject it —
    // whole-second unix_timestamp arithmetic measures 30 and would accept
    val l = Seq((1L, ts("2024-01-01 10:00:30.900000"))).toDF("k", "lts")
    val out = AsofJoin.backward(l, q, Seq("k"), "lts", "rts", Seq("px"),
        toleranceSeconds = Some(30L))
      .select($"matched_px").as[Option[Double]].head()
    assert(out.isEmpty)
  }

  test("nearest picks the closer side; midway ties resolve backward") {
    val probes = Seq(
      (1L, "A", ts("2024-01-01 10:00:12")), // 2s after q2, 8s before q3 -> 101
      (2L, "A", ts("2024-01-01 10:00:18")), // 8s after q2, 2s before q3 -> 102
      (3L, "A", ts("2024-01-01 10:00:15")), // exactly midway -> backward 101
      (4L, "A", ts("2024-01-01 10:00:10")), // exact hit -> 101
      (5L, "A", ts("2024-01-01 09:00:00")), // before all -> forward 100
      (6L, "C", ts("2024-01-01 10:00:00"))  // no quotes -> null
    ).toDF("trade_id", "sym", "tts")
    val out = AsofJoin.nearest(probes, quotes, Seq("sym"), "tts", "qts", Seq("px"))
      .select($"trade_id", $"matched_px")
      .as[(Long, Option[Double])].collect().toMap
    assert(out == Map(1L -> Some(101.0), 2L -> Some(102.0),
      3L -> Some(101.0), 4L -> Some(101.0), 5L -> Some(100.0), 6L -> None))
  }

  test("nearest tolerance applies per direction") {
    val probes = Seq(
      (1L, "B", ts("2024-01-01 10:00:20")), // 15s after B's quote
      (2L, "B", ts("2024-01-01 10:01:30"))  // 85s after -> out of 30s window
    ).toDF("trade_id", "sym", "tts")
    val out = AsofJoin.nearest(probes, quotes, Seq("sym"), "tts", "qts",
        Seq("px"), toleranceSeconds = Some(30L))
      .select($"trade_id", $"matched_px")
      .as[(Long, Option[Double])].collect().toMap
    assert(out == Map(1L -> Some(50.0), 2L -> None))
  }

  test("nearest matches the naive argmin-|dt| formulation (backward ties)") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed * 31L)
      def randTs(n: Int) = ts(f"2024-03-${1 + n % 25}%02d ${n % 24}%02d:00:00")
      val left = (1 to 50).map(i => (i.toLong, rnd.nextInt(3).toLong,
        randTs(rnd.nextInt(500)))).toDF("lid", "k", "lts")
      val right = rnd.shuffle((0 until 500).toList).take(50).zipWithIndex
        .map { case (n, i) => (n % 3L, randTs(n), i.toDouble) }
        .distinctBy(r => (r._1, r._2))
        .toDF("k", "rts", "v")
      val fast = AsofJoin.nearest(left, right, Seq("k"), "lts", "rts", Seq("v"))
        .select($"lid", $"matched_v").as[(Long, Option[Double])]
        .collect().toMap
      // naive: min (|dt|, forward-flag, rts) struct per left row
      val naive = left.as("t")
        .join(right.as("q"), $"t.k" === $"q.k", "left")
        .groupBy($"lid")
        .agg(min(struct(
          abs(unix_timestamp($"rts") - unix_timestamp($"lts")).as("adt"),
          when($"rts" <= $"lts", 0).otherwise(1).as("fwd"),
          $"v".as("v"))).as("m"))
        .select($"lid", $"m.v".as("v")).as[(Long, Option[Double])]
        .collect().toMap
      assert(fast == naive, s"seed=$seed")
    }
  }

  test("nearest stays a single-shuffle window plan (no join)") {
    val out = AsofJoin.nearest(trades, quotes, Seq("sym"), "tts", "qts", Seq("px"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"nearest should not plan a join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly one shuffle, got $exchanges:\n$plan")
  }

  test("forward: null left timestamp matches nothing") {
    val l = Seq((1L, Option(ts("2024-01-01 09:00:00"))),
      (2L, Option.empty[java.sql.Timestamp])).toDF("lid", "lts")
      .withColumn("k", lit(1L))
    val r = Seq((1L, ts("2024-01-01 10:00:00"), 7.0)).toDF("k", "rts", "v")
    val out = AsofJoin.forward(l, r, Seq("k"), "lts", "rts", Seq("v"))
      .select($"lid", $"matched_v").as[(Long, Option[Double])].collect().toMap
    assert(out == Map(1L -> Some(7.0), 2L -> None))
  }

  test("single window plan: no join, one shuffle exchange") {
    val out = AsofJoin.backward(trades, quotes, Seq("sym"), "tts", "qts", Seq("px"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of should not plan a join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly one shuffle, got $exchanges:\n$plan")
  }
}
