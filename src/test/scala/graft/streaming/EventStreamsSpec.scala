package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events(rows: (String, Long, String, Double)*) =
    rows.toSeq.toDF("tss", "user_id", "event_type", "value")
      .select($"tss".cast("timestamp").as("ts"), $"user_id", $"event_type", $"value")

  test("sampleKStream == batch exactSample under batch splits and " +
      "redelivery") {
    import org.apache.spark.sql.expressions.Window
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Long]
    val df = mem.toDF().toDF("id")
    val out = EventStreams.sampleKStream(df, "id", k = 5, buckets = 4)
      .writeStream.format("memory").queryName("samplek_sink")
      .outputMode("append").start()
    try {
      mem.addData(1L to 40L: _*)
      out.processAllAvailable()
      mem.addData(41L to 80L: _*)
      out.processAllAvailable()
      mem.addData(15L, 16L, 17L) // redelivery must change nothing
      out.processAllAvailable()
      val perBucket = Window.partitionBy($"bucket")
      val got = spark.table("samplek_sink")
        .withColumn("_maxp", max($"processed").over(perBucket))
        .filter($"processed" === $"_maxp")
        .orderBy($"hex", $"key").limit(5)
        .select($"key").as[Long].collect().toSeq
      val expected = graft.operators.Sampling
        .exactSample((1L to 80L).toDF("id"), "id", 5)
        .as[Long].collect().toSeq
      assert(got == expected)
      // redelivered keys did not inflate the sample or shift positions
      assert(got.distinct.length == 5)
    } finally out.stop()
  }

  test("funnelStream: state crosses batches, completions emit exactly once") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val df = mem.toDF().toDF("user_id", "event_type", "event_id")
    val out = EventStreams.funnelStream(df, "user_id", "event_type",
        "event_id", Seq("view", "click", "purchase"))
      .writeStream.format("memory").queryName("funnel_sink")
      .outputMode("append").start()
    try {
      // batch 1: u1 view+click (partial); u2 click before view (no
      // progress past view); unsorted within the batch on purpose
      mem.addData((1L, "click", 20L), (1L, "view", 10L),
        (2L, "click", 5L), (2L, "view", 6L))
      out.processAllAvailable()
      assert(spark.table("funnel_sink").count() == 0)
      // batch 2: u1 completes; u2's purchase without a click does not;
      // u1's extra purchase after completion must not re-emit
      mem.addData((1L, "purchase", 30L), (2L, "purchase", 7L),
        (1L, "purchase", 40L))
      out.processAllAvailable()
      val rows = spark.table("funnel_sink")
        .as[(Long, Seq[Long])].collect().toMap
      assert(rows == Map(1L -> Seq(10L, 20L, 30L)))
      // batch 3: a late straggler for u2 (id below the frontier) does
      // not time-travel into a match; a fresh in-order run for u2 does
      mem.addData((2L, "click", 3L))
      out.processAllAvailable()
      assert(spark.table("funnel_sink").count() == 1)
      mem.addData((2L, "click", 8L), (2L, "purchase", 9L))
      out.processAllAvailable()
      val fin = spark.table("funnel_sink")
        .as[(Long, Seq[Long])].collect().toMap
      assert(fin == Map(1L -> Seq(10L, 20L, 30L), 2L -> Seq(6L, 8L, 9L)))
    } finally out.stop()
  }

  test("cohortStream: cohort pins on first sight, each week emits once") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val df = mem.toDF().toDF("user_id", "wk")
      .withColumn("wk", col("wk").cast("date"))
    val out = EventStreams.cohortStream(df, "user_id", "wk")
      .writeStream.format("memory").queryName("cohort_sink")
      .outputMode("append").start()
    // epoch days: 2024-01-01 and 2024-01-08 are Mondays
    val d0 = java.time.LocalDate.parse("2024-01-01").toEpochDay
    val d1 = java.time.LocalDate.parse("2024-01-08").toEpochDay
    try {
      // batch 1: u1 active in week0 twice (one emission), u2 in week1
      mem.addData((1L, "2024-01-01"), (1L, "2024-01-01"),
        (2L, "2024-01-08"))
      out.processAllAvailable()
      val b1 = spark.table("cohort_sink")
        .as[(Long, Long, Long)].collect().toSet
      assert(b1 == Set((1L, d0, d0), (2L, d1, d1)))
      // batch 2: u1 re-active in week0 (no re-emit) and week1 (emits
      // with the PINNED week0 cohort)
      mem.addData((1L, "2024-01-01"), (1L, "2024-01-08"))
      out.processAllAvailable()
      val b2 = spark.table("cohort_sink")
        .as[(Long, Long, Long)].collect().toSet
      assert(b2 == Set((1L, d0, d0), (2L, d1, d1), (1L, d0, d1)))
    } finally out.stop()
  }

  test("transitionsStream: lag state crosses batches, stragglers ignored") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val df = mem.toDF().toDF("user_id", "event_type", "event_id")
    val out = EventStreams.transitionsStream(df, "user_id", "event_type",
        "event_id")
      .writeStream.format("memory").queryName("steps_sink")
      .outputMode("append").start()
    try {
      mem.addData((1L, "b", 2L), (1L, "a", 1L)) // unsorted in batch
      out.processAllAvailable()
      // batch 2: the a->b frontier is b@2; c@3 chains b->c; a
      // straggler at id 0 must not emit a time-traveling step
      mem.addData((1L, "c", 3L), (1L, "z", 0L), (2L, "x", 5L))
      out.processAllAvailable()
      val steps = spark.table("steps_sink")
        .as[(Long, String, String)].collect().sorted.toSeq
      assert(steps == Seq((1L, "a", "b"), (1L, "b", "c")))
    } finally out.stop()
  }

  test("slidingDistinctStream: compensated deltas sum to the batch interval algebra") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val df = mem.toDF().toDF("user_id", "day")
    val out = EventStreams.slidingDistinctStream(df, "user_id", "day",
        windowDays = 3)
      .writeStream.format("memory").queryName("wau_sink")
      .outputMode("append").start()
    try {
      // u1 active days 1 and 3 (inside the window: forces the
      // compensating pair); u2 day 2
      mem.addData((1L, 1L), (2L, 2L))
      out.processAllAvailable()
      mem.addData((1L, 3L), (1L, 3L), (1L, 2L)) // dup + straggler
      out.processAllAvailable()
      val net = spark.table("wau_sink")
        .groupBy("day").agg(sum("delta").as("net"))
        .as[(Long, Long)].collect().toMap.withDefaultValue(0L)
      // running sum over days 1..10 must equal brute-force recount
      var acc = 0L
      val counts = (1L to 10L).map { d => acc += net(d); d -> acc }.toMap
      val active = Map(1L -> Seq(1L, 3L), 2L -> Seq(2L))
      (1L to 10L).foreach { d =>
        val expected = active.values
          .count(ds => ds.exists(a => a <= d && a > d - 3)).toLong
        assert(counts(d) == expected, s"day $d: ${counts(d)} != $expected")
      }
      // activity days are flagged; compensation rows are not
      val actDays = spark.table("wau_sink").filter(col("act"))
        .select("day").as[Long].collect().toSet
      assert(actDays == Set(1L, 2L, 3L))
    } finally out.stop()
  }

  test("sessionsStream: compensated sessions finalize to the gap-merge, state crosses batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val df = mem.toDF().toDF("user_id", "ts", "value")
    val gapUs = 600000000L // 10 minutes
    val out = EventStreams.sessionsStream(df, "user_id", "ts", "value", gapUs)
      .writeStream.format("memory").queryName("sess_sink")
      .outputMode("append").start()
    try {
      // batch 1: u1 opens a session with two close events; u2 one event
      mem.addData(
        (1L, ts("2024-01-01 10:00:00"), 1.0),
        (1L, ts("2024-01-01 10:05:00"), 2.0),
        (2L, ts("2024-01-01 09:00:00"), 5.0))
      out.processAllAvailable()
      // batch 2: u1 extends the SAME open session across the batch
      // boundary (gap 5 min < 10), then a gap of exactly 10 min breaks
      // it (>= is a break, session_window semantics) and 30 min breaks
      // again — rows within a batch process in ts order regardless of
      // arrival order
      mem.addData(
        (1L, ts("2024-01-01 10:10:00"), 4.0),
        (1L, ts("2024-01-01 10:40:00"), 8.0),
        (1L, ts("2024-01-01 10:20:00"), 99.0))
      out.processAllAvailable()
      // batch 3: a TRUE straggler — behind the open session's last
      // event from a previous batch — is dropped
      mem.addData((1L, ts("2024-01-01 10:15:00"), 1000.0))
      out.processAllAvailable()
      val fin = spark.table("sess_sink")
        .groupBy("user", "start", "end", "n", "total")
        .agg(sum("w").as("net"))
      // every provisional emission nets to exactly 0 or 1
      assert(fin.filter(col("net") < 0 || col("net") > 1).count() == 0)
      val sessions = fin.filter(col("net") > 0)
        .select("user", "start", "end", "n", "total")
        .as[(Long, Long, Long, Long, Double)].collect().toSet
      def us(s: String) = ts(s).getTime * 1000L
      assert(sessions == Set(
        (1L, us("2024-01-01 10:00:00"), us("2024-01-01 10:20:00"), 3L, 7.0),
        (1L, us("2024-01-01 10:20:00"), us("2024-01-01 10:30:00"), 1L, 99.0),
        (1L, us("2024-01-01 10:40:00"), us("2024-01-01 10:50:00"), 1L, 8.0),
        (2L, us("2024-01-01 09:00:00"), us("2024-01-01 09:10:00"), 1L, 5.0)))
    } finally out.stop()
  }

  test("attributionStream: touch state crosses batches, direct fallback, stragglers dropped") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long, Double)]
    val df = mem.toDF().toDF("user_id", "event_type", "event_id", "value")
    val out = EventStreams.attributionStream(df, "user_id", "event_type",
        "event_id", "value", "purchase")
      .writeStream.format("memory").queryName("attr_sink")
      .outputMode("append").start()
    try {
      // u1 converts with no touch -> (direct); then a click lands
      mem.addData((1L, "purchase", 1L, 5.0), (1L, "click", 2L, 0.0))
      out.processAllAvailable()
      // batch 2: u1 converts again -> click (state crossed batches);
      // a straggler view at id 0 must not rewrite history; u2's view
      // then purchase attributes in-batch
      mem.addData((1L, "purchase", 3L, 7.0), (1L, "view", 0L, 0.0),
        (2L, "view", 1L, 0.0), (2L, "purchase", 2L, 9.0))
      out.processAllAvailable()
      val convs = spark.table("attr_sink")
        .as[(Long, String, Double, Long)].collect().sorted.toSeq
      assert(convs == Seq((1L, "(direct)", 5.0, 1L),
        (1L, "click", 7.0, 3L), (2L, "view", 9.0, 2L)))
    } finally out.stop()
  }

  test("windowedAgg tumbles on event time (batch frame)") {
    val df = events(
      ("2026-01-01 10:00:10", 1, "click", 1.0),
      ("2026-01-01 10:00:50", 2, "click", 2.0),
      ("2026-01-01 10:01:10", 1, "view", 3.0))
    val out = EventStreams.windowedAgg(df, "ts", "1 minute")
      .orderBy("window_start", "event_type")
      .as[(Timestamp, Timestamp, String, Long, Double)].collect()
    assert(out.length == 2)
    assert(out(0)._3 == "click" && out(0)._4 == 2 && out(0)._5 == 3.0)
    assert(out(1)._3 == "view" && out(1)._4 == 1)
  }

  test("windowedAgg on a MemoryStream honors watermark and emits finalized windows") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String, Double)]
    val df = mem.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = EventStreams.windowedAgg(df, "ts", "1 minute", watermark = "0 seconds")
      .writeStream.format("memory").queryName("winagg")
      .outputMode("append").start()
    // watermark only advances AFTER a batch: batch 1 ingests the 10:00
    // window, batch 2's later event moves the watermark past 10:01, and
    // the following no-data batch finalizes + emits the closed window
    mem.addData(
      (ts("2026-01-01 10:00:10"), 1L, "click", 1.0),
      (ts("2026-01-01 10:00:40"), 2L, "click", 2.0))
    q.processAllAvailable()
    mem.addData((ts("2026-01-01 10:02:05"), 1L, "view", 3.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("winagg")
      .as[(Timestamp, Timestamp, String, Long, Double)].collect()
    // the 10:00 window is finalized (watermark passed), the 10:02 one is not
    assert(rows.exists(r => r._3 == "click" && r._4 == 2 && r._5 == 3.0))
    assert(!rows.exists(r => r._3 == "view"))
  }

  test("dedupWithinWatermark drops re-deliveries on a stream") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String, Double)]
    val df = mem.toDF().toDF("ts", "user_id", "event_type", "value")
    // enqueue BEFORE start: AvailableNow snapshots the available offsets
    // at query start — data added after is racy in an isolated run
    mem.addData(
      (ts("2026-01-01 10:00:00"), 1L, "click", 1.0),
      (ts("2026-01-01 10:00:30"), 1L, "click", 99.0), // duplicate key
      (ts("2026-01-01 10:00:40"), 2L, "view", 2.0))
    val q = EventStreams.dedupWithinWatermark(df, Seq("user_id", "event_type"),
        "ts", "10 minutes")
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.table("dedup").collect()
    assert(rows.length == 2)
  }

  test("nearDupWithinWatermark drops same-signature docs on a stream") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val df = mem.toDF().toDF("ts", "doc_id", "text")
    mem.addData(
      (ts("2026-01-01 10:00:00"), 1L, "The quick brown fox"),
      // token reorder + case change: identical distinct-token set →
      // identical SimHash → suppressed as a near-dup
      (ts("2026-01-01 10:00:30"), 2L, "quick the FOX brown"),
      (ts("2026-01-01 10:01:00"), 3L, "an entirely different document"))
    val q = EventStreams.nearDupWithinWatermark(df, "text", "ts", "10 minutes")
      .writeStream.format("memory").queryName("neardup")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val kept = spark.table("neardup").select($"doc_id")
      .as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L))
    // signature column does not leak into the output
    assert(!spark.table("neardup").columns.contains("_sim"))
  }

  test("nearDupPairsStream pairs near docs within the horizon only") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val df = mem.toDF().toDF("ts", "doc_id", "text")
    mem.addData(
      (ts("2026-01-01 10:00:00"), 1L, "alpha beta gamma delta"),
      // same distinct-token set → identical signature (hamming 0)
      (ts("2026-01-01 10:01:00"), 2L, "delta GAMMA beta alpha"),
      (ts("2026-01-01 10:02:00"), 3L, "completely unrelated payload text"),
      // same signature as 1/2 but outside the 10-minute horizon of both
      (ts("2026-01-01 10:30:00"), 4L, "alpha beta gamma delta"))
    val q = EventStreams.nearDupPairsStream(df, "doc_id", "text", "ts",
        within = "10 minutes", maxDist = 3)
      .writeStream.format("memory").queryName("neardup_pairs")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    // first-matching-chunk rule: the identical-signature pair shares
    // all four chunk keys but must emit exactly ONCE, not 4×
    val raw = spark.table("neardup_pairs")
      .select($"id_earlier", $"id_later", $"hamming")
      .as[(Long, Long, Int)].collect().toSeq
    assert(raw == Seq((1L, 2L, 0)))
  }

  test("quantileStream: histogram state merges across batches; keep-last equals batch histogram") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Double)]
    val df = mem.toDF().toDF("k", "v")
    val out = EventStreams.quantileStream(df, "k", "v",
        lo = 0.0, hi = 16.0, buckets = 8, qs = Seq(0.5, 1.0))
      .writeStream.format("memory").queryName("quant_sink")
      .outputMode("append").start()
    try {
      mem.addData(("a", 1.0), ("a", 3.0), ("a", 5.0))
      out.processAllAvailable()
      // second batch shifts the median bucket; also clamps out-of-range
      mem.addData(("a", 13.0), ("a", 99.0))
      out.processAllAvailable()
      val fin = spark.table("quant_sink")
        .as[(String, Long, Double, Double)].collect()
        .groupBy(t => (t._1, t._3))
        .map { case (kq, rows) => kq -> rows.maxBy(_._2)._4 }
      // final histogram of a: buckets {0:[1,3→wait width 2: 1.0→b0, 3.0→b1, 5.0→b2, 13.0→b6, 99→clamp b7}
      // n=5: q=0.5 → rank 3 → cum 1,2,3 at b2 → est 5.0; q=1.0 → rank 5 → b7 → est 15.0
      assert(fin(("a", 0.5)) == 5.0)
      assert(fin(("a", 1.0)) == 15.0)
      // intermediate (batch-1) emission exists with processed=3
      assert(spark.table("quant_sink")
        .filter($"processed" === 3 && $"q" === 0.5).count() == 1)
    } finally out.stop()
  }

  test("histogramStream: counts merge across batches; keep-last equals batch histogram") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Int)]
    val df = mem.toDF().toDF("k", "b")
    val out = EventStreams.histogramStream(df, "k", "b", buckets = 4)
      .writeStream.format("memory").queryName("hist_sink")
      .outputMode("append").start()
    try {
      mem.addData(("a", 0), ("a", 0), ("a", 2))
      out.processAllAvailable()
      mem.addData(("a", 2), ("a", 3), ("b", 1))
      out.processAllAvailable()
      val rows = spark.table("hist_sink")
        .as[(String, Long, Int, Long)].collect()
      val fin = rows.groupBy(_._1).toSeq.flatMap { case (k, rs) =>
        val mx = rs.map(_._2).max
        rs.filter(_._2 == mx).map(r => (k, r._3) -> r._4)
      }.toMap
      // a's final histogram merges both batches; zeros are emitted
      assert(fin((("a"), 0)) == 2L && fin(("a", 1)) == 0L &&
        fin(("a", 2)) == 2L && fin(("a", 3)) == 1L)
      assert(fin(("b", 1)) == 1L && fin(("b", 0)) == 0L)
      // every emission carries the FULL spine (4 rows per key per batch)
      assert(rows.count(r => r._1 == "a" && r._2 == 3L) == 4)
    } finally out.stop()
  }

  test("histogramStream refuses loudly on an out-of-range bucket") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Int)]
    val df = mem.toDF().toDF("k", "b")
    val out = EventStreams.histogramStream(df, "k", "b", buckets = 4)
      .writeStream.format("memory").queryName("hist_refuse_sink")
      .outputMode("append").start()
    try {
      mem.addData(("a", 4))
      val ex = intercept[Exception] { out.processAllAvailable() }
      def msgs(t: Throwable): String =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(e => Option(e.getMessage).getOrElse("")).mkString(" ")
      assert(msgs(ex).contains("outside [0, 4)"),
        s"wanted the out-of-range message, got: ${msgs(ex).take(300)}")
    } finally out.stop()
  }

  test("topKStream: counts merge across batches; keep-last equals batch ranking") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val df = mem.toDF().toDF("k", "v")
    val out = EventStreams.topKStream(df, "k", "v", k = 2)
      .writeStream.format("memory").queryName("topk_sink")
      .outputMode("append").start()
    try {
      // batch 1: a → x:2 y:1 → ranking (x,2),(y,1)
      mem.addData(("a", "x"), ("a", "x"), ("a", "y"))
      out.processAllAvailable()
      // batch 2: y overtakes x (y:3 vs x:2); tie on z:2 broken by value
      mem.addData(("a", "y"), ("a", "y"), ("a", "z"), ("a", "z"))
      out.processAllAvailable()
      val rows = spark.table("topk_sink")
        .as[(String, Long, Int, String, Long)].collect()
      // keep-last: max processed per (key, rank)
      val fin = rows.groupBy(t => (t._1, t._3))
        .map { case (kr, rs) => kr -> { val m = rs.maxBy(_._2); (m._4, m._5) } }
      assert(fin(("a", 1)) == ("y", 3L))
      assert(fin(("a", 2)) == ("x", 2L)) // x before z at count 2
      // intermediate batch-1 ranking was emitted with processed=3
      assert(rows.count(t => t._2 == 3L && t._3 == 1 && t._4 == "x") == 1)
    } finally out.stop()
  }

  test("topKStream refuses loudly when a key's vocabulary exceeds maxVocab") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val df = mem.toDF().toDF("k", "v")
    val out = EventStreams.topKStream(df, "k", "v", k = 2, maxVocab = 3)
      .writeStream.format("memory").queryName("topk_refuse_sink")
      .outputMode("append").start()
    try {
      mem.addData(("a", "v1"), ("a", "v2"), ("a", "v3"))
      out.processAllAvailable() // at the ceiling: fine
      mem.addData(("a", "v1")) // existing value: still fine
      out.processAllAvailable()
      mem.addData(("a", "v4")) // 4th distinct value: refuse loudly
      val ex = intercept[Exception] { out.processAllAvailable() }
      def msgs(t: Throwable): String =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(e => Option(e.getMessage).getOrElse("")).mkString(" ")
      assert(msgs(ex).contains("exceeded maxVocab"),
        s"wanted the contract message, got: ${msgs(ex).take(300)}")
    } finally out.stop()
  }

  test("decontaminateStream flags streamed docs against the static eval set") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evalDocs = Seq((100L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val df = mem.toDF().toDF("doc_id", "text")
    val out = graft.operators.Dedup.decontaminateStream(df, evalDocs,
        "doc_id", "text", n = 3, minShared = 2)
      .writeStream.format("memory").queryName("decontam_sink")
      .outputMode("append").start()
    try {
      // batch 1: doc 1 shares 2 trigrams ("alpha beta gamma", "beta
      // gamma delta" — contaminated), doc 2 shares one, doc 3 none
      mem.addData(
        (1L, "x alpha beta gamma delta y"),
        (2L, "q beta gamma delta w z"),
        (3L, "totally unrelated text with nothing shared"))
      out.processAllAvailable()
      // batch 2: doc 1 REDELIVERED — state must suppress re-emission
      mem.addData((1L, "x alpha beta gamma delta y"))
      out.processAllAvailable()
      val got = spark.table("decontam_sink")
        .as[(Long, Long)].collect().toSeq
      assert(got == Seq((1L, 2L)))
    } finally out.stop()
  }

  test("nearDupPairsStream join state is watermark-bounded, not stream-lifetime") {
    // the 100 TB-stream claim measured, not asserted: as the watermark
    // passes, buffered join rows from old microbatches must be EVICTED —
    // state tracks rate×horizon, never stream lifetime
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val df = mem.toDF().toDF("ts", "doc_id", "text")
    val q = EventStreams.nearDupPairsStream(df, "doc_id", "text", "ts",
        within = "5 minutes", maxDist = 3, watermark = "1 minute")
      .writeStream.format("memory").queryName("neardup_state")
      .outputMode("append").start()
    try {
      // a wide early batch: 20 docs → 80 chunk rows buffered per side
      mem.addData((0 until 20).map(i =>
        (ts(f"2026-01-01 10:$i%02d:00"), i.toLong,
          s"doc number $i unique body")): _*)
      q.processAllAvailable()
      val early = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(early > 0, "join state should hold the early batch")
      // two tiny batches two hours later: the first advances the
      // watermark past the early rows, the second triggers eviction
      mem.addData((ts("2026-01-01 12:00:00"), 100L, "late doc one"))
      q.processAllAvailable()
      mem.addData((ts("2026-01-01 12:01:00"), 101L, "late doc two"))
      q.processAllAvailable()
      val late = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(late < early,
        s"state must shrink after the watermark passes: early=$early late=$late")
      assert(late <= 64, s"state should hold only the tail horizon: $late")
    } finally q.stop()
  }

  test("enrichLatest joins a stream to the latest dim version, broadcast") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val stream = mem.toDF().toDF("ts", "user_id", "value")
    // two versions per user; version 2 must win
    val dim = Seq(
      (1L, "bronze", ts("2026-01-01 00:00:00")),
      (1L, "gold", ts("2026-01-02 00:00:00")),
      (2L, "silver", ts("2026-01-01 00:00:00"))
    ).toDF("user_id", "tier", "updated")
    val enriched = EventStreams.enrichLatest(stream, dim, Seq("user_id"),
      versionTs = Some("updated"))
    val q = enriched.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    mem.addData(
      (ts("2026-01-01 10:00:00"), 1L, 5.0),
      (ts("2026-01-01 10:01:00"), 2L, 6.0),
      (ts("2026-01-01 10:02:00"), 3L, 7.0)) // no dim row -> null tier
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("enriched")
      .select($"user_id", $"tier").as[(Long, Option[String])]
      .collect().toMap
    assert(rows == Map(1L -> Some("gold"), 2L -> Some("silver"), 3L -> None))
  }

  test("intervalJoin pairs streams within the event-time window only") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val purchases = MemoryStream[(Timestamp, Long, Double)]
    val views = MemoryStream[(Timestamp, Long, String)]
    val p = purchases.toDF().toDF("pts", "user_id", "amount")
    val v = views.toDF().toDF("vts", "user_id", "page")
    val q = EventStreams.intervalJoin(p, v, "user_id", "pts", "vts",
        within = "10 minutes", watermark = "0 seconds")
      .select("user_id", "amount", "page")
      .writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    purchases.addData((ts("2026-01-01 10:20:00"), 1L, 50.0))
    views.addData(
      (ts("2026-01-01 10:15:00"), 1L, "in_window"),
      (ts("2026-01-01 10:05:00"), 1L, "too_early"),
      (ts("2026-01-01 10:25:00"), 1L, "after_purchase"),
      (ts("2026-01-01 10:15:00"), 2L, "other_user"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ssjoin").as[(Long, Double, String)].collect()
    assert(rows.toSet == Set((1L, 50.0, "in_window")))
  }

  test("sessionize merges gapped rows into sessions (batch frame)") {
    val df = events(
      ("2026-01-01 10:00:00", 1, "click", 1.0),
      ("2026-01-01 10:03:00", 1, "click", 1.0),  // within 5 min gap
      ("2026-01-01 11:00:00", 1, "click", 1.0),  // new session
      ("2026-01-01 10:00:00", 2, "view", 5.0))
    val out = EventStreams.sessionize(df, "ts", "5 minutes")
      .orderBy("user_id", "session_start")
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect()
    assert(out.length == 3)
    assert(out(0)._1 == 1 && out(0)._4 == 2) // merged session
    assert(out(1)._1 == 1 && out(1)._4 == 1)
    assert(out(2)._1 == 2 && out(2)._5 == 5.0)
  }
}
