package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("windowBefore matches the naive range-join on random-ish data") {
    val rnd = new scala.util.Random(7)
    val left = (1 to 120).map { i =>
      (i.toLong, rnd.nextInt(5).toLong,
        ts(f"2024-01-${1 + rnd.nextInt(27)}%02d ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"))
    }.toDF("lid", "k", "lts")
    val right = (1 to 150).map { i =>
      (rnd.nextInt(5).toLong,
        ts(f"2024-01-${1 + rnd.nextInt(27)}%02d ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"),
        i.toDouble)
    }.toDF("k", "rts", "v")
    val w = 6L * 3600
    val fast = RangeJoin.windowBefore(left, right, Seq("k"), "lts", "rts",
        Seq("v"), w)
      .select($"lid", $"w_v").as[(Long, Double)].collect().sorted
    val naive = left.join(right, Seq("k"))
      .filter($"rts" >= $"lts" - expr(s"INTERVAL $w SECOND") && $"rts" < $"lts")
      .select($"lid", $"v").as[(Long, Double)].collect().sorted
    assert(fast.toSeq == naive.toSeq)
    assert(naive.nonEmpty) // the fixture actually exercises matches
  }

  test("window is half-open: [lts - w, lts)") {
    val left = Seq((1L, 1L, ts("2024-01-01 12:00:00"))).toDF("lid", "k", "lts")
    val right = Seq(
      (1L, ts("2024-01-01 11:00:00"), "at_lower"),   // == lts - w -> in
      (1L, ts("2024-01-01 12:00:00"), "at_upper"),   // == lts -> out
      (1L, ts("2024-01-01 10:59:59"), "below"),      // out
      (1L, ts("2024-01-01 11:30:00"), "inside")      // in
    ).toDF("k", "rts", "tag")
    val got = RangeJoin.windowBefore(left, right, Seq("k"), "lts", "rts",
        Seq("tag"), 3600L)
      .select($"w_tag").as[String].collect().sorted
    assert(got.toSeq == Seq("at_lower", "inside"))
  }

  test("property: equals naive range join across random seeds/windows") {
    // manual seeded randomness (scalatestplus not resolvable offline);
    // duplicate timestamps per key are generated on purpose
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed * 1000L)
      val w = Seq(900L, 3600L, 43200L)(seed % 3)
      def randTs() = ts(f"2024-02-${1 + rnd.nextInt(10)}%02d " +
        f"${rnd.nextInt(24)}%02d:${Seq(0, 15, 30, 45)(rnd.nextInt(4))}%02d:00")
      val left = (1 to 80).map(i => (i.toLong, rnd.nextInt(3).toLong, randTs()))
        .toDF("lid", "k", "lts")
      val right = (1 to 80).map(i => (rnd.nextInt(3).toLong, randTs(), i.toDouble))
        .toDF("k", "rts", "v")
      val fast = RangeJoin.windowBefore(left, right, Seq("k"), "lts", "rts",
          Seq("v"), w)
        .select($"lid", $"w_v").as[(Long, Double)].collect().sorted
      val naive = left.join(right, Seq("k"))
        .filter($"rts" >= $"lts" - expr(s"INTERVAL $w SECOND") && $"rts" < $"lts")
        .select($"lid", $"v").as[(Long, Double)].collect().sorted
      assert(fast.toSeq == naive.toSeq, s"seed=$seed w=$w")
    }
  }

  test("microsecond timestamps: bucket truncation never loses matches") {
    // buckets are computed on second-truncated times; the residual
    // filter is exact to the microsecond — boundary rows just inside /
    // outside the window by 1 µs must resolve correctly
    val left = Seq((1L, 5L, ts("2024-01-01 12:00:00.500000")))
      .toDF("lid", "k", "lts")
    val right = Seq(
      (5L, ts("2024-01-01 11:00:00.500000"), "exact_lower"),  // == lts - w -> in
      (5L, ts("2024-01-01 11:00:00.499999"), "below_1us"),    // out
      (5L, ts("2024-01-01 12:00:00.499999"), "in_1us"),       // in
      (5L, ts("2024-01-01 12:00:00.500000"), "at_upper"),     // out (half-open)
      (5L, ts("2024-01-01 11:59:59.999999"), "inside")        // in
    ).toDF("k", "rts", "tag")
    val got = RangeJoin.windowBefore(left, right, Seq("k"), "lts", "rts",
        Seq("tag"), 3600L)
      .select($"w_tag").as[String].collect().sorted
    assert(got.toSeq == Seq("exact_lower", "in_1us", "inside"))
  }

  test("TIMESTAMP_NTZ across a DST fall-back: buckets agree with the residual") {
    // NTZ is a plain local datetime — the window must behave identically
    // under any session TZ. Under America/New_York the 2024-11-03
    // fall-back makes epoch gaps exceed local gaps by 1h, so deriving
    // buckets via unix_timestamp (epoch through session TZ) disagrees
    // with the local-datetime residual filter and silently drops rows.
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      def ntz(df: org.apache.spark.sql.DataFrame, c: String) =
        df.withColumn(c, to_timestamp_ntz(col(c)))
      val left = ntz(Seq((1L, 1L, "2024-11-03 02:30:00"))
        .toDF("lid", "k", "lts"), "lts")
      val right = ntz(Seq(
        (1L, "2024-11-03 01:45:00", "in_1"),   // 45 min before (local)
        (1L, "2024-11-03 02:00:00", "in_2"),   // 30 min before
        (1L, "2024-11-03 01:29:00", "below"),  // 61 min before -> out
        (1L, "2024-11-03 02:30:00", "upper")   // == lts -> out (half-open)
      ).toDF("k", "rts", "tag"), "rts")
      val got = RangeJoin.windowBefore(left, right, Seq("k"), "lts", "rts",
          Seq("tag"), 3600L)
        .select($"w_tag").as[String].collect().sorted
      assert(got.toSeq == Seq("in_1", "in_2"))
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("bucket replication introduces no duplicate pairs") {
    // right rows straddling two buckets relative to the left row
    val left = Seq((1L, 9L, ts("2024-01-01 00:59:00"))).toDF("lid", "k", "lts")
    val right = (0 until 60).map(m =>
      (9L, ts(f"2024-01-01 00:$m%02d:00"), m.toDouble)).toDF("k", "rts", "v")
    val out = RangeJoin.windowBefore(left, right, Seq("k"), "lts", "rts",
      Seq("v"), 1800L)
    assert(out.count() == out.distinct().count())
    assert(out.count() == 30) // minutes 29..58
  }
}
