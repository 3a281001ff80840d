package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private def byColumn(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) -> r).toMap

  test("profile: counts, nulls, exact ndv below k, native-typed min/max") {
    val df = Seq(
      (1L, Some("b"), 10.5), (2L, None, 2.0), (3L, Some("a"), 10.5),
      (9L, Some("a"), 1.25))
      .toDF("id", "s", "v")
    val p = byColumn(Profile.profile(df, Seq("id", "s", "v"), k = 256))
    val id = p("id")
    assert(id.getLong(1) == 4L && id.getLong(2) == 0L && id.getLong(3) == 4L)
    // native-typed min/max: 9 > 10 lexicographically, not numerically
    assert(id.getString(4) == "1" && id.getString(5) == "9")
    val s = p("s")
    assert(s.getLong(2) == 1L && s.getLong(3) == 2L)
    assert(s.getString(4) == "a" && s.getString(5) == "b")
    val v = p("v")
    assert(v.getLong(3) == 3L)
    assert(v.getString(4) == "1.25" && v.getString(5) == "10.5")
  }

  test("profile: all-null column profiles without poisoning the ndv") {
    val df = Seq((1, Option.empty[String]), (2, None)).toDF("id", "s")
    val s = byColumn(Profile.profile(df, Seq("s")))("s")
    assert(s.getLong(1) == 2L && s.getLong(2) == 2L && s.getLong(3) == 0L)
    assert(s.isNullAt(4) && s.isNullAt(5))
  }

  test("profile: one aggregation, no Expand in the plan") {
    val df = Seq((1, "a"), (2, "b")).toDF("id", "s")
    val plan = Profile.profile(df, Seq("id", "s"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan)
    // the multi-count-distinct plan this replaces DOES expand
    val naive = df.agg(count_distinct(col("id")), count_distinct(col("s")))
      .queryExecution.executedPlan.toString
    assert(naive.contains("Expand"), naive)
  }

  test("profile: ndv estimate tracks a wide column within the envelope") {
    val df = (1 to 20000).toDF("id")
    val row = Profile.profile(df, Seq("id"), k = 256).collect().head
    val est = row.getLong(3)
    assert(math.abs(est - 20000.0) / 20000.0 < 0.25, s"est=$est")
  }

  test("rowChecks: one pass, null operands violate, empty input passes") {
    val df = Seq((1, Some(5)), (2, None), (3, Some(-1))).toDF("id", "v")
    val out = Profile.rowChecks(df, Seq(
        "v_nonneg" -> (col("v") < 0),
        "id_small" -> (col("id") > 100)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    // the null v row counts as a v_nonneg violation alongside -1
    assert(out("v_nonneg") == ((2L, false)))
    assert(out("id_small") == ((0L, true)))
    val empty = Profile.rowChecks(df.filter(col("id") > 99),
      Seq("any" -> (col("v") < 0))).collect().head
    assert(empty.getLong(1) == 0L && empty.getBoolean(2))
  }

  test("uniqueCheck counts surplus rows; refCheck counts orphans") {
    val dup = Seq((1, "x"), (1, "y"), (2, "z"), (2, "w"), (3, "u"))
      .toDF("k", "p")
    val u = Profile.uniqueCheck(dup, Seq("k"), "k_unique").collect().head
    assert(u.getLong(1) == 2L && !u.getBoolean(2))
    val parent = Seq(1, 2).toDF("pk")
    val r = Profile.refCheck(dup, "k", parent, "pk", "k_ref").collect().head
    assert(r.getLong(1) == 1L && !r.getBoolean(2))
    val ok = Profile.refCheck(dup.filter(col("k") < 3), "k",
      parent, "pk", "k_ref").collect().head
    assert(ok.getLong(1) == 0L && ok.getBoolean(2))
  }

  test("enforce: tolerance gates the load, failures name the checks") {
    val df = Seq((1, Some(5)), (2, None), (3, Some(-1))).toDF("id", "v")
    val report = Profile.rowChecks(df, Seq(
      "v_nonneg" -> (col("v") < 0),
      "id_small" -> (col("id") > 100)))
    val e = intercept[IllegalStateException] {
      Profile.enforce(report, tolerance = 1)
    }
    assert(e.getMessage.contains("v_nonneg=2") &&
      !e.getMessage.contains("id_small"))
    // within tolerance: returns the full report
    assert(Profile.enforce(report, tolerance = 2).length == 2)
  }

  test("kAnonymity flags only groups below k") {
    val df = Seq.tabulate(12)(i => (if (i < 9) "big" else "small", i % 2))
      .toDF("seg", "flag")
    // groups: (big,0)=5 (big,1)=4 (small,0)=1 (small,1)=2
    val risky = Profile.kAnonymity(df, Seq("seg", "flag"), 4)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    assert(risky == Map(("small", 0) -> 1L, ("small", 1) -> 2L))
    intercept[IllegalArgumentException] {
      Profile.kAnonymity(df, Seq("seg"), 1)
    }
  }

  test("corrMatrix: one-pass pairwise Pearson matches per-pair corr") {
    val rnd = new scala.util.Random(11)
    val df = (1 to 400).map { i =>
      val x = rnd.nextDouble() * 10
      (x, 2.5 * x + rnd.nextDouble(), rnd.nextDouble() * 5)
    }.toDF("x", "y", "z")
    val out = Profile.corrMatrix(df, Seq("x", "y", "z"))
      .as[(String, String, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    assert(out.keySet == Set(("x", "y"), ("x", "z"), ("y", "z")))
    // strong linear relation detected; reference from Spark's own corr
    // (tolerance covers the decimal(18,4) quantization of the moments)
    val ref = df.select(corr(col("x"), col("y"))).as[Double].head()
    assert(math.abs(out(("x", "y")) - ref) < 1e-3)
    assert(out(("x", "y")) > 0.99)
    intercept[IllegalArgumentException] { Profile.corrMatrix(df, Seq("x")) }
  }

  test("fingerprint: order/partitioning-invariant, content-sensitive, refuses doubles") {
    val df = Seq((1L, "a", "g1"), (2L, "b", "g1"), (3L, "c", "g2"))
      .toDF("k", "s", "g")
    val base = Profile.fingerprint(df, Seq("g"), Seq("k", "s"))
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    // shuffled row order and different partitioning: same checksums
    val shuffled = Profile.fingerprint(
      df.orderBy(col("k").desc).repartition(7), Seq("g"), Seq("k", "s"))
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(base == shuffled)
    // a one-character content change moves the group's checksum
    val tweaked = Seq((1L, "a", "g1"), (2L, "B", "g1"), (3L, "c", "g2"))
      .toDF("k", "s", "g")
    val t2 = Profile.fingerprint(tweaked, Seq("g"), Seq("k", "s"))
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(base.head._3 != t2.head._3 && base(1) == t2(1))
    // NULL is not the empty string
    val withNull = Seq((1L, null.asInstanceOf[String], "g1")).toDF("k", "s", "g")
    val withEmpty = Seq((1L, "", "g1")).toDF("k", "s", "g")
    assert(Profile.fingerprint(withNull, Seq("g"), Seq("k", "s"))
      .as[(String, Long, Long)].head()._3 !=
      Profile.fingerprint(withEmpty, Seq("g"), Seq("k", "s"))
        .as[(String, Long, Long)].head()._3)
    val dbl = Seq((1L, 1.5)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Profile.fingerprint(dbl, Seq.empty, Seq("k", "v"))
    }
  }

  test("psi: identical snapshots score 0; shift shows where it is") {
    def snap(buckets: Int*) = buckets.toSeq.toDF("b")
    val a = snap(0, 0, 0, 1, 1, 2)
    // identical distributions: every bucket's psi is exactly 0
    val same = Profile.psi(a, snap(0, 0, 0, 1, 1, 2), "b", 4)
      .as[(Int, Long, Long, Double)].collect().sortBy(_._1)
    assert(same.length == 4) // full spine, including empty bucket 3
    assert(same.forall(_._4 == 0.0), same.toSeq)
    // mass moved from bucket 0 to bucket 2: both ends show positive
    // psi (the term is (p-q)ln(p/q), positive for any p != q)
    val drift = Profile.psi(a, snap(0, 1, 1, 2, 2, 2), "b", 4)
      .as[(Int, Long, Long, Double)].collect().sortBy(_._1)
    assert(drift(0)._4 > 0 && drift(2)._4 > 0)
    assert(drift(3)._4 == 0.0) // still empty on both sides
    // a bucket present only in ONE snapshot still contributes
    val oneSided = Profile.psi(a, snap(3, 3, 3, 3, 3, 3), "b", 4)
      .as[(Int, Long, Long, Double)].collect().sortBy(_._1)
    assert(oneSided(3)._4 > 0.5, oneSided.toSeq)
    intercept[IllegalArgumentException] { Profile.psi(a, a, "b", 1) }
  }
}
