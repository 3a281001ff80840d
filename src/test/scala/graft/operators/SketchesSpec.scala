package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("KMV estimate lands within the k=256 error envelope") {
    // 10k distinct keys, each duplicated 3x — duplicates must not
    // perturb the order statistics
    val df = (1 to 10000).flatMap(i => Seq(i, i, i)).toDF("k")
    val est = Sketches.distinctCountEstimate(df, Nil, "k", 256)
      .select("est_distinct").as[Long].head()
    // stderr ≈ 1/sqrt(k-2) ≈ 6.3%; 4 sigma ≈ 25%
    assert(math.abs(est - 10000.0) / 10000.0 < 0.25, s"est=$est")
  }

  test("below k distinct values the sketch is the exact count") {
    val df = (1 to 100).flatMap(i => Seq(i, i)).toDF("k")
    val est = Sketches.distinctCountEstimate(df, Nil, "k", 256)
      .select("est_distinct").as[Long].head()
    assert(est == 100L)
  }

  test("per-group estimates are partitioning-invariant (mergeable)") {
    val df = (1 to 5000)
      .map(i => (s"g${i % 3}", i))
      .toDF("g", "k")
    def run(parts: Int): Map[String, Long] =
      Sketches.distinctCountEstimate(
          df.repartition(parts), Seq("g"), "k", 64)
        .as[(String, Long)].collect().toMap
    val a = run(1)
    val b = run(17)
    assert(a == b, s"$a vs $b")
    assert(a.keySet == Set("g0", "g1", "g2"))
  }

  test("aggregator buffer never exceeds k and stays sorted-distinct") {
    val agg = new Sketches.KmvAggregator(4)
    val buf = (1L to 100L).foldLeft(agg.zero)((b, h) =>
      agg.reduce(b, 101L - h)) // descending inserts stress eviction
    assert(buf == Seq(1L, 2L, 3L, 4L))
    val merged = agg.merge(Seq(1L, 3L, 5L, 7L), Seq(1L, 2L, 8L, 9L))
    assert(merged == Seq(1L, 2L, 3L, 5L))
  }

  test("refuses k below 2") {
    intercept[IllegalArgumentException] {
      new Sketches.KmvAggregator(1)
    }
  }

  test("KMV union stats: identical, disjoint, subset cases") {
    val k = 64
    def sk(xs: Range) = Sketches.kmvSketch(xs.toDF("k"), "k", k)
    val a = sk(1 to 30)
    // identical sets: everything overlaps, estimates exact (m < k)
    assert(Sketches.kmvUnionStats(a, a, k) == (30L, 30L, 30L))
    // disjoint small sets: exact union, zero overlap
    val b = sk(1000 to 1019)
    assert(Sketches.kmvUnionStats(a, b, k) == (50L, 0L, 0L))
    // subset: intersection estimate equals the subset size
    val sub = sk(1 to 10)
    val (u, ov, inter) = Sketches.kmvUnionStats(a, sub, k)
    assert(u == 30L && ov == 10L && inter == 10L)
  }

  test("KMV union/intersection estimates track large overlapping sets") {
    val k = 128
    def sk(xs: Range) = Sketches.kmvSketch(xs.toDF("k"), "k", k)
    val (u, _, inter) =
      Sketches.kmvUnionStats(sk(1 to 3000), sk(2000 to 5000), k)
    // true union 5000, true intersection 1001; ~4-sigma envelopes
    assert(math.abs(u - 5000.0) / 5000.0 < 0.35, s"union=$u")
    assert(math.abs(inter - 1001.0) / 1001.0 < 0.6, s"inter=$inter")
  }

  test("CMS never underestimates; sparse keys are near-exact") {
    val df = (0 until 2000).map(i => i % 50).toDF("k") // 50 keys × 40
    val counters = Sketches.cmsCounters(df, "k", 4, 1024)
    val est = Sketches.cmsEstimate(df, "k", counters, 4, 1024)
      .as[(Int, Long)].collect().toMap
    assert(est.size == 50)
    assert(est.values.forall(_ >= 40L), est)
    // 50 keys in 4 rows of 1024 buckets: collisions are rare
    assert(est.values.count(_ == 40L) >= 45, est)
  }

  test("CMS counter tables merge cell-wise: half + half == whole") {
    val all = (0 until 1000).map(i => i % 30).toDF("k")
    val a = all.filter($"k" < 15)
    val b = all.filter($"k" >= 15)
    val merged = Sketches.cmsCounters(a, "k", 4, 256)
      .unionByName(Sketches.cmsCounters(b, "k", 4, 256))
      .groupBy("_row", "_bkt").agg(sum("cnt").as("cnt"))
    val whole = Sketches.cmsCounters(all, "k", 4, 256)
    def estim(c: org.apache.spark.sql.DataFrame): Map[Int, Long] =
      Sketches.cmsEstimate(all, "k", c, 4, 256)
        .as[(Int, Long)].collect().toMap
    assert(estim(merged) == estim(whole))
  }

  test("cmsHeavyHitters equals the exact group-by, even under collisions") {
    // skewed corpus: two heavy keys (35% and 25%), 40 light ones
    val rows = Seq.fill(350)("hot") ++ Seq.fill(250)("warm") ++
      (0 until 400).map(i => s"light${i % 40}")
    val df = rows.toDF("k")
    def exact(share: Double): Map[String, Long] =
      df.groupBy("k").count()
        .filter($"count" >= math.ceil(1000 * share).toLong)
        .as[(String, Long)].collect().toMap
    val hh = Sketches.cmsHeavyHitters(df, "k", 4, 1024, 0.2)
      .as[(String, Long)].collect().toMap
    assert(hh == exact(0.2) && hh == Map("hot" -> 350L, "warm" -> 250L))
    // width 4 forces massive collisions: estimates inflate, but the
    // exact HAVING still yields the exact answer (prefilter only
    // loses selectivity, never a true heavy hitter)
    val collided = Sketches.cmsHeavyHitters(df, "k", 2, 4, 0.2)
      .as[(String, Long)].collect().toMap
    assert(collided == hh)
    intercept[IllegalArgumentException] {
      Sketches.cmsHeavyHitters(df, "k", 4, 1024, 0.0)
    }
  }

  test("CMS refuses degenerate dimensions") {
    val df = Seq(1).toDF("k")
    intercept[IllegalArgumentException] {
      Sketches.cmsCounters(df, "k", 0, 16)
    }
    intercept[IllegalArgumentException] {
      Sketches.cmsCounters(df, "k", 4, 1)
    }
  }

  test("xxhash64 CMS artifact pair: never underestimates, serves " +
      "reuse, and rebuilds identically") {
    val df = (0 until 2000).map(i => (i % 50).toLong).toDF("k")
    val base = java.nio.file.Files
      .createTempDirectory("graft_cms_fast").toString
    val (counters, probes) = Sketches.cmsTableFast(df, "k", 4, 1024, base)
    val est = Sketches.cmsEstimateFromArtifacts(probes, counters, "k")
      .as[(Long, Long)].collect().toMap
    assert(est.size == 50)
    assert(est.values.forall(_ >= 40L), est)
    assert(est.values.count(_ == 40L) >= 45, est)
    // artifact reuse: a marker row added to the corpus is invisible
    // because the pair is served from disk, not rebuilt
    val (c2, p2) = Sketches.cmsTableFast(
      df.unionAll(Seq(999L).toDF("k")), "k", 4, 1024, base)
    assert(p2.count() == probes.count() && c2.count() == counters.count())
    // determinism: a from-scratch build of the same corpus lands the
    // identical cell table (xxhash64 is seed-fixed)
    val base2 = java.nio.file.Files
      .createTempDirectory("graft_cms_fast2").toString
    val (c3, _) = Sketches.cmsTableFast(df, "k", 4, 1024, base2)
    assert(c3.exceptAll(counters).count() == 0
      && counters.exceptAll(c3).count() == 0)
  }
}
