package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = (1L to 2000L).map(i => (i, if (i % 2 == 0) "en" else "zh"))
    .toDF("id", "lang")

  test("rateThreshold is the %08x fixed-point of the rate") {
    assert(Sampling.rateThreshold(0.5) == "80000000")
    assert(Sampling.rateThreshold(0.25) == "40000000")
    assert(Sampling.rateThreshold(0.0) == "00000000")
    assert(Sampling.rateThreshold(1.0) == "ffffffff") // clamped
    intercept[IllegalArgumentException] { Sampling.rateThreshold(1.5) }
  }

  test("sample is deterministic, nested across rates, and ~proportional") {
    val a = Sampling.sample(rows, "id", 0.3).select("id").as[Long].collect().toSet
    val b = Sampling.sample(rows, "id", 0.3).select("id").as[Long].collect().toSet
    assert(a == b) // same rows every run — no rand()
    val wider = Sampling.sample(rows, "id", 0.6).select("id").as[Long].collect().toSet
    assert(a.subsetOf(wider)) // raising the rate only ADDS rows
    // a uniform 32-bit coordinate over 2000 keys: 0.3 ± a few percent
    assert(math.abs(a.size / 2000.0 - 0.3) < 0.05)
    assert(Sampling.sample(rows, "id", 1.0).count() == 2000)
    assert(Sampling.sample(rows, "id", 0.0).count() == 0)
  }

  test("exactSample: exactly k, unique, nested across k, TakeOrdered plan") {
    val k100 = Sampling.exactSample(rows, "id", 100).select("id")
      .as[Long].collect().toSet
    assert(k100.size == 100)
    // deterministic and nested: the 40-sample is a prefix of the 100-sample
    val k40 = Sampling.exactSample(rows, "id", 40).select("id")
      .as[Long].collect().toSet
    assert(k40.subsetOf(k100))
    assert(Sampling.exactSample(rows, "id", 100).select("id")
      .as[Long].collect().toSet == k100)
    // no global sort: the limit compiles to TakeOrderedAndProject
    val plan = Sampling.exactSample(rows, "id", 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("splitTag partitions exactly; heldout side equals sample at the rate") {
    val tagged = Sampling.splitTag(rows, "id", 0.2)
    val bySide = tagged.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(bySide.values.sum == 2000) // exact partition, nothing lost
    val held = tagged.filter($"split" === "heldout").select("id")
      .as[Long].collect().toSet
    assert(held == Sampling.sample(rows, "id", 0.2)
      .select("id").as[Long].collect().toSet)
    // nested: growing the rate only moves rows train -> heldout
    val held30 = Sampling.splitTag(rows, "id", 0.3)
      .filter($"split" === "heldout").select("id").as[Long].collect().toSet
    assert(held.subsetOf(held30))
    // scan-stage: no exchange in the plan
    assert(!tagged.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("foldTag: exact partition into k stable folds, scan-stage, loud guard") {
    val tagged = Sampling.foldTag(rows, "id", 5)
    val byFold = tagged.groupBy("fold").count()
      .as[(Long, Long)].collect().toMap
    assert(byFold.keySet == Set(0L, 1L, 2L, 3L, 4L)) // all folds populated
    assert(byFold.values.sum == 2000)                // nothing lost/duplicated
    // ~400 per fold — the md5 coordinate spreads evenly
    assert(byFold.values.forall(n => n > 300 && n < 500))
    // stability: folds are a pure function of the key — dropping one
    // fold leaves every other row's assignment untouched
    val kept = Sampling.foldTag(
        tagged.filter($"fold" =!= 0L).drop("fold"), "id", 5)
      .select("id", "fold").as[(Long, Long)].collect().toMap
    val orig = tagged.select("id", "fold").as[(Long, Long)].collect().toMap
    assert(kept.forall { case (id, f) => orig(id) == f })
    assert(!tagged.queryExecution.executedPlan.toString.contains("Exchange"))
    intercept[IllegalArgumentException](Sampling.foldTag(rows, "id", 1))
  }

  test("weightedSample: deterministic, nested, weight-proportional, TakeOrdered") {
    val weighted = rows.withColumn("w",
      when($"lang" === "en", 10.0).otherwise(1.0))
    val k200 = Sampling.weightedSample(weighted, "id", col("w"), 200)
      .select("id").as[Long].collect().toSet
    assert(k200.size == 200)
    // deterministic and nested across k, like exactSample
    assert(Sampling.weightedSample(weighted, "id", col("w"), 200)
      .select("id").as[Long].collect().toSet == k200)
    val k50 = Sampling.weightedSample(weighted, "id", col("w"), 50)
      .select("id").as[Long].collect().toSet
    assert(k50.subsetOf(k200))
    // 10x-weighted "en" rows (even ids) dominate the sample: with equal
    // populations the expected en share is ~10/11
    val enShare = k200.count(_ % 2 == 0) / 200.0
    assert(enShare > 0.75, s"en share $enShare")
    // uniform weights reduce to a pure coordinate order: the smallest
    // clock -ln(u)/w is the LARGEST u, so the k largest md5 coordinates
    // win (exactSample's mirror image — same determinism, same nesting)
    val uni = Sampling.weightedSample(rows.withColumn("w", lit(3.0)),
      "id", col("w"), 100).select("id").as[Long].collect().toSet
    val uniExpect = rows.orderBy(Sampling.hashHex($"id").desc, $"id")
      .limit(100).select("id").as[Long].collect().toSet
    assert(uni == uniExpect)
    // no global sort
    val plan = Sampling.weightedSample(weighted, "id", col("w"), 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // non-positive weight is refused in-plan, not ranked last
    val err = intercept[Exception] {
      Sampling.weightedSample(rows.withColumn("w",
        when($"id" === 7L, -1.0).otherwise(1.0)), "id", col("w"), 10).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(err).exists(_.contains("strictly positive")))
  }

  test("weightedCapPerGroup caps each group with weight preference") {
    val weighted = rows.withColumn("w",
      when($"id" % 10 === 0, 100.0).otherwise(1.0))
    val out = Sampling.weightedCapPerGroup(weighted, "id", "lang",
      col("w"), 50).as[(String, Long)].collect()
    val byLang = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byLang("en").size == 50 && byLang("zh").size == 50)
    // the heavy rows (ids % 10 == 0, all "en") are near-certain picks
    val heavy = (1L to 2000L).filter(_ % 10 == 0).toSet
    assert(heavy.count(byLang("en").contains) >= 45)
    // agrees with the global sampler's ranking applied per group
    val en = weighted.filter($"lang" === "en")
    assert(byLang("en") == Sampling.weightedSample(en, "id", col("w"), 50)
      .select("id").as[Long].collect().toSet)
    // string keys are refused with the surrogate-id hint
    val e = intercept[IllegalArgumentException] {
      Sampling.weightedCapPerGroup(rows.withColumn("k", $"id".cast("string")),
        "k", "lang", lit(1.0), 5)
    }
    assert(e.getMessage.contains("integral key column"))
  }

  test("stratifiedSample applies per-stratum rates and the default") {
    val out = Sampling.stratifiedSample(rows, "id", "lang",
        Map("en" -> 1.0), defaultRate = 0.0)
      .select("lang").as[String].collect()
    assert(out.nonEmpty && out.forall(_ == "en")) // zh fell to default 0
    val mixed = Sampling.stratifiedSample(rows, "id", "lang",
        Map("en" -> 0.2, "zh" -> 0.8))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // per-stratum decisions use the same coordinate as the flat sample:
    // each stratum's kept set is exactly sample(rate) restricted to it
    val en02 = Sampling.sample(rows.filter($"lang" === "en"), "id", 0.2).count()
    val zh08 = Sampling.sample(rows.filter($"lang" === "zh"), "id", 0.8).count()
    assert(mixed("en") == en02 && mixed("zh") == zh08)
  }

  test("capPerGroup equals the window formulation and nests across k") {
    val expected = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"lang")
        .orderBy(substring(md5($"id".cast("string")), 1, 8), $"id")
      rows.withColumn("_rn", row_number().over(w))
        .filter($"_rn" <= 7).select($"lang", $"id")
        .as[(String, Long)].collect().toSet
    }
    val got = Sampling.capPerGroup(rows, "id", "lang", 7)
      .as[(String, Long)].collect().toSet
    assert(got == expected)
    assert(got.groupBy(_._1).forall(_._2.size == 7))
    // caps nest: raising the cap only ADDS rows per group
    val wider = Sampling.capPerGroup(rows, "id", "lang", 20)
      .as[(String, Long)].collect().toSet
    assert(got.subsetOf(wider))
    // k-bounded aggregation, not a per-group window sort
    val plan = Sampling.capPerGroup(rows, "id", "lang", 7)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("HashAggregate") || plan.contains("ObjectHashAggregate"), plan)
  }

  test("capPerGroup rejects non-integral key columns with a clear message") {
    val strKeyed = rows.select($"id".cast("string").as("id"), $"lang")
    val e = intercept[IllegalArgumentException] {
      Sampling.capPerGroup(strKeyed, "id", "lang", 5)
    }
    assert(e.getMessage.contains("integral key column"))
  }

  test("sampleToTokenBudget keeps whole coordinate buckets within budget") {
    // each row carries 10 tokens; 2000 rows -> 20000 tokens total
    val docs = rows.withColumn("tok", lit(10L))
    val kept = Sampling.sampleToTokenBudget(docs, "id", "lang", col("tok"),
      budget = 3000L)
    val perLang = kept.groupBy("lang")
      .agg(sum("tok").as("t")).as[(String, Long)].collect().toMap
    // never exceeds the budget, and gets within one bucket's weight of it
    assert(perLang.values.forall(_ <= 3000L), perLang)
    assert(perLang.values.forall(_ >= 2000L), perLang) // buckets are small here
    // deterministic + nested: a larger budget keeps a superset
    val ids3k = kept.select("id").as[Long].collect().toSet
    val ids6k = Sampling.sampleToTokenBudget(docs, "id", "lang", col("tok"),
      budget = 6000L).select("id").as[Long].collect().toSet
    assert(ids3k.subsetOf(ids6k))
    assert(Sampling.sampleToTokenBudget(docs, "id", "lang", col("tok"),
      budget = 3000L).select("id").as[Long].collect().toSet == ids3k)
    // the cut equals the per-doc cumulative-sum reference at bucket
    // granularity: every kept bucket's full cumsum fits the budget
    val ref = {
      val bkt = substring(md5($"id".cast("string")), 1, 4)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"lang").orderBy($"_b")
      docs.withColumn("_b", bkt)
        .groupBy($"lang", $"_b").agg(sum("tok").as("t"))
        .withColumn("c", sum($"t").over(w))
        .filter($"c" <= 3000L)
        .select($"lang", $"_b").as[(String, String)].collect().toSet
    }
    val keptBuckets = kept
      .select($"lang", substring(md5($"id".cast("string")), 1, 4))
      .as[(String, String)].collect().toSet
    assert(keptBuckets == ref)
    intercept[IllegalArgumentException] {
      Sampling.sampleToTokenBudget(docs, "id", "lang", col("tok"), 0L)
    }
  }

  test("packOffsets: contiguous global offsets, exact window ids, deterministic") {
    val docs = (1L to 500L).map(i => (i, (i % 7 + 1).toInt))
      .toDF("id", "ntok")
    val out = Sampling.packOffsets(docs, "id", col("ntok"), windowTokens = 16L)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(out.length == 500)
    // offsets tile the concatenated corpus exactly: sorted by g_start,
    // each doc starts where the previous ended, first at 0, total =
    // sum of token counts
    val sorted = out.sortBy(_._3)
    assert(sorted.head._3 == 0L)
    assert(sorted.sliding(2).forall {
      case Array(a, b) => b._3 == a._4; case _ => true
    })
    assert(sorted.last._4 == out.map(_._2).sum)
    // window ids are the floor of the offsets; a doc straddles a
    // boundary iff first_win < last_win, and some do at these sizes
    assert(out.forall { case (_, n, s, e, fw, lw) =>
      e == s + n && fw == s / 16 && lw == (e - 1) / 16 && fw <= lw })
    assert(out.exists { case (_, _, _, _, fw, lw) => fw < lw })
    // deterministic across evaluations
    val again = Sampling.packOffsets(docs, "id", col("ntok"), 16L)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(again.sortBy(_._1).toSeq == out.sortBy(_._1).toSeq)
  }

  test("contaminationCounts flags train docs overlapping the eval set") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),   // eval
      (2L, "alpha beta gamma delta zeta"),      // 2 shared trigrams -> flagged
      (3L, "alpha beta gamma eta theta"),       // 1 shared trigram -> dropped
      (4L, "completely unrelated text here now") // 0 shared -> dropped
    ).toDF("doc_id", "text")
    val eval = docs.filter($"doc_id" === 1L)
    val train = docs.filter($"doc_id" =!= 1L)
    val out = Dedup.contaminationCounts(train, eval, "doc_id", "text",
        n = 3, minShared = 2)
      .as[(Long, Long)].collect().toMap
    // doc 2 shares "alpha beta gamma" and "beta gamma delta"
    assert(out == Map(2L -> 2L))
    // minShared=1 also surfaces doc 3's single shared trigram
    val loose = Dedup.contaminationCounts(train, eval, "doc_id", "text",
        n = 3, minShared = 1)
      .as[(Long, Long)].collect().toMap
    assert(loose == Map(2L -> 2L, 3L -> 1L))
  }

  test("contaminationCountsBloom equals the exact path via a might_contain prefilter") {
    // bigger corpus so the Bloom actually prunes: 200 train docs, 5
    // contaminated with >= 2 eval trigrams
    val eval = Seq((0L, "secret eval phrase one two three four")).toDF("doc_id", "text")
    val train = (1L to 200L).map { i =>
      val text =
        if (i <= 5) s"secret eval phrase one padding$i tail$i"
        else s"ordinary document number $i with plain content $i"
      (i, text)
    }.toDF("doc_id", "text")
    val exact = Dedup.contaminationCounts(train, eval, "doc_id", "text",
      n = 3, minShared = 2).as[(Long, Long)].collect().toSet
    val bloomed = Dedup.contaminationCountsBloom(train, eval, "doc_id",
      "text", n = 3, minShared = 2, expectedEval = 1024)
    assert(bloomed.as[(Long, Long)].collect().toSet == exact)
    assert(exact.map(_._1) == (1L to 5L).toSet)
    // the prefilter is Spark's codegen'd bloom predicate, in the plan
    // BEFORE the semi-join
    val plan = bloomed.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
  }

  test("temperatureMixture flattens shares toward sqrt(n) and is deterministic") {
    import spark.implicits._
    // head group 10x the tail group
    val df = ((1 to 400).map(i => (i.toLong, "big")) ++
      (401 to 440).map(i => (i.toLong, "small"))).toDF("id", "grp")
    val kept = Sampling.temperatureMixture(df, "id", "grp", budget = 100L)
      .select("id", "grp").as[(Long, String)].collect().toSeq
    // deterministic: same rows on a re-run
    assert(Sampling.temperatureMixture(df, "id", "grp", budget = 100L)
      .select("id", "grp").as[(Long, String)].collect().toSeq.sorted
      == kept.sorted)
    val byGrp = kept.groupBy(_._2).view.mapValues(_.size).toMap
    // replay the rate arithmetic exactly
    def sq(n: Long) = math.round(math.sqrt(n.toDouble) * 1e6)
    val s = sq(400) + sq(40)
    def rate(n: Long) = math.min(1.0, (100L * sq(n)).toDouble / (s * n))
    // √-flattening: small's rate must exceed big's by ~√10
    assert(rate(40) > 3 * rate(400))
    // per-group kept counts should be within a loose band of n*rate
    // (the md5 coordinate is uniform; 3σ ≈ 3·√(n·r) covers it)
    Seq(("big", 400L), ("small", 40L)).foreach { case (g, n) =>
      val expect = n * rate(n)
      val got = byGrp.getOrElse(g, 0)
      val tol = 3 * math.sqrt(expect) + 1
      assert(math.abs(got - expect) <= tol, s"$g: $got vs $expect ± $tol")
    }
  }
}
