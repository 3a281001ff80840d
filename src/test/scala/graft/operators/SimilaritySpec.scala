package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // 4-dim embeddings in two well-separated clusters (labels 0 / 1)
  private lazy val emb = Seq(
    (1L, Array(1.0f, 0.1f, 0.0f, 0.0f), 0),
    (2L, Array(0.9f, 0.2f, 0.0f, 0.0f), 0),
    (3L, Array(1.0f, 0.0f, 0.1f, 0.0f), 0),
    (4L, Array(0.0f, 0.0f, 1.0f, 0.9f), 1),
    (5L, Array(0.0f, 0.1f, 0.9f, 1.0f), 1),
    (6L, Array(0.1f, 0.0f, 1.0f, 1.0f), 1)
  ).toDF("vec_id", "embedding", "label")

  private val query = Seq(1.0, 0.05, 0.0, 0.0) // near cluster 0

  test("bruteForceTopK ranks by cosine desc with id tiebreak") {
    val out = Similarity.bruteForceTopK(emb, "vec_id", "embedding", query, 3)
      .as[(Long, Double)].collect()
    assert(out.map(_._1).toSet.subsetOf(Set(1L, 2L, 3L)))
    assert(out.map(_._2).sorted.reverse.toSeq == out.map(_._2).toSeq)
    assert(out.head._2 > 0.99)
  }

  test("rangeSearch returns exactly the vectors above the radius; no heap") {
    // threshold between cluster 0 (cosine ≈ 1) and cluster 1 (≈ 0):
    // the radius set must be exactly cluster 0, matching a filtered
    // full brute-force scan
    val out = Similarity.rangeSearch(emb, "vec_id", "embedding", query, 0.5)
      .as[(Long, Double)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    val all = Similarity.bruteForceTopK(emb, "vec_id", "embedding", query, 6)
      .as[(Long, Double)].collect().filter(_._2 >= 0.5).sortBy(_._1)
    assert(out.toSeq == all.toSeq)
    // scan-stage shape: no Exchange in the plan (the gate's sort is
    // added at the call site, not by the operator)
    val plan = Similarity.rangeSearch(emb, "vec_id", "embedding", query, 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("centroids computes per-cell mean vectors in position order") {
    val c = Similarity.centroids(emb, "label", "embedding")
      .as[(Int, Seq[Double])].collect().toMap
    assert(math.abs(c(0).head - (1.0f + 0.9f + 1.0f) / 3.0) < 1e-6)
    assert(c(0).size == 4 && c(1).size == 4)
    assert(c(1)(3) > 0.9) // last dim mean of cluster 1
  }

  test("ivfTopK with nprobe=1 searches only the query's nearest cell") {
    val out = Similarity.ivfTopK(emb, "vec_id", "embedding", "label", query,
      k = 10, nprobe = 1).as[(Long, Double)].collect()
    assert(out.map(_._1).toSet == Set(1L, 2L, 3L)) // only cluster 0 scanned
  }

  test("lshTopK candidates contain the true nearest neighbor") {
    val planes = Similarity.hyperplanes(dim = 4, numTables = 6,
      bitsPerTable = 2, seed = 7L)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", query, 1)
      .as[(Long, Double)].collect().head
    val out = Similarity.lshTopK(emb, "vec_id", "embedding", query, 3, planes)
      .as[(Long, Double)].collect()
    assert(out.nonEmpty)
    assert(out.head._1 == brute._1) // few tables x few bits => high recall here
  }

  test("hyperplanes are deterministic for a fixed seed") {
    val a = Similarity.hyperplanes(8, 2, 4, 42L)
    val b = Similarity.hyperplanes(8, 2, 4, 42L)
    assert(a.flatten.flatten.toSeq == b.flatten.flatten.toSeq)
  }

  test("probeBuckets enumerates <=2-bit perturbation sets in Lv score order") {
    val planes = Similarity.hyperplanes(4, 2, 4, seed = 13L)
    val q = Seq(0.3, -0.2, 0.7, 0.05)
    // brute-force reference: every non-empty subset of <= 2 bits,
    // scored by the sum of 6-dp-rounded margins, ties by mask
    def round6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = planes.map { tbl =>
      val m = tbl.map(p => round6(math.abs(
        p.zip(q).map { case (a, b) => a * b }.sum)))
      val exact = tbl.zipWithIndex.map { case (p, b) =>
        if (p.zip(q).map { case (a, c) => a * c }.sum > 0) 1L << b else 0L
      }.foldLeft(0L)(_ | _)
      val subsets =
        (0 until 4).map(i => (m(i), 1L << i)) ++
          (for { i <- 0 until 4; j <- (i + 1) until 4 }
            yield (m(i) + m(j), (1L << i) | (1L << j)))
      exact +: subsets.sortBy { case (s, k) => (s, k) }
        .map { case (_, k) => exact ^ k }
    }
    val reach = 1 + 4 + 6
    val got = Similarity.probeBuckets(planes, q, probes = reach)
    assert(got == expect.toSeq.map(_.toSeq))
    // every shorter probe count is a strict prefix (nested sequence)
    (1 until reach).foreach { p =>
      assert(Similarity.probeBuckets(planes, q, p) ==
        got.map(_.take(p)))
    }
    intercept[IllegalArgumentException] {
      Similarity.probeBuckets(planes, q, probes = reach + 1)
    }
  }

  test("sqQuantize maps components into [-127, 127] with max|x| at ±127") {
    val maxAbs = Similarity.sqMaxAbs(emb, "embedding")
    assert(math.abs(maxAbs - 1.0) < 1e-9)
    val qs = emb.select(Similarity.sqQuantize($"embedding", maxAbs).as("q"))
      .as[Seq[Int]].collect()
    assert(qs.flatten.forall(v => v >= -127 && v <= 127))
    assert(qs.flatten.max == 127) // the max-magnitude component saturates
    intercept[IllegalArgumentException] {
      Similarity.sqQuantize($"embedding", 0.0)
    }
  }

  test("sqTopK with full rerank equals bruteForceTopK; small rerank is k-bounded") {
    val maxAbs = Similarity.sqMaxAbs(emb, "embedding")
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", query, 3)
      .as[(Long, Double)].collect().toSeq
    val full = Similarity.sqTopK(emb, "vec_id", "embedding", query,
        k = 3, rerank = 6, maxAbs = maxAbs)
      .as[(Long, Double)].collect().toSeq
    assert(full == exact) // rerank covers the corpus -> exact result
    val narrow = Similarity.sqTopK(emb, "vec_id", "embedding", query,
        k = 2, rerank = 3, maxAbs = maxAbs)
      .as[(Long, Double)].collect().toSeq
    assert(narrow.size == 2)
    // deterministic: same candidates, same ranking, every run
    val again = Similarity.sqTopK(emb, "vec_id", "embedding", query,
        k = 2, rerank = 3, maxAbs = maxAbs)
      .as[(Long, Double)].collect().toSeq
    assert(again == narrow)
    intercept[IllegalArgumentException] {
      Similarity.sqTopK(emb, "vec_id", "embedding", query,
        k = 5, rerank = 3, maxAbs = maxAbs)
    }
    // both stages are TakeOrdered — no global sort, no shuffle
    val plan = Similarity.sqTopK(emb, "vec_id", "embedding", query,
        k = 2, rerank = 3, maxAbs = maxAbs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("bqTopK: packed hamming == direct sign-mismatch count; full " +
      "rerank equals brute force; >64 dims span words") {
    val means = Similarity.bqMeans(emb, "embedding")
    assert(means.length == 4)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", query, 3)
      .as[(Long, Double)].collect().toSeq
    val full = Similarity.bqTopK(emb, "vec_id", "embedding", query,
        k = 3, rerank = 6, means = means)
      .as[(Long, Double)].collect().toSeq
    assert(full == exact) // rerank covers the corpus -> exact result
    // both stages TakeOrdered — no global sort, no shuffle
    val plan = Similarity.bqTopK(emb, "vec_id", "embedding", query,
        k = 2, rerank = 3, means = means)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // packing correctness across the word boundary: 70-dim vectors
    // land bits in TWO longs; the packed-XOR-popcount candidate order
    // must equal a direct per-dimension sign-mismatch count
    val d = 70
    val rnd = new scala.util.Random(7)
    val wide = (1L to 20L).map(i =>
        (i, Array.fill(d)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val wq = Seq.tabulate(d)(j => math.sin(j * 0.7))
    val wMeans = Similarity.bqMeans(wide, "embedding")
    assert(wMeans.length == d)
    val got = Similarity.bqTopK(wide, "vec_id", "embedding", wq,
        k = 20, rerank = 20, means = wMeans)
      .as[(Long, Double)].collect().map(_._1).toSeq
    // reference: hamming computed WITHOUT packing, then the same exact
    // cosine rerank ordering
    val rows = wide.as[(Long, Seq[Float])].collect()
    def bits(v: Seq[Double]) = v.zip(wMeans).map { case (x, m) => x > m }
    val qb = bits(wq)
    val ham = rows.map { case (id, v) =>
      id -> bits(v.map(_.toDouble)).zip(qb).count(p => p._1 != p._2)
    }.toMap
    // with rerank == corpus the output is the exact cosine order, so
    // check the CANDIDATE stage directly instead: top-5 by (ham, id)
    val wantCand = rows.map(_._1).sortBy(id => (ham(id), id)).take(5)
    val gotCand = Similarity.bqTopK(wide, "vec_id", "embedding", wq,
        k = 5, rerank = 5, means = wMeans)
      .as[(Long, Double)].collect().map(_._1).toSet
    assert(gotCand == wantCand.toSet, s"$gotCand vs $wantCand")
    assert(got.length == 20)
  }

  test("mrlTopK: full rerank equals brute force; prefix stage really " +
      "truncates") {
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", query, 3)
      .as[(Long, Double)].collect().toSeq
    val full = Similarity.mrlTopK(emb, "vec_id", "embedding", query,
        k = 3, rerank = 6, prefixDims = 2)
      .as[(Long, Double)].collect().toSeq
    assert(full == exact)
    // candidate stage really scores the PREFIX only: with rerank == k,
    // the survivors are exactly the top-k by (6-dp prefix cosine desc,
    // id asc) — computed independently here (note cosine is magnitude-
    // blind: vector 6's tiny (0.1, 0) prefix is near-parallel to the
    // query prefix and legitimately outranks vector 2)
    def pcos(v: Seq[Float]): Double = {
      val p = v.take(2).map(_.toDouble); val q2 = query.take(2)
      val d = p.zip(q2).map { case (a, b) => a * b }.sum
      val n = math.sqrt(p.map(x => x * x).sum) *
        math.sqrt(q2.map(x => x * x).sum)
      if (n == 0) -2.0
      else BigDecimal(d / n).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    val rows3 = emb.select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect()
    val want = rows3.map { case (id, v) => (id, pcos(v)) }
      .sortBy { case (id, s) => (-s, id) }.take(3).map(_._1).toSet
    val narrow = Similarity.mrlTopK(emb, "vec_id", "embedding", query,
        k = 3, rerank = 3, prefixDims = 2)
      .as[(Long, Double)].collect().map(_._1).toSet
    assert(narrow == want, s"$narrow vs $want")
    intercept[IllegalArgumentException] {
      Similarity.mrlTopK(emb, "vec_id", "embedding", query,
        k = 3, rerank = 3, prefixDims = 9)
    }
    val plan = Similarity.mrlTopK(emb, "vec_id", "embedding", query,
        k = 2, rerank = 3, prefixDims = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("blockKnn returns k best partners per anchor within a block") {
    val out = Similarity.blockKnn(emb, "vec_id", "embedding", "label", k = 1)
      .as[(Long, Long, Double)].collect()
    assert(out.length == 6) // every row has one nearest in its block
    out.foreach { case (a, b, s) => assert(a != b && s > 0.8) }
  }

  test("blockKnn maxScore mines hard negatives below the aggregator") {
    // anchor 1's two nearest neighbors are near-duplicates; the
    // informative (hard-negative) partner is vector 4 at cosine ~0.7
    val vs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (2L, Array(1.0f, 0.01f, 0.0f, 0.0f), 0),  // dup of 1
      (3L, Array(0.999f, 0.04f, 0.0f, 0.0f), 0), // dup of 1
      (4L, Array(0.7f, 0.7f, 0.0f, 0.1f), 0)
    ).toDF("vec_id", "embedding", "label")
    val negs = Similarity.blockKnn(vs, "vec_id", "embedding", "label",
        k = 1, maxScore = 0.95)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    // anchor 1 still yields a negative — the dup band is excluded
    // BELOW the k-bounded aggregator, not filtered off the top-k
    assert(negs(1L) == 4L)
    // the naive post-filter would lose anchor 1 entirely: its top-1 is
    // a duplicate
    val postFiltered = Similarity.blockKnn(vs, "vec_id", "embedding",
        "label", k = 1)
      .filter($"score" < 0.95)
      .as[(Long, Long, Double)].collect().map(_._1).toSet
    assert(!postFiltered.contains(1L))
    // default maxScore excludes nothing
    assert(Similarity.blockKnn(vs, "vec_id", "embedding", "label", k = 1)
      .count() == 4)
  }

  test("blockKnn drops zero-norm vectors instead of crashing on NULL score") {
    // cosine is undefined for the zero vector: the pair must be dropped
    // (the aggregator's tuple encoder is non-nullable — a NULL score
    // would kill the whole query)
    val withZero = emb.union(Seq((7L, Array(0.0f, 0.0f, 0.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label"))
    val out = Similarity.blockKnn(withZero, "vec_id", "embedding", "label", k = 5)
      .as[(Long, Long, Double)].collect()
    assert(!out.exists(r => r._1 == 7L || r._2 == 7L))
    assert(out.map(_._1).distinct.sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("blockKnn rejects non-integral id columns with a clear message") {
    // the k-bounded aggregator ranks through signed-long negation, so a
    // string/UUID key must fail eagerly, not as an ANSI cast error (or
    // silent null anchors) inside the aggregation
    val strIds = Seq(("a", Array(1.0f, 0.0f, 0.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val e = intercept[IllegalArgumentException] {
      Similarity.blockKnn(strIds, "vec_id", "embedding", "label", k = 1)
    }
    assert(e.getMessage.contains("integral id"))
  }

  test("blockKnn on one dominant block: k-bounded shuffle, no window sort") {
    // 400 rows in a single block — the skew case the sub-bucket + partial
    // top-k formulation exists for. Ground truth is the full-product
    // window rank; the operator must match it while shuffling far fewer
    // rows than the directed pair product and planning no Window at all.
    val n = 400
    val rnd = new scala.util.Random(7)
    val big = (1 to n).map(i => (i.toLong, Array.fill(8)(rnd.nextFloat()), 0))
      .toDF("vec_id", "embedding", "label").persist()
    big.count()
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val out = Similarity.blockKnn(big, "vec_id", "embedding", "label", k = 3)
      val got = out.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

      import org.apache.spark.sql.expressions.Window
      val aa = big.select(col("label").as("_blk"), col("vec_id").as("id_a"),
        col("embedding").as("_va"))
      val bb = big.select(col("label").as("_blk"), col("vec_id").as("id_b"),
        col("embedding").as("_vb"))
      val w = Window.partitionBy(col("id_a"))
        .orderBy(col("score").desc, col("id_b").asc)
      val expected = aa.join(bb, Seq("_blk"))
        .filter(col("id_a") =!= col("id_b"))
        .withColumn("score", round(
          graft.functions.VectorFunctions.cosine(col("_va"), col("_vb")), 6))
        .withColumn("_rn", row_number().over(w)).filter(col("_rn") <= 3)
        .select("id_a", "id_b", "score").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == expected)

      val plan = out.queryExecution.executedPlan
      assert(!plan.toString.contains("Window"),
        "blockKnn must not rank via a window over the pair product")
      val shuffled = plan.collect {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          s.metrics.get("shuffleRecordsWritten")
            .orElse(s.metrics.get("numOutputRows")).map(_.value).getOrElse(0L)
      }.sum
      // directed pair product would be n*(n-1); sub-bucket join inflation
      // plus the k-bounded partial-aggregate state must stay way below it
      assert(shuffled < n.toLong * (n - 1) / 10,
        s"shuffled $shuffled rows — not candidate-bounded")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prev)
      big.unpersist()
    }
  }

  test("dimStats: exact integer moments match hand computation, partition-invariant") {
    import spark.implicits._
    // dim 1: values 1, 3 → mean 2, std = sqrt((2*10-16))/2e6... exact:
    // xm = (1e6, 3e6); n=2; s=4e6; ss=1e13; n*ss - s*s = 4e12 → std 1.0
    // dim 2: values 2, 2 → std 0
    val emb = Seq(
      (1L, Array(1.0f, 2.0f)), (2L, Array(3.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.dimStats(emb, "embedding")
      .orderBy("dim").as[(Int, Long, Double, Double)].collect().toSeq
    assert(got == Seq((1, 2L, 2.0, 1.0), (2, 2L, 2.0, 0.0)))
    // repartitioning must not perturb a digit
    val re = Similarity.dimStats(emb.repartition(7), "embedding")
      .orderBy("dim").as[(Int, Long, Double, Double)].collect().toSeq
    assert(re == got)
  }
}
