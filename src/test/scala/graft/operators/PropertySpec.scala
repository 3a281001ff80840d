package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** SURVEY §5 property tests: AutoID density, shingle integrity and merge
  * completeness hold for arbitrary generated inputs, not just fixtures.
  * Generators are sampled manually with fixed seeds (the scalatestplus
  * bridge isn't in the offline dependency set), so runs are reproducible.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default.withSize(60), Seed(42L + i)))

  test("withDenseId: ids are a dense 1..n permutation in key order, any input") {
    val gen = Gen.nonEmptyListOf(Gen.choose(-100000L, 100000L))
    samples(gen, 5).foreach { xs =>
      val keys = xs.distinct
      val df = keys.toDF("k")
      val out = Ids.withDenseId(df, "id", Seq(col("k")), numPartitions = 3)
        .select("k", "id").as[(Long, Long)].collect().sortBy(_._2)
      assert(out.map(_._2).toSeq == (1L to keys.length))
      assert(out.map(_._1).toSeq == keys.sorted)
    }
  }

  test("shingles: count bounded by tokens-n+1, all trigrams, distinct") {
    val gen = Gen.listOf(Gen.oneOf("a", "b", "c", "dd", "ee"))
      .map(_.mkString(" "))
    samples(gen, 8).foreach { text =>
      val sh = Seq(text).toDF("t")
        .select(Dedup.shingles(col("t"), 3).as("s"))
        .as[Seq[String]].head()
      val tokens = text.split(" ", -1).length
      assert(sh.length <= math.max(tokens - 2, 0))
      assert(sh.forall(_.split(" ", -1).length == 3))
      assert(sh.distinct.length == sh.length)
    }
  }

  test("merge upsert: every key lands exactly once with the right value") {
    val rowGen = Gen.listOf(Gen.zip(Gen.choose(0L, 30L), Gen.choose(0, 1000)))
    samples(Gen.zip(rowGen, rowGen), 5).foreach { case (t, u) =>
      val tRows = t.distinctBy(_._1)
      val uRows = u.distinctBy(_._1)
      if (tRows.nonEmpty || uRows.nonEmpty) {
        val target = tRows.toDF("k", "v")
        val updates = uRows.toDF("k", "v")
        val out = Upsert.merge(target, updates, Seq("k"))
          .as[(Long, Int)].collect()
        assert(out.length == out.map(_._1).distinct.length)
        val om = out.toMap
        val tm = tRows.toMap; val um = uRows.toMap
        assert(om.keySet == tm.keySet ++ um.keySet)
        om.foreach { case (k, v) =>
          assert(um.get(k).orElse(tm.get(k)).contains(v))
        }
      }
    }
  }

  test("bounded-blocking dedup equals uncapped for arbitrary corpora, " +
      "caps and thresholds") {
    // tiny vocabulary (13 words) forces heavy shingle sharing, and
    // maxBlock ∈ [1, 5] forces most shingles onto the HOT leg — the
    // prefix-witness recovery path, the hot array_intersect, and the
    // relative-ε prefix length all carry weight on every sample
    val wordGen = Gen.choose(0, 12).map(i => s"w$i")
    val docGen = Gen.choose(3, 12)
      .flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))
    val caseGen = Gen.zip(
      Gen.choose(4, 10).flatMap(n => Gen.listOfN(n, docGen)),
      Gen.choose(0.1, 0.9), Gen.choose(1L, 5L))
    samples(caseGen, 4).foreach { case (texts, t, mb) =>
      val docs = texts.zipWithIndex
        .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "text")
      val contU = Dedup.containmentPairs(docs, "doc_id", "text",
          n = 3, threshold = t)
        .as[(Long, Long, Double)].collect().toSet
      val contH = Dedup.containmentPairsExact(docs, "doc_id", "text",
          n = 3, threshold = t, maxBlock = mb)
        .as[(Long, Long, Double)].collect().toSet
      assert(contH == contU, s"containment t=$t mb=$mb: $contH vs $contU")
      val jacU = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          n = 3, threshold = t, maxBlock = 0)
        .as[(Long, Long, Double)].collect().toSet
      val jacP = Dedup.ngramJaccardPairsExact(docs, "doc_id", "text",
          n = 3, threshold = t)
        .as[(Long, Long, Double)].collect().toSet
      assert(jacP == jacU, s"jaccard t=$t: $jacP vs $jacU")
    }
  }

  test("mergeVersioned: order-free, idempotent, max-version-per-key " +
      "for arbitrary batches") {
    // three random batches with overlapping keys and versions; the
    // landed table must be a pure function of the batch SET — any
    // application order, with or without a replay, reaches the unique
    // (key -> max-version row) answer the reference model computes
    val rowGen = Gen.listOf(Gen.zip(
      Gen.choose(0L, 12L), Gen.choose(0, 99), Gen.choose(0L, 5L)))
    samples(Gen.zip(rowGen, rowGen, rowGen), 5).foreach {
      case (a0, b0, c0) =>
        // one row per (key, ver) per batch keeps the model unambiguous
        // (equal-version ties resolve by value desc — mirror it)
        val Seq(a, b, c) = Seq(a0, b0, c0)
          .map(_.distinctBy(r => (r._1, r._3)))
        if (a.nonEmpty) {
          val model: Map[Long, (Long, Int, Long)] =
            (a ++ b ++ c).groupBy(_._1).map { case (k, rows) =>
              k -> rows.maxBy(r => (r._3, r._2))
            }
          def df(rs: Seq[(Long, Int, Long)]) = rs.toDF("k", "v", "ver")
          def apply2(orders: Seq[Seq[(Long, Int, Long)]]): Map[Long, (Long, Int, Long)] =
            orders.tail.foldLeft(df(orders.head)) { (acc, u) =>
              if (u.isEmpty) acc
              else Upsert.mergeVersioned(acc, df(u), Seq("k"), "ver")
            }.as[(Long, Int, Long)].collect().map(r => r._1 -> r).toMap
          // every application order of the batch set lands the model
          Seq(a, b, c).permutations.foreach { perm =>
            assert(apply2(perm) == model,
              s"order ${perm.map(_.size)} diverged from the model")
          }
          // at-least-once delivery: a replayed batch changes nothing
          assert(apply2(Seq(a, b, c, b)) == model)
          assert(apply2(Seq(a, b, c, a, c)) == model)
        }
    }
  }
}
