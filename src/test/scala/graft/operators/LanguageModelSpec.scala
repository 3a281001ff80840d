package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  // corpus: "a b a b", "a b c" → tokens: a×3 b×3 c×1, T=7
  // bigrams: (a,b)×3, (b,a)×1, (b,c)×1
  private lazy val docs = Seq(
    (1L, "a b a b"),
    (2L, "a b c")).toDF("doc_id", "text")

  test("unigram and bigram counts") {
    val uni = LanguageModel.unigramCounts(docs, "text")
      .as[(String, Long)].collect().toMap
    assert(uni == Map("a" -> 3L, "b" -> 3L, "c" -> 1L))
    val bi = LanguageModel.bigramCounts(docs, "text")
      .as[(String, String, Long)].collect()
      .map { case (w1, w2, c) => (w1, w2) -> c }.toMap
    assert(bi == Map(("a", "b") -> 3L, ("b", "a") -> 1L, ("b", "c") -> 1L))
  }

  test("stupid-backoff doc scores match hand computation") {
    val uni = LanguageModel.unigramCounts(docs, "text")
    val bi = LanguageModel.bigramCounts(docs, "text")
    val got = LanguageModel.scoreStupidBackoff(docs, "doc_id", "text", uni, bi)
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 1: (a,b) (b,a) (a,b) → ln(3/3), ln(1/3), ln(3/3)
    val d1 = Seq(math.log(3.0 / 3), math.log(1.0 / 3), math.log(3.0 / 3))
      .map(r6)
    // doc 2: (a,b) (b,c) → ln(3/3), ln(1/3)
    val d2 = Seq(math.log(3.0 / 3), math.log(1.0 / 3)).map(r6)
    assert(got == Seq(
      (1L, 3L, r6(d1.sum / 3)),
      (2L, 2L, r6(d2.sum / 2))))
  }

  test("unseen bigrams back off to alpha * unigram / total") {
    val uni = LanguageModel.unigramCounts(docs, "text")
    val bi = LanguageModel.bigramCounts(docs, "text")
    // held-out doc with unseen bigrams (c,a) and (a,a)
    val held = Seq((9L, "c a a")).toDF("doc_id", "text")
    val got = LanguageModel
      .scoreStupidBackoff(held, "doc_id", "text", uni, bi, alpha = 0.4)
      .as[(Long, Long, Double)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lp = Seq(
      math.log(0.4 * 3 / 7.0), // (c,a): backoff to c1(a)=3
      math.log(0.4 * 3 / 7.0)) // (a,a): backoff to c1(a)=3
      .map(r6)
    assert(got == Seq((9L, 2L, r6(lp.sum / 2))))
  }

  test("single-token and empty docs produce no bigram rows") {
    val uni = LanguageModel.unigramCounts(docs, "text")
    val bi = LanguageModel.bigramCounts(docs, "text")
    val held = Seq((7L, "a"), (8L, "")).toDF("doc_id", "text")
    assert(LanguageModel
      .scoreStupidBackoff(held, "doc_id", "text", uni, bi).count() == 0)
  }

  test("perplexityBuckets cuts exact tertiles; ties share a bucket") {
    // 9 distinct scores: tail = 3 worst, middle = next 3, head = top 3
    val scored = (1L to 9L).map(i => (i, 2L, i.toDouble / 10))
      .toDF("doc_id", "n_bigrams", "avg_logp")
    val got = LanguageModel.perplexityBuckets(scored)
      .select($"doc_id", $"bucket").as[(Long, String)]
      .collect().toMap
    assert((1L to 3L).forall(got(_) == "tail"))
    assert((4L to 6L).forall(got(_) == "middle"))
    assert((7L to 9L).forall(got(_) == "head"))
    // a run of ties straddling a cutoff lands ENTIRELY in one bucket
    // (the compare is v <= kth-smallest VALUE, not a rank split)
    val tied = Seq((1L, 0.1), (2L, 0.5), (3L, 0.5), (4L, 0.5), (5L, 0.9))
      .map { case (id, s) => (id, 2L, s) }
      .toDF("doc_id", "n_bigrams", "avg_logp")
    val tb = LanguageModel.perplexityBuckets(tied)
      .select($"doc_id", $"bucket").as[(Long, String)].collect().toMap
    // k1 = ceil(5/3) = 2 -> cut1 = 0.5; every 0.5 doc is 'tail'
    assert(tb(1L) == "tail")
    assert(Seq(2L, 3L, 4L).forall(tb(_) == "tail"))
    assert(tb(5L) == "head")
  }
}
