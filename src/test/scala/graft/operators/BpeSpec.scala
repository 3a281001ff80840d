package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("trainMerges reproduces reference BPE on a hand-traced corpus") {
    // word counts: "abab" x3, "ab" x2, "ba" x1
    // round 1 pairs: (a,b): 2*3 + 2 = 8 [abab has pairs ab,ba,ab], (b,a): 3+1 = 4 → merge ab (n=8)
    // states: "ab ab" x3, "ab" x2, "b a" x1
    // round 2: (ab,ab): 3, (b,a): 1 → merge abab (n=3)
    val docs = Seq((1L, "abab abab abab ab ab ba")).toDF("doc_id", "text")
    val got = Bpe.trainMerges(docs, "text", k = 2)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(got == Seq(
      (1, "a", "b", "ab", 8L),
      (2, "ab", "ab", "abab", 3L)))
  }

  test("overlapping pairs merge left-to-right non-overlapping (aaa -> aa a)") {
    // "aaa": round-1 pairs (a,a) x2 → merge aa with count 2; the state
    // becomes "aa a" (NOT "a aa", NOT "aaa") — round 2's top pair is
    // (aa, a) with count 1
    val docs = Seq((1L, "aaa")).toDF("doc_id", "text")
    val got = Bpe.trainMerges(docs, "text", k = 2)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(got == Seq(
      (1, "a", "a", "aa", 2L),
      (2, "aa", "a", "aaa", 1L)))
  }

  test("tokenizeWords applies the trained merges in rank order") {
    val docs = Seq((1L, "abab abab abab ab ab ba")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, "text", k = 2)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges == Seq(("a", "b"), ("ab", "ab")))
    val words = Seq("abab", "ab", "ba", "aabba").toDF("w")
    val got = Bpe.tokenizeWords(words, merges)
      .select(col("w"), col("toks"))
      .as[(String, Seq[String])].collect().toMap
    assert(got("abab") == Seq("abab")) // both merges chain
    assert(got("ab") == Seq("ab"))
    assert(got("ba") == Seq("b", "a")) // (b,a) never merged
    // unseen word: merges apply where they fit, rest stays chars
    assert(got("aabba") == Seq("a", "ab", "b", "a"))
  }

  test("ties break on (lhs, rhs) lexically; training stops when no pairs remain") {
    // "ba" x1 and "dc" x1: both pairs count 1 → (b,a) beats (d,c)
    val docs = Seq((1L, "ba dc")).toDF("doc_id", "text")
    val got = Bpe.trainMerges(docs, "text", k = 5)
      .as[(Int, String, String, String, Long)].collect().toSeq
    // after 3 merges every word is a single symbol — early stop
    assert(got == Seq(
      (1, "b", "a", "ba", 1L),
      (2, "d", "c", "dc", 1L)))
  }
}
