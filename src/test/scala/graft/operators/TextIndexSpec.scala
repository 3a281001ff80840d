package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextIndexSpec extends SparkSpec {
  import spark.implicits._

  test("tfidfTopTerms scores tf*ln(N/df), ranks deterministically") {
    val docs = Seq(
      (1L, "a a b"),   // tf(a)=2 df(a)=2; tf(b)=1 df(b)=1
      (2L, "a c c c")  // tf(c)=3 df(c)=1
    ).toDF("id", "txt")
    val out = TextIndex.tfidfTopTerms(docs, "id", "txt", k = 1)
      .as[(Long, String, Long, Double)].collect().sortBy(_._1)
    // doc 1: a scores 2*ln(1)=0, b scores 1*ln(2) -> b wins
    // doc 2: c scores 3*ln(2) > a's 0
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1L, "b", 1L), (2L, "c", 3L)))
    assert(math.abs(out(0)._4 - math.log(2.0)) < 1e-12)
    assert(math.abs(out(1)._4 - 3 * math.log(2.0)) < 1e-12)
  }

  test("search: bucket-pruned probe equals the brute-force intersection") {
    val docs = Seq(
      (1L, "spark join scan"), (2L, "join batch"), (3L, "spark batch"),
      (4L, "spark join other"), (5L, "none here")).toDF("id", "txt")
    val base = java.nio.file.Files
      .createTempDirectory("textindex").toString
    val postings = TextIndex.buildPostings(docs, "id", "txt", base,
      buckets = 8)
    val hits = TextIndex.search(postings, Seq("spark", "join"),
        buckets = 8)
      .as[Long].collect().sorted.toSeq
    assert(hits == Seq(1L, 4L))
    // single-term search degenerates to the posting list
    assert(TextIndex.search(postings, Seq("batch"), buckets = 8)
      .as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    // the artifact is reused, not rebuilt: drop a marker row into the
    // corpus and confirm the served postings don't see it
    val postings2 = TextIndex.buildPostings(
      docs.unionAll(Seq((6L, "spark join")).toDF("id", "txt")),
      "id", "txt", base, buckets = 8)
    assert(TextIndex.search(postings2, Seq("spark", "join"), buckets = 8)
      .as[Long].collect().sorted.toSeq == Seq(1L, 4L))
  }
}
