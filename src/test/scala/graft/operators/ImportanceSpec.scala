package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  private val B = 64

  // target speaks "alpha beta", off-distribution speaks "gamma delta";
  // probe docs are scored against a corpus where target rows are tagged
  private def corpus = Seq(
    (1L, "alpha beta alpha beta", true),
    (2L, "alpha beta beta alpha", true),
    (3L, "gamma delta gamma delta", false),
    (4L, "gamma delta delta gamma", false),
    (5L, "alpha beta gamma delta", false),
    (6L, "", false)
  ).toDF("doc_id", "text", "tgt")

  test("target-like docs outscore off-distribution docs; empty doc is 0") {
    val scores = Importance
      .dsirScores(corpus, "doc_id", "text", col("tgt"), B)
      .as[(Long, Long)].collect().toMap
    assert(scores.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(scores(1L) > scores(5L),
      s"pure target ${scores(1L)} vs mixed ${scores(5L)}")
    assert(scores(5L) > scores(3L),
      s"mixed ${scores(5L)} vs pure off ${scores(3L)}")
    assert(scores(3L) < 0, s"off-distribution must be negative: ${scores(3L)}")
    assert(scores(6L) == 0L)
  }

  test("weight table is dense over [0, b) and integer micro-nats") {
    val w = Importance.bucketLogRatios(corpus, "text", col("tgt"), B)
    val rows = w.as[(Long, Long)].collect()
    assert(rows.length == B)
    assert(rows.map(_._1).sorted.toSeq == (0L until B.toLong))
    // unseen buckets share one smoothed ratio (absence is evidence)
    val unseenLams = rows.filter(r =>
      !Seq("alpha", "beta", "gamma", "delta").map(t =>
        math.floorMod(java.lang.Long.parseLong(
          org.apache.commons.codec.digest.DigestUtils.md5Hex(t)
            .substring(0, 8), 16), B.toLong)).contains(r._1))
      .map(_._2).distinct
    assert(unseenLams.length == 1)
  }

  test("scores are partitioning-invariant and replayable") {
    val many = (1L to 200L).map(i =>
      (i, if (i % 2 == 0) "alpha beta" else "gamma epsilon", i % 3 == 0))
      .toDF("doc_id", "text", "tgt")
    def run(parts: Int): Map[Long, Long] =
      Importance.dsirScores(many.repartition(parts), "doc_id", "text",
        col("tgt"), B).as[(Long, Long)].collect().toMap
    assert(run(1) == run(13))
  }

  test("refuses a degenerate bucket count") {
    intercept[IllegalArgumentException] {
      Importance.bucketLogRatios(corpus, "text", col("tgt"), 1)
    }
  }
}
