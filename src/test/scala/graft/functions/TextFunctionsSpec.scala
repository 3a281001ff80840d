package graft.functions

import graft.SparkSpec
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the cat and the dog"),
    (2L, "le chat et la le les"),
    (3L, "xyz qrs!!!"),
    (4L, "dog the and cat the") // permutation of 1's tokens
  ).toDF("doc_id", "text")

  test("dupNgramRatio measures repeated n-gram occurrences") {
    // "a b a b a b": trigrams = [a b a, b a b, a b a, b a b] -> 2 distinct
    // of 4 occurrences -> ratio 0.5
    val rep = Seq((1L, "a b a b a b"), (2L, "one two three four"),
      (3L, "ab")).toDF("doc_id", "text")
    val m = rep.select($"doc_id", TF.dupNgramRatio($"text", 3))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(m(1L) - 0.5) < 1e-9)
    assert(m(2L) == 0.0) // all trigrams distinct
    assert(m(3L) == 0.0) // shorter than n -> no shingles, defined as 0
  }

  test("topTokenRatio is the most frequent token's share") {
    val rep = Seq((1L, "spam spam spam eggs"), (2L, "all words differ here"))
      .toDF("doc_id", "text")
    val m = rep.select($"doc_id", TF.topTokenRatio($"text"))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(m(1L) - 0.75) < 1e-9)
    assert(math.abs(m(2L) - 0.25) < 1e-9)
  }

  test("repetition metrics are row-local: no shuffle in the plan") {
    val plan = docs.select(TF.dupNgramRatio($"text", 3),
        TF.topTokenRatio($"text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("scrubPii redacts emails, IPv4s, and phone numbers in order") {
    val pii = Seq((1L,
      "mail a.b+c@ex.co or x@y.io, host 192.168.0.1, call +15550001234, keep 1.2 and v2.0.1")
    ).toDF("doc_id", "text")
    val out = pii.select(TF.scrubPii($"text")).as[String].head()
    assert(out ==
      "mail <EMAIL> or <EMAIL>, host <IP>, call <PHONE>, keep 1.2 and v2.0.1")
    // no PII -> identity
    val clean = Seq((1L, "plain prose with no contacts")).toDF("doc_id", "text")
    assert(clean.select(TF.scrubPii($"text")).as[String].head() ==
      "plain prose with no contacts")
    // scan-stage expression chain: no shuffle
    val plan = pii.select(TF.scrubPii($"text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("tokenCount is a single-space split count") {
    val m = docs.select($"doc_id", TF.tokenCount($"text")).as[(Long, Int)]
      .collect().toMap
    assert(m(1L) == 5 && m(3L) == 2)
  }

  test("occurrences counts non-overlapping literal hits") {
    val n = docs.filter($"doc_id" === 1)
      .select(TF.occurrences(concat(lit(" "), $"text", lit(" ")), " the "))
      .as[Int].head()
    assert(n == 2)
  }

  test("punctRatio measures non-alphanumeric share") {
    val r = docs.filter($"doc_id" === 3).select(TF.punctRatio($"text"))
      .as[Double].head()
    assert(math.abs(r - 3.0 / 10.0) < 1e-9)
  }

  test("stopwordRatio hits only at token boundaries") {
    val sw = Seq("the", "and")
    val r = docs.filter($"doc_id" === 1)
      .select(TF.stopwordRatio($"text", sw)).as[Double].head()
    assert(math.abs(r - 3.0 / 5.0) < 1e-9)
  }

  test("qualityScore stays in [0,1] and favors clean prose") {
    val sw = Seq("the", "and", "of", "a")
    val scores = docs.select($"doc_id", TF.qualityScore($"text", sw))
      .as[(Long, Double)].collect().toMap
    assert(scores.values.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores(1L) > scores(3L))
  }

  test("langId picks argmax lexicon, und when nothing hits") {
    val preds = docs.select($"doc_id", TF.langId($"text")).as[(Long, String)]
      .collect().toMap
    assert(preds(1L) == "en")
    assert(preds(2L) == "fr")
    assert(preds(3L) == "und")
  }

  test("fingerprint is order-insensitive on the token set") {
    val fps = docs.select($"doc_id", TF.fingerprint($"text")).as[(Long, String)]
      .collect().toMap
    assert(fps(1L) == fps(4L))
    assert(fps(1L) != fps(2L))
  }

  test("chunks tile the doc with the requested overlap; short docs yield one chunk") {
    val d = Seq((1L, (1 to 20).map(i => s"t$i").mkString(" ")),
      (2L, "a b c")).toDF("doc_id", "text")
    val out = d.select($"doc_id",
        org.apache.spark.sql.functions.explode(TF.chunks($"text", 8, 2)).as("c"))
      .select($"doc_id", $"c.idx", $"c.start", $"c.n_tokens", $"c.chunk")
      .as[(Long, Int, Long, Long, String)].collect()
    val doc1 = out.filter(_._1 == 1L).sortBy(_._2)
    // starts 1, 7, 13 (step 6): consecutive chunks share 2 tokens and
    // the last is truncated to the doc end
    assert(doc1.map(t => (t._2, t._3, t._4)).toSeq ==
      Seq((1, 1L, 8L), (2, 7L, 8L), (3, 13L, 8L)))
    assert(doc1(0)._5.split(" ").takeRight(2).toSeq ==
      doc1(1)._5.split(" ").take(2).toSeq)
    // full coverage: union of [start, start+n) is 1..20
    assert(doc1.flatMap(t => t._3 until (t._3 + t._4)).distinct.sorted.toSeq
      == (1L to 20L))
    val doc2 = out.filter(_._1 == 2L)
    assert(doc2.length == 1 && doc2.head._4 == 3L && doc2.head._5 == "a b c")
    intercept[IllegalArgumentException] { TF.chunks($"text", 8, 8) }
  }

  test("contentChunks: full coverage, edit locality, short-doc identity") {
    val words = (1 to 80).map(i => s"w${i * 7 % 97}")
    val text = words.mkString(" ")
    def chunksOf(s: String): Seq[(Long, Long, String)] =
      Seq(s).toDF("text")
        .select(explode(TF.contentChunks($"text", 4, 16)).as("c"))
        .select($"c.start", $"c.n_tokens", $"c.chunk")
        .as[(Long, Long, String)].collect().toSeq
    val cs = chunksOf(text)
    // coverage: chunks tile the doc exactly, in order, no gaps
    assert(cs.head._1 == 1L)
    cs.sliding(2).foreach {
      case Seq(a, b) => assert(b._1 == a._1 + a._2)
      case _ => ()
    }
    assert(cs.map(_._3).mkString(" ") == text)
    assert(cs.length >= 2, s"expected multiple chunks, got ${cs.length}")
    // edit locality: prepending tokens shifts POSITIONS but preserves
    // almost every chunk's CONTENT (boundaries are local-context
    // hashes) — the property fixed-size chunking lacks
    val edited = "zzz qqq " + text
    val shared = chunksOf(edited).map(_._3).toSet
      .intersect(cs.map(_._3).toSet)
    assert(shared.size >= cs.length - 2,
      s"only ${shared.size}/${cs.length} chunks survived a front edit")
    // fixed-size chunking loses everything under the same edit
    def fixedHashes(s: String) = Seq(s).toDF("text")
      .select(explode(TF.chunks($"text", 16, 0)).as("c"))
      .select($"c.chunk").as[String].collect().toSet
    assert(fixedHashes(edited).intersect(fixedHashes(text)).size
      <= 1) // at most the ragged tail coincides
    // a doc shorter than the window is one chunk of itself
    assert(chunksOf("a b c") == Seq((1L, 3L, "a b c")))
    intercept[IllegalArgumentException] {
      TF.contentChunks($"text", 4, 1)
    }
  }

  test("gearChunks: same contract as contentChunks, token-grain hashing") {
    val words = (1 to 80).map(i => s"w${i * 7 % 97}")
    val text = words.mkString(" ")
    def chunksOf(s: String): Seq[(Long, Long, String)] =
      Seq(s).toDF("text")
        .select(explode(TF.gearChunks($"text", 4, 16)).as("c"))
        .select($"c.start", $"c.n_tokens", $"c.chunk")
        .as[(Long, Long, String)].collect().toSeq
    val cs = chunksOf(text)
    // coverage: chunks tile the doc exactly, in order, no gaps
    assert(cs.head._1 == 1L)
    cs.sliding(2).foreach {
      case Seq(a, b) => assert(b._1 == a._1 + a._2)
      case _ => ()
    }
    assert(cs.map(_._3).mkString(" ") == text)
    assert(cs.length >= 2, s"expected multiple chunks, got ${cs.length}")
    // edit locality: a front edit shifts positions, not content
    val edited = "zzz qqq " + text
    val shared = chunksOf(edited).map(_._3).toSet
      .intersect(cs.map(_._3).toSet)
    assert(shared.size >= cs.length - 2,
      s"only ${shared.size}/${cs.length} chunks survived a front edit")
    // a doc shorter than the window is one chunk of itself
    assert(chunksOf("a b c") == Seq((1L, 3L, "a b c")))
    intercept[IllegalArgumentException] { TF.gearChunks($"text", 4, 1) }
    intercept[IllegalArgumentException] { TF.gearChunks($"text", 5, 16) }
  }

  test("gopherFlags: each rule trips on its designed violation") {
    val sw = Seq("the", "and", "of", "a")
    val good = ("the quick brown fox and the lazy dog went of to town " * 5)
      .trim // 60 words, prose-shaped: passes every rule
    val docs = Seq(
      (1L, good),
      (2L, "the and of short"),                  // < 50 words
      (3L, ("ab " * 60).trim),                   // mean word len 2 < 3
      (4L, (("####### " * 30) + good)),          // '#' ratio >= 0.1
      (5L, good.split(" ").map(w => "12345").mkString(" ")), // no alpha
      (6L, ("word " * 60).trim),                 // no stopwords
      (7L, (1 to 10).map(i => "- " + good).mkString("\n")), // all bullet lines
      (8L, (1 to 10).map(_ => good + " x...").mkString("\n"))) // all ...-ended
      .toDF("doc_id", "text")
    val got = docs
      .withColumn("g", TF.gopherFlags($"text", sw))
      .select($"doc_id", $"g.wc_ok", $"g.mwl_ok", $"g.hash_ok",
        $"g.alpha_ok", $"g.stop_ok", $"g.bullet_ok", $"g.line_dots_ok",
        $"g.keep")
      .as[(Long, Int, Int, Int, Int, Int, Int, Int, Int)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) == (1L, 1, 1, 1, 1, 1, 1, 1, 1))
    assert(got(2L)._2 == 0 && got(2L)._9 == 0)  // wc_ok trips
    assert(got(3L)._3 == 0)                      // mwl_ok trips
    assert(got(4L)._4 == 0)                      // hash_ok trips
    assert(got(5L)._5 == 0)                      // alpha_ok trips
    assert(got(6L)._6 == 0)                      // stop_ok trips
    assert(got(7L)._7 == 0)                      // bullet_ok trips
    assert(got(8L)._8 == 0)                      // line_dots_ok trips
  }

  test("c4Flags: line retention and page rules on realistic fixtures") {
    val bad = Seq("badword")
    val phrases = Seq("lorem ipsum")
    val goodLine = "this line has enough words to survive."
    val docs = Seq(
      // 3 terminal-punct lines of >=5 words: kept, 3 sentences, keep=1
      (1L, s"$goodLine\n$goodLine\n$goodLine"),
      // line without terminal punct + line of 4 words + javascript line
      // all drop -> 2 sentences left -> page fails the >=3 rule
      (2L, s"$goodLine\nno terminal punctuation on this one\n" +
        s"too few words here.\nenable javascript to view this.\n$goodLine"),
      // banned phrase anywhere kills the page even with clean lines
      (3L, s"$goodLine\n$goodLine\nsome Lorem Ipsum boilerplate.\n$goodLine"),
      // curly brace = code page
      (4L, s"$goodLine\nif (x) { return y; }\n$goodLine\n$goodLine"),
      // blocklist word at token boundary (substring hits must NOT trip)
      (5L, s"$goodLine\na badword appears right here.\n$goodLine\n$goodLine"),
      (6L, s"$goodLine\nnotbadwordhere stays perfectly fine ok.\n" +
        s"$goodLine\n$goodLine"),
      // quote and ! and ? all count as terminal punctuation
      (7L, "he said \"five words are here.\"\nare five words enough here?\n" +
        "yes five words are enough!"))
      .toDF("doc_id", "text")
    val got = docs.withColumn("c", TF.c4Flags($"text", bad, phrases))
      .select($"doc_id", $"c.n_lines", $"c.n_kept", $"c.n_sentences",
        $"c.no_badword", $"c.no_phrase", $"c.no_brace", $"c.keep")
      .as[(Long, Int, Int, Int, Int, Int, Int, Int)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) == (1L, 3, 3, 3, 1, 1, 1, 1))
    assert(got(2L)._2 == 5 && got(2L)._3 == 2 && got(2L)._8 == 0)
    assert(got(3L)._5 == 1 && got(3L)._6 == 0 && got(3L)._8 == 0)
    assert(got(4L)._7 == 0 && got(4L)._8 == 0)
    assert(got(5L)._5 == 0 && got(5L)._8 == 0)  // boundary badword trips
    assert(got(6L)._5 == 1 && got(6L)._8 == 1)  // substring does NOT trip
    assert(got(7L)._3 == 3 && got(7L)._4 == 3 && got(7L)._8 == 1)
  }

  test("c4Flags: clean_md5 fingerprints exactly the retained lines") {
    val keepMe = "these words survive the filter fine."
    val dropMe = "dropped for lacking punctuation"
    val doc = Seq((1L, s"$keepMe\n$dropMe\n$keepMe")).toDF("doc_id", "text")
    val md5got = doc
      .select(TF.c4Flags($"text", Seq("zzz"), Seq("zzz")).getField("clean_md5"))
      .as[String].head()
    val expect = doc.select(md5(lit(s"$keepMe\n$keepMe"))).as[String].head()
    assert(md5got == expect)
    // empty retention -> md5 of the empty string, not null
    val none = Seq((1L, dropMe)).toDF("doc_id", "text")
      .select(TF.c4Flags($"text", Seq("zzz"), Seq("zzz")).getField("clean_md5"))
      .as[String].head()
    assert(none == doc.select(md5(lit(""))).as[String].head())
  }

  test("c4Flags is row-local: no shuffle in the plan") {
    val plan = docs.select(TF.c4Flags($"text", Seq("x"), Seq("y")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("gearChunks is row-local: no shuffle in the plan") {
    val plan = docs.select(explode(TF.gearChunks($"text", 4, 16)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
