package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalactic.Tolerance._

class TextExprSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  test("JaroWinkler matches the classic vectors (DuckDB-verified)") {
    // every expected value below was read back from DuckDB's
    // jaro_winkler_similarity — the oracle engine — not from a paper
    assert(jw("MARTHA", "MARHTA") === 0.9611111111111111)
    assert(jw("DWAYNE", "DUANE") === 0.8400000000000001 +- 1e-15)
    assert(jw("DIXON", "DICKSONX") === 0.8133333333333332 +- 1e-15)
    assert(jw("CRATE", "TRACE") === 0.7333333333333334 +- 1e-15)
    assert(jw("abc", "abc") === 1.0)
  }

  test("JaroWinkler edges: empties, boost threshold, prefix cap, bytes") {
    assert(jw("", "") === 0.0)         // DuckDB: both-empty is 0, not 1
    assert(jw("", "abc") === 0.0)
    assert(jw("a", "b") === 0.0)
    // jaro exactly 0.5 <= 0.7: NO prefix boost despite 2-char prefix
    assert(jw("abcdefgh", "abzzzzzz") === 0.5)
    // prefix caps at 4 even though 7 bytes agree
    assert(jw("aaaaaaab", "aaaaaaac") === 0.95 +- 1e-15)
    // byte semantics: 'é' is TWO utf-8 bytes (DuckDB scores café len 5)
    assert(jw("caf\u00e9", "cafe") === 0.8483333333333334 +- 1e-15)
  }

  test("JaroWinkler is symmetric and bounded on arbitrary input") {
    val rnd = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      val a = rnd.alphanumeric.take(rnd.nextInt(12)).mkString
      val b = rnd.alphanumeric.take(rnd.nextInt(12)).mkString
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0)
      assert(s === jw(b, a))
      if (a == b && a.nonEmpty) assert(s === 1.0)
    }
  }

  test("nfc collapses decomposed combining marks; fast path is identity") {
    val out = Seq(("e\u0301", 1L), ("caf\u00e9", 2L), ("plain", 3L))
      .toDF("s", "id")
      .select(col("id"), TextFunctions.nfc(col("s")).as("n"),
        length(col("s")).as("raw_len"), length(TextFunctions.nfc(col("s")))
          .as("norm_len"))
      .orderBy(col("id"))
      .as[(Long, String, Int, Int)].collect()
    assert(out(0) == ((1L, "\u00e9", 2, 1)))   // e + U+0301 -> é
    assert(out(1) == ((2L, "caf\u00e9", 4, 4))) // already NFC: untouched
    assert(out(2) == ((3L, "plain", 5, 5)))
  }

  test("jaroWinkler column runs inside codegen and handles nulls") {
    val df = Seq(("MARTHA", "MARHTA"), ("x", null))
      .toDF("a", "b")
      .select(round(TextFunctions.jaroWinkler(col("a"), col("b")), 6)
        .as("jw"))
    assert(df.collect().map(r => Option(r.get(0))).toSeq ==
      Seq(Some(0.961111), None))
  }
}
