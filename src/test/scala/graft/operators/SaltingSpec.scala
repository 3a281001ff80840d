package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltingSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin matches plain join on skewed data") {
    // key 1 holds 90% of rows — the classic hot key
    val skewed = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, s"v$i"))
      .toDF("k", "payload")
    val dim = Seq((1L, "hot"), (950L, "cold"), (999L, "cold2"))
      .toDF("k", "name")
    val plain = skewed.join(dim, "k")
      .select("k", "payload", "name").as[(Long, String, String)]
      .collect().sorted
    val salted = Salting.saltedJoin(skewed, dim, Seq("k"), 8)
      .select("k", "payload", "name").as[(Long, String, String)]
      .collect().sorted
    assert(salted.toSeq == plain.toSeq)
    assert(salted.count(_._1 == 1L) == 900)
  }

  test("saltedDistinctCount equals exact count_distinct") {
    val df = (1 to 500).map(i => (i % 3, s"u${i % 47}")).toDF("g", "u")
    val exact = df.groupBy("g").agg(count_distinct($"u").as("n"))
      .as[(Int, Long)].collect().toMap
    val salted = Salting.saltedDistinctCount(df, Seq("g"), "u", 8)
      .as[(Int, Long)].collect().toMap
    assert(salted == exact)
  }
}
