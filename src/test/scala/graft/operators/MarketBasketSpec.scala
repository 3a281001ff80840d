package graft.operators

import graft.SparkSpec

class MarketBasketSpec extends SparkSpec {
  import spark.implicits._

  test("pairCounts: Apriori prune, duplicate rows collapse, lift math") {
    val df = Seq(
      ("b1", 1L), ("b1", 2L), ("b1", 3L),
      ("b2", 1L), ("b2", 2L), ("b2", 2L), // duplicate (b2,2) collapses
      ("b3", 1L), ("b3", 2L), ("b3", 4L), // item 4 infrequent -> pruned
      ("b4", 3L)
    ).toDF("b", "i")
    val out = MarketBasket.pairCounts(df, "b", "i", minSupport = 2)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    // only (1,2) reaches pair support 2: n_pair=3, n_1=3, n_2=3,
    // n_baskets=4 -> lift = 3*4/(3*3)
    assert(out.toSeq == Seq((1L, 2L, 3L, 3L, 3L, 1.333333)))
  }

  test("pairCounts refuses oversized baskets loudly") {
    val df = Seq(("b1", 1L), ("b1", 2L), ("b1", 3L),
      ("b2", 1L), ("b2", 2L), ("b2", 3L)).toDF("b", "i")
    val ex = intercept[Exception] {
      MarketBasket.pairCounts(df, "b", "i", minSupport = 2,
        maxBasketSize = 2).collect()
    }
    assert(ex.getMessage.contains("exceeds 2 frequent items") ||
      ex.getCause != null &&
        ex.getCause.getMessage.contains("exceeds 2 frequent items"))
  }
}
