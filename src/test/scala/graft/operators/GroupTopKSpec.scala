package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GroupTopKSpec extends SparkSpec {
  import spark.implicits._

  test("aggregator top-k equals window top-k, including ties") {
    val rnd = new scala.util.Random(11)
    // few distinct scores force ties; many partitions force merges
    val df = (1 to 2000).map(i =>
      (s"g${i % 7}", rnd.nextInt(20).toDouble, i.toLong))
      .toDF("g", "score", "id").repartition(13)
    val fast = GroupTopK.topKPerGroup(df, Seq("g"), "score", "id", 5)
      .as[(String, Double, Long)].collect().sorted
    val ref = GroupTopK.topKPerGroupWindow(df, Seq("g"), "score", "id", 5)
      .as[(String, Double, Long)].collect().sorted
    assert(fast.toSeq == ref.toSeq)
    assert(fast.length == 35) // 7 groups x 5
  }

  test("groups smaller than k return all their rows") {
    val df = Seq(("a", 1.0, 1L), ("a", 2.0, 2L), ("b", 9.0, 3L))
      .toDF("g", "score", "id")
    val out = GroupTopK.topKPerGroup(df, Seq("g"), "score", "id", 10)
      .as[(String, Double, Long)].collect().sorted
    assert(out.length == 3)
  }

  test("reduce keeps the buffer bounded at k") {
    val agg = new GroupTopK.TopKAggregator(3)
    val buf = (1 to 100).foldLeft(agg.zero)((b, i) =>
      agg.reduce(b, (i.toDouble % 10, i.toLong)))
    assert(buf.size == 3)
    assert(buf == buf.sorted(Ordering[(Double, Long)].reverse))
    val merged = agg.merge(buf, agg.reduce(agg.zero, (99.0, 7L)))
    assert(merged.size == 3 && merged.head == ((99.0, 7L)))
  }
}
