package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("co-bucketed tables join without any exchange; plain tables shuffle") {
    val left = (1L to 1000L).map(k => (k, s"l$k")).toDF("k", "lv")
    val right = (1L to 1000L).map(k => (k, k * 2.0)).toDF("k", "rv")
    Bucketing.writeBucketed(left, "bkt_left", "k", 4)
    Bucketing.writeBucketed(right, "bkt_right", "k", 4)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bucketed = spark.table("bkt_left")
        .join(spark.table("bkt_right"), "k")
      assert(Bucketing.isShuffleFree(bucketed),
        bucketed.queryExecution.executedPlan.toString)
      assert(bucketed.count() == 1000)

      val plain = left.join(right, "k")
      assert(!Bucketing.isShuffleFree(plain))

      // results identical either way
      val a = bucketed.select("k", "lv", "rv").as[(Long, String, Double)]
        .collect().sortBy(_._1)
      val b = plain.select("k", "lv", "rv").as[(Long, String, Double)]
        .collect().sortBy(_._1)
      assert(a.toSeq == b.toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }

  test("bucketed group-by on the bucket key is also shuffle-free") {
    val df = (1L to 500L).map(k => (k % 50, k)).toDF("k", "v")
    Bucketing.writeBucketed(df, "bkt_agg", "k", 4)
    try {
      val agg = spark.table("bkt_agg").groupBy("k").agg(sum("v").as("s"))
      assert(Bucketing.isShuffleFree(agg),
        agg.queryExecution.executedPlan.toString)
      assert(agg.count() == 50)
    } finally spark.sql("DROP TABLE IF EXISTS bkt_agg")
  }
}
