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

  test("report base over co-bucketed fact tables runs with zero shuffles") {
    val lineitem = (1L to 300L).flatMap(o => (1 to 2).map(ln =>
      (o, ln, 5.0, 100.0 + o, 0.05))).toDF(
      "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
    val orders = (1L to 300L).map(o =>
      (o, o % 20, java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), "O"))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_orderstatus")
    val customer = (0L to 19L).map(c => (c, c % 5)).toDF("c_custkey", "c_nationkey")
    val nation = (0L to 4L).map(n => (n, s"N$n", n % 2)).toDF(
      "n_nationkey", "n_name", "n_regionkey")
    val region = (0L to 1L).map(r => (r, s"R$r")).toDF("r_regionkey", "r_name")

    Bucketing.writeStarLayout(lineitem, orders, numBuckets = 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val base = Reports.reportBase(spark.table("bkt_lineitem"),
        spark.table("bkt_orders"), customer, nation, region)
      assert(Bucketing.isShuffleExchangeFree(base),
        base.queryExecution.executedPlan.toString)
      // identical rows to the unbucketed build
      val plain = Reports.reportBase(lineitem, orders, customer, nation, region)
      assert(base.count() == plain.count())
      // double sums are addition-order-dependent across plan shapes;
      // compare with a relative tolerance (exact paths use DECIMAL)
      val br = base.agg(sum($"revenue")).first().getDouble(0)
      val pr = plain.agg(sum($"revenue")).first().getDouble(0)
      assert(math.abs(br - pr) <= math.abs(pr) * 1e-12)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
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

  test("ensureBucketedTable: durable DDL layout joins exchange-free, builds once") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bktddl").toString
    val left = (1L to 500L).map(i => (i, s"L$i")).toDF("k", "lv")
    val right = (1L to 500L).filter(_ % 3 == 0).map(i => (i, i * 10.0))
      .toDF("rk", "rv")
    Bucketing.ensureBucketedTable(spark, "bktddl_left", left, "k", 4,
      s"$tmp/left")
    Bucketing.ensureBucketedTable(spark, "bktddl_right", right, "rk", 4,
      s"$tmp/right")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("bktddl_left")
        .join(spark.table("bktddl_right"), $"k" === $"rk")
      val rows = j.as[(Long, String, Long, Double)].collect().toSet
      assert(rows == (1L to 500L).filter(_ % 3 == 0)
        .map(i => (i, s"L$i", i, i * 10.0)).toSet)
      // no shuffle on either side of the join
      val plan = j.queryExecution.executedPlan.toString
      assert(Bucketing.isShuffleFree(j), plan)
      assert(plan.contains("SortMergeJoin"), plan)
      // build-once: re-ensuring rebinds the catalog entry without
      // rewriting the data — and after a catalog drop (new-session
      // simulation) the SAME files serve the same exchange-free join
      def files() = new java.io.File(s"$tmp/left")
        .listFiles.filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified)).toSet
      val before = files()
      assert(before.size == 4) // one file per bucket: sort metadata holds
      Bucketing.ensureBucketedTable(spark, "bktddl_left", left, "k", 4,
        s"$tmp/left")
      assert(files() == before)
      spark.sql("DROP TABLE bktddl_left") // catalog gone, files stay
      Bucketing.ensureBucketedTable(spark, "bktddl_left", left, "k", 4,
        s"$tmp/left")
      assert(files() == before)
      val j2 = spark.table("bktddl_left")
        .join(spark.table("bktddl_right"), $"k" === $"rk")
      assert(Bucketing.isShuffleFree(j2),
        j2.queryExecution.executedPlan.toString)
      // a layout-mismatched re-ensure is refused, never silently served
      val eBuckets = intercept[IllegalArgumentException] {
        Bucketing.ensureBucketedTable(spark, "bktddl_left", left, "k", 8,
          s"$tmp/left")
      }
      assert(eBuckets.getMessage.contains("different bucket layout"))
      val ePath = intercept[IllegalArgumentException] {
        Bucketing.ensureBucketedTable(spark, "bktddl_left", left, "k", 4,
          s"$tmp/elsewhere")
      }
      assert(ePath.getMessage.contains("different location"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bktddl_left")
      spark.sql("DROP TABLE IF EXISTS bktddl_right")
    }
  }
}
