package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RoutingReportsSpec extends SparkSpec {
  import spark.implicits._

  test("route dispatches by bucket + extension like the reference leader") {
    val files = Seq(
      ("my-backup", "init/schema.SQL"),
      ("my-upload", "data/prices.csv"),
      ("my-upload", "data/prices.TXT"),
      ("my-upload", "data/readme.md"),
      ("other", "x.csv")
    ).toDF("bucket", "key")
    val out = files.select($"key", Routing.route($"bucket", $"key").as("r"))
      .as[(String, String)].collect().toMap
    assert(out("init/schema.SQL") == "init")
    assert(out("data/prices.csv") == "etl")
    assert(out("data/prices.TXT") == "etl")
    assert(out("data/readme.md") == "drop")
    assert(out("x.csv") == "drop")
  }

  test("isObjectCreated and notDerived guards") {
    val ev = Seq(("ObjectCreated:Put", "a.csv"), ("ObjectRemoved:Delete", "b.csv"),
      ("ObjectCreated:Copy", "converted_c.csv")).toDF("en", "key")
    val kept = ev.filter(Routing.isObjectCreated($"en") && Routing.notDerived($"key"))
      .select("key").as[String].collect()
    assert(kept.toSeq == Seq("a.csv"))
  }

  test("isFresh / recentLogMatch window predicates") {
    val now = lit("2026-01-01 12:00:00").cast("timestamp")
    val rows = Seq(
      ("loading ok", "2026-01-01 11:59:55"),
      ("loading ok", "2026-01-01 11:00:00"),
      ("reporting ok", "2026-01-01 11:59:59")
    ).toDF("src", "ts").withColumn("ts", $"ts".cast("timestamp"))
    val n = rows.filter(Routing.recentLogMatch($"src", $"ts", now, "loading", 10))
      .count()
    assert(n == 1)
    val fresh = rows.filter(Routing.isFresh($"ts", now, 30)).count()
    assert(fresh == 2)
  }

  test("reportBase denormalizes star schema; report filters and aggregates") {
    val li = Seq((1L, 1, 10.0, 100.0, 0.1), (1L, 2, 5.0, 50.0, 0.0),
      (2L, 1, 2.0, 20.0, 0.5))
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
    val ord = Seq((1L, 10L, "O", "1996-03-01"), (2L, 20L, "F", "1997-01-01"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate")
      .withColumn("o_orderdate", $"o_orderdate".cast("timestamp"))
    val cust = Seq((10L, 100L), (20L, 200L)).toDF("c_custkey", "c_nationkey")
    val nat = Seq((100L, 1000L, "CA"), (200L, 1000L, "US"))
      .toDF("n_nationkey", "n_regionkey", "n_name")
    val reg = Seq((1000L, "AMERICA")).toDF("r_regionkey", "r_name")

    val base = Reports.reportBase(li, ord, cust, nat, reg)
    assert(base.count() == 3)
    val rev = base.filter($"l_orderkey" === 1 && $"l_linenumber" === 1)
      .select("revenue").as[Double].head()
    assert(math.abs(rev - 90.0) < 1e-9)

    val rep = Reports.priceByPeriodGeoCategory(base, 1996, Seq("CA"))
      .as[(Int, Int, String, String, Double, Double, Long)].collect()
    assert(rep.length == 1)
    val r = rep.head
    assert(r._1 == 1996 && r._2 == 3 && r._3 == "CA" && r._4 == "O")
    assert(math.abs(r._5 - 75.0) < 1e-9) // avg(100,50)
    assert(math.abs(r._6 - 15.0) < 1e-9) // sum qty
    assert(r._7 == 2)
  }
}
