package graft.kv

import graft.SparkSpec
import java.nio.file.Files

class KvProjectionSpec extends SparkSpec {
  import spark.implicits._

  test("EP2: importTable builds AutoID main + (Date,GEO) GSI projection") {
    val base = Files.createTempDirectory("graft_kv").toString
    val kv = new KvProjection(spark, base)
    val df = Seq(
      ("1995-12", "Canada", "food", "104.3", ""),
      ("1995-12", "Alberta", "food", "103.0", ""),
      ("1995-11", "Canada", "fuel", "99.9", "t")
    ).toDF("Date", "GEO", "Products", "VALUE", "STATUS")

    kv.importTable(df)

    val main = kv.main()
    val ids = main.select("AutoID").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L)) // dense 1-based (R3:389-393)
    // ordered by (Date, GEO): 1995-11/Canada < 1995-12/Alberta < 1995-12/Canada
    val first = main.filter($"AutoID" === 1).select("Date", "GEO")
      .as[(String, String)].head()
    assert(first == ("1995-11", "Canada"))

    val gsi = kv.gsi()
    assert(gsi.columns.toSeq == Seq("Date", "GEO", "Products", "VALUE", "STATUS"))

    val q = kv.gsiQuery("1995-12", "A", "Cz").as[(String, String, String, String, String)]
      .collect().map(_._2).sorted
    assert(q.toSeq == Seq("Alberta", "Canada"))

    val pt = kv.pointLookup(2)
    assert(pt.count() == 1)
  }
}
