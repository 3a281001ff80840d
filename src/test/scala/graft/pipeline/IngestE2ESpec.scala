package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The oracle gate's scenario (x_stream_ingest_e2e) asserted
  * structurally: redelivered drains must not duplicate, the ST9 trap
  * must not leak, C's update must win over A's original, and the
  * report rows must be real 2-row averages that round-tripped the
  * exported CSV. */
class IngestE2ESpec extends SparkSpec {
  import spark.implicits._

  test("EP1 e2e: 3 redelivered drains land the single-delivery answer") {
    val work = java.nio.file.Files.createTempDirectory("graft_e2e")
    val out = IngestE2E.run(spark, "/root/testdata/sf0.001",
      work.resolve("run").toString)
    out.cache()

    // 25 nations × 2 dates + 25 report rows; nothing extra from the
    // redelivered drains, nothing from the converted_ trap
    assert(out.count() == 75)
    assert(out.filter($"geo" === "TRAP").count() == 0)
    assert(out.filter($"kind" === "table").count() == 50)

    // C (second delivery) overwrote even nations' 03-15 row; odd kept A's
    val v = out.filter($"kind" === "table" && $"date" === "2024-03-15")
      .select($"geo", $"value".cast("double"))
      .as[(String, Double)].collect().toMap
    val nations = graft.Tables.load(spark, "/root/testdata/sf0.001", "nation")
      .select($"n_nationkey".cast("long"), $"n_name")
      .as[(Long, String)].collect()
    nations.foreach { case (k, geo) =>
      val expect = if (k % 2 == 0) 200 + k + 0.75 else 110 + k + 0.25
      assert(v(geo) == expect, s"geo=$geo k=$k")
    }

    // report rows: one per GEO, n=2, avg exact
    val rep = out.filter($"kind" === "report")
      .select($"geo", $"value".cast("double"), $"n")
      .as[(String, Double, Long)].collect()
    assert(rep.length == 25 && rep.forall(_._3 == 2L))
    val repMap = rep.map(r => r._1 -> r._2).toMap
    nations.foreach { case (k, geo) =>
      val expect = if (k % 2 == 0) (100 + k + 0.5 + 200 + k + 0.75) / 2
                   else (100 + k + 0.5 + 110 + k + 0.25) / 2
      assert(repMap(geo) == expect, s"report geo=$geo k=$k")
    }
    out.unpersist()
  }
}
