package graft.pipeline

import graft.SparkSpec
import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._

/** Audit-protocol chaos (VERDICT r12 next-list #6): kill the loader at
  * every durable-state transition — including BETWEEN stage-3's two
  * audit appends — and prove the replay lands the single-delivery
  * answer. The kill is [[IngestPipeline.FailPoint]]'s Error, which
  * bypasses load()'s Exception handler: durable state (audit log,
  * permanent table, merge tmp dirs) is exactly what a process kill at
  * that site leaves behind. The `_seq` versioned merge is what makes
  * the merge replay idempotent; these are the ≥10 kill points that
  * prove it end to end. */
class AuditChaosSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): Path = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d
  }

  private val header =
    "Date,GEO,DGUID,Products,UOM,UOM_ID,SCALAR_FACTOR,SCALAR_ID,VECTOR,COORDINATE,VALUE,STATUS,SYMBOL,TERMINATED,DECIMALS"

  private def row(date: String, geo: String, product: String, v: String) =
    s"$date,$geo,2016A0001,$product,Units,300,units,0,v123,1.1.1,$v,,,,1"

  private def writeCsv(dir: Path, name: String, lines: Seq[String]): String = {
    val f = dir.resolve(name)
    Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  test("success path: kill at all 9 sites; replay lands the " +
      "single-delivery table and exactly one success audit row") {
    val sites = Seq("s0_enter", "s1_after_suppress_check",
      "s2_before_reconcile", "s2_after_reconcile", "s2_after_temp_append",
      "s3_before_merge",
      // inside the merge itself: staged-but-not-applied, and
      // applied-but-unacknowledged (Upsert.mergeIntoPartitioned)
      "merge_after_tmp_write", "merge_after_overwrite",
      "s3_after_merge", "s3_between_appends",
      "s3_after_final_append")
    for (site <- sites) {
      val in = tmpDir("graft_chaos_in"); val wh = tmpDir("graft_chaos_wh")
      val p = new IngestPipeline(spark, wh.toString)
      val f = writeCsv(in, "priceindex_chaos.csv", Seq(header,
        row("1995-11", "Canada", "food", "101.5"),
        row("1995-12", "Canada", "food", "104.3"),
        row("1995-12", "Ontario", "food", "103.9")))
      IngestPipeline.FailPoint.arm(site)
      try {
        val k = intercept[IngestPipeline.Kill](p.load(f))
        assert(k.getMessage.contains(site))
      } finally IngestPipeline.FailPoint.disarm()
      // replay IS the recovery — rerun the exact same delivery
      val r = p.load(f)
      if (site == "s3_after_final_append")
        // the kill fell after the success row: the suppression window
        // (ST3) must swallow the redelivery, not re-merge it
        assert(r.status == 2, s"$site: $r")
      else assert(r.status == 1, s"$site: $r")
      // the single-delivery answer, independent of kill point
      val got = p.permanent()
        .select(col("GEO"), col("VALUE").cast("double"))
        .as[(String, Double)].collect().sorted.toSeq
      assert(got == Seq(("Canada", 101.5), ("Canada", 104.3),
        ("Ontario", 103.9)), s"$site: $got")
      // protocol invariant: exactly ONE final success row — a replayed
      // merge must not double-log, a killed one must not zero-log
      val successRows = p.audit.table()
        .filter(col("event_source") === "loading" && col("status") === 1)
        .count()
      assert(successRows == 1, s"$site: $successRows success rows")
      // and the durable failure counter never moved (no Exception ran)
      assert(p.audit.countFailures("priceindex_chaos.csv") == 0, site)
    }
  }

  test("reconcile-failure path: kill between and after the failure " +
      "appends; replay converges on the failure verdict, counter sane") {
    val sites = Seq("s2_fail_between_appends", "s2_fail_after_appends")
    for (site <- sites) {
      val in = tmpDir("graft_chaos_in"); val wh = tmpDir("graft_chaos_wh")
      val p = new IngestPipeline(spark, wh.toString, maxErrors = 0)
      val f = writeCsv(in, "priceindex_poisoned.csv", Seq(header,
        row("1995-11", "Canada", "food", "101.5"),
        "this,is,not,a,valid,row"))
      IngestPipeline.FailPoint.arm(site)
      try {
        val k = intercept[IngestPipeline.Kill](p.load(f))
        assert(k.getMessage.contains(site))
      } finally IngestPipeline.FailPoint.disarm()
      val r = p.load(f)
      assert(r.status == 0, s"$site: $r")
      // nothing reached the permanent table on either attempt
      assert(!Files.exists(Path.of(wh.toString, "0_priceindex")), site)
      // the durable attempt counter counts the REPLAY's landed pair
      // (plus the killed attempt's final row only if the kill fell
      // after it) — never zero, never wildly inflated
      val n = p.audit.countFailures("priceindex_poisoned.csv")
      val expected = if (site == "s2_fail_after_appends") 2L else 1L
      assert(n == expected, s"$site: counter=$n")
    }
  }
}
